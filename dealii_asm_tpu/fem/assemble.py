"""Dense/sparse reference assembly (NumPy/SciPy) — the slow oracle.

Plays the role of ``LaplaceOperatorMatrixBased``
(/root/reference/include/operator.h:65-261): reference semantics that the
matrix-free fast paths are verified against (the reference uses it the same way,
see SURVEY.md §4.3).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..fem.dofs import DofHandler
from ..fem.lagrange import shape_1d
from ..mesh.grid import _tensor_gradient
from ..ops.geometry import compute_geometry


def assemble_laplace(
    dofs: DofHandler,
    n_q_1d: int | None = None,
    mapping_degree: int | None = None,
    constrained: str = "identity",
) -> sp.csr_matrix:
    """Assemble the global Laplace matrix.

    constrained == "identity": Ã = Z A Z + (I−Z), matching matrix-free vmult
    semantics (identity on Dirichlet rows).  constrained == "raw": plain A.
    """
    p = dofs.degree
    dim = dofs.mesh.dim
    n_q_1d = n_q_1d or (p + 1)
    if mapping_degree is None:
        mapping_degree = 1 if dofs.mesh.transform is None else min(p, 3)
    geo = compute_geometry(dofs.mesh, n_q_1d, mapping_degree)
    s = shape_1d(p, n_q_1d)
    B = _tensor_gradient(s.N, s.D, dim)  # (Q, L, dim)

    if geo.kind == "cartesian":
        h = geo.cell_widths  # (C, dim)
        detj = np.prod(h, axis=1)
        scale = detj[:, None] / (h * h)  # (C, dim)
        wq = geo.quad_weights
        A_loc = np.einsum("q,cd,qld,qmd->clm", wq, scale, B, B)
    else:
        A_loc = np.einsum("cqde,qld,qme->clm", geo.coeff, B, B)

    cd = np.asarray(dofs.cell_dofs, dtype=np.int64)  # (C, L)
    C, L = cd.shape
    rows = np.repeat(cd, L, axis=1).ravel()
    cols = np.tile(cd, (1, L)).ravel()
    A = sp.coo_matrix(
        (A_loc.reshape(-1), (rows, cols)), shape=(dofs.n_dofs, dofs.n_dofs)
    ).tocsr()

    if constrained == "identity":
        mask = dofs.boundary_mask
        z = sp.diags((~mask).astype(np.float64))
        A = z @ A @ z + sp.diags(mask.astype(np.float64))
    return A
