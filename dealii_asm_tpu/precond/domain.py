"""Subdomain-level additive Schwarz (rank-level ASM of the reference).

Rebuilds ``DomainPreconditioner`` (/root/reference/include/preconditioners.h:
27-127) and the halo-layer study of /root/reference/schwarz_02.cc:51-92: the
mesh is partitioned into slabs (one per MPI rank there, one per device shard
here), each subdomain solves its restricted sparse system (with n halo cell
layers) directly, and the weighted contributions are summed.

This is the matrix-based slow-oracle family: subdomain solves run on host via
sparse LU (the reference's inner solver is AMG/direct on the restricted serial
matrix).  The TPU-hot Schwarz paths are precond/asm.py.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse.linalg as spla

from ..fem.assemble import assemble_laplace
from ..fem.dofs import DofHandler


class DomainPreconditioner:
    def __init__(self, dofs: DofHandler, n_subdomains: int = 2,
                 n_halo_layers: int = 1, weighting_type: str = "symm"):
        self.dofs = dofs
        self.weighting_type = weighting_type
        mesh = dofs.mesh
        dim = mesh.dim
        A = assemble_laplace(dofs).tocsc()
        n = dofs.n_dofs

        # partition cells in slabs along the slowest axis, widen by halo cells
        axis = dim - 1
        n_cells_axis = mesh.n_cells[axis]
        n_subdomains = min(n_subdomains, n_cells_axis)
        bounds = np.linspace(0, n_cells_axis, n_subdomains + 1).astype(int)
        cd = np.asarray(dofs.cell_dofs)
        mi = mesh.cell_multi_index()

        self.blocks = []
        counts = np.zeros(n)
        for sdom in range(n_subdomains):
            lo = max(bounds[sdom] - n_halo_layers, 0)
            hi = min(bounds[sdom + 1] + n_halo_layers, n_cells_axis)
            cells = np.where((mi[:, axis] >= lo) & (mi[:, axis] < hi))[0]
            ids = np.unique(cd[cells].reshape(-1))
            ids = ids[~dofs.boundary_mask[ids]]
            lu = spla.splu(A[np.ix_(ids, ids)].tocsc())
            self.blocks.append((ids, lu))
            counts[ids] += 1.0
        counts[counts == 0] = 1.0
        w = 1.0 / counts
        self.w = np.sqrt(w) if weighting_type == "symm" else w
        self.is_symmetric = weighting_type in ("none", "symm")

    def vmult(self, src):
        import jax.numpy as jnp

        x = np.asarray(src, dtype=np.float64)
        if self.weighting_type in ("pre", "symm"):
            x = x * self.w
        dst = np.zeros_like(x)
        for ids, lu in self.blocks:
            dst[ids] += lu.solve(x[ids])
        if self.weighting_type in ("post", "symm"):
            dst = dst * self.w
        return jnp.asarray(dst, src.dtype)

    def __call__(self, src):
        return self.vmult(src)
