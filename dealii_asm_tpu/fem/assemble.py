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


def iso_q1_reference_mass_stiffness_1d(degree: int, points: str = "lobatto"):
    """1D reference M/K for FE_Q_iso_Q1: p linear sub-elements on the GLL
    ('lobatto') or equidistant subdivision of [0,1].

    The reference builds these spaces at
    /root/reference/include/precondition.templates.h:49-76 (FE_Q_iso_Q1 with
    QGaussLobatto subdivision points or equidistant) to approximate patch
    blocks; spectra are compared in /root/reference/eigenvalues_01.cc.
    """
    from .lagrange import gauss_lobatto_points

    if points == "lobatto":
        x = gauss_lobatto_points(degree + 1)
    elif points == "equidistant":
        x = np.linspace(0.0, 1.0, degree + 1)
    else:
        raise ValueError(points)
    n = degree + 1
    M = np.zeros((n, n))
    K = np.zeros((n, n))
    for e in range(degree):
        h = x[e + 1] - x[e]
        M[e : e + 2, e : e + 2] += np.array([[2, 1], [1, 2]]) * h / 6.0
        K[e : e + 2, e : e + 2] += np.array([[1, -1], [-1, 1]]) / h
    return M, K


def assemble_laplace_iso_q1(
    dofs: DofHandler, points: str = "lobatto", constrained: str = "identity"
) -> sp.csr_matrix:
    """Global Laplace matrix of the FE_Q_iso_Q1 approximation space.

    Exact for Cartesian (axis-aligned affine) meshes via separable 1D matrices;
    for deformed meshes this approximates the reference's curved FE_Q_iso_Q1
    re-discretization by the same separable structure per cell (the blocks it
    feeds are themselves approximations — see precondition.templates.h:33-85).
    """
    p = dofs.degree
    dim = dofs.mesh.dim
    M1, K1 = iso_q1_reference_mass_stiffness_1d(p, points)

    h = np.asarray(dofs.mesh.harmonic_cell_extents(p + 1))  # (C, dim)
    C = h.shape[0]
    n1 = p + 1
    L = n1**dim

    # local matrix: sum_d kron(..., K_d/h_d, ..., M_e*h_e, ...)
    A_loc = np.zeros((C, L, L))
    for d in range(dim):
        mats = []
        for e in reversed(range(dim)):  # slowest (last dim) to fastest (x)
            mats.append(K1 if e == d else M1)
        local = np.array([[1.0]])
        for m in mats:
            local = np.kron(local, m)
        scale = np.ones(C)
        for e in range(dim):
            scale = scale * (1.0 / h[:, e] if e == d else h[:, e])
        A_loc += scale[:, None, None] * local[None, :, :]

    cd = np.asarray(dofs.cell_dofs, dtype=np.int64)
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


def assemble_laplace_general(
    dofs,
    n_q_1d: int | None = None,
    mapping_degree: int | None = None,
    constrained: str = "identity",
) -> sp.csr_matrix:
    """Assemble the global Laplace matrix on an unstructured mesh
    (GeneralDofHandler) — the slow oracle for the hyperball family."""
    p = dofs.degree
    mesh = dofs.mesh
    dim = mesh.dim
    n_q_1d = n_q_1d or (p + 1)
    if mapping_degree is None:
        mapping_degree = 1 if mesh.project is None else 2
    s = shape_1d(p, n_q_1d)
    B = _tensor_gradient(s.N, s.D, dim)  # (Q, L, dim)
    from ..mesh.grid import _tensor_weights

    wq = _tensor_weights([s.w] * dim)
    from ..ops.geometry import merged_det_coeff

    Bj, spj = mesh.jacobian_factors(mapping_degree, s.q)
    detj, coeff = merged_det_coeff(Bj, spj, wq, dim)
    A_loc = np.einsum("cqde,qld,qme->clm", coeff, B, B, optimize=True)

    cd = np.asarray(dofs.cell_dofs, dtype=np.int64)
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
