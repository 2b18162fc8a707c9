"""Fast-diagonalization-method (FDM) local solvers.

Rebuilds the 1D patch mass/stiffness assembly of
/root/reference/include/tensor_product_matrix_creator.h:7-61 (vertex patches)
and deal.II's overlap-aware element-centric creator (called at
/root/reference/include/matrix_free.h:350-363), plus the batched
generalized-eigendecomposition collection that deal.II's
TensorProductMatrixSymmetricSumCollection provides (inserted/finalized at
matrix_free.h:389-392).

Semantics of the 1D patch matrices (direction d, extents [h_l, h_c, h_r]):
assemble the 3-cell 1D FE system scaled per cell (M by h, K by 1/h), restrict
to the patch window of size m = p-1+2·overlap centered on the middle cell
(homogeneous Dirichlet outside the window = plain sub-block), and
- at a missing neighbor (h=0): window slots beyond the boundary become
  decoupled ghost rows (M=K=1 on the diagonal);
- at a Dirichlet domain boundary: the boundary node's row/col is cleared and
  decoupled (the gather feeds zeros there, so the filler never pollutes);
- at a Neumann boundary: the natural assembled row is kept.

The patch inverse is P⁻¹ = (⊗_d V_d) diag(1/Σ_d λ_d) (⊗_d V_d)ᵀ with
K_d V_d = M_d V_d Λ_d, V_dᵀ M_d V_d = I.  Matrices are deduplicated by content
(the collection dedups the same way) so the device tables stay tiny on
quasi-uniform meshes.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import scipy.linalg as sla

from ..fem.lagrange import reference_mass_stiffness_1d


def _assemble_3cell(M_ref, K_ref, extents):
    """Assemble 1D mass/stiffness on up to 3 cells with widths ``extents``.

    extents = (h_l, h_c, h_r); h==0 means the cell is absent. Node count 3p+1.
    """
    n = M_ref.shape[0]
    p = n - 1
    size = 3 * p + 1
    M = np.zeros((size, size))
    K = np.zeros((size, size))
    for c, h in enumerate(extents):
        if h <= 0.0:
            continue
        sl = slice(c * p, c * p + n)
        M[sl, sl] += M_ref * h
        K[sl, sl] += K_ref / h
    return M, K


def fdm_1d_matrices(
    degree: int,
    n_overlap: int,
    extents,                      # (h_l, h_c, h_r)
    bc_left: str = "dirichlet",   # "dirichlet" | "neumann" | "internal"
    bc_right: str = "dirichlet",
    n_q_1d: int | None = None,
):
    """1D patch (M, K) of size m = p-1+2·overlap for one direction of one cell.

    bc_* describes the *domain boundary condition* at that side when the
    neighbor is absent; when a neighbor exists pass "internal".
    """
    p = degree
    m = p - 1 + 2 * n_overlap
    M_ref, K_ref = reference_mass_stiffness_1d(degree, n_q_1d)
    h_l, h_c, h_r = extents
    M3, K3 = _assemble_3cell(M_ref, K_ref, (h_l, h_c, h_r))
    lo = p - (n_overlap - 1)
    W = slice(lo, lo + m)
    Mw = M3[W, W].copy()
    Kw = K3[W, W].copy()

    def _fix(idx_ghost, idx_boundary, bc, h_nbr):
        # ghost slots beyond a missing neighbor
        if h_nbr <= 0.0:
            for i in idx_ghost:
                Mw[i, :] = 0.0
                Mw[:, i] = 0.0
                Kw[i, :] = 0.0
                Kw[:, i] = 0.0
                Mw[i, i] = 1.0
                Kw[i, i] = 1.0
            if bc == "dirichlet":
                i = idx_boundary
                Mw[i, :] = 0.0
                Mw[:, i] = 0.0
                Kw[i, :] = 0.0
                Kw[:, i] = 0.0
                Mw[i, i] = 1.0
                Kw[i, i] = 1.0
            # neumann: keep the natural assembled row

    left_ghosts = list(range(0, n_overlap - 1))
    _fix(left_ghosts, n_overlap - 1, bc_left, h_l)
    right_ghosts = list(range(m - (n_overlap - 1), m))
    _fix(right_ghosts, m - n_overlap, bc_right, h_r)
    return Mw, Kw


def batched_generalized_eigh(K: np.ndarray, M: np.ndarray):
    """Batched K v = λ M v for stacks of small SPD pairs.

    K, M: (U, m, m).  Returns (lam (U, m) ascending, V (U, m, m)) with
    columns M-orthonormal — the same contract as scipy.linalg.eigh(K, M),
    vectorized via Cholesky reduction (M = LLᵀ, A = L⁻¹KL⁻ᵀ, v = L⁻ᵀy).
    The per-matrix loop this replaces dominated unstructured FDM setup
    (~400k distinct extents on a curved ball at 131k cells)."""
    L = np.linalg.cholesky(M)
    Linv = np.linalg.inv(L)
    LinvT = np.swapaxes(Linv, -1, -2)
    A = Linv @ K @ LinvT
    A = 0.5 * (A + np.swapaxes(A, -1, -2))
    lam, Y = np.linalg.eigh(A)
    V = LinvT @ Y
    return lam, V


def fdm_1d_matrices_batched(
    degree: int,
    n_overlap: int,
    extents: np.ndarray,          # (U, 3) [h_l, h_c, h_r]; h<=0 = absent
    internal_left: np.ndarray,    # (U,) bool: left neighbor exists
    internal_right: np.ndarray,   # (U,) bool
    n_q_1d: int | None = None,
    bc: str = "dirichlet",
):
    """Vectorized ``fdm_1d_matrices`` over U keys → (M (U,m,m), K (U,m,m)).

    Missing-neighbor sides get Dirichlet treatment — the only case this
    builder implements; callers adding Neumann support must pass their bc
    mode so the restriction fails here instead of silently producing
    Dirichlet matrices (use the scalar ``fdm_1d_matrices`` for Neumann)."""
    if bc != "dirichlet":
        raise NotImplementedError(
            f"fdm_1d_matrices_batched only supports bc='dirichlet', got {bc!r}")
    p = degree
    m = p - 1 + 2 * n_overlap
    M_ref, K_ref = reference_mass_stiffness_1d(degree, n_q_1d)
    n = p + 1
    size = 3 * p + 1
    U = extents.shape[0]
    M3 = np.zeros((U, size, size))
    K3 = np.zeros((U, size, size))
    for c in range(3):
        h = extents[:, c]
        present = h > 0.0
        hm = np.where(present, h, 0.0)
        hinv = np.where(present, 1.0 / np.where(present, h, 1.0), 0.0)
        sl = slice(c * p, c * p + n)
        M3[:, sl, sl] += M_ref[None] * hm[:, None, None]
        K3[:, sl, sl] += K_ref[None] * hinv[:, None, None]
    lo = p - (n_overlap - 1)
    Mw = np.ascontiguousarray(M3[:, lo:lo + m, lo:lo + m])
    Kw = np.ascontiguousarray(K3[:, lo:lo + m, lo:lo + m])

    def _clear(mask, i):
        # decouple slot i for the masked keys: zero row/col, unit diagonal
        Mw[mask, i, :] = 0.0
        Mw[mask, :, i] = 0.0
        Kw[mask, i, :] = 0.0
        Kw[mask, :, i] = 0.0
        Mw[mask, i, i] = 1.0
        Kw[mask, i, i] = 1.0

    internal_left = np.asarray(internal_left, dtype=bool)
    internal_right = np.asarray(internal_right, dtype=bool)
    absent_l = extents[:, 0] <= 0.0
    absent_r = extents[:, 2] <= 0.0
    for i in range(0, n_overlap - 1):            # ghost slots, left
        _clear(absent_l, i)
    _clear(absent_l & ~internal_left, n_overlap - 1)   # Dirichlet boundary
    for i in range(m - (n_overlap - 1), m):      # ghost slots, right
        _clear(absent_r, i)
    _clear(absent_r & ~internal_right, m - n_overlap)
    return Mw, Kw


def vertex_patch_1d_matrices_batched(degree: int, extents: np.ndarray,
                                     n_q_1d: int | None = None):
    """Vectorized ``vertex_patch_1d_matrices``: extents (U, 2) → (U, m, m)²."""
    p = degree
    n = p + 1
    M_ref, K_ref = reference_mass_stiffness_1d(degree, n_q_1d)
    h0, h1 = extents[:, 0], extents[:, 1]
    m = 2 * (n - 1) - 1
    U = extents.shape[0]
    M = np.zeros((U, m, m))
    K = np.zeros((U, m, m))
    M[:, : n - 1, : n - 1] += M_ref[None, 1:, 1:] * h0[:, None, None]
    K[:, : n - 1, : n - 1] += K_ref[None, 1:, 1:] / h0[:, None, None]
    M[:, n - 2 :, n - 2 :] += M_ref[None, : n - 1, : n - 1] * h1[:, None, None]
    K[:, n - 2 :, n - 2 :] += K_ref[None, : n - 1, : n - 1] / h1[:, None, None]
    return M, K


def vertex_patch_1d_matrices(degree: int, extents, n_q_1d: int | None = None):
    """1D vertex-patch (M, K): interior of a 2-cell assembly, size 2p-1.

    Mirrors /root/reference/include/tensor_product_matrix_creator.h:29-58:
    block [0:p, 0:p] from M_ref[1:,1:]·h0, block [p-1:, p-1:] from
    M_ref[:p, :p]·h1 (both patch ends Dirichlet-clipped).
    """
    p = degree
    n = p + 1
    M_ref, K_ref = reference_mass_stiffness_1d(degree, n_q_1d)
    h0, h1 = extents
    m = 2 * (n - 1) - 1
    M = np.zeros((m, m))
    K = np.zeros((m, m))
    M[: n - 1, : n - 1] += M_ref[1:, 1:] * h0
    K[: n - 1, : n - 1] += K_ref[1:, 1:] / h0
    M[n - 2 :, n - 2 :] += M_ref[: n - 1, : n - 1] * h1
    K[n - 2 :, n - 2 :] += K_ref[: n - 1, : n - 1] / h1
    return M, K


@dataclass
class FDMCollection:
    """Deduplicated per-direction eigendecompositions.

    eigvecs[d]: (U_d, m, m) M-orthonormal generalized eigenvectors,
    eigvals[d]: (U_d, m), ids[d]: (C,) int32 per-cell index into the tables.
    """

    eigvecs: list  # per dim
    eigvals: list
    ids: np.ndarray  # (C, dim) int32

    @property
    def m(self) -> int:
        return self.eigvecs[0].shape[-1]


def build_fdm_collection(mk_per_cell_per_dim) -> FDMCollection:
    """Deduplicate (M, K) pairs per direction and eigendecompose once per unique.

    mk_per_cell_per_dim: list over dims of list over cells of (M, K) arrays.
    """
    dim = len(mk_per_cell_per_dim)
    C = len(mk_per_cell_per_dim[0])
    eigvecs, eigvals = [], []
    ids = np.zeros((C, dim), dtype=np.int32)
    for d in range(dim):
        cache: dict[bytes, int] = {}
        unique = []
        for c in range(C):
            M, K = mk_per_cell_per_dim[d][c]
            key = np.round(np.concatenate([M.ravel(), K.ravel()]), 12).tobytes()
            if key not in cache:
                cache[key] = len(unique)
                unique.append((M, K))
            ids[c, d] = cache[key]
        V = np.zeros((len(unique),) + unique[0][0].shape)
        lam = np.zeros((len(unique), unique[0][0].shape[0]))
        for u, (M, K) in enumerate(unique):
            w, v = sla.eigh(K, M)
            lam[u] = w
            V[u] = v  # columns are M-orthonormal eigenvectors
        eigvecs.append(V)
        eigvals.append(lam)
    return FDMCollection(eigvecs, eigvals, ids)
