"""Lattice window extraction — the TPU-native 'reduced access' layer.

The reference compresses per-cell DoF indices to 3^dim start indices per cell to
cut index-memory bandwidth (/root/reference/include/vector_access_reduced.h,
reduced_access.h).  On TPU the right redesign is stronger: on a structured node
lattice the per-cell (patch) DoF windows are *strided slices* of the grid-shaped
vector, so cell access needs NO index tables at all and the transpose-scatter
becomes a conflict-free overlap-add of m shifted slabs per axis (each slab hits
every target once → vectorized adds, not serialized scatters).

Window geometry along one axis (degree p, overlap o, m = p-1+2o):
window start of cell c = c·p − (o−1); nodes outside a non-periodic boundary are
zero-padding (the reference's invalid_dof_index), periodic wraps.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _pad_amounts(n_nodes: int, n_cells: int, degree: int, m: int, overlap: int,
                 periodic: bool) -> tuple[int, int]:
    lo = overlap - 1
    span = (n_cells - 1) * degree + m
    hi = span - lo - n_nodes
    return lo, max(hi, 0)


def split_windows_axis(u, axis: int, n_cells: int, degree: int, m: int,
                       overlap: int, periodic: bool):
    """(..., N, ...) -> (..., C, m, ...) windows along ``axis``."""
    u = jnp.moveaxis(u, axis, -1)
    N = u.shape[-1]
    lo, hi = _pad_amounts(N, n_cells, degree, m, overlap, periodic)
    if lo or hi:
        pad = [(0, 0)] * (u.ndim - 1) + [(lo, hi)]
        u = jnp.pad(u, pad, mode="wrap" if periodic else "constant")
    p = degree
    cols = [u[..., j : j + p * (n_cells - 1) + 1 : p] for j in range(m)]
    w = jnp.stack(cols, axis=-1)  # (..., C, m)
    return _restore(w, axis)


def _restore(w, axis):
    # w: (..., C, m) with the split axis moved to the end; move (C, m) back to
    # position `axis` as two consecutive axes.
    w = jnp.moveaxis(w, -2, axis)      # C -> axis
    w = jnp.moveaxis(w, -1, axis + 1)  # m -> axis+1
    return w


def overlap_add_axis(w, axis: int, n_nodes: int, degree: int, overlap: int,
                     periodic: bool):
    """Inverse of split_windows_axis: (..., C, m, ...) -> (..., N, ...) by
    overlap-adding the m shifted slabs (conflict-free per slab)."""
    m_axis = axis + 1
    w = jnp.moveaxis(w, m_axis, -1)
    w = jnp.moveaxis(w, axis, -2)  # (..., C, m)
    C = w.shape[-2]
    m = w.shape[-1]
    p = degree
    lo, hi = _pad_amounts(n_nodes, C, p, m, overlap, periodic)
    padded_len = n_nodes + lo + hi
    out = jnp.zeros(w.shape[:-2] + (padded_len,), w.dtype)
    for j in range(m):
        out = out.at[..., j : j + p * (C - 1) + 1 : p].add(w[..., :, j])
    if periodic:
        core = out[..., lo : lo + n_nodes]
        if lo:
            core = core.at[..., n_nodes - lo :].add(out[..., :lo])
        if hi:
            core = core.at[..., :hi].add(out[..., lo + n_nodes :])
    else:
        core = out[..., lo : lo + n_nodes]
    return jnp.moveaxis(core, -1, axis)


def grid_to_windows(u_grid, n_cells: tuple, degree: int, m: int, overlap: int,
                    periodic: tuple):
    """Grid (Nz, Ny, Nx) -> interleaved windows (Cz, mz, Cy, my, Cx, mx).

    The interleaved layout keeps per-axis contractions transpose-free: compute
    kernels contract the m-axes (positions 1,3,5) in place; per-coordinate
    matrix tables index the C-axes (positions 0,2,4)."""
    dim = len(n_cells)
    w = u_grid
    for a in range(dim - 1, -1, -1):
        d = dim - 1 - a
        w = split_windows_axis(w, a, n_cells[d], degree, m, overlap, periodic[d])
    return w


def windows_to_grid(w, grid_shape: tuple, degree: int, overlap: int,
                    periodic: tuple):
    """Inverse of grid_to_windows (overlap-add)."""
    dim = len(grid_shape)
    for a in range(dim):
        d = dim - 1 - a
        w = overlap_add_axis(w, a, grid_shape[a], degree, overlap, periodic[d])
    return w


def apply_axis_shared(w, m_axis: int, mat):
    """Contract a shared 1D matrix (out, in) against one m-axis of a window tensor."""
    w = jnp.moveaxis(w, m_axis, -1)
    w = jnp.matmul(w, mat.T)
    return jnp.moveaxis(w, -1, m_axis)


def apply_axis_percoord(w, c_axis: int, m_axis: int, mats, transpose: bool):
    """Contract per-coordinate matrices (C_d, m, m) against one (C, m) axis pair.

    transpose=True applies matsᵀ (out_j = Σ_i mats[c,i,j]·in_i)."""
    w = jnp.moveaxis(w, m_axis, -1)
    w = jnp.moveaxis(w, c_axis if c_axis < m_axis else c_axis - 1, -2)
    eq = "...ci,cij->...cj" if transpose else "...ci,cji->...cj"
    w = jnp.einsum(eq, w, mats)
    w = jnp.moveaxis(w, -2, c_axis if c_axis < m_axis else c_axis - 1)
    return jnp.moveaxis(w, -1, m_axis)


def grid_to_cells(u_grid, n_cells: tuple, degree: int, m: int, overlap: int,
                  periodic: tuple):
    """Grid (Nz, Ny, Nx) -> cell-batched (C, m^dim) local tensors (x fastest).

    dim axes are ordered slowest-to-fastest (z, y, x), matching the flat DoF
    numbering u.reshape(Nz, Ny, Nx).
    """
    dim = len(n_cells)
    w = u_grid
    # split each grid axis back-to-front; grid axis a holds direction dim-1-a,
    # and splitting at position a leaves lower positions untouched
    for a in range(dim - 1, -1, -1):
        d = dim - 1 - a
        w = split_windows_axis(w, a, n_cells[d], degree, m, overlap, periodic[d])
    # after splitting from last to first axis, layout is
    # (Cz, mz, Cy, my, Cx, mx); reorder to (Cz, Cy, Cx, mz, my, mx)
    perm_c = tuple(range(0, 2 * dim, 2))
    perm_m = tuple(range(1, 2 * dim, 2))
    w = w.transpose(perm_c + perm_m)
    C = int(np.prod(n_cells))
    return w.reshape(C, m**dim)


def cells_to_grid(v, grid_shape: tuple, n_cells: tuple, degree: int, m: int,
                  overlap: int, periodic: tuple):
    """Inverse of grid_to_cells: (C, m^dim) -> grid (Nz, Ny, Nx) overlap-added."""
    dim = len(n_cells)
    cells_zyx = tuple(reversed([n_cells[d] for d in range(dim)]))  # (Cz, Cy, Cx)
    w = v.reshape(cells_zyx + (m,) * dim)
    # back to interleaved (Cz, mz, Cy, my, Cx, mx)
    perm = []
    for i in range(dim):
        perm.append(i)
        perm.append(dim + i)
    w = w.transpose(perm)
    # merge (C, m) pairs front-to-back: each merge collapses two axes into one
    # at position a, so the a-th pair always sits at position a
    for a in range(dim):
        d = dim - 1 - a
        w = overlap_add_axis(w, a, grid_shape[a], degree, overlap, periodic[d])
    return w
