"""Patch DoF-index extraction for Schwarz smoothers.

Rebuilds the reference's L2 layer (/root/reference/include/dof_tools.h):
- element-centric patches of size (p-1+2·overlap)^dim assembled from the cell
  and its neighbors (get_dof_indices_cell_with_overlap, dof_tools.h:9-137);
- vertex-star patches of size (2p-1)^dim from the 2^dim cells around a vertex,
  interior DoFs only (get_dof_indices_vertex_patch, dof_tools.h:206-300).

On the structured lattice the patch indices are computed directly from node
coordinates; missing nodes (outside a non-periodic boundary) map to the pad
index ``n_dofs`` (gathers read 0, scatters drop), playing the role of
``invalid_dof_index`` in the reference.
"""

from __future__ import annotations

import numpy as np

from .dofs import DofHandler


def element_patch_indices(dofs: DofHandler, n_overlap: int) -> np.ndarray:
    """(C, m^dim) patch DoF indices, m = p-1+2·overlap, pad index = n_dofs.

    Local ordering is lexicographic (x fastest), matching the FDM tensor layout.
    """
    p = dofs.degree
    dim = dofs.mesh.dim
    m = p - 1 + 2 * n_overlap
    N = dofs.nodes_per_dim
    mi = dofs.mesh.cell_multi_index()  # (C, dim)
    C = mi.shape[0]

    offsets = np.arange(m, dtype=np.int32) - (n_overlap - 1)  # from cell start
    per_dim = []
    for d in range(dim):
        k = mi[:, d, None].astype(np.int32) * p + offsets[None, :]  # (C, m)
        if dofs.mesh.periodic[d]:
            k = k % N[d]
            valid = np.ones_like(k, dtype=bool)
        else:
            valid = (k >= 0) & (k <= N[d] - 1)
            k = np.clip(k, 0, N[d] - 1)
        per_dim.append((k, valid))

    # one broadcast sum over (C, m, …, m) int32 instead of dim gathered
    # (C, m^dim) int64 temporaries: ~10× less allocation volume — first-touch
    # page faults on fresh temps dominate setup at scale (see __init__.py)
    strides = np.cumprod([1] + list(N[:-1])).astype(np.int32)
    out = None
    ok = None
    for d in range(dim):
        # local axis order is x fastest -> axis position dim-1-d in (C, m^dim)
        sh = [1] * (dim + 1)
        sh[0] = C
        sh[dim - d] = m
        kd = (per_dim[d][0] * strides[d]).reshape(sh)
        vd = per_dim[d][1].reshape(sh)
        out = kd if out is None else out + kd
        ok = vd if ok is None else ok & vd
    out = out.reshape(C, m**dim)
    np.copyto(out, np.int32(dofs.n_dofs),
              where=~ok.reshape(C, m**dim))  # pad
    return out


def vertex_all_patch_indices(dofs: DofHandler) -> tuple[np.ndarray, np.ndarray]:
    """Vertex patches including ALL DoFs of the 2^dim cells: size (2p+1)^dim.

    The 'vertex_all' restrictor type of the reference
    (/root/reference/include/restrictors.h:78-243)."""
    p = dofs.degree
    dim = dofs.mesh.dim
    mesh = dofs.mesh
    N = dofs.nodes_per_dim
    m = 2 * p + 1

    ranges = []
    for d in range(dim):
        if mesh.periodic[d]:
            ranges.append(np.arange(mesh.n_cells[d]))
        else:
            ranges.append(np.arange(1, mesh.n_cells[d]))
    grids = np.meshgrid(*reversed(ranges), indexing="ij")
    verts = np.stack([g.ravel() for g in reversed(grids)], axis=1)

    offsets = np.arange(m) - p
    per_dim = []
    for d in range(dim):
        k = verts[:, d, None] * p + offsets[None, :]
        if mesh.periodic[d]:
            k = k % N[d]
        per_dim.append(k.astype(np.int64))

    strides = np.cumprod([1] + list(N[:-1]))
    out = np.zeros((verts.shape[0], m**dim), dtype=np.int64)
    for d in range(dim):
        reps_inner = m**d
        reps_outer = m ** (dim - 1 - d)
        sel = np.tile(np.repeat(np.arange(m), reps_inner), reps_outer)
        out += per_dim[d][:, sel] * strides[d]

    anchor_mi = verts - 1
    for d in range(dim):
        if mesh.periodic[d]:
            anchor_mi[:, d] %= mesh.n_cells[d]
    anchors = dofs.mesh.cell_flat_index(anchor_mi)
    return out.astype(np.int32), anchors.astype(np.int32)


def vertex_patch_indices(dofs: DofHandler) -> tuple[np.ndarray, np.ndarray]:
    """Vertex-star patches: one patch per interior mesh vertex.

    Returns (patch_indices (P, (2p-1)^dim), anchor_cells (P,)) where the anchor
    cell is the lower-left cell of the 2^dim cell block around the vertex.
    Interior DoFs only (patch boundary is Dirichlet), pad index = n_dofs for
    nodes that are globally constrained is NOT applied here (caller masks).
    """
    p = dofs.degree
    dim = dofs.mesh.dim
    mesh = dofs.mesh
    N = dofs.nodes_per_dim
    m = 2 * p - 1

    # interior vertices: v_d in 1..n_cells_d-1 (non-periodic) or 0..n_cells_d-1 wrap
    ranges = []
    for d in range(dim):
        if mesh.periodic[d]:
            ranges.append(np.arange(mesh.n_cells[d]))
        else:
            ranges.append(np.arange(1, mesh.n_cells[d]))
    grids = np.meshgrid(*reversed(ranges), indexing="ij")
    verts = np.stack([g.ravel() for g in reversed(grids)], axis=1)  # (P, dim)
    P = verts.shape[0]

    offsets = np.arange(m) - (p - 1)
    per_dim = []
    for d in range(dim):
        k = verts[:, d, None] * p + offsets[None, :]
        if mesh.periodic[d]:
            k = k % N[d]
        per_dim.append(k.astype(np.int64))

    strides = np.cumprod([1] + list(N[:-1]))
    out = np.zeros((P, m**dim), dtype=np.int64)
    for d in range(dim):
        reps_inner = m**d
        reps_outer = m ** (dim - 1 - d)
        sel = np.tile(np.repeat(np.arange(m), reps_inner), reps_outer)
        out += per_dim[d][:, sel] * strides[d]

    # anchor cell (lower-left of the 2^dim block)
    anchor_mi = verts - 1
    for d in range(dim):
        if mesh.periodic[d]:
            anchor_mi[:, d] %= mesh.n_cells[d]
    anchors = dofs.mesh.cell_flat_index(anchor_mi)
    return out.astype(np.int32), anchors.astype(np.int32)
