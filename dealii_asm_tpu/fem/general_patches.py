"""Overlapping element patches on unstructured meshes (rotated local frames).

Rebuilds get_dof_indices_cell_with_overlap for genuinely unstructured meshes
(/root/reference/include/dof_tools.h:9-137): the (p−1+2·overlap)^dim patch of
a cell takes its outer layers from the 3^dim surrounding cells, whose local
coordinate systems may be arbitrarily rotated (the ball mesh).  The reference
splices lexicographic DoF ranges with runtime orientation decoding; here each
neighbor's contribution is resolved host-side through an affine LATTICE MAP
(signed-permutation matrix + offset) derived from shared-vertex matching, and
baked into a plain (C, m^dim) int32 gather table (pad index = n_dofs for
missing neighbors / constrained DoFs, as in fem/patches.py).

Diagonal (edge/corner) regions are reached by COMPOSING face maps — the same
face-neighbor walk the reference uses (grid_tools.h:199-289).
"""

from __future__ import annotations

import numpy as np

from ..mesh.unstructured import _VERTEX_COORDS, _face_vertices
from .general_dofs import GeneralDofHandler


def _face_maps(mesh):
    """For every (cell, face) with a neighbor: the affine lattice map into the
    neighbor's frame.

    Returns maps[c][f] = (n, A, b) with x_nbr = A @ x_c + b in UNIT cell
    coordinates (A signed permutation; entering the neighbor through the
    shared face, depth measured in unit cells: a point 1 beyond c's face f
    lands 1 inside n from its matching face)."""
    dim = mesh.dim
    fv = _face_vertices(dim)
    vc = _VERTEX_COORDS[dim]
    nbr = mesh.face_neighbors()
    # vertex id -> local index per cell
    maps = [dict() for _ in range(mesh.n_cells_total)]
    for c in range(mesh.n_cells_total):
        for f in range(2 * dim):
            n = nbr[c, f]
            if n < 0:
                continue
            # match the face's shared vertices: c's local vertex li <-> n's lj
            shared = {}
            n_verts = {int(v): j for j, v in enumerate(mesh.cells[n])}
            for li in fv[f]:
                g = int(mesh.cells[c, li])
                shared[li] = n_verts[g]
            d, s = f // 2, f % 2
            # build A column by column: image of axis e_a under the map.
            # pick the face corner of c with minimal coords on the face
            corners = list(shared.keys())
            base = corners[0]
            x0 = vc[base].astype(np.int64)
            y0 = vc[shared[base]].astype(np.int64)
            A = np.zeros((dim, dim), dtype=np.int64)
            for a in range(dim):
                if a == d:
                    continue
                # find the face corner adjacent to base along axis a
                target = x0.copy()
                target[a] = 1 - target[a]
                li2 = next(li for li in corners
                           if (vc[li] == target).all())
                A[:, a] = (vc[shared[li2]].astype(np.int64) - y0) * (
                    1 - 2 * x0[a])
            # depth axis: from n's matching face inward
            g_face = next(gf for gf in range(2 * dim)
                          if mesh.face_key(n, gf) == mesh.face_key(c, f))
            dprime, sprime = g_face // 2, g_face % 2
            A[dprime, d] = (1 - 2 * sprime) * (1 - 2 * s) * -1
            # offset: y0 = A x0 + b at the shared face
            b = y0 - A @ x0
            maps[c][f] = (int(n), A, b)
    return maps


def general_element_patch_indices(dofs: GeneralDofHandler,
                                  n_overlap: int) -> np.ndarray:
    """(C, m^dim) overlap-patch DoF tables on an unstructured mesh."""
    mesh = dofs.mesh
    dim = mesh.dim
    p = dofs.degree
    o = n_overlap
    m = p - 1 + 2 * o
    C = mesh.n_cells_total
    n = dofs.n_dofs
    cd = np.asarray(dofs.cell_dofs, dtype=np.int64)
    n1 = p + 1
    # local lattice flat index from per-axis node coords (x fastest)
    stride = np.array([n1**d for d in range(dim)])
    maps = _face_maps(mesh)

    # patch slot lattice coords (node units, own-cell frame)
    lat = np.stack([np.arange(m**dim) // m**d % m for d in range(dim)],
                   axis=1) - (o - 1)  # (L, dim) in [-(o-1), p+o-1]

    out = np.full((C, m**dim), n, dtype=np.int64)
    for c in range(C):
        for l, coords in enumerate(lat):
            # which unit cell (in c's frame) holds this node, and the node's
            # local coords within it
            cell_off = np.zeros(dim, dtype=np.int64)  # -1, 0, +1 per axis
            local = coords.copy()
            for d2 in range(dim):
                if coords[d2] < 0:
                    cell_off[d2] = -1
                    local[d2] = coords[d2] + p
                elif coords[d2] > p:
                    cell_off[d2] = 1
                    local[d2] = coords[d2] - p
            if (cell_off == 0).all():
                out[c, l] = cd[c, int((local * stride).sum())]
                continue
            # walk face maps axis by axis, composing into the target frame
            cur = c
            A = np.eye(dim, dtype=np.int64)
            b = np.zeros(dim, dtype=np.int64)
            ok = True
            for d2 in range(dim):
                if cell_off[d2] == 0:
                    continue
                # face of `cur` along the CURRENT image of axis d2
                e = A[:, d2]
                axis = int(np.argmax(np.abs(e)))
                sign = int(e[axis]) * int(cell_off[d2])
                face = 2 * axis + (1 if sign > 0 else 0)
                step = maps[cur].get(face)
                if step is None:
                    ok = False
                    break
                nxt, A2, b2 = step
                A = A2 @ A
                b = A2 @ b + b2
                cur = nxt
            if not ok:
                continue
            # map the node: unit coords u = local/p within the offset cell;
            # express the node in c-frame unit coords then push through (A, b)
            u_c = (coords.astype(np.float64)) / p  # node in c's unit frame
            u_n = A @ u_c + (b + 0.0)
            node = np.rint(u_n * p).astype(np.int64)
            if (node < 0).any() or (node > p).any():
                continue
            out[c, l] = cd[cur, int((node * stride).sum())]
    mask = dofs.boundary_mask
    out = np.where((out < n) & ~mask[np.clip(out, 0, n - 1)], out, n)
    return out.astype(np.int32)
