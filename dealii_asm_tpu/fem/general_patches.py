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


def _face_map_arrays(mesh):
    """Vectorized twin of _face_maps: dense arrays over all (cell, face).

    Returns (nall, Aall, ball): neighbor id (C, F; -1 at boundary), the
    signed-permutation matrix (C, F, dim, dim) and offset (C, F, dim) of
    x_nbr = A @ x_c + b.  One pass of fancy indexing per face instead of a
    C·F Python loop (the 131k-cell ball L=5 setup wall)."""
    dim = mesh.dim
    fv = _face_vertices(dim)
    vc = _VERTEX_COORDS[dim]
    nbr = np.asarray(mesh.face_neighbors())
    nfc = np.asarray(mesh.face_neighbor_faces())
    C, F = nbr.shape
    Aall = np.zeros((C, F, dim, dim), dtype=np.int64)
    ball = np.zeros((C, F, dim), dtype=np.int64)
    for f in range(F):
        sel = np.where(nbr[:, f] >= 0)[0]
        if sel.size == 0:
            continue
        n = nbr[sel, f]
        gf = nfc[sel, f]
        d, s = f // 2, f % 2
        fvf = fv[f]
        g = mesh.cells[sel][:, fvf]                      # (Cf, 2^(dim-1))
        # local index in the neighbor of each shared vertex
        loc = np.argmax(mesh.cells[n][:, None, :] == g[:, :, None], axis=2)
        x0 = vc[fvf[0]].astype(np.int64)
        y0 = vc[loc[:, 0]].astype(np.int64)              # (Cf, dim)
        A = np.zeros((sel.size, dim, dim), dtype=np.int64)
        for a in range(dim):
            if a == d:
                continue
            target = x0.copy()
            target[a] = 1 - target[a]
            j = next(j for j in range(len(fvf))
                     if (vc[fvf[j]] == target).all())
            A[:, :, a] = (vc[loc[:, j]].astype(np.int64) - y0) * (
                1 - 2 * int(x0[a]))
        A[np.arange(sel.size), gf // 2, d] = (
            (1 - 2 * (gf % 2)) * (1 - 2 * s) * -1)
        ball[sel, f] = y0 - np.einsum("cij,j->ci", A, x0)
        Aall[sel, f] = A
    return nbr, Aall, ball


def general_element_patch_indices(dofs: GeneralDofHandler,
                                  n_overlap: int) -> np.ndarray:
    """(C, m^dim) overlap-patch DoF tables on an unstructured mesh.

    Vectorized over cells: patch slots are grouped by their 3^dim cell-offset
    pattern; for each pattern the face-map walk (axis by axis, composing the
    affine lattice maps) runs as batched 3×3 integer matmuls over ALL cells at
    once, then every slot of the group resolves node = A·coords + p·b exactly
    (A is a signed permutation, b integer — no float round-trip needed).
    Replaces the per-cell × per-slot Python loop (O(C·m^dim) interpreter
    iterations — ~45M at the ball L=5, ov-2, the round-2 host-setup wall)."""
    mesh = dofs.mesh
    dim = mesh.dim
    p = dofs.degree
    o = n_overlap
    m = p - 1 + 2 * o
    C = mesh.n_cells_total
    n = dofs.n_dofs
    cd = np.asarray(dofs.cell_dofs, dtype=np.int64)
    n1 = p + 1
    stride = np.array([n1**d for d in range(dim)], dtype=np.int64)
    nall, Aall, ball = _face_map_arrays(mesh)

    lat = np.stack([np.arange(m**dim) // m**d % m for d in range(dim)],
                   axis=1) - (o - 1)  # (L, dim) in [-(o-1), p+o-1]
    off = np.where(lat < 0, -1, np.where(lat > p, 1, 0))  # (L, dim)

    out = _walk_patch_indices(dofs, nall, Aall, ball,
                              np.arange(C, dtype=np.int64), lat, off)
    mask = dofs.boundary_mask
    out = np.where((out < n) & ~mask[np.clip(out, 0, n - 1)], out, n)
    return out.astype(np.int32)


def _walk_patch_indices(dofs, nall, Aall, ball, anchors, lat, off):
    """Resolve patch DoF tables by composed face-map walks, vectorized over
    patches.

    anchors: (P,) anchor cell per patch; lat: (L, dim) slot lattice coords in
    the anchor frame (node units, entries may lie outside [0, p]); off:
    (L, dim) per-axis cell offsets (-1/0/+1).  Returns (P, L) int64 DoF ids
    (pad n_dofs where a walk leaves the mesh)."""
    mesh = dofs.mesh
    dim = mesh.dim
    p = dofs.degree
    n = dofs.n_dofs
    cd = np.asarray(dofs.cell_dofs, dtype=np.int64)
    stride = np.array([(p + 1)**d for d in range(dim)], dtype=np.int64)
    P = len(anchors)
    L = lat.shape[0]
    out = np.full((P, L), n, dtype=np.int64)
    rows = np.arange(P)
    pats, inv = np.unique(off, axis=0, return_inverse=True)
    for pi, pat in enumerate(pats):
        slots = np.where(inv == pi)[0]
        if (pat == 0).all():
            flat = (lat[slots] * stride).sum(axis=1)
            out[:, slots] = cd[anchors[:, None], flat[None, :]]
            continue
        # walk face maps axis by axis (same order as the scalar path),
        # composing (A, b) for all patches simultaneously
        cur = anchors.copy()
        A = np.broadcast_to(np.eye(dim, dtype=np.int64),
                            (P, dim, dim)).copy()
        b = np.zeros((P, dim), dtype=np.int64)
        ok = np.ones(P, dtype=bool)
        for d2 in range(dim):
            if pat[d2] == 0:
                continue
            e = A[:, :, d2]
            axis = np.argmax(np.abs(e), axis=1)
            sign = e[rows, axis] * pat[d2]
            face = 2 * axis + (sign > 0)
            nxt = nall[cur, face]
            step_ok = ok & (nxt >= 0)
            A2 = Aall[cur, face]
            b2 = ball[cur, face]
            A = np.where(step_ok[:, None, None], A2 @ A, A)
            b = np.where(step_ok[:, None],
                         np.einsum("cij,cj->ci", A2, b) + b2, b)
            cur = np.where(step_ok, nxt, cur)
            ok = step_ok
        # all slots of the group share (cur, A, b): node = A·coords + p·b
        node = (np.einsum("cij,lj->cli", A, lat[slots])
                + p * b[:, None, :])                      # (P, Lg, dim)
        valid = (ok[:, None] & (node >= 0).all(axis=2)
                 & (node <= p).all(axis=2))
        flat = np.clip((node * stride).sum(axis=2), 0, cd.shape[1] - 1)
        out[:, slots] = np.where(valid, cd[cur[:, None], flat], n)
    return out


def general_vertex_patch_indices(dofs: GeneralDofHandler):
    """Vertex-star patches on an unstructured mesh.

    One patch per interior vertex: the (2p-1)^dim interior nodes of the
    2^dim surrounding cells (reference get_dof_indices_vertex_patch,
    /root/reference/include/dof_tools.h:206-300), resolved in the ANCHOR
    cell's frame (anchor = lowest-id adjacent cell) through the same composed
    face-map walks as the overlap patches — each axis crosses at most one
    face (|t| <= p-1 < p).

    Returns (idx (P, (2p-1)^dim) int32 with pad = n_dofs,
             extents (P, dim, 2) per anchor-frame axis: width of the t<0 cell
             and of the t>0 cell — the vertex_patch_1d_matrices operands)."""
    mesh = dofs.mesh
    dim = mesh.dim
    p = dofs.degree
    C = mesh.n_cells_total
    n = dofs.n_dofs
    m = 2 * p - 1
    nall, Aall, ball = _face_map_arrays(mesh)
    vc = _VERTEX_COORDS[dim]

    # anchor: lowest adjacent cell id per interior vertex, + its local corner
    bnd = mesh.boundary_vertex_mask()
    anchor = np.full(mesh.n_vertices, C, dtype=np.int64)
    np.minimum.at(anchor, mesh.cells.reshape(-1),
                  np.repeat(np.arange(C), 2**dim))
    vids = np.where(~bnd & (anchor < C))[0]
    corner = np.argmax(mesh.cells[anchor[vids]] == vids[:, None], axis=1)
    anchors_all = anchor[vids]

    # per-cell harmonic widths along each local axis (center extent)
    ext_c = np.asarray(mesh.harmonic_patch_extents(p + 1))[:, :, 1]  # (C, dim)

    t = np.arange(m) - (p - 1)  # [-(p-1), p-1]
    lat_t = np.stack([np.tile(np.repeat(t, m**d), m**(dim - 1 - d))
                      for d in range(dim)], axis=1)  # (L, dim), x fastest

    P = len(vids)
    idx = np.full((P, m**dim), n, dtype=np.int64)
    extents = np.zeros((P, dim, 2))
    for q in range(2**dim):
        sel = np.where(corner == q)[0]
        if sel.size == 0:
            continue
        qv = vc[q].astype(np.int64)  # corner coords in the anchor frame
        lat = lat_t + p * qv[None, :]
        off = np.where(lat < 0, -1, np.where(lat > p, 1, 0))
        anchors = anchors_all[sel]
        idx[sel] = _walk_patch_indices(dofs, nall, Aall, ball, anchors,
                                       lat, off)
        # extents: per axis d the two cell widths around the vertex.  The
        # side WITHIN the anchor contributes the anchor's own width; the
        # other side is the neighbor across face 2d+q[d], measured along the
        # image |A e_d| of the axis in the neighbor's frame.
        for d in range(dim):
            face = 2 * d + int(qv[d])
            nbr = nall[anchors, face]
            e = Aall[anchors, face][:, :, d]
            ax_n = np.argmax(np.abs(e), axis=1)
            h_own = ext_c[anchors, d]
            h_nbr = np.where(nbr >= 0,
                             ext_c[np.clip(nbr, 0, C - 1), ax_n], h_own)
            # q[d]=1: t<0 inside the anchor, t>0 in the neighbor; q[d]=0 flips
            if qv[d] == 1:
                extents[sel, d, 0] = h_own
                extents[sel, d, 1] = h_nbr
            else:
                extents[sel, d, 0] = h_nbr
                extents[sel, d, 1] = h_own
    mask = dofs.boundary_mask
    idx = np.where((idx < n) & ~mask[np.clip(idx, 0, n - 1)], idx, n)
    return idx.astype(np.int32), extents


def general_element_patch_indices_scalar(dofs: GeneralDofHandler,
                                         n_overlap: int) -> np.ndarray:
    """Scalar reference twin of general_element_patch_indices (regression
    oracle; O(C·m^dim) Python — do not use in production setup)."""
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
