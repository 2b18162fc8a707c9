"""Pallas TPU kernel: fused lattice window → local (L,L) GEMM → overlap-add.

The hot structure shared by the sum-factorized operator and the FDM smoother
(SURVEY.md §3.2 hot loops) is

    dst = OverlapAdd( A_local · Windows(u) )

with A_local an (L, L) = (m^dim, m^dim) matrix per cell.  Pure-XLA versions
bottom out at ~12-18 ms for 17M DoF (layout shuffles between the grid layout
and the cell layout run far below HBM bandwidth).  This kernel streams the
grid once: each program DMAs one z-row slab (m, Py, Px) into VMEM, forms the
windows in-register (reshape + thin strided columns), runs ONE MXU GEMM
(L, L)x(L, Cy·Cx), overlap-adds y/x in VMEM, and writes an exclusive
(m, Py, Px) z-slab; the z-direction overlap-add (the only cross-program
reduction) happens outside in XLA on slot-separated slabs, so no scatter ever
serializes.

The same kernel applies the Laplace cell matrix (one shared A on uniform
Cartesian meshes — reference operator.h:917 fast path) and the FDM patch
inverse (dominant interior pattern; boundary patterns are fixed up outside on
the few boundary cells).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _split_last(a, C: int, p: int, m: int):
    """Windows along the last axis: (..., C*p + m-p) -> (..., C, m).

    Stride-free (Mosaic cannot lower >2D strided gathers): slot s >= p of
    window c equals slot s-p of window c+1's core, so the overlap columns are
    shifted views of the core plus one padded tail element.
    """
    lead = a.shape[:-1]
    core = a[..., : C * p].reshape(lead + (C, p))
    cols = []
    for s in range(p, m):
        k, q = divmod(s, p)
        pieces = [core[..., k:, q]] if k < C else []
        for j in range(min(k, C)):
            idx = C * p + j * p + q
            pieces.append(a[..., idx : idx + 1])
        cols.append(jnp.concatenate(pieces, axis=-1)[..., None])
    return jnp.concatenate([core] + cols, axis=-1)


def _merge_last(w, C: int, p: int, m: int, out_len: int):
    """Inverse overlap-add along the last axis: (..., C, m) -> (..., out_len)."""
    lead = w.shape[:-2]
    zeros = lambda k: jnp.zeros(lead + (k,), w.dtype)
    # core region: padded index c·p+q receives slot q+k·p of window c−k
    cols = []
    for q in range(p):
        col = w[..., :, q]
        k = 1
        while q + k * p < m and k <= C:
            col = col + jnp.concatenate(
                [zeros(min(k, C)), w[..., : C - k, q + k * p]], axis=-1)
            k += 1
        cols.append(col[..., None])
    oc = jnp.concatenate(cols, axis=-1).reshape(lead + (C * p,))
    # tail region: padded index C·p+t receives slot k·p+t of window C−k, k ≥ 1
    tails = []
    for t in range(out_len - C * p):
        acc = None
        k = 1
        while k * p + t < m and k <= C:
            term = w[..., C - k, k * p + t]
            acc = term if acc is None else acc + term
            k += 1
        tails.append(acc[..., None] if acc is not None else zeros(1))
    tail = jnp.concatenate(tails, axis=-1) if tails else zeros(0)
    return jnp.concatenate([oc, tail], axis=-1)


def _kernel(u_hbm, A_ref, out_ref, slab, sem, *, p, m, cy, cx, py, px):
    z = pl.program_id(0)
    copy = pltpu.make_async_copy(u_hbm.at[pl.ds(z * p, m)], slab, sem)
    copy.start()
    copy.wait()
    s = slab[:]  # (m, Py, Px)

    # windows: y then x
    wy = jnp.moveaxis(_split_last(jnp.moveaxis(s, 1, -1), cy, p, m), (-2, -1), (1, 2))
    # wy: (m, Cy, m, Px)
    wx = _split_last(wy, cx, p, m)  # (m, Cy, m, Cx, m)

    W = wx.transpose(0, 2, 4, 1, 3).reshape(m * m * m, cy * cx)
    V = jnp.dot(A_ref[:], W, preferred_element_type=jnp.float32).astype(s.dtype)
    v = V.reshape(m, m, m, cy, cx).transpose(0, 3, 1, 4, 2)  # (m, Cy, m, Cx, m)

    # overlap-add x then y
    ox = _merge_last(v, cx, p, m, px)              # (m, Cy, m, Px)
    oy = _merge_last(jnp.moveaxis(ox, (1, 2), (-2, -1)), cy, p, m, py)
    out_ref[0] = jnp.moveaxis(oy, -1, 1)           # (m, Py, Px)


@functools.partial(
    jax.jit, static_argnames=("n_cells", "degree", "m", "overlap", "periodic"))
def lattice_local_apply(u_grid, A, n_cells, degree, m, overlap, periodic):
    """dst_grid = OverlapAdd(A · Windows(u_grid)) for dim=3 via the Pallas kernel.

    u_grid: (Nz, Ny, Nx); A: (m^3, m^3). Returns (Nz, Ny, Nx).
    """
    from ..lattice import _pad_amounts

    p = degree
    dim = 3
    cz, cy, cx = tuple(reversed(n_cells))  # cells per grid axis (z, y, x)
    grid_shape = u_grid.shape
    pads = []
    for a, (cc, per) in enumerate(zip((cz, cy, cx),
                                      tuple(reversed(periodic)))):
        lo, hi = _pad_amounts(grid_shape[a], cc, p, m, overlap, per)
        pads.append((lo, hi))
    up = u_grid
    if any(pd != (0, 0) for pd in pads):
        for a in range(dim):
            if pads[a] == (0, 0):
                continue
            pad = [(0, 0)] * dim
            pad[a] = pads[a]
            per = tuple(reversed(periodic))[a]
            up = jnp.pad(up, pad, mode="wrap" if per else "constant")
    pz, py, px = up.shape

    out = pl.pallas_call(
        functools.partial(_kernel, p=p, m=m, cy=cy, cx=cx, py=py, px=px),
        grid=(cz,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, m, py, px), lambda z: (z, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cz, m, py, px), u_grid.dtype),
        scratch_shapes=[
            pltpu.VMEM((m, py, px), u_grid.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(up, A)

    # z overlap-add outside (slot-separated slabs -> conflict-free adds)
    res = jnp.zeros((pz, py, px), u_grid.dtype)
    res = res.at[: cz * p].add(
        out[:, :p].reshape(cz * p, py, px))
    for s in range(p, m):
        res = res.at[s : s + (cz - 1) * p + 1 : p].add(out[:, s])

    # unpad (with periodic wrap-back)
    for a in range(dim):
        lo, hi = pads[a]
        if lo == 0 and hi == 0:
            continue
        per = tuple(reversed(periodic))[a]
        res = jnp.moveaxis(res, a, -1)
        core = res[..., lo : lo + grid_shape[a]]
        if per:
            if lo:
                core = core.at[..., grid_shape[a] - lo :].add(res[..., :lo])
            if hi:
                core = core.at[..., :hi].add(res[..., lo + grid_shape[a] :])
        res = jnp.moveaxis(core, -1, a)
    return res
