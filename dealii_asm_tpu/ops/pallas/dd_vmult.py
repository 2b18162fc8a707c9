"""Pallas TPU kernels: double-single (two-f32) separable banded Laplace vmult.

The f64 outer-Krylov matvec (mixed-precision P8 architecture, reference
/root/reference/element_centered_preconitioners_01.cc:780-792 — MG levels in
float, outer solve in double) runs as Dekker/TwoSum double-single chains
(ops/ddmath.py).  The XLA composition (tensorops.separable_laplace_apply_banded_dd)
reaches only ~13% of VPU peak — it materializes padded/split intermediates in
HBM between the 8 banded axis applies.  Here the same arithmetic runs on
z-slabs resident in VMEM in three kernels:

  x-dual   (ah,al,kh,kl) = (M̂x u, K̂x u): lane rolls, ONE operand split and
           one set of rolls shared by both diagonal tables;
  y-dual   (M̂y a, K̂y a) the same along sublanes;
  y-single M̂y t;
  z-triple v = K̂z b + M̂z c + M̂z d: banded z-contraction over 3-block input
           windows with per-row scalar tables (SMEM), the three contractions
           and the two dd additions fused in one HBM pass.

Chain (tensorops.py:388-393): a = M̂x u, k = K̂x u; b = M̂y a, c = K̂y a,
d = M̂y k; v = K̂z b + M̂z c + M̂z d.

All arrays are front/back-padded by one z-block so the z-window index maps
stay affine; lane/sublane padding is killed by zeros in the diagonal tables
(as in smoother_step.py).  Restrictions: dim == 3, non-periodic, Cartesian
separable (coeff None), bandwidth p ≤ BLK.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 8  # z-planes per grid step (sublane tile multiple)


# XLA:CPU's fusion path silently degrades the error-free transforms below:
# compiled dd results deviate ~3e-8 (plain-f32 level) from the identical
# arithmetic run per-op (eager) or on the TPU Mosaic backend, which are both
# dd-exact to ~1e-14.  Bisected on a 2-term minimal repro: the emitted HLO is
# structurally complete, the LLVM kernels carry no fast-math flags, no FMA
# contraction and no f64 promotion — yet `--xla_disable_hlo_passes=fusion`
# restores exactness, so the defect sits in the CPU fusion emitter itself.
# optimization_barrier does NOT help (results bit-identical with/without).
# Interpret-mode (CPU test) callers therefore compile their wrapping jit with
# compiler_options={"xla_disable_hlo_passes": "fusion"}; the production TPU
# path needs nothing.
EXACT_EFT_CPU_COMPILER_OPTIONS = {"xla_disable_hlo_passes": "fusion"}


def _split12(a):
    c = 4097.0 * a  # Veltkamp split, 2^12 + 1 (ops/ddmath.py:split12)
    big = c - a
    hi = c - big
    return hi, a - hi


def _two_sum(a, b):
    s = a + b
    bv = s - a
    return s, (a - (s - bv)) + (b - bv)


def _qtwo_sum(a, b):
    s = a + b
    return s, b - (s - a)


def _band_roll_dual(xh, xl, xhh, xhl, tabs, n_diag, axis):
    """Banded dd apply of one or two diagonal tables along ``axis`` of a
    plane, sharing the rolls of the four split operand arrays.

    tabs: list of (Dh, Dl, Dhh, Dhl) slicers: fns k -> broadcastable arrays.
    Returns a list of (hi, lo) pairs, one per table."""
    accs = [None] * len(tabs)
    p = (n_diag - 1) // 2
    n = xh.shape[axis]
    for k in range(n_diag):
        shift = np.int32((p - k) % n)  # i32 even under an x64 trace context
        rh = pltpu.roll(xh, shift, axis)
        rl = pltpu.roll(xl, shift, axis)
        rhh = pltpu.roll(xhh, shift, axis)
        rhl = pltpu.roll(xhl, shift, axis)
        for j, tab in enumerate(tabs):
            Dh, Dl, Dhh, Dhl = (t(k) for t in tab)
            prod = Dh * rh
            e = (((Dhh * rhh - prod) + Dhh * rhl) + Dhl * rhh) + Dhl * rhl
            e = e + (Dh * rl + Dl * rh)
            if accs[j] is None:
                accs[j] = (prod, e)
            else:
                ah, ac = accs[j]
                ah, e2 = _two_sum(ah, prod)
                accs[j] = (ah, ac + (e2 + e))
    return [_qtwo_sum(h, c) for h, c in accs]


def _kern_x_dual(xh_ref, xl_ref, mh_ref, ml_ref, mhh_ref, mhl_ref,
                 kh_ref, kl_ref, khh_ref, khl_ref,
                 ah_ref, al_ref, bh_ref, bl_ref, *, blk, n_diag):
    mtab = tuple((lambda k, r=r: r[k : k + 1, :])
                 for r in (mh_ref, ml_ref, mhh_ref, mhl_ref))
    ktab = tuple((lambda k, r=r: r[k : k + 1, :])
                 for r in (kh_ref, kl_ref, khh_ref, khl_ref))
    for t in range(blk):
        xh = xh_ref[t]
        xl = xl_ref[t]
        xhh, xhl = _split12(xh)
        (a, al_), (b, bl_) = _band_roll_dual(
            xh, xl, xhh, xhl, [mtab, ktab], n_diag, 1)
        ah_ref[t] = a
        al_ref[t] = al_
        bh_ref[t] = b
        bl_ref[t] = bl_


def _kern_y(xh_ref, xl_ref, mh_ref, ml_ref, mhh_ref, mhl_ref,
            kh_ref, kl_ref, khh_ref, khl_ref,
            *out_refs, blk, n_diag, dual: bool):
    mtab = tuple((lambda k, r=r: r[:, k : k + 1])
                 for r in (mh_ref, ml_ref, mhh_ref, mhl_ref))
    ktab = tuple((lambda k, r=r: r[:, k : k + 1])
                 for r in (kh_ref, kl_ref, khh_ref, khl_ref))
    tabs = [mtab, ktab] if dual else [mtab]
    for t in range(blk):
        xh = xh_ref[t]
        xl = xl_ref[t]
        xhh, xhl = _split12(xh)
        outs = _band_roll_dual(xh, xl, xhh, xhl, tabs, n_diag, 0)
        for j, (h, lo) in enumerate(outs):
            out_refs[2 * j][t] = h
            out_refs[2 * j + 1][t] = lo


def _dd_band_accum(accs, xh, xl, tabs, n_diag, axis, stride: int = 1):
    """Accumulate banded dd applies of (xh, xl) by each table into accs.

    Split-after-roll variant of ``_band_roll_dual``: rolls only the two
    operand arrays per diagonal and re-splits the rolled hi in-register
    (3 VPU flops) — rolls are the expensive part (cross-lane relayout),
    halving them wins over re-splitting.  accs entries may be None (fresh)
    or (hi, compensation) pairs from a previous input (chain continuation),
    so two banded applies sharing one output (e.g. K̂y a + M̂y k) merge into
    ONE TwoSum chain with no final dd-add.

    ``stride``: roll step per diagonal — 1 for lane-window bands; m for the
    z-bands of a fused (z·m+y)-row layout (lanes_vmult.py), where diagonal
    δ reads row offset δ·m."""
    p = (n_diag - 1) // 2
    n = xh.shape[axis]
    for k in range(n_diag):
        shift = np.int32(((p - k) * stride) % n)
        rh = pltpu.roll(xh, shift, axis)
        rl = pltpu.roll(xl, shift, axis)
        rhh, rhl = _split12(rh)
        for j, tab in enumerate(tabs):
            Dh, Dl, Dhh, Dhl = (t(k) for t in tab)
            prod = Dh * rh
            e = (((Dhh * rhh - prod) + Dhh * rhl) + Dhl * rhh) + Dhl * rhl
            e = e + (Dh * rl + Dl * rh)
            if accs[j] is None:
                accs[j] = (prod, e)
            else:
                ah, ac = accs[j]
                ah, e2 = _two_sum(ah, prod)
                accs[j] = (ah, ac + (e2 + e))
    return accs


def _kern_xy(xh_ref, xl_ref,
             mxh, mxl, mxhh, mxhl, kxh, kxl, kxhh, kxhl,
             myh, myl, myhh, myhl, kyh, kyl, kyhh, kyhl,
             bh_ref, bl_ref, sh_ref, sl_ref, *, blk, n_diag):
    """Fused x+y transform planes: b = M̂y M̂x x,  s = K̂y M̂x x + M̂y K̂x x.

    Both transforms are within-plane (no z coupling), so one kernel keeps the
    x-stage intermediates (a = M̂x x, k = K̂x x) in registers/VMEM — the
    4-pass chain wrote and re-read them through HBM.  The two y-streams that
    share the z-side M̂z table downstream (c = K̂y a and d = M̂y k) accumulate
    into ONE dd chain s, so the z-pass contracts two streams, not three."""
    mxtab = tuple((lambda k, r=r: r[k : k + 1, :])
                  for r in (mxh, mxl, mxhh, mxhl))
    kxtab = tuple((lambda k, r=r: r[k : k + 1, :])
                  for r in (kxh, kxl, kxhh, kxhl))
    mytab = tuple((lambda k, r=r: r[:, k : k + 1])
                  for r in (myh, myl, myhh, myhl))
    kytab = tuple((lambda k, r=r: r[:, k : k + 1])
                  for r in (kyh, kyl, kyhh, kyhl))
    for t in range(blk):
        xh = xh_ref[t]
        xl = xl_ref[t]
        accs = _dd_band_accum([None, None], xh, xl, [mxtab, kxtab], n_diag, 1)
        (ah_, al_) = _qtwo_sum(*accs[0])
        (kh_, kl_) = _qtwo_sum(*accs[1])
        accs = _dd_band_accum([None, None], ah_, al_, [mytab, kytab],
                              n_diag, 0)
        accs[1:] = _dd_band_accum(accs[1:], kh_, kl_, [mytab], n_diag, 0)
        bh, bl = _qtwo_sum(*accs[0])
        sh, sl = _qtwo_sum(*accs[1])
        bh_ref[t] = bh
        bl_ref[t] = bl
        sh_ref[t] = sh
        sl_ref[t] = sl


def _kern_z_dual(ktabs_ref, mtabs_ref,
                 b0h, b1h, b2h, b0l, b1l, b2l,
                 s0h, s1h, s2h, s0l, s1l, s2l,
                 vh_ref, vl_ref, *, blk, n_diag):
    """v rows = Σ_k Kz[r,k]·b[r+k−p] + Mz[r,k]·s[…]  (s = c + d merged)."""
    i = pl.program_id(0)
    p = (n_diag - 1) // 2
    refs = ((b0h, b1h, b2h), (b0l, b1l, b2l),
            (s0h, s1h, s2h), (s0l, s1l, s2l))

    for t in range(blk):
        r = (i + 1) * blk + t
        acc_h = acc_c = None
        for k in range(n_diag):
            rel = t + k - p + blk
            ref_i, row = rel // blk, rel % blk
            planes = [refs[q][ref_i][row] for q in range(4)]
            for tab, (ph, plo) in ((ktabs_ref, (planes[0], planes[1])),
                                   (mtabs_ref, (planes[2], planes[3]))):
                Dh = tab[r, k]
                Dl = tab[r, n_diag + k]
                Dhh = tab[r, 2 * n_diag + k]
                Dhl = tab[r, 3 * n_diag + k]
                phh, phl = _split12(ph)
                prod = Dh * ph
                e = ((Dhh * phh - prod) + Dhh * phl + Dhl * phh) + Dhl * phl
                e = e + (Dh * plo + Dl * ph)
                if acc_h is None:
                    acc_h, acc_c = prod, e
                else:
                    acc_h, e2 = _two_sum(acc_h, prod)
                    acc_c = acc_c + (e2 + e)
        vh, vl = _qtwo_sum(acc_h, acc_c)
        vh_ref[t] = vh
        vl_ref[t] = vl


def _kern_z_triple(ktabs_ref, mtabs_ref,
                   b0h, b1h, b2h, b0l, b1l, b2l,
                   c0h, c1h, c2h, c0l, c1l, c2l,
                   d0h, d1h, d2h, d0l, d1l, d2l,
                   vh_ref, vl_ref, *, blk, n_diag):
    """v rows = Σ_k Kz[r,k]·b[r+k−p] + Mz[r,k]·c[…] + Mz[r,k]·d[…].

    ktabs/mtabs: SMEM (nz_pad, 4·n_diag) rows [Dh | Dl | Dhh | Dhl] per
    diagonal; input planes come from the three block-offset refs (window
    i−1, i, i+1 via front padding)."""
    i = pl.program_id(0)
    p = (n_diag - 1) // 2
    refs = ((b0h, b1h, b2h), (b0l, b1l, b2l),
            (c0h, c1h, c2h), (c0l, c1l, c2l),
            (d0h, d1h, d2h), (d0l, d1l, d2l))

    for t in range(blk):
        r = (i + 1) * blk + t  # padded row of the out block (maps to i+1)
        acc_h = acc_c = None
        for k in range(n_diag):
            rel = t + k - p + blk  # row into the 3-block window
            ref_i, row = rel // blk, rel % blk
            planes = [refs[q][ref_i][row] for q in range(6)]
            for tab, (ph, plo) in ((ktabs_ref, (planes[0], planes[1])),
                                   (mtabs_ref, (planes[2], planes[3])),
                                   (mtabs_ref, (planes[4], planes[5]))):
                Dh = tab[r, k]
                Dl = tab[r, n_diag + k]
                Dhh = tab[r, 2 * n_diag + k]
                Dhl = tab[r, 3 * n_diag + k]
                phh, phl = _split12(ph)
                prod = Dh * ph
                e = ((Dhh * phh - prod) + Dhh * phl + Dhl * phh) + Dhl * phl
                e = e + (Dh * plo + Dl * ph)
                if acc_h is None:
                    acc_h, acc_c = prod, e
                else:
                    acc_h, e2 = _two_sum(acc_h, prod)
                    acc_c = acc_c + (e2 + e)
        vh, vl = _qtwo_sum(acc_h, acc_c)
        vh_ref[t] = vh
        vl_ref[t] = vl


def _pad_tab_x(dtab4, nxp):
    return [np.pad(np.asarray(t, np.float32), ((0, 0), (0, nxp - t.shape[1])))
            for t in dtab4]


class DDVmultKernel:
    """v = A·u in double-single arithmetic as four fused Pallas passes."""

    def __init__(self, op, interpret: bool = False):
        mesh = op.mesh
        if (op.dim != 3 or any(mesh.periodic) or op.coeff is not None
                or not op.Mdd):
            raise ValueError("DDVmultKernel: unsupported configuration")
        p = op.degree
        if p > BLK:
            raise ValueError("DDVmultKernel: bandwidth exceeds block")
        self.n_diag = 2 * p + 1
        nz, ny, nx = (op.dofs.nodes_per_dim[2], op.dofs.nodes_per_dim[1],
                      op.dofs.nodes_per_dim[0])
        self.grid_shape = (nz, ny, nx)
        nzp = -(-nz // BLK) * BLK
        nyp = -(-ny // 8) * 8
        nxp = -(-nx // 128) * 128
        self.pad = ((BLK, nzp + BLK - nz), (0, nyp - ny), (0, nxp - nx))
        self.nb = nzp // BLK + 2  # z-blocks incl. one front/back halo block
        self.shape_p = (self.nb * BLK, nyp, nxp)
        self.interpret = interpret

        # tables: host f64 1D factors -> split diagonal tables, zero-padded
        from ..ddmath import split_table_np
        from ..tensorops import banded_diagonals

        def diag4(M1d, n_pad, transpose):
            d, _ = banded_diagonals(np.asarray(M1d, np.float64), p, False)
            tabs = split_table_np(d)  # 4x (n_diag, N)
            out = [np.pad(t.astype(np.float32),
                          ((0, 0), (0, n_pad - t.shape[1]))) for t in tabs]
            if transpose:
                out = [t.T.copy() for t in out]
            return [jnp.asarray(t) for t in out]

        Mx, My, Mz = (np.asarray(m, np.float64) for m in op.M1d_global)
        Kx, Ky, Kz = (np.asarray(k, np.float64) for k in op.K1d_global)
        self.tx = diag4(Mx, nxp, False) + diag4(Kx, nxp, False)
        self.ty = diag4(My, nyp, True) + diag4(Ky, nyp, True)

        # z scalar tables: rows [Dh | Dl | Dhh | Dhl], front/back block pad
        def ztab(M1d):
            d, _ = banded_diagonals(np.asarray(M1d, np.float64), p, False)
            tabs = split_table_np(d)  # 4x (n_diag, nz)
            t = np.zeros((self.nb * BLK, 4 * self.n_diag), np.float32)
            for q in range(4):
                t[BLK : BLK + nz, q * self.n_diag : (q + 1) * self.n_diag] = (
                    tabs[q].T)
            return jnp.asarray(t)

        self.tzk = ztab(Kz)
        self.tzm = ztab(Mz)

    # -- pallas calls --------------------------------------------------------

    def _call_x(self, xh, xl):
        blkspec = pl.BlockSpec((BLK,) + self.shape_p[1:], lambda i: (i, 0, 0))
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        out = jax.ShapeDtypeStruct(self.shape_p, jnp.float32)
        kern = functools.partial(_kern_x_dual, blk=BLK, n_diag=self.n_diag)
        return pl.pallas_call(
            kern,
            grid=(self.nb,),
            in_specs=[blkspec, blkspec] + [vmem] * 8,
            out_specs=[blkspec] * 4,
            out_shape=[out] * 4,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=self.interpret,
        )(xh, xl, *self.tx)

    def _call_y(self, xh, xl, dual):
        blkspec = pl.BlockSpec((BLK,) + self.shape_p[1:], lambda i: (i, 0, 0))
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        out = jax.ShapeDtypeStruct(self.shape_p, jnp.float32)
        n_out = 4 if dual else 2
        kern = functools.partial(_kern_y, blk=BLK, n_diag=self.n_diag,
                                 dual=dual)
        return pl.pallas_call(
            kern,
            grid=(self.nb,),
            in_specs=[blkspec, blkspec] + [vmem] * 8,
            out_specs=[blkspec] * n_out,
            out_shape=[out] * n_out,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=self.interpret,
        )(xh, xl, *self.ty)

    def _call_xy(self, xh, xl):
        # one z-plane per grid step: the fused x+y dd chains keep ~20 plane
        # values live; at BLK=8 unrolled planes Mosaic spills ~100 MB of
        # VMEM (measured) and the compile OOMs.
        xyblk = 1
        blkspec = pl.BlockSpec((xyblk,) + self.shape_p[1:],
                               lambda i: (i, 0, 0))
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        out = jax.ShapeDtypeStruct(self.shape_p, jnp.float32)
        kern = functools.partial(_kern_xy, blk=xyblk, n_diag=self.n_diag)
        return pl.pallas_call(
            kern,
            grid=(self.shape_p[0] // xyblk,),
            in_specs=[blkspec, blkspec] + [vmem] * 16,
            out_specs=[blkspec] * 4,
            out_shape=[out] * 4,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=self.interpret,
        )(xh, xl, *self.tx, *self.ty)

    def _call_z2(self, b2, s2):
        nbz = self.nb - 2
        nyp, nxp = self.shape_p[1], self.shape_p[2]
        ty = nyp
        while 28 * BLK * ty * nxp * 4 > 80 * 1024 * 1024 or ty % 8:
            for cand in range(ty - 1, 0, -1):
                if nyp % cand == 0:
                    ty = cand
                    break
        blk3 = (BLK, ty, nxp)
        blk_o = pl.BlockSpec(blk3, lambda i, j: (i + 1, j, 0))
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        wins = [pl.BlockSpec(blk3, lambda i, j, off=off: (i + off, j, 0))
                for off in range(3)]
        out = jax.ShapeDtypeStruct(self.shape_p, jnp.float32)
        kern = functools.partial(_kern_z_dual, blk=BLK, n_diag=self.n_diag)
        ins = []
        for pair in (b2, s2):
            for arr in pair:
                ins.extend([arr] * 3)
        return pl.pallas_call(
            kern,
            grid=(nbz, nyp // ty),
            in_specs=[smem, smem] + [w for _ in range(4) for w in wins],
            out_specs=[blk_o, blk_o],
            out_shape=[out, out],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=self.interpret,
        )(self.tzk, self.tzm, *ins)

    def _call_z(self, b2, c2, d2):
        # window refs at block offsets i-1, i, i+1 (front halo block makes
        # all maps non-negative); out grid skips the halo blocks.  The 18
        # window refs double-buffer, so blocks are tiled along y to fit VMEM
        # (z-contraction has no cross-y coupling).
        nbz = self.nb - 2
        nyp, nxp = self.shape_p[1], self.shape_p[2]
        ty = nyp
        while 40 * BLK * ty * nxp * 4 > 80 * 1024 * 1024 or ty % 8:
            for cand in range(ty - 1, 0, -1):
                if nyp % cand == 0:
                    ty = cand
                    break
        blk3 = (BLK, ty, nxp)
        blk_o = pl.BlockSpec(blk3, lambda i, j: (i + 1, j, 0))
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        wins = [pl.BlockSpec(blk3, lambda i, j, off=off: (i + off, j, 0))
                for off in range(3)]
        out = jax.ShapeDtypeStruct(self.shape_p, jnp.float32)
        kern = functools.partial(_kern_z_triple, blk=BLK, n_diag=self.n_diag)
        ins = []
        for pair in (b2, c2, d2):
            for arr in pair:
                ins.extend([arr] * 3)
        # interleave: refs arrive grouped (b0h,b1h,b2h,b0l,...) per signature
        return pl.pallas_call(
            kern,
            grid=(nbz, nyp // ty),
            in_specs=[smem, smem] + [w for _ in range(6) for w in wins],
            out_specs=[blk_o, blk_o],
            out_shape=[out, out],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=self.interpret,
        )(self.tzk, self.tzm, *ins)

    # -- public --------------------------------------------------------------

    def vmult_dd(self, uh, ul, fused: bool = True):
        """(uh, ul) -> (vh, vl), flat (n_dofs,) f32 pairs.

        fused=True (default): 2-pass chain — one xy kernel (x-stage
        intermediates never touch HBM; the two M̂z-bound y-streams merge
        into one s = c + d accumulator) + a dual-stream z contraction.
        fused=False keeps the original 4-pass chain (A/B reference)."""
        nz, ny, nx = self.grid_shape
        from jax._src.config import enable_x64 as _enable_x64

        with _enable_x64(False):
            xh = jnp.pad(uh.reshape(nz, ny, nx).astype(jnp.float32), self.pad)
            xl = jnp.pad(ul.reshape(nz, ny, nx).astype(jnp.float32), self.pad)
            if fused:
                bh, bl, sh, sl_ = self._call_xy(xh, xl)
                vh, vl = self._call_z2((bh, bl), (sh, sl_))
            else:
                ah, al, kh, kl = self._call_x(xh, xl)
                bh, bl, ch, cl = self._call_y(ah, al, True)
                dh, dl = self._call_y(kh, kl, False)
                vh, vl = self._call_z((bh, bl), (ch, cl), (dh, dl))
        sl = (slice(BLK, BLK + nz), slice(0, ny), slice(0, nx))
        return (vh[sl].reshape(-1), vl[sl].reshape(-1))


# ---------------------------------------------------------------------------
# Single-precision (f32) variants: identical banded structure, plain mads.
# VPU f32 products are exactly-rounded — numerically equivalent to the XLA
# composition's 3-pass HIGHEST matmuls (measured 11.7 ms for the fine-level
# MG residual at 17M DoF) at a fraction of the work.
# ---------------------------------------------------------------------------


def _band_roll_f32(x, tabs, n_diag, axis):
    accs = [None] * len(tabs)
    p = (n_diag - 1) // 2
    n = x.shape[axis]
    for k in range(n_diag):
        rolled = pltpu.roll(x, np.int32((p - k) % n), axis)
        for j, tab in enumerate(tabs):
            term = tab(k) * rolled
            accs[j] = term if accs[j] is None else accs[j] + term
    return accs


def _kern_x_dual_f32(x_ref, m_ref, k_ref, a_ref, b_ref, *, blk, n_diag):
    mtab = lambda k: m_ref[k : k + 1, :]
    ktab = lambda k: k_ref[k : k + 1, :]
    for t in range(blk):
        a, b = _band_roll_f32(x_ref[t], [mtab, ktab], n_diag, 1)
        a_ref[t] = a
        b_ref[t] = b


def _kern_y_f32(x_ref, m_ref, k_ref, *out_refs, blk, n_diag, dual):
    mtab = lambda k: m_ref[:, k : k + 1]
    ktab = lambda k: k_ref[:, k : k + 1]
    tabs = [mtab, ktab] if dual else [mtab]
    for t in range(blk):
        outs = _band_roll_f32(x_ref[t], tabs, n_diag, 0)
        for j, o in enumerate(outs):
            out_refs[j][t] = o


def _kern_z_triple_f32(ktab_ref, mtab_ref,
                       b0, b1, b2, c0, c1, c2, d0, d1, d2,
                       v_ref, *, blk, n_diag):
    i = pl.program_id(0)
    p = (n_diag - 1) // 2
    refs = ((b0, b1, b2), (c0, c1, c2), (d0, d1, d2))
    for t in range(blk):
        r = (i + 1) * blk + t
        acc = None
        for k in range(n_diag):
            rel = t + k - p + blk
            ref_i, row = rel // blk, rel % blk
            term = (ktab_ref[r, k] * refs[0][ref_i][row]
                    + mtab_ref[r, k] * refs[1][ref_i][row]
                    + mtab_ref[r, k] * refs[2][ref_i][row])
            acc = term if acc is None else acc + term
        v_ref[t] = acc


class F32VmultKernel:
    """v = A·u (separable banded, f32) as four fused Pallas passes."""

    def __init__(self, op, interpret: bool = False):
        mesh = op.mesh
        if (op.dim != 3 or any(mesh.periodic) or op.coeff is not None):
            raise ValueError("F32VmultKernel: unsupported configuration")
        p = op.degree
        if p > BLK:
            raise ValueError("F32VmultKernel: bandwidth exceeds block")
        self.n_diag = 2 * p + 1
        nz, ny, nx = (op.dofs.nodes_per_dim[2], op.dofs.nodes_per_dim[1],
                      op.dofs.nodes_per_dim[0])
        self.grid_shape = (nz, ny, nx)
        nzp = -(-nz // BLK) * BLK
        nyp = -(-ny // 8) * 8
        nxp = -(-nx // 128) * 128
        self.pad = ((BLK, nzp + BLK - nz), (0, nyp - ny), (0, nxp - nx))
        self.nb = nzp // BLK + 2
        self.shape_p = (self.nb * BLK, nyp, nxp)
        self.interpret = interpret

        from ..tensorops import banded_diagonals

        def diag1(M1d, n_pad, transpose):
            d, _ = banded_diagonals(np.asarray(M1d, np.float64), p, False)
            t = np.pad(d.astype(np.float32),
                       ((0, 0), (0, n_pad - d.shape[1])))
            return jnp.asarray(t.T.copy() if transpose else t)

        Mx, My, Mz = (np.asarray(m, np.float64) for m in op.M1d_global)
        Kx, Ky, Kz = (np.asarray(k, np.float64) for k in op.K1d_global)
        self.tx = [diag1(Mx, nxp, False), diag1(Kx, nxp, False)]
        self.ty = [diag1(My, nyp, True), diag1(Ky, nyp, True)]

        def ztab(M1d):
            d, _ = banded_diagonals(np.asarray(M1d, np.float64), p, False)
            t = np.zeros((self.nb * BLK, self.n_diag), np.float32)
            t[BLK : BLK + nz] = d.T.astype(np.float32)
            return jnp.asarray(t)

        self.tzk = ztab(Kz)
        self.tzm = ztab(Mz)

    def _params(self):
        return pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024)

    def _call_x(self, x):
        blkspec = pl.BlockSpec((BLK,) + self.shape_p[1:], lambda i: (i, 0, 0))
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        out = jax.ShapeDtypeStruct(self.shape_p, jnp.float32)
        kern = functools.partial(_kern_x_dual_f32, blk=BLK,
                                 n_diag=self.n_diag)
        return pl.pallas_call(
            kern, grid=(self.nb,), in_specs=[blkspec, vmem, vmem],
            out_specs=[blkspec] * 2, out_shape=[out] * 2,
            compiler_params=self._params(), interpret=self.interpret,
        )(x, *self.tx)

    def _call_y(self, x, dual):
        blkspec = pl.BlockSpec((BLK,) + self.shape_p[1:], lambda i: (i, 0, 0))
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        out = jax.ShapeDtypeStruct(self.shape_p, jnp.float32)
        n_out = 2 if dual else 1
        kern = functools.partial(_kern_y_f32, blk=BLK, n_diag=self.n_diag,
                                 dual=dual)
        res = pl.pallas_call(
            kern, grid=(self.nb,), in_specs=[blkspec, vmem, vmem],
            out_specs=[blkspec] * n_out, out_shape=[out] * n_out,
            compiler_params=self._params(), interpret=self.interpret,
        )(x, *self.ty)
        return res if dual else (res[0],)

    def _call_z(self, b, c, d):
        nbz = self.nb - 2
        nyp, nxp = self.shape_p[1], self.shape_p[2]
        ty = nyp
        while 22 * BLK * ty * nxp * 4 > 80 * 1024 * 1024 or ty % 8:
            for cand in range(ty - 1, 0, -1):
                if nyp % cand == 0:
                    ty = cand
                    break
        blk3 = (BLK, ty, nxp)
        blk_o = pl.BlockSpec(blk3, lambda i, j: (i + 1, j, 0))
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        wins = [pl.BlockSpec(blk3, lambda i, j, off=off: (i + off, j, 0))
                for off in range(3)]
        out = jax.ShapeDtypeStruct(self.shape_p, jnp.float32)
        kern = functools.partial(_kern_z_triple_f32, blk=BLK,
                                 n_diag=self.n_diag)
        ins = [b, b, b, c, c, c, d, d, d]
        return pl.pallas_call(
            kern, grid=(nbz, nyp // ty),
            in_specs=[smem, smem] + [w for _ in range(3) for w in wins],
            out_specs=[blk_o], out_shape=[out],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=self.interpret,
        )(self.tzk, self.tzm, *ins)[0]

    def vmult(self, u):
        """u (n_dofs,) f32 -> A·u (raw, no constraint masking)."""
        nz, ny, nx = self.grid_shape
        from jax._src.config import enable_x64 as _enable_x64

        with _enable_x64(False):
            x = jnp.pad(u.reshape(nz, ny, nx).astype(jnp.float32), self.pad)
            a, k = self._call_x(x)
            b, c = self._call_y(a, True)
            (d,) = self._call_y(k, False)
            v = self._call_z(b, c, d)
        sl = (slice(BLK, BLK + nz), slice(0, ny), slice(0, nx))
        return v[sl].reshape(-1)
