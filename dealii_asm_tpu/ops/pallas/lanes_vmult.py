"""Pallas TPU kernel: fused lane-major (unstructured) Laplace vmult in
double-single arithmetic — the f64 outer-Krylov matvec on hyperball-class
meshes.

The XLA lane-major dd composition (`laplace_general.apply_local_lanes_dd`)
materializes ~40 double-single (m^3, C) intermediates in HBM between
elementwise passes — at ball L=5 (131k cells) this plus the serialized
scatter made the outer matvec seconds per apply (VERDICT r4 missing #1).
The reference serves every mesh family from one full-speed matrix-free
operator (/root/reference/include/operator.h:867-1333); this kernel is the
unstructured counterpart of `merged_vmult.py`, with the whole chain

    g = (∇̂ ⊗ N̂)(u),   t = C g  (symmetric q-point coefficient),
    v = (∇̂ ⊗ N̂)ᵀ(t)

fused per cell block in VMEM.

Layout (the TPU-native trick): cells are independent here (geometry lives
entirely in the streamed coefficient; no neighbor coupling), so the local
(m, m, m, C) tensors are free to pick any 2D tiling.  We use

    rows    r = z·m + y     (m² rows, padded to a sublane multiple)
    lanes   w = c·m + x     (CB cells per block → CB·m lanes)

under which ALL THREE 1D transforms become BANDED roll-FMA applies on one
(R, W) tile — x as lane rolls with window-periodic tables (period m), y as
sublane rolls (period m), z as stride-m sublane rolls — the dd-exact
`_dd_band_accum` machinery of dd_vmult.py, sharing one roll set per input
across the N̂/D̂ images.  The gather/scatter to global DoFs stays outside in
XLA: the gather table is built directly in kernel layout (no transposes),
and the scatter-back is the TransposeScatter gather-transpose
(ops/scatter.py).

Restrictions: dim == 3, lane-major kernel, n_q_1d == degree+1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dd_vmult import _dd_band_accum, _qtwo_sum, _split12, _two_sum
from .merged_vmult import _dd_coeff_acc, _split12_np, _window_diag_tables


def _row_band_tables(B: np.ndarray, m: int, level: int, Rpad: int,
                     transpose: bool):
    """Banded split tables for a (z·m + y)-row transform.

    level 0 = y (row offset δ), level 1 = z (row offset δ·m; pass stride=m
    to _dd_band_accum).  Convention (matching _window_diag_tables):
    forward out[.. i ..] = Σ_s B[i, s] in[.. s ..]; transpose swaps B's
    indices.  Returns 4 arrays (Rpad, n_diag): hi, lo, hi_hi, hi_lo."""
    q, mm = B.shape
    assert q == mm == m
    n_diag = 2 * m - 1
    T = np.zeros((Rpad, n_diag), np.float64)
    r = np.arange(m * m)
    comp = (r // m) if level else (r % m)  # this row's index on the level
    for k in range(n_diag):
        d = k - (m - 1)
        src = comp + d
        ok = (src >= 0) & (src < m)
        if transpose:
            T[r[ok], k] = B[src[ok], comp[ok]]
        else:
            T[r[ok], k] = B[comp[ok], src[ok]]
    h = T.astype(np.float32)
    l = (T - h.astype(np.float64)).astype(np.float32)
    hh, hl = _split12_np(h)
    return h, l, hh, hl


def _kern_lanes_dd(uh_ref, ul_ref, *refs, m: int, n_diag: int):
    """One fused dd lane-major vmult on a (Rpad, Wb) cell block.

    refs order: 12 coeff refs (6 comps × (hi, lo)), 8 x fwd tabs (N, D ×
    4 splits), 8 x bwd tabs, 8 y fwd, 8 y bwd, 8 z fwd, 8 z bwd, 2 outputs
    (vh, vl)."""
    c_refs = refs[:12]
    xf = refs[12:20]
    xb = refs[20:28]
    yf = refs[28:36]
    yb = refs[36:44]
    zf = refs[44:52]
    zb = refs[52:60]
    vh_ref, vl_ref = refs[60], refs[61]

    def xtab(t4):
        return tuple((lambda k, r=r: r[k : k + 1, :]) for r in t4)

    def rtab(t4):
        return tuple((lambda k, r=r: r[:, k : k + 1]) for r in t4)

    xfN, xfD = xtab(xf[0:4]), xtab(xf[4:8])
    xbN, xbD = xtab(xb[0:4]), xtab(xb[4:8])
    yfN, yfD = rtab(yf[0:4]), rtab(yf[4:8])
    ybN, ybD = rtab(yb[0:4]), rtab(yb[4:8])
    zfN, zfD = rtab(zf[0:4]), rtab(zf[4:8])
    zbN, zbD = rtab(zb[0:4]), rtab(zb[4:8])

    uh = uh_ref[...]
    ul = ul_ref[...]

    # ---- forward: gx = N̂z N̂y D̂x u, gy = N̂z D̂y N̂x u, gz = D̂z N̂y N̂x u ----
    accs = _dd_band_accum([None, None], uh, ul, [xfN, xfD], n_diag, 1)
    a = _qtwo_sum(*accs[0])   # N̂x u
    d = _qtwo_sum(*accs[1])   # D̂x u
    accs = _dd_band_accum([None, None], a[0], a[1], [yfN, yfD], n_diag, 0)
    t1 = _qtwo_sum(*accs[0])  # N̂y N̂x u
    b = _qtwo_sum(*accs[1])   # D̂y N̂x u
    accs = _dd_band_accum([None], d[0], d[1], [yfN], n_diag, 0)
    e = _qtwo_sum(*accs[0])   # N̂y D̂x u
    accs = _dd_band_accum([None], t1[0], t1[1], [zfD], n_diag, 0, stride=m)
    gz = _qtwo_sum(*accs[0])
    accs = _dd_band_accum([None], b[0], b[1], [zfN], n_diag, 0, stride=m)
    gy = _qtwo_sum(*accs[0])
    accs = _dd_band_accum([None], e[0], e[1], [zfN], n_diag, 0, stride=m)
    gx = _qtwo_sum(*accs[0])

    # ---- coefficient contraction: t = C g (six symmetric components) -----
    gxs, gys, gzs = _split12(gx[0]), _split12(gy[0]), _split12(gz[0])

    def tstream(ca, cb, cc):
        acc = _dd_coeff_acc(None, ca[0][...], ca[1][...], gx[0], gx[1], *gxs)
        acc = _dd_coeff_acc(acc, cb[0][...], cb[1][...], gy[0], gy[1], *gys)
        acc = _dd_coeff_acc(acc, cc[0][...], cc[1][...], gz[0], gz[1], *gzs)
        return _qtwo_sum(*acc)

    # coeff refs: [xx, xy, xz, yy, yz, zz] × (hi, lo) — _SYM_PAIRS order
    cxx = (c_refs[0], c_refs[1])
    cxy = (c_refs[2], c_refs[3])
    cxz = (c_refs[4], c_refs[5])
    cyy = (c_refs[6], c_refs[7])
    cyz = (c_refs[8], c_refs[9])
    czz = (c_refs[10], c_refs[11])
    tx = tstream(cxx, cxy, cxz)
    ty = tstream(cxy, cyy, cyz)
    tz = tstream(cxz, cyz, czz)

    # ---- backward: v = N̂ᵀx (N̂ᵀy D̂ᵀz tz + D̂ᵀy N̂ᵀz ty) + D̂ᵀx N̂ᵀy N̂ᵀz tx --
    accs = _dd_band_accum([None], tz[0], tz[1], [zbD], n_diag, 0, stride=m)
    zz_ = _qtwo_sum(*accs[0])
    accs = _dd_band_accum([None], ty[0], ty[1], [zbN], n_diag, 0, stride=m)
    zy_ = _qtwo_sum(*accs[0])
    accs = _dd_band_accum([None], tx[0], tx[1], [zbN], n_diag, 0, stride=m)
    zx_ = _qtwo_sum(*accs[0])

    accs = _dd_band_accum([None], zz_[0], zz_[1], [ybN], n_diag, 0)
    accs = _dd_band_accum(accs, zy_[0], zy_[1], [ybD], n_diag, 0)
    r12 = _qtwo_sum(*accs[0])
    accs = _dd_band_accum([None], zx_[0], zx_[1], [ybN], n_diag, 0)
    r3 = _qtwo_sum(*accs[0])

    accs = _dd_band_accum([None], r12[0], r12[1], [xbN], n_diag, 1)
    accs = _dd_band_accum(accs, r3[0], r3[1], [xbD], n_diag, 1)
    vh, vl = _qtwo_sum(*accs[0])
    vh_ref[...] = vh
    vl_ref[...] = vl


class LanesDDVmultKernel:
    """v = A·u (unstructured lane-major, double-single) fused per cell block.

    Owns the kernel-layout gather table and the TransposeScatter back-map;
    ``vmult_f64(uh, ul, *coeff_tabs)`` runs gather → pallas → scatter and
    returns the raw f64 result (no constraint masking — the caller's mask
    wrapper handles it, like merged_vmult)."""

    CB = 256  # cells per block (any multiple of 128 keeps lane tiles whole)

    def __init__(self, op, comps_np, interpret: bool = False):
        if op.dim != 3 or op.kernel != "lanes" or op.n_q_1d != op.degree + 1:
            raise ValueError("LanesDDVmultKernel: unsupported configuration")
        m = op.degree + 1
        C = op.mesh.n_cells_total
        self.m, self.C = m, C
        self.n_dofs = op.n_dofs
        self.interpret = interpret
        self.n_diag = 2 * m - 1
        R0 = m * m
        self.Rpad = -(-R0 // 8) * 8
        nb = -(-C // self.CB)
        self.nb = nb
        self.Wb = self.CB * m
        self.WX = nb * self.Wb

        # gather table directly in kernel layout: tab[z·m+y, c·m+x] =
        # cell_dofs[c, (z·m+y)·m + x]; pads → n_dofs (zero pad slot)
        cd = np.asarray(op.dofs.cell_dofs, np.int64)  # (C, m^3)
        tab = np.full((self.Rpad, self.WX), self.n_dofs, np.int64)
        t = np.swapaxes(cd.reshape(C, R0, m), 0, 1)  # [r, c, x]
        tab[:R0, : C * m] = t.reshape(R0, C * m)
        self.gather_tab = jnp.asarray(tab, jnp.int32)

        # coefficient tables in kernel layout: comps_np[k] is (q, q, q, C)
        # lane-major (z, y, x, c) — rearrange to rows z·m+y, lanes c·m+x
        self.coeff_tabs = []
        for comp in comps_np:
            c64 = np.asarray(comp, np.float64).reshape(R0, m, C)
            c64 = np.swapaxes(c64, 1, 2).reshape(R0, C * m)
            full = np.zeros((self.Rpad, self.WX))
            full[:R0, : C * m] = c64
            hi = full.astype(np.float32)
            lo = (full - hi.astype(np.float64)).astype(np.float32)
            self.coeff_tabs.append(jnp.asarray(hi))
            self.coeff_tabs.append(jnp.asarray(lo))
        self.coeff_tabs = tuple(self.coeff_tabs)

        # shape-matrix band tables (f64 split): x lane-windows, y/z rows
        from ...fem.lagrange import shape_1d

        s0 = shape_1d(op.degree, m)
        N64 = np.asarray(s0.N, np.float64)
        D64 = np.asarray(s0.D, np.float64)

        def xt(B, transpose):
            return [jnp.asarray(a) for a in _window_diag_tables(
                B, self.Wb, self.Wb, transpose)]

        def rt(B, level, transpose):
            return [jnp.asarray(a) for a in _row_band_tables(
                B, m, level, self.Rpad, transpose)]

        self.x_tabs = (xt(N64, False) + xt(D64, False)
                       + xt(N64, True) + xt(D64, True))
        self.y_tabs = (rt(N64, 0, False) + rt(D64, 0, False)
                       + rt(N64, 0, True) + rt(D64, 0, True))
        self.z_tabs = (rt(N64, 1, False) + rt(D64, 1, False)
                       + rt(N64, 1, True) + rt(D64, 1, True))

        # standalone jit (tests); the production path traces _vmult_impl
        # into the operator's own (inline) jit so the tables hoist there.
        # Interpret mode on CPU needs the fusion pass off for dd exactness
        # (see dd_vmult.EXACT_EFT_CPU_COMPILER_OPTIONS).
        from .dd_vmult import EXACT_EFT_CPU_COMPILER_OPTIONS

        self.jopts = EXACT_EFT_CPU_COMPILER_OPTIONS if interpret else None
        self._vmult_j = jax.jit(self._vmult_impl,
                                compiler_options=self.jopts)

    def _pallas(self, Wh, Wl, *coeff_tabs):
        # x64 off for the whole call: with x64 on, the index-map literals
        # trace as i64 and Mosaic fails to legalize the map's func.return
        from jax._src.config import enable_x64 as _enable_x64

        with _enable_x64(False):
            return self._pallas_inner(Wh, Wl, *coeff_tabs)

    def _pallas_inner(self, Wh, Wl, *coeff_tabs):
        blk = (self.Rpad, self.Wb)
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        in_specs = [pl.BlockSpec(blk, lambda i: (0, i))] * 14
        in_specs += [vmem] * 48
        out = jax.ShapeDtypeStruct((self.Rpad, self.WX), jnp.float32)
        kern = functools.partial(_kern_lanes_dd, m=self.m,
                                 n_diag=self.n_diag)
        return pl.pallas_call(
            kern,
            grid=(self.nb,),
            in_specs=in_specs,
            out_specs=[pl.BlockSpec(blk, lambda i: (0, i))] * 2,
            out_shape=[out, out],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=self.interpret,
        )(Wh, Wl, *coeff_tabs, *self.x_tabs, *self.y_tabs, *self.z_tabs)

    def _vmult_impl(self, uh, ul, *coeff_tabs):
        from jax._src.config import enable_x64 as _enable_x64

        with _enable_x64(False):
            uhp = jnp.concatenate([uh, jnp.zeros((1,), jnp.float32)])
            ulp = jnp.concatenate([ul, jnp.zeros((1,), jnp.float32)])
            Wh = uhp[self.gather_tab]
            Wl = ulp[self.gather_tab]
            vh, vl = self._pallas(Wh, Wl, *coeff_tabs)
        # Scatter-back (pad slots carry the n_dofs sentinel -> dropped via
        # the n+1 trick).  XLA TPU's native colliding scatter measured
        # 3-4x faster than any transpose-gather spelling, but the f64
        # spelling is 11x slower than f32 (192 vs 17 ms at 2M slots,
        # probe_ball_anatomy r5).  On device the hi/lo components scatter
        # as TWO f32 passes and combine in f64 — per-dof summation error
        # ~K·2^-24 ~ 5e-7 relative (vs ~1e-14 dd): an operator
        # perturbation two orders below the outer rel-1e-5 tolerance,
        # E2E-iteration-checked.  CPU/interpret (and
        # DEALII_ASM_TPU_DD_SCATTER=f64) keep the exact f64 scatter.
        import os as _os

        mode = _os.environ.get("DEALII_ASM_TPU_DD_SCATTER",
                               "f64" if self.interpret else "2xf32")
        flat = self.gather_tab.reshape(-1)
        if mode == "2xf32":
            sh = jnp.zeros(self.n_dofs + 1, jnp.float32).at[flat].add(
                vh.reshape(-1))[:-1]
            sl = jnp.zeros(self.n_dofs + 1, jnp.float32).at[flat].add(
                vl.reshape(-1))[:-1]
            return sh.astype(jnp.float64) + sl.astype(jnp.float64)
        v = vh.astype(jnp.float64) + vl.astype(jnp.float64)
        return jnp.zeros(self.n_dofs + 1, jnp.float64).at[flat].add(
            v.reshape(-1))[:-1]

    def vmult_f64(self, uh, ul, coeff_tabs=None):
        return self._vmult_j(uh, ul, *(coeff_tabs or self.coeff_tabs))
