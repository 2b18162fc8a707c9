"""Pallas TPU kernel: fully-fused Schwarz smoother step  x' = x + ω·P⁻¹(b−Ax).

One kernel application = one Richardson step with the FDM overlap-1 additive
Schwarz preconditioner on a Cartesian/anisotropic mesh: the residual
(sum-factorized Laplace), the six FDM eigen-transforms, the eigenvalue scale,
weighting, and the vector update all happen on z-slabs resident in VMEM —
the TPU analog of the reference's fused cell loop + pre/post vector-operation
ranges (/root/reference/include/matrix_free.h:1007-1364, :420-532;
matrix_free_internal.h:297-364).

Pipeline (grid step i; stages communicate through VMEM plane rings):
  P-stage  (planes p·i .. p·i+p−1, while they exist):
      P1 = M̂y M̂x x,   P2 = K̂y M̂x x + M̂y K̂x x
      x-direction banded on the VPU (2p+1 diagonal rolls), y-direction dense
      matmuls on the MXU; depth-4 plane ring.
  A-stage  (rows of z-row-block w2 = i−2): banded-z contraction of 3p ring
      planes (VPU, SMEM row tables) -> r = b − Az, depth-2 ring.
  F-stage  (z-window w = i−3): the fdm_slab algebra on the completed r window
      (VPU z-transforms, dense folded y/x transforms on the MXU), then
      out = x + ω·(FDM result), with a carry plane for the one-plane window
      overlap; a final cleanup step flushes the last carry.

x and b are front-padded by 3 blocks (3p planes) so all block index maps stay
non-negative; the output is front-padded the same way and sliced by the
wrapper.  All tables fold the Dirichlet masks / multiplicity weights
host-side (free-mask separability: Z = Fz⊗Fy⊗Fx, so ZAZ folds per axis).

Restrictions: dim == 3, element overlap 1, non-periodic, f32, Cartesian.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def _dot(a, b, precision="highest"):
    """MXU dot with explicit precision.

    The A-path (operator applied to the ITERATE x — large, smooth) must run
    true-f32 ("highest", 6 bf16 passes): default-precision noise is amplified
    ~1/h² on smooth modes and degrades CG+MG parity — measured 8 vs 5 outer
    iterations at 2.1M DoFs.  The F-stage (FDM transforms applied to the
    RESIDUAL — small, rough) is a preconditioner: a relative perturbation
    there only perturbs P⁻¹ multiplicatively and leaves iteration counts
    intact at much lower dot precision (measured: see results_r2.md).

    "high" (3 bf16 passes, ~2⁻²¹ operand error) is built manually from
    bf16-split operands — Mosaic's dot lowering only accepts DEFAULT and
    HIGHEST."""
    if precision == "bf16":
        # one MXU pass on bf16-cast operands — for transforms applied to the
        # preconditioned residual only (relative perturbation of P⁻¹)
        return jax.lax.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
    if precision == "high":
        f32 = jnp.float32
        bf = jnp.bfloat16
        ah = a.astype(bf)
        al = (a - ah.astype(f32)).astype(bf)
        bh = b.astype(bf)
        bl = (b - bh.astype(f32)).astype(bf)
        d = lambda u, v: jax.lax.dot(u, v, preferred_element_type=f32)
        return d(ah, bh) + (d(ah, bl) + d(al, bh))
    return jax.lax.dot(a, b, precision=_PRECISIONS[precision],
                       preferred_element_type=jnp.float32)


def _band_x(plane, d_ref, n_diag: int):
    """Banded 1D apply along lanes: out[i] = Σ_off d[off+p][i]·plane[i+off].

    Wrapped lanes are killed by zeros in the diagonal tables."""
    acc = None
    nx = plane.shape[-1]
    p = (n_diag - 1) // 2
    for k in range(n_diag):
        shift = (p - k) % nx
        term = d_ref[k : k + 1, :] * pltpu.roll(plane, shift, 1)
        acc = term if acc is None else acc + term
    return acc


def _band_x2(plane, da_ref, db_ref, n_diag: int):
    """Two banded 1D applies (M and K tables) sharing ONE set of lane rolls:
    the rolls are the VPU-expensive part (relayout), the mads are cheap."""
    acc_a = acc_b = None
    nx = plane.shape[-1]
    p = (n_diag - 1) // 2
    for k in range(n_diag):
        shift = (p - k) % nx
        rolled = pltpu.roll(plane, shift, 1)
        ta = da_ref[k : k + 1, :] * rolled
        tb = db_ref[k : k + 1, :] * rolled
        acc_a = ta if acc_a is None else acc_a + ta
        acc_b = tb if acc_b is None else acc_b + tb
    return acc_a, acc_b


def _band_y2(plane, da_ref, db_ref, n_diag: int):
    """Two banded 1D applies along sublanes sharing one set of rolls:
    out[r,:] = Σ_k D[r,k]·plane[r+k−p,:] with column tables (ny, n_diag)."""
    acc_a = acc_b = None
    nyv = plane.shape[0]
    p = (n_diag - 1) // 2
    for k in range(n_diag):
        shift = (p - k) % nyv
        rolled = pltpu.roll(plane, shift, 0)
        ta = da_ref[:, k : k + 1] * rolled
        tb = db_ref[:, k : k + 1] * rolled
        acc_a = ta if acc_a is None else acc_a + ta
        acc_b = tb if acc_b is None else acc_b + tb
    return acc_a, acc_b


def _band_y1(plane, da_ref, n_diag: int):
    acc = None
    nyv = plane.shape[0]
    p = (n_diag - 1) // 2
    for k in range(n_diag):
        shift = (p - k) % nyv
        term = da_ref[:, k : k + 1] * pltpu.roll(plane, shift, 0)
        acc = term if acc is None else acc + term
    return acc


def _kernel(kid_ref, zid_ref, kzr_ref, mzr_ref, lamz_ref, vzf_ref, vzb_ref,
            omega_ref, x3_ref, b_ref,
            dmx_ref, dkx_ref, my_ref, ky_ref,
            gy_ref, gyt_ref, gxT_ref, gxtT_ref, lamyx_ref,
            *rest,
            m: int, p: int, n_win: int, n_wy: int, x_dense: bool = False,
            y_banded: bool = False, p_stack: bool = False,
            x_fused: bool = False, f_stack: bool = False,
            z_bf16: bool = False, y_first: bool = False,
            f_zmxu: bool = False,
            interpret: bool = False,
            prec_a: str = "highest", prec_f: str = "highest",
            stages: str = "PAF"):
    # `stages` is a PROFILING knob (subset of "PAF"): dropping a letter skips
    # that stage's body so on-chip timing isolates per-stage cost.  Production
    # callers always use the default.
    # n_wy > 0 selects the windowed-VPU y-transform: gy_ref/gyt_ref then hold
    # per-y-window eigen blocks (m, m, n_wy, 1) instead of dense matrices, and
    # the y transforms run as per-window vector broadcasts on reshaped plane
    # rows (G is block-banded; the MXU wastes ~(ny/m)x FLOPs on its zeros)
    if f_zmxu:
        gyz_ref, gytz_ref, out_ref, p1r, p2r, azr, carry, xr = rest
    else:
        out_ref, p1r, p2r, azr, carry, xr = rest
    i = pl.program_id(0)
    f32 = jnp.float32
    n_diag = 2 * p + 1

    # uninitialized VMEM may hold NaN: zero the rings once (0·NaN would
    # otherwise leak through the zero-padded row tables)
    @pl.when(i == 0)
    def _():
        p1r[...] = jnp.zeros_like(p1r)
        p2r[...] = jnp.zeros_like(p2r)
        azr[...] = jnp.zeros_like(azr)
        carry[...] = jnp.zeros_like(carry)

    if "D" in stages:
        # overlap diagnostic: ~N plane-FMAs of input-independent VPU work
        # (N = 100 per 'D' in `stages` — letter count, so it composes with
        # the sub-F digit cuts).  If the pipeline overlaps compute with the
        # block DMA, this stage is free until it exceeds the stream shadow;
        # if stage costs ADD on the skeleton instead, the pipeline is
        # serialized.
        n_dummy = stages.count("D") * 100

        @pl.when(i >= 0)
        def _():
            v = p1r[0, 0]
            for _ in range(n_dummy):
                v = v * 1.000001 + 0.25
            p1r[0, 0] = v

    # ---- P-stage: planes p·i .. p·i+p−1 ------------------------------------
    @pl.when((i <= n_win) & ("P" in stages))
    def _():
        slot = i % 4
        if p_stack and y_banded:
            # ALL p planes stacked along sublanes: the x-dots become 2 wide
            # dots and the y-banded applies run ONCE on the (p·ny, nx) stack
            # with p-tiled column tables — 18 sublane rolls per grid step
            # instead of 18·p (rolls are instruction-bound: dense-y at +36
            # MXU passes measured the same as 72 rolls).  Cross-plane roll
            # contamination is killed by the tables' per-plane edge zeros
            # (col outside [0, ny) ⇒ zero entry — same guard as the wrap).
            ny = x3_ref.shape[1]
            # ONE block read feeds both the x ring and the stacked operand
            # (the per-plane form re-read the block 2x from VMEM)
            x_all = x3_ref[...]
            xr[slot] = x_all
            X4 = jnp.concatenate([x_all[t] for t in range(p)], axis=0)
            if y_first:
                # FACTOR ORDER SWAP: tensor-product factors commute
                # (M̂y(M̂x x) == M̂x(M̂y x)), so the banded-y transforms run
                # on the RAW x stack and feed both the M̂y- and K̂y-images —
                # ONE set of 9 sublane rolls + 18 column-mads replaces the
                # after-x form's 18 rolls + 27 mads (the P-stage's dominant
                # VPU block).  The M̂ₓᵀ-only table for the K̂y-image dot is
                # a static 128-aligned lane slice of the fused M̂ₓᵀ|K̂ₓᵀ
                # table; y stays exact f32 on the VPU, x keeps prec_a.
                myX4, kyX4 = _band_y2(X4, my_ref, ky_ref, n_diag)
                nxp_ = x3_ref.shape[2]
                if prec_a == "high":
                    f32_ = jnp.float32
                    bf = jnp.bfloat16
                    d = lambda u, v: jax.lax.dot(u, v,
                                                 preferred_element_type=f32_)
                    bh = dmx_ref[...]
                    bl = dkx_ref[...]
                    mh = myX4.astype(bf)
                    ml = (myX4 - mh.astype(f32_)).astype(bf)
                    a1 = d(mh, bh) + (d(mh, bl) + d(ml, bh))
                    kh = kyX4.astype(bf)
                    kl = (kyX4 - kh.astype(f32_)).astype(bf)
                    a2 = (d(kh, bh[:, :nxp_])
                          + (d(kh, bl[:, :nxp_]) + d(kl, bh[:, :nxp_])))
                else:
                    a1 = _dot(myX4, dmx_ref[:], prec_a)
                    a2 = _dot(kyX4, dmx_ref[:, :nxp_], prec_a)
                p1s = a1[:, :nxp_]
                p2s = a1[:, nxp_:] + a2
                for t in range(p):
                    p1r[slot, t] = p1s[t * ny : (t + 1) * ny]
                    p2r[slot, t] = p2s[t * ny : (t + 1) * ny]
                return
            if x_dense and x_fused and prec_a == "high":
                # M̂ₓᵀ|K̂ₓᵀ pre-split HOST-SIDE into bf16 hi (dmx) and lo
                # (dkx) tables: the runtime table split cost 2 VPU passes
                # over the f32 table per grid step; numerically identical
                # ("high" = ah·bh + ah·bl + al·bh either way)
                f32_ = jnp.float32
                bf = jnp.bfloat16
                ah = X4.astype(bf)
                al = (X4 - ah.astype(f32_)).astype(bf)
                d = lambda u, v: jax.lax.dot(u, v,
                                             preferred_element_type=f32_)
                bh = dmx_ref[...]
                axkx = d(ah, bh) + (d(ah, dkx_ref[...]) + d(al, bh))
                nxp_ = x3_ref.shape[2]
                ax = axkx[:, :nxp_]
                kx = axkx[:, nxp_:]
            elif x_dense and x_fused:
                # M̂ₓᵀ and K̂ₓᵀ side by side in ONE table: halves the MXU
                # call count of the P-stage (same MACs, one weight pipeline)
                nxp_ = x3_ref.shape[2]
                axkx = _dot(X4, dmx_ref[:], prec_a)
                ax = axkx[:, :nxp_]
                kx = axkx[:, nxp_:]
            elif x_dense:
                ax = _dot(X4, dmx_ref[:], prec_a)
                kx = _dot(X4, dkx_ref[:], prec_a)
            else:
                ax, kx = _band_x2(X4, dmx_ref, dkx_ref, n_diag)
            my_ax, ky_ax = _band_y2(ax, my_ref, ky_ref, n_diag)
            my_kx = _band_y1(kx, my_ref, n_diag)
            p2s = ky_ax + my_kx
            for t in range(p):
                p1r[slot, t] = my_ax[t * ny : (t + 1) * ny]
                p2r[slot, t] = p2s[t * ny : (t + 1) * ny]
            return
        for t in range(p):
            xpl = x3_ref[t]
            # x plane ring: block i+3, consumed by the F-stage 3 steps later
            # (slot (i+1)%4 there) — x is read from HBM ONCE per step
            xr[slot, t] = xpl
            if x_dense:
                # x-apply as dense MXU dots (tables = M̂ₓᵀ/K̂ₓᵀ padded).
                ax = _dot(xpl, dmx_ref[:], prec_a)
                kx = _dot(xpl, dkx_ref[:], prec_a)
            else:
                ax, kx = _band_x2(xpl, dmx_ref, dkx_ref, n_diag)
            if y_banded:
                # M̂y/K̂y have bandwidth 2p+1: 2p+1 sublane rolls + column
                # mads (exact f32 on the VPU) replace three dense MXU dots
                # — at "high" precision those are 9 bf16 passes per plane
                # and dominate the P-stage.
                my_ax, ky_ax = _band_y2(ax, my_ref, ky_ref, n_diag)
                my_kx = _band_y1(kx, my_ref, n_diag)
                p1r[slot, t] = my_ax
                p2r[slot, t] = ky_ax + my_kx
            else:
                p1r[slot, t] = _dot(my_ref[:], ax, prec_a)
                p2r[slot, t] = (
                    _dot(ky_ref[:], ax, prec_a)
                    + _dot(my_ref[:], kx, prec_a))

    # ---- A-stage: residual rows p·(i−2) .. p·(i−2)+p−1 ---------------------
    @pl.when((i >= 2) & (i <= n_win + 2) & ("A" in stages))
    def _():
        w2 = i - 2
        ku = kid_ref[w2]
        aslot = i % 2
        for t in range(p):
            acc = None
            # ring planes p·w2−p+j, steps i−3..i−1; the band |c−r| ≤ p makes
            # entries outside j ∈ [t, t+2p] structurally zero (table builder
            # guard `abs(c_ - r_) <= p`) — skip them statically (25% of the
            # A-stage's VPU mads)
            for j in range(t, t + n_diag):
                pslot = (i - 3 + j // p) % 4
                row = j % p
                term = (kzr_ref[ku, t, j] * p1r[pslot, row]
                        + mzr_ref[ku, t, j] * p2r[pslot, row])
                acc = term if acc is None else acc + term
            # the r ring is bf16: r only feeds the PRECONDITIONER transforms,
            # whose dots already round operands to bf16 (prec_f) — storing it
            # rounded halves the A-write + F-read VMEM traffic at the same
            # final accuracy
            azr[aslot, t] = (b_ref[t] - acc).astype(azr.dtype)

    # ---- F-stage: FDM + update on z-window w = i−3 -------------------------
    @pl.when((i >= 3) & (i <= n_win + 2) & ("F" in stages))
    def _():
        w = i - 3
        wz = zid_ref[w]
        cur = i % 2
        prev = (i + 1) % 2
        dt = gy_ref.dtype
        omega = omega_ref[0, 0]

        # hoisted ring reads: ONE (p, ny, nx) block load + one plane load —
        # calling these inside the k loop emitted m separate loads per plane
        # (m² plane reads per grid step, the dominant F-stage VMEM traffic).
        # The bf16 ring planes upcast ONCE here: leaving the cast to the Ts
        # chain's type promotion emitted m² converts per grid step (25 at
        # Q4) instead of m — ~1.3k vreg instructions, measured in the
        # stage-profile compute adder (results_r4.md, compute roofline).
        _r_blk = azr[prev]
        _r_last = azr[cur, 0]
        _up = (lambda v: v) if z_bf16 else (lambda v: v.astype(f32))
        _r_planes = [_up(_r_blk[s]) for s in range(p)] + [_up(_r_last)]

        def r_plane(s):  # r at global plane p·w + s
            return _r_planes[s]

        xslot = (i + 1) % 4  # block i of x, written by the P-stage at i−3
        ny = x3_ref.shape[1]
        nx = x3_ref.shape[2]
        mx = gxT_ref.shape[1]

        if f_zmxu:
            # VERDICT r4 task #5a: BOTH z-transform scalar-plane chains (the
            # F-stage's two largest VPU items, +4.5/+5.2 us/grid-step) fold
            # into the Gy/Gyt dots as window-batched MXU work — operands are
            # the s-stacked r planes and k/s-stacked pre-scaled eigen blocks
            # (gyz[u, k·my+i, s·ny+j] = vzf[u,s,k]·Gy[i,j]; gytz likewise
            # with vzb).  m x more MXU MACs on those two dots, ~10 us/step
            # less VPU work — wins iff the MXU stays under the VPU wall.
            S = jnp.concatenate([_r_blk[s] for s in range(p)] + [_r_last],
                                axis=0)  # (m·ny, nx), r-ring dtype (bf16)
            Ball = _dot(gyz_ref[wz].astype(dt), S.astype(dt), prec_f)
            Cq_all = _dot(Ball.astype(dt), gxT_ref[:], prec_f)
            Cq_all = Cq_all * lamyx_ref[wz]
            Ystack = _dot(gytz_ref[wz].astype(dt), Cq_all.astype(dt), prec_f)
            Zstack = _dot(Ystack.astype(dt), gxtT_ref[:], prec_f)
            x_blk = xr[xslot]
            for s in range(p):
                out_ref[s] = x_blk[s] + omega * Zstack[s * ny : s * ny + ny]
            carry[1] = Zstack[p * ny : p * ny + ny]

            @pl.when(w > 0)
            def _():
                out_ref[0] += omega * carry[0]

            carry[0] = carry[1]
            return

        if z_bf16:
            # z-transform scalar·plane chains in NATIVE bf16: half the vreg
            # footprint of the F-stage's dominant VPU work; the planes are
            # already bf16 (r ring) and the downstream dot rounds to bf16
            # anyway, so only the m-term accumulation order changes
            _rs = [r_plane(s) for s in range(m)]
            Ts = []
            bfdt = _rs[0].dtype
            for k in range(m):
                T = vzf_ref[wz, 0, k].astype(bfdt) * _rs[0]
                for s in range(1, m):
                    T = T + vzf_ref[wz, s, k].astype(bfdt) * _rs[s]
                Ts.append(T)
            B_cat = _dot(gy_ref[:], jnp.concatenate(Ts, axis=1), prec_f)
            my_e = gy_ref.shape[0]
            dtv = gy_ref.dtype
            Cqs = []
            for k in range(m):
                Cq = _dot(B_cat[:, k * nx : (k + 1) * nx].astype(dtv),
                          gxT_ref[:], prec_f)
                Cqs.append(Cq * lamyx_ref[wz, k * my_e : (k + 1) * my_e])
            Y_cat = _dot(gyt_ref[:], jnp.concatenate(Cqs, axis=1).astype(dtv),
                         prec_f)
            accs = [None] * m
            for k in range(m):
                Z = _dot(Y_cat[:, k * mx : (k + 1) * mx].astype(dtv),
                         gxtT_ref[:], prec_f).astype(bfdt)
                for s in range(m):
                    t = vzb_ref[wz, s, k].astype(bfdt) * Z
                    accs[s] = t if accs[s] is None else accs[s] + t
            x_blk = xr[xslot]
            for s in range(p):
                out_ref[s] = x_blk[s] + omega * accs[s].astype(jnp.float32)
            carry[1] = accs[m - 1].astype(jnp.float32)

            @pl.when(w > 0)
            def _():
                out_ref[0] += omega * carry[0]

            carry[0] = carry[1]
            return

        if n_wy == 0:
            # sub-F profiling cuts: a digit in `stages` truncates the F
            # pipeline after N of its 5 parts (1=Ts, 2=+Gy dot, 3=+Gx+scale,
            # 4=+Gyt dot, 5/none=full) — outputs are garbage but the DMA
            # pattern is unchanged, isolating per-part cost on-chip
            f_cut = next((int(ch) for ch in stages if ch.isdigit()), 5)
            # batch the m per-k y-transforms into ONE wide dot each way
            # (the k-loop's 2m small Gy/Gyt dots serialize past the DMA
            # shadow; a (ny, m·nx) operand keeps the MXU busy)
            Ts = []
            for k in range(m):
                T = vzf_ref[wz, 0, k] * r_plane(0)
                for s in range(1, m):
                    T = T + vzf_ref[wz, s, k] * r_plane(s)
                Ts.append(T)
            if f_cut <= 1:
                for s in range(p):
                    out_ref[s] = Ts[s % m]
                return
            B_cat = _dot(gy_ref[:], jnp.concatenate(Ts, axis=1).astype(dt),
                         prec_f)
            if f_cut <= 2:
                for s in range(p):
                    out_ref[s] = B_cat[:ny, :nx].astype(f32)
                return
            mx = gxT_ref.shape[1]
            my_e = gy_ref.shape[0]
            if f_stack:
                # k-STACKED x transforms: the 2m small per-k Gx/Gxt dots
                # become 2 wide dots on sublane-restacked operands (the
                # restacks are plain VMEM copies; small dots pay a weight
                # pipeline each)
                Bs = jnp.concatenate(
                    [B_cat[:, k * nx : (k + 1) * nx] for k in range(m)],
                    axis=0)
                Cq_all = _dot(Bs.astype(dt), gxT_ref[:], prec_f)
                Cq_all = Cq_all * lamyx_ref[wz]
                Cq_cat = jnp.concatenate(
                    [Cq_all[k * my_e : (k + 1) * my_e] for k in range(m)],
                    axis=1)
                Y_cat = _dot(gyt_ref[:], Cq_cat.astype(dt), prec_f)
                Ys = jnp.concatenate(
                    [Y_cat[:, k * mx : (k + 1) * mx] for k in range(m)],
                    axis=0)
                Z_all = _dot(Ys.astype(dt), gxtT_ref[:], prec_f)
                accs = [None] * m
                for k in range(m):
                    Z = Z_all[k * ny : (k + 1) * ny]
                    for s in range(m):
                        t = vzb_ref[wz, s, k] * Z
                        accs[s] = t if accs[s] is None else accs[s] + t
                x_blk = xr[xslot]
                for s in range(p):
                    out_ref[s] = x_blk[s] + omega * accs[s]
                carry[1] = accs[m - 1]

                @pl.when(w > 0)
                def _():
                    out_ref[0] += omega * carry[0]

                carry[0] = carry[1]
                return
            Cqs = []
            for k in range(m):
                Cq = _dot(B_cat[:, k * nx : (k + 1) * nx].astype(dt),
                          gxT_ref[:], prec_f)
                # eigen scale: lamyx_ref holds PRE-INVERTED per-window-type
                # denominators 1/(λy⊕λx + λz[k]) (host-side, exact) — one
                # vreg mult instead of broadcast-add + divide per k
                Cqs.append(Cq * lamyx_ref[wz, k * my_e : (k + 1) * my_e])
            if f_cut <= 3:
                for s in range(p):
                    out_ref[s] = Cqs[s % m][:ny, :nx].astype(f32)
                return
            Y_cat = _dot(gyt_ref[:], jnp.concatenate(Cqs, axis=1).astype(dt),
                         prec_f)
            if f_cut <= 4:
                for s in range(p):
                    out_ref[s] = Y_cat[:ny, :nx].astype(f32)
                return
            # accumulate the m z-back-transform contributions in VALUES and
            # write each output plane ONCE: the per-k `out_ref[s] +=` form
            # cost m·(p+1) VMEM read-modify-writes per grid step (measured
            # +4.5 us/gridstep with the Z dots; the whole F budget is ~8)
            accs = [None] * m
            for k in range(m):
                Z = _dot(Y_cat[:, k * mx : (k + 1) * mx].astype(dt),
                         gxtT_ref[:], prec_f)
                for s in range(m):
                    t = vzb_ref[wz, s, k] * Z
                    accs[s] = t if accs[s] is None else accs[s] + t
            x_blk = xr[xslot]
            for s in range(p):
                out_ref[s] = x_blk[s] + omega * accs[s]
            carry[1] = accs[m - 1]

            @pl.when(w > 0)
            def _():
                out_ref[0] += omega * carry[0]

            carry[0] = carry[1]
            return

        for k in range(m):
            T = vzf_ref[wz, 0, k] * r_plane(0)
            for s in range(1, m):
                T = T + vzf_ref[wz, s, k] * r_plane(s)
            if n_wy == 0:
                B = _dot(gy_ref[:], T.astype(dt), prec_f)
            else:
                r3 = T.reshape(ny // p, p, nx)
                wins = [r3[:n_wy, s2, :] for s2 in range(p)]
                wins.append(r3[1 : n_wy + 1, 0, :])
                cols = []
                for j in range(m):
                    acc = gy_ref[0, j] * wins[0]
                    for s2 in range(1, m):
                        acc = acc + gy_ref[s2, j] * wins[s2]
                    cols.append(acc)
                B = jnp.stack(cols, axis=1).reshape(n_wy * m, nx)
            Cq = _dot(B.astype(dt), gxT_ref[:], prec_f)
            Cq = Cq / (lamyx_ref[:] + lamz_ref[wz, k])
            if n_wy == 0:
                Y = _dot(gyt_ref[:], Cq.astype(dt), prec_f)
            else:
                Cq3 = Cq.reshape(n_wy, m, mx)
                rows = []
                for s2 in range(p):
                    acc = gyt_ref[s2, 0] * Cq3[:, 0, :]
                    for j in range(1, m):
                        acc = acc + gyt_ref[s2, j] * Cq3[:, j, :]
                    rows.append(acc)
                c4 = gyt_ref[p, 0] * Cq3[:, 0, :]
                for j in range(1, m):
                    c4 = c4 + gyt_ref[p, j] * Cq3[:, j, :]
                base = jnp.stack(rows, axis=1).reshape(n_wy * p, mx)
                zc = jnp.zeros_like(c4)
                c4p = jnp.stack([c4] + [zc] * (p - 1), axis=1).reshape(
                    n_wy * p, mx)
                Ybase = jnp.concatenate(
                    [base, jnp.zeros((ny - n_wy * p, mx), f32)], axis=0)
                parts = [jnp.zeros((p, mx), f32), c4p]
                tail = ny - p - n_wy * p
                if tail > 0:
                    parts.append(jnp.zeros((tail, mx), f32))
                Yc4 = jnp.concatenate(parts, axis=0)[:ny]
                Y = Ybase + Yc4
            Z = _dot(Y.astype(dt), gxtT_ref[:], prec_f)
            for s in range(p):
                if k == 0:
                    out_ref[s] = xr[xslot, s] + omega * (vzb_ref[wz, s, k] * Z)
                else:
                    out_ref[s] += omega * (vzb_ref[wz, s, k] * Z)
            if k == 0:
                carry[1] = vzb_ref[wz, m - 1, k] * Z
            else:
                carry[1] += vzb_ref[wz, m - 1, k] * Z

        @pl.when(w > 0)
        def _():
            out_ref[0] += omega * carry[0]

        carry[0] = carry[1]

    # ---- cleanup: flush the final shared plane (global p·n_win) ------------
    @pl.when(i == n_win + 3)
    def _():
        out_ref[0] = xr[(i + 1) % 4, 0] + omega_ref[0, 0] * carry[0]
        for s in range(1, p):
            out_ref[s] = jnp.zeros_like(out_ref[s])


def _kernel_chain(kid_ref, zid_ref, kzr_ref, mzr_ref, lamz_ref, vzf_ref,
                  vzb_ref, coef_ref, x3_ref, b_ref,
                  dmx_ref, dkx_ref, my_ref, ky_ref,
                  gy_ref, gyt_ref, gxT_ref, gxtT_ref, lamyx_ref,
                  out_ref, *scratch,
                  m: int, p: int, n_win: int, n_chain: int, bdepth: int,
                  cheby: bool = False, zero_x: bool = False,
                  x_dense: bool = True, x_fused: bool = False,
                  f_stack: bool = False, y_first: bool = False,
                  interpret: bool = False,
                  prec_a: str = "highest", prec_f: str = "highest",
                  stages: str = "PAF"):
    """S = n_chain fused smoother sub-steps in ONE pass over HBM.

    Each sub-step s runs the same P/A/F pipeline as _kernel, lagged 3 grid
    steps behind sub-step s−1; the intermediate iterate never touches HBM —
    F_{s−1} hands its freshly completed plane block to P_s through the
    ``ystage`` VMEM block within the same grid step (program order: the s
    loop emits F_{s−1} before P_s).  b is read once and ring-buffered for
    the later sub-steps.  DMA per chain: read x, read b, write out — the
    same 3 streams one step costs, so the per-step stream floor drops ~S×.
    This is the production smoothing shape; reference analog: the fused
    pre/post vector-operation ranges of matrix_free.h:1007-1364 applied
    across a whole smoother sweep instead of one operator application.

    Sub-step recurrence (coef_ref rows (f1_s, f2_s)):
        p_s = f1_s·p_{s−1} + f2_s·M(b − A x_{s−1}),   x_s = x_{s−1} + p_s
    ``cheby=False`` is plain chained Richardson (f1 ≡ 0, f2 = ω_s; no
    momentum stream).  ``cheby=True`` carries the momentum planes p_s
    through per-sub-step VMEM rings — this IS deal.II's Chebyshev iteration
    (both 1st and 4th kind reduce to this two-term form), so a degree-k
    smoother apply becomes ONE kernel launch.
    ``zero_x=True`` starts from x = 0: sub-step 0 skips its P/A pipeline
    entirely (r ≡ b — the classic zero-guess optimization) and the x input
    is never read (its block spec pins a constant block, so the x HBM
    stream disappears: a whole zero-guess vmult reads b and writes x only).

    Sub-step stage windows at grid step i (base = 3s):
      P_s: window w = i−base        (reads x3_ref if s==0 else ystage)
      A_s: rows of w2 = i−base−2    (b from b_ref if s==0 else the b ring)
      F_s: window w = i−base−3      (writes ystage, or out_ref when last)
    Grid length n_win + 3S + 1; out block i holds window i−3S.
    Supports the production configuration only: y banded + p-stack P-stage,
    dense-G F-stage (n_wy == 0); x_dense selects MXU vs banded x-apply."""
    i = pl.program_id(0)
    n_diag = 2 * p + 1
    S = n_chain
    bring = scratch[0]
    ystage = scratch[1]
    nsc = 6 if cheby else 5
    subs = [tuple(scratch[2 + nsc * s: 2 + nsc * (s + 1)]) for s in range(S)]

    @pl.when(i == 0)
    def _():
        for s in range(S):
            p1r, p2r, azr, carry, xr = subs[s][:5]
            p1r[...] = jnp.zeros_like(p1r)
            p2r[...] = jnp.zeros_like(p2r)
            azr[...] = jnp.zeros_like(azr)
            carry[...] = jnp.zeros_like(carry)
            if cheby:
                subs[s][5][...] = jnp.zeros_like(subs[s][5])

    ny = x3_ref.shape[1]
    nx = x3_ref.shape[2]
    mx = gxT_ref.shape[1]

    for s in range(S):
        base = 3 * s
        p1r, p2r, azr, carry, xr = subs[s][:5]
        pring = subs[s][5] if cheby else None
        pring_prev = subs[s - 1][5] if (cheby and s > 0) else None
        last = s == S - 1
        skip_pa = zero_x and s == 0

        if skip_pa:
            # sub-step 0 from x = 0: r ≡ b — no P_0/A_0; just stage b into
            # the ring at A_0's cadence for F_0 and the later sub-steps
            @pl.when((i >= 2) & (i <= n_win + 2) & ("A" in stages))
            def _():
                bring[(i - 2) % bdepth] = b_ref[...]

        # ---- P_s: in-plane transforms of the sub-step's iterate ----------
        @pl.when((i >= base) & (i <= base + n_win) & ("P" in stages)
                 & bool(not skip_pa))
        def _(s=s, base=base, p1r=p1r, p2r=p2r, xr=xr):
            if skip_pa:
                return
            w = i - base
            slot = w % 4
            x_all = x3_ref[...] if s == 0 else ystage[...]
            xr[slot] = x_all
            X4 = jnp.concatenate([x_all[t] for t in range(p)], axis=0)
            if y_first:
                # factor-order swap — see _kernel's P-stage
                myX4, kyX4 = _band_y2(X4, my_ref, ky_ref, n_diag)
                nxp_ = x3_ref.shape[2]
                if prec_a == "high":
                    f32_ = jnp.float32
                    bf = jnp.bfloat16
                    d = lambda u, v: jax.lax.dot(u, v,
                                                 preferred_element_type=f32_)
                    bh = dmx_ref[...]
                    bl = dkx_ref[...]
                    mh = myX4.astype(bf)
                    ml = (myX4 - mh.astype(f32_)).astype(bf)
                    a1 = d(mh, bh) + (d(mh, bl) + d(ml, bh))
                    kh = kyX4.astype(bf)
                    kl = (kyX4 - kh.astype(f32_)).astype(bf)
                    a2 = (d(kh, bh[:, :nxp_])
                          + (d(kh, bl[:, :nxp_]) + d(kl, bh[:, :nxp_])))
                else:
                    a1 = _dot(myX4, dmx_ref[:], prec_a)
                    a2 = _dot(kyX4, dmx_ref[:, :nxp_], prec_a)
                p1s = a1[:, :nxp_]
                p2s = a1[:, nxp_:] + a2
                for t in range(p):
                    p1r[slot, t] = p1s[t * ny: (t + 1) * ny]
                    p2r[slot, t] = p2s[t * ny: (t + 1) * ny]
                return
            if x_dense and x_fused and prec_a == "high":
                # pre-split bf16 hi/lo tables (see _kernel's P-stage)
                f32_ = jnp.float32
                bf = jnp.bfloat16
                ah = X4.astype(bf)
                al = (X4 - ah.astype(f32_)).astype(bf)
                d = lambda u, v: jax.lax.dot(u, v,
                                             preferred_element_type=f32_)
                bh = dmx_ref[...]
                axkx = d(ah, bh) + (d(ah, dkx_ref[...]) + d(al, bh))
                nxp_ = x3_ref.shape[2]
                ax = axkx[:, :nxp_]
                kx = axkx[:, nxp_:]
            elif x_dense and x_fused:
                nxp_ = x3_ref.shape[2]
                axkx = _dot(X4, dmx_ref[:], prec_a)
                ax = axkx[:, :nxp_]
                kx = axkx[:, nxp_:]
            elif x_dense:
                ax = _dot(X4, dmx_ref[:], prec_a)
                kx = _dot(X4, dkx_ref[:], prec_a)
            else:
                ax, kx = _band_x2(X4, dmx_ref, dkx_ref, n_diag)
            my_ax, ky_ax = _band_y2(ax, my_ref, ky_ref, n_diag)
            my_kx = _band_y1(kx, my_ref, n_diag)
            p2s = ky_ax + my_kx
            for t in range(p):
                p1r[slot, t] = my_ax[t * ny: (t + 1) * ny]
                p2r[slot, t] = p2s[t * ny: (t + 1) * ny]

        # ---- A_s: residual rows ------------------------------------------
        @pl.when((i >= base + 2) & (i <= base + n_win + 2)
                 & ("A" in stages) & bool(not skip_pa))
        def _(s=s, base=base, p1r=p1r, p2r=p2r, azr=azr):
            if skip_pa:
                return
            w2 = i - base - 2
            ku = kid_ref[w2]
            aslot = w2 % 2
            for t in range(p):
                acc = None
                for j in range(t, t + n_diag):
                    pslot = (w2 - 1 + j // p) % 4
                    row = j % p
                    term = (kzr_ref[ku, t, j] * p1r[pslot, row]
                            + mzr_ref[ku, t, j] * p2r[pslot, row])
                    acc = term if acc is None else acc + term
                if s == 0:
                    bt = b_ref[t]
                    if S > 1:
                        bring[w2 % bdepth, t] = bt
                else:
                    bt = bring[w2 % bdepth, t]
                azr[aslot, t] = (bt - acc).astype(azr.dtype)

        # ---- F_s: FDM apply + update -------------------------------------
        @pl.when((i >= base + 3) & (i <= base + n_win + 2)
                 & ("F" in stages))
        def _(s=s, base=base, azr=azr, carry=carry, xr=xr, last=last,
              pring=pring, pring_prev=pring_prev, skip_pa=skip_pa):
            w = i - base - 3
            wz = zid_ref[w]
            f1 = coef_ref[s, 0]
            f2 = coef_ref[s, 1]
            dt = gy_ref.dtype
            tgt = out_ref if last else ystage

            # hoisted ring reads (see _kernel's F-stage); with the zero-x
            # sub-step the residual IS b, staged in the b ring
            if skip_pa:
                _r_blk = bring[w % bdepth]
                _r_planes = ([_r_blk[t] for t in range(p)]
                             + [bring[(w + 1) % bdepth, 0]])
            else:
                # upcast the bf16 ring ONCE per plane (m converts), not per
                # Ts term (m² converts) — see _kernel's F-stage
                _r_blk = azr[w % 2]
                _r_planes = ([_r_blk[t].astype(jnp.float32)
                              for t in range(p)]
                             + [azr[(w + 1) % 2, 0].astype(jnp.float32)])

            def r_plane(t):
                return _r_planes[t]

            xslot = w % 4
            Ts = []
            for k in range(m):
                T = vzf_ref[wz, 0, k] * r_plane(0)
                for t2 in range(1, m):
                    T = T + vzf_ref[wz, t2, k] * r_plane(t2)
                Ts.append(T)
            B_cat = _dot(gy_ref[:], jnp.concatenate(Ts, axis=1).astype(dt),
                         prec_f)
            my_e = gy_ref.shape[0]
            if f_stack:
                # k-stacked x transforms (see _kernel's F-stage)
                Bs = jnp.concatenate(
                    [B_cat[:, k * nx : (k + 1) * nx] for k in range(m)],
                    axis=0)
                Cq_all = _dot(Bs.astype(dt), gxT_ref[:], prec_f)
                Cq_all = Cq_all * lamyx_ref[wz]
                Cq_cat = jnp.concatenate(
                    [Cq_all[k * my_e : (k + 1) * my_e] for k in range(m)],
                    axis=1)
                Y_cat = _dot(gyt_ref[:], Cq_cat.astype(dt), prec_f)
                Ys = jnp.concatenate(
                    [Y_cat[:, k * mx : (k + 1) * mx] for k in range(m)],
                    axis=0)
                Z_all = _dot(Ys.astype(dt), gxtT_ref[:], prec_f)
                Zs = [Z_all[k * ny : (k + 1) * ny] for k in range(m)]
            else:
                Cqs = []
                for k in range(m):
                    Cq = _dot(B_cat[:, k * nx: (k + 1) * nx].astype(dt),
                              gxT_ref[:], prec_f)
                    # lamyx_ref holds PRE-INVERTED per-window-type
                    # denominators 1/(λy⊕λx + λz[k]), k-stacked rows
                    Cqs.append(Cq * lamyx_ref[wz,
                                              k * my_e : (k + 1) * my_e])
                Y_cat = _dot(gyt_ref[:],
                             jnp.concatenate(Cqs, axis=1).astype(dt), prec_f)
                Zs = [_dot(Y_cat[:, k * mx: (k + 1) * mx].astype(dt),
                           gxtT_ref[:], prec_f) for k in range(m)]
            # single-write output accumulation (see _kernel's F-stage)
            accs = [None] * m
            for k in range(m):
                Z = Zs[k]
                for t2 in range(m):
                    t = vzb_ref[wz, t2, k] * Z
                    accs[t2] = t if accs[t2] is None else accs[t2] + t
            # momentum recurrence: p_s = f1·p_{s−1} + f2·Mr (f1 term only on
            # cheby sub-steps > 0; the previous momentum planes are COMPLETE
            # — F_{s−1} fixed their shared plane up 3 grid steps ago)
            if pring_prev is not None:
                pp = pring_prev[w % 4]
                pn = [f1 * pp[t2] + f2 * accs[t2] for t2 in range(p)]
            else:
                pn = [f2 * accs[t2] for t2 in range(p)]
            if skip_pa:
                for t2 in range(p):
                    tgt[t2] = pn[t2]
            else:
                x_blk = xr[xslot]
                for t2 in range(p):
                    tgt[t2] = x_blk[t2] + pn[t2]
            if pring is not None and not last:
                for t2 in range(p):
                    pring[w % 4, t2] = pn[t2]
            carry[1] = accs[m - 1]

            @pl.when(w > 0)
            def _():
                # the shared plane p·w is missing window (w−1)'s Mr tail:
                # add f2·carry to the iterate AND to the stored momentum
                c = f2 * carry[0]
                tgt[0] += c
                if pring is not None and not last:
                    pring[w % 4, 0] += c

            carry[0] = carry[1]

        # ---- cleanup_s: flush the final shared plane ----------------------
        @pl.when(i == base + n_win + 3)
        def _(s=s, carry=carry, xr=xr, last=last, pring=pring,
              pring_prev=pring_prev, skip_pa=skip_pa):
            tgt = out_ref if last else ystage
            f1 = coef_ref[s, 0]
            f2 = coef_ref[s, 1]
            c = f2 * carry[0]
            if pring_prev is not None:
                c += f1 * pring_prev[n_win % 4, 0]
            if skip_pa:
                tgt[0] = c
            else:
                tgt[0] = xr[n_win % 4, 0] + c
            # NO pring write here: slot n_win%4 still holds window n_win−4's
            # momentum, read by F_{s+1} two grid steps later; the flushed
            # plane p·n_win lies beyond the trimmed grid (its momentum is
            # only ever read by the NEXT cleanup, which is junk-tolerant —
            # everything at that plane is sliced away / table-masked)
            for t in range(1, p):
                tgt[t] = jnp.zeros_like(tgt[t])


@functools.partial(
    jax.jit, static_argnames=("shape", "n_chain", "cheby", "zero_x", "prec",
                              "interpret", "stages"))
def _call_chain(x, b, coef, tables, shape, n_chain, cheby=False,
                zero_x=False, prec=("highest", "highest"), interpret=False,
                stages="PAF"):
    (ny, nx, m, p, n_win, n_wy, x_dense, y_banded, p_stack, x_fused,
     f_stack, z_bf16, y_first, f_zmxu) = shape
    assert n_wy == 0 and y_banded and p_stack and not f_zmxu, \
        "chain kernel supports the production configuration only"
    (kid, zid, kzr, mzr, lamz, vzf, vzb, dmx, dkx, my_m, ky_m,
     gy, gyt, gxT, gxtT, lamyx) = tables
    S = int(n_chain)
    # A_0 writes the b ring at grid step i (row w2 = i−2); sub-step s reads
    # that row 3·s grid steps LATER, so slot reuse needs bdepth > 3·(S−1)
    # (bdepth=8 at S=4 silently served overwritten b blocks)
    bdepth = max(4, 3 * (S - 1) + 1)
    kern = functools.partial(
        _kernel_chain, m=m, p=p, n_win=n_win, n_chain=S, bdepth=bdepth,
        cheby=bool(cheby), zero_x=bool(zero_x),
        x_dense=bool(x_dense), x_fused=bool(x_fused),
        f_stack=bool(f_stack), y_first=bool(y_first),
        interpret=bool(interpret),
        prec_a=prec[0], prec_f=prec[1], stages=stages)
    blk = (p, ny, nx)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    F = 3 * S  # front pad blocks; grid length n_win + 3S + 1
    scratch = [pltpu.VMEM((bdepth, p, ny, nx), jnp.float32),   # b ring
               pltpu.VMEM((p, ny, nx), jnp.float32)]           # ystage
    for _s in range(S):
        scratch += [pltpu.VMEM((4, p, ny, nx), jnp.float32),   # P1 ring
                    pltpu.VMEM((4, p, ny, nx), jnp.float32),   # P2 ring
                    pltpu.VMEM((2, p, ny, nx), jnp.bfloat16),  # r ring
                    pltpu.VMEM((2, ny, nx), jnp.float32),      # carry
                    pltpu.VMEM((4, p, ny, nx), jnp.float32)]   # x ring
        if cheby:
            scratch += [pltpu.VMEM((4, p, ny, nx), jnp.float32)]  # momentum
    if zero_x:
        # x is never read: pin its block spec to a constant block so the
        # pipeline fetches it once — the x HBM stream disappears
        x_spec = pl.BlockSpec(blk, lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec(blk, lambda i: (i + F, 0, 0),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_win + 3 * S + 1,),
        in_specs=[
            smem, smem,
            smem, smem, smem, smem, smem, smem,
            x_spec,                                       # x: P_0 planes
            pl.BlockSpec(blk, lambda i: (i + F - 2, 0, 0),
                         memory_space=pltpu.VMEM),        # b: A_0 rows
            vmem, vmem, vmem, vmem,
            vmem, vmem, vmem, vmem, vmem,
        ],
        out_specs=pl.BlockSpec(blk, lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    from jax._src.config import enable_x64 as _enable_x64

    with _enable_x64(False):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(kid, zid, kzr, mzr, lamz, vzf, vzb, coef, x, b,
          dmx, dkx, my_m, ky_m, gy, gyt, gxT, gxtT, lamyx)


@functools.partial(jax.jit,
                   static_argnames=("shape", "prec", "interpret", "stages"))
def _call(x, b, omega, tables, shape, prec=("highest", "highest"),
          interpret=False, stages="PAF"):
    (ny, nx, m, p, n_win, n_wy, x_dense, y_banded, p_stack, x_fused,
     f_stack, z_bf16, y_first, f_zmxu) = shape
    zmxu_ops = ()
    if f_zmxu:
        (kid, zid, kzr, mzr, lamz, vzf, vzb, dmx, dkx, my_m, ky_m,
         gy, gyt, gxT, gxtT, lamyx, gyz, gytz) = tables
        zmxu_ops = (gyz, gytz)
    else:
        (kid, zid, kzr, mzr, lamz, vzf, vzb, dmx, dkx, my_m, ky_m,
         gy, gyt, gxT, gxtT, lamyx) = tables
    kern = functools.partial(_kernel, m=m, p=p, n_win=n_win, n_wy=n_wy,
                             x_dense=bool(x_dense), y_banded=bool(y_banded),
                             p_stack=bool(p_stack), x_fused=bool(x_fused),
                             f_stack=bool(f_stack), z_bf16=bool(z_bf16),
                             y_first=bool(y_first), f_zmxu=bool(f_zmxu),
                             interpret=bool(interpret),
                             prec_a=prec[0], prec_f=prec[1], stages=stages)
    blk = (p, ny, nx)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    # index maps are pure affine (the inputs carry 3 extra tail blocks so the
    # largest offset i+3 stays in range): non-affine maps (clamping) made
    # Mosaic precompute per-step offsets into SMEM, which overflowed its 1MB
    # at larger grids
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_win + 4,),
        in_specs=[
            smem, smem,                          # kid zid window-type indices
            smem, smem, smem, smem, smem, smem,  # kzr mzr lamz vzf vzb omega
            pl.BlockSpec(blk, lambda i: (i + 3, 0, 0),
                         memory_space=pltpu.VMEM),       # x: P-stage planes
            pl.BlockSpec(blk, lambda i: (i + 1, 0, 0),
                         memory_space=pltpu.VMEM),       # b: A-stage rows
            vmem, vmem, vmem, vmem,                      # dmx dkx my ky
            vmem, vmem, vmem, vmem, vmem,                # gy gyt gxT gxtT lamyx
        ] + [vmem] * len(zmxu_ops),
        out_specs=pl.BlockSpec(blk, lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((4, p, ny, nx), jnp.float32),     # P1 ring
            pltpu.VMEM((4, p, ny, nx), jnp.float32),     # P2 ring
            pltpu.VMEM((2, p, ny, nx), jnp.bfloat16),    # r ring (see A-stage)
            pltpu.VMEM((2, ny, nx), jnp.float32),        # FDM carry planes
            pltpu.VMEM((4, p, ny, nx), jnp.float32),     # x plane ring
        ],
    )
    # trace the kernel with x64 promotion OFF regardless of the caller's
    # config: under jax_enable_x64 the body's int scalars promote to 64 bit
    # and Mosaic's convert-element-type lowering rule recurses forever
    from jax._src.config import enable_x64 as _enable_x64

    with _enable_x64(False):
        # out has the SAME padded shape as x (blocks beyond the grid stay
        # unwritten): steps chain with no per-step pad/slice — measured
        # 1.4 ms of a 4.0 ms step at 17M DoF
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(kid, zid, kzr, mzr, lamz, vzf, vzb, omega, x, b,
          dmx, dkx, my_m, ky_m, gy, gyt, gxT, gxtT, lamyx, *zmxu_ops)


class SmootherStepKernel:
    """x' = x + ω P⁻¹ (b − A x) as ONE Pallas kernel (Cartesian, FDM ov1)."""

    def __init__(self, op, asm, transform_dtype=jnp.bfloat16,
                 fdm_y: str = "dense", x_apply: str = "dense",
                 y_apply: str = "banded", p_stack: bool = True,
                 precision_a: str = "high",
                 precision_f: str = "bf16",
                 f_stack: bool = False,
                 z_bf16: bool = False,
                 y_first: bool = False,
                 f_zmxu: bool = False,
                 n_chain: int = 1):
        # transform_dtype bf16: numerically IDENTICAL to f32 storage (the
        # F-path dots round both operands to bf16 anyway) but halves the
        # G-table DMA and kills the per-dot table casts — measured −9%.
        # p_stack: all p planes stacked along sublanes in the P-stage —
        # 18 y-rolls per grid step instead of 18·p (rolls are
        # instruction-bound).
        # default variant (v5e, Q4 64³, chained padded steps — measured):
        #   x=dense/high 5.19, x=banded 4.85, all-banded 4.69, all-dense 4.29,
        #   pa=default 5.91 GDoF/s (rejected: bf16 A-path noise broke MG
        #   parity in round 2, 8 vs 5 outer its).  y banded is exact f32 on
        #   the VPU; pf=bf16 perturbs only P⁻¹ (~7e-3) — parity-checked E2E.
        """fdm_y: "windowed" runs the FDM y-transforms as per-y-window VPU
        vector broadcasts on reshaped plane rows (the block-banded structure
        of G — ~2.4x fewer F-stage MXU FLOPs, but measured SLOWER on v5e:
        6.8 vs 4.7 ms/step — the VPU broadcasts + stack/concat relayouts cost
        more than the skipped matmul zeros).  "dense" (default) keeps full
        matmuls."""
        dofs = asm.dofs
        mesh = dofs.mesh
        if (mesh.dim != 3 or asm.n_overlap != 1
                or asm.patch_type != "element" or any(mesh.periodic)
                or asm.global_fdm is None
                or getattr(op, "coeff", None) is not None):
            raise ValueError("SmootherStepKernel: unsupported configuration")
        p = asm.degree
        m = asm.m
        n_diag = 2 * p + 1
        n_win = mesh.n_cells[2]
        n_cy = mesh.n_cells[1]
        nz, ny, nx = (dofs.nodes_per_dim[2], dofs.nodes_per_dim[1],
                      dofs.nodes_per_dim[0])
        # ---- boundary trim ---------------------------------------------------
        # The LAST node along each axis is Dirichlet-constrained (non-periodic
        # box), so every folded table (free masks in M̂/K̂, masks+weights in
        # G/Gᵀ) is structurally ZERO in that row/column: the kernel never
        # reads it and writes x back unchanged.  Dropping it shrinks the
        # working grid from (c·p+1)³ nodes to (c·p)³ — at Q4 64³ that takes
        # the lane axis from 257→384 padded down to 256 exact, cutting the
        # P-stage dot FLOPs 2.3× and the ACTUAL per-step DMA 1.55× (the
        # padded (264, 384) blocks moved 1.62 MB/stream where the logical
        # plane is 1.0 MB).  unpad restores the boundary values from the
        # caller's x (out = x at constrained nodes).
        nzt, nyt, nxt = nz - 1, ny - 1, nx - 1
        assert nzt == n_win * p, (nzt, n_win, p)
        # the trim assumes the first/last node plane per axis is Dirichlet-
        # constrained — verify against the DoF handler's actual mask instead
        # of silently mis-smoothing a future non-all-Dirichlet configuration
        bm = np.asarray(dofs.boundary_mask).reshape(nz, ny, nx)
        if not (bm[0].all() and bm[-1].all() and bm[:, 0].all()
                and bm[:, -1].all() and bm[..., 0].all()
                and bm[..., -1].all()):
            raise ValueError("SmootherStepKernel: boundary trim requires "
                             "all-Dirichlet box boundaries")
        if fdm_y == "windowed":
            # y padded so plane rows reshape into (nyp/p, p) window slots and
            # the padded window count stays in range
            cyq = -(-n_cy // 8) * 8
            lcm = 8 * p // np.gcd(8, p)
            nyp = -(-max(nyt, cyq * p + p) // lcm) * lcm
            self._n_wy = cyq
        else:
            nyp = -(-nyt // 8) * 8
            self._n_wy = 0
        nxp = -(-nxt // 128) * 128

        # VMEM budget estimate: the z-plane pipeline keeps three f32 plane
        # rings (4 blocks each), a bf16 r ring, carries, and double-buffered
        # in/out blocks resident.  Past the 100 MB Mosaic limit the kernel
        # fails to COMPILE at runtime (first hit: 128^3 cells = (512, 512)
        # planes, large-scaling r=7) — raise here instead so eligible-but-
        # too-big shapes take the documented XLA fallback.
        plane = nyp * nxp * 4
        est = (3 * 4 * p * plane          # P1/P2/x f32 rings
               + 2 * p * plane // 2       # r ring (bf16)
               + 2 * plane                # FDM carries
               + 3 * 2 * p * plane)       # x/b/out double buffers
        # threshold 60 MiB: (256, 256) planes estimate ~20 MiB (fine);
        # (512, 512) ~78 MiB — at that size the remote compile reproducibly
        # dies mid-response (large-scaling r=7, results_r5.md), so eligible-
        # but-too-big shapes take the XLA fallback instead of crashing
        if est > 60 * 1024 * 1024:
            raise ValueError(
                f"SmootherStepKernel: estimated VMEM {est >> 20} MiB for "
                f"({nyp}, {nxp}) planes exceeds the Mosaic budget — "
                "XLA composition fallback")

        # ---- operator tables (free masks folded on both sides) -------------
        Mxg = np.asarray(op.M1d_global[0], np.float64)
        Kxg = np.asarray(op.K1d_global[0], np.float64)
        Myg = np.asarray(op.M1d_global[1], np.float64)
        Kyg = np.asarray(op.K1d_global[1], np.float64)
        Mzg = np.asarray(op.M1d_global[2], np.float64)
        Kzg = np.asarray(op.K1d_global[2], np.float64)

        def free(n):
            f = np.ones(n)
            f[0] = f[-1] = 0.0
            return f

        fx, fy, fz = free(nx), free(ny), free(nz)
        # trimmed to the working grid: row/col nx−1 (ny−1) are zero anyway
        Mxf = (fx[:, None] * Mxg * fx[None, :])[:nxt, :nxt]
        Kxf = (fx[:, None] * Kxg * fx[None, :])[:nxt, :nxt]
        Myf = (fy[:, None] * Myg * fy[None, :])[:nyt, :nyt]
        Kyf = (fy[:, None] * Kyg * fy[None, :])[:nyt, :nyt]

        if x_apply == "dense":
            # x-apply runs as plane @ M̂ₓᵀ on the MXU (see _kernel): tables
            # are the dense transposed 1D matrices, zero-padded to lane tiles
            dmx = np.zeros((nxp, nxp), np.float32)
            dkx = np.zeros((nxp, nxp), np.float32)
            dmx[:nxt, :nxt] = Mxf.T
            dkx[:nxt, :nxt] = Kxf.T
        else:
            # x-direction banded tables: d[k][i] = M[i, i + k − p], padded
            dmx = np.zeros((n_diag, nxp), np.float32)
            dkx = np.zeros((n_diag, nxp), np.float32)
            rows = np.arange(nxt)
            for k in range(n_diag):
                cols = rows + k - p
                okc = (cols >= 0) & (cols < nxt)
                dmx[k, rows[okc]] = Mxf[rows[okc], cols[okc]]
                dkx[k, rows[okc]] = Kxf[rows[okc], cols[okc]]
        self._p_stack = bool(p_stack and y_apply == "banded"
                             and self._n_wy == 0)
        # fused x-tables: M̂ₓᵀ|K̂ₓᵀ side by side — one double-width MXU dot
        # instead of two per P-stage (same MACs, half the dot calls)
        self._x_fused = bool(self._p_stack and x_apply == "dense")
        self._f_stack = bool(f_stack and self._n_wy == 0)
        if self._x_fused:
            dmx = np.concatenate([dmx, dkx], axis=1)
            if precision_a == "high":
                # pre-split the fused table into bf16 hi/lo halves host-side
                # (dkx carries the lo half) — see the kernel's P-stage
                hi = dmx.astype(jnp.bfloat16)
                dkx = (dmx - hi.astype(np.float32)).astype(jnp.bfloat16)
                dmx = hi
            else:
                dkx = np.zeros((8, 128), np.float32)  # unused placeholder
        if y_apply == "banded":
            # column tables D[r, k] = M[r, r + k − p]; zeros kill wrapped
            # sublane rows and the y padding
            my_m = np.zeros((nyp, n_diag), np.float32)
            ky_m = np.zeros((nyp, n_diag), np.float32)
            rows_y = np.arange(nyt)
            for k in range(n_diag):
                cols = rows_y + k - p
                okc = (cols >= 0) & (cols < nyt)
                my_m[rows_y[okc], k] = Myf[rows_y[okc], cols[okc]]
                ky_m[rows_y[okc], k] = Kyf[rows_y[okc], cols[okc]]
            if self._p_stack:
                # p-tiled tables for the stacked apply (per-plane edge zeros
                # double as the cross-plane roll guard)
                my_m = np.tile(my_m, (p, 1))
                ky_m = np.tile(ky_m, (p, 1))
        else:
            # y-direction dense (padded)
            my_m = np.zeros((nyp, nyp), np.float32)
            ky_m = np.zeros((nyp, nyp), np.float32)
            my_m[:nyt, :nyt] = Myf
            ky_m[:nyt, :nyt] = Kyf
        # z-row tables, fz folded both sides: (n_win+1, p, 3p); rows/columns
        # at the trimmed node nz−1 excluded (structurally zero: fz[nz−1]=0)
        kzr = np.zeros((n_win + 1, p, 3 * p), np.float32)
        mzr = np.zeros((n_win + 1, p, 3 * p), np.float32)
        for w in range(n_win + 1):
            for t in range(p):
                r_ = w * p + t
                if r_ >= nzt:
                    continue
                for j in range(3 * p):
                    c_ = w * p - p + j
                    if 0 <= c_ < nzt and abs(c_ - r_) <= p:
                        kzr[w, t, j] = Kzg[r_, c_]
                        mzr[w, t, j] = Mzg[r_, c_]
                kzr[w, t] *= fz[r_]
                mzr[w, t] *= fz[r_]
        # input-side fz: column c_ = 0 (c_ = nz−1 is outside the trimmed grid)
        for w in range(n_win + 1):
            for j in range(3 * p):
                c_ = w * p - p + j
                if c_ == 0:
                    kzr[w, :, j] = 0.0
                    mzr[w, :, j] = 0.0

        # ---- FDM tables (same folding as FDMSlabKernel) ---------------------
        Gs, Gts, lams = asm.global_fdm
        Gx, Gy, Gz = (np.asarray(G, np.float32) for G in Gs)
        Gxt, Gyt, Gzt = (np.asarray(G, np.float32) for G in Gts)
        lx, ly, lz = (np.asarray(l, np.float32).reshape(-1) for l in lams)
        vzf = np.zeros((n_win, m, m), np.float32)
        vzb = np.zeros((n_win, m, m), np.float32)
        for w in range(n_win):
            vzf[w] = Gz[w * m : (w + 1) * m, w * p : w * p + m].T
            vzb[w] = Gzt[w * p : w * p + m, w * m : (w + 1) * m]

        def padc(M, cols):
            return np.pad(M, ((0, 0), (0, cols - M.shape[1])))

        def padr(M, rows_):
            return np.pad(M, ((0, rows_ - M.shape[0]), (0, 0)))

        # SMEM stores scalars with heavy per-element padding (~160x measured)
        # — dedup the per-window tables (uniform meshes have <= 3 unique
        # window types per direction) and index through small id vectors
        zkey = np.round(np.concatenate(
            [vzf.reshape(n_win, -1), vzb.reshape(n_win, -1),
             lz.reshape(n_win, m)], axis=1), 6)
        zu, zid = np.unique(zkey, axis=0, return_inverse=True)
        U = len(zu)
        vzf_u = np.zeros((U, m, m), np.float32)
        vzb_u = np.zeros((U, m, m), np.float32)
        lamz_u = np.zeros((U, m), np.float32)
        for w in range(n_win):
            vzf_u[zid[w]] = vzf[w]
            vzb_u[zid[w]] = vzb[w]
            lamz_u[zid[w]] = lz.reshape(n_win, m)[w]
        kkey = np.round(np.concatenate(
            [kzr.reshape(n_win + 1, -1), mzr.reshape(n_win + 1, -1)],
            axis=1), 6)
        ku_, kid = np.unique(kkey, axis=0, return_inverse=True)
        KU = len(ku_)
        kzr_u = np.zeros((KU, p, 3 * p), np.float32)
        mzr_u = np.zeros((KU, p, 3 * p), np.float32)
        for w in range(n_win + 1):
            kzr_u[kid[w]] = kzr[w]
            mzr_u[kid[w]] = mzr[w]

        tdt = transform_dtype
        if self._n_wy:
            cyq = self._n_wy
            # per-y-window eigen blocks: Gy[(v,j), v·p+s] = vyf[s,j,v]
            vyf = np.zeros((m, m, cyq, 1), np.float32)
            vyb = np.zeros((m, m, cyq, 1), np.float32)
            for v in range(n_cy):
                vyf[:, :, v, 0] = Gy[v * m : (v + 1) * m,
                                     v * p : v * p + m].T
                vyb[:, :, v, 0] = Gyt[v * p : v * p + m,
                                      v * m : (v + 1) * m]
            gy_t = jnp.asarray(vyf)
            gyt_t = jnp.asarray(vyb)
            lamy_rows = np.ones(cyq * m, np.float32)
            lamy_rows[: len(ly)] = ly
            lamyx_t = jnp.asarray(lamy_rows[:, None] + lx[None, :])
        else:
            # node axes trimmed to the working grid (last column/row zero)
            gy_t = jnp.asarray(padc(Gy[:, :nyt], nyp), tdt)
            gyt_t = jnp.asarray(padr(Gyt[:nyt], nyp), tdt)
            # pre-inverted eigen denominators per z-window TYPE (U <= 3 on
            # uniform meshes): rec[u, k] = 1/(λy⊕λx + λz[u, k]) — the F-stage
            # scale becomes one vreg mult (no divide, no broadcast add).
            # Stored k-STACKED along sublanes (U, m·my, mx) so the f_stack
            # path can scale the stacked Cq block with one table read; the
            # per-k path takes static row slices of the same layout.
            rec = 1.0 / (ly[None, None, :, None] + lx[None, None, None, :]
                         + lamz_u[:, :, None, None])
            lamyx_t = jnp.asarray(
                rec.astype(np.float32).reshape(U, m * len(ly), len(lx)))
        # eigen-x dimension padded to a lane tile (zeros): the f_stack path
        # takes lane slices of Y_cat at multiples of mx, which Mosaic only
        # concatenates when 128-aligned (padding costs ~(mxp/mx−1) extra MXU
        # columns, all zero)
        gxT_m = padr(Gx.T[:nxt], nxp)
        gxtT_m = padc(Gxt.T[:, :nxt], nxp)
        if self._n_wy == 0:
            mxp = -(-gxT_m.shape[1] // 128) * 128
            gxT_m = np.pad(gxT_m, ((0, 0), (0, mxp - gxT_m.shape[1])))
            gxtT_m = np.pad(gxtT_m, ((0, mxp - gxtT_m.shape[0]), (0, 0)))
            lam_np = np.asarray(lamyx_t)
            lamyx_t = jnp.asarray(np.pad(
                lam_np, ((0, 0), (0, 0), (0, mxp - lam_np.shape[2]))))
        # f_zmxu (VERDICT r4 task #5a probe): pre-scaled k/s-stacked eigen
        # blocks that fold BOTH z-transform scalar chains into the Gy/Gyt
        # MXU dots (see _kernel's f_zmxu branch)
        self._f_zmxu = bool(f_zmxu) and self._n_wy == 0
        zmxu_tabs = ()
        if self._f_zmxu:
            gy_np = padc(Gy[:, :nyt], nyp).astype(np.float32)
            gyt_np = padr(Gyt[:nyt], nyp).astype(np.float32)
            my_rows = gy_np.shape[0]
            gyz = np.zeros((U, m * my_rows, m * nyp), np.float32)
            gytz = np.zeros((U, m * nyp, m * my_rows), np.float32)
            for u in range(U):
                for s in range(m):
                    for k in range(m):
                        gyz[u, k * my_rows : (k + 1) * my_rows,
                            s * nyp : (s + 1) * nyp] = vzf_u[u, s, k] * gy_np
                        gytz[u, s * nyp : (s + 1) * nyp,
                             k * my_rows : (k + 1) * my_rows] = (
                                 vzb_u[u, s, k] * gyt_np)
            zmxu_tabs = (jnp.asarray(gyz, tdt), jnp.asarray(gytz, tdt))
        self.tables = (
            jnp.asarray(kid.astype(np.int32)), jnp.asarray(zid.astype(np.int32)),
            jnp.asarray(kzr_u), jnp.asarray(mzr_u),
            jnp.asarray(lamz_u),
            jnp.asarray(vzf_u), jnp.asarray(vzb_u),
            jnp.asarray(dmx), jnp.asarray(dkx),
            jnp.asarray(my_m), jnp.asarray(ky_m),
            gy_t, gyt_t,
            jnp.asarray(gxT_m, tdt),
            jnp.asarray(gxtT_m, tdt),
            lamyx_t,
        ) + zmxu_tabs
        self.shape = (nyp, nxp, m, p, n_win, self._n_wy,
                      int(x_apply == "dense"), int(y_apply == "banded"),
                      int(self._p_stack), int(self._x_fused),
                      int(self._f_stack),
                      int(z_bf16 and self._n_wy == 0),
                      int(y_first and self._x_fused),
                      int(self._f_zmxu))
        self.precisions = (precision_a, precision_f)
        self.grid_shape = (nz, ny, nx)
        self.trim_shape = (nzt, nyt, nxt)
        self.p = p
        # x/b front-padded by 3·n_chain blocks + tail blocks beyond the grid
        # so all block index maps stay affine: total (n_win + 6S + 1) blocks
        # (S = 1 reproduces the single-step n_win+7 layout)
        self.n_chain = int(n_chain)
        S = self.n_chain
        if S > 1 and (self._n_wy or y_apply != "banded"
                      or not self._p_stack):
            raise ValueError("n_chain > 1 requires the production "
                             "configuration (banded-y p-stack, dense G)")
        self._front = 3 * S * p
        self._pad = ((self._front,
                      (n_win + 6 * S + 1) * p - nzt - self._front),
                     (0, nyp - nyt), (0, nxp - nxt))

    def as_chain(self, n_chain: int) -> "SmootherStepKernel":
        """A chain-kernel VIEW of this kernel: shares every baked table,
        only the padded layout (front pad = 3·S blocks) differs.  Cheap —
        use it to serve several sweep lengths from one table build
        (production smoothers need S and S−1: step() vs vmult())."""
        import copy

        S = int(n_chain)
        if S > 1 and (self._n_wy or not self.shape[7] or not self._p_stack):
            raise ValueError("n_chain > 1 requires the production "
                             "configuration (banded-y p-stack, dense G)")
        k = copy.copy(self)
        k.n_chain = S
        nyp, nxp = self.shape[0], self.shape[1]
        n_win = self.shape[4]
        nzt, nyt, nxt = self.trim_shape
        p = self.p
        k._front = 3 * S * p
        k._pad = ((k._front, (n_win + 6 * S + 1) * p - nzt - k._front),
                  (0, nyp - nyt), (0, nxp - nxt))
        return k

    def pad_grid(self, g):
        """(nz, ny, nx) grid -> the kernel's padded layout (boundary-trimmed:
        the last node per axis is Dirichlet-constrained and dropped; unpad
        restores it from the caller's x)."""
        nzt, nyt, nxt = self.trim_shape
        return jnp.pad(g[:nzt, :nyt, :nxt].astype(jnp.float32), self._pad)

    def unpad_grid(self, gp, full_src=None):
        """Padded layout -> (nz, ny, nx) grid.  The trimmed last plane/row/
        column per axis is Dirichlet-constrained: the step leaves x unchanged
        there, so it is restored from ``full_src`` (the pre-step x grid /
        any grid holding the constrained values); zeros when omitted."""
        nzt, nyt, nxt = self.trim_shape
        inner = gp[self._front : self._front + nzt, :nyt, :nxt]
        if full_src is None:
            full_src = jnp.zeros(self.grid_shape, gp.dtype)
        return full_src.astype(gp.dtype).at[:nzt, :nyt, :nxt].set(inner)

    def step_padded(self, xp, bp, omega=1.0, interpret=False, stages="PAF"):
        """One step in the padded layout: in and out share the same shape,
        so consecutive steps (and level ops that accept the padded grid)
        chain with zero pad/slice traffic."""
        assert self.n_chain == 1, "use steps_padded on a chain kernel"
        om = jnp.full((1, 1), omega, jnp.float32)
        return _call(xp, bp, om, self.tables, self.shape,
                     prec=self.precisions, interpret=interpret, stages=stages)

    def steps_padded(self, xp, bp, omegas, interpret=False, stages="PAF"):
        """n_chain fused steps in ONE HBM pass (padded layout).

        omegas: n_chain relaxation factors, one per sub-step.  DMA cost is
        that of a single step (read x, read b, write out); the intermediate
        iterates live in VMEM only (_kernel_chain)."""
        om = jnp.asarray(omegas, jnp.float32).reshape(self.n_chain, 1)
        coef = jnp.concatenate([jnp.zeros_like(om), om], axis=1)
        return _call_chain(xp, bp, coef, self.tables, self.shape,
                           n_chain=self.n_chain, prec=self.precisions,
                           interpret=interpret, stages=stages)

    def sweep_padded(self, xp, bp, coefs, zero_x=False, interpret=False,
                     stages="PAF"):
        """n_chain MOMENTUM sub-steps in ONE HBM pass (padded layout):

            p_s = f1_s·p_{s−1} + f2_s·M(b − A x_{s−1}),   x_s = x_{s−1} + p_s

        with coefs rows (f1_s, f2_s).  This is deal.II's Chebyshev iteration
        (1st kind: f2 from the rho recurrence; 4th kind: the Lottes factors),
        so a degree-k smoother apply is ONE kernel launch.  zero_x starts
        from x = 0: sub-step 0 skips its residual pipeline and xp is never
        read (pass bp as the shape donor) — the whole zero-guess vmult then
        streams b in and x' out only."""
        coef = jnp.asarray(coefs, jnp.float32).reshape(self.n_chain, 2)
        return _call_chain(xp, bp, coef, self.tables, self.shape,
                           n_chain=self.n_chain, cheby=True,
                           zero_x=bool(zero_x), prec=self.precisions,
                           interpret=interpret, stages=stages)

    def step_grids(self, xg, bg, omega=1.0, interpret=False):
        out = self.step_padded(self.pad_grid(xg), self.pad_grid(bg), omega,
                               interpret)
        return self.unpad_grid(out, full_src=xg)

    def step(self, x_flat, b_flat, omega=1.0, interpret=False):
        nz, ny, nx = self.grid_shape
        return self.step_grids(x_flat.reshape(nz, ny, nx),
                               b_flat.reshape(nz, ny, nx), omega,
                               interpret).reshape(-1)
