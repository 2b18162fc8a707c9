"""Stage-by-stage localization of the merged dd kernel's precision leak.

Replicates _kern_merged_dd's exact arithmetic in numpy float32 (np.roll ==
pltpu.roll semantics) and runs the SAME dataflow in float64, comparing every
intermediate.  Finally compares the numpy-dd replica against the real kernel
(interpret mode) to confirm the replica is faithful.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

# sitecustomize pre-imports jax and pins jax_platforms="axon,cpu"; the env
# var alone does not stick — force CPU by config like tests/conftest.py
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

f32 = np.float32


def two_sum(a, b):
    s = a + b
    bv = s - a
    return s, (a - (s - bv)) + (b - bv)


def qtwo_sum(a, b):
    s = a + b
    return s, b - (s - a)


def split12(a):
    c = f32(4097.0) * a
    big = c - a
    hi = c - big
    return hi, a - hi


def dd_band_accum(accs, xh, xl, tabs, n_diag, axis):
    p = (n_diag - 1) // 2
    n = xh.shape[axis]
    for k in range(n_diag):
        shift = (p - k) % n
        rh = np.roll(xh, shift, axis)
        rl = np.roll(xl, shift, axis)
        rhh, rhl = split12(rh)
        for j, tab in enumerate(tabs):
            Dh, Dl, Dhh, Dhl = (t(k) for t in tab)
            prod = Dh * rh
            e = (((Dhh * rhh - prod) + Dhh * rhl) + Dhl * rhh) + Dhl * rhl
            e = e + (Dh * rl + Dl * rh)
            if accs[j] is None:
                accs[j] = (prod, e)
            else:
                ah, ac = accs[j]
                ah, e2 = two_sum(ah, prod)
                accs[j] = (ah, ac + (e2 + e))
    return accs


def band_exact(x64, T64, n_diag, axis):
    """f64 banded apply with the same roll convention."""
    p = (n_diag - 1) // 2
    n = x64.shape[axis]
    out = np.zeros_like(x64)
    for k in range(n_diag):
        shift = (p - k) % n
        out = out + T64[k] * np.roll(x64, shift, axis)
    return out


def dd_scalar_acc(acc, s4, ph, pl_, phh, phl):
    sh, sl, shh, shl = (f32(v) for v in s4)
    prod = sh * ph
    e = ((shh * phh - prod) + shh * phl + shl * phh) + shl * phl
    e = e + (sh * pl_ + sl * ph)
    if acc is None:
        return prod, e
    ah, ac = acc
    ah, e2 = two_sum(ah, prod)
    return ah, ac + (e2 + e)


def dd_coeff_acc(acc, ch, cl, gh, gl, ghh, ghl):
    chh, chl = split12(ch)
    prod = ch * gh
    e = ((chh * ghh - prod) + chh * ghl + chl * ghh) + chl * ghl
    e = e + (ch * gl + cl * gh)
    if acc is None:
        return prod, e
    ah, ac = acc
    ah, e2 = two_sum(ah, prod)
    return ah, ac + (e2 + e)


def err(tag, dd_pair, exact):
    got = dd_pair[0].astype(np.float64) + dd_pair[1].astype(np.float64)
    scale = max(np.abs(exact).max(), 1e-30)
    e = np.abs(got - exact).max() / scale
    print(f"  {tag:28s} rel_err {e:9.2e}   scale {scale:9.2e}")
    return e


def main():
    from dealii_asm_tpu.fem.dofs import DofHandler
    from dealii_asm_tpu.mesh.grid import StructuredMesh
    from dealii_asm_tpu.mesh.transforms import kershaw_transform
    from dealii_asm_tpu.ops.laplace import LaplaceOperator
    from dealii_asm_tpu.ops.pallas.merged_vmult import MergedDDVmultKernel
    from dealii_asm_tpu.ops.ddmath import dd_from_f64

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, nargs=3, default=(3, 3, 4))
    ap.add_argument("--degree", type=int, default=2)
    a = ap.parse_args()
    cells, degree = tuple(a.cells), a.degree
    tf = kershaw_transform(0.3, 0.3)
    mesh = StructuredMesh(3, cells, transform=tf)
    dofs = DofHandler(mesh, degree)
    op = LaplaceOperator(dofs, mapping_degree=3, dtype=jnp.float64)
    kern = MergedDDVmultKernel(op, interpret=True)

    p, m = kern.p, kern.m
    q = m
    cz = kern.n_cells_zyx[0]
    nz, ny, nx = kern.grid_shape
    Wyp, Wxp = kern.Wyp, kern.Wxp
    n_diag = kern.n_diag

    rng = np.random.default_rng(5)
    u = rng.standard_normal(dofs.n_dofs)
    uh, ul = (np.asarray(a) for a in dd_from_f64(jnp.asarray(u)))

    # expand + pad exactly as the kernel does (gathers are exact)
    def expand(g):
        g = np.take(g, np.asarray(kern._iy), axis=1)
        g = np.take(g, np.asarray(kern._ix), axis=2)
        return g

    gh = expand(uh.reshape(nz, ny, nx).astype(f32))
    gl = expand(ul.reshape(nz, ny, nx).astype(f32))
    zpad = kern.nzb * p - nz
    gh = np.pad(gh, ((0, zpad), (0, Wyp - gh.shape[1]), (0, Wxp - gh.shape[2])))
    gl = np.pad(gl, ((0, zpad), (0, Wyp - gl.shape[1]), (0, Wxp - gl.shape[2])))
    g64 = gh.astype(np.float64) + gl.astype(np.float64)

    # tables (f32 splits from the kernel; f64 = h + l)
    def tab64(t4):
        return t4[0].astype(np.float64) + np.asarray(t4[1], np.float64)

    fwd = [np.asarray(t) for t in kern.fwd_tabs]
    bwd = [np.asarray(t) for t in kern.bwd_tabs]
    xfN, xfD = fwd[0:4], fwd[4:8]
    yfN, yfD = fwd[8:12], fwd[12:16]
    xbN, xbD = bwd[0:4], bwd[4:8]
    ybN, ybD = bwd[8:12], bwd[12:16]

    def xtabs(t4):
        return tuple((lambda k, r=r: r[k : k + 1, :]) for r in t4)

    def ytabs(t4):
        return tuple((lambda k, r=r: r[:, k : k + 1]) for r in t4)

    # x tables for f64: (n_diag, Wxp) -> broadcast rows; y: (p*Wyp, n_diag)
    xfN64, xfD64 = tab64(xfN), tab64(xfD)
    yfN64, yfD64 = tab64(yfN), tab64(yfD)
    xbN64, xbD64 = tab64(xbN), tab64(xbD)
    ybN64, ybD64 = tab64(ybN), tab64(ybD)

    def xT64(T):  # (n_diag, Wxp) -> list of (1, Wxp)
        return [T[k : k + 1, :] for k in range(n_diag)]

    def yT64(T):  # (p*Wyp, n_diag) -> list of (p*Wyp, 1)
        return [T[:, k : k + 1] for k in range(n_diag)]

    coeff = [np.asarray(t) for t in kern.coeff_wtabs]
    c_pairs = [(coeff[2 * i], coeff[2 * i + 1]) for i in range(6)]
    c64 = [h.astype(np.float64) + l for h, l in c_pairs]

    zN, zD = kern.zN, kern.zD
    zN64 = np.array([[s[0] + np.float64(np.float32(s[1])) for s in row]
                     for row in zN])
    zD64 = np.array([[s[0] + np.float64(np.float32(s[1])) for s in row]
                     for row in zD])

    # ---------------- P-stage: per block -------------------------------------
    nblk = cz + 1  # blocks 0..n_cz
    ring_dd = {}
    ring_64 = {}
    maxerrP = 0.0
    for b in range(nblk):
        Xh = gh[b * p : (b + 1) * p].reshape(p * Wyp, Wxp)
        Xl = gl[b * p : (b + 1) * p].reshape(p * Wyp, Wxp)
        X64 = g64[b * p : (b + 1) * p].reshape(p * Wyp, Wxp)

        accs = dd_band_accum([None, None], Xh, Xl,
                             [xtabs(xfN), xtabs(xfD)], n_diag, 1)
        ah, al = qtwo_sum(*accs[0])
        dh, dl = qtwo_sum(*accs[1])
        accs = dd_band_accum([None, None], ah, al,
                             [ytabs(yfN), ytabs(yfD)], n_diag, 0)
        Bh, Bl = qtwo_sum(*accs[0])
        Ch, Cl = qtwo_sum(*accs[1])
        accs = dd_band_accum([None], dh, dl, [ytabs(yfN)], n_diag, 0)
        Eh, El = qtwo_sum(*accs[0])
        ring_dd[b] = (Bh, Bl, Ch, Cl, Eh, El)

        a64 = band_exact(X64, xT64(xfN64), n_diag, 1)
        d64 = band_exact(X64, xT64(xfD64), n_diag, 1)
        B64 = band_exact(a64, yT64(yfN64), n_diag, 0)
        C64 = band_exact(a64, yT64(yfD64), n_diag, 0)
        E64 = band_exact(d64, yT64(yfN64), n_diag, 0)
        ring_64[b] = (B64, C64, E64)
        for tag, ddp, ex in (("B", (Bh, Bl), B64), ("C", (Ch, Cl), C64),
                             ("E", (Eh, El), E64)):
            got = ddp[0].astype(np.float64) + ddp[1].astype(np.float64)
            scale = max(np.abs(ex).max(), 1e-30)
            maxerrP = max(maxerrP, np.abs(got - ex).max() / scale)
    print(f"P-stage max rel err over blocks: {maxerrP:9.2e}")

    # ---------------- F-stage: per cell --------------------------------------
    carry_dd = [np.zeros((Wyp, Wxp), f32) for _ in range(6)]
    carry_64 = [np.zeros((Wyp, Wxp)) for _ in range(6)]
    out_dd = np.zeros((cz * p + 1, Wyp, Wxp), np.float64)
    out_64 = np.zeros((cz * p + 1, Wyp, Wxp))
    stage_errs = {k: 0.0 for k in ("g", "t", "a", "w", "r", "v")}

    for w in range(cz):
        def rplane_dd(j, s):
            if s < p:
                return ring_dd[w][j][s * Wyp : (s + 1) * Wyp]
            return ring_dd[w + 1][j][0:Wyp]

        def rplane_64(j, s):
            if s < p:
                return ring_64[w][j][s * Wyp : (s + 1) * Wyp]
            return ring_64[w + 1][j][0:Wyp]

        ts, ts64 = [], []
        for iq in range(q):
            gz = gy = gx = None
            for s in range(m):
                Bh = rplane_dd(0, s); Bl = rplane_dd(1, s)
                Ch = rplane_dd(2, s); Cl = rplane_dd(3, s)
                Eh = rplane_dd(4, s); El = rplane_dd(5, s)
                bhh, bhl = split12(Bh)
                chh, chl = split12(Ch)
                ehh, ehl = split12(Eh)
                gz = dd_scalar_acc(gz, zD[iq][s], Bh, Bl, bhh, bhl)
                gy = dd_scalar_acc(gy, zN[iq][s], Ch, Cl, chh, chl)
                gx = dd_scalar_acc(gx, zN[iq][s], Eh, El, ehh, ehl)
            gzp = qtwo_sum(*gz); gyp = qtwo_sum(*gy); gxp = qtwo_sum(*gx)
            gz64 = sum(zD64[iq, s] * rplane_64(0, s) for s in range(m))
            gy64 = sum(zN64[iq, s] * rplane_64(1, s) for s in range(m))
            gx64 = sum(zN64[iq, s] * rplane_64(2, s) for s in range(m))
            for ddp, ex in ((gzp, gz64), (gyp, gy64), (gxp, gx64)):
                got = ddp[0].astype(np.float64) + ddp[1].astype(np.float64)
                scale = max(np.abs(ex).max(), 1e-30)
                stage_errs["g"] = max(stage_errs["g"],
                                      np.abs(got - ex).max() / scale)

            gzs = split12(gzp[0]); gys = split12(gyp[0]); gxs = split12(gxp[0])
            zq = (w + 2) * q + iq

            def cpick(i):
                return (c_pairs[i][0][zq], c_pairs[i][1][zq])

            def tstream(ia, ib, ic):
                acc = dd_coeff_acc(None, *cpick(ia), gxp[0], gxp[1], *gxs)
                acc = dd_coeff_acc(acc, *cpick(ib), gyp[0], gyp[1], *gys)
                acc = dd_coeff_acc(acc, *cpick(ic), gzp[0], gzp[1], *gzs)
                return qtwo_sum(*acc)

            # pairs order: [xx, yy, zz, xy, xz, yz]
            tx = tstream(0, 3, 4)
            ty = tstream(3, 1, 5)
            tz = tstream(4, 5, 2)
            ts.append((tx, ty, tz))
            tx64 = c64[0][zq] * gx64 + c64[3][zq] * gy64 + c64[4][zq] * gz64
            ty64 = c64[3][zq] * gx64 + c64[1][zq] * gy64 + c64[5][zq] * gz64
            tz64 = c64[4][zq] * gx64 + c64[5][zq] * gy64 + c64[2][zq] * gz64
            ts64.append((tx64, ty64, tz64))
            for ddp, ex in zip((tx, ty, tz), (tx64, ty64, tz64)):
                got = ddp[0].astype(np.float64) + ddp[1].astype(np.float64)
                scale = max(np.abs(ex).max(), 1e-30)
                stage_errs["t"] = max(stage_errs["t"],
                                      np.abs(got - ex).max() / scale)

        planes, planes64 = [], []
        for s in range(m):
            a1 = a2 = a3 = None
            for iq in range(q):
                tx, ty, tz = ts[iq]
                txs = split12(tx[0]); tys = split12(ty[0]); tzs = split12(tz[0])
                a1 = dd_scalar_acc(a1, zD[iq][s], tz[0], tz[1], *tzs)
                a2 = dd_scalar_acc(a2, zN[iq][s], ty[0], ty[1], *tys)
                a3 = dd_scalar_acc(a3, zN[iq][s], tx[0], tx[1], *txs)
            planes.append((qtwo_sum(*a1), qtwo_sum(*a2), qtwo_sum(*a3)))
            a164 = sum(zD64[iq, s] * ts64[iq][2] for iq in range(q))
            a264 = sum(zN64[iq, s] * ts64[iq][1] for iq in range(q))
            a364 = sum(zN64[iq, s] * ts64[iq][0] for iq in range(q))
            planes64.append((a164, a264, a364))
            for ddp, ex in zip(planes[-1], planes64[-1]):
                got = ddp[0].astype(np.float64) + ddp[1].astype(np.float64)
                scale = max(np.abs(ex).max(), 1e-30)
                stage_errs["a"] = max(stage_errs["a"],
                                      np.abs(got - ex).max() / scale)

        # stacked w's + carry add on plane s=0
        def stackpair(idx):
            hs = np.concatenate([planes[s][idx][0] for s in range(p)], axis=0)
            ls = np.concatenate([planes[s][idx][1] for s in range(p)], axis=0)
            return hs, ls

        w1h, w1l = stackpair(0)
        w2h, w2l = stackpair(1)
        w3h, w3l = stackpair(2)
        zpadrows = np.zeros(((p - 1) * Wyp, Wxp), f32)
        for (whn, wln, cidx) in (((w1h), (w1l), 0), ((w2h), (w2l), 2),
                                 ((w3h), (w3l), 4)):
            pass
        c1h = np.concatenate([carry_dd[0], zpadrows], axis=0)
        c1l = np.concatenate([carry_dd[1], zpadrows], axis=0)
        c2h = np.concatenate([carry_dd[2], zpadrows], axis=0)
        c2l = np.concatenate([carry_dd[3], zpadrows], axis=0)
        c3h = np.concatenate([carry_dd[4], zpadrows], axis=0)
        c3l = np.concatenate([carry_dd[5], zpadrows], axis=0)
        s1, e1 = two_sum(w1h, c1h)
        w1h, w1l = qtwo_sum(s1, w1l + (e1 + c1l))
        s2, e2 = two_sum(w2h, c2h)
        w2h, w2l = qtwo_sum(s2, w2l + (e2 + c2l))
        s3, e3 = two_sum(w3h, c3h)
        w3h, w3l = qtwo_sum(s3, w3l + (e3 + c3l))

        w164 = np.concatenate([planes64[s][0] for s in range(p)], axis=0)
        w264 = np.concatenate([planes64[s][1] for s in range(p)], axis=0)
        w364 = np.concatenate([planes64[s][2] for s in range(p)], axis=0)
        zpad64 = np.zeros(((p - 1) * Wyp, Wxp))
        w164 = w164 + np.concatenate([carry_64[0], zpad64], axis=0)
        w264 = w264 + np.concatenate([carry_64[1], zpad64], axis=0)
        w364 = w364 + np.concatenate([carry_64[2], zpad64], axis=0)

        for ddp, ex in (((w1h, w1l), w164), ((w2h, w2l), w264),
                        ((w3h, w3l), w364)):
            got = ddp[0].astype(np.float64) + ddp[1].astype(np.float64)
            scale = max(np.abs(ex).max(), 1e-30)
            stage_errs["w"] = max(stage_errs["w"],
                                  np.abs(got - ex).max() / scale)

        carry_dd = [planes[p][0][0], planes[p][0][1],
                    planes[p][1][0], planes[p][1][1],
                    planes[p][2][0], planes[p][2][1]]
        carry_64 = [planes64[p][0], planes64[p][1], planes64[p][2]]

        accs = dd_band_accum([None], w1h, w1l, [ytabs(ybN)], n_diag, 0)
        accs = dd_band_accum(accs, w2h, w2l, [ytabs(ybD)], n_diag, 0)
        r12h, r12l = qtwo_sum(*accs[0])
        accs = dd_band_accum([None], w3h, w3l, [ytabs(ybN)], n_diag, 0)
        r3h, r3l = qtwo_sum(*accs[0])
        r1264 = (band_exact(w164, yT64(ybN64), n_diag, 0)
                 + band_exact(w264, yT64(ybD64), n_diag, 0))
        r364 = band_exact(w364, yT64(ybN64), n_diag, 0)
        for ddp, ex in (((r12h, r12l), r1264), ((r3h, r3l), r364)):
            got = ddp[0].astype(np.float64) + ddp[1].astype(np.float64)
            scale = max(np.abs(ex).max(), 1e-30)
            stage_errs["r"] = max(stage_errs["r"],
                                  np.abs(got - ex).max() / scale)

        accs = dd_band_accum([None], r12h, r12l, [xtabs(xbN)], n_diag, 1)
        accs = dd_band_accum(accs, r3h, r3l, [xtabs(xbD)], n_diag, 1)
        vh, vl = qtwo_sum(*accs[0])
        v64 = (band_exact(r1264, xT64(xbN64), n_diag, 1)
               + band_exact(r364, xT64(xbD64), n_diag, 1))
        got = vh.astype(np.float64) + vl.astype(np.float64)
        scale = max(np.abs(v64).max(), 1e-30)
        stage_errs["v"] = max(stage_errs["v"], np.abs(got - v64).max() / scale)

        for t in range(p):
            out_dd[w * p + t] = (vh[t * Wyp : (t + 1) * Wyp].astype(np.float64)
                                 + vl[t * Wyp : (t + 1) * Wyp])
            out_64[w * p + t] = v64[t * Wyp : (t + 1) * Wyp]

    # cleanup plane
    accs = dd_band_accum([None], carry_dd[0], carry_dd[1],
                         [tuple((lambda k, r=r: r[0:Wyp, k : k + 1])
                                for r in ybN)], n_diag, 0)
    accs = dd_band_accum(accs, carry_dd[2], carry_dd[3],
                         [tuple((lambda k, r=r: r[0:Wyp, k : k + 1])
                                for r in ybD)], n_diag, 0)
    r12h, r12l = qtwo_sum(*accs[0])
    accs = dd_band_accum([None], carry_dd[4], carry_dd[5],
                         [tuple((lambda k, r=r: r[0:Wyp, k : k + 1])
                                for r in ybN)], n_diag, 0)
    r3h, r3l = qtwo_sum(*accs[0])
    accs = dd_band_accum([None], r12h, r12l, [xtabs(xbN)], n_diag, 1)
    accs = dd_band_accum(accs, r3h, r3l, [xtabs(xbD)], n_diag, 1)
    vh, vl = qtwo_sum(*accs[0])
    out_dd[cz * p] = vh.astype(np.float64) + vl
    yb64 = [T[:Wyp] for T in yT64(ybN64)]
    yd64 = [T[:Wyp] for T in yT64(ybD64)]
    r1264 = (band_exact(carry_64[0], yb64, n_diag, 0)
             + band_exact(carry_64[1], yd64, n_diag, 0))
    r364 = band_exact(carry_64[2], yb64, n_diag, 0)
    out_64[cz * p] = (band_exact(r1264, xT64(xbN64), n_diag, 1)
                      + band_exact(r364, xT64(xbD64), n_diag, 1))

    print("\nstage errors (dd vs f64, max rel):")
    for k, v in stage_errs.items():
        print(f"  {k}: {v:9.2e}")

    # faithfulness: replica vs the real kernel
    vh_k, vl_k = kern.vmult_dd(jnp.asarray(uh, jnp.float32),
                               jnp.asarray(ul, jnp.float32))
    got_k = (np.asarray(vh_k, np.float64) + np.asarray(vl_k, np.float64))
    # replica output -> node grid
    iay, iby, dupy = (np.asarray(a) for a in kern._cy)
    iax, ibx, dupx = (np.asarray(a) for a in kern._cx)

    def compact64(a):
        a1 = np.take(a, iay, axis=1)
        a2 = np.where(dupy[None, :, None], np.take(a, iby, axis=1), 0.0)
        a = a1 + a2
        a1 = np.take(a, iax, axis=2)
        a2 = np.where(dupx[None, None, :], np.take(a, ibx, axis=2), 0.0)
        return a1 + a2

    rep = compact64(out_dd).reshape(-1)
    ex = compact64(out_64).reshape(-1)
    scale = np.abs(ex).max()
    print(f"\nreplica-dd vs f64 final:   {np.abs(rep - ex).max()/scale:9.2e}")
    print(f"kernel    vs f64 final:    {np.abs(got_k - ex).max()/scale:9.2e}")
    print(f"kernel    vs replica-dd:   {np.abs(got_k - rep).max()/scale:9.2e}")

    from dealii_asm_tpu.ops.tensorops import merged_laplace_apply
    ref = np.asarray(merged_laplace_apply(
        jnp.asarray(u).reshape(nz, ny, nx), op.Ev, op.Ed, op.Evt, op.Edt,
        op.coeff6, 3)).reshape(-1)
    print(f"f64-chain vs merged_apply: {np.abs(ex - ref).max()/scale:9.2e}")


if __name__ == "__main__":
    main()
