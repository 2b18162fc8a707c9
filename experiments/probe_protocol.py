"""Timing-protocol disambiguation + chain-degree crossover (round 5).

The round-5 structured queue produced a bench marginal rate (unrolled
20-vs-40 chains) of ~1.08 ms/step — BELOW the 1.4 ms DMA-skeleton floor
measured in round 4 with scan chains — while a scan-30 chain measures the
same kernel at 2.21 ms/step.  Two candidate explanations:

  (a) fixed per-call overhead F through the (degraded) tunnel inflates
      single-call chain timings by F/N and the marginal rate is the truth;
  (b) consecutive UNROLLED pallas calls genuinely overlap (tail DMA of
      step k under head DMA of step k+1), which jax.lax.scan cannot do —
      both numbers are real and the production V-cycle (unrolled steps)
      realizes the unrolled rate.

This probe measures, with forced scalar-fetch sync, best-of-4:
  F        trivial jitted program call+fetch time
  loop-N   unrolled N-step chains, N in {10, 20, 40}   -> marginal rates
  scan-N   lax.scan chains, N in {30, 60}              -> marginal rates
  chainS-K K unrolled sweep_padded(S) momentum sweeps (S = 2, 3, 4)
           -> marginal per-SUB-step rates (the per-degree crossover,
           VERDICT r4 task #7, same protocol as everything else)

If loop-marginal << scan-marginal, (b) is confirmed: scan serializes at
the step boundary, unrolled chains pipeline.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from dealii_asm_tpu.fem.dofs import DofHandler
    from dealii_asm_tpu.mesh.grid import StructuredMesh
    from dealii_asm_tpu.ops.laplace import LaplaceOperator
    from dealii_asm_tpu.ops.pallas.smoother_step import SmootherStepKernel
    from dealii_asm_tpu.precond.asm import ASMPreconditioner

    p, c = 4, 64
    mesh = StructuredMesh(dim=3, n_cells=(c, c, c))
    dofs = DofHandler(mesh, p)
    op = LaplaceOperator(dofs, dtype=jnp.float32)
    asm = ASMPreconditioner(dofs, n_overlap=1, weighting_type="symm",
                            dtype=jnp.float32)
    kern = SmootherStepKernel(op, asm)
    n = dofs.n_dofs
    print("n_dofs", n, flush=True)
    out = {"n_dofs": n}

    def best_of(fn, fetch, reps=4):
        _ = fetch(fn())
        dt = float("inf")
        for _r in range(reps):
            t0 = time.perf_counter()
            _ = fetch(fn())
            dt = min(dt, time.perf_counter() - t0)
        return dt

    # F: trivial call+fetch overhead
    tiny = jnp.zeros((8,), jnp.float32)
    f_triv = jax.jit(lambda a: a + 1.0)
    F = best_of(lambda: f_triv(tiny), lambda o: float(o[0]))
    out["call_overhead_ms"] = round(F * 1e3, 3)
    print(f"F = {F*1e3:.3f} ms", flush=True)

    key = jax.random.PRNGKey(0)
    xg = jax.random.normal(key, kern.grid_shape, jnp.float32)
    xp0 = kern.pad_grid(xg)
    bp0 = kern.pad_grid(xg * 0.5)

    def loop_chain(N):
        @jax.jit
        def run(xp, bp):
            for _ in range(N):
                xp = kern.step_padded(xp, bp, 0.9)
            return xp
        return run

    def scan_chain(N):
        @jax.jit
        def run(xp, bp):
            def body(x, _):
                return kern.step_padded(x, bp, 0.9), None
            o, _ = jax.lax.scan(body, xp, None, length=N)
            return o
        return run

    fetch = lambda o: float(o[12, 0, 0])
    T = {}
    for name, mk, Ns in (("loop", loop_chain, (10, 20, 40)),
                         ("scan", scan_chain, (30, 60))):
        for N in Ns:
            run = mk(N)
            t = best_of(lambda: run(xp0, bp0), fetch)
            T[f"{name}{N}"] = t
            print(f"{name}{N}: {t*1e3:9.2f} ms  ({t/N*1e3:6.3f} ms/step, "
                  f"{n/(t/N)/1e9:6.3f} GDoF/s incl. F/N)", flush=True)
    out["loop_marginal_ms"] = round((T["loop40"] - T["loop20"]) / 20 * 1e3, 3)
    out["scan_marginal_ms"] = round((T["scan60"] - T["scan30"]) / 30 * 1e3, 3)
    print(f"marginal: loop {out['loop_marginal_ms']} ms/step, "
          f"scan {out['scan_marginal_ms']} ms/step", flush=True)

    # chain kernels: K unrolled sweeps of S sub-steps, marginal over K
    for S in (2, 3, 4):
        try:
            ck = kern.as_chain(S)
        except ValueError as e:
            out[f"chain{S}"] = f"unsupported: {e}"
            continue
        xpS = ck.pad_grid(xg)
        bpS = ck.pad_grid(xg * 0.5)
        coefs = tuple((0.0 if s == 0 else 0.3, 0.9) for s in range(S))

        def sweep_chain(K):
            @jax.jit
            def run(xp, bp, xg):
                for _ in range(K):
                    xp = ck.pad_grid(ck.unpad_grid(
                        ck.sweep_padded(xp, bp, coefs), full_src=xg))
                return xp
            return run

        # NOTE: chained sweeps need a re-pad between sweeps (the padded
        # layouts differ between x-in and out); marginal over K folds the
        # pad cost into the sweep — same as production (one sweep per
        # smoother apply, pad owned by the level wrapper)
        tK = {}
        for K in (6, 12):
            run = sweep_chain(K)
            t = best_of(lambda: run(xpS, bpS, xg), fetch)
            tK[K] = t
        marg = (tK[12] - tK[6]) / 6
        out[f"chain{S}_marginal_ms_per_substep"] = round(marg / S * 1e3, 3)
        print(f"chain{S}: marginal {marg*1e3:.3f} ms/sweep = "
              f"{marg/S*1e3:.3f} ms/sub-step", flush=True)

    print(">>", json.dumps(out), flush=True)
    with open("experiments/results_structured_queue.jsonl", "a") as fh:
        fh.write(json.dumps({"task": "protocol", **out}) + "\n")


if __name__ == "__main__":
    main()
