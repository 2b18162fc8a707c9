"""Round-5 structured TPU work queue — ONE process for the whole batch
(the tunnel's per-process startup is ~7 min this round, results_r5.md).

  1. bench.py kernel + E2E gates (the scored BENCH numbers, marginal-rate
     protocol) — run FIRST so a later crash cannot cost the gate
  2. chain-kernel per-degree crossover: cheby-k labels at k = 2, 3, 4 with
     the momentum chain off/on (VERDICT r4 task #7)
  3. DMA block-height sweep (probe_dma_blocks — two rounds dormant,
     VERDICT r4 task #5b)

    python -m experiments.run_structured_queue [tasks...]
    tasks: bench chain dma   (default: all)
"""

import io
import json
import os
import sys
import time
import traceback

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

OUT = "experiments/results_structured_queue.jsonl"


def record(rec):
    rec["t"] = time.strftime("%H:%M:%S")
    print(">>", json.dumps(rec), flush=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(rec) + "\n")


def fence(name, fn):
    print(f"==== {name} ====", flush=True)
    t0 = time.time()
    try:
        fn()
        record({"task": name, "ok": True,
                "seconds": round(time.time() - t0, 1)})
    except Exception as e:
        traceback.print_exc()
        record({"task": name, "ok": False,
                "seconds": round(time.time() - t0, 1),
                "error": f"{type(e).__name__}: {e}"[:500]})


def task_bench():
    import bench

    bench.main()


def task_chain():
    from dealii_asm_tpu.models.benchmark import run_benchmark

    labels = "cheby-2-0-symm-1-c cheby-3-0-symm-1-c cheby-4-0-symm-1-c"
    params = {"dim": 3, "n subdivision": 6, "fe degree": 4,
              "n repetitions": 10, "use cartesian mesh": True,
              "number type": "float32", "preconditioner types": labels}
    for chain_degrees in ("", "2,3,4"):
        os.environ["DEALII_ASM_TPU_CHAIN_DEGREES"] = chain_degrees
        buf = io.StringIO()
        run_benchmark(params, out=buf)
        txt = buf.getvalue()
        print(txt, flush=True)
        record({"task": "chain", "chain_degrees": chain_degrees or "off",
                "lines": [ln for ln in txt.splitlines()
                          if ln.startswith(">>")]})
    os.environ.pop("DEALII_ASM_TPU_CHAIN_DEGREES", None)


def task_dma():
    from experiments import probe_dma_blocks

    old = sys.argv
    sys.argv = ["probe_dma_blocks"]
    try:
        probe_dma_blocks.main()
    finally:
        sys.argv = old


def task_zmxu():
    """VERDICT r4 task #5a: F-stage z-chains as window-batched MXU dots
    (f_zmxu=True) vs the production kernel, chained-step protocol."""
    import time as _t

    import jax.numpy as jnp
    import numpy as np

    from dealii_asm_tpu.fem.dofs import DofHandler
    from dealii_asm_tpu.mesh.grid import StructuredMesh
    from dealii_asm_tpu.ops.laplace import LaplaceOperator
    from dealii_asm_tpu.ops.pallas.smoother_step import SmootherStepKernel
    from dealii_asm_tpu.precond.asm import ASMPreconditioner

    mesh = StructuredMesh(3, (64,) * 3)
    dofs = DofHandler(mesh, 4)
    op = LaplaceOperator(dofs, dtype=jnp.float32)
    asm = ASMPreconditioner(dofs, n_overlap=1, weighting_type="symm",
                            dtype=jnp.float32)
    n = dofs.n_dofs
    rng = np.random.default_rng(0)
    xg = jnp.asarray(rng.standard_normal(
        (64 * 4 + 1,) * 3).astype(np.float32))
    REP = 30
    rates = {}
    for name, kw in (("default", {}), ("f_zmxu", {"f_zmxu": True})):
        kern = SmootherStepKernel(op, asm, **kw)
        xp = kern.pad_grid(xg)
        bp = kern.pad_grid(xg * 0.5)

        @jax.jit
        def chain(xp, bp, _k=kern):
            def body(x, _):
                return _k.step_padded(x, bp, 0.9), None
            out, _ = jax.lax.scan(body, xp, None, length=REP)
            return out

        _ = float(chain(xp, bp)[12, 0, 0])
        dt = float("inf")
        for _r in range(3):
            t0 = _t.perf_counter()
            _ = float(chain(xp, bp)[12, 0, 0])
            dt = min(dt, (_t.perf_counter() - t0) / REP)
        rates[name] = {"ms_per_step": round(dt * 1e3, 3),
                       "gdofs_per_s": round(n / dt / 1e9, 3)}
        print(name, rates[name], flush=True)
    record({"task": "zmxu", **rates})


def task_protocol():
    from experiments import probe_protocol

    old = sys.argv
    sys.argv = ["probe_protocol"]
    try:
        probe_protocol.main()
    finally:
        sys.argv = old


def main():
    tasks = sys.argv[1:] or ["bench", "chain", "dma", "zmxu"]
    fns = {"bench": task_bench, "chain": task_chain, "dma": task_dma,
           "zmxu": task_zmxu, "protocol": task_protocol}
    for t in tasks:
        fence(t, fns[t])


if __name__ == "__main__":
    main()
