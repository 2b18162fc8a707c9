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


def main():
    tasks = sys.argv[1:] or ["bench", "chain", "dma"]
    fns = {"bench": task_bench, "chain": task_chain, "dma": task_dma}
    for t in tasks:
        fence(t, fns[t])


if __name__ == "__main__":
    main()
