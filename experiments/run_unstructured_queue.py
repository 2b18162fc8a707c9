"""Round-5 unstructured TPU work queue — ONE process for the whole batch.

The axon tunnel's per-process startup degraded to ~7 min this round
(results_r5.md), so every TPU task that can share a process does:

  1. ball anatomy probe at L (default 3) — post-scatter-fix component split
  2. ball E2E (e2e_ball_q4.json) — the round-5 headline gate (target <= 5 s)
  3. Kershaw parity probe variants (VERDICT r4 task #3)
  4. fdmv (vertex-patch) end-to-end rows (VERDICT r4 task #6)

Each task is fenced with try/except and appends a JSON line to
experiments/results_unstructured_queue.jsonl so a crash mid-queue keeps
the earlier results.

    python -m experiments.run_unstructured_queue [tasks...]
    tasks: anatomy ball kershaw_parity fdmv   (default: all)
"""

import json
import sys
import time
import traceback

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

OUT = "experiments/results_unstructured_queue.jsonl"


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
        record({"task": name, "ok": True, "seconds": round(time.time() - t0, 1)})
    except Exception as e:
        traceback.print_exc()
        record({"task": name, "ok": False, "seconds": round(time.time() - t0, 1),
                "error": f"{type(e).__name__}: {e}"[:500]})


def task_anatomy():
    from experiments import probe_ball_anatomy

    old = sys.argv
    sys.argv = ["probe_ball_anatomy", "3"]
    try:
        probe_ball_anatomy.main()
    finally:
        sys.argv = old


def _run_e2e(path, label, ref_note):
    from dealii_asm_tpu.models.poisson import run_config

    params = json.load(open(path))
    t0 = time.time()
    res = run_config(params, log=lambda *a: None)
    record({"task": label, "it": res["it"], "solve_seconds": res["time"],
            "n_dofs": res["n_dofs"], "converged": res.get("converged"),
            "total_seconds": round(time.time() - t0, 1), "reference": ref_note})


def task_ball():
    _run_e2e("experiments/e2e_ball_q4.json", "ball_L5_e2e",
             "data.pdf Table 15: 6 it / 0.226 s (40-rank node)")


def task_kershaw_parity():
    from experiments import probe_kershaw_parity

    old = sys.argv
    sys.argv = ["probe_kershaw_parity", "3", "base", "evexact",
                "evscale:0.95", "evscale:1.05", "k:1", "k:3"]
    try:
        probe_kershaw_parity.main()
    finally:
        sys.argv = old


def task_fdmv():
    _run_e2e("experiments/e2e_kershaw_fdmv.json", "kershaw_fdmv_e2e",
             "data.pdf Table 13 cg-fdm symm v k=2: 49 it / 2.82 s")
    _run_e2e("experiments/e2e_ball_fdmv.json", "ball_fdmv_e2e",
             "data.pdf Table 15 vertex-patch rows (L=4 size)")


def main():
    tasks = sys.argv[1:] or ["anatomy", "ball", "kershaw_parity", "fdmv"]
    fns = {"anatomy": task_anatomy, "ball": task_ball,
           "kershaw_parity": task_kershaw_parity, "fdmv": task_fdmv}
    for t in tasks:
        fence(t, fns[t])


if __name__ == "__main__":
    main()
