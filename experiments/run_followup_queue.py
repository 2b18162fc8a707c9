"""Round-5 follow-up TPU queue (one process): ball E2E with the all-dd
outer CG + the r=7 --f32 large-scaling rungs.

    python -m experiments.run_followup_queue [tasks...]
    tasks: ball r7   (default: both)
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


def _cleanup():
    """Drop device buffers between tasks — jit caches hold hoisted-const
    references and the 4th 7.2M-DoF setup in one process OOMs the chip."""
    import gc

    from dealii_asm_tpu.solvers import krylov as _krylov

    _krylov._CG_DD_CACHE.clear()
    jax.clear_caches()
    gc.collect()


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
    _cleanup()


def task_ball():
    from dealii_asm_tpu.models.poisson import run_config

    params = json.load(open("experiments/e2e_ball_q4.json"))
    t0 = time.time()
    res = run_config(params, log=lambda *a: None)
    record({"task": "ball_L5_e2e_alldd", "it": res["it"],
            "solve_seconds": res["time"], "n_dofs": res["n_dofs"],
            "converged": res.get("converged"),
            "total_seconds": round(time.time() - t0, 1),
            "reference": "data.pdf Table 15: 6 it / 0.226 s (40-rank node)"})


def task_r7():
    from experiments import run_large_scaling

    old = sys.argv
    sys.argv = ["run_large_scaling", "--f32", "fdm1:7", "diag:7"]
    try:
        run_large_scaling.main()
    finally:
        sys.argv = old


def task_fdmv():
    from dealii_asm_tpu.models.poisson import run_config

    for path, label, ref in (
            ("experiments/e2e_kershaw_fdmv.json", "kershaw_fdmv_e2e",
             "data.pdf Table 13 cg-fdm symm v k=2: 49 it / 2.82 s"),
            ("experiments/e2e_ball_fdmv.json", "ball_fdmv_e2e",
             "data.pdf Table 15 vertex-patch rows (L=4 size)")):
        params = json.load(open(path))
        t0 = time.time()
        res = run_config(params, log=lambda *a: None)
        record({"task": label, "it": res["it"],
                "solve_seconds": res["time"], "n_dofs": res["n_dofs"],
                "converged": res.get("converged"),
                "total_seconds": round(time.time() - t0, 1),
                "reference": ref})
        _cleanup()


def task_fdmv_small():
    """Crash isolation: same vertex-patch code paths at n_ref=2 (~1M)."""
    from dealii_asm_tpu.models.poisson import run_config

    params = json.load(open("experiments/e2e_kershaw_fdmv.json"))
    params["n refinements"] = 2
    params["solver"]["best of"] = 1
    t0 = time.time()
    res = run_config(params, log=lambda *a: None)
    record({"task": "kershaw_fdmv_small", "it": res["it"],
            "solve_seconds": res["time"], "n_dofs": res["n_dofs"],
            "total_seconds": round(time.time() - t0, 1)})


def _parity(variants):
    from experiments import probe_kershaw_parity

    old = sys.argv
    sys.argv = ["probe_kershaw_parity", "3"] + variants
    try:
        probe_kershaw_parity.main()
    finally:
        sys.argv = old


def task_parity_a():
    _parity(["evexact", "evscale:0.95", "evscale:1.05"])


def task_parity_b():
    _parity(["k:1", "k:3"])


def main():
    tasks = sys.argv[1:] or ["ball", "r7"]
    fns = {"ball": task_ball, "r7": task_r7, "fdmv": task_fdmv,
           "fdmv_small": task_fdmv_small,
           "parity_a": task_parity_a, "parity_b": task_parity_b}
    for t in tasks:
        fence(t, fns[t])


if __name__ == "__main__":
    main()
