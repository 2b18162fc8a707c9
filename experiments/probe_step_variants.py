"""Chip-timing sweep of SmootherStepKernel construction variants (Q4 64^3,
17M DoF, chained padded steps — bench.py's exact shape)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as _jnp

VARIANTS = {
    "default(stack+tbf16)": {"y_first": False},
    "nostack": {"p_stack": False},
    "nostack+f32tab": {"p_stack": False, "transform_dtype": _jnp.float32},
    "stack+xband": {"x_apply": "banded"},
    "chain2": {"n_chain": 2},
    "chain3": {"n_chain": 3},
    "chain4": {"n_chain": 4},
    "chain2+xband": {"n_chain": 2, "x_apply": "banded"},
    "fstack": {"f_stack": True},
    "chain2+fstack": {"n_chain": 2, "f_stack": True},
    "chain4+fstack": {"n_chain": 4, "f_stack": True},
    "zbf16": {"z_bf16": True},
    "zbf16+fstack": {"z_bf16": True, "f_stack": True},
    "yfirst": {"y_first": True},
    "noyfirst": {"y_first": False},
    "yfirst+fstack": {"y_first": True, "f_stack": True},
}


def main():
    from dealii_asm_tpu.mesh.grid import StructuredMesh
    from dealii_asm_tpu.fem.dofs import DofHandler
    from dealii_asm_tpu.ops.laplace import LaplaceOperator
    from dealii_asm_tpu.precond.asm import ASMPreconditioner
    from dealii_asm_tpu.ops.pallas.smoother_step import SmootherStepKernel

    names = sys.argv[1:] or list(VARIANTS)
    rounds = int(os.environ.get("ROUNDS", "4"))
    p, c = 4, 64
    mesh = StructuredMesh(dim=3, n_cells=(c, c, c))
    dofs = DofHandler(mesh, p)
    op = LaplaceOperator(dofs, dtype=jnp.float32)
    asm = ASMPreconditioner(dofs, n_overlap=1, weighting_type="symm",
                            dtype=jnp.float32)
    n = dofs.n_dofs
    REP = 24
    chains, best = {}, {}
    for name in names:
        kern = SmootherStepKernel(op, asm, **VARIANTS[name])
        key = jax.random.PRNGKey(0)
        xg = jax.random.normal(key, kern.grid_shape, jnp.float32)
        xp = kern.pad_grid(xg)
        bp = kern.pad_grid(xg * 0.5)
        S = kern.n_chain

        # args PASSED, not jit-captured: captured-constant operands measured
        # ~20% slow (round-4 note); forced scalar fetch per bench.py
        @jax.jit
        def chain(xp, bp, kern=kern, S=S):
            def body(x, _):
                if S == 1:
                    return kern.step_padded(x, bp, 0.9), None
                return kern.steps_padded(x, bp, (0.9,) * S), None
            out, _ = jax.lax.scan(body, xp, None, length=REP // S)
            return out

        _ = float(chain(xp, bp)[12, 0, 0])  # compile
        chains[name] = (chain, xp, bp)
        best[name] = float("inf")
    steps = {name: (REP // VARIANTS[name].get("n_chain", 1))
             * VARIANTS[name].get("n_chain", 1) for name in names}
    # interleaved rounds: chip-speed drift hits every variant equally
    for _r in range(rounds):
        for name in names:
            chain, xp, bp = chains[name]
            t0 = time.perf_counter()
            _ = float(chain(xp, bp)[12, 0, 0])
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / steps[name])
        line = "  ".join(f"{nm}={best[nm]*1e3:.3f}" for nm in names)
        print(f"round {_r}: {line}", flush=True)
    for name in names:
        print(f"{name:24s} {best[name]*1e3:8.3f} ms/step "
              f"{n/best[name]/1e9:7.3f} GDoF/s", flush=True)


if __name__ == "__main__":
    main()
