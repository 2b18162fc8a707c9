"""A/B: y_first P-stage (y-band before the x-dots) vs the after-x form,
identical methodology (REP=30 scan, forced scalar fetch, interleaved
rounds)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    from dealii_asm_tpu.mesh.grid import StructuredMesh
    from dealii_asm_tpu.fem.dofs import DofHandler
    from dealii_asm_tpu.ops.laplace import LaplaceOperator
    from dealii_asm_tpu.precond.asm import ASMPreconditioner
    from dealii_asm_tpu.ops.pallas.smoother_step import SmootherStepKernel

    p, c = 4, 64
    mesh = StructuredMesh(dim=3, n_cells=(c, c, c))
    dofs = DofHandler(mesh, p)
    op = LaplaceOperator(dofs, dtype=jnp.float32)
    asm = ASMPreconditioner(dofs, n_overlap=1, weighting_type="symm",
                            dtype=jnp.float32)
    n = dofs.n_dofs
    REP = 30
    variants = {"y_first": dict(y_first=True),
                "after_x": dict(y_first=False)}
    chains, best = {}, {}
    xg = jax.random.normal(jax.random.PRNGKey(0), (0,))  # placeholder
    for name, kw in variants.items():
        kern = SmootherStepKernel(op, asm, **kw)
        xg = jax.random.normal(jax.random.PRNGKey(0), kern.grid_shape,
                               jnp.float32)
        xp = kern.pad_grid(xg)
        bp = kern.pad_grid(xg * 0.5)

        @jax.jit
        def chain(xp, bp, kern=kern):
            def body(x, _):
                return kern.step_padded(x, bp, 0.9), None
            return jax.lax.scan(body, xp, None, length=REP)[0]

        _ = float(chain(xp, bp)[12, 0, 0])
        chains[name] = (chain, xp, bp)
        best[name] = float("inf")
    for _r in range(int(os.environ.get("ROUNDS", "4"))):
        for name, (chain, xp, bp) in chains.items():
            t0 = time.perf_counter()
            _ = float(chain(xp, bp)[12, 0, 0])
            best[name] = min(best[name], (time.perf_counter() - t0) / REP)
        print("round", _r,
              " ".join(f"{nm}={best[nm]*1e3:.3f}" for nm in chains),
              flush=True)
    for name in chains:
        print(f"{name:10s} {best[name]*1e3:8.3f} ms/step "
              f"{n/best[name]/1e9:7.3f} GDoF/s", flush=True)


if __name__ == "__main__":
    main()
