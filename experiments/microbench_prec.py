"""Micro-benchmark: fused-kernel dot-precision split (A-path vs F-stage).

The A-path (operator on the smooth iterate) needs true-f32 dots for MG
parity; the F-stage (FDM transforms of the residual) is a preconditioner and
may tolerate cheaper MXU precision.  This measures, per (prec_a, prec_f):
  1. iteration parity on the 2.1M-DoF aniso Q4 h-MG solve (32^3 cells), and
  2. fused-step throughput at 64^3 (17M DoFs).
Informs SmootherStepKernel's production defaults.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from dealii_asm_tpu.fem.dofs import DofHandler
    from dealii_asm_tpu.mesh.grid import StructuredMesh
    from dealii_asm_tpu.ops.laplace import LaplaceOperator
    from dealii_asm_tpu.ops.pallas.smoother_step import SmootherStepKernel
    from dealii_asm_tpu.precond.asm import ASMPreconditioner

    cases = [("highest", "highest"), ("highest", "high"),
             ("highest", "default"), ("high", "default"),
             ("default", "default")]

    # ---- parity: 32^3 Q4 h-MG solve via the driver --------------------------
    import dealii_asm_tpu.precond.factory as factory
    from dealii_asm_tpu.models.poisson import run_config

    cfg = {
        "type": "matrixfree", "dim": 3, "degree": 4, "n refinements": 5,
        "solver": {"type": "CG", "rel tolerance": 1e-05},
        "mesh": {"name": "anisotropy", "stratch": 1},
        "preconditioner": {
            "type": "Multigrid", "mg type": "h",
            "mg number type": "float32",
            "mg smoother": {
                "type": "Chebyshev", "degree": 1,
                "polynomial type": "1st kind",
                "preconditioner": {"type": "FDM", "n overlap": 1,
                                   "weighting type": "symm"}},
            "mg coarse grid solver": {"type": "AMG"}},
    }

    orig = factory._try_attach_fused_step

    for prec_a, prec_f in cases:
        def attach(smoother, op, inner, log=lambda *_: None,
                   _pa=prec_a, _pf=prec_f):
            try:
                if not isinstance(inner, ASMPreconditioner):
                    return
                if np.dtype(op.dtype) != np.float32 or op.n_dofs < 100_000:
                    return
                kern = SmootherStepKernel(op, inner, precision_a=_pa,
                                          precision_f=_pf)
            except Exception:
                return
            smoother.fused_step = lambda x, b, om: kern.step(x, b, om)

        factory._try_attach_fused_step = attach
        t0 = time.perf_counter()
        out = run_config(dict(cfg))
        print(f"parity prec_a={prec_a} prec_f={prec_f}: "
              f"it={out['it']} ({time.perf_counter() - t0:.0f}s)",
              flush=True)
    factory._try_attach_fused_step = orig

    # ---- speed: 64^3 fused step ---------------------------------------------
    mesh = StructuredMesh(3, (64,) * 3)
    dofs = DofHandler(mesh, 4)
    op = LaplaceOperator(dofs, dtype=jnp.float32)
    asm = ASMPreconditioner(dofs, n_overlap=1, weighting_type="symm",
                            dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(dofs.n_dofs), jnp.float32)
    b = jnp.asarray(rng.standard_normal(dofs.n_dofs), jnp.float32)
    REP = 20
    for prec_a, prec_f in cases:
        kern = SmootherStepKernel(op, asm, precision_a=prec_a,
                                  precision_f=prec_f)

        @jax.jit
        def many(x, b, kern=kern):
            for _ in range(REP):
                x = kern.step(x, b)
            return x

        t0 = time.perf_counter()
        y = many(x0, b)
        _ = float(y[0])
        print(f"speed prec_a={prec_a} prec_f={prec_f}: compile+run "
              f"{time.perf_counter() - t0:.0f}s", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            y = many(x0, b)
            _ = float(y[0])
            best = min(best, (time.perf_counter() - t0) / REP)
        print(f"speed prec_a={prec_a} prec_f={prec_f}: {best * 1e3:.3f} "
              f"ms/step = {dofs.n_dofs / best / 1e9:.2f} GDoF/s", flush=True)


if __name__ == "__main__":
    main()
