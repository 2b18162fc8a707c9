"""Micro-benchmark: fused-kernel x-apply variants (banded-VPU vs dense-MXU).

The kernel's MXU occupancy is ~20% (P/F dots ≈ 0.9 ms of the 4.13 ms step)
while the VPU carries 36 lane-rolls + ~170 plane mads per grid step — this
measures moving the banded x-apply onto the MXU plus the A-stage static band
trim. Also re-checks iteration-count parity at 2.1M DoF.
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
    import jax.numpy as jnp

    from dealii_asm_tpu.fem.dofs import DofHandler
    from dealii_asm_tpu.mesh.grid import StructuredMesh
    from dealii_asm_tpu.ops.laplace import LaplaceOperator
    from dealii_asm_tpu.ops.pallas.smoother_step import SmootherStepKernel
    from dealii_asm_tpu.precond.asm import ASMPreconditioner

    cells, degree = 64, 4
    mesh = StructuredMesh(3, (cells,) * 3)
    dofs = DofHandler(mesh, degree)
    op = LaplaceOperator(dofs, dtype=jnp.float32)
    asm = ASMPreconditioner(dofs, n_overlap=1, weighting_type="symm",
                            dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(dofs.n_dofs), jnp.float32)
    b = jnp.asarray(rng.standard_normal(dofs.n_dofs), jnp.float32)

    REP = 20
    results = {}
    for xa in ("banded", "dense"):
        kern = SmootherStepKernel(op, asm, x_apply=xa)

        @jax.jit
        def many(x, b, kern=kern):
            for _ in range(REP):
                x = kern.step(x, b)
            return x

        t0 = time.perf_counter()
        y = many(x, b)
        ref = float(y[12345])
        print(f"[{xa}] compile+run {time.perf_counter() - t0:.1f}s "
              f"probe={ref:.6g}", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            y = many(x, b)
            _ = float(y[0])
            best = min(best, (time.perf_counter() - t0) / REP)
        gd = dofs.n_dofs / best / 1e9
        print(f"[{xa}] {best * 1e3:6.2f} ms/step  {gd:.2f} GDoF/s", flush=True)
        results[xa] = (best, y)

    d = float(jnp.max(jnp.abs(results["banded"][1] - results["dense"][1])))
    r = float(jnp.max(jnp.abs(results["banded"][1])))
    print(f"max |banded - dense| after {REP} steps: {d:.3e} (ref {r:.3e})",
          flush=True)


if __name__ == "__main__":
    main()
