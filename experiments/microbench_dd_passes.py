"""Micro-benchmark: anatomy of the double-single (dd) outer vmult kernel.

The f64 outer matvec (25.4 ms at 17M DoF) is 4 Pallas passes
(ops/pallas/dd_vmult.py: x-dual, y-dual, y-single, z-triple).  This times
each pass alone, the full chain, and the f32 twin's passes for comparison,
to decide where MXU offload (exact bf16-chunk products) or pass fusion pays.
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
    jax.config.update("jax_enable_x64", True)  # dd tables need f64 factors
    import jax.numpy as jnp

    from dealii_asm_tpu.fem.dofs import DofHandler
    from dealii_asm_tpu.mesh.grid import StructuredMesh
    from dealii_asm_tpu.ops.laplace import LaplaceOperator
    from dealii_asm_tpu.ops.pallas.dd_vmult import DDVmultKernel, F32VmultKernel

    cells, degree = 64, 4
    mesh = StructuredMesh(3, (cells,) * 3)
    dofs = DofHandler(mesh, degree)
    op = LaplaceOperator(dofs, dtype=jnp.float64)
    op32 = LaplaceOperator(dofs, dtype=jnp.float32)
    dd = op._dd_pallas or DDVmultKernel(op)
    f32k = F32VmultKernel(op32)

    rng = np.random.default_rng(0)
    shape_p = dd.shape_p
    xh = jnp.asarray(rng.standard_normal(shape_p), jnp.float32)
    xl = jnp.asarray(1e-8 * rng.standard_normal(shape_p), jnp.float32)
    uh = jnp.asarray(rng.standard_normal(dofs.n_dofs), jnp.float32)
    ul = jnp.asarray(1e-8 * rng.standard_normal(dofs.n_dofs), jnp.float32)

    def timeit(fn, a0, b0, label, n_rep=10):
        """fn: (a, b) -> (a', b') with shapes preserved."""

        @jax.jit
        def many(a, b):
            for _ in range(n_rep):
                a, b = fn(a, b)
            return a, b

        t0 = time.perf_counter()
        y = many(a0, b0)
        _ = float(y[0].reshape(-1)[0])
        print(f"[{label}] compile+run {time.perf_counter() - t0:.1f}s",
              flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            y = many(a0, b0)
            _ = float(y[0].reshape(-1)[0])
            best = min(best, (time.perf_counter() - t0) / n_rep)
        print(f"[{label}] {best * 1e3:8.2f} ms", flush=True)
        return best

    timeit(lambda a, b: dd._call_x(a, b)[:2], xh, xl,
           "dd x-dual (2 banded dd applies)")
    timeit(lambda a, b: dd._call_y(a, b, True)[:2], xh, xl, "dd y-dual")
    timeit(lambda a, b: dd._call_y(a, b, False), xh, xl, "dd y-single")
    timeit(lambda a, b: dd._call_z((a, b), (a, b), (a, b)), xh, xl,
           "dd z-triple (3 banded dd applies)")
    timeit(lambda a, b: dd.vmult_dd(a, b), uh, ul, "dd full vmult chain")

    timeit(lambda a, b: (f32k._call_x(a)[0], b), xh, xl, "f32 x-dual")
    timeit(lambda a, b: (f32k._call_z(a, a, a), b), xh, xl, "f32 z-triple")


if __name__ == "__main__":
    main()
