"""Benchmark: fused Q4 Laplace vmult + FDM overlap-1 smoother apply (GDoF/s).

Runs on whatever jax.devices() provides (the real TPU chip under the driver).
Problem: the reference's headline configuration (BASELINE.md) — 3D Q4,
64^3 cells = 16,974,593 DoFs — one fused smoother step
x' = x + P⁻¹(b − A x) (vmult + FDM patch transforms + weighted update),
executed by the fully-fused Pallas slab kernel (ops/pallas/smoother_step.py)
with the XLA composition as fallback.  Steps are chained inside ONE jitted
program (the production V-cycle shape) and timing forces a device fetch —
block_until_ready under-synchronizes through remote-execution tunnels, and
per-dispatch overhead (~5.6 ms measured) would otherwise dominate.

vs_baseline: the reference's 40-rank "gold" node does CG+FDM(symm, ov1, k=1)
on this problem in 0.237 s / 5 iterations (data.pdf Table 1); each iteration
is one vmult + one smoother apply, i.e. ~0.36 GDoF/s for the fused step.
"""

import json
import time

import numpy as np

BASELINE_GDOFS = 16_974_593 / (0.237 / 5) / 1e9  # ≈ 0.358 GDoF/s


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from dealii_asm_tpu.fem.dofs import DofHandler
    from dealii_asm_tpu.mesh.grid import StructuredMesh
    from dealii_asm_tpu.ops.laplace import LaplaceOperator
    from dealii_asm_tpu.precond.asm import ASMPreconditioner

    dtype = jnp.float32
    cells = 64
    degree = 4
    mesh = StructuredMesh(3, (cells,) * 3)
    dofs = DofHandler(mesh, degree)
    op = LaplaceOperator(dofs, dtype=dtype)
    asm = ASMPreconditioner(dofs, n_overlap=1, weighting_type="symm", dtype=dtype)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(dofs.n_dofs), dtype)
    b = jnp.asarray(rng.standard_normal(dofs.n_dofs), dtype)

    REP = 20

    try:
        from dealii_asm_tpu.ops.pallas.smoother_step import SmootherStepKernel

        kern = SmootherStepKernel(op, asm)
        nz, ny, nx = kern.grid_shape

        # chain in the kernel's padded layout (the production V-cycle shape):
        # pad once, slice once — per-step pad/slice costs 1.4 of 4.0 ms
        @jax.jit
        def many(x, b):
            xp = kern.pad_grid(x.reshape(nz, ny, nx))
            bp = kern.pad_grid(b.reshape(nz, ny, nx))
            for _ in range(REP):
                xp = kern.step_padded(xp, bp)
            return kern.unpad_grid(xp).reshape(-1)
    except Exception:  # pallas unavailable -> XLA composition
        @jax.jit
        def many(x, b):
            for _ in range(REP):
                x = x + asm.vmult_traceable(b - op.vmult_traceable(x))
            return x

    # warm-up / compile; forced fetch (block_until_ready may under-synchronize
    # through remote-execution tunnels)
    x = many(x, b)
    _ = float(x[0])

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = many(x, b)
        _ = float(y[0])
        best = min(best, (time.perf_counter() - t0) / REP)

    gdofs = dofs.n_dofs / best / 1e9
    # HBM roofline: the algorithmic minimum for one fused step is read x,
    # read b, write x' (3 vectors).  Two denominators: v5e spec 819 GB/s,
    # and the MEASURED streaming ceiling on this chip/tunnel (XLA a+b over
    # the same arrays: 235 GB/s; a pure-copy Pallas kernel on the same block
    # geometry reaches 182 GB/s — the spec rate is not attainable here).
    min_bytes = 3 * dofs.n_dofs * 4
    print(json.dumps({
        "metric": "Q4 vmult+FDM-ov1 fused smoother step",
        "value": round(gdofs, 3),
        "unit": "GDoF/s",
        "vs_baseline": round(gdofs / BASELINE_GDOFS, 2),
        "hbm_roofline_frac": round(min_bytes / 819e9 / best, 3),
        "measured_stream_frac": round(min_bytes / 235e9 / best, 3),
    }))


if __name__ == "__main__":
    main()
