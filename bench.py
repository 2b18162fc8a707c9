"""Benchmark: fused Q4 Laplace vmult + FDM overlap-1 smoother apply (GDoF/s).

Runs on whatever jax.devices() provides (the real TPU chip under the driver).
Problem: the reference's headline configuration (BASELINE.md) — 3D Q4,
64^3 cells = 16,974,593 DoFs — one fused smoother step
(vmult + patch gather + batched FDM transforms + weighted scatter),
best-of-N timing, printed as ONE JSON line.

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

    @jax.jit
    def fused_step(x, b):
        r = b - op.vmult_traceable(x)
        return x + asm.vmult_traceable(r)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(dofs.n_dofs), dtype)
    b = jnp.asarray(rng.standard_normal(dofs.n_dofs), dtype)

    # warm-up / compile
    x = fused_step(x, b)
    _ = float(x[0])  # forced fetch: block_until_ready may under-synchronize
    # through remote-execution tunnels

    n_rep = 10
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = x
        for _ in range(n_rep):
            y = fused_step(y, b)
        _ = float(y[0])
        best = min(best, (time.perf_counter() - t0) / n_rep)

    gdofs = dofs.n_dofs / best / 1e9
    print(json.dumps({
        "metric": "Q4 vmult+FDM-ov1 fused smoother step",
        "value": round(gdofs, 3),
        "unit": "GDoF/s",
        "vs_baseline": round(gdofs / BASELINE_GDOFS, 2),
    }))


if __name__ == "__main__":
    main()
