"""On-chip stage split of the fused smoother-step kernel (post-trim).

Compiles the production Q4 17M-DoF kernel with stage subsets disabled and
times chained padded steps, isolating skeleton/DMA vs P/A/F stage cost."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


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
    kern = SmootherStepKernel(op, asm)
    n = dofs.n_dofs
    print("n_dofs", n)

    key = jax.random.PRNGKey(0)
    xg = jax.random.normal(key, kern.grid_shape, jnp.float32)
    xp = kern.pad_grid(xg)
    bp = kern.pad_grid(xg * 0.5)

    REP = 30
    sets = sys.argv[1:] or ["", "P", "A", "F", "PA", "PAF1", "PAF2",
                            "PAF3", "PAF4", "PAF"]
    for stages in sets:
        stages = stages.replace("_", "")
        @jax.jit
        def chain(xp, bp, s=stages):
            def body(x, _):
                return kern.step_padded(x, bp, 0.9, stages=s), None
            out, _ = jax.lax.scan(body, xp, None, length=REP)
            return out

        # force a device fetch: block_until_ready under-synchronizes through
        # the axon remote-execution tunnel (see bench.py)
        _ = float(chain(xp, bp)[12, 0, 0])
        dt = float("inf")
        for _r in range(3):
            t0 = time.perf_counter()
            _ = float(chain(xp, bp)[12, 0, 0])
            dt = min(dt, (time.perf_counter() - t0) / REP)
        gdofs = n / dt / 1e9
        print(f"stages={stages or '(skeleton)':9s} {dt*1e3:8.3f} ms/step "
              f"{gdofs:7.3f} GDoF/s  per-gridstep {dt/ (c+4) * 1e6:6.2f} us")


if __name__ == "__main__":
    main()
