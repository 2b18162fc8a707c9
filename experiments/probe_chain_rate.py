"""Per-step rate of the fused chain kernel vs the single-step kernel.

S sub-steps share one HBM pass (read x, read b, write out), so if the
single step is DMA/VMEM-bandwidth limited the per-step rate should rise
toward the compute bound as S grows.  Also times the zero-guess momentum
sweep (sweep_padded zero_x=True) — the production Chebyshev vmult shape,
which drops the x stream entirely."""

import sys
import time

import os
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
    print("n_dofs", n, flush=True)

    key = jax.random.PRNGKey(0)
    xg = jax.random.normal(key, kern.grid_shape, jnp.float32)

    def timeit(fn, *args):
        out = fn(*args).block_until_ready()
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args).block_until_ready()
            dt = min(dt, time.perf_counter() - t0)
        return dt

    REP = 24
    Ss = [int(a) for a in sys.argv[1:]] or [1, 2, 3, 4]
    for S in Ss:
        ck = kern.as_chain(S) if S > 1 else kern
        xp = ck.pad_grid(xg)
        bp = ck.pad_grid(xg * 0.5)
        oms = [0.9] * S
        coefs = [(0.0 if s == 0 else 0.3, 0.9) for s in range(S)]

        if S == 1:
            @jax.jit
            def chain(xp, bp):
                def body(x, _):
                    return ck.step_padded(x, bp, 0.9), None
                return jax.lax.scan(body, xp, None, length=REP)[0]
        else:
            @jax.jit
            def chain(xp, bp, ck=ck, oms=oms):
                def body(x, _):
                    return ck.steps_padded(x, bp, oms), None
                return jax.lax.scan(body, xp, None, length=REP // S)[0]

        dt = timeit(chain, xp, bp) / REP * (1 if S == 1 else S * (REP // S) / REP)
        n_sub = REP if S == 1 else S * (REP // S)
        dt = timeit(chain, xp, bp) / n_sub
        print(f"richardson S={S}: {dt*1e3:8.3f} ms/sub-step "
              f"{n/dt/1e9:7.3f} GDoF/s", flush=True)

        @jax.jit
        def sweepz(bp, ck=ck, coefs=coefs):
            def body(x, _):
                return ck.sweep_padded(x, bp, coefs, zero_x=True), None
            return jax.lax.scan(body, bp, None, length=max(1, REP // S))[0]

        nz = S * max(1, REP // S)
        dt = timeit(sweepz, bp) / nz
        print(f"cheby-zero S={S}: {dt*1e3:8.3f} ms/sub-step "
              f"{n/dt/1e9:7.3f} GDoF/s", flush=True)


if __name__ == "__main__":
    main()
