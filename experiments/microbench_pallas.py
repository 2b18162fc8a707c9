"""Find the FDM slab kernel bottleneck: time stripped variants on-chip."""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_call(variant, nz, ny, nx, m, p, n_win, my, mx):
    def kern(lamz_ref, vzf_ref, vzb_ref, x_hbm, gy_ref, gyt_ref, gxT_ref,
             gxtT_ref, lamyx_ref, out_hbm, slab, outs, carry, sem_in, sem_out):
        w = pl.program_id(0)
        f32 = jnp.float32
        copy_in = pltpu.make_async_copy(x_hbm.at[pl.ds(w * p, m)], slab, sem_in)
        copy_in.start()
        copy_in.wait()

        if variant == "dma":
            outs[:] = slab[:]
        elif variant == "zonly":
            for k in range(m):
                T = vzf_ref[w, 0, k] * slab[0]
                for s in range(1, m):
                    T = T + vzf_ref[w, s, k] * slab[s]
                for s in range(m):
                    if k == 0:
                        outs[s] = vzb_ref[w, s, k] * T
                    else:
                        outs[s] += vzb_ref[w, s, k] * T
        elif variant == "xmm":
            S = slab[:].reshape(m * ny, nx)
            X = jnp.dot(S, gxT_ref[:], preferred_element_type=f32)
            O = jnp.dot(X, gxtT_ref[:], preferred_element_type=f32)
            outs[:] = O.reshape(m, ny, nx)
        elif variant == "ymm":
            for k in range(m):
                B = jnp.dot(gy_ref[:], slab[k], preferred_element_type=f32)
                Z = jnp.dot(gyt_ref[:], B, preferred_element_type=f32)
                outs[k] = Z
        elif variant == "full":
            for k in range(m):
                T = vzf_ref[w, 0, k] * slab[0]
                for s in range(1, m):
                    T = T + vzf_ref[w, s, k] * slab[s]
                B = jnp.dot(gy_ref[:], T, preferred_element_type=f32)
                Cq = jnp.dot(B, gxT_ref[:], preferred_element_type=f32)
                Cq = Cq / (lamyx_ref[:] + lamz_ref[w, k])
                Y = jnp.dot(gyt_ref[:], Cq, preferred_element_type=f32)
                Z = jnp.dot(Y, gxtT_ref[:], preferred_element_type=f32)
                for s in range(m):
                    if k == 0:
                        outs[s] = vzb_ref[w, s, k] * Z
                    else:
                        outs[s] += vzb_ref[w, s, k] * Z

        @pl.when(w > 0)
        def _():
            outs[0] += carry[:]
        carry[:] = outs[m - 1]
        copy_out = pltpu.make_async_copy(
            outs.at[pl.ds(0, m - 1)], out_hbm.at[pl.ds(w * p, m - 1)], sem_out)
        copy_out.start()
        copy_out.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_win,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((m, ny, nx), jnp.float32),
            pltpu.VMEM((m, ny, nx), jnp.float32),
            pltpu.VMEM((ny, nx), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    @jax.jit
    def call(x, lamz, vzf, vzb, gy, gyt, gxT, gxtT, lamyx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(lamz, vzf, vzb, x, gy, gyt, gxT, gxtT, lamyx)

    return call


def main():
    p, m, n_win = 4, 5, 64
    nz, ny, nx = 257, 264, 384
    my = mx = 384
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((nz, ny, nx)), jnp.float32)
    lamz = jnp.asarray(rng.random((n_win, m)) + 1, jnp.float32)
    vzf = jnp.asarray(rng.standard_normal((n_win, m, m)), jnp.float32)
    vzb = jnp.asarray(rng.standard_normal((n_win, m, m)), jnp.float32)
    gy = jnp.asarray(rng.standard_normal((my, ny)), jnp.float32)
    gyt = jnp.asarray(rng.standard_normal((ny, my)), jnp.float32)
    gxT = jnp.asarray(rng.standard_normal((nx, mx)), jnp.float32)
    gxtT = jnp.asarray(rng.standard_normal((mx, nx)), jnp.float32)
    lamyx = jnp.asarray(rng.random((my, mx)) + 1, jnp.float32)

    REP = 10
    for variant in ("dma", "zonly", "xmm", "ymm", "full"):
        call = make_call(variant, nz, ny, nx, m, p, n_win, my, mx)

        @jax.jit
        def many(y):
            for _ in range(REP):
                y = call(y, lamz, vzf, vzb, gy, gyt, gxT, gxtT, lamyx)
            return y

        y = many(x)
        _ = float(y[0, 0, 0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            y = many(y)
            _ = float(y[0, 0, 0])  # forced fetch (tunnel under-syncs)
            best = min(best, (time.perf_counter() - t0 - 0.0056) / REP)
        print(f"{variant:6s}: {best * 1e3:8.3f} ms in-jit (dispatch removed)",
              flush=True)


if __name__ == "__main__":
    main()
