"""Pure-stream Pallas probe: read 2 blocks + write 1 per grid step (the
smoother step's exact traffic), with the block z-height swept.  Isolates the
per-grid-step overhead from the true streaming rate: if GB/s rises with block
height, the fused kernel should process multiple z-windows per step."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _copy_kernel(x_ref, b_ref, o_ref):
    o_ref[...] = x_ref[...] + b_ref[...]


def make(nz_blocks, bz, ny, nx):
    blk = (bz, ny, nx)

    @jax.jit
    def run(x, b):
        return pl.pallas_call(
            _copy_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
            grid=(nz_blocks,),
            in_specs=[pl.BlockSpec(blk, lambda i: (i, 0, 0)),
                      pl.BlockSpec(blk, lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec(blk, lambda i: (i, 0, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, b)

    return run


def main():
    ny = nx = 256
    total_z = 272  # 68 blocks of 4 (the Q4 64^3 trimmed+padded grid height)
    REP = 30
    for bz in (4, 8, 16, 32):
        nzb = total_z // bz
        nz = nzb * bz
        x = jnp.ones((nz, ny, nx), jnp.float32)
        b = jnp.ones((nz, ny, nx), jnp.float32)
        run = make(nzb, bz, ny, nx)

        @jax.jit
        def chain(x, b, run=run):
            def body(c, _):
                return run(c, b), None
            out, _ = jax.lax.scan(body, x, None, length=REP)
            return out

        out = chain(x, b)
        _ = float(out[0, 0, 0])
        dt = float('inf')
        for _r in range(3):
            t0 = time.perf_counter()
            _ = float(chain(x, b)[0, 0, 0])
            dt = min(dt, (time.perf_counter() - t0) / REP)
        gb = 3 * nz * ny * nx * 4 / 1e9
        print(f"bz={bz:3d} blocks={nzb:3d} {dt*1e3:7.3f} ms "
              f"{gb/dt:7.1f} GB/s  per-block {dt/nzb*1e6:6.2f} us")


if __name__ == "__main__":
    main()
