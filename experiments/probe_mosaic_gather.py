"""Mosaic lowering probe: static lane/sublane gathers + tall stacked rolls
inside a Pallas TPU kernel (primitives for the fused merged-geometry kernel).

Run with JAX_PLATFORMS=cpu for interpret-mode semantics; on the chip it
compile-tests the actual lowering and times the ops."""

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

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

INTERP = jax.default_backend() == "cpu"


def main():
    p, m = 4, 5
    C = 48
    N, W = C * p + 1, C * m          # 193 nodes -> 240 window lanes
    Np, Wp = 256, 256
    ny = 240

    idx_exp = np.minimum(np.arange(Wp) // m * p + np.arange(Wp) % m, Np - 1)
    idx_exp[W:] = Np - 1

    def kern(x_ref, ix_ref, iy_ref, o_ref):
        x = x_ref[...]
        ix = jnp.broadcast_to(ix_ref[...][None, :], (x.shape[0], Wp))
        g = jnp.take_along_axis(x[:, :Wp] * 0 + x[:, :Wp], ix, axis=1) \
            if False else jnp.take_along_axis(
                jnp.pad(x, ((0, 0), (0, Wp - Np))) if Wp > Np else x,
                ix, axis=1)
        iy = jnp.broadcast_to(iy_ref[...][:, None], (ny, Wp))
        g2 = jnp.take_along_axis(g[:ny], iy, axis=0)     # sublane gather
        r = pltpu.roll(g2, 3, 1) + pltpu.roll(g2, 5, 0)  # rolls on (240,256)
        o_ref[...] = r

    x = jnp.asarray(np.random.default_rng(0).standard_normal((ny, Np)),
                    jnp.float32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((ny, Wp), jnp.float32),
        interpret=INTERP,
    )(x, jnp.asarray(idx_exp, jnp.int32), jnp.asarray(idx_exp[:ny], jnp.int32))
    # reference
    g = np.asarray(x)[:, idx_exp]
    g2 = g[idx_exp[:ny], :]
    ref = np.roll(g2, 3, 1) + np.roll(g2, 5, 0)
    np.testing.assert_allclose(np.asarray(out), ref, atol=0)
    print("gather+roll kernel: OK", flush=True)

    # tall stacked roll (4 planes stacked on sublanes)
    def kern2(x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], 7, 0) + pltpu.roll(x_ref[...], 100, 1)

    xs = jnp.asarray(np.random.default_rng(1).standard_normal((4 * ny, Wp)),
                     jnp.float32)
    out2 = pl.pallas_call(
        kern2, out_shape=jax.ShapeDtypeStruct((4 * ny, Wp), jnp.float32),
        interpret=INTERP)(xs)
    ref2 = np.roll(np.asarray(xs), 7, 0) + np.roll(np.asarray(xs), 100, 1)
    np.testing.assert_allclose(np.asarray(out2), ref2, atol=0)
    print("tall stacked roll: OK", flush=True)


if __name__ == "__main__":
    main()
