"""Precision adapters — the reference's PreconditionerAdapter
(/root/reference/include/preconditioners.h:815-949): a preconditioner built in
one dtype applied to vectors of another (double outer Krylov, float/bf16 MG
levels — P8 in SURVEY.md §2d)."""

from __future__ import annotations

import jax.numpy as jnp


class PrecisionAdapter:
    """Casts in/out around an inner preconditioner's vmult/step."""

    def __init__(self, inner, inner_dtype=jnp.float32):
        self.inner = inner
        self.inner_dtype = inner_dtype
        self.is_symmetric = getattr(inner, "is_symmetric", False)

    def vmult(self, x):
        out_dtype = x.dtype
        return self.inner.vmult(x.astype(self.inner_dtype)).astype(out_dtype)

    def step(self, x, b):
        out_dtype = b.dtype
        return self.inner.step(
            x.astype(self.inner_dtype), b.astype(self.inner_dtype)
        ).astype(out_dtype)

    def __call__(self, x):
        return self.vmult(x)
