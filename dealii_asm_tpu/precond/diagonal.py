"""Diagonal (Jacobi) preconditioner — reference 'Diagonal' type
(/root/reference/include/precondition.templates.h:511-530 path)."""

from __future__ import annotations

import jax.numpy as jnp


class DiagonalPreconditioner:
    def __init__(self, op):
        self.inv_diag = op.compute_inverse_diagonal()

    def vmult(self, src):
        return self.inv_diag * src

    def __call__(self, src):
        return self.vmult(src)
