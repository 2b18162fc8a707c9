"""Matrix-free Laplace operator on unstructured meshes (gather/scatter path).

The unstructured counterpart of ``LaplaceOperator`` — the hyperball family and
any mesh whose cells rotate relative to each other.  Where the structured
operator turns into global axis matmuls, here the apply is the reference's own
shape (/root/reference/include/operator.h:269-1628): gather cell DoFs
(orientation already baked into the index table, see fem/general_dofs.py) →
sum-factorized gradients → merged symmetric coefficient per q-point
(operator.h:1162-1219) → transpose integration → scatter-add.  Constrained
(Dirichlet) rows act as identity (matrix_free_internal.h:247-255 convention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.general_dofs import GeneralDofHandler
from ..fem.lagrange import shape_1d
from ..mesh.grid import _tensor_gradient, _tensor_weights
from .laplace import gradients_sumfac, integrate_sumfac, _tensor_values


class GeneralLaplaceOperator:
    """Poisson operator on a GeneralDofHandler (merged-coefficient geometry)."""

    def __init__(self, dofs: GeneralDofHandler, n_q_1d: int | None = None,
                 mapping_degree: int | None = None, dtype=jnp.float64,
                 kernel: str = "sumfac", matmul_precision: str | None = None):
        self.dofs = dofs
        self.mesh = dofs.mesh
        self.degree = dofs.degree
        self.dim = self.mesh.dim
        self.n_q_1d = n_q_1d or (self.degree + 1)
        self.dtype = dtype
        self.kernel = kernel
        self.matmul_precision = matmul_precision
        if mapping_degree is None:
            # the reference caps the ball's mapping at 2
            # (element_centered_preconditioners_01.cc:398-401)
            mapping_degree = 1 if self.mesh.project is None else 2
        self.mapping_degree = mapping_degree

        s = shape_1d(self.degree, self.n_q_1d)
        self.N1 = jnp.asarray(s.N, dtype)
        self.D1 = jnp.asarray(s.D, dtype)
        self._shape = s

        wq = _tensor_weights([s.w] * self.dim)
        from .geometry import merged_det_coeff

        # one XLA-CPU program for J/det/inv/coeff (host BLAS is unvectorized
        # on this class of VM; see geometry.merged_det_coeff)
        Bj, spj = self.mesh.jacobian_factors(mapping_degree, s.q)
        detj, coeff = merged_det_coeff(Bj, spj, wq, self.dim)
        if (detj <= 0).any():
            raise ValueError("non-positive Jacobian determinant")
        self._jxw_np = wq[None, :] * detj
        self.coeff = jnp.asarray(coeff, dtype)
        self.jxw = jnp.asarray(self._jxw_np, dtype)

        self.n_dofs = dofs.n_dofs
        self.cell_dofs = jnp.asarray(dofs.cell_dofs)
        self.constrained = jnp.asarray(dofs.boundary_mask)
        self._B_np = _tensor_gradient(s.N, s.D, self.dim)  # (Q, L, dim)
        self._B_dev = None

        # coeff is O(cells): pass as jit argument, not a captured constant
        self._vmult = jax.jit(lambda u, coeff: self._vmult_impl(u, coeff))
        self._residual = jax.jit(
            lambda b, x, coeff: b - self._vmult_impl(x, coeff))

    @property
    def B(self):
        if self._B_dev is None:
            self._B_dev = jnp.asarray(self._B_np, self.dtype)
        return self._B_dev

    def apply_cells(self, u_cells, coeff=None):
        """Local cell integral (C, L) -> (C, L)."""
        if coeff is None:
            coeff = self.coeff
        if self.kernel == "fused-B":
            g = jnp.einsum("qld,cl->cqd", self.B, u_cells)
            t = jnp.einsum("cqde,cqe->cqd", coeff, g)
            return jnp.einsum("qld,cqd->cl", self.B, t)
        g = gradients_sumfac(u_cells, self.N1, self.D1, self.dim,
                             self.degree + 1)
        t = jnp.einsum("cqde,cqe->cqd", coeff, g)
        return integrate_sumfac(t, self.N1, self.D1, self.dim)

    def _vmult_impl(self, u, coeff=None):
        if self.matmul_precision is not None:
            with jax.default_matmul_precision(self.matmul_precision):
                return self._vmult_inner(u, coeff)
        return self._vmult_inner(u, coeff)

    def _vmult_inner(self, u, coeff=None):
        u0 = jnp.where(self.constrained, 0.0, u).astype(self.dtype)
        uc = u0[self.cell_dofs]
        v = self.apply_cells(uc, coeff)
        dst = jnp.zeros_like(u0).at[self.cell_dofs.reshape(-1)].add(
            v.reshape(-1))
        return jnp.where(self.constrained, u, dst)

    def vmult(self, u):
        return self._vmult(u, self.coeff)

    def vmult_traceable(self, u):
        return self._vmult_impl(u)

    def residual(self, b, x):
        return self._residual(b, x, self.coeff)

    def __call__(self, u):
        return self.vmult(u)

    def compute_inverse_diagonal(self):
        """Matrix-free diagonal (constrained rows = 1), inverted
        (operator.h:1512 analog)."""
        local = jnp.einsum("cqde,qld,qle->cl", self.coeff, self.B, self.B)
        diag = jnp.zeros(self.n_dofs, self.dtype).at[
            self.cell_dofs.reshape(-1)].add(local.reshape(-1))
        diag = jnp.where(self.constrained, 1.0, diag)
        return 1.0 / diag

    def assemble_rhs(self, f, dirichlet=None):
        """b_i = ∫ f φ_i with inhomogeneous Dirichlet lift
        (operator.h:297-395 analog)."""
        from ..mesh.grid import _tensor_lattice

        s = self._shape
        unit = _tensor_lattice(s.q, self.dim)
        qp = self.mesh._physical_points(unit, self.mapping_degree)  # (C, Q, dim)
        fq = np.asarray(f(qp.reshape(-1, self.dim))).reshape(self._jxw_np.shape)
        Nval = _tensor_values(s.N, self.dim)  # (Q, L)
        local = np.einsum("cq,ql->cl", self._jxw_np * fq, Nval)
        b = np.zeros(self.n_dofs)
        cd = np.asarray(self.dofs.cell_dofs)
        np.add.at(b, cd.reshape(-1), local.reshape(-1))
        mask = np.asarray(self.dofs.boundary_mask)
        if dirichlet is not None:
            g = np.zeros(self.n_dofs)
            g[mask] = np.asarray(dirichlet(self.dofs.points[mask]))
            if np.any(g != 0.0):
                gc = g[cd]
                v = np.asarray(self.apply_cells(jnp.asarray(gc, self.dtype)))
                lift = np.zeros(self.n_dofs)
                np.add.at(lift, cd.reshape(-1), v.reshape(-1))
                b = b - lift
            b[mask] = g[mask]
        else:
            b[mask] = 0.0
        return jnp.asarray(b, self.dtype)
