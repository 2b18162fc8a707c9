"""Multigrid transfers on unstructured meshes (h- and p-coarsening).

Unstructured counterpart of ``TwoLevelTransfer`` (ops/transfer.py), rebuilding
deal.II's MGTwoLevelTransfer as used by the reference
(/root/reference/include/multigrid.h:336-346) for the hyperball hierarchy:
cell-wise tensor-product interpolation embedded as gather → ⊗T1 → valence-
weighted scatter; restriction is the exact transpose.

h-transfer requires ``fine.mesh.parent_cells`` (children of parent c are the
2^dim consecutive cells 2^dim·c + octant, by construction of
UnstructuredMesh.refine, and share the parent's local frame — no orientation
fixups needed on the transfer path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.general_dofs import GeneralDofHandler
from ..fem.lagrange import gauss_lobatto_points, lagrange_values


class GeneralTwoLevelTransfer:
    """Transfer between a coarse and a fine GeneralDofHandler."""

    def __init__(self, coarse: GeneralDofHandler, fine: GeneralDofHandler,
                 dtype=jnp.float64, matmul_precision: str | None = None):
        self.matmul_precision = matmul_precision
        self.coarse = coarse
        self.fine = fine
        self.dim = dim = coarse.mesh.dim
        pc, pf = coarse.degree, fine.degree
        same_mesh = fine.mesh is coarse.mesh or (
            fine.mesh.n_cells_total == coarse.mesh.n_cells_total
            and fine.mesh.parent_cells is None)

        if same_mesh:
            assert pf >= pc
            T1 = lagrange_values(gauss_lobatto_points(pc + 1),
                                 gauss_lobatto_points(pf + 1))  # (pf+1, pc+1)
            fine_lat = np.asarray(fine.cell_dofs, dtype=np.int64)
        else:
            assert pf == pc
            assert fine.mesh.parent_cells is not None
            p = pc
            nodes = gauss_lobatto_points(p + 1)
            xf = np.concatenate([nodes * 0.5, 0.5 + nodes[1:] * 0.5])
            T1 = lagrange_values(nodes, xf)  # (2p+1, p+1)
            fine_lat = self._h_fine_lattice(coarse, fine)

        self.T1 = jnp.asarray(T1, dtype)
        self.n_in_1d = T1.shape[1]
        self.fine_lat = jnp.asarray(fine_lat.astype(np.int32))
        self.coarse_cd = jnp.asarray(coarse.cell_dofs)

        # fine valence (touch counts) for the averaging scatter
        counts = np.zeros(fine.n_dofs)
        np.add.at(counts, fine_lat.reshape(-1), 1.0)
        counts[counts == 0] = 1.0
        self.fine_inv_valence = jnp.asarray(1.0 / counts, dtype)
        self.fine_constrained = jnp.asarray(fine.boundary_mask)
        self.coarse_constrained = jnp.asarray(coarse.boundary_mask)
        self.n_fine = fine.n_dofs
        self.n_coarse = coarse.n_dofs

        # inline=True: the O(cells) gather tables surface to the outer solver
        # jaxpr where jit_hoist_consts passes them by reference instead of
        # embedding compile-payload literals (ball L=5 HTTP 413 — see
        # ops/laplace_general.py)
        self._prolongate = jax.jit(self._prolongate_impl, inline=True)
        self._restrict = jax.jit(self._restrict_impl, inline=True)

    @staticmethod
    def _h_fine_lattice(coarse: GeneralDofHandler,
                        fine: GeneralDofHandler) -> np.ndarray:
        """(Cc, (2p+1)^dim) fine global DoFs of each coarse cell's fine lattice."""
        p = coarse.degree
        dim = coarse.mesh.dim
        n1 = p + 1
        mf = 2 * p + 1
        Cc = coarse.mesh.n_cells_total
        fcd = np.asarray(fine.cell_dofs, dtype=np.int64)  # (Cf, n1^dim)
        parent = fine.mesh.parent_cells
        octant = fine.mesh.child_index
        out = np.zeros((Cc, mf**dim), dtype=np.int64)
        # local lattice coords of child cell dofs within the parent's fine lattice
        lat = np.stack([np.arange(n1**dim) // n1**d % n1 for d in range(dim)],
                       axis=1)  # (L, dim)
        from ..mesh.unstructured import _VERTEX_COORDS

        vc = _VERTEX_COORDS[dim]
        for o in range(2**dim):  # vectorized over cells, loop over octants only
            sel = np.where(octant == o)[0]
            oc = vc[o]
            pos = lat + oc[None, :] * p  # (L, dim) in 0..2p
            flat = np.zeros(n1**dim, dtype=np.int64)
            mult = 1
            for d in range(dim):
                flat += pos[:, d] * mult
                mult *= mf
            out[parent[sel][:, None], flat[None, :]] = fcd[sel]
        return out

    def _interp(self, u):
        """(Cc, n_in^dim) -> (Cc, n_out^dim) tensor interpolation."""
        n_in = self.n_in_1d
        u = u.reshape((-1,) + (n_in,) * self.dim)
        for axis in range(self.dim):
            u = jnp.moveaxis(
                jnp.matmul(jnp.moveaxis(u, 1 + axis, -1), self.T1.T), -1,
                1 + axis)
        return u.reshape(u.shape[0], -1)

    def _interp_t(self, r):
        n_out = self.T1.shape[0]
        r = r.reshape((-1,) + (n_out,) * self.dim)
        for axis in range(self.dim):
            r = jnp.moveaxis(
                jnp.matmul(jnp.moveaxis(r, 1 + axis, -1), self.T1), -1,
                1 + axis)
        return r.reshape(r.shape[0], -1)

    def _prolongate_impl(self, u_coarse):
        if self.matmul_precision is not None:
            with jax.default_matmul_precision(self.matmul_precision):
                return self._prolongate_inner(u_coarse)
        return self._prolongate_inner(u_coarse)

    def _prolongate_inner(self, u_coarse):
        u = jnp.where(self.coarse_constrained, 0.0, u_coarse)
        uc = u[self.coarse_cd]
        vf = self._interp(uc)
        out = jnp.zeros(self.n_fine, u.dtype).at[
            self.fine_lat.reshape(-1)].add(vf.reshape(-1))
        out = out * self.fine_inv_valence
        return jnp.where(self.fine_constrained, 0.0, out)

    def _restrict_impl(self, r_fine):
        if self.matmul_precision is not None:
            with jax.default_matmul_precision(self.matmul_precision):
                return self._restrict_inner(r_fine)
        return self._restrict_inner(r_fine)

    def _restrict_inner(self, r_fine):
        r = jnp.where(self.fine_constrained, 0.0, r_fine)
        rw = (r * self.fine_inv_valence)[self.fine_lat]
        vc = self._interp_t(rw)
        out = jnp.zeros(self.n_coarse, r.dtype).at[
            self.coarse_cd.reshape(-1)].add(vc.reshape(-1))
        return jnp.where(self.coarse_constrained, 0.0, out)

    def prolongate(self, u_coarse):
        return self._prolongate(u_coarse)

    def restrict(self, r_fine):
        return self._restrict(r_fine)
