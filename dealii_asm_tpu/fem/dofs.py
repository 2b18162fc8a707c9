"""Continuous FE_Q DoF numbering on structured meshes.

Replaces deal.II's DoFHandler + AffineConstraints for the structured-mesh case
(the reference distributes DoFs at /root/reference/include/operator.h:410-427 and
resolves periodicity/Dirichlet constraints there).  On a logically-Cartesian mesh
the global numbering is the lexicographic node lattice; periodicity is handled by
index wrap-around (no constraint rows needed), Dirichlet by a boolean mask (the
operator acts as identity on constrained rows, matching deal.II matrix-free
convention, /root/reference/include/matrix_free_internal.h:247-255).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import numpy as np

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from ..mesh.grid import StructuredMesh


@dataclass(frozen=True)
class DofHandler:
    mesh: StructuredMesh
    degree: int

    @cached_property
    def nodes_per_dim(self) -> tuple[int, ...]:
        p = self.degree
        return tuple(
            p * n if per else p * n + 1
            for n, per in zip(self.mesh.n_cells, self.mesh.periodic)
        )

    @property
    def n_dofs(self) -> int:
        return int(np.prod(self.nodes_per_dim))

    @property
    def dofs_per_cell(self) -> int:
        return (self.degree + 1) ** self.mesh.dim

    @cached_property
    def cell_dofs(self) -> np.ndarray:
        """(C, (p+1)^dim) int32 global DoF indices per cell, local lex (x fastest)."""
        p = self.degree
        dim = self.mesh.dim
        N = self.nodes_per_dim
        mi = self.mesh.cell_multi_index()  # (C, dim)
        # per-dim node indices of the cell's lattice
        local_1d = [
            (mi[:, d, None] * p + np.arange(p + 1)[None, :]) % N[d]
            if self.mesh.periodic[d]
            else mi[:, d, None] * p + np.arange(p + 1)[None, :]
            for d in range(dim)
        ]  # each (C, p+1)
        strides = np.cumprod([1] + list(N[:-1]))
        # combine: flat local index l = i + j*(p+1) + k*(p+1)^2 (x fastest)
        C = mi.shape[0]
        out = np.zeros((C, self.dofs_per_cell), dtype=np.int64)
        n1 = p + 1
        for d in range(dim):
            reps_inner = n1**d
            reps_outer = n1 ** (dim - 1 - d)
            idx = np.tile(
                np.repeat(np.arange(n1), reps_inner), reps_outer
            )  # local coordinate along d for each flat local index
            out += local_1d[d][:, idx] * strides[d]
        return out.astype(np.int32)

    @cached_property
    def node_multi_index(self) -> np.ndarray:
        """(n_dofs, dim) integer lattice coordinates of each global DoF."""
        N = self.nodes_per_dim
        grids = np.meshgrid(*[np.arange(n) for n in reversed(N)], indexing="ij")
        return np.stack([g.ravel() for g in reversed(grids)], axis=1)

    @cached_property
    def points(self) -> np.ndarray:
        """(n_dofs, dim) physical node coordinates (GLL lattice, transformed)."""
        from .lagrange import gauss_lobatto_points

        # node box coordinate: for node index k along dim d, the owning segment is
        # k // p with offset GLL[k % p]; boundary node p*n maps exactly.
        p = self.degree
        gll = gauss_lobatto_points(p + 1)
        h = self.mesh.h
        mi = self.node_multi_index
        coords = np.empty(mi.shape, dtype=np.float64)
        for d in range(self.mesh.dim):
            k = mi[:, d]
            cell = np.minimum(k // p, self.mesh.n_cells[d] - 1)
            off = k - cell * p
            coords[:, d] = self.mesh.origin[d] + (cell + gll[off]) * h[d]
        if self.mesh.transform is not None:
            coords = np.asarray(self.mesh.transform(coords))
        return coords

    @cached_property
    def boundary_mask(self) -> np.ndarray:
        """(n_dofs,) bool: True where the node lies on a non-periodic domain boundary."""
        # grid-view writes instead of node_multi_index comparisons: the
        # multi-index is dim O(n)-int64 arrays (GBs of first-touch page
        # faults at scale); the boundary planes are O(n^(1-1/dim))
        mask = np.zeros(self.n_dofs, dtype=bool)
        view = mask.reshape(tuple(reversed(self.nodes_per_dim)))  # (…, Ny, Nx)
        for d in range(self.mesh.dim):
            if self.mesh.periodic[d]:
                continue
            a = self.mesh.dim - 1 - d  # grid axis of direction d
            sl0 = [slice(None)] * self.mesh.dim
            sl0[a] = 0
            view[tuple(sl0)] = True
            sl0[a] = self.nodes_per_dim[d] - 1
            view[tuple(sl0)] = True
        return mask
