"""Geometry coefficient tables for the Laplace cell integral.

The reference's four geometry representations live at
/root/reference/include/operator.h:867-1333 (generic MappingInfo, trilinear
vertex-coefficient, quadratic 3^dim-coefficient, merged symmetric coefficient per
q-point, construct-q).  Here we provide:

- ``cartesian``: axis-aligned affine cells — one (dim,) width vector per cell;
  the merged coefficient is diagonal and separable, the cheapest path.
- ``merged``: precomputed symmetric w_q·|J|·J⁻¹J⁻ᵀ per (cell, q-point) — the
  general path for deformed meshes (operator.h:1162-1219 analog).

Compressed variants (trilinear / quadratic / construct-q) are layered on later;
they change memory traffic, not semantics.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..fem.lagrange import shape_1d
from ..mesh.grid import StructuredMesh, _tensor_weights


@dataclass(frozen=True)
class GeometryData:
    """Host-side geometry tables (float64 NumPy).

    ``jxw`` and ``q_points`` are LAZY (computed on first access): they are
    (C, Q)/(C, Q, dim) arrays needed only for rhs/mass integrals, and
    materializing them eagerly dominated operator setup at scale (¾ GB of
    first-touch page faults at 64³ Q4 — see dealii_asm_tpu/__init__.py)."""

    kind: str                      # "cartesian" | "merged"
    dim: int
    n_q_1d: int
    quad_weights: np.ndarray       # (Q,) tensor-product weights, x fastest
    cell_widths: np.ndarray | None # (C, dim) for cartesian
    coeff: np.ndarray | None       # (C, Q, dim, dim) merged sym coefficient (incl. w_q)
    _jxw_fn: object = None         # () -> (C, Q) w_q |det J|
    _q_points_fn: object = None    # () -> (C, Q, dim) physical q-points

    @property
    def jxw(self) -> np.ndarray:
        cache = object.__getattribute__(self, "__dict__")
        if "_jxw" not in cache:
            cache["_jxw"] = self._jxw_fn()
        return cache["_jxw"]

    @property
    def q_points(self) -> np.ndarray:
        cache = object.__getattribute__(self, "__dict__")
        if "_q_points" not in cache:
            cache["_q_points"] = self._q_points_fn()
        return cache["_q_points"]


def compute_geometry(
    mesh: StructuredMesh,
    n_q_1d: int,
    mapping_degree: int = 1,
    force_merged: bool = False,
) -> GeometryData:
    s = shape_1d(max(mapping_degree, 1), n_q_1d)
    wq = _tensor_weights([s.w] * mesh.dim)  # (Q,)

    from ..mesh.grid import _tensor_lattice

    q_lattice = _tensor_lattice(s.q, mesh.dim)  # (Q, dim)
    q_points_fn = lambda: mesh.physical_points(q_lattice)  # (C, Q, dim)

    if mesh.transform is None and not force_merged:
        h = np.broadcast_to(mesh.h, (mesh.n_cells_total, mesh.dim)).copy()
        detj = np.prod(h, axis=1)  # (C,)
        return GeometryData(
            kind="cartesian",
            dim=mesh.dim,
            n_q_1d=n_q_1d,
            quad_weights=wq,
            cell_widths=h,
            coeff=None,
            _jxw_fn=lambda: wq[None, :] * detj[:, None],
            _q_points_fn=q_points_fn,
        )

    J = mesh.jacobians(mapping_degree, s.q)  # (C, Q, dim, dim)
    detj = np.linalg.det(J)
    if (detj <= 0).any():
        raise ValueError("mesh transform produced non-positive Jacobian determinants")
    Jinv = np.linalg.inv(J)  # (C, Q, dim, dim), Jinv[c,q,d,e] = dξ_d/dx_e
    # merged coefficient: w_q |J| J⁻¹ J⁻ᵀ (symmetric dim×dim)
    coeff = np.einsum("cqde,cqfe->cqdf", Jinv, Jinv)
    coeff *= (wq[None, :] * detj)[:, :, None, None]
    jxw = wq[None, :] * detj
    return GeometryData(
        kind="merged",
        dim=mesh.dim,
        n_q_1d=n_q_1d,
        quad_weights=wq,
        cell_widths=None,
        coeff=coeff,
        _jxw_fn=lambda: jxw,
        _q_points_fn=q_points_fn,
    )
