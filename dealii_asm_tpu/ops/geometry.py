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
    """Host-side geometry tables (float64 NumPy)."""

    kind: str                      # "cartesian" | "merged"
    dim: int
    n_q_1d: int
    quad_weights: np.ndarray       # (Q,) tensor-product weights, x fastest
    cell_widths: np.ndarray | None # (C, dim) for cartesian
    coeff: np.ndarray | None       # (C, Q, dim, dim) merged sym coefficient (incl. w_q)
    jxw: np.ndarray                # (C, Q) w_q |det J| (for rhs/mass integrals)
    q_points: np.ndarray           # (C, Q, dim) physical quadrature points


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
    q_points = mesh.physical_points(q_lattice)  # (C, Q, dim)

    if mesh.transform is None and not force_merged:
        h = np.broadcast_to(mesh.h, (mesh.n_cells_total, mesh.dim)).copy()
        detj = np.prod(h, axis=1)  # (C,)
        jxw = wq[None, :] * detj[:, None]
        return GeometryData(
            kind="cartesian",
            dim=mesh.dim,
            n_q_1d=n_q_1d,
            quad_weights=wq,
            cell_widths=h,
            coeff=None,
            jxw=jxw,
            q_points=q_points,
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
        jxw=jxw,
        q_points=q_points,
    )
