"""1D Lagrange finite elements on [0, 1].

Provides Gauss and Gauss-Lobatto point sets, Lagrange basis evaluation, and the
1D reference mass/stiffness matrices that seed both the sum-factorized operator
and the FDM patch matrices.

This layer replaces deal.II's FE_Q / QGauss / ShapeInfo machinery used throughout
the reference (e.g. /root/reference/include/matrix_free.h:256-268 builds FE_Q<1> +
QGauss<1> for the FDM setup; the reference 1D mass/stiffness creator is
deal.II's ``create_reference_mass_and_stiffness_matrices`` used at
/root/reference/include/tensor_product_matrix_creator.h:16-27).

All host-side setup math is float64 NumPy; device arrays are cast later.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np


def gauss_points(n: int) -> tuple[np.ndarray, np.ndarray]:
    """n-point Gauss-Legendre quadrature on [0, 1]. Returns (points, weights)."""
    x, w = np.polynomial.legendre.leggauss(n)
    return 0.5 * (x + 1.0), 0.5 * w


def gauss_lobatto_points(n: int) -> np.ndarray:
    """n Gauss-Lobatto-Legendre points on [0, 1] (FE_Q support points)."""
    if n < 2:
        raise ValueError("need at least 2 GLL points")
    if n == 2:
        return np.array([0.0, 1.0])
    # Interior GLL nodes are roots of P'_{n-1} = roots of Jacobi(1,1) of degree n-2.
    from scipy.special import roots_jacobi

    xi, _ = roots_jacobi(n - 2, 1.0, 1.0)
    return np.concatenate([[0.0], 0.5 * (xi + 1.0), [1.0]])


def _barycentric_weights(nodes: np.ndarray) -> np.ndarray:
    diff = nodes[:, None] - nodes[None, :]
    np.fill_diagonal(diff, 1.0)
    return 1.0 / np.prod(diff, axis=1)


def lagrange_values(nodes: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Values of the Lagrange basis on ``nodes`` at points ``x``: shape (len(x), len(nodes))."""
    nodes = np.asarray(nodes, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    w = _barycentric_weights(nodes)
    out = np.empty((len(x), len(nodes)))
    for i, xi in enumerate(x):
        d = xi - nodes
        hit = np.isclose(d, 0.0, atol=1e-14)
        if hit.any():
            row = hit.astype(np.float64)
        else:
            t = w / d
            row = t / t.sum()
        out[i] = row
    return out

def lagrange_derivatives(nodes: np.ndarray, x: np.ndarray) -> np.ndarray:
    """First derivatives of the Lagrange basis at points ``x``: shape (len(x), len(nodes))."""
    nodes = np.asarray(nodes, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    n = len(nodes)
    # Differentiation matrix at the nodes themselves (standard barycentric formula),
    # then transfer: l_j'(x) = sum_k l_j'(nk) ??? -- not valid. Instead evaluate directly:
    # l_j(x) = prod_{m!=j} (x-n_m)/(n_j-n_m);  l_j'(x) = l_j(x) * sum_{m!=j} 1/(x-n_m)
    # with care at x == n_m. Use the stable product-rule form.
    out = np.zeros((len(x), n))
    for q, xq in enumerate(x):
        for j in range(n):
            denom = np.prod([nodes[j] - nodes[m] for m in range(n) if m != j])
            s = 0.0
            for k in range(n):
                if k == j:
                    continue
                p = 1.0
                for m in range(n):
                    if m != j and m != k:
                        p *= xq - nodes[m]
                s += p
            out[q, j] = s / denom
    return out


@dataclass(frozen=True)
class Shape1D:
    """1D shape data: basis values/derivatives at quadrature points on [0,1].

    Mirrors deal.II's ShapeInfo for one component
    (values N: (n_q, p+1), gradients D: (n_q, p+1), quadrature q/w).
    """

    degree: int
    n_q: int
    nodes: np.ndarray  # (p+1,) GLL support points
    q: np.ndarray      # (n_q,) quadrature points
    w: np.ndarray      # (n_q,) quadrature weights
    N: np.ndarray      # (n_q, p+1) values
    D: np.ndarray      # (n_q, p+1) derivatives


@functools.lru_cache(maxsize=None)
def shape_1d(degree: int, n_q: int | None = None) -> Shape1D:
    if n_q is None:
        n_q = degree + 1
    nodes = gauss_lobatto_points(degree + 1)
    q, w = gauss_points(n_q)
    N = lagrange_values(nodes, q)
    D = lagrange_derivatives(nodes, q)
    return Shape1D(degree, n_q, nodes, q, w, N, D)


@functools.lru_cache(maxsize=None)
def reference_mass_stiffness_1d(degree: int, n_q: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """1D reference mass and stiffness matrices on the unit interval.

    M[i,j] = ∫ N_i N_j dx,  K[i,j] = ∫ N_i' N_j' dx  on [0,1].
    For an element of width h: mass scales by h, stiffness by 1/h
    (cf. /root/reference/include/tensor_product_matrix_creator.h:46-47).
    """
    s = shape_1d(degree, n_q)
    M = np.einsum("q,qi,qj->ij", s.w, s.N, s.N)
    K = np.einsum("q,qi,qj->ij", s.w, s.D, s.D)
    return M, K
