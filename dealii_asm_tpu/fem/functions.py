"""Right-hand-side / manufactured-solution functions (vectorized NumPy).

Ports the math of /root/reference/include/functions.h (GaussianSolution,
GaussianRightHandSide) and the driver-local functions of
/root/reference/element_centered_preconditioners_01.cc:65-104 (constant rhs,
sinus-mp rhs).
"""

from __future__ import annotations

import numpy as np


def constant_rhs(p: np.ndarray) -> np.ndarray:
    return np.ones(p.shape[0])


def sinus_mp_rhs(p: np.ndarray) -> np.ndarray:
    dim = p.shape[1]
    v = dim * np.pi * np.ones(p.shape[0])
    for d in range(dim):
        v = v * np.sin(np.pi * p[:, d])
    return v


def gaussian_solution(centers: np.ndarray, width: float):
    centers = np.atleast_2d(np.asarray(centers, dtype=np.float64))

    def f(p: np.ndarray) -> np.ndarray:
        dim = p.shape[1]
        v = np.zeros(p.shape[0])
        for c in centers:
            r2 = ((p - c[None, :dim]) ** 2).sum(axis=1)
            v += np.exp(-r2 / width**2)
        return v / (np.sqrt(2.0 * np.pi) * width) ** dim

    return f


def gaussian_rhs(centers: np.ndarray, width: float):
    centers = np.atleast_2d(np.asarray(centers, dtype=np.float64))

    def f(p: np.ndarray) -> np.ndarray:
        dim = p.shape[1]
        v = np.zeros(p.shape[0])
        for c in centers:
            r2 = ((p - c[None, :dim]) ** 2).sum(axis=1)
            v += (2 * dim - 4 * r2 / width**2) / width**2 * np.exp(-r2 / width**2)
        return v / (np.sqrt(2.0 * np.pi) * width) ** dim

    return f


def make_rhs_and_dbc(name: str, dim: int):
    """Map the driver's "rhs" config value to (rhs_fn, dirichlet_fn).

    Mirrors /root/reference/element_centered_preconditioners_01.cc:434-483.
    """
    zero = lambda p: np.zeros(p.shape[0])
    if name == "constant":
        return constant_rhs, zero
    if name == "gaussian":
        centers = np.array([[-0.5] * dim])
        return gaussian_rhs(centers, 0.1), gaussian_solution(centers, 0.1)
    if name == "gaussian-jw":
        if dim == 2:
            centers = np.array([[0.0, 0.0], [0.25, 0.85], [0.6, 0.4]])
        else:
            centers = np.array([[0.0, 0.0, 0.0], [0.25, 0.85, 0.85], [0.6, 0.4, 0.4]])
        return gaussian_rhs(centers, 1.0 / 3.0), gaussian_solution(centers, 1.0 / 3.0)
    if name == "sin-mp":
        return sinus_mp_rhs, zero
    raise ValueError(f"unknown rhs '{name}'")
