"""Balanced hyper-cube decomposition.

Port of the decomposition policy in
/root/reference/include/grid_generator.h:107-156: a refinement count ``s`` is split
into ``n_refine`` global refinements plus per-axis subdivisions (1/2/3/2x2/3x2/3x2x2)
so that DoF counts grow smoothly with s. The resulting domain is the box
[0,subdiv_0]x...x[0,subdiv_{dim-1}] tiled with unit cells.
"""

from __future__ import annotations


def decompose_balanced(dim: int, s: int) -> tuple[int, list[int]]:
    n_refine = s // 6
    remainder = s % 6

    subdivisions = [1] * dim
    if remainder == 1 and s > 1:
        subdivisions[0] = 3
        subdivisions[1] = 2
        subdivisions[2] = 2
        n_refine -= 1
    if remainder == 2:
        subdivisions[0] = 2
    elif remainder == 3:
        subdivisions[0] = 3
    elif remainder == 4:
        subdivisions[0] = 2
        subdivisions[1] = 2
    elif remainder == 5:
        subdivisions[0] = 3
        subdivisions[1] = 2

    return n_refine, subdivisions


def balanced_hyper_cube_subdivisions(dim: int, s: int) -> tuple[list[int], list[float]]:
    """Cells-per-axis and box lengths for the balanced hyper cube at parameter s."""
    n_refine, subdivisions = decompose_balanced(dim, s)
    cells = [sd * (1 << n_refine) for sd in subdivisions]
    lengths = [float(sd) for sd in subdivisions]
    return cells, lengths
