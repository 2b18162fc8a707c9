from .grid import StructuredMesh
from .transforms import (
    kershaw_transform,
    anisotropy_transform,
    sinusoidal_displacement,
    compose,
)
from .balanced import decompose_balanced, balanced_hyper_cube_subdivisions
