from .lagrange import (
    gauss_points,
    gauss_lobatto_points,
    lagrange_values,
    lagrange_derivatives,
    Shape1D,
    shape_1d,
    reference_mass_stiffness_1d,
)
from .dofs import DofHandler
