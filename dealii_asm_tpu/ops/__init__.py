from .geometry import GeometryData, compute_geometry
from .laplace import LaplaceOperator
