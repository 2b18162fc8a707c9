from .table import ConvergenceTable
from .config import get_child, get_param
