from .fdm import fdm_1d_matrices, FDMCollection
from .asm import ASMPreconditioner
from .diagonal import DiagonalPreconditioner
