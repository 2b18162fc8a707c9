from .krylov import (
    SolveResult,
    ReductionControl,
    IterationNumberControl,
    cg,
    flexible_cg,
    gmres,
    fgmres,
    bicgstab,
    solve,
)
from .chebyshev import (
    estimate_eigenvalues,
    ChebyshevPreconditioner,
    RelaxationPreconditioner,
)
