"""Krylov-solver cost anatomy + MG-transfer throughput benchmarks.

Rebuilds /root/reference/outer_solver_01.likwid.cc (CG/FCG/GMRES/FGMRES/
Bicgstab/IDR cost per iteration, Jacobi-preconditioned, IterationNumberControl)
and /root/reference/transfer_01.likwid.cc (restrict_and_add / prolongate_and_add
throughput for p-coarsening p -> {1, p/2, p-1}).

Output protocol matches the reference's grep-friendly lines:
    >> solver-<name> n_dofs n_its time
    >> transfer-<pc>-<dir> fine_dofs n_rep time
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def run_solver_anatomy(params: dict, out=sys.stdout):
    import jax.numpy as jnp

    from ..fem.dofs import DofHandler
    from ..mesh.balanced import balanced_hyper_cube_subdivisions
    from ..mesh.grid import StructuredMesh
    from ..ops.laplace import LaplaceOperator
    from ..precond.diagonal import DiagonalPreconditioner
    from ..solvers import krylov
    from ..utils.config import get_param

    dim = int(get_param(params, "dim", 3))
    s = int(get_param(params, "n subdivision", 6))
    degree = int(get_param(params, "fe degree", 4))
    n_its = int(get_param(params, "n iterations", 20))
    cells, lengths = balanced_hyper_cube_subdivisions(dim, s)
    mesh = StructuredMesh(dim, tuple(cells), lengths=tuple(lengths))
    dofs = DofHandler(mesh, degree)
    op = LaplaceOperator(dofs, dtype=jnp.float32)
    diag = DiagonalPreconditioner(op)
    rng = np.random.default_rng(0)
    b = jnp.asarray(np.where(dofs.boundary_mask, 0.0,
                             rng.standard_normal(dofs.n_dofs)), jnp.float32)

    solvers = get_param(
        params, "solvers", "CG FCG GMRES FGMRES Bicgstab IDR").split()
    for name in solvers:
        fn = krylov._SOLVERS[name]
        control = krylov.IterationNumberControl(n_its, 0.0)
        res = fn(op.vmult, b, M=diag.vmult, control=control)  # warm up
        control = krylov.IterationNumberControl(n_its, 0.0)
        t0 = time.perf_counter()
        res = fn(op.vmult, b, M=diag.vmult, control=control)
        _ = float(jnp.asarray(res.x).ravel()[0])
        dt = time.perf_counter() - t0
        print(f">> solver-{name} {dofs.n_dofs} {res.n_iterations} {dt:.6g}",
              file=out, flush=True)


def run_transfer_bench(params: dict, out=sys.stdout):
    import jax.numpy as jnp

    from ..fem.dofs import DofHandler
    from ..mesh.balanced import balanced_hyper_cube_subdivisions
    from ..mesh.grid import StructuredMesh
    from ..ops.transfer import TwoLevelTransfer
    from ..utils.config import get_param

    dim = int(get_param(params, "dim", 3))
    s = int(get_param(params, "n subdivision", 6))
    degree = int(get_param(params, "fe degree", 4))
    n_rep = int(get_param(params, "n repetitions", 10))
    cells, lengths = balanced_hyper_cube_subdivisions(dim, s)
    mesh = StructuredMesh(dim, tuple(cells), lengths=tuple(lengths))
    fine = DofHandler(mesh, degree)
    rng = np.random.default_rng(0)

    for pc in sorted({1, max(degree // 2, 1), degree - 1} - {0}):
        coarse = DofHandler(mesh, pc)
        tr = TwoLevelTransfer(coarse, fine, dtype=jnp.float32)
        uf = jnp.asarray(rng.standard_normal(fine.n_dofs), jnp.float32)
        uc = jnp.asarray(rng.standard_normal(coarse.n_dofs), jnp.float32)
        for direction, f, src in (("restrict", tr.restrict, uf),
                                  ("prolongate", tr.prolongate, uc)):
            y = f(src)
            _ = float(jnp.asarray(y).ravel()[0])
            t0 = time.perf_counter()
            for _ in range(n_rep):
                y = f(src)
            _ = float(jnp.asarray(y).ravel()[0])
            dt = time.perf_counter() - t0
            print(f">> transfer-{pc}-{direction} {fine.n_dofs} {n_rep} {dt:.6g}",
                  file=out, flush=True)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    for path in argv:
        with open(path) as f:
            params = json.load(f)
        kind = params.get("kind", "solvers")
        if kind == "solvers":
            run_solver_anatomy(params)
        else:
            run_transfer_bench(params)
    return 0


if __name__ == "__main__":
    sys.exit(main())
