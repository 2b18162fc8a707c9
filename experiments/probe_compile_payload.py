"""Find what bloats the remote-compile payload of the ball solve (HTTP 413).

Builds the hyperball config at a given refinement ON CPU, lowers the outer-CG
init/body programs exactly like solvers/krylov.py does, and reports the
serialized HLO size plus the largest embedded constants (anything O(cells)
here defeats jit_hoist_consts and scales to the 413 at L=5).

    JAX_PLATFORMS=cpu python -m experiments.probe_compile_payload [n_ref]
"""

import json
import re
import sys

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def main():
    n_ref = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    params = json.load(open("experiments/e2e_ball_q4.json"))
    params["n refinements"] = n_ref
    params["solver"]["best of"] = 1

    from dealii_asm_tpu.models.poisson import (_build_multigrid, _make_dofs,
                                               _make_operator, make_mesh_family)
    from dealii_asm_tpu.fem.functions import make_rhs_and_dbc
    from dealii_asm_tpu.precond.adapter import PrecisionAdapter
    from dealii_asm_tpu.utils.config import get_child

    family = make_mesh_family(params, lambda *a: None)
    dofs = _make_dofs(family, family.fine_mesh, 4)
    op = _make_operator(family, dofs, jnp.float64)
    print("n_dofs:", dofs.n_dofs, "n_cells:", family.fine_mesh.n_cells_total,
          flush=True)
    rhs_fn, dbc_fn = make_rhs_and_dbc("constant", 3)
    b = op.assemble_rhs(rhs_fn, dirichlet=dbc_fn)
    mg = _build_multigrid(get_child(params, "preconditioner"), family, 4, op,
                          lambda *a: None, jnp.float32)
    precon = PrecisionAdapter(mg, jnp.float32)

    def step(x):
        return op.vmult(x) + precon.vmult(x)

    closed = jax.make_jaxpr(step)(b)
    consts = closed.consts
    total_const = sum(np.asarray(c).nbytes for c in consts)
    print(f"hoistable consts: n={len(consts)} total={total_const/1e6:.1f} MB",
          flush=True)

    try:  # same guarded layout probe as utils/jitutils.py
        from jax.extend.core import Jaxpr  # noqa: F401  (availability probe)
        from jax.core import eval_jaxpr
    except ImportError:  # pragma: no cover - older jax layouts
        from jax.core import eval_jaxpr

    lowered = jax.jit(
        lambda consts, x: eval_jaxpr(closed.jaxpr, consts, x)
    ).lower(consts, b)
    text = lowered.as_text()
    print(f"lowered HLO text: {len(text)/1e6:.1f} MB", flush=True)
    # find big dense<...> literals in the stablehlo text
    sizes = []
    for m_ in re.finditer(r"stablehlo\.constant dense<", text):
        start = m_.end()
        end = text.find(": tensor<", start)
        if end < 0 or end - start < 1000:
            continue
        tshape = text[end + 9 : text.find(">", end + 9)]
        sizes.append((end - start, tshape))
    sizes.sort(reverse=True)
    print("largest embedded literals (bytes-of-text, tensor):", flush=True)
    for s, t in sizes[:12]:
        print(f"  {s/1e6:8.2f} MB  tensor<{t}>", flush=True)
    if not sizes:
        print("  (none > 1 KB — payload is structural, not constant-driven)")


if __name__ == "__main__":
    main()
