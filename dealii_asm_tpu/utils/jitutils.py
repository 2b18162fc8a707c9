"""jit helpers for the remote-compile tunnel.

``jax.jit`` of a solver loop that closes over operator/preconditioner tables
embeds every captured device array into the lowered program as a literal
constant.  Locally that only bloats the executable; through a remote-compile
tunnel the serialized request carries all of them, and at O(n_dofs) table
sizes (merged-geometry coefficients, per-patch FDM eigen-transform tables) it
overflows the transport (HTTP 413 at the 7.2M-DoF Kershaw solve).

``jit_hoist_consts`` traces the function once (``jax.make_jaxpr``), splits
off the captured constants, and jits a replay of the jaxpr that takes them
as runtime PARAMETERS — device-resident tables are then passed by reference
at dispatch time and the compile payload holds only the program.
(``jax.closure_convert`` does NOT do this: it only hoists tracer-derived
constants; concrete arrays stay embedded.)
"""

from __future__ import annotations


def jit_hoist_consts(fn, *example_args):
    """jit ``fn`` with closed-over array constants hoisted to arguments.

    ``example_args`` fix the positional signature (concrete arrays or
    ``jax.ShapeDtypeStruct``).  Tracing happens here, once; the returned
    callable replays the closed jaxpr with the hoisted constants prepended.
    """
    import jax
    from jax import tree_util

    try:
        from jax.extend.core import Jaxpr  # noqa: F401  (availability probe)
        from jax.core import eval_jaxpr
    except ImportError:  # pragma: no cover - older jax layouts
        from jax.core import eval_jaxpr

    closed, out_shape = jax.make_jaxpr(fn, return_shape=True)(*example_args)
    out_tree = tree_util.tree_structure(out_shape)
    jaxpr, consts = closed.jaxpr, list(closed.consts)

    def lifted(consts, *args):
        flat, _ = tree_util.tree_flatten(args)
        out = eval_jaxpr(jaxpr, consts, *flat)
        return tree_util.tree_unflatten(out_tree, out)

    jitted = jax.jit(lifted)

    def run(*args):
        return jitted(consts, *args)

    run._hoisted_n_consts = len(consts)  # introspection for tests
    return run
