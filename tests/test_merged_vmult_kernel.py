"""Fused merged-geometry dd vmult kernel vs the XLA dd composition and the
straight f64 apply (interpret mode — VERDICT r3 task #2, reference hot path
/root/reference/include/operator.h:1162-1219)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dealii_asm_tpu.fem.dofs import DofHandler
from dealii_asm_tpu.mesh.grid import StructuredMesh
from dealii_asm_tpu.mesh.transforms import kershaw_transform
from dealii_asm_tpu.ops.laplace import LaplaceOperator
from dealii_asm_tpu.ops.pallas.merged_vmult import MergedDDVmultKernel


def _problem(cells=(4, 4, 6), degree=3):
    tf = kershaw_transform(0.3, 0.3)
    mesh = StructuredMesh(3, cells, transform=tf)
    dofs = DofHandler(mesh, degree)
    op = LaplaceOperator(dofs, mapping_degree=3, dtype=jnp.float64)
    return dofs, op


class TestMergedDDKernel:
    @pytest.mark.parametrize("cells,degree", [
        ((4, 4, 6), 3), ((3, 4, 5), 2), ((4, 3, 4), 4),
    ])
    def test_matches_f64_apply(self, cells, degree):
        from dealii_asm_tpu.ops.ddmath import dd_from_f64 as split_f64
        from dealii_asm_tpu.ops.tensorops import merged_laplace_apply

        dofs, op = _problem(cells, degree)
        kern = MergedDDVmultKernel(op, interpret=True)
        rng = np.random.default_rng(5)
        u = rng.standard_normal(dofs.n_dofs)
        uh, ul = split_f64(u)

        vh, vl = kern.vmult_dd(jnp.asarray(uh, jnp.float32),
                               jnp.asarray(ul, jnp.float32))
        got = np.asarray(vh, np.float64) + np.asarray(vl, np.float64)

        nz, ny, nx = kern.grid_shape
        ref = np.asarray(merged_laplace_apply(
            jnp.asarray(u).reshape(nz, ny, nx), op.Ev, op.Ed, op.Evt, op.Edt,
            op.coeff6, 3)).reshape(-1)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12 * scale)

    def test_operator_routes_dd_through_kernel(self):
        """kernel="pallas-dd" on deformed geometry: supports_dd turns on,
        vmult_dd dispatches to the fused kernel and matches the f64 vmult
        (laplace.py merged dd integration)."""
        from dealii_asm_tpu.ops.ddmath import dd_from_f64
        from dealii_asm_tpu.ops.tensorops import merged_laplace_apply

        tf = kershaw_transform(0.3, 0.3)
        mesh = StructuredMesh(3, (4, 4, 4), transform=tf)
        dofs = DofHandler(mesh, 3)
        op = LaplaceOperator(dofs, mapping_degree=3, dtype=jnp.float64,
                             kernel="pallas-dd")
        assert op._merged_dd_pallas is not None
        assert op.supports_dd
        rng = np.random.default_rng(11)
        u = rng.standard_normal(dofs.n_dofs)
        uh, ul = dd_from_f64(jnp.asarray(u))
        vh, vl = op.vmult_dd(uh, ul)
        got = np.asarray(vh, np.float64) + np.asarray(vl, np.float64)
        # reference: exact f64 merged apply with vmult's constraint
        # semantics (identity rows) emulated outside the kernel
        free = np.asarray(op._free_mask()).reshape(-1)
        nz, ny, nx = op._merged_dd_pallas.grid_shape
        u0 = np.where(free, u, 0.0)
        raw = np.asarray(merged_laplace_apply(
            jnp.asarray(u0).reshape(nz, ny, nx), op.Ev, op.Ed, op.Evt,
            op.Edt, op.coeff6, 3)).reshape(-1)
        ref = np.where(free, raw, u)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12 * scale)
        # the f64 vmult routes through the same kernel — spot-check parity
        ref2 = np.asarray(op.vmult(jnp.asarray(u)))
        np.testing.assert_allclose(got, ref2, rtol=0, atol=1e-12 * scale)

    @pytest.mark.slow
    def test_matches_xla_dd_path(self):
        from dealii_asm_tpu.ops.ddmath import dd_from_f64 as split_f64
        from dealii_asm_tpu.ops.tensorops import (
            merged_laplace_apply_windowed_dd)

        dofs, op = _problem((4, 4, 4), 3)
        kern = MergedDDVmultKernel(op, interpret=True)
        rng = np.random.default_rng(7)
        u = rng.standard_normal(dofs.n_dofs)
        uh, ul = split_f64(u)
        vh, vl = kern.vmult_dd(jnp.asarray(uh, jnp.float32),
                               jnp.asarray(ul, jnp.float32))
        got = np.asarray(vh, np.float64) + np.asarray(vl, np.float64)

        nz, ny, nx = kern.grid_shape
        qn = op.n_q_1d
        czyx = tuple(reversed(op.mesh.n_cells))
        ishape = tuple(v for c in czyx for v in (c, qn))
        c6 = [tuple(t.reshape(ishape)
                    for t in op.coeff6_dd[4 * i : 4 * i + 4])
              for i in range(6)]
        rh, rl = merged_laplace_apply_windowed_dd(
            jnp.asarray(uh, jnp.float32).reshape(nz, ny, nx),
            jnp.asarray(ul, jnp.float32).reshape(nz, ny, nx),
            op._Nq_np, op._Dq_np, c6, op.mesh.n_cells,
            op.degree, op.mesh.periodic, 3)
        ref = (np.asarray(rh, np.float64)
               + np.asarray(rl, np.float64)).reshape(-1)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12 * scale)
