"""Pallas FDM slab kernel: equality vs the XLA global-FDM path.

Runs in interpreter mode on CPU (the driver benches the compiled kernel on the
real chip).  Tolerance: the f32 global path itself deviates from f64 by ~6e-3
relative (conditioning of the folded eigen-transforms), and the kernel
reorders the same f32 arithmetic — so equality is asserted in that class, plus
an f64-reference check that the kernel is no worse than the incumbent.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dealii_asm_tpu.fem.dofs import DofHandler
from dealii_asm_tpu.mesh.grid import StructuredMesh
from dealii_asm_tpu.precond.asm import ASMPreconditioner
from dealii_asm_tpu.ops.pallas.fdm_slab import FDMSlabKernel


@pytest.mark.parametrize("cells,p,wt", [
    ((4, 4, 4), 2, "symm"),
    ((4, 3, 5), 3, "symm"),
    ((3, 4, 2), 2, "post"),
    ((2, 3, 4), 4, "pre"),
    ((3, 3, 3), 3, "none"),
])
def test_kernel_matches_global_path(cells, p, wt):
    mesh = StructuredMesh(3, cells)
    dofs = DofHandler(mesh, p)
    asm = ASMPreconditioner(dofs, n_overlap=1, weighting_type=wt,
                            dtype=jnp.float32)
    k = FDMSlabKernel(asm)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(dofs.n_dofs), jnp.float32)
    ref = np.asarray(asm.vmult(x))
    out = np.asarray(k.apply(x, interpret=True))
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 3e-2


def test_kernel_accuracy_vs_f64():
    mesh = StructuredMesh(3, (4, 4, 4))
    dofs = DofHandler(mesh, 3)
    asm64 = ASMPreconditioner(dofs, n_overlap=1, weighting_type="symm",
                              dtype=jnp.float64)
    asm32 = ASMPreconditioner(dofs, n_overlap=1, weighting_type="symm",
                              dtype=jnp.float32)
    k = FDMSlabKernel(asm32)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(dofs.n_dofs)
    r64 = np.asarray(asm64.vmult(jnp.asarray(x)))
    r32 = np.asarray(asm32.vmult(jnp.asarray(x, jnp.float32)))
    out = np.asarray(k.apply(jnp.asarray(x, jnp.float32), interpret=True))
    err_inc = np.abs(r32 - r64).max() / np.abs(r64).max()
    err_ker = np.abs(out - r64).max() / np.abs(r64).max()
    # no worse than 2x the incumbent f32 path's own deviation
    assert err_ker < max(2 * err_inc, 1e-4)


def test_unsupported_configs_raise():
    mesh = StructuredMesh(3, (4, 4, 4), periodic=(True, True, True))
    dofs = DofHandler(mesh, 2)
    asm = ASMPreconditioner(dofs, n_overlap=1, weighting_type="symm",
                            dtype=jnp.float32)
    with pytest.raises(ValueError):
        FDMSlabKernel(asm)


class TestSmootherStepKernel:
    @pytest.mark.parametrize("cells,p,wt,om", [
        ((4, 4, 4), 2, "symm", 1.0),
        ((4, 3, 5), 3, "symm", 0.8),
        ((3, 4, 2), 2, "post", 1.0),
        ((2, 3, 4), 4, "pre", 0.9),
    ])
    def test_matches_composed_step(self, cells, p, wt, om):
        from dealii_asm_tpu.ops.laplace import LaplaceOperator
        from dealii_asm_tpu.ops.pallas.smoother_step import SmootherStepKernel

        mesh = StructuredMesh(3, cells)
        dofs = DofHandler(mesh, p)
        op = LaplaceOperator(dofs, dtype=jnp.float32)
        asm = ASMPreconditioner(dofs, n_overlap=1, weighting_type=wt,
                                dtype=jnp.float32)
        k = SmootherStepKernel(op, asm)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(dofs.n_dofs), jnp.float32)
        b = jnp.asarray(rng.standard_normal(dofs.n_dofs), jnp.float32)
        ref = np.asarray(x + om * asm.vmult(b - op.vmult(x)))
        out = np.asarray(k.step(x, b, om, interpret=True))
        rel = np.abs(out - ref).max() / np.abs(ref).max()
        assert rel < 3e-2
        # dense-MXU y-apply option stays equivalent (banded is the default)
        kd = SmootherStepKernel(op, asm, y_apply="dense")
        outd = np.asarray(kd.step(x, b, om, interpret=True))
        reld = np.abs(outd - ref).max() / np.abs(ref).max()
        assert reld < 3e-2


class TestChainedSmootherKernel:
    @pytest.mark.parametrize("cells,p,n_chain", [
        ((4, 4, 4), 2, 2),
        ((4, 3, 5), 3, 2),
        ((3, 4, 4), 2, 3),
    ])
    def test_chain_matches_repeated_steps(self, cells, p, n_chain):
        """The fused n_chain-step kernel == n_chain single fused steps
        (smoother_step._kernel_chain; intermediate iterates stay in VMEM)."""
        from dealii_asm_tpu.ops.laplace import LaplaceOperator
        from dealii_asm_tpu.ops.pallas.smoother_step import SmootherStepKernel

        mesh = StructuredMesh(3, cells)
        dofs = DofHandler(mesh, p)
        op = LaplaceOperator(dofs, dtype=jnp.float32)
        asm = ASMPreconditioner(dofs, n_overlap=1, weighting_type="symm",
                                dtype=jnp.float32)
        k1 = SmootherStepKernel(op, asm)
        kc = SmootherStepKernel(op, asm, n_chain=n_chain)
        rng = np.random.default_rng(3)
        nz, ny, nx = k1.grid_shape
        xg = jnp.asarray(rng.standard_normal((nz, ny, nx)), jnp.float32)
        bg = jnp.asarray(rng.standard_normal((nz, ny, nx)), jnp.float32)
        omegas = [0.9, 1.0, 0.7][:n_chain]
        ref = xg
        for om in omegas:
            ref = k1.step_grids(ref, bg, om, interpret=True)
        out = kc.unpad_grid(
            kc.steps_padded(kc.pad_grid(xg), kc.pad_grid(bg), omegas,
                            interpret=True), full_src=xg)
        ref = np.asarray(ref)
        out = np.asarray(out)
        rel = np.abs(out - ref).max() / np.abs(ref).max()
        # identical per-step arithmetic; tolerance covers XLA:CPU's
        # fusion-dependent f32 rounding differences between the two programs
        assert rel < 1e-5


class TestChebySweepKernel:
    @pytest.mark.parametrize("cells,p,deg,kind,zero", [
        ((4, 4, 4), 2, 3, "1st kind", False),
        ((4, 3, 5), 3, 2, "1st kind", True),
        ((3, 4, 4), 2, 3, "4th kind", True),
    ])
    def test_sweep_matches_chebyshev(self, cells, p, deg, kind, zero):
        """The fused momentum chain (sweep_padded) == the composed deal.II
        Chebyshev recurrence, both polynomial kinds, with and without the
        zero-guess fast path (smoother_step._kernel_chain cheby=True)."""
        from dealii_asm_tpu.ops.laplace import LaplaceOperator
        from dealii_asm_tpu.ops.pallas.smoother_step import SmootherStepKernel
        from dealii_asm_tpu.solvers.chebyshev import (
            ChebyshevPreconditioner, EigenvalueInfo)

        mesh = StructuredMesh(3, cells)
        dofs = DofHandler(mesh, p)
        op = LaplaceOperator(dofs, dtype=jnp.float32)
        asm = ASMPreconditioner(dofs, n_overlap=1, weighting_type="symm",
                                dtype=jnp.float32)
        cheb = ChebyshevPreconditioner(
            op.vmult, asm.vmult, dofs.n_dofs, degree=deg,
            eigenvalues=EigenvalueInfo(1.2, 1.5, 0), polynomial_type=kind)
        k = SmootherStepKernel(op, asm, n_chain=deg)
        coefs = cheb.sweep_coefficients()
        rng = np.random.default_rng(11)
        nz, ny, nx = k.grid_shape
        xg = jnp.asarray(rng.standard_normal((nz, ny, nx)), jnp.float32)
        bg = jnp.asarray(rng.standard_normal((nz, ny, nx)), jnp.float32)
        bp = k.pad_grid(bg)
        if zero:
            ref = cheb.vmult(bg.reshape(-1)).reshape(nz, ny, nx)
            out = k.unpad_grid(
                k.sweep_padded(bp, bp, coefs, zero_x=True, interpret=True))
        else:
            ref = cheb.step(xg.reshape(-1), bg.reshape(-1)).reshape(
                nz, ny, nx)
            out = k.unpad_grid(
                k.sweep_padded(k.pad_grid(xg), bp, coefs, interpret=True),
                full_src=xg)
        ref = np.asarray(ref)
        out = np.asarray(out)
        rel = np.abs(out - ref).max() / np.abs(ref).max()
        # bf16 F-path rounding compounds over the sub-steps
        assert rel < 4e-2


class TestDDVmultKernel:
    @pytest.mark.parametrize("cells,p", [
        ((4, 4, 4), 3),
        ((5, 3, 4), 4),
        ((2, 6, 3), 2),
    ])
    def test_matches_xla_dd_vmult(self, cells, p):
        """kernel='pallas-dd' (interpret) ≡ the XLA double-single path to
        dd accuracy — both are ~47-bit evaluations of the same f64 operator."""
        from dealii_asm_tpu.ops.laplace import LaplaceOperator

        mesh = StructuredMesh(3, cells)
        dofs = DofHandler(mesh, p)
        op_p = LaplaceOperator(dofs, dtype=jnp.float64, kernel="pallas-dd")
        assert op_p._dd_pallas is not None
        op_x = LaplaceOperator(dofs, dtype=jnp.float64)
        rng = np.random.default_rng(1)
        u = jnp.asarray(rng.standard_normal(dofs.n_dofs))
        vp = np.asarray(op_p.vmult(u))
        vx = np.asarray(op_x.vmult(u))
        assert np.abs(vp - vx).max() <= 1e-11 * np.abs(vx).max()

    def test_unsupported_falls_back(self):
        from dealii_asm_tpu.ops.laplace import LaplaceOperator

        # periodic: constructor must not install the kernel (XLA path serves)
        mesh = StructuredMesh(3, (4, 4, 4), periodic=(True, True, True))
        dofs = DofHandler(mesh, 2)
        op = LaplaceOperator(dofs, dtype=jnp.float64, kernel="pallas-dd")
        assert op._dd_pallas is None

    @pytest.mark.slow
    def test_fused_matches_four_pass(self):
        """2-pass chain (fused xy + dual z) ≡ original 4-pass chain: both
        are ~47-bit dd evaluations; merging c+d reorders one TwoSum chain."""
        from dealii_asm_tpu.ops.laplace import LaplaceOperator
        from dealii_asm_tpu.ops.pallas.dd_vmult import DDVmultKernel

        mesh = StructuredMesh(3, (5, 4, 3))
        dofs = DofHandler(mesh, 4)
        op = LaplaceOperator(dofs, dtype=jnp.float64, kernel="pallas-dd")
        kern = op._dd_pallas or DDVmultKernel(op, interpret=True)
        rng = np.random.default_rng(3)
        uh = jnp.asarray(rng.standard_normal(dofs.n_dofs), jnp.float32)
        ul = jnp.asarray(1e-8 * rng.standard_normal(dofs.n_dofs), jnp.float32)
        vh_f, vl_f = kern.vmult_dd(uh, ul, fused=True)
        vh_4, vl_4 = kern.vmult_dd(uh, ul, fused=False)
        v_f = np.asarray(vh_f, np.float64) + np.asarray(vl_f, np.float64)
        v_4 = np.asarray(vh_4, np.float64) + np.asarray(vl_4, np.float64)
        assert np.abs(v_f - v_4).max() <= 1e-12 * np.abs(v_4).max()


class TestF32VmultKernel:
    @pytest.mark.parametrize("cells,p", [
        ((4, 5, 3), 4),
        ((6, 4, 4), 2),
    ])
    def test_matches_xla_f32_vmult(self, cells, p):
        from dealii_asm_tpu.ops.laplace import LaplaceOperator

        mesh = StructuredMesh(3, cells)
        dofs = DofHandler(mesh, p)
        op_p = LaplaceOperator(dofs, dtype=jnp.float32, kernel="pallas-f32")
        assert op_p._f32_pallas is not None
        op_x = LaplaceOperator(dofs, dtype=jnp.float32)
        rng = np.random.default_rng(2)
        u = jnp.asarray(rng.standard_normal(dofs.n_dofs), jnp.float32)
        vp = np.asarray(op_p.vmult(u))
        vx = np.asarray(op_x.vmult(u))
        assert np.abs(vp - vx).max() <= 1e-5 * np.abs(vx).max()


class TestFZmxuVariant:
    """F-stage z-chains folded into the Gy/Gyt MXU dots (f_zmxu=True,
    VERDICT r4 task #5a probe): same smoother step within the bf16
    transform-rounding class of the default kernel."""

    @pytest.mark.parametrize("cells,p,om", [
        ((4, 4, 4), 2, 1.0),
        ((2, 3, 4), 4, 0.9),
    ])
    def test_matches_composed_step(self, cells, p, om):
        from dealii_asm_tpu.ops.laplace import LaplaceOperator
        from dealii_asm_tpu.ops.pallas.smoother_step import SmootherStepKernel

        mesh = StructuredMesh(3, cells)
        dofs = DofHandler(mesh, p)
        op = LaplaceOperator(dofs, dtype=jnp.float32)
        asm = ASMPreconditioner(dofs, n_overlap=1, weighting_type="symm",
                                dtype=jnp.float32)
        k = SmootherStepKernel(op, asm, f_zmxu=True)
        assert k._f_zmxu
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal(dofs.n_dofs), jnp.float32)
        b = jnp.asarray(rng.standard_normal(dofs.n_dofs), jnp.float32)
        ref = np.asarray(x + om * asm.vmult(b - op.vmult(x)))
        out = np.asarray(k.step(x, b, om, interpret=True))
        rel = np.abs(out - ref).max() / np.abs(ref).max()
        assert rel < 3e-2
