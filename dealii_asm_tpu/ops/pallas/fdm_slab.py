"""Pallas TPU kernel: fused FDM overlap-1 Schwarz apply, one HBM pass.

The XLA dense-global FDM path (ops/tensorops.fdm_global_apply) runs six
grid-sized matmuls, each round-tripping a ~130 MB intermediate through HBM.
This kernel keeps a z-window slab (m = p+1 planes) resident in VMEM and
performs ALL six transforms + the eigenvalue scale on it before writing back:
HBM traffic drops to one read + one write of the grid (the reference achieves
the same cache residency with its fused cell loop,
/root/reference/include/matrix_free.h:1007-1364).

Pipelining: consecutive z-windows overlap in ONE plane, which Pallas
BlockSpecs cannot express — so the grid advances in non-overlapping p-plane
blocks and the input is passed TWICE with index maps offset by one block (the
window's last plane = first plane of the next block).  This keeps the
automatic double-buffered BlockSpec pipeline (measured 3.5x faster than
manual synchronous DMA per window).  The shared output plane is carried in a
persistent VMEM scratch between sequential grid steps; a final cleanup step
(grid = n_win + 1) flushes it.

The z-direction eigen-transform runs as per-plane scaled adds (VPU, scalars
from SMEM); the y/x transforms are dense folded-transform matmuls on the MXU.
Weights / Dirichlet masks are folded into the transforms by the caller (same
folding as ASMPreconditioner.global_fdm), so the kernel is pure linear
algebra.  ny is padded to 8 (sublanes), nx and My/Mx to 128 (lanes).

Restrictions: dim == 3, element-centric overlap 1, non-periodic axes, f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(lamz_ref, vzf_ref, vzb_ref, x1_ref, x2_ref, gy_ref, gyt_ref,
            gxT_ref, gxtT_ref, lamyx_ref, out_ref, carry,
            *, m: int, p: int, n_win: int):
    w = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(w < n_win)
    def _():
        dt = gy_ref.dtype  # f32 or stored-bf16 transforms

        def sl(s):  # window plane s: core block rows 0..p-1, then next block
            return x1_ref[s] if s < p else x2_ref[s - p]

        for k in range(m):  # static unroll over z modes
            # z-forward for mode k: T = Σ_s Vzf[w][s,k]·slab[s]  (VPU)
            T = vzf_ref[w, 0, k] * sl(0)
            for s in range(1, m):
                T = T + vzf_ref[w, s, k] * sl(s)
            B = jnp.dot(gy_ref[:], T.astype(dt), preferred_element_type=f32)
            Cq = jnp.dot(B.astype(dt), gxT_ref[:], preferred_element_type=f32)
            Cq = Cq / (lamyx_ref[:] + lamz_ref[w, k])
            Y = jnp.dot(gyt_ref[:], Cq.astype(dt), preferred_element_type=f32)
            Z = jnp.dot(Y.astype(dt), gxtT_ref[:], preferred_element_type=f32)
            # z-backward: scatter mode k into output planes (VPU)
            for s in range(p):
                if k == 0:
                    out_ref[s] = vzb_ref[w, s, k] * Z
                else:
                    out_ref[s] += vzb_ref[w, s, k] * Z
            # last window plane goes to the carry (shared with next window)
            if k == 0:
                carry[1] = vzb_ref[w, m - 1, k] * Z
            else:
                carry[1] += vzb_ref[w, m - 1, k] * Z

        # plane w·p is shared with the previous window: add its carry
        @pl.when(w > 0)
        def _():
            out_ref[0] += carry[0]

        carry[0] = carry[1]

    @pl.when(w == n_win)
    def _():
        # cleanup step: flush the final shared plane (grid node n_win·p)
        out_ref[0] = carry[0]
        for s in range(1, p):
            out_ref[s] = jnp.zeros_like(out_ref[s])


@functools.partial(jax.jit, static_argnames=("shape", "interpret"))
def _call(x, vzf, vzb, lamz, gy, gyt, gxT, gxtT, lamyx, shape,
          interpret=False):
    nzp, ny, nx, m, p, n_win = shape
    kern = functools.partial(_kernel, m=m, p=p, n_win=n_win)
    blk = (p, ny, nx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_win + 1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # lamz (n_win, m)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # vzf (n_win, m, m)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # vzb (n_win, m, m)
            pl.BlockSpec(blk, lambda w: (w, 0, 0),
                         memory_space=pltpu.VMEM),             # core planes
            pl.BlockSpec(blk, lambda w: (w + 1, 0, 0),
                         memory_space=pltpu.VMEM),             # next block
            pl.BlockSpec(memory_space=pltpu.VMEM),   # gy (My, ny)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # gyt (ny, My)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # gxT (nx, Mx)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # gxtT (Mx, nx)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # lamyx (My, Mx)
        ],
        out_specs=pl.BlockSpec(blk, lambda w: (w, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, ny, nx), jnp.float32),    # carry planes (prev, cur)
        ],
    )
    # trace with x64 promotion OFF regardless of the caller's config: under
    # jax_enable_x64 the body's int scalars promote to i64 and Mosaic fails
    # to legalize them (same guard as smoother_step._call)
    from jax._src.config import enable_x64 as _enable_x64

    with _enable_x64(False):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(((n_win + 1) * p, ny, nx),
                                           jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),  # sequential: carry dep
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(lamz, vzf, vzb, x, x, gy, gyt, gxT, gxtT, lamyx)


class FDMSlabKernel:
    """Host-side wrapper: builds per-window z-tables from the folded global
    transforms and exposes apply(grid) -> grid."""

    def __init__(self, asm, transform_dtype=jnp.float32):
        """asm: a structured ASMPreconditioner with global_fdm built
        (element-centric, overlap 1, non-periodic, dim 3, f32).

        transform_dtype=bfloat16 stores the y/x transform matrices in bf16
        (single-pass MXU; the smoother is a preconditioner, the reference runs
        its MG levels in float anyway)."""
        dofs = asm.dofs
        mesh = dofs.mesh
        if (mesh.dim != 3 or asm.n_overlap != 1
                or asm.patch_type != "element" or any(mesh.periodic)
                or asm.global_fdm is None):
            raise ValueError("FDMSlabKernel: unsupported configuration")
        p = asm.degree
        m = asm.m
        Gs, Gts, lams = asm.global_fdm
        # direction order in global_fdm: d = 0 (x), 1 (y), 2 (z)
        Gx, Gy, Gz = (np.asarray(G, np.float32) for G in Gs)
        Gxt, Gyt, Gzt = (np.asarray(G, np.float32) for G in Gts)
        lx, ly, lz = (np.asarray(l, np.float32).reshape(-1) for l in lams)
        n_win = mesh.n_cells[2]
        nz, ny, nx = (dofs.nodes_per_dim[2], dofs.nodes_per_dim[1],
                      dofs.nodes_per_dim[0])
        # tile-aligned padded sizes (zero rows/cols keep the result exact);
        # z padded so the offset-block input index map stays in range
        nyp = -(-ny // 8) * 8
        nxp = -(-nx // 128) * 128
        nzp = (n_win + 2) * p
        # per-window z blocks: Gz[(w,k), w·p+s] = V[s,k]·win_z  (vzf[w][s,k])
        vzf = np.zeros((n_win, m, m), np.float32)
        vzb = np.zeros((n_win, m, m), np.float32)
        for w in range(n_win):
            vzf[w] = Gz[w * m : (w + 1) * m, w * p : w * p + m].T
            vzb[w] = Gzt[w * p : w * p + m, w * m : (w + 1) * m]

        def padc(M, cols):
            return np.pad(M, ((0, 0), (0, cols - M.shape[1])))

        def padr(M, rows):
            return np.pad(M, ((0, rows - M.shape[0]), (0, 0)))

        tdt = transform_dtype
        # construction may run lazily inside someone else's jit trace (the
        # smoother builds the kernel on first vmult): force concrete arrays
        # so the cached tables never capture that trace's tracers
        with jax.ensure_compile_time_eval():
            self.args = (
                jnp.asarray(vzf), jnp.asarray(vzb),
                jnp.asarray(lz.reshape(n_win, m)),
                jnp.asarray(padc(Gy, nyp), tdt),
                jnp.asarray(padr(Gyt, nyp), tdt),
                jnp.asarray(padr(Gx.T, nxp), tdt),
                jnp.asarray(padc(Gxt.T, nxp), tdt),
                jnp.asarray(ly[:, None] + lx[None, :]),
            )
        self.shape = (nzp, nyp, nxp, m, p, n_win)
        self.grid_shape = (nz, ny, nx)
        self._pad = ((0, nzp - nz), (0, nyp - ny), (0, nxp - nx))

    def apply_grid(self, x_grid, interpret=False):
        xp = jnp.pad(x_grid.astype(jnp.float32), self._pad)
        out = _call(xp, *self.args, shape=self.shape, interpret=interpret)
        nz, ny, nx = self.grid_shape
        return out[:nz, :ny, :nx]

    def apply(self, x_flat, interpret=False):
        return self.apply_grid(x_flat.reshape(self.grid_shape),
                               interpret=interpret).reshape(-1)
