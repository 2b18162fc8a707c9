"""Multi-device (SPMD) path for UNSTRUCTURED meshes — P1/P3 for every
mesh family.

The reference partitions any p4est forest across ranks with a space-filling
curve and runs two-phase ghost exchange on the shared dofs
(/root/reference/include/matrix_free_internal.h:15-103; SURVEY P1/P3).
The TPU-native analog here:

- **cells** are split into device-contiguous index ranges (the mesh's cell
  order follows the refinement tree — the SFC-locality analog),
- **dofs** are owned by the lowest-index device whose cells touch them and
  renumbered owner-blocked, so the global vector is a (D, B) block-sharded
  array (`jax.sharding` over a 1D device mesh),
- the fine level runs under `shard_map`: gathers read from an
  `all_gather`-reconstructed padded global vector (v1 fetch; the
  neighbor-only `ppermute` refinement is a recorded optimization, not a
  correctness need), local cell work is the SAME lane-major apply as
  single-device, and the scatter-back sums own-range slots natively plus a
  ghost block that is exchanged and `compress(add)`-ed into owners — one
  colliding `.at[].add` per side (measured fastest, results_r5.md),
- **coarse levels replicate**: every device runs the identical inner
  multigrid on the restricted residual (the analog of the reference's
  shrinking coarse sub-communicator, element_centered_preconditioners_01.cc
  :598-632 — at 8x-per-level coarsening the replicated work is <15%).

Everything here is host-built static tables + jit-compiled collectives;
no data-dependent control flow.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax layouts
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

AXIS = "dev"


class GeneralPartition:
    """Cell-contiguous D-way partition with owner-blocked dof renumbering.

    new numbering: dofs sorted by (owner device, old id); device d owns
    new ids [offsets[d], offsets[d+1]).  The padded global vector has
    length D·B (B = max owned count); slot d·B + i holds new id
    offsets[d] + i (i < n_own[d]), pads are zero.
    """

    def __init__(self, dofs, n_dev: int):
        self.dofs = dofs
        self.n_dev = int(n_dev)
        cd = np.asarray(dofs.cell_dofs, np.int64)  # (C, L)
        C = cd.shape[0]
        n = dofs.n_dofs
        self.n_dofs = n
        # balanced contiguous cell ranges
        bounds = np.linspace(0, C, self.n_dev + 1).astype(np.int64)
        self.cell_bounds = bounds
        cell_owner = np.searchsorted(bounds[1:], np.arange(C), side="right")

        owner = np.full(n, self.n_dev, np.int64)
        np.minimum.at(owner, cd.reshape(-1),
                      np.repeat(cell_owner, cd.shape[1]))
        assert owner.max() < self.n_dev, "dof untouched by any cell"
        self.owner = owner

        order = np.argsort(owner * (n + 1) + np.arange(n), kind="stable")
        self.new_of_old = np.empty(n, np.int64)
        self.new_of_old[order] = np.arange(n)
        self.old_of_new = order
        n_own = np.bincount(owner, minlength=self.n_dev)
        self.n_own = n_own
        self.offsets = np.concatenate([[0], np.cumsum(n_own)])
        self.B = int(n_own.max())

        # padded-slot id of each new id: dev·B + (new − offsets[dev])
        dev_of_new = owner[order]
        self.slot_of_new = (dev_of_new * self.B
                            + np.arange(n) - self.offsets[dev_of_new])
        self.NB = self.n_dev * self.B

        # per-device cell tables in new numbering, padded to Cmax cells
        self.Cmax = int((bounds[1:] - bounds[:-1]).max())
        L = cd.shape[1]
        self.L = L
        cd_new_slot = self.slot_of_new[self.new_of_old[cd]]  # (C, L) padded-slot ids

        # ghosts: per device, padded-slots touched but not owned
        self.ghost_slots = []   # global padded-slot ids, sorted
        gmax = 1
        for d in range(self.n_dev):
            cells = cd_new_slot[bounds[d]: bounds[d + 1]]
            lo, hi = d * self.B, d * self.B + self.B
            g = np.unique(cells[(cells < lo) | (cells >= hi)])
            self.ghost_slots.append(g)
            gmax = max(gmax, len(g))
        self.Gmax = gmax

        # per-device local gather tables (L, Cmax·?) — lane-major (L, C_d):
        # local index: own slot -> [0, B); ghost g -> B + pos; pad cell ->
        # B + Gmax (zero slot)
        n_loc = self.B + self.Gmax
        self.n_loc = n_loc
        gtab = np.full((self.n_dev, L, self.Cmax), n_loc, np.int64)
        for d in range(self.n_dev):
            cells = cd_new_slot[bounds[d]: bounds[d + 1]]  # (C_d, L)
            lo = d * self.B
            local = np.where(
                (cells >= lo) & (cells < lo + self.B), cells - lo,
                self.B + np.searchsorted(self.ghost_slots[d], cells))
            gtab[d, :, : cells.shape[0]] = local.T
        self.gather_tab = jnp.asarray(gtab, jnp.int32)  # (D, L, Cmax)

        # fetch table: local value i (< B: own; else ghost) -> padded-slot
        # id into the all_gathered (NB,) vector; zero slot -> NB
        ftab = np.full((self.n_dev, n_loc + 1), self.NB, np.int64)
        for d in range(self.n_dev):
            ftab[d, : self.B] = d * self.B + np.arange(self.B)
            ftab[d, self.B: self.B + len(self.ghost_slots[d])] = \
                self.ghost_slots[d]
        self.fetch_tab = jnp.asarray(ftab, jnp.int32)  # (D, n_loc+1)

        # receive table: entry (src_dev·Gmax + k) of the all_gathered ghost
        # blocks -> OWN local index on this device (or sentinel B)
        rtab = np.full((self.n_dev, self.n_dev * self.Gmax), self.B,
                       np.int64)
        for src in range(self.n_dev):
            g = self.ghost_slots[src]
            own_dev = g // self.B
            own_idx = g - own_dev * self.B
            for dst in range(self.n_dev):
                sel = own_dev == dst
                rtab[dst, src * self.Gmax + np.nonzero(sel)[0]] = \
                    own_idx[sel]
        self.recv_tab = jnp.asarray(rtab, jnp.int32)  # (D, D·Gmax)

        # constrained mask / any global vector, in padded-block layout
        self._pad_perm = np.full(self.NB, n, np.int64)
        self._pad_perm[self.slot_of_new] = self.old_of_new
        self._unpad_perm = self.slot_of_new[self.new_of_old]

    def pad(self, u):
        """global (n,) old-numbering -> (NB,) padded owner-blocked."""
        up = jnp.concatenate([u, jnp.zeros((1,), u.dtype)])
        return up[jnp.asarray(self._pad_perm)]

    def unpad(self, ub):
        """(NB,) padded owner-blocked -> (n,) old numbering."""
        return ub[jnp.asarray(self._unpad_perm)]


class ShardedGeneralOperator:
    """Sharded twin of GeneralLaplaceOperator (lane-major f32/f64-dd).

    vmult runs under shard_map on a 1D device mesh; the local cell apply
    is the operator's own `apply_local_lanes` / `apply_local_lanes_dd` on
    per-device cell blocks.
    """

    def __init__(self, op, part: GeneralPartition, jmesh: Mesh):
        self.op = op
        self.part = part
        self.jmesh = jmesh
        D = part.n_dev
        # per-device coefficient blocks, cells padded to Cmax (zeros)
        q = op.n_q_1d
        dim = op.dim
        Q = q ** dim

        def split_cells(arr_qC):  # (..., C) lane-major -> (D, ..., Cmax)
            C = arr_qC.shape[-1]
            out = np.zeros((D,) + arr_qC.shape[:-1] + (part.Cmax,),
                           arr_qC.dtype)
            for d in range(D):
                lo, hi = part.cell_bounds[d], part.cell_bounds[d + 1]
                out[d, ..., : hi - lo] = arr_qC[..., lo:hi]
            return out

        if np.dtype(op.dtype) == np.float64:
            self._mode = "dd"
            if op.coeff6_dd is not None:
                tabs = [np.asarray(t) for t in op.coeff6_dd]
            else:
                # the fused single-device kernel skips the XLA split
                # tables; rebuild them from the f64 components
                from ..ops.ddmath import split_table_np

                tabs = []
                for c6 in op.coeff6:
                    tabs.extend(split_table_np(np.asarray(c6, np.float64)))
            self.coeff_dev = tuple(jnp.asarray(split_cells(t))
                                   for t in tabs)
        else:
            self._mode = "f32"
            self.coeff_dev = tuple(
                jnp.asarray(split_cells(np.asarray(t))) for t in op.coeff6)
        self.constrained_b = part.pad(op.constrained)
        del Q

    def _local_apply(self, W_or_pair, coeffs):
        op = self.op
        if self._mode == "dd":
            n_sym = len(coeffs) // 4
            c6dd = [tuple(coeffs[4 * k: 4 * k + 4]) for k in range(n_sym)]
            return op.apply_local_lanes_dd(W_or_pair[0], W_or_pair[1], c6dd)
        return op.apply_local_lanes(W_or_pair, coeffs)

    def vmult_blocked(self, ub):
        """(NB,) padded owner-blocked -> (NB,) result, SPMD."""
        part = self.part
        spec_v = P(AXIS)

        def kernel(ub_d, gt_d, ft_d, rt_d, *coeffs):
            gt = gt_d[0]
            ft = ft_d[0]
            rt = rt_d[0]
            cfs = [c[0] for c in coeffs]
            xfull = jax.lax.all_gather(ub_d, AXIS, tiled=True)  # (NB,)
            xfull = jnp.concatenate([xfull, jnp.zeros((1,), xfull.dtype)])
            local = xfull[ft]  # (n_loc+1,) incl zero slot
            if self._mode == "dd":
                from ..ops.ddmath import dd_from_f64

                lh, ll = dd_from_f64(local)
                W = (lh[gt], ll[gt])
                vh, vl = self._local_apply(W, cfs)
                v = vh.astype(ub_d.dtype) + vl.astype(ub_d.dtype)
            else:
                W = local[gt]
                v = self._local_apply(W, cfs)
            # scatter into own range + ghost block
            partv = jnp.zeros(part.n_loc + 1, ub_d.dtype).at[
                gt.reshape(-1)].add(v.reshape(-1))
            own = partv[: part.B]
            ghost = partv[part.B: part.B + part.Gmax]
            gall = jax.lax.all_gather(ghost, AXIS, tiled=False).reshape(-1)
            own = jnp.concatenate(
                [own, jnp.zeros((1,), own.dtype)]).at[rt].add(gall)[:-1]
            return own

        mesh = self.jmesh
        spec_t = lambda a: P(AXIS, *([None] * (a.ndim - 1)))
        fn = shard_map(
            kernel, mesh=mesh,
            in_specs=(spec_v, spec_t(part.gather_tab),
                      spec_t(part.fetch_tab), spec_t(part.recv_tab))
            + tuple(spec_t(c) for c in self.coeff_dev),
            out_specs=spec_v)
        u0 = jnp.where(self.constrained_b, 0.0, ub).astype(ub.dtype)
        out = fn(u0, part.gather_tab, part.fetch_tab, part.recv_tab,
                 *self.coeff_dev)
        return jnp.where(self.constrained_b, ub, out)

    def vmult_global(self, u):
        """(n,) old numbering in/out — the equality-test wrapper."""
        return self.part.unpad(self.vmult_blocked(self.part.pad(u)))
