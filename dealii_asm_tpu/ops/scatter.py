"""Scatter-add as transpose gathers — the TPU-native `compress(add)`.

Every unstructured-path kernel ends in "scatter local values back to global
DoFs" (the reference's `distribute_local_to_global`,
/root/reference/include/vector_access_reduced.h:407-548, conflict-free by
SIMD-lane transposes).  The direct JAX spelling `zeros.at[idx].add(v)` is an
XLA scatter with colliding indices, which TPU lowers to a *serialized*
update loop — measured seconds per apply at 16M updates (ball L=5), and the
reason the unstructured V-cycle ran ~50x slower than the structured one.

The TPU-native form inverts the map ONCE on the host: for each global dof,
the (padded) list of source slots that contribute to it.  The device op is
then K dense gathers + adds — pure streaming, no conflicts:

    out[d] = sum_k v_flat_padded[tab[d, k]]

with `tab[d, k] = S` (a zero pad slot) beyond dof d's contribution count.
Most dofs have one contributor (cell-interior nodes); the width K is the
max valence (8 for regular vertices).  To avoid K full passes when only a
few dofs are shared, the table is split into the always-present first
contribution and a *sorted tail*: dofs are ranked by contribution count so
columns k>=1 only gather over the prefix that still has contributors.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class TransposeScatter:
    """Host-built dof->slots transpose of an index table.

    Parameters
    ----------
    idx : np.ndarray (any shape)
        Target dof of each source slot (row-major flattened order must match
        the `v` passed to `apply`).  Entries ``>= n_dofs`` are treated as
        invalid (dropped) — the unstructured patch tables use ``n_dofs`` as
        their pad target.
    n_dofs : int
        Size of the output vector.
    """

    def __init__(self, idx: np.ndarray, n_dofs: int):
        flat = np.asarray(idx).reshape(-1)
        S = flat.shape[0]
        self.n_slots = S
        self.n_dofs = int(n_dofs)

        valid = flat < n_dofs
        targets = flat[valid]
        slots = np.nonzero(valid)[0]
        order = np.argsort(targets, kind="stable")
        t_sorted = targets[order]
        s_sorted = slots[order]
        counts = np.bincount(t_sorted, minlength=n_dofs)
        K = int(counts.max()) if counts.size else 1
        starts = np.zeros(n_dofs + 1, np.int64)
        np.cumsum(counts, out=starts[1:])

        # rank dofs by contribution count (descending, stable) so that the
        # k-th column's non-pad entries form a contiguous prefix
        rank_order = np.argsort(-counts, kind="stable")  # dof of each rank
        self._rank_of_dof = np.empty(n_dofs, np.int64)
        self._rank_of_dof[rank_order] = np.arange(n_dofs)

        tab = np.full((n_dofs, K), S, dtype=np.int64)
        k_of = np.arange(t_sorted.shape[0]) - starts[t_sorted]
        tab[t_sorted, k_of] = s_sorted
        tab = tab[rank_order]  # row r = rank-r dof's sources

        counts_ranked = counts[rank_order]
        # prefix length for column k: number of dofs with count > k
        self.col_len = [int((counts_ranked > k).sum()) for k in range(K)]
        self.K = K

        self.tab_cols = [jnp.asarray(tab[: self.col_len[k], k],
                                     jnp.int32) for k in range(K)]
        self.unrank = jnp.asarray(rank_order, jnp.int32)  # rank -> dof
        self.rank = jnp.asarray(self._rank_of_dof, jnp.int32)  # dof -> rank

    def apply(self, v, dtype=None):
        """sum-scatter the flat source values ``v`` (shape (n_slots,) after
        reshape) into a dense (n_dofs,) vector."""
        v = v.reshape(-1)
        if dtype is not None:
            v = v.astype(dtype)
        vpad = jnp.concatenate([v, jnp.zeros((1,), v.dtype)])
        out = vpad[self.tab_cols[0]]
        # out currently holds column 0 over ALL ranks (col_len[0] == n_dofs
        # for tables where every dof has >= 1 contributor; shorter otherwise)
        if self.col_len[0] < self.n_dofs:
            out = jnp.concatenate(
                [out, jnp.zeros(self.n_dofs - self.col_len[0], v.dtype)])
        for k in range(1, self.K):
            nk = self.col_len[k]
            add = vpad[self.tab_cols[k]]
            out = out.at[:nk].set(out[:nk] + add) if nk < self.n_dofs \
                else out + add
        return out[self.rank]

    # `out.at[:nk].set` above is a static-slice update (not a scatter): XLA
    # lowers it to a concatenate of the updated prefix and untouched tail.
