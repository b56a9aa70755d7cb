"""On-device average-linkage clustering (jnp, jit/vmap-able).

The TPU counterpart of ops/hclust.py (the exact NN-chain host port): a dense
O(n^3) matrix formulation of average linkage that runs under jit on padded
(n, n) distance matrices and batches over regions with vmap. Each step picks
the global minimum pair (i < j, lowest-index tie-break), records the merge,
and folds cluster j into i with size-weighted averaging.

For distance matrices without ties this produces the same dendrogram heights
and partitions as the host NN-chain (global-min merge order is a valid
NN-chain order); with exact ties the chain order may differ, which is why
the bit-parity pipelines keep the host implementation (see PARITY.md).
Results are returned in R convention (singletons -(i+1), clusters 1..n-1)
so host cutree_k / cutree_cdist apply directly.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

_INF = jnp.float32(3.0e38)


@functools.partial(jax.jit, static_argnames=("n_pad",))
def average_linkage_device(sq: jnp.ndarray, n: jnp.ndarray,
                           n_pad: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """sq: (n_pad, n_pad) symmetric distances (diagonal ignored), n: actual
    count. Returns (merge_pairs (n_pad-1, 2) int32 cluster-slot ids,
    heights (n_pad-1,) f32); steps beyond n-1 are (-1,-1)/inf."""
    D = jnp.where(jnp.eye(n_pad, dtype=bool), _INF, sq.astype(jnp.float32))
    iu = jnp.triu_indices(n_pad, 1)
    sizes = jnp.where(jnp.arange(n_pad) < n, 1.0, 0.0).astype(jnp.float32)
    active = jnp.arange(n_pad) < n

    def step(state, k):
        D, sizes, active = state
        valid = active[:, None] & active[None, :]
        Dm = jnp.where(valid, D, _INF)
        Dm = jnp.where(jnp.eye(n_pad, dtype=bool), _INF, Dm)
        # upper triangle only so (i < j); argmin flat index tie-breaks to the
        # lowest (i, j) in row-major order
        triu_mask = jnp.triu(jnp.ones((n_pad, n_pad), dtype=bool), 1)
        Dt = jnp.where(triu_mask, Dm, _INF)
        flat = jnp.argmin(Dt)
        i = flat // n_pad
        j = flat % n_pad
        h = Dt.reshape(-1)[flat]
        do = k < (n - 1)
        si = sizes[i]
        sj = sizes[j]
        # fold j into i with size-weighted average
        new_row = (si * D[i, :] + sj * D[j, :]) / jnp.maximum(si + sj, 1.0)
        D2 = D.at[i, :].set(new_row).at[:, i].set(new_row)
        D2 = D2.at[i, i].set(_INF)
        sizes2 = sizes.at[i].set(si + sj).at[j].set(0.0)
        active2 = active.at[j].set(False)
        D = jnp.where(do, D2, D)
        sizes = jnp.where(do, sizes2, sizes)
        active = jnp.where(do, active2, active)
        rec = jnp.where(do, jnp.array([i, j], dtype=jnp.int32),
                        jnp.array([-1, -1], dtype=jnp.int32))
        hh = jnp.where(do, h, _INF)
        return (D, sizes, active), (rec, hh)

    (_, _, _), (recs, hs) = jax.lax.scan(
        step, (D, sizes, active), jnp.arange(n_pad - 1))
    return recs, hs


def to_r_convention(recs: np.ndarray, hs: np.ndarray, n: int
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Convert slot-id merges to R merge/height arrays (host post-process).

    The device algorithm merges in nondecreasing height order, so no sort is
    needed; slot ids map to cluster ids via a running table."""
    merge = np.zeros((n - 1, 2), dtype=np.int64)
    height = np.zeros(n - 1, dtype=np.float64)
    cluster_of_slot = {i: -(i + 1) for i in range(len(recs) + 1)}
    for k in range(n - 1):
        i, j = int(recs[k][0]), int(recs[k][1])
        a = cluster_of_slot[i]
        b = cluster_of_slot[j]
        lo, hi = (a, b) if a < b else (b, a)
        # R convention orders (node1, node2) by the generate_R_dendrogram
        # rule: numerically ascending after sign mapping
        merge[k, 0] = lo
        merge[k, 1] = hi
        height[k] = float(hs[k])
        cluster_of_slot[i] = k + 1
    return merge, height


def hclust_average_device(condensed: np.ndarray, n: int,
                          n_pad: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Drop-in (merge, height) like ops.hclust.hclust_average, computed on
    the default JAX device."""
    if n < 2:
        return np.zeros((0, 2), dtype=np.int64), np.zeros(0)
    if n_pad <= 0:
        n_pad = max(8, 1 << (n - 1).bit_length())
    sq = np.zeros((n_pad, n_pad), dtype=np.float32)
    iu = np.triu_indices(n, 1)
    sq[iu] = condensed
    sq += sq.T
    recs, hs = average_linkage_device(jnp.asarray(sq), jnp.int32(n), n_pad)
    return to_r_convention(np.asarray(recs), np.asarray(hs), n)
