"""Device mesh + sharded region-batch execution.

The reference's only parallelism is a single-node thread pool over regions
(BS_thread_pool, src/assemble.cpp:43); the TPU-native replacement shards the
*pair batch* (the O(n^2) distance work of many regions at once) across a
``jax.sharding.Mesh`` and lets XLA insert the collectives:

  * axis "dp": pair-blocks data-parallel across chips (ICI);
  * per-region reductions (KDE density sums over a region's pairs) become
    segment-sums whose cross-shard combination XLA lowers to psum.

Multi-host: each host feeds its own region shard
(jax.make_array_from_process_local_data) and host 0 gathers allele/VCF rows;
see models/assemble.py for the host-side orchestration.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels.edit_pallas import edit_banded_jnp

_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * 3.14159265358979323846)


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


@functools.partial(jax.jit,
                   static_argnames=("k", "max_rows", "n_regions", "grid_pts"))
def region_batch_step(a: jnp.ndarray, bpad: jnp.ndarray, m: jnp.ndarray,
                      n: jnp.ndarray, region_id: jnp.ndarray,
                      pair_valid: jnp.ndarray, bandwidth: jnp.ndarray,
                      k: int, max_rows: int, n_regions: int,
                      grid_pts: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One sharded 'forward step' of the assemble pipeline math.

    Computes exact banded edit distances for a cross-region pair batch, then
    per-region KDE densities over the [0,1] distance grid — the two
    device-side stages feeding clustering. Inputs are sharded on the pair
    axis; the segment-sum over regions induces the cross-chip psum.

    a:(B,L) bpad:(B,L+W+2) m,n:(B,) region_id:(B,) pair_valid:(B,)
    bandwidth:(n_regions,) -> (dists:(B,), densities:(n_regions, grid_pts))
    """
    dists = edit_banded_jnp(a, bpad, m, n, k, max_rows)
    largest = jnp.maximum(m, n).astype(jnp.float32)
    norm = jnp.where(pair_valid, dists.astype(jnp.float32) /
                     jnp.maximum(largest, 1.0), 0.0)
    xs = jnp.linspace(0.0, 1.0, grid_pts, dtype=jnp.float32)
    h = bandwidth[region_id][:, None]
    z = (xs[None, :] - norm[:, None]) / h
    kern = (_INV_SQRT_2PI / h) * jnp.exp(-(z * z) / 2.0)
    kern = jnp.where(pair_valid[:, None], kern, 0.0)
    dens = jax.ops.segment_sum(kern, region_id, num_segments=n_regions)
    counts = jax.ops.segment_sum(pair_valid.astype(jnp.float32), region_id,
                                 num_segments=n_regions)
    dens = dens / jnp.maximum(counts, 1.0)[:, None]
    total = jnp.sum(dens, axis=1, keepdims=True)
    dens = dens / jnp.maximum(total, 1e-30)
    return dists, dens


@functools.partial(jax.jit, static_argnames=("n_regions", "grid_pts"))
def kde_batch_step(norm: jnp.ndarray, region_id: jnp.ndarray,
                   pair_valid: jnp.ndarray, bandwidth: jnp.ndarray,
                   n_regions: int, grid_pts: int) -> jnp.ndarray:
    """Per-region KDE densities from a pooled, pre-normalized distance batch
    (the KDE tail of region_batch_step; distances come from the exact Myers
    engine). Pair axis shardable over the dp mesh — the segment-sum becomes
    a psum across chips. float32 (device) vs the host oracle's float64: an
    opt-in fast path (OTTER_TPU_MESH_KDE=1), see PARITY.md divergences."""
    xs = jnp.linspace(0.0, 1.0, grid_pts, dtype=jnp.float32)
    h = bandwidth[region_id][:, None]
    z = (xs[None, :] - norm[:, None]) / h
    kern = (_INV_SQRT_2PI / h) * jnp.exp(-(z * z) / 2.0)
    kern = jnp.where(pair_valid[:, None], kern, 0.0)
    dens = jax.ops.segment_sum(kern, region_id, num_segments=n_regions)
    counts = jax.ops.segment_sum(pair_valid.astype(jnp.float32), region_id,
                                 num_segments=n_regions)
    dens = dens / jnp.maximum(counts, 1.0)[:, None]
    total = jnp.sum(dens, axis=1, keepdims=True)
    return dens / jnp.maximum(total, 1e-30)


def pooled_kde_densities(norm: np.ndarray, region_id: np.ndarray,
                         bandwidth: np.ndarray, n_regions: int,
                         grid_pts: int = 401) -> np.ndarray:
    """Run kde_batch_step over all available devices (mesh of 1 on a single
    chip; dp-sharded when more are attached). Pads the pair axis to the
    device count. Returns (n_regions, grid_pts) float32 densities."""
    devs = jax.devices()
    B = len(norm)
    Bp = ((B + len(devs) - 1) // len(devs)) * len(devs)
    npad = np.zeros(Bp, dtype=np.float32)
    npad[:B] = norm
    rid = np.zeros(Bp, dtype=np.int32)
    rid[:B] = region_id
    pv = np.zeros(Bp, dtype=bool)
    pv[:B] = True
    if len(devs) > 1:
        mesh = make_mesh()
        n_s, rid_s, pv_s = shard_pair_batch(mesh, [npad, rid, pv])
        bw = jax.device_put(jnp.asarray(bandwidth, jnp.float32),
                            NamedSharding(mesh, P()))
        with mesh:
            dens = kde_batch_step(n_s, rid_s, pv_s, bw, n_regions, grid_pts)
    else:
        dens = kde_batch_step(jnp.asarray(npad), jnp.asarray(rid),
                              jnp.asarray(pv),
                              jnp.asarray(bandwidth, jnp.float32),
                              n_regions, grid_pts)
    return np.asarray(dens)


def shard_pair_batch(mesh: Mesh, arrays, axis: str = "dp"):
    """Place pair-batch arrays with the batch dim sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    out = []
    for arr in arrays:
        spec = P(axis) if arr.ndim == 1 else P(axis, None)
        out.append(jax.device_put(jnp.asarray(arr), NamedSharding(mesh, spec)))
    return out


def run_sharded_region_step(mesh: Mesh, a, bpad, m, n, region_id, pair_valid,
                            bandwidth, k: int, max_rows: int, n_regions: int,
                            grid_pts: int = 401):
    """Shard inputs over the mesh and run one region-batch step; outputs are
    replicated (densities) / pair-sharded (distances)."""
    a_s, bpad_s = shard_pair_batch(mesh, [a, bpad])
    m_s, n_s, rid_s, pv_s = shard_pair_batch(mesh, [m, n, region_id, pair_valid])
    bw = jax.device_put(jnp.asarray(bandwidth),
                        NamedSharding(mesh, jax.sharding.PartitionSpec()))
    with mesh:
        return region_batch_step(a_s, bpad_s, m_s, n_s, rid_s, pv_s, bw,
                                 k, max_rows, n_regions, grid_pts)
