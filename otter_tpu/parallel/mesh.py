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
    """Per-process device mesh. LOCAL devices only: in the multi-process
    topology (N processes over DCN, each driving its own chips over ICI)
    every process shards its own region block across its own chips —
    jax.devices() would hand process 1 a mesh of process 0's
    non-addressable devices."""
    devs = jax.local_devices()
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


@functools.partial(jax.jit, static_argnames=("n_pad",))
def kde_tree_step(vals: jnp.ndarray, nvals: jnp.ndarray, bw: jnp.ndarray,
                  xs: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    """Per-region KDE densities with a DETERMINISTIC binary-tree pair
    reduction: error vs float64 is bounded by ~(log2(n_pad)+2)*eps32 per
    cell plus the f32 exp term error, independent of XLA reduction order
    and of the mesh size (regions shard, pairs never split across chips).
    The host certifies every downstream decision margin against this bound
    (ops/kde.py::kde_decision_certified) and recomputes uncertain regions
    in float64, so clustering output is byte-identical to the host oracle.

    vals:(R, n_pad) padded pairwise distances; nvals:(R,) real counts;
    bw:(R,) bandwidths; xs:(grid_pts,) f32 cast of the reference's f64
    accumulated grid -> (R, grid_pts) normalized f32 densities."""
    h = bw[:, None, None]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_pad), 2)
    mask = lane < nvals[:, None, None]
    z = (xs[None, :, None] - vals[:, None, :]) / h
    kern = (_INV_SQRT_2PI / h) * jnp.exp(-(z * z) / 2.0)
    kern = jnp.where(mask, kern, 0.0)
    w = n_pad
    while w > 1:
        kern = kern[..., : w // 2] + kern[..., w // 2 : w]
        w //= 2
    dens = kern[..., 0] / (bw[:, None] * nvals[:, None].astype(jnp.float32))
    total = jnp.sum(dens, axis=1, keepdims=True)
    return dens / jnp.maximum(total, 1e-30)


@functools.partial(jax.jit, static_argnames=("n_pad",))
def kde_tree_step_scaled(vals: jnp.ndarray, nvals: jnp.ndarray,
                         bw: jnp.ndarray, xs: jnp.ndarray, n_pad: int
                         ) -> tuple:
    """Scaled (log-sum-exp) variant of kde_tree_step: per grid cell returns
    (max_exponent m, mantissa_sum s) with density = C * exp(m) * s, so the
    HOST can reconstruct float64 densities that never underflow before the
    float64 oracle does (f32 exp underflows at |z|~13σ; the oracle's f64
    exp at ~38σ — the dead zone between well-separated distance clusters
    lives exactly in that gap and used to force a full f64 fallback).
    Certified by ops/kde.py::kde_decision_certified_scaled; normalization
    constants cancel in the reconstruction so only (m, s) cross D2H."""
    h = bw[:, None, None]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_pad), 2)
    mask = lane < nvals[:, None, None]
    z = (xs[None, :, None] - vals[:, None, :]) / h
    e = -(z * z) / 2.0
    e = jnp.where(mask, e, -jnp.inf)
    m = jnp.max(e, axis=2)  # (R, G); finite: nvals >= 1
    t = jnp.exp(e - m[:, :, None])
    t = jnp.where(mask, t, 0.0)
    w = n_pad
    while w > 1:
        t = t[..., : w // 2] + t[..., w // 2 : w]
        w //= 2
    return m, t[..., 0]


@functools.partial(jax.jit, static_argnames=("n_pad", "n_rows"))
def kde_fused_from_pairs(flat, mlen, rid_m, slot_m, ex_row, ex_slot, ex_val,
                         nvals, bw, xs, n_pad: int, n_rows: int):
    """Scaled per-region KDE computed DIRECTLY from device-resident pair
    distances (the fused tail of a distances_async collect): normalizes the
    Myers-kernel outputs (f32 divide by the pair's longer length), scatters
    them into the (n_rows+1, n_pad) per-region value grid (last row is a
    dump target for excluded/padding pairs), folds in the host-known
    exceptional entries (haplotag-region values, shortcut pairs), and runs
    kde_tree_step_scaled — so distances and KDE cross D2H as ONE flat f32
    materialization and the per-batch KDE dispatch round trip disappears.

    flat:(P,) int32 resolved distances; mlen/rid_m/slot_m:(P,) f32/i32
    per-pair longer length, KDE row, slot; ex_*:(E,) host-known scatter
    triplets; nvals/bw:(n_rows,). Returns (P + 2*n_rows*G,) f32:
    [distances, m.ravel(), s.ravel()]."""
    f = flat.astype(jnp.float32)
    norm = f / mlen
    vals = jnp.zeros((n_rows + 1, n_pad), dtype=jnp.float32)
    vals = vals.at[ex_row, ex_slot].set(ex_val)
    vals = vals.at[rid_m, slot_m].set(norm)
    m, s = kde_tree_step_scaled(vals[:-1], nvals, bw, xs, n_pad)
    return jnp.concatenate([f, m.reshape(-1), s.reshape(-1)])


def pooled_kde_scaled(value_lists, bandwidths,
                      dinterval: float = 0.0025) -> list:
    """Scaled tree-reduction device KDE over many regions, bucketed by
    padded pair count (few compile shapes), region axis sharded over the
    attached mesh. ONE host materialization for the whole dispatch.
    Returns per-region (m, s) float32 array pairs."""
    from ..ops.kde import kde_grid

    xs32 = kde_grid(dinterval).astype(np.float32)
    G = len(xs32)
    out = [None] * len(value_lists)
    buckets: dict = {}
    for i, v in enumerate(value_lists):
        n_pad = 8
        while n_pad < len(v):
            n_pad *= 2
        buckets.setdefault(n_pad, []).append(i)
    devs = jax.devices()
    chunks = []  # device (Rp, 2G) blocks, one per bucket
    spans = []   # (idxs, Rp)
    for n_pad, idxs in sorted(buckets.items()):
        R = len(idxs)
        Rp = ((R + len(devs) - 1) // len(devs)) * len(devs)
        V = np.zeros((Rp, n_pad), dtype=np.float32)
        nv = np.ones(Rp, dtype=np.int32)
        bwv = np.full(Rp, 0.01, dtype=np.float32)
        for r, i in enumerate(idxs):
            v = np.asarray(value_lists[i], dtype=np.float32)
            V[r, : len(v)] = v
            nv[r] = len(v)
            bwv[r] = bandwidths[i]
        if len(devs) > 1:
            mesh = make_mesh()
            V_s, nv_s, bw_s = shard_pair_batch(mesh, [V, nv, bwv])
            xs_d = jax.device_put(jnp.asarray(xs32), NamedSharding(mesh, P()))
            with mesh:
                m, s = kde_tree_step_scaled(V_s, nv_s, bw_s, xs_d, n_pad)
        else:
            m, s = kde_tree_step_scaled(jnp.asarray(V), jnp.asarray(nv),
                                        jnp.asarray(bwv), jnp.asarray(xs32),
                                        n_pad)
        chunks.append(jnp.concatenate([m, s], axis=1))
        spans.append((idxs, Rp))
    # ONE host materialization for every bucket: the device->host sync has
    # high fixed latency on tunneled TPUs, so never materialize per bucket
    flat = np.asarray(chunks[0] if len(chunks) == 1
                      else jnp.concatenate(chunks, axis=0))
    row = 0
    for idxs, Rp in spans:
        block = flat[row : row + Rp]
        row += Rp
        for r, i in enumerate(idxs):
            out[i] = (block[r, :G], block[r, G:])
    return out


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
