"""Batched on-device PPOA heaviest-path DP.

The reference's consensus DP (src/anppoa.hpp:254-344) walks each allele's
DAG one node at a time on the CPU. TPU-native design: the graph *build*
(inherently sequential, cigar-driven — anppoa.hpp:112-241) stays on host,
but the heaviest-path DP of MANY alleles runs as one jnp dispatch:

  * every graph's edges live in padded (B, E) arrays (src, sink, w), edge
    ids numbered in the oracle's incoming-list build order (ascending src,
    then out-list position — ops/poa.py::Ppoa.consensus builds ``incoming``
    in exactly that order);
  * heaviest values converge by max-plus relaxation: depth(G) synchronized
    sweeps, each relaxing ALL edges of ALL graphs in parallel (gather +
    per-sink scatter-max) — the level-synchronous equivalent of the
    topological walk. Source nodes pin 0, so after max-depth sweeps every
    node holds the true heaviest full-path weight (negative pruned weights
    included: every backward walk reaches a pinned source within depth
    steps);
  * float32 path arithmetic and the oracle's tie rules are preserved
    exactly: candidate = f32(h[src] + w) like set_heaviest (anppoa.hpp:
    258-277; ops/poa.py:239); among equal candidates the FIRST incoming
    edge wins (scatter-min of edge ids over the argmax set); the best
    ending node is the smallest node id among maxima (anppoa.hpp:356-367
    iterates ascending).

Backtracking (O(path length), sequential) and node-string concat stay on
host; one fused device block per (E, N, iters) bucket crosses D2H.

Status: RETIRED as a production path (docs/design.md §5, BENCH_r03
12.0 vs native 3123.9 consensus/s — DAG depth forces ~2k sequential
device steps while the graph build, which no device DP touches,
dominates consensus wall). Kept as a parity/experimental artifact;
OTTER_TPU_POA_DEVICE=1 still routes consensus_apply_batched through it
for the byte-identity tests.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .poa import Ppoa

_NEG_INF = np.float32(-np.inf)


def graph_arrays(poa: Ppoa):
    """Flatten a built (weight-adjusted) Ppoa into DP arrays.

    Returns (src, sink, w, has_in, ending, depth) where depth is the
    number of relaxation sweeps needed (longest path length), or None when
    the graph has no edges (degenerate: caller falls back to the oracle).
    """
    n = len(poa.nodes)
    src: List[int] = []
    sink: List[int] = []
    w: List[np.float32] = []
    for s in range(n):
        for t, wt in poa.edges[s]:
            src.append(s)
            sink.append(t)
            w.append(np.float32(wt))
    if not src:
        return None
    src_a = np.asarray(src, dtype=np.int32)
    sink_a = np.asarray(sink, dtype=np.int32)
    has_in = np.zeros(n, dtype=bool)
    has_in[sink_a] = True
    # longest-path depth via Kahn levels
    indeg = np.zeros(n, dtype=np.int64)
    np.add.at(indeg, sink_a, 1)
    depth = np.zeros(n, dtype=np.int64)
    from collections import deque

    out_edges: List[List[int]] = [[] for _ in range(n)]
    for e in range(len(src)):
        out_edges[src[e]].append(e)
    queue = deque(int(v) for v in np.nonzero(indeg == 0)[0])
    drained = 0
    while queue:
        u = queue.popleft()
        drained += 1
        for e in out_edges[u]:
            v = sink[e]
            if depth[u] + 1 > depth[v]:
                depth[v] = depth[u] + 1
            indeg[v] -= 1
            if indeg[v] == 0:
                queue.append(v)
    if drained < n:
        return None  # cycle (invalid cigars): oracle's bail-out path
    ending = np.zeros(n, dtype=bool)
    for v in poa.ending_nodes:
        if v < n:
            ending[v] = True
    return (src_a, sink_a, np.asarray(w, dtype=np.float32), has_in, ending,
            int(depth.max()))


@functools.partial(jax.jit, static_argnames=("n_iters", "n_pad"))
def _heaviest_step(src, sink, w, has_in, n_iters: int, n_pad: int):
    """(B, E) padded edge arrays -> (h, min_eid): per-node heaviest f32
    path weights and the smallest edge id achieving them (tie rule).
    Padding edges carry w = -inf so they never win a scatter-max."""
    B, E = src.shape
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    flat_sink = (rows * n_pad + sink).reshape(-1)
    h = jnp.zeros((B, n_pad), dtype=jnp.float32)

    def body(t, h):
        cand = jnp.take_along_axis(h, src, axis=1) + w  # (B, E) f32
        relaxed = jnp.full((B * n_pad,), _NEG_INF, dtype=jnp.float32) \
            .at[flat_sink].max(cand.reshape(-1)).reshape(B, n_pad)
        return jnp.where(has_in, relaxed, 0.0)

    h = jax.lax.fori_loop(0, n_iters, body, h)
    # tie pass: smallest edge id whose candidate equals the final value
    cand = jnp.take_along_axis(h, src, axis=1) + w
    hit = cand == jnp.take_along_axis(h, sink, axis=1)
    eid = jnp.broadcast_to(jnp.arange(E, dtype=jnp.int32)[None, :], (B, E))
    big = jnp.int32(E)
    min_eid = jnp.full((B * n_pad,), big, dtype=jnp.int32) \
        .at[flat_sink].min(jnp.where(hit, eid, big).reshape(-1)) \
        .reshape(B, n_pad)
    return h, min_eid


def poa_consensus_device_batch(poas: List[Ppoa], mesh=None) -> List[str]:
    """Consensus strings for a batch of BUILT, weight-adjusted Ppoa graphs
    with the heaviest-path DP executed on device (bucketed by padded
    (edges, nodes, sweeps) so compile shapes stay few; one dispatch and one
    D2H materialization per bucket). ``mesh``: optional jax.sharding.Mesh —
    the graph axis shards over it (allele-level data parallelism)."""
    out: List[Optional[str]] = [None] * len(poas)
    flat: List[Tuple[int, tuple]] = []
    for i, poa in enumerate(poas):
        arrs = graph_arrays(poa)
        if arrs is None:
            out[i] = poa.consensus()  # degenerate single-node graph
        else:
            flat.append((i, arrs))
    buckets: dict = {}
    for i, (src, sink, w, has_in, ending, depth) in flat:
        Ep = 8
        while Ep < len(src):
            Ep *= 2
        Np = 8
        while Np < len(has_in):
            Np *= 2
        Ip = 1
        while Ip < depth:
            Ip *= 2
        buckets.setdefault((Ep, Np, Ip), []).append(
            (i, src, sink, w, has_in, ending, depth))
    for (Ep, Np, Ip), items in sorted(buckets.items()):
        B = len(items)
        nd = 1
        if mesh is not None:
            nd = mesh.devices.size
        Bp = ((B + nd - 1) // nd) * nd
        src = np.zeros((Bp, Ep), dtype=np.int32)
        sink = np.zeros((Bp, Ep), dtype=np.int32)
        w = np.full((Bp, Ep), _NEG_INF, dtype=np.float32)
        has_in = np.zeros((Bp, Np), dtype=bool)
        for b, (_i, s, t, ww, hi, _e, _d) in enumerate(items):
            src[b, : len(s)] = s
            sink[b, : len(t)] = t
            w[b, : len(ww)] = ww
            has_in[b, : len(hi)] = hi
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            sh = NamedSharding(mesh, P(axis, None))
            args = [jax.device_put(jnp.asarray(x), sh)
                    for x in (src, sink, w, has_in)]
            with mesh:
                h_d, me_d = _heaviest_step(*args, n_iters=Ip, n_pad=Np)
        else:
            h_d, me_d = _heaviest_step(jnp.asarray(src), jnp.asarray(sink),
                                       jnp.asarray(w), jnp.asarray(has_in),
                                       n_iters=Ip, n_pad=Np)
        # one D2H materialization per bucket
        hm = np.asarray(jnp.concatenate(
            [h_d, me_d.astype(jnp.float32)], axis=1))
        h = hm[:, :Np]
        min_eid = hm[:, Np:].astype(np.int64)
        for b, (i, s, t, ww, hi, ending, _d) in enumerate(items):
            n = len(hi)
            hv = h[b, :n]
            # best ending node: strict > over ascending node ids
            # (anppoa.hpp:356-367); no ending nodes -> node 0
            h_node = 0
            if ending.any():
                ev = np.where(ending, hv, -np.inf)
                best = ev.max()
                h_node = int(np.nonzero(ev == best)[0][0])
            # backtrack via first-incoming-edge-achieving-max pointers
            path = []
            node = h_node
            E_real = len(s)
            while node != -1:
                path.append(node)
                if not hi[node]:
                    node = -1
                else:
                    e = int(min_eid[b, node])
                    node = int(s[e]) if e < E_real else -1
            path.reverse()
            out[i] = "".join(poas[i].nodes[p] for p in path)
    return out
