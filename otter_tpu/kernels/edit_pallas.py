"""Batched banded edit-distance DP — the TPU replacement for WFA2-lib.

The reference computes pairwise distances one WFA alignment at a time per
thread (src/analignments.cpp:117-124, WFA2 submodule). TPU-native design:

  * Ukkonen band: any alignment with cost <= k stays within diagonals
    |j - i| <= k, so a band of W = 2k+2 diagonals suffices; if the banded
    result is <= k it equals the exact Levenshtein distance, and the host
    retries unresolved pairs with doubled k — the TPU analog of WFA's O(ds)
    adaptivity.
  * Per DP row the three-way recurrence has an in-row horizontal dependency
    (D[i][j-1] + 1); it is resolved in O(log W) vector steps with a
    Hillis-Steele prefix-min over (v[w] - w), keeping each row update a
    dense VPU op.
  * Pairs are batched on the sublane axis, the band lives on the lane axis
    (W a multiple of 128), and the per-row text window is kept in registers
    and shifted by one lane per row (single-column load per row, no wide
    unaligned slices).

Band coordinates: w in [0, W) maps to diagonal c = w - (k+1), cell
(i, j=i+c). Row i consumes text chars b[j-1] = bpad[i-1+w] where bpad has
k+1 left sentinels. Final distance sits at w = n - m + k + 1.

Both a Pallas kernel and a pure-jnp `lax.scan` fallback (used on CPU meshes
and as a cross-check) implement the same recurrence.
"""

from __future__ import annotations

import functools
import os
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1 << 24  # plain int so Pallas kernels don't capture a traced constant

TILE_B = 32  # default pairs per program instance (sublane dimension)


def _encode(s: str) -> np.ndarray:
    """Identity byte codes — the reference compares raw chars ('N'=='N'
    matches), so every byte is its own code. Sequences are ASCII so they fit
    the int32 lane layout the kernel uses (int8 layouts hit Mosaic
    limitations with our slicing pattern); padding bytes are 0, which is
    harmless because every padded cell is masked by the j/m bounds before it
    can influence a real cell."""
    return np.frombuffer(s.encode("latin-1"), dtype=np.uint8).astype(np.int32)


def _prefix_min_scan(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix-min along the last axis (Hillis-Steele, log W steps)."""
    w = x.shape[-1]
    shift = 1
    while shift < w:
        shifted = jnp.concatenate(
            [jnp.full(x.shape[:-1] + (shift,), INF, dtype=x.dtype),
             x[..., :-shift]], axis=-1)
        x = jnp.minimum(x, shifted)
        shift *= 2
    return x


def _row_update(prev, i, a_col, b_window, m2, n2, k, w_idx):
    """One DP row update shared by the jnp and Pallas implementations.

    Out-of-range lanes are forced to INF *before* the prefix scan; lanes
    right of the valid range can receive finite values from the scan, but
    they can never flow back into valid lanes (a lane's j only grows with
    i), so no post-scan re-mask is needed.
    """
    j = i + w_idx - (k + 1)  # (1, W) broadcast over rows
    sub = jnp.where(b_window == a_col, 0, 1).astype(jnp.int32)
    up = jnp.concatenate(
        [prev[:, 1:], jnp.full_like(prev[:, :1], INF)], axis=1) + 1
    diag = prev + sub
    v = jnp.minimum(up, diag)
    v = jnp.where(j == 0, i, v)          # left boundary D[i][0] = i
    invalid = (j < 0) | (j > n2)
    v = jnp.where(invalid, INF, v)
    cur = _prefix_min_scan(v - w_idx) + w_idx
    keep = i <= m2                        # pass-through beyond pattern end
    return jnp.where(keep, cur, prev)


def _final_extract(prev, m2, n2, k, w_idx):
    target = n2 - m2 + (k + 1)
    hit = jnp.where(w_idx == target, prev, INF)
    res = jnp.min(hit, axis=1)
    valid = jnp.abs(n2 - m2)[:, 0] <= k
    return jnp.where(valid, res, INF)


# ---------------------------------------------------------------------------
# jnp fallback (runs anywhere; also the reference for kernel tests)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "max_rows"))
def edit_banded_jnp(a: jnp.ndarray, bpad: jnp.ndarray, m: jnp.ndarray,
                    n: jnp.ndarray, k: int, max_rows: int) -> jnp.ndarray:
    """Banded edit distance for a batch. a:(B,L) int32, bpad:(B,L+W+2) int32,
    m,n:(B,) int32. Returns (B,) int32 (INF where the band was too narrow)."""
    W = 2 * (k + 1)
    B = a.shape[0]
    w_idx = jnp.arange(W, dtype=jnp.int32)[None, :]
    m2 = m[:, None].astype(jnp.int32)
    n2 = n[:, None].astype(jnp.int32)
    j0 = w_idx - (k + 1)
    prev0 = jnp.where((j0 >= 0) & (j0 <= n2), j0, INF).astype(jnp.int32)
    prev0 = jnp.broadcast_to(prev0, (B, W)).astype(jnp.int32)

    def body(i, prev):
        a_col = jax.lax.dynamic_slice_in_dim(a, i - 1, 1, axis=1)
        b_window = jax.lax.dynamic_slice_in_dim(bpad, i - 1, W, axis=1)
        return _row_update(prev, i, a_col, b_window, m2, n2, k, w_idx)

    prev = jax.lax.fori_loop(1, max_rows + 1, body, prev0)
    return _final_extract(prev, m2, n2, k, w_idx)


@functools.partial(jax.jit, static_argnames=("k", "max_rows"))
def edit_banded_ends_free_jnp(ax: jnp.ndarray, bxp: jnp.ndarray,
                              m: jnp.ndarray, n: jnp.ndarray,
                              pb: jnp.ndarray, pe: jnp.ndarray,
                              tb: jnp.ndarray, te: jnp.ndarray,
                              k: int, max_rows: int) -> jnp.ndarray:
    """Banded ends-free edit distance (jnp; shards the pair axis over a mesh
    when dispatched under one). Mirrors the numpy ladder's inner loop in
    ops/align_batch.py::edit_ends_free_batch — boundary D[i][0] =
    max(0, i - pb), row-0 = max(0, j - tb), best tracked over the last
    column for rows with m - i <= pe and the last row for j >= n - te.
    ax: (B, Lp) int32 pattern codes (-2 padding); bxp: (B, k+2+Np+W+2)
    int32 text codes pre-padded with k+2 sentinel (-1) columns on the left.
    Returns (B,) int32 best scores (validity — best <= k - reach — is the
    caller's check, as in the numpy ladder)."""
    W = 2 * (k + 1)
    B = ax.shape[0]
    w_idx = jnp.arange(W, dtype=jnp.int32)[None, :]
    m2 = m[:, None]
    n2 = n[:, None]
    pb2 = pb[:, None]
    tb2 = tb[:, None]
    j0 = w_idx - (k + 1)
    prev = jnp.where((j0 >= 0) & (j0 <= n2),
                     jnp.maximum(0, j0 - tb2), INF).astype(jnp.int32)

    def take(arr, idx):
        return jnp.take_along_axis(
            arr, jnp.clip(idx, 0, W - 1)[:, None], axis=1)[:, 0]

    col0 = n + (k + 1)
    best = jnp.where((pe >= m) & (col0 >= 0) & (col0 < W),
                     take(prev, col0), INF)

    def body(i, state):
        prev, best = state
        a_col = jax.lax.dynamic_slice_in_dim(ax, i - 1, 1, axis=1)
        b_win = jax.lax.dynamic_slice_in_dim(bxp, i, W, axis=1)
        j = i + j0
        sub = jnp.where(b_win == a_col, 0, 1).astype(jnp.int32)
        up = jnp.concatenate(
            [prev[:, 1:], jnp.full_like(prev[:, :1], INF)], axis=1) + 1
        v = jnp.minimum(up, prev + sub)
        v = jnp.where(j == 0, jnp.maximum(0, i - pb2), v)
        v = jnp.where((j < 0) | (j > n2), INF, v)
        cur = _prefix_min_scan(v - w_idx) + w_idx
        cur = jnp.where((j < 0) | (j > n2), INF, cur)
        keep = i <= m2
        prev = jnp.where(keep, cur, prev)
        wcol = n - i + (k + 1)
        active = (i <= m) & (m - i <= pe) & (wcol >= 0) & (wcol < W)
        best = jnp.minimum(best, jnp.where(active, take(cur, wcol), INF))
        return prev, best

    prev, best = jax.lax.fori_loop(1, max_rows + 1, body, (prev, best))
    te2 = te[:, None]
    jmap = m2 + w_idx - (k + 1)
    rowvals = jnp.where((jmap >= jnp.maximum(0, n2 - te2)) & (jmap <= n2),
                        prev, INF)
    return jnp.minimum(best, jnp.min(rowvals, axis=1))


def edit_banded_numpy(a: np.ndarray, bpad: np.ndarray, m: np.ndarray,
                      n: np.ndarray, k: int, max_rows: int) -> np.ndarray:
    """Pure-numpy implementation of the same banded recurrence (no XLA
    compile cost; used for the host/cpu execution mode and as a test oracle
    for the kernels)."""
    W = 2 * (k + 1)
    B = a.shape[0]
    w_idx = np.arange(W, dtype=np.int64)[None, :]
    m2 = m[:, None].astype(np.int64)
    n2 = n[:, None].astype(np.int64)
    j0 = w_idx - (k + 1)
    prev = np.where((j0 >= 0) & (j0 <= n2), j0, INF).astype(np.int64)
    prev = np.broadcast_to(prev, (B, W)).copy()
    for i in range(1, max_rows + 1):
        a_col = a[:, i - 1 : i]
        b_window = bpad[:, i - 1 : i - 1 + W]
        j = i + w_idx - (k + 1)
        sub = (b_window != a_col).astype(np.int64)
        up = np.concatenate(
            [prev[:, 1:], np.full((B, 1), INF, dtype=np.int64)], axis=1) + 1
        v = np.minimum(up, prev + sub)
        v = np.where(j == 0, i, v)
        v = np.where((j < 0) | (j > n2), INF, v)
        cur = np.minimum.accumulate(v - w_idx, axis=1) + w_idx
        cur = np.where((j < 0) | (j > n2), INF, cur)
        keep = i <= m2
        prev = np.where(keep, cur, prev)
    target = n2 - m2 + (k + 1)
    res = np.min(np.where(w_idx == target, prev, INF), axis=1)
    valid = np.abs(n2 - m2)[:, 0] <= k
    return np.where(valid, res, INF)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


def _edit_kernel(a_ref, bpad_ref, mn_ref, out_ref, *, k: int, max_rows: int,
                 tile_b: int):
    W = 2 * (k + 1)
    # SMEM refs only load scalars: gather the per-pair lengths one by one
    m2 = jnp.stack([mn_ref[t, 0] for t in range(tile_b)]).reshape(tile_b, 1)
    n2 = jnp.stack([mn_ref[t, 1] for t in range(tile_b)]).reshape(tile_b, 1)
    w_idx = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    j0 = w_idx - (k + 1)
    prev0 = jnp.where((j0 >= 0) & (j0 <= n2), j0, INF).astype(jnp.int32)
    prev0 = jnp.broadcast_to(prev0, (tile_b, W)).astype(jnp.int32)
    window0 = bpad_ref[:, 0:W]

    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_b, 128), 1)

    def sel(chunk, r):
        """Extract lane r of a (tile_b, 128) chunk as a (tile_b, 1) column."""
        return jnp.sum(jnp.where(lane == r, chunk, 0), axis=1, keepdims=True)

    n_chunks = (max_rows + 127) // 128

    def outer(c, carry):
        prev, window = carry
        base = pl.multiple_of(c * 128, 128)
        a_chunk = a_ref[:, pl.ds(base, 128)]
        # lanes needed for window appends this chunk: bpad[c*128 + W + r]
        b_chunk = bpad_ref[:, pl.ds(base + W, 128)]

        def inner(r, carry2):
            prev, window = carry2
            i = c * 128 + r + 1
            a_col = sel(a_chunk, r)
            prev = _row_update(prev, i, a_col, window, m2, n2, k, w_idx)
            nxt = sel(b_chunk, r)
            window = jnp.concatenate([window[:, 1:], nxt], axis=1)
            return prev, window

        return jax.lax.fori_loop(0, 128, inner, (prev, window))

    prev, _ = jax.lax.fori_loop(0, n_chunks, outer, (prev0, window0))
    res = _final_extract(prev, m2, n2, k, w_idx)
    out_ref[:, :] = jnp.broadcast_to(res[:, None], (tile_b, 128))


def pick_tile_b(L: int, k: int) -> int:
    """Tile so each program advances ~32k band cells per row (good VPU
    occupancy) while the int32 sequence blocks stay within a VMEM budget."""
    W = 2 * (k + 1)
    budget = 8 * 1024 * 1024  # bytes for a + bpad blocks
    tb = max(8, min(256, (32768 // W + 31) // 32 * 32))
    while tb > 8 and tb * 4 * (2 * L + W + 2) > budget:
        tb //= 2
    return max(8, tb)


@functools.partial(jax.jit,
                   static_argnames=("k", "max_rows", "interpret", "tile_b"))
def edit_banded_pallas(a: jnp.ndarray, bpad: jnp.ndarray,
                       mn: jnp.ndarray, k: int, max_rows: int,
                       interpret: bool = False,
                       tile_b: int = TILE_B) -> jnp.ndarray:
    """Pallas-batched banded edit distance.

    a: (B, L) int32, bpad: (B, L + W + 2) int32, mn: (B, 2) int32.
    B must be a multiple of tile_b. Returns (B,) int32.
    """
    B, L = a.shape
    W = 2 * (k + 1)
    grid = (B // tile_b,)
    kernel = functools.partial(_edit_kernel, k=k, max_rows=max_rows,
                               tile_b=tile_b)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, a.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, bpad.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 2), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=B * max_rows * W * 8,
            bytes_accessed=B * 4 * (2 * L + W),
            transcendentals=0),
        interpret=interpret,
    )(a, bpad, mn)
    return out[:, 0]


# ---------------------------------------------------------------------------
# Host orchestration: bucketing + adaptive band doubling
# ---------------------------------------------------------------------------


def _text_bucket(mx_len: int) -> int:
    """Myers text bucket: pow2/8 steps (multiples of 16) instead of bare
    powers of two. Worst-case text occupancy rises from 50% to ~80%
    (e.g. 1025 -> 1280 columns) — the text is over half the H2D bytes AND
    sets the kernel's strip count, so a 1030 bp text pays 1280 columns,
    not 2048. At most 7 extra compile shapes per octave (persistent
    compile cache keeps the one-time cost off the steady path)."""
    P = 128
    while P < mx_len:
        P *= 2
    if P <= 128:
        return P
    step = max(16, P // 8)
    return -(-mx_len // step) * step


_POW2S = np.asarray([128 << s for s in range(16)], dtype=np.int64)


def _pow2_at_least(x: np.ndarray, floor: int) -> np.ndarray:
    """Elementwise smallest power of two >= max(x, floor) (int64)."""
    xs = np.maximum(np.asarray(x, dtype=np.int64), floor)
    return _POW2S[np.searchsorted(_POW2S, xs, side="left")]


def _text_bucket_vec(mx_len: np.ndarray) -> np.ndarray:
    """Vectorized _text_bucket (same values per element)."""
    mx = np.asarray(mx_len, dtype=np.int64)
    P = _POW2S[np.searchsorted(_POW2S, np.maximum(mx, 1), side="left")]
    step = np.maximum(16, P // 8)
    out = -(-mx // step) * step
    return np.where(P <= 128, 128, out)


def _acgt_flags(seqs: List[str]) -> np.ndarray:
    """(S,) bool: sequence is pure ACGT — one vectorized pass over the
    concatenated byte blob (per-UNIQUE-sequence cost, not per pair)."""
    S = len(seqs)
    if S == 0:
        return np.zeros(0, dtype=bool)
    try:
        blob = "".join(seqs).encode("latin-1")
    except UnicodeEncodeError:
        # a char > U+00FF anywhere: per-seq fallback (such sequences are
        # simply non-ACGT; the rest keep their exact flags)
        from .myers import is_acgt

        return np.asarray([is_acgt(s) for s in seqs], dtype=bool)
    codes = np.frombuffer(blob, dtype=np.uint8)
    bad = np.ones(256, dtype=np.uint8)
    for ch in b"ACGT":
        bad[ch] = 0
    flags = bad[codes]
    offs = np.zeros(S + 1, dtype=np.int64)
    np.cumsum([len(s) for s in seqs], out=offs[1:])
    csum = np.zeros(len(flags) + 1, dtype=np.int64)
    np.cumsum(flags, out=csum[1:])
    return (csum[offs[1:]] - csum[offs[:-1]]) == 0


class IndexedPairs:
    """Lazy (x, y) pair container over a unique-sequence pool — the
    indexed engine API's pair view. Supports the subset of the list-of-
    tuples protocol the collect/fallback paths use (len, [] indexing,
    iteration); only pairs that are actually touched materialize."""

    __slots__ = ("seqs", "xi", "yi", "lens")

    def __init__(self, seqs: List[str], xi, yi):
        self.seqs = seqs
        self.xi = np.asarray(xi, dtype=np.int64)
        self.yi = np.asarray(yi, dtype=np.int64)
        self.lens = np.fromiter((len(s) for s in seqs), np.int64,
                                len(seqs))

    def __len__(self) -> int:
        return len(self.xi)

    def __getitem__(self, i):
        return (self.seqs[self.xi[i]], self.seqs[self.yi[i]])

    def __iter__(self):
        seqs = self.seqs
        for a, b in zip(self.xi, self.yi):
            yield (seqs[a], seqs[b])

    def maxlens(self) -> np.ndarray:
        return np.maximum(self.lens[self.xi], self.lens[self.yi])


def _pack_bucket(pairs: List[Tuple[str, str]], k: int,
                 tile_b: int = TILE_B, min_len: int = 1):
    """Pattern = longer string (scan rows), text = shorter (band columns)."""
    pats = [p if len(p) >= len(t) else t for p, t in pairs]
    txts = [t if len(p) >= len(t) else p for p, t in pairs]
    W = 2 * (k + 1)
    L = max(min_len, max(len(p) for p in pats))
    # pad L to the next power-of-two lane multiple so (k, L) shape variety —
    # and therefore kernel compile count — stays bounded
    Lp = 128
    while Lp < L:
        Lp *= 2
    L = Lp
    B = len(pairs)
    # pad B to tile_b * power-of-two so batch shapes come from a small set
    Bp = tile_b
    while Bp < B:
        Bp *= 2
    a = np.zeros((Bp, L), dtype=np.int32)
    bp = np.zeros((Bp, L + W + 2), dtype=np.int32)
    mn = np.zeros((Bp, 2), dtype=np.int32)
    for i, (p, t) in enumerate(zip(pats, txts)):
        pc = _encode(p)
        tc = _encode(t)
        a[i, : len(pc)] = pc
        bp[i, k + 1 : k + 1 + len(tc)] = tc
        mn[i, 0] = len(pc)
        mn[i, 1] = len(tc)
    return a, bp, mn, L


class EditDistanceEngine:
    """Exact batched Levenshtein distances with adaptive banding.

    use_pallas=False runs the jnp fallback (CPU meshes / debugging).
    """

    K_LADDER = (63, 127, 255, 511, 1023, 2047, 4095, 8191, 16383, 32767)

    def __init__(self, use_pallas: bool = True, k_start: int = 63,
                 interpret: bool = False, mode: str | None = None,
                 mesh=None):
        # mode: "pallas" | "jnp" | "numpy" (overrides use_pallas when given)
        if mode is None:
            mode = "pallas" if use_pallas else "jnp"
        self.mode = mode
        self.use_pallas = mode == "pallas"
        if self.use_pallas and not interpret:
            try:  # remote compiles are 20-60 s/shape without the cache
                from ..utils.preflight import ensure_compile_cache

                ensure_compile_cache()
            except Exception:
                pass
        self.interpret = interpret
        self.k_start = k_start
        self.cells = 0  # DP cell-update counter for the bench
        # jax.sharding.Mesh: jnp-mode dispatches shard the pair axis over it
        # (region data-parallelism across chips; SURVEY §2.3). The banded
        # recurrence is batch-elementwise, so XLA partitions the scan with
        # no cross-chip collectives until the host gathers results.
        self.mesh = mesh

    def _run(self, a, bp, mn, k, max_rows) -> np.ndarray:
        if self.mode == "pallas":
            tb = pick_tile_b(a.shape[1], k)
            return np.asarray(edit_banded_pallas(
                jnp.asarray(a), jnp.asarray(bp), jnp.asarray(mn), k, max_rows,
                interpret=self.interpret, tile_b=tb))
        if self.mode == "numpy":
            return edit_banded_numpy(a, bp, mn[:, 0], mn[:, 1], k, max_rows)
        if self.mesh is not None:
            return self._run_jnp_mesh(a, bp, mn, k, max_rows)
        return np.asarray(edit_banded_jnp(
            jnp.asarray(a), jnp.asarray(bp), jnp.asarray(mn[:, 0]),
            jnp.asarray(mn[:, 1]), k, max_rows))

    def _run_jnp_mesh(self, a, bp, mn, k, max_rows) -> np.ndarray:
        """jnp dispatch with the pair axis sharded over self.mesh."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        nd = self.mesh.devices.size
        B = a.shape[0]
        Bp = ((B + nd - 1) // nd) * nd
        if Bp != B:
            a = np.concatenate([a, np.zeros((Bp - B, a.shape[1]), a.dtype)])
            bp = np.concatenate([bp, np.zeros((Bp - B, bp.shape[1]),
                                              bp.dtype)])
            mn = np.concatenate([mn, np.ones((Bp - B, mn.shape[1]),
                                             mn.dtype)])
        axis = self.mesh.axis_names[0]
        sh1 = NamedSharding(self.mesh, P(axis))
        sh2 = NamedSharding(self.mesh, P(axis, None))
        a_s = jax.device_put(jnp.asarray(a), sh2)
        bp_s = jax.device_put(jnp.asarray(bp), sh2)
        m_s = jax.device_put(jnp.asarray(mn[:, 0]), sh1)
        n_s = jax.device_put(jnp.asarray(mn[:, 1]), sh1)
        with self.mesh:
            res = edit_banded_jnp(a_s, bp_s, m_s, n_s, k, max_rows)
        return np.asarray(res)[:B]

    def _ends_free_mesh_runner(self, jobs, members, k: int) -> np.ndarray:
        """banded_runner for edit_ends_free_batch: one fixed-k ends-free
        pass as a pair-sharded jnp dispatch over self.mesh."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..ops.align_batch import _codes

        W = 2 * (k + 1)
        B = len(members)
        nd = self.mesh.devices.size
        Bp = max(nd, ((B + nd - 1) // nd) * nd)
        pats = [_codes(jobs[i][0]).astype(np.int32) for i in members]
        txts = [_codes(jobs[i][1]).astype(np.int32) for i in members]
        Lp = 128
        while Lp < max(len(p) for p in pats):
            Lp *= 2
        Np = 128
        while Np < max(len(t) for t in txts):
            Np *= 2
        ax = np.full((Bp, Lp), -2, dtype=np.int32)
        bxp = np.full((Bp, k + 2 + Np + W + 2), -1, dtype=np.int32)
        m = np.ones(Bp, dtype=np.int32)
        n = np.ones(Bp, dtype=np.int32)
        fr = np.zeros((4, Bp), dtype=np.int32)
        for bi, i in enumerate(members):
            ax[bi, : len(pats[bi])] = pats[bi]
            bxp[bi, k + 2 : k + 2 + len(txts[bi])] = txts[bi]
            m[bi] = len(pats[bi])
            n[bi] = len(txts[bi])
            fr[:, bi] = jobs[i][2:6]
        axis = self.mesh.axis_names[0]
        sh1 = NamedSharding(self.mesh, P(axis))
        sh2 = NamedSharding(self.mesh, P(axis, None))
        arrs1 = [jax.device_put(jnp.asarray(x), sh1)
                 for x in (m, n, fr[0], fr[1], fr[2], fr[3])]
        ax_s = jax.device_put(jnp.asarray(ax), sh2)
        bxp_s = jax.device_put(jnp.asarray(bxp), sh2)
        with self.mesh:
            best = edit_banded_ends_free_jnp(ax_s, bxp_s, *arrs1,
                                             k=k, max_rows=Lp)
        self.cells += B * Lp * W
        return np.asarray(best)[:B].astype(np.int64)

    def _native_distances(self, pairs, todo, out) -> bool:
        """Whole-batch native C++ path (mode == 'native'). Returns True when
        handled."""
        try:
            import os
            from ..native import edit_distance_batch
            sub = [pairs[i] for i in todo]
            threads = min(32, os.cpu_count() or 1)
            dists, cells = edit_distance_batch(sub, threads)
            self.cells += cells
            for bi, idx in enumerate(todo):
                out[idx] = int(dists[bi])
            return True
        except Exception:
            return False

    # Myers routing: ACGT pairs go through the bit-parallel kernels — the
    # base kernel when the shorter side fits 64 words, the striped variant
    # (device-chained carries) for longer patterns; non-ACGT pairs use the
    # banded row kernel.
    MYERS_MAX_WORDS = 64          # base kernel: shorter side <= 2048 bp
    MYERS_TEXT_CAP = 1 << 15      # longer side <= 32 kb (both kernels)

    def _myers_route(self, pairs, todo, out) -> List[int]:
        """Dispatch eligible pairs through the Myers kernel; returns the
        indices that still need the banded path."""
        if self.mode != "pallas":
            return todo
        pending, rest = self._myers_dispatch(pairs, todo, out)
        return rest + self._myers_collect(pending, out)

    def _myers_dispatch(self, pairs, todo, out):
        """Route + dispatch phase: every eligible bucket goes out
        asynchronously (the device/tunnel executes in the background).
        Returns (pending, rest); finish with _myers_collect."""
        from .myers import is_acgt

        # all-vs-all pair sets reuse the same string objects ~n/2 times;
        # memoize the alphabet check per object for this call (a local map
        # cannot go stale across gc/id reuse). The loop is the engine's
        # host hot path at big batches — everything inlined, every
        # per-length computation cached by exact length.
        acgt_memo: dict = {}
        tbucket_memo: dict = {}
        nw_memo: dict = {}
        eligible: dict = {}
        striped: dict = {}
        rest: List[int] = []
        memo_get = acgt_memo.get
        text_cap = self.MYERS_TEXT_CAP
        base_cap = self.MYERS_MAX_WORDS * 32
        for idx in todo:
            x, y = pairs[idx]
            lx = len(x)
            ly = len(y)
            if lx <= ly:
                mn_len, mx_len = lx, ly
            else:
                mn_len, mx_len = ly, lx
            hx = id(x)
            ax = memo_get(hx)
            if ax is None:
                ax = acgt_memo[hx] = is_acgt(x)
            hy = id(y)
            ay = memo_get(hy)
            if ay is None:
                ay = acgt_memo[hy] = is_acgt(y)
            if not (mn_len > 0 and mx_len <= text_cap and ax and ay):
                rest.append(idx)
            elif mn_len <= base_cap:
                key = nw_memo.get((mn_len, mx_len))
                if key is None:
                    nw = 4
                    while nw * 32 < mn_len:
                        nw *= 2
                    tl = tbucket_memo.get(mx_len)
                    if tl is None:
                        tl = tbucket_memo[mx_len] = _text_bucket(mx_len)
                    key = nw_memo[(mn_len, mx_len)] = (nw, tl)
                bucket = eligible.get(key)
                if bucket is None:
                    bucket = eligible[key] = []
                bucket.append(idx)
            else:
                tl = 128
                while tl < mx_len:
                    tl *= 2
                striped.setdefault(tl, []).append(idx)
        if striped:
            long_idx = [i for _tl, ms in sorted(striped.items()) for i in ms]
            self._long_pair_route(pairs, long_idx, out, rest)
        # two-phase: dispatch every bucket asynchronously (device executes
        # while the host packs the next bucket), then collect. Chunk sizes
        # come from a geometric ladder (1..8 programs) so big batches go out
        # in few dispatches (the tunnel's per-dispatch latency dominated
        # fixed 1024-pair chunks) while each (n_words, text_len) bucket
        # still compiles at most 4 shapes.
        from .myers_pallas import PAIRS_PER_PROG, myers_dispatch

        MAX_CHUNK = 8 * PAIRS_PER_PROG
        pending = []
        for (nw, tl), members in sorted(eligible.items()):
            pos = 0
            while pos < len(members):
                rem = len(members) - pos
                if rem >= MAX_CHUNK:
                    take = MAX_CHUNK
                else:
                    # greedy largest power-of-two program count that fits:
                    # only the final sub-chunk carries padding waste (the
                    # old round-the-whole-remainder-up rule padded a 4.5k
                    # bucket to 8k — 44% dead pairs through the H2D link)
                    take = PAIRS_PER_PROG
                    while take * 2 <= rem:
                        take *= 2
                chunk = members[pos : pos + take]
                pos += take
                sub = [pairs[i] for i in chunk]
                # all-vs-all pair sets reuse the same sequence objects
                # many times; the pool path ships each one once (the
                # host->device link is the measured bottleneck) and
                # expands on device. Returns None when dedup won't pay.
                # A pool-only failure degrades to the direct Myers path
                # (NOT the much slower banded ladder).
                dev = None
                if os.environ.get("OTTER_TPU_MYERS_POOL", "1") == "1":
                    try:
                        from .myers_pallas import myers_pool_dispatch
                        dev = myers_pool_dispatch(sub, nw, tl,
                                                  interpret=self.interpret,
                                                  pad_to=take)
                    except Exception:
                        dev = None
                if dev is None:
                    try:
                        dev = myers_dispatch(sub, nw, tl,
                                             interpret=self.interpret,
                                             pad_to=take)
                    except Exception:
                        rest.extend(chunk)
                        continue
                pending.append((chunk, len(sub), nw, tl,
                                len(sub) * nw * 32 * tl, dev))
        return pending, rest

    # band rungs for long pairs; beyond BANDED_FRAC * m the window
    # approaches the full matrix and the striped kernel wins
    K_LONG = (63, 127, 255, 511, 1023, 2047)
    BANDED_FRAC = 0.25
    # speculative-ladder budget: launch every admissible rung in one
    # dispatch when the TOTAL banded cells stay under this (else the
    # sequential ladder is cheaper than the extra compute)
    SPEC_CELL_CAP = float(os.environ.get("OTTER_TPU_SPEC_CELLS", "2e9"))

    def _pair_rungs(self, m: int, n: int) -> List[int]:
        return [kk for kk in self.K_LONG
                if n - m <= kk <= m * self.BANDED_FRAC and kk < n]

    def _banded_pool_launch(self, pairs, chunk, nw: int, tl: int, k: int):
        """One banded-rung launch: index-math dedup when ``pairs`` is an
        IndexedPairs view (the assemble path), python id-dedup otherwise."""
        from .myers_banded import (myers_banded_pool_launch,
                                   myers_banded_pool_launch_indexed)

        if isinstance(pairs, IndexedPairs):
            return myers_banded_pool_launch_indexed(
                pairs, chunk, nw, tl, k, interpret=self.interpret)
        return myers_banded_pool_launch(
            [pairs[i] for i in chunk], nw, tl, k, interpret=self.interpret)

    def _speculative_banded(self, pairs, remaining, out):
        """Launch every pair's admissible rungs concurrently and collect
        once; returns (sequential_leftovers, rung_exhausted) — the second
        list had every admissible rung disproven and goes straight to the
        striped fallback. An empty input or a too-big batch returns
        ``remaining`` unchanged for the sequential ladder."""
        from .myers_pallas import PAIRS_PER_PROG as _PPP

        if not remaining:
            return remaining, []
        rungs = {}
        total_cells = 0.0
        for i in remaining:
            x, y = pairs[i]
            m = min(len(x), len(y))
            n = max(len(x), len(y))
            rl = self._pair_rungs(m, n)
            rungs[i] = rl
            for kk in rl:
                total_cells += n * 2.0 * (kk + 1)
        if total_cells > self.SPEC_CELL_CAP:
            return remaining, []
        buckets: dict = {}
        for i in remaining:
            x, y = pairs[i]
            m = min(len(x), len(y))
            n = max(len(x), len(y))
            nw = 4
            while nw * 32 < m:
                nw *= 2
            tl = 128
            while tl < n:
                tl *= 2
            for kk in rungs[i]:
                buckets.setdefault((kk, nw, tl), []).append(i)
        launches = []
        for (kk, nw, tl), members in sorted(buckets.items()):
            for c0 in range(0, len(members), 8 * _PPP):
                chunk = members[c0 : c0 + 8 * _PPP]
                try:
                    dev = self._banded_pool_launch(pairs, chunk, nw, tl,
                                                   kk)
                except Exception:
                    continue  # chunk retries on the sequential ladder
                for i in chunk:
                    a, b = pairs[i]
                    self.cells += max(len(a), len(b)) * min(
                        min(len(a), len(b)), 2 * (kk + 1))
                launches.append((kk, chunk, dev))
        if not launches:
            return remaining, []
        try:
            flat = np.asarray(jnp.concatenate(
                [dev.reshape(-1)[: len(chunk)]
                 for _kk, chunk, dev in launches]))
        except Exception:
            return remaining, []
        best: dict = {}
        ran: dict = {}
        offset = 0
        for kk, chunk, _dev in launches:
            d = flat[offset : offset + len(chunk)]
            offset += len(chunk)
            for bi, idx in enumerate(chunk):
                ran[idx] = ran.get(idx, 0) + 1
                if d[bi] <= kk and kk < best.get(idx, (1 << 30,))[0]:
                    best[idx] = (kk, int(d[bi]))
        leftovers: List[int] = []
        exhausted: List[int] = []
        for i in remaining:
            got = best.get(i)
            if got is not None:
                out[i] = got[1]
            elif ran.get(i, 0) >= len(rungs[i]):
                # every admissible rung ran and failed: the sequential
                # ladder would only re-disprove them — straight to striped
                exhausted.append(i)
            else:
                leftovers.append(i)
        return leftovers, exhausted

    def _long_pair_route(self, pairs, idxs, out, rest) -> None:
        """Long ACGT pairs (shorter side past the base kernel's 64 words):
        banded Myers ladder first (myers_banded.py — band cells only, the
        WFA-class O(k*s) cost), striped full-matrix for what remains.

        A 10 kb HiFi pair resolves at k=63 for ~1.3 Mcell instead of the
        striped kernel's 100 Mcell; pairs whose length difference or true
        distance needs k > BANDED_FRAC * m go striped directly (the band
        would approach the full matrix anyway). Every launch is pool-
        deduplicated (all-vs-all sets ship each sequence once)."""
        from .myers_pallas import PAIRS_PER_PROG as _PPP
        from .myers_striped import myers_striped_distances

        # pre-split: a pair is banded-eligible at rung k iff
        # n-m <= k <= m*BANDED_FRAC and k < n — the interval is fixed per
        # pair, so pairs with no eligible rung at all go straight to the
        # striped fallback instead of being re-scanned at every rung
        remaining = []
        striped_direct: List[int] = []
        for i in idxs:
            x, y = pairs[i]
            m = min(len(x), len(y))
            n = max(len(x), len(y))
            if any(n - m <= kk <= m * self.BANDED_FRAC and kk < n
                   for kk in self.K_LONG):
                remaining.append(i)
            else:
                striped_direct.append(i)
        # SPECULATIVE ladder for small batches: through a high-RTT tunnel
        # each sequential rung pays a full device round trip (~40 ms),
        # which dominates a 150-pair hint dispatch; launching every
        # admissible rung at once and collecting ONCE trades ~2x banded
        # cells (geometric rungs) for a single round trip. Big batches
        # (cell-bound, e.g. the 19900-pair refscale matrices) keep the
        # sequential ladder.
        remaining, spec_exhausted = self._speculative_banded(pairs,
                                                             remaining, out)
        striped_direct.extend(spec_exhausted)
        # rung-jumping: a failed rung k proves d > k (d <= k would have
        # resolved exactly), and its banded score c bounds d from above.
        # The next attempted rung is the first >= min(c, 8k): the min-c
        # part skips provably-cheap intermediate rungs when c is tight
        # (an ONT pair failing k=63 with c~160 jumps straight to 255),
        # the 8k cap bounds the overshoot when the band escape inflates
        # c far past d (rungs in [d, c) ARE viable). Jump targets never
        # undershoot d's rung by more than the cap allows; outputs are
        # unchanged either way (later rungs/striped stay exact).
        need: dict = {}
        for k in self.K_LONG:
            if not remaining:
                break
            now: List[int] = []
            later: List[int] = []
            for i in remaining:
                x, y = pairs[i]
                m = min(len(x), len(y))
                n = max(len(x), len(y))
                if k < need.get(i, 0):
                    later.append(i)  # proven > k by a failed rung's score
                elif k > m * self.BANDED_FRAC or k >= n:
                    later.append(i)  # band ~ matrix: striped territory
                elif n - m > k:
                    later.append(i)  # infeasible at this rung
                else:
                    now.append(i)
            if not now:
                remaining = later
                continue
            # bucket by (pattern words, text bucket); launch all async
            buckets: dict = {}
            for i in now:
                x, y = pairs[i]
                m = min(len(x), len(y))
                n = max(len(x), len(y))
                nw = 4
                while nw * 32 < m:
                    nw *= 2
                tl = 128
                while tl < n:
                    tl *= 2
                buckets.setdefault((nw, tl), []).append(i)
            launches = []
            for (nw, tl), members in sorted(buckets.items()):
                for c0 in range(0, len(members), 8 * _PPP):
                    chunk = members[c0 : c0 + 8 * _PPP]
                    try:
                        dev = self._banded_pool_launch(pairs, chunk, nw,
                                                       tl, k)
                    except Exception:
                        later.extend(chunk)
                        continue
                    for i in chunk:
                        a, b = pairs[i]
                        self.cells += max(len(a), len(b)) * min(
                            min(len(a), len(b)), 2 * (k + 1))
                    launches.append((chunk, dev))
            # ONE device concat + ONE host materialization per rung: the
            # D2H sync has ~40 ms fixed latency through tunnels (same
            # single-collect pattern as _myers_collect)
            flat = None
            if launches:
                try:
                    import jax.numpy as jnp

                    flat = np.asarray(jnp.concatenate(
                        [dev.reshape(-1)[: len(chunk)]
                         for chunk, dev in launches]))
                except Exception:
                    flat = None
            if flat is None:
                for chunk, _dev in launches:
                    later.extend(chunk)
            else:
                offset = 0
                for chunk, _dev in launches:
                    d = flat[offset : offset + len(chunk)]
                    offset += len(chunk)
                    for bi, idx in enumerate(chunk):
                        if d[bi] <= k:
                            out[idx] = int(d[bi])
                        else:
                            # jump target min(c, 8k): c over-estimates d
                            # (band boundaries only raise), so rungs in
                            # [d, c) are viable — capping at ~3 doublings
                            # keeps the common 1-rung skip while bounding
                            # the overshoot when the band escape inflates
                            # c far past d
                            need[idx] = min(int(d[bi]), 8 * k)
                            later.append(idx)
            remaining = later
        remaining.extend(striped_direct)
        if not remaining:
            return
        # striped full-matrix fallback, bucketed by text length
        groups: dict = {}
        for i in remaining:
            x, y = pairs[i]
            mx_len = max(len(x), len(y))
            tl = 128
            while tl < mx_len:
                tl *= 2
            groups.setdefault(tl, []).append(i)
        for tl, members in sorted(groups.items()):
            for c0 in range(0, len(members), _PPP):
                chunk = members[c0 : c0 + _PPP]
                sub = [pairs[i] for i in chunk]
                try:
                    d = myers_striped_distances(sub, tl,
                                                interpret=self.interpret)
                except Exception:
                    rest.extend(chunk)
                    continue
                mlen_max = max(min(len(a), len(b)) for a, b in sub)
                self.cells += len(sub) * mlen_max * tl
                for bi, idx in enumerate(chunk):
                    out[idx] = int(d[bi])

    def _myers_collect(self, pending, out) -> List[int]:
        """One host materialization of every pending Myers chunk; returns
        the indices that must fall back to the banded path."""
        rest: List[int] = []
        if pending:
            # one device-side concat + ONE host materialization: the
            # device->host sync has high fixed latency on tunneled TPUs,
            # so never materialize per chunk
            try:
                import jax.numpy as jnp
                flat_dev = jnp.concatenate(
                    [dev.reshape(-1)[:nsub]
                     for _m, nsub, _nw, _tl, _c, dev in pending])
                flat = np.asarray(flat_dev)
            except Exception:
                rest.extend([i for m, *_ in pending for i in m])
                return rest
            offset = 0
            for members, nsub, nw, tl, cells, dev in pending:
                d = flat[offset : offset + nsub]
                offset += nsub
                self.cells += cells
                out[np.asarray(members, dtype=np.int64)] = d
        return rest

    def distances(self, pairs: List[Tuple[str, str]]) -> np.ndarray:
        """Exact edit distance per pair (equal/empty shortcuts included)."""
        return self.distances_collect(self.distances_async(pairs))

    def distances_indexed(self, seqs: List[str], xi, yi) -> np.ndarray:
        """distances() over pair (seqs[xi[p]], seqs[yi[p]]) — see
        distances_async_indexed."""
        return self.distances_collect(
            self.distances_async_indexed(seqs, xi, yi))

    def distances_async_indexed(self, seqs: List[str], xi, yi):
        """Indexed dispatch: pair p is (seqs[xi[p]], seqs[yi[p]]).

        The reference touches each WFA pair once per thread
        (analignments.cpp:117-124); the batched engine's remaining host
        cost was the per-pair python routing loop (~2 us x 32k pairs).
        Callers that know the pair structure (all-vs-all region sets,
        src/assemble.cpp's condensed matrices) pass the unique sequence
        pool plus index arrays instead, and the routing — length/alphabet
        eligibility, kernel bucketing, text buckets — runs as numpy over
        the whole batch. Per-sequence work is O(#unique) (~sqrt(2P) for
        all-vs-all), per-pair work is vectorized. Distances are exact on
        every route, so routing equivalence is a perf property, not a
        correctness one."""
        pv = IndexedPairs(seqs, xi, yi)
        B = len(pv.xi)
        out = np.zeros(B, dtype=np.int64)
        lx = pv.lens[pv.xi]
        ly = pv.lens[pv.yi]
        mn = np.minimum(lx, ly)
        mx = np.maximum(lx, ly)
        same = pv.xi == pv.yi      # object-level x is y (all-vs-all sets
        # share objects); equal-content distinct objects route to the
        # kernels and resolve to the same exact 0
        empty = (lx == 0) | (ly == 0)
        out[empty] = mx[empty]
        todo_mask = ~(same | empty)
        if self.mode != "pallas":
            return ("sync", pv, np.nonzero(todo_mask)[0].tolist(), out)
        acgt_u = _acgt_flags(seqs)
        pair_ok = acgt_u[pv.xi] & acgt_u[pv.yi]
        elig = todo_mask & pair_ok & (mx <= self.MYERS_TEXT_CAP)
        base_cap = self.MYERS_MAX_WORDS * 32
        base = elig & (mn <= base_cap)
        striped_m = elig & ~base
        rest = np.nonzero(todo_mask & ~elig)[0].tolist()
        if np.any(striped_m):
            long_idx = np.nonzero(striped_m)[0]
            # keep the dict path's text-bucket major order
            tl_long = _pow2_at_least(mx[long_idx], 128)
            long_idx = long_idx[np.argsort(tl_long, kind="stable")]
            self._long_pair_route(pv, long_idx.tolist(), out, rest)
        pending = []
        bi_all = np.nonzero(base)[0]
        if len(bi_all):
            # nw bucket: 4/8/16/32/64 words by shorter-side thresholds;
            # tl: _text_bucket (pow2/8 steps) — both via searchsorted
            nw_th = np.asarray([128, 256, 512, 1024], dtype=np.int64)
            nwi = np.searchsorted(nw_th, mn[bi_all], side="left")
            tl = _text_bucket_vec(mx[bi_all])
            order = np.lexsort((tl, nwi))
            bi_all = bi_all[order]
            nwi = nwi[order]
            tl = tl[order]
            key = nwi * (1 << 20) + tl
            bounds = np.nonzero(np.diff(key))[0] + 1
            starts = np.concatenate([[0], bounds, [len(key)]])
            from .myers_pallas import (PAIRS_PER_PROG, myers_dispatch,
                                       myers_pool_dispatch_indexed)

            MAX_CHUNK = 8 * PAIRS_PER_PROG
            use_pool = os.environ.get("OTTER_TPU_MYERS_POOL", "1") == "1"
            for g in range(len(starts) - 1):
                members = bi_all[starts[g] : starts[g + 1]]
                nw = int(4 << int(nwi[starts[g]]))
                tlen = int(tl[starts[g]])
                pos = 0
                while pos < len(members):
                    rem = len(members) - pos
                    if rem >= MAX_CHUNK:
                        take = MAX_CHUNK
                    else:
                        take = PAIRS_PER_PROG
                        while take * 2 <= rem:
                            take *= 2
                    chunk = members[pos : pos + take]
                    pos += take
                    dev = None
                    if use_pool:
                        try:
                            dev = myers_pool_dispatch_indexed(
                                pv, chunk, nw, tlen,
                                interpret=self.interpret, pad_to=take)
                        except Exception:
                            dev = None
                    if dev is None:
                        sub = [pv[int(i)] for i in chunk]
                        try:
                            dev = myers_dispatch(sub, nw, tlen,
                                                 interpret=self.interpret,
                                                 pad_to=take)
                        except Exception:
                            rest.extend(int(i) for i in chunk)
                            continue
                    pending.append((chunk.tolist(), len(chunk), nw, tlen,
                                    len(chunk) * nw * 32 * tlen, dev))
        return ("live", pv, pending, rest, out)

    def distances_async(self, pairs: List[Tuple[str, str]]):
        """Dispatch phase of distances(): shortcuts resolve immediately and
        every Myers-eligible bucket is launched asynchronously, so the
        device (and the tunnel's H2D/D2H traffic) executes while the caller
        does host work. Finish with distances_collect(handle)."""
        out = np.zeros(len(pairs), dtype=np.int64)
        todo = []
        for idx, (x, y) in enumerate(pairs):
            if x == y:
                out[idx] = 0
            elif not x or not y:
                out[idx] = max(len(x), len(y))
            else:
                todo.append(idx)
        if not todo or self.mode != "pallas":
            return ("sync", pairs, todo, out)
        pending, rest = self._myers_dispatch(pairs, todo, out)
        return ("live", pairs, pending, rest, out)

    def distances_collect_kde(self, handle, rid: np.ndarray, slot: np.ndarray,
                              ex_entries, nvals: np.ndarray, bw: np.ndarray,
                              n_rows: int, n_pad: int):
        """Fused distances_collect + scaled device KDE: the per-region KDE
        (parallel/mesh.py::kde_fused_from_pairs) consumes the Myers kernel
        outputs while they are still device-resident, so the whole batch
        costs ONE D2H materialization and no separate KDE dispatch.

        rid/slot: per input pair, the KDE grid row (n_rows = dump row for
        pairs of non-KDE regions) and within-row slot (condensed-matrix
        order). ex_entries: (row, slot, value) triplets for host-known
        values (haplotag-region grids; shortcut pairs are folded in here
        from the handle's resolved values). Returns (out, m, s) with m/s
        the (n_rows, G) scaled KDE, or None when any pair needs the banded
        ladder — the caller then falls back to distances_collect +
        pooled_kde_scaled (identical results, one extra round trip)."""
        if handle[0] != "live":
            return None
        _t, pairs, pending, rest, out = handle
        if rest or not pending:
            return None
        import jax.numpy as jnp
        try:
            flat_dev = jnp.concatenate(
                [dev.reshape(-1)[:nsub]
                 for _m, nsub, _nw, _tl, _c, dev in pending])
        except Exception:
            return None
        for _m, _nsub, _nw, _tl, cells, _dev in pending:
            self.cells += cells
        members = np.concatenate(
            [np.asarray(m, dtype=np.int64) for m, *_ in pending])
        B = len(pairs)
        maxlen = (pairs.maxlens().astype(np.float64)
                  if isinstance(pairs, IndexedPairs) else
                  np.fromiter((max(len(x), len(y)) for x, y in pairs),
                              dtype=np.float64, count=B))
        # host-resolved (shortcut) pairs of KDE regions join the
        # exceptional scatter list with their normalized values
        on_dev = np.zeros(B, dtype=bool)
        on_dev[members] = True
        host_idx = np.nonzero(~on_dev & (rid < n_rows))[0]
        ex_row = [int(r) for r, _s, _v in ex_entries]
        ex_slot = [int(s) for _r, s, _v in ex_entries]
        ex_val = [np.float32(v) for _r, _s, v in ex_entries]
        if len(host_idx):
            ex_row.extend(rid[host_idx].tolist())
            ex_slot.extend(slot[host_idx].tolist())
            ex_val.extend(np.asarray(
                out[host_idx] / maxlen[host_idx], dtype=np.float32).tolist())
        # pad every dynamic axis to a power of two (bounded compile shapes);
        # padding scatters land in the dump row
        P = len(members)
        Pp = 8
        while Pp < P:
            Pp *= 2
        E = max(1, len(ex_row))
        Ep = 8
        while Ep < E:
            Ep *= 2
        Rp = 8
        while Rp < n_rows:
            Rp *= 2
        mlen_m = np.ones(Pp, dtype=np.float32)
        rid_m = np.full(Pp, Rp, dtype=np.int32)
        slot_m = np.zeros(Pp, dtype=np.int32)
        mlen_m[:P] = maxlen[members].astype(np.float32)
        rid_m[:P] = np.where(rid[members] < n_rows, rid[members], Rp)
        slot_m[:P] = slot[members]
        exr = np.full(Ep, Rp, dtype=np.int32)
        exs = np.zeros(Ep, dtype=np.int32)
        exv = np.zeros(Ep, dtype=np.float32)
        exr[: len(ex_row)] = ex_row
        exs[: len(ex_slot)] = ex_slot
        exv[: len(ex_val)] = ex_val
        nv = np.ones(Rp, dtype=np.int32)
        bwv = np.full(Rp, 0.01, dtype=np.float32)
        nv[:n_rows] = nvals
        bwv[:n_rows] = bw
        from ..ops.kde import kde_grid
        from ..parallel.mesh import kde_fused_from_pairs

        xs32 = kde_grid(0.0025).astype(np.float32)
        G = len(xs32)
        if P < Pp:
            flat_dev = jnp.concatenate(
                [flat_dev, jnp.zeros(Pp - P, dtype=flat_dev.dtype)])
        try:
            fused = np.asarray(kde_fused_from_pairs(
                flat_dev, jnp.asarray(mlen_m), jnp.asarray(rid_m),
                jnp.asarray(slot_m), jnp.asarray(exr), jnp.asarray(exs),
                jnp.asarray(exv), jnp.asarray(nv), jnp.asarray(bwv),
                jnp.asarray(xs32), n_pad=n_pad, n_rows=Rp))
        except Exception:
            return None
        out[members] = fused[:P].astype(np.int64)
        m = fused[Pp : Pp + Rp * G].reshape(Rp, G)[:n_rows]
        s = fused[Pp + Rp * G :].reshape(Rp, G)[:n_rows]
        return out, m, s

    def distances_collect(self, handle) -> np.ndarray:
        """Materialize a distances_async handle into the (B,) result."""
        if handle[0] == "sync":
            _t, pairs, todo, out = handle
            if not todo:
                return out
            if (self.mode == "native"
                    and self._native_distances(pairs, todo, out)):
                return out
            todo = self._myers_route(pairs, todo, out)
        else:
            _t, pairs, pending, rest, out = handle
            todo = rest + self._myers_collect(pending, out)
        if not todo:
            return out
        maxlen = max(max(len(pairs[i][0]), len(pairs[i][1])) for i in todo)
        ladder = [kk for kk in self.K_LADDER if kk < 2 * maxlen]
        if not ladder or ladder[-1] < maxlen:
            ladder.append(((maxlen + 127) // 128) * 128 - 1)
        return self._banded_ladder(pairs, todo, out, ladder)

    def _banded_ladder(self, pairs, todo, out, ladder) -> np.ndarray:
        unresolved = todo
        for k in [kk for kk in ladder if kk >= self.k_start] or [ladder[-1]]:
            if not unresolved:
                break
            batch = [i for i in unresolved
                     if abs(len(pairs[i][0]) - len(pairs[i][1])) <= k]
            deferred_set = set(batch)
            deferred = [i for i in unresolved if i not in deferred_set]
            still: List[int] = []
            # group by padded length so shapes (and compiles) stay few, and
            # chunk big groups to a fixed max batch
            CHUNK = 1024
            groups: dict = {}
            for i in batch:
                maxl = max(len(pairs[i][0]), len(pairs[i][1]))
                Lp = 128
                while Lp < maxl:
                    Lp *= 2
                groups.setdefault(Lp, []).append(i)
            for Lp, members in sorted(groups.items()):
                tb = TILE_B
                if self.mode == "pallas":
                    tb = pick_tile_b(Lp, k)
                for c0 in range(0, len(members), CHUNK):
                    chunk = members[c0 : c0 + CHUNK]
                    sub_pairs = [pairs[i] for i in chunk]
                    # anchor the pack to the group's padded length
                    a, bp, mn, L = _pack_bucket(sub_pairs, k, tile_b=tb,
                                                min_len=Lp)
                    res = self._run(a, bp, mn, k, L)
                    self.cells += a.shape[0] * L * 2 * (k + 1)
                    for bi, idx in enumerate(chunk):
                        if res[bi] <= k:
                            out[idx] = int(res[bi])
                        else:
                            still.append(idx)
            unresolved = still + deferred
        if unresolved:
            raise AssertionError("banded DP failed to converge")
        return out

    def ends_free(self, jobs) -> np.ndarray:
        """Exact ends-free edit distances (edit_distance_ends_free
        semantics, WFA2 alignEndsFree — see ops/align_np.py).

        On the pallas backend, ACGT jobs whose frees sit on ONE side (the
        only shape the reference emits, analignments.cpp:34-63) route
        through the striped Myers kernel — full-matrix exact, no band
        ladder, no escalation retries. Everything else falls back to the
        vectorized host batch DP.
        """
        return self.ends_free_collect(self.ends_free_async(jobs))

    def ends_free_async(self, jobs):
        """Dispatch half of ends_free(): every striped-Myers bucket chunk
        is launched asynchronously so the device (and tunnel traffic) runs
        while the caller does host work; finish with ends_free_collect.
        Non-pallas backends return a sync handle (collect computes)."""
        from .myers import is_acgt
        from .myers_pallas import PAIRS_PER_PROG
        from .myers_striped import myers_striped_ends_free_async

        if self.mode != "pallas":
            return ("sync", jobs)
        acgt_memo: dict = {}

        def _is_acgt(s):
            h = id(s)
            v = acgt_memo.get(h)
            if v is None:
                v = acgt_memo[h] = is_acgt(s)
            return v

        out = np.zeros(len(jobs), dtype=np.int64)
        host: List[int] = []
        buckets: dict = {}
        banded_long: List[int] = []
        zero_idx: List[int] = []
        zero_pairs: List[Tuple[str, str]] = []
        for idx, job in enumerate(jobs):
            p, t, pb, pe, tb, te = job
            if p == t:
                continue
            if not (pb or pe or tb or te):
                # no frees at all: the ends-free score IS the plain edit
                # distance — ride the pooled banded-Myers engine (Ukkonen
                # ladder + pool dedup) instead of the striped full matrix
                # (a 10 kb consensus-hint job is ~1.3 Mcell banded vs
                # ~160 Mcell striped; the hint dispatch of a refscale
                # region is mostly zero-free jobs)
                zero_idx.append(idx)
                zero_pairs.append((p, t))
                continue
            one_sided = not ((pb or pe) and (tb or te))
            if (one_sided and min(len(p), len(t)) > 0
                    and max(len(p), len(t)) <= self.MYERS_TEXT_CAP
                    and _is_acgt(p) and _is_acgt(t)):
                # long free-less side: banded ends-free ladder first — the
                # striped kernel pays the FULL m x n matrix where a band of
                # (tb + 2k) diagonals suffices for <= k edits (reference
                # ends-free reassignment, analignments.cpp:88-96; VERDICT
                # r4 #2: long-read reassignment was striped full-matrix)
                if min(len(p), len(t)) > 2048:
                    banded_long.append(idx)
                    continue
                # bucket by the padded length of the free side (the Myers
                # text after orientation) to bound the compile-shape set
                tlen = len(p) if (pb or pe) else len(t)
                tl = 128
                while tl < tlen:
                    tl *= 2
                buckets.setdefault(tl, []).append(idx)
            else:
                host.append(idx)
        launches = []
        if banded_long:
            for idx in self._ends_free_banded_route(jobs, banded_long, out):
                p, t, pb, pe, tb, te = jobs[idx]
                tlen = len(p) if (pb or pe) else len(t)
                tl = 128
                while tl < tlen:
                    tl *= 2
                buckets.setdefault(tl, []).append(idx)
        # striped buckets launch AFTER the banded ladder so its leftovers
        # ride the same dispatch
        for tl, members in sorted(buckets.items()):
            for c0 in range(0, len(members), PAIRS_PER_PROG):
                chunk = members[c0 : c0 + PAIRS_PER_PROG]
                sub = [jobs[i] for i in chunk]
                try:
                    h = myers_striped_ends_free_async(
                        sub, interpret=self.interpret, text_len=tl)
                except Exception:
                    host.extend(chunk)
                    continue
                mlen_max = max(min(len(j[0]), len(j[1])) for j in sub)
                self.cells += len(sub) * mlen_max * tl
                launches.append((chunk, h))
        zh = None
        if zero_idx:
            # indexed sub-dispatch: consensus-hint batches share their
            # allele's rep pattern across every job, so the id-dedup pool
            # is tiny and the downstream routing/ladders run index math
            from .myers_banded import _dedup_oriented

            zseqs, zxi_l, zyi_l = _dedup_oriented(zero_pairs)
            zh = self.distances_async_indexed(
                zseqs, np.asarray(zxi_l, dtype=np.int64),
                np.asarray(zyi_l, dtype=np.int64))
        return ("live", jobs, out, host, launches, zero_idx, zh)

    def _speculative_banded_ef(self, orient, remaining, out):
        """Speculative rung launch for the ends-free banded ladder (same
        rationale/budget/returns as _speculative_banded)."""
        from .myers_banded import myers_banded_ends_free_launch
        from .myers_pallas import PAIRS_PER_PROG as _PPP

        if not remaining:
            return remaining, []
        rungs = {}
        total_cells = 0.0
        for i in remaining:
            mp, mt, tb, _te = orient[i]
            klo_b = 1 << max(6, (max(tb, 1) - 1).bit_length())
            rl = [kk for kk in self.K_LONG
                  if klo_b + 2 * kk <= len(mp) * self.BANDED_FRAC
                  and kk < len(mt)]
            rungs[i] = (klo_b, rl)
            for kk in rl:
                total_cells += len(mt) * (klo_b + 2.0 * (kk + 1))
        if total_cells > self.SPEC_CELL_CAP:
            return remaining, []
        buckets: dict = {}
        for i in remaining:
            mp, mt, _tb, _te = orient[i]
            klo_b, rl = rungs[i]
            nw = 4
            while nw * 32 < len(mp):
                nw *= 2
            tl = 128
            while tl < len(mt):
                tl *= 2
            for kk in rl:
                buckets.setdefault((kk, nw, tl, klo_b), []).append(i)
        launches = []
        for (kk, nw, tl, klo_b), members in sorted(buckets.items()):
            for c0 in range(0, len(members), 8 * _PPP):
                chunk = members[c0 : c0 + 8 * _PPP]
                sub = [orient[i] for i in chunk]
                try:
                    dev = myers_banded_ends_free_launch(
                        sub, nw, tl, kk, klo_b, interpret=self.interpret)
                except Exception:
                    continue  # chunk retries on the sequential ladder
                for mp, mt, _tb, _te in sub:
                    self.cells += len(mt) * min(len(mp),
                                                klo_b + 2 * (kk + 1))
                launches.append((kk, chunk, dev))
        if not launches:
            return remaining, []
        try:
            flat = np.asarray(jnp.concatenate(
                [dev.reshape(-1)[: len(chunk)]
                 for _kk, chunk, dev in launches]))
        except Exception:
            return remaining, []
        best: dict = {}
        ran: dict = {}
        offset = 0
        for kk, chunk, _dev in launches:
            d = flat[offset : offset + len(chunk)]
            offset += len(chunk)
            for bi, idx in enumerate(chunk):
                ran[idx] = ran.get(idx, 0) + 1
                if d[bi] <= kk and kk < best.get(idx, (1 << 30,))[0]:
                    best[idx] = (kk, int(d[bi]))
        leftovers: List[int] = []
        exhausted: List[int] = []
        for i in remaining:
            got = best.get(i)
            if got is not None:
                out[i] = got[1]
            elif ran.get(i, 0) >= len(rungs[i][1]):
                exhausted.append(i)
            else:
                leftovers.append(i)
        return leftovers, exhausted

    def _ends_free_banded_route(self, jobs, idxs, out) -> List[int]:
        """Banded ends-free Ukkonen ladder for long one-sided ACGT jobs
        (kernels/myers_banded.py ends-free section): band of klo + 2k
        diagonals instead of the striped kernel's full m x n matrix.
        Resolves what it can exactly (computed <= k); returns the indices
        that must fall back to the striped kernel."""
        from .myers_banded import myers_banded_ends_free_launch
        from .myers_pallas import PAIRS_PER_PROG as _PPP

        orient = {}
        for i in idxs:
            p, t, pb, pe, tb, te = jobs[i]
            # Myers pattern := the free-less side; text carries the frees
            orient[i] = (t, p, pb, pe) if (pb or pe) else (p, t, tb, te)
        # pre-split: a job whose window (klo + 2k) can never stay well
        # under the full matrix goes straight to striped
        remaining = []
        striped_direct: List[int] = []
        k_min = self.K_LONG[0]
        for i in idxs:
            mp, mt, tb, _te = orient[i]
            klo_b = 1 << max(6, (max(tb, 1) - 1).bit_length())
            if klo_b + 2 * k_min <= len(mp) * self.BANDED_FRAC:
                remaining.append(i)
            else:
                striped_direct.append(i)
        remaining, ef_exhausted = self._speculative_banded_ef(orient,
                                                              remaining, out)
        striped_direct.extend(ef_exhausted)
        need: dict = {}  # rung-jumping (see _long_pair_route)
        for k in self.K_LONG:
            if not remaining:
                break
            now: List[int] = []
            later: List[int] = []
            for i in remaining:
                mp, mt, tb, _te = orient[i]
                klo_b = 1 << max(6, (max(tb, 1) - 1).bit_length())
                if k < need.get(i, 0):
                    later.append(i)
                elif klo_b + 2 * k > len(mp) * self.BANDED_FRAC \
                        or k >= len(mt):
                    later.append(i)
                else:
                    now.append(i)
            if not now:
                remaining = later
                continue
            bks: dict = {}
            for i in now:
                mp, mt, tb, _te = orient[i]
                nw = 4
                while nw * 32 < len(mp):
                    nw *= 2
                tl = 128
                while tl < len(mt):
                    tl *= 2
                klo_b = 1 << max(6, (max(tb, 1) - 1).bit_length())
                bks.setdefault((nw, tl, klo_b), []).append(i)
            rung_launches = []
            for (nw, tl, klo_b), members in sorted(bks.items()):
                for c0 in range(0, len(members), 8 * _PPP):
                    chunk = members[c0 : c0 + 8 * _PPP]
                    sub = [orient[i] for i in chunk]
                    try:
                        dev = myers_banded_ends_free_launch(
                            sub, nw, tl, k, klo_b,
                            interpret=self.interpret)
                    except Exception:
                        later.extend(chunk)
                        continue
                    for mp, mt, tb, _te in sub:
                        self.cells += len(mt) * min(len(mp),
                                                    klo_b + 2 * (k + 1))
                    rung_launches.append((chunk, dev))
            flat = None
            if rung_launches:
                try:
                    flat = np.asarray(jnp.concatenate(
                        [dev.reshape(-1)[: len(chunk)]
                         for chunk, dev in rung_launches]))
                except Exception:
                    flat = None
            if flat is None:
                for chunk, _dev in rung_launches:
                    later.extend(chunk)
            else:
                offset = 0
                for chunk, _dev in rung_launches:
                    d = flat[offset : offset + len(chunk)]
                    offset += len(chunk)
                    for bi, idx in enumerate(chunk):
                        if d[bi] <= k:
                            out[idx] = int(d[bi])
                        else:
                            need[idx] = min(int(d[bi]), 8 * k)
                            later.append(idx)
            remaining = later
        return remaining + striped_direct

    def ends_free_collect(self, handle) -> np.ndarray:
        from ..ops.align_batch import edit_ends_free_batch

        if handle[0] == "sync":
            jobs = handle[1]
            if self.mesh is not None and self.mode == "jnp":
                # mesh execution: the fixed-k banded passes shard the pair
                # axis over the mesh (reassignment + consensus band-seed
                # dispatches ride the same data-parallel axis as the
                # distance matrices; the doubling ladder and validity stay
                # on host)
                return edit_ends_free_batch(
                    jobs, banded_runner=self._ends_free_mesh_runner)
            return edit_ends_free_batch(jobs)
        _t, jobs, out, host, launches, zero_idx, zh = handle
        # one device-side concat + ONE host materialization across every
        # chunk (like _myers_collect): per-chunk np.asarray would pay the
        # tunnel's D2H latency once per chunk
        devs = []
        metas = []
        for chunk, h in launches:
            out_c, live, hh = h
            if hh is None:  # degenerate-only chunk: results already known
                for bi, idx in enumerate(chunk):
                    out[idx] = int(out_c[bi])
                continue
            stacked_dev, sel_word, n_stripes, n_pairs = hh
            devs.append(stacked_dev.reshape(-1))
            metas.append((chunk, out_c, live, sel_word, n_stripes, n_pairs,
                          stacked_dev.size))
        if devs:
            from .myers_striped import _striped_pick

            try:
                import jax.numpy as jnp

                flat = np.asarray(jnp.concatenate(devs))
            except Exception:
                for chunk, *_rest in metas:
                    host.extend(chunk)
                metas = []
            offset = 0
            for (chunk, out_c, live, sel_word, n_stripes, n_pairs,
                 size) in metas:
                stacked = flat[offset : offset + size]
                offset += size
                out_c[live] = _striped_pick(stacked, sel_word, n_stripes,
                                            n_pairs)
                for bi, idx in enumerate(chunk):
                    out[idx] = int(out_c[bi])
        if zh is not None:
            zd = self.distances_collect(zh)
            for bi, idx in enumerate(zero_idx):
                out[idx] = int(zd[bi])
        if host:
            d = edit_ends_free_batch([jobs[i] for i in host])
            for bi, idx in enumerate(host):
                out[idx] = int(d[bi])
        return out
