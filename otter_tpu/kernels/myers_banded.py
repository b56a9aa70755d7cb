"""Banded Myers bit-parallel edit distance (Ukkonen band on the block
formulation) — long low-error pairs without full-matrix work.

The striped kernel (myers_striped.py) computes every cell of an m x n
matrix: exact, but a 10 kb HiFi pair (d ~ 50) pays ~100 Mcells where a
k=63 band needs ~1.3 Mcells. This module restricts the Myers column update
to a MOVING WORD WINDOW around the diagonal (the bit-parallel equivalent of
the banded row DP's Ukkonen band, reference WFA2's O(d*s) adaptivity):

  * per text column j only pattern words covering rows [j-k, j+k] update —
    a constant-width window of ~(2k/32 + 2) words that slides one word
    every 32 columns;
  * blocks chain Hyyro/Edlib-style horizontal deltas (hin/hout in
    {-1, 0, +1}) instead of the striped kernel's adder-carry chain, so the
    band's top boundary is one injected hin = +1 — the classic banded-DP
    over-estimate (the row above the band only ever grows by 1/column);
  * a word ENTERING the window at its bottom initializes to the
    all-(+1)-down column state relative to the boundary row above it —
    also an over-estimate;
  * both boundaries only ever RAISE in-band values, so the banded result
    is >= the true distance, and EQUAL whenever the true distance is <= k
    (any edit-<=-k path stays within diagonals |i-j| <= k). The engine's
    standard ``computed <= k`` exactness check + band-doubling ladder
    applies unchanged.

Score bookkeeping: the score rides the bottom row of the window's last
word (+32 when a new word enters), and switches to row-m tracking once the
window reaches the pattern's final word (entry value = boundary offset).

Work per pair: n * (2k/32 + 2) word-ops ~ 52x less than striped for a
10 kb k=63 pair. ``myers_banded_ref`` is the word-exact numpy oracle the
Pallas kernel (same word order, same boundary rules) is fuzzed against.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

M32 = 0xFFFFFFFF


def _codes2(s: str) -> np.ndarray:
    out = np.frombuffer(s.encode("latin-1"), dtype=np.uint8)
    tab = np.full(256, 0, dtype=np.uint8)
    tab[ord("A")] = 0
    tab[ord("C")] = 1
    tab[ord("G")] = 2
    tab[ord("T")] = 3
    return tab[out]


def _build_peq(pattern: str, n_words: int) -> List[List[int]]:
    """peq[c][w]: bitmask of pattern rows in word w matching char c."""
    codes = _codes2(pattern)
    peq = [[0] * n_words for _ in range(4)]
    for i, c in enumerate(codes):
        peq[int(c)][i // 32] |= 1 << (i % 32)
    return peq


def myers_banded_ref(pattern: str, text: str, k: int, strip: int = 4) -> int:
    """Word-exact oracle of the banded block Myers. Returns the banded
    distance (== exact edit distance iff it is <= k; larger values mean
    'escalate the band'). The window advances at STRIP granularity (the
    Pallas kernel's schedule): w_lo/w_hi are computed from the strip's
    first/last column, which only widens the window — still an
    over-estimating band, still exact for d <= k."""
    m, n = len(pattern), len(text)
    if m == 0 or n == 0:
        return max(m, n)
    if m > n:
        pattern, text = text, pattern
        m, n = n, m
    if n - m > k:
        return k + 1  # band cannot reach the corner
    n_words = (m + 31) // 32
    sel_word = (m - 1) // 32
    sel_bit = 1 << ((m - 1) % 32)
    peq = _build_peq(pattern, n_words)
    tcodes = _codes2(text)

    # window state
    Pv = [M32] * n_words
    Mv = [0] * n_words
    w_hi0 = min(sel_word, (strip - 1 + k) // 32)  # words at strip 0
    # score at bottom row of word w_hi (rows 32*(w_hi+1)-1) while
    # w_hi < sel_word; at row m-1 once w_hi == sel_word
    w_hi = w_hi0
    score = 32 * (w_hi + 1) if w_hi < sel_word else m
    for j in range(1, n + 1):
        jc = j - 1
        j0 = (jc // strip) * strip  # strip's first column
        w_lo = max(0, (j0 - k) // 32)
        want_hi = min(sel_word, (j0 + strip - 1 + k) // 32)
        while w_hi < want_hi:
            # bottom entry: new word initialized to the all-(+1)-down
            # column state relative to the boundary row above it
            w_hi += 1
            Pv[w_hi] = M32
            Mv[w_hi] = 0
            score = score + 32 if w_hi < sel_word else score + (
                m - 32 * w_hi)
        # NW top boundary: hin = +1 into the first window word — for
        # w_lo = 0 this is the standard D[0][j] = j convention (the
        # striped kernel's cp0 = 1); for w_lo > 0 it is the band's
        # +1-per-column over-estimate. Identical either way.
        hin = 1
        ch = int(tcodes[jc])
        for w in range(w_lo, w_hi + 1):
            eq = peq[ch][w]
            pv, mv = Pv[w], Mv[w]
            xv = eq | mv
            if hin < 0:
                eq |= 1
            x = eq
            d0 = ((((x & pv) + pv) & M32) ^ pv) | x
            ph = mv | (~(d0 | pv) & M32)
            mh = pv & d0
            if w == w_hi:
                if w_hi == sel_word:
                    # row m-1 horizontal delta, PRE-shift bits
                    if ph & sel_bit:
                        score += 1
                    elif mh & sel_bit:
                        score -= 1
            if ph & 0x80000000:
                hout = 1
            elif mh & 0x80000000:
                hout = -1
            else:
                hout = 0
            if w == w_hi and w_hi != sel_word:
                score += hout
            ph = ((ph << 1) & M32) | (1 if hin > 0 else 0)
            mh = ((mh << 1) & M32) | (1 if hin < 0 else 0)
            Pv[w] = mh | (~(xv | ph) & M32)
            Mv[w] = ph & xv
            hin = hout
    if w_hi < sel_word:
        # window never reached the pattern's last word (m - n > k after
        # clamp — cannot happen since n - m <= k and w_hi grows to
        # (n-1+k)//32 >= (m-1)//32), defensive:
        return k + 1
    return score


def Ph_bit(word: int, bit: int) -> bool:
    return bool(word & bit)


# ---------------------------------------------------------------------------
# Pallas kernel: the oracle above, vectorized over TB*LANES pairs/program.
# Layout identical to myers_striped (planes of (TB, LANES) vregs per word);
# the word loop runs over the strip's shared window [w_base, w_hi] only.
# ---------------------------------------------------------------------------

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .myers import pack_myers_bucket
from .myers_pallas import LANES, TB

C = 4  # text chars per strip (divides 16: a strip never straddles tpack words)


def _msb1(x):
    return jax.lax.shift_right_logical(x, jnp.int32(31))


def _banded_kernel(peq_ref, tpack_ref, nlen_ref, sel_ref, selw_ref,
                   mlen_ref, score0_ref, out_ref, pv_ref, mv_ref,
                   *, n_words: int, text_len: int, k: int):
    one = jnp.int32(1)
    zero = jnp.int32(0)
    zeros = jnp.zeros((TB, LANES), dtype=jnp.int32)
    ones = jnp.full((TB, LANES), 1, jnp.int32)
    neg1 = jnp.int32(-1)
    nlen = nlen_ref[:, :]
    selw = selw_ref[:, :]
    mlen = mlen_ref[:, :]
    score0 = score0_ref[:, :]

    def init_word(w, _):
        pv_ref[pl.ds(w * TB, TB), :] = jnp.full((TB, LANES), neg1, jnp.int32)
        mv_ref[pl.ds(w * TB, TB), :] = zeros
        return 0

    jax.lax.fori_loop(0, n_words, init_word, 0)

    n_strips = (text_len + C - 1) // C
    # constant window width: words covering [j0 - k, j0 + C - 1 + k]
    W_w = (C - 1 + 2 * k) // 32 + 2
    prev_hi0 = min(n_words - 1, (C - 1 + k) // 32)

    def strip(sidx, carry):
        score, captured, prev_hi = carry
        j0 = sidx * C
        w_base = jnp.maximum(0, (j0 - k) // 32)
        w_hi = jnp.minimum(n_words - 1, (j0 + C - 1 + k) // 32)
        # bottom entry (at most one word per strip, C <= 32): the new
        # word's claimed all-(+1)-down init is a score bump of 32 while
        # above the pattern's last word, m - 32w when reaching it
        entered = w_hi > prev_hi
        wnew = prev_hi + 1
        d_entry = jnp.where(
            jnp.broadcast_to(entered, (TB, LANES)),
            jnp.where(wnew < selw, 32,
                      jnp.where(wnew == selw, mlen - 32 * wnew, 0)),
            0).astype(jnp.int32)
        score = score + d_entry
        trow = tpack_ref[pl.ds((j0 // 16) * TB, TB), :]
        for c in range(C):
            sh = ((j0 + c) % 16) * 2
            ch = jax.lax.shift_right_logical(
                trow, jnp.broadcast_to(sh, trow.shape).astype(jnp.int32)) & 3
            is0 = ch == 0
            is1 = ch == 1
            is2 = ch == 2

            def word(t, wc):
                hp, hm, dsel = wc
                w = w_base + t
                active = w <= w_hi
                base = w * TB
                pA = peq_ref[pl.ds((0 * n_words) * TB + base, TB), :]
                pC = peq_ref[pl.ds((1 * n_words) * TB + base, TB), :]
                pG = peq_ref[pl.ds((2 * n_words) * TB + base, TB), :]
                pT = peq_ref[pl.ds((3 * n_words) * TB + base, TB), :]
                eq = jnp.where(is0, pA,
                               jnp.where(is1, pC, jnp.where(is2, pG, pT)))
                pv = pv_ref[pl.ds(base, TB), :]
                mv = mv_ref[pl.ds(base, TB), :]
                xv = eq | mv
                eqh = eq | hm  # hin < 0 injects bit 0
                tt = eqh & pv
                d0 = ((tt + pv) ^ pv) | eqh
                ph = mv | ~(d0 | pv)
                mh = pv & d0
                selm = sel_ref[pl.ds(base, TB), :]
                d_sel_w = jnp.where((ph & selm) != 0, one, zero) \
                    - jnp.where((mh & selm) != 0, one, zero)
                hp_n = _msb1(ph)
                hm_n = _msb1(mh)
                ph = jax.lax.shift_left(ph, ones) | hp
                mh = jax.lax.shift_left(mh, ones) | hm
                pv_n = mh | ~(xv | ph)
                mv_n = ph & xv
                act = jnp.broadcast_to(active, (TB, LANES))
                pv_ref[pl.ds(base, TB), :] = jnp.where(act, pv_n, pv)
                mv_ref[pl.ds(base, TB), :] = jnp.where(act, mv_n, mv)
                return (jnp.where(act, hp_n, hp),
                        jnp.where(act, hm_n, hm),
                        dsel + jnp.where(act, d_sel_w, zero))

            hp, hm, dsel = jax.lax.fori_loop(0, W_w, word,
                                             (ones, zeros, zeros))
            use_sel = selw <= w_hi
            score = score + jnp.where(use_sel, dsel, hp - hm)
            captured = jnp.where(j0 + c + 1 == nlen, score, captured)
        return score, captured, w_hi

    _, captured, _ = jax.lax.fori_loop(
        0, n_strips, strip, (score0, jnp.zeros((TB, LANES), jnp.int32),
                             jnp.int32(prev_hi0)))
    out_ref[:, :] = captured


@functools.partial(jax.jit, static_argnames=("n_words", "text_len", "k",
                                             "interpret"))
def myers_banded_pallas(peq, tpack, nlen, sel, selw, mlen, score0,
                        n_words: int, text_len: int, k: int,
                        interpret: bool = False):
    n_prog = nlen.shape[0] // TB
    n_twords = (text_len + 15) // 16
    kernel = functools.partial(_banded_kernel, n_words=n_words,
                               text_len=text_len, k=k)
    pair_spec = pl.BlockSpec((TB, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    word_spec = pl.BlockSpec((n_words * TB, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((4 * n_words * TB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_twords * TB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pair_spec, word_spec, pair_spec, pair_spec, pair_spec,
        ],
        out_specs=pair_spec,
        out_shape=jax.ShapeDtypeStruct((nlen.shape[0], LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((n_words * TB, LANES), jnp.int32),
            pltpu.VMEM((n_words * TB, LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(peq, tpack, nlen, sel, selw, mlen, score0)


def _to_planes(arr_b: np.ndarray, n_prog: int) -> np.ndarray:
    lead = arr_b.shape[:-1]
    planes = arr_b.reshape(lead + (n_prog, TB, LANES))
    planes = np.moveaxis(planes, -3, 0)
    return np.ascontiguousarray(planes).reshape(-1, LANES)


def myers_banded_launch(pairs: List[Tuple[str, str]], n_words: int,
                        text_len: int, k: int, interpret: bool = False):
    """Async banded dispatch for one (n_words, text_len, k) bucket.
    Returns a device handle; scores > k mean 'escalate'. Caller guarantees
    every pair is ACGT with shorter side <= n_words*32, longer <= text_len,
    and |len(x)-len(y)| <= k."""
    PAIRS = TB * LANES
    peq, tpack, mlen, nlen, sel_word, sel_bit = pack_myers_bucket(
        pairs, n_words, text_len, batch_pad=PAIRS)
    B = peq.shape[2]
    n_prog = B // PAIRS
    words = np.arange(n_words)[:, None]
    sel_mask = np.where(words == sel_word[None, :], sel_bit[None, :],
                        np.uint32(0)).astype(np.uint32)
    prev_hi0 = min(n_words - 1, (C - 1 + k) // 32)
    score0 = np.where(sel_word <= prev_hi0, mlen,
                      np.int32(32 * (prev_hi0 + 1))).astype(np.int32)
    # padded slots: mlen = 0 -> sel_word = 0 <= prev_hi0 -> score0 = 0, and
    # nlen = 0 never captures; out stays 0
    args = [
        jnp.asarray(_to_planes(peq.view(np.int32), n_prog)),
        jnp.asarray(_to_planes(tpack.view(np.int32), n_prog)),
        jnp.asarray(_to_planes(nlen[None, :], n_prog)),
        jnp.asarray(_to_planes(sel_mask.view(np.int32), n_prog)),
        jnp.asarray(_to_planes(sel_word[None, :], n_prog)),
        jnp.asarray(_to_planes(mlen[None, :], n_prog)),
        jnp.asarray(_to_planes(score0[None, :], n_prog)),
    ]
    return myers_banded_pallas(*args, n_words=n_words, text_len=text_len,
                               k=k, interpret=interpret)


def myers_banded_distances(pairs: List[Tuple[str, str]], n_words: int,
                           text_len: int, k: int,
                           interpret: bool = False) -> np.ndarray:
    """Synchronous banded distances (one launch + one D2H); values > k
    mean the band must escalate."""
    dev = myers_banded_launch(pairs, n_words, text_len, k,
                              interpret=interpret)
    return np.asarray(dev).reshape(-1)[: len(pairs)].astype(np.int64)


# ---------------------------------------------------------------------------
# Pool-dedup launch: all-vs-all pair sets ship each unique sequence ONCE
# (per-seq peq bitmasks + 2-bit text words); per-pair plane expansion is an
# XLA gather that never leaves HBM (same rationale as myers_pool_pallas —
# the host->device link is the measured bottleneck through TPU tunnels).
# ---------------------------------------------------------------------------


def pack_peq_pool(seqs: List[str], n_words: int) -> np.ndarray:
    """(S, 4, n_words) int32: per-sequence Myers peq bitmask pool.

    Sequences longer than n_words*32 are TRUNCATED: the pool holds both
    pattern-role and text-role sequences, and a text-role sequence can
    legitimately exceed the pattern word budget — its peq row is never
    gathered (idx_pat only selects pattern-role entries, which the bucket
    constraint keeps <= n_words*32), so truncation is safe where erroring
    out silently demoted whole chunks to the striped kernel."""
    S = len(seqs)
    out = np.zeros((S, 4, n_words), dtype=np.uint32)
    L = n_words * 32
    code_of = np.full(256, 255, dtype=np.uint8)
    for ch, c in zip(b"ACGT", range(4)):
        code_of[ch] = c
    pad = b"\xff" * L
    buf = b"".join(s.encode()[:L] + pad[min(len(s), L):] for s in seqs)
    codes = code_of[np.frombuffer(buf, np.uint8).reshape(S, L)]
    for c in range(4):
        bits = codes == c
        out[:, c, :] = np.packbits(bits, axis=1,
                                   bitorder="little").view(np.uint32)
    return out.view(np.int32)


def pack_text_pool(seqs: List[str], n_twords: int) -> np.ndarray:
    """(S, n_twords) int32: 2-bit packed text pool (16 chars/word)."""
    from .myers_pallas import pack_pool_2bit

    return pack_pool_2bit(seqs, n_twords)


@functools.partial(jax.jit, static_argnames=("n_words", "text_len", "k",
                                             "interpret"))
def myers_banded_pool_pallas(pool_peq, pool_t, idx_p, idx_t, nlen, selw,
                             mlen, score0, sel_bit,
                             n_words: int, text_len: int, k: int,
                             interpret: bool = False):
    n_twords = (text_len + 15) // 16
    B = idx_p.shape[0]
    PAIRS = TB * LANES
    n_prog = B // PAIRS

    def planes(x):  # (B, d) -> (n_prog * d * TB, LANES) kernel row order
        d = x.shape[1]
        return x.reshape(n_prog, TB, LANES, d).transpose(0, 3, 1, 2) \
                .reshape(n_prog * d * TB, LANES)

    peq = planes(pool_peq[idx_p, :, :n_words].reshape(B, 4 * n_words))
    tpack = planes(pool_t[idx_t, :n_twords])
    w_iota = jnp.arange(n_words, dtype=jnp.int32)[None, :]
    sel_mask = jnp.where(w_iota == selw[:, None], sel_bit[:, None],
                         jnp.int32(0))
    sel = planes(sel_mask)

    def pair_plane(x):
        return x.reshape(n_prog * TB, LANES)

    return myers_banded_pallas(
        peq, tpack, pair_plane(nlen), sel, pair_plane(selw),
        pair_plane(mlen), pair_plane(score0),
        n_words=n_words, text_len=text_len, k=k, interpret=interpret)


def _dedup_oriented(oriented) -> Tuple[List[str], list, list]:
    """id()-keyed unique-sequence pool over (pattern, text) tuples ->
    (seqs, idx_p list, idx_t list). Shared by the End2End and ends-free
    pool launches (a fix to the dedup applies once)."""
    uniq: dict = {}
    uniq_get = uniq.get
    idx_p_l: list = []
    idx_t_l: list = []
    for p, t in oriented:
        h = id(p)
        row = uniq_get(h)
        if row is None:
            row = uniq[h] = (len(uniq), p)
        idx_p_l.append(row[0])
        h = id(t)
        row = uniq_get(h)
        if row is None:
            row = uniq[h] = (len(uniq), t)
        idx_t_l.append(row[0])
    seqs: List[str] = [None] * len(uniq)  # type: ignore
    for _h, (row, s) in uniq.items():
        seqs[row] = s
    return seqs, idx_p_l, idx_t_l


def myers_banded_pool_launch_indexed(pv, members, n_words: int,
                                     text_len: int, k: int,
                                     interpret: bool = False):
    """myers_banded_pool_launch over an IndexedPairs view: orientation and
    dedup are numpy index math (np.unique over the chunk's index arrays)
    instead of a ~2.5 us/pair python loop — the banded ladder's host cost
    at refscale (19900 pairs x several rungs per region)."""
    PAIRS = TB * LANES
    members = np.asarray(members, dtype=np.int64)
    B = len(members)
    Bp = PAIRS
    while Bp < B:
        Bp += PAIRS
    xi = pv.xi[members]
    yi = pv.yi[members]
    lx = pv.lens[xi]
    ly = pv.lens[yi]
    swap = lx > ly
    pi = np.where(swap, yi, xi)
    ti = np.where(swap, xi, yi)
    mlen_l = np.where(swap, ly, lx).astype(np.int32)
    nlen_l = np.where(swap, lx, ly).astype(np.int32)
    cat = np.concatenate([pi, ti])
    u, inv = np.unique(cat, return_inverse=True)
    seqs = [pv.seqs[int(s)] for s in u]
    n_twords = (text_len + 15) // 16
    pool_peq = pack_peq_pool(seqs, n_words)
    pool_t = pack_text_pool(seqs, n_twords)
    idx_p = np.zeros(Bp, dtype=np.int32)
    idx_t = np.zeros(Bp, dtype=np.int32)
    mlen = np.zeros(Bp, dtype=np.int32)
    nlen = np.zeros(Bp, dtype=np.int32)
    idx_p[:B] = inv[:B]
    idx_t[:B] = inv[B:]
    mlen[:B] = mlen_l
    nlen[:B] = nlen_l
    sel_word = np.maximum(mlen - 1, 0) // 32
    sel_bit = np.int32(1) << (np.maximum(mlen - 1, 0) % 32).astype(np.int32)
    prev_hi0 = min(n_words - 1, (C - 1 + k) // 32)
    score0 = np.where(sel_word <= prev_hi0, mlen,
                      np.int32(32 * (prev_hi0 + 1))).astype(np.int32)
    return myers_banded_pool_pallas(
        jnp.asarray(pool_peq), jnp.asarray(pool_t), jnp.asarray(idx_p),
        jnp.asarray(idx_t), jnp.asarray(nlen),
        jnp.asarray(sel_word.astype(np.int32)), jnp.asarray(mlen),
        jnp.asarray(score0), jnp.asarray(sel_bit),
        n_words=n_words, text_len=text_len, k=k, interpret=interpret)


def myers_banded_pool_launch(pairs: List[Tuple[str, str]], n_words: int,
                             text_len: int, k: int,
                             interpret: bool = False):
    """Async pool-dedup banded dispatch (same contract as
    myers_banded_launch; scores > k escalate)."""
    PAIRS = TB * LANES
    B = len(pairs)
    Bp = PAIRS
    while Bp < B:
        Bp += PAIRS
    oriented = []
    mlen_l: list = []
    nlen_l: list = []
    for x, y in pairs:
        lx, ly = len(x), len(y)
        if lx <= ly:
            oriented.append((x, y))
            mlen_l.append(lx)
            nlen_l.append(ly)
        else:
            oriented.append((y, x))
            mlen_l.append(ly)
            nlen_l.append(lx)
    seqs, idx_p_l, idx_t_l = _dedup_oriented(oriented)
    n_twords = (text_len + 15) // 16
    pool_peq = pack_peq_pool(seqs, n_words)
    pool_t = pack_text_pool(seqs, n_twords)
    idx_p = np.zeros(Bp, dtype=np.int32)
    idx_t = np.zeros(Bp, dtype=np.int32)
    mlen = np.zeros(Bp, dtype=np.int32)
    nlen = np.zeros(Bp, dtype=np.int32)
    idx_p[:B] = idx_p_l
    idx_t[:B] = idx_t_l
    mlen[:B] = mlen_l
    nlen[:B] = nlen_l
    sel_word = np.maximum(mlen - 1, 0) // 32
    sel_bit = np.int32(1) << (np.maximum(mlen - 1, 0) % 32).astype(np.int32)
    prev_hi0 = min(n_words - 1, (C - 1 + k) // 32)
    score0 = np.where(sel_word <= prev_hi0, mlen,
                      np.int32(32 * (prev_hi0 + 1))).astype(np.int32)
    return myers_banded_pool_pallas(
        jnp.asarray(pool_peq), jnp.asarray(pool_t), jnp.asarray(idx_p),
        jnp.asarray(idx_t), jnp.asarray(nlen),
        jnp.asarray(sel_word.astype(np.int32)), jnp.asarray(mlen),
        jnp.asarray(score0), jnp.asarray(sel_bit),
        n_words=n_words, text_len=text_len, k=k, interpret=interpret)


# ---------------------------------------------------------------------------
# Ends-free banded Myers (reference analignments.cpp:88-96: one-sided free
# ends sized by the length difference). Orientation: the Myers PATTERN is
# the free-less (shorter) side, the TEXT carries the frees (tb leading, te
# trailing) — exactly myers_striped_ends_free's transposition, but on the
# Ukkonen window instead of the full matrix.
#
# Window: any optimal path with <= k edits starts on diagonal j0 in
# [0, tb] (D[0][j] = max(0, j - tb) is free up to tb) and never drifts
# more than k diagonals, so covering diagonals [-k, KLO + k] with
# KLO >= tb suffices: per column j the live rows are [j - KLO - k, j + k].
# Both band boundaries (top hin, bottom word entry) only ever RAISE
# in-band values, so the banded result is >= the true ends-free distance
# and EQUAL whenever that distance is <= k — the engine's standard
# ``computed <= k`` escalation ladder applies unchanged.
#
# Deltas vs the End2End kernel:
#   * the top boundary at w_lo == 0 injects hin = (j > tb ? +1 : 0)
#     (D[0][j] = max(0, j - tb)); deeper windows keep the +1-per-column
#     over-estimate;
#   * the score is a RUNNING MIN of D[m][j] over the free trailing range
#     j in [n - te, n], captured only while the window still covers the
#     pattern's last row (columns past m + KLO + k cannot host an
#     optimum with <= k edits: end diagonal <= start + k <= tb + k).
# ---------------------------------------------------------------------------


def myers_banded_ends_free_ref(pattern: str, text: str, tb: int, te: int,
                               k: int, klo: int, strip: int = 4) -> int:
    """Word-exact oracle of the banded ends-free kernel (pattern has no
    frees; tb/te are TEXT begin/end frees; klo >= tb sizes the window's
    lower extent). Returns the banded score (== exact ends-free distance
    iff it is <= k)."""
    m, n = len(pattern), len(text)
    if m == 0:
        return max(0, n - tb - te)
    if n == 0:
        return m
    n_words = (m + 31) // 32
    sel_word = (m - 1) // 32
    sel_bit = 1 << ((m - 1) % 32)
    peq = _build_peq(pattern, n_words)
    tcodes = _codes2(text)

    Pv = [M32] * n_words
    Mv = [0] * n_words
    w_hi0 = min(sel_word, (strip - 1 + k) // 32)
    w_hi = w_hi0
    score = 32 * (w_hi + 1) if w_hi < sel_word else m
    best = 1 << 30
    free_lo = max(0, n - te)
    for j in range(1, n + 1):
        jc = j - 1
        j0 = (jc // strip) * strip
        w_lo = max(0, (j0 - klo - k) // 32)
        want_hi = min(sel_word, (j0 + strip - 1 + k) // 32)
        while w_hi < want_hi:
            w_hi += 1
            Pv[w_hi] = M32
            Mv[w_hi] = 0
            score = score + 32 if w_hi < sel_word else score + (
                m - 32 * w_hi)
        sel_covered = w_lo <= sel_word <= w_hi
        hin = 0 if (w_lo == 0 and j <= tb) else 1
        ch = int(tcodes[jc])
        for w in range(w_lo, w_hi + 1):
            eq = peq[ch][w]
            pv, mv = Pv[w], Mv[w]
            xv = eq | mv
            if hin < 0:
                eq |= 1
            x = eq
            d0 = ((((x & pv) + pv) & M32) ^ pv) | x
            ph = mv | (~(d0 | pv) & M32)
            mh = pv & d0
            if w == w_hi:
                if w_hi == sel_word:
                    if ph & sel_bit:
                        score += 1
                    elif mh & sel_bit:
                        score -= 1
            if ph & 0x80000000:
                hout = 1
            elif mh & 0x80000000:
                hout = -1
            else:
                hout = 0
            if w == w_hi and w_hi != sel_word:
                score += hout
            ph = ((ph << 1) & M32) | (1 if hin > 0 else 0)
            mh = ((mh << 1) & M32) | (1 if hin < 0 else 0)
            Pv[w] = mh | (~(xv | ph) & M32)
            Mv[w] = ph & xv
            hin = hout
    # capture the row-m running min over the free trailing range while
    # the window covers the last pattern word
        if sel_covered and w_hi == sel_word and j >= free_lo:
            if score < best:
                best = score
    return best


def _banded_ef_kernel(peq_ref, tpack_ref, nlen_ref, sel_ref, selw_ref,
                      mlen_ref, score0_ref, tb_ref, te_ref, out_ref,
                      pv_ref, mv_ref,
                      *, n_words: int, text_len: int, k: int, klo: int):
    """Ends-free variant of _banded_kernel (see section comment above):
    window lower extent widened by ``klo`` (>= every pair's tb), per-pair
    free-begin boundary injection, running-min capture over the free
    trailing range. Identical word math otherwise."""
    one = jnp.int32(1)
    zero = jnp.int32(0)
    zeros = jnp.zeros((TB, LANES), dtype=jnp.int32)
    ones = jnp.full((TB, LANES), 1, jnp.int32)
    neg1 = jnp.int32(-1)
    nlen = nlen_ref[:, :]
    selw = selw_ref[:, :]
    mlen = mlen_ref[:, :]
    score0 = score0_ref[:, :]
    tbv = tb_ref[:, :]
    tev = te_ref[:, :]
    big = jnp.full((TB, LANES), 1 << 30, jnp.int32)

    def init_word(w, _):
        pv_ref[pl.ds(w * TB, TB), :] = jnp.full((TB, LANES), neg1, jnp.int32)
        mv_ref[pl.ds(w * TB, TB), :] = zeros
        return 0

    jax.lax.fori_loop(0, n_words, init_word, 0)

    n_strips = (text_len + C - 1) // C
    W_w = (C - 1 + klo + 2 * k) // 32 + 2
    prev_hi0 = min(n_words - 1, (C - 1 + k) // 32)

    def strip(sidx, carry):
        score, captured, prev_hi = carry
        j0 = sidx * C
        w_base = jnp.maximum(0, (j0 - klo - k) // 32)
        w_hi = jnp.minimum(n_words - 1, (j0 + C - 1 + k) // 32)
        entered = w_hi > prev_hi
        wnew = prev_hi + 1
        d_entry = jnp.where(
            jnp.broadcast_to(entered, (TB, LANES)),
            jnp.where(wnew < selw, 32,
                      jnp.where(wnew == selw, mlen - 32 * wnew, 0)),
            0).astype(jnp.int32)
        score = score + d_entry
        trow = tpack_ref[pl.ds((j0 // 16) * TB, TB), :]
        at_row0 = w_base == 0
        for c in range(C):
            sh = ((j0 + c) % 16) * 2
            ch = jax.lax.shift_right_logical(
                trow, jnp.broadcast_to(sh, trow.shape).astype(jnp.int32)) & 3
            is0 = ch == 0
            is1 = ch == 1
            is2 = ch == 2
            # free-begin boundary: D[0][j] = max(0, j - tb) -> the +1
            # injection at row 0 is suppressed while j <= tb (only when
            # the window still starts at word 0; deeper windows keep the
            # +1-per-column band over-estimate)
            hp0 = jnp.where(jnp.broadcast_to(at_row0, (TB, LANES))
                            & (j0 + c + 1 <= tbv), zeros, ones)

            def word(t, wc):
                hp, hm, dsel = wc
                w = w_base + t
                active = w <= w_hi
                base = w * TB
                pA = peq_ref[pl.ds((0 * n_words) * TB + base, TB), :]
                pC = peq_ref[pl.ds((1 * n_words) * TB + base, TB), :]
                pG = peq_ref[pl.ds((2 * n_words) * TB + base, TB), :]
                pT = peq_ref[pl.ds((3 * n_words) * TB + base, TB), :]
                eq = jnp.where(is0, pA,
                               jnp.where(is1, pC, jnp.where(is2, pG, pT)))
                pv = pv_ref[pl.ds(base, TB), :]
                mv = mv_ref[pl.ds(base, TB), :]
                xv = eq | mv
                eqh = eq | hm
                tt = eqh & pv
                d0 = ((tt + pv) ^ pv) | eqh
                ph = mv | ~(d0 | pv)
                mh = pv & d0
                selm = sel_ref[pl.ds(base, TB), :]
                d_sel_w = jnp.where((ph & selm) != 0, one, zero) \
                    - jnp.where((mh & selm) != 0, one, zero)
                hp_n = _msb1(ph)
                hm_n = _msb1(mh)
                ph = jax.lax.shift_left(ph, ones) | hp
                mh = jax.lax.shift_left(mh, ones) | hm
                pv_n = mh | ~(xv | ph)
                mv_n = ph & xv
                act = jnp.broadcast_to(active, (TB, LANES))
                pv_ref[pl.ds(base, TB), :] = jnp.where(act, pv_n, pv)
                mv_ref[pl.ds(base, TB), :] = jnp.where(act, mv_n, mv)
                return (jnp.where(act, hp_n, hp),
                        jnp.where(act, hm_n, hm),
                        dsel + jnp.where(act, d_sel_w, zero))

            hp, hm, dsel = jax.lax.fori_loop(0, W_w, word,
                                             (hp0, zeros, zeros))
            use_sel = selw <= w_hi
            score = score + jnp.where(use_sel, dsel, hp - hm)
            # running-min capture over the free trailing range, only while
            # the window covers the pattern's last word (columns past
            # m + klo + k cannot host a <= k optimum)
            j = j0 + c + 1
            cover = (selw >= w_base) & (selw <= w_hi)
            cond = cover & (j >= nlen - tev) & (j <= nlen)
            captured = jnp.where(cond, jnp.minimum(captured, score),
                                 captured)
        return score, captured, w_hi

    _, captured, _ = jax.lax.fori_loop(
        0, n_strips, strip, (score0, big, jnp.int32(prev_hi0)))
    out_ref[:, :] = captured


@functools.partial(jax.jit, static_argnames=("n_words", "text_len", "k",
                                             "klo", "interpret"))
def myers_banded_ef_pool_pallas(pool_peq, pool_t, idx_p, idx_t, nlen, selw,
                                mlen, score0, sel_bit, tbv, tev,
                                n_words: int, text_len: int, k: int,
                                klo: int, interpret: bool = False):
    n_twords = (text_len + 15) // 16
    B = idx_p.shape[0]
    PAIRS = TB * LANES
    n_prog = B // PAIRS

    def planes(x):
        d = x.shape[1]
        return x.reshape(n_prog, TB, LANES, d).transpose(0, 3, 1, 2) \
                .reshape(n_prog * d * TB, LANES)

    peq = planes(pool_peq[idx_p, :, :n_words].reshape(B, 4 * n_words))
    tpack = planes(pool_t[idx_t, :n_twords])
    w_iota = jnp.arange(n_words, dtype=jnp.int32)[None, :]
    sel_mask = jnp.where(w_iota == selw[:, None], sel_bit[:, None],
                         jnp.int32(0))
    sel = planes(sel_mask)

    def pair_plane(x):
        return x.reshape(n_prog * TB, LANES)

    kernel = functools.partial(_banded_ef_kernel, n_words=n_words,
                               text_len=text_len, k=k, klo=klo)
    pair_spec = pl.BlockSpec((TB, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    word_spec = pl.BlockSpec((n_words * TB, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    n_twords_ = (text_len + 15) // 16
    return pl.pallas_call(
        kernel,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((4 * n_words * TB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_twords_ * TB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pair_spec, word_spec, pair_spec, pair_spec, pair_spec,
            pair_spec, pair_spec,
        ],
        out_specs=pair_spec,
        out_shape=jax.ShapeDtypeStruct((B // LANES, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((n_words * TB, LANES), jnp.int32),
            pltpu.VMEM((n_words * TB, LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(peq, tpack, pair_plane(nlen), sel, pair_plane(selw),
      pair_plane(mlen), pair_plane(score0), pair_plane(tbv),
      pair_plane(tev))


def myers_banded_ends_free_launch(jobs, n_words: int, text_len: int,
                                  k: int, klo: int,
                                  interpret: bool = False):
    """Async pool-dedup banded ends-free dispatch. ``jobs`` are
    (pattern, text, tb, te) with pattern = the FREE-LESS side (caller
    orients; len(text) >= len(pattern) by construction since the frees
    equal the length difference), tb <= klo for every job. Scores > k mean
    'escalate the rung'."""
    PAIRS = TB * LANES
    B = len(jobs)
    Bp = PAIRS
    while Bp < B:
        Bp += PAIRS
    seqs, idx_p_l, idx_t_l = _dedup_oriented(
        [(p, t) for p, t, _tb, _te in jobs])
    n_twords = (text_len + 15) // 16
    pool_peq = pack_peq_pool(seqs, n_words)
    pool_t = pack_text_pool(seqs, n_twords)
    idx_p = np.zeros(Bp, dtype=np.int32)
    idx_t = np.zeros(Bp, dtype=np.int32)
    mlen = np.zeros(Bp, dtype=np.int32)
    nlen = np.zeros(Bp, dtype=np.int32)
    tbv = np.zeros(Bp, dtype=np.int32)
    tev = np.zeros(Bp, dtype=np.int32)
    idx_p[:B] = idx_p_l
    idx_t[:B] = idx_t_l
    mlen[:B] = [len(j[0]) for j in jobs]
    nlen[:B] = [len(j[1]) for j in jobs]
    tbv[:B] = [j[2] for j in jobs]
    tev[:B] = [j[3] for j in jobs]
    sel_word = np.maximum(mlen - 1, 0) // 32
    sel_bit = np.int32(1) << (np.maximum(mlen - 1, 0) % 32).astype(np.int32)
    prev_hi0 = min(n_words - 1, (C - 1 + k) // 32)
    score0 = np.where(sel_word <= prev_hi0, mlen,
                      np.int32(32 * (prev_hi0 + 1))).astype(np.int32)
    return myers_banded_ef_pool_pallas(
        jnp.asarray(pool_peq), jnp.asarray(pool_t), jnp.asarray(idx_p),
        jnp.asarray(idx_t), jnp.asarray(nlen),
        jnp.asarray(sel_word.astype(np.int32)), jnp.asarray(mlen),
        jnp.asarray(score0), jnp.asarray(sel_bit), jnp.asarray(tbv),
        jnp.asarray(tev),
        n_words=n_words, text_len=text_len, k=k, klo=klo,
        interpret=interpret)
