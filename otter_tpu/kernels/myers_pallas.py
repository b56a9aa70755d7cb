"""Pallas TPU kernel for batched Myers bit-parallel edit distance.

Layout: each program instance owns TB x 128 pairs (sublanes x lanes). The
Pv/Mv column state lives in VMEM scratch (NOT fori_loop carries — carrying
2*n_words vregs spills every iteration), and the text dimension is
strip-mined: each visit to a pattern word advances CSTRIP text characters
while the word's state and 4 Peq planes stay in registers. That amortizes
the per-word VMEM traffic (4 peq + sel + 2 loads + 2 stores) over CSTRIP
column updates. All math is int32 bitwise; the carry-out of a+b+cin is the
MSB of (a & b) | ((a | b) & ~sum) with sum = a+b+cin (full-adder majority),
avoiding unsigned compares.

Per text char and word: ~34 vector ALU ops + ~2 VMEM ops advancing 32 DP
cells/lane — ~1.1 lane-ops per DP cell, ~25x fewer than the banded row
kernel, with no band-retry ladder (the full DP is computed, always exact).

Host packing comes from kernels/myers.py::pack_myers_bucket.
"""

from __future__ import annotations

import functools
import os
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB = 8          # sublane rows of pairs per program
LANES = 128
PAIRS_PER_PROG = TB * LANES
CSTRIP = 4      # text chars advanced per pattern-word visit (must divide 16)


def _msb1(x):
    return jax.lax.shift_right_logical(x, jnp.int32(31))


def _carry_out(a, b, s):
    """MSB carry-out of the full add s = a + b + cin (full-adder majority,
    valid at every bit of a ripple-carry add, read at the MSB)."""
    return _msb1((a & b) | ((a | b) & ~s))


def _strip_phase(peq_ref, sel_ref, tpack_ref, nlen, score0, out_ref,
                 pv_ref, mv_ref, *, n_words: int, text_len: int,
                 t_off: int = 0):
    """Main text loop shared by the plane-input and packed-pattern kernels:
    peq_ref/sel_ref may be VMEM inputs or VMEM scratch (already filled).
    t_off: row offset of the text planes inside tpack_ref (nonzero when the
    fused-input kernel passes the whole per-program block)."""
    zero = jnp.int32(0)
    one = jnp.int32(1)
    C = CSTRIP

    zeros = jnp.zeros((TB, LANES), dtype=jnp.int32)
    ones = jnp.full((TB, LANES), 1, dtype=jnp.int32)

    # static trip count (a dynamic bound from max(nlen) lowers to a Mosaic
    # while-loop that cannot be software-pipelined — measured 2-3x slower
    # than the padded static loop). Padding waste is bounded instead by the
    # host's fine text buckets (pow2/8 steps, edit_pallas._myers_dispatch).
    n_strips = (text_len + C - 1) // C  # strips never cross a 16-char word

    def strip(s, carry):
        score, captured = carry
        j0 = s * C
        trow = tpack_ref[pl.ds(t_off + (j0 // 16) * TB, TB), :]
        isel = []
        for c in range(C):
            sh = jnp.broadcast_to((j0 + c) % 16 * 2, trow.shape)
            ch = jax.lax.shift_right_logical(trow, sh.astype(jnp.int32)) & 3
            isel.append((ch == 0, ch == 1, ch == 2))

        def word(w, wc):
            ca = list(wc[0:C])
            cp = list(wc[C : 2 * C])
            cm = list(wc[2 * C : 3 * C])
            d = list(wc[3 * C : 4 * C])
            base = w * TB
            pA = peq_ref[pl.ds(0 * n_words * TB + base, TB), :]
            pC = peq_ref[pl.ds(1 * n_words * TB + base, TB), :]
            pG = peq_ref[pl.ds(2 * n_words * TB + base, TB), :]
            pT = peq_ref[pl.ds(3 * n_words * TB + base, TB), :]
            sel = sel_ref[pl.ds(base, TB), :]
            Pv = pv_ref[pl.ds(base, TB), :]
            Mv = mv_ref[pl.ds(base, TB), :]
            for c in range(C):
                is0, is1, is2 = isel[c]
                Eq = jnp.where(is0, pA,
                               jnp.where(is1, pC, jnp.where(is2, pG, pT)))
                Xv = Eq | Mv
                t = Eq & Pv
                ssum = t + Pv + ca[c]
                ca[c] = _carry_out(t, Pv, ssum)
                Xh = (ssum ^ Pv) | Eq
                Ph = Mv | ~(Xh | Pv)
                Mh = Pv & Xh
                d[c] = d[c] + jnp.where((Ph & sel) != 0, one, zero) \
                    - jnp.where((Mh & sel) != 0, one, zero)
                ph_out = _msb1(Ph)
                mh_out = _msb1(Mh)
                Ph = jax.lax.shift_left(Ph, ones) | cp[c]
                Mh = jax.lax.shift_left(Mh, ones) | cm[c]
                cp[c] = ph_out
                cm[c] = mh_out
                Pv = Mh | ~(Xv | Ph)
                Mv = Ph & Xv
            pv_ref[pl.ds(base, TB), :] = Pv
            mv_ref[pl.ds(base, TB), :] = Mv
            return tuple(ca) + tuple(cp) + tuple(cm) + tuple(d)

        init = tuple([zeros] * C) + tuple([ones] * C) + tuple([zeros] * C) \
            + tuple([zeros] * C)
        wc = jax.lax.fori_loop(0, n_words, word, init)
        d = wc[3 * C : 4 * C]
        for c in range(C):
            score = score + d[c]
            captured = jnp.where(nlen == j0 + c + 1, score, captured)
        return score, captured

    _, captured = jax.lax.fori_loop(0, n_strips, strip, (score0, score0))
    out_ref[:, :] = captured


def _myers_kernel(peq_ref, tpack_ref, nlen_ref, sel_ref, minit_ref, out_ref,
                  pv_ref, mv_ref, *, n_words: int, text_len: int):
    neg1 = jnp.int32(-1)
    zeros = jnp.zeros((TB, LANES), dtype=jnp.int32)

    def init_word(w, _):
        pv_ref[pl.ds(w * TB, TB), :] = jnp.full((TB, LANES), neg1, jnp.int32)
        mv_ref[pl.ds(w * TB, TB), :] = zeros
        return 0

    jax.lax.fori_loop(0, n_words, init_word, 0)
    _strip_phase(peq_ref, sel_ref, tpack_ref, nlen_ref[:, :],
                 minit_ref[:, :], out_ref, pv_ref, mv_ref,
                 n_words=n_words, text_len=text_len)


def _myers_kernel_packed(ppack_ref, tpack_ref, nlen_ref, minit_ref, out_ref,
                         pv_ref, mv_ref, peq_ref, sel_ref, *, n_words: int,
                         text_len: int):
    """Packed-pattern variant: the pattern arrives 2-bit packed (16 chars
    per int32, same scheme as the text) and the 4 Peq planes + the score-row
    sel mask are expanded into VMEM scratch here — 2*n_words words/pair over
    the HBM (and host->device) link instead of peq+sel's 5*n_words.

    Pattern padding packs as 'A' (code 0), so Peq rows past m-1 hold garbage
    matches; harmless, because every dataflow in Myers' recurrence (the
    addition's carries, the Ph/Mh left shifts, the inter-word carry chain)
    moves strictly from lower rows to higher rows — the scored row m-1 can
    never observe rows above it."""
    neg1 = jnp.int32(-1)
    zeros = jnp.zeros((TB, LANES), dtype=jnp.int32)
    score0 = minit_ref[:, :]
    m1 = jnp.maximum(score0 - 1, 0)
    sel_w = m1 // 32
    sel_b = jnp.where(score0 > 0,
                      jax.lax.shift_left(jnp.full_like(score0, 1), m1 & 31),
                      0)

    def init_word(w, _):
        pv_ref[pl.ds(w * TB, TB), :] = jnp.full((TB, LANES), neg1, jnp.int32)
        mv_ref[pl.ds(w * TB, TB), :] = zeros
        p0 = ppack_ref[pl.ds((2 * w) * TB, TB), :]
        p1 = ppack_ref[pl.ds((2 * w + 1) * TB, TB), :]
        accs = [zeros, zeros, zeros, zeros]
        for half, pw in ((0, p0), (1, p1)):
            for c in range(16):
                ch = jax.lax.shift_right_logical(
                    pw, jnp.int32(2 * c)) & 3 if c else pw & 3
                k = half * 16 + c
                bit = jnp.int32(-(1 << 31)) if k == 31 else jnp.int32(1 << k)
                for x in range(4):
                    accs[x] = accs[x] | jnp.where(ch == x, bit, 0)
        for x in range(4):
            peq_ref[pl.ds((x * n_words + w) * TB, TB), :] = accs[x]
        sel_ref[pl.ds(w * TB, TB), :] = jnp.where(sel_w == w, sel_b, 0)
        return 0

    jax.lax.fori_loop(0, n_words, init_word, 0)
    _strip_phase(peq_ref, sel_ref, tpack_ref, nlen_ref[:, :], score0,
                 out_ref, pv_ref, mv_ref, n_words=n_words, text_len=text_len)


def _myers_kernel_fused(fused_ref, out_ref, pv_ref, mv_ref, peq_ref,
                        sel_ref, *, n_words: int, text_len: int):
    """Packed-pattern kernel over ONE fused input plane. Remote-TPU
    tunnels pay a fixed RPC latency per host->device transfer, so the four
    logical inputs (ppack, tpack, nlen, minit) ship as a single (rows, 128)
    int32 array; per program the rows are
      [0, 2*n_words*TB)               ppack
      [2*n_words*TB, +n_twords*TB)    tpack
      next TB                         nlen
      next TB                         minit
    (see fuse_packed_planes). Math identical to _myers_kernel_packed."""
    n_twords = (text_len + 15) // 16
    o_t = 2 * n_words * TB
    o_n = o_t + n_twords * TB
    o_m = o_n + TB
    neg1 = jnp.int32(-1)
    zeros = jnp.zeros((TB, LANES), dtype=jnp.int32)
    score0 = fused_ref[pl.ds(o_m, TB), :]
    nlen = fused_ref[pl.ds(o_n, TB), :]
    m1 = jnp.maximum(score0 - 1, 0)
    sel_w = m1 // 32
    sel_b = jnp.where(score0 > 0,
                      jax.lax.shift_left(jnp.full_like(score0, 1), m1 & 31),
                      0)

    def init_word(w, _):
        pv_ref[pl.ds(w * TB, TB), :] = jnp.full((TB, LANES), neg1, jnp.int32)
        mv_ref[pl.ds(w * TB, TB), :] = zeros
        p0 = fused_ref[pl.ds((2 * w) * TB, TB), :]
        p1 = fused_ref[pl.ds((2 * w + 1) * TB, TB), :]
        accs = [zeros, zeros, zeros, zeros]
        for half, pw in ((0, p0), (1, p1)):
            for c in range(16):
                ch = jax.lax.shift_right_logical(
                    pw, jnp.int32(2 * c)) & 3 if c else pw & 3
                k = half * 16 + c
                bit = jnp.int32(-(1 << 31)) if k == 31 else jnp.int32(1 << k)
                for x in range(4):
                    accs[x] = accs[x] | jnp.where(ch == x, bit, 0)
        for x in range(4):
            peq_ref[pl.ds((x * n_words + w) * TB, TB), :] = accs[x]
        sel_ref[pl.ds(w * TB, TB), :] = jnp.where(sel_w == w, sel_b, 0)
        return 0

    jax.lax.fori_loop(0, n_words, init_word, 0)
    _strip_phase(peq_ref, sel_ref, fused_ref, nlen, score0,
                 out_ref, pv_ref, mv_ref, n_words=n_words,
                 text_len=text_len, t_off=o_t)


def fuse_packed_planes(ppack, tpack, nlen, minit, n_prog: int) -> np.ndarray:
    """Interleave the four packed plane arrays into the fused per-program
    row layout _myers_kernel_fused expects (ONE H2D transfer)."""
    return np.concatenate([
        ppack.reshape(n_prog, -1, LANES),
        tpack.reshape(n_prog, -1, LANES),
        nlen.reshape(n_prog, TB, LANES),
        minit.reshape(n_prog, TB, LANES)], axis=1).reshape(-1, LANES)


@functools.partial(jax.jit,
                   static_argnames=("n_words", "text_len", "interpret"))
def myers_pallas_fused(fused: jnp.ndarray, n_words: int, text_len: int,
                       interpret: bool = False) -> jnp.ndarray:
    """Single-input packed-pattern launch; fused: (n_prog * rows_pp, 128)
    int32 built by fuse_packed_planes."""
    n_twords = (text_len + 15) // 16
    rows_pp = 2 * n_words * TB + n_twords * TB + 2 * TB
    n_prog = fused.shape[0] // rows_pp
    kernel = functools.partial(_myers_kernel_fused, n_words=n_words,
                               text_len=text_len)
    return pl.pallas_call(
        kernel,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((rows_pp, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_prog * TB, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((n_words * TB, LANES), jnp.int32),
            pltpu.VMEM((n_words * TB, LANES), jnp.int32),
            pltpu.VMEM((4 * n_words * TB, LANES), jnp.int32),
            pltpu.VMEM((n_words * TB, LANES), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n_prog * PAIRS_PER_PROG * text_len * n_words * 40,
            bytes_accessed=fused.size * 4,
            transcendentals=0),
        interpret=interpret,
    )(fused)


@functools.partial(jax.jit,
                   static_argnames=("n_words", "text_len", "interpret"))
def myers_pallas(peq: jnp.ndarray, tpack: jnp.ndarray, nlen: jnp.ndarray,
                 sel: jnp.ndarray, minit: jnp.ndarray,
                 n_words: int, text_len: int,
                 interpret: bool = False) -> jnp.ndarray:
    """Row-major flattened planes per program:
    peq:  (n_prog * 4 * n_words * TB, 128) int32
    tpack:(n_prog * n_twords * TB, 128) int32
    nlen/minit/out: (n_prog * TB, 128) int32
    sel:  (n_prog * n_words * TB, 128) int32
    """
    n_prog = nlen.shape[0] // TB
    n_twords = (text_len + 15) // 16
    kernel = functools.partial(_myers_kernel, n_words=n_words,
                               text_len=text_len)
    return pl.pallas_call(
        kernel,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((4 * n_words * TB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_twords * TB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_words * TB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_prog * TB, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((n_words * TB, LANES), jnp.int32),
            pltpu.VMEM((n_words * TB, LANES), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n_prog * PAIRS_PER_PROG * text_len * n_words * 40,
            bytes_accessed=(peq.size + tpack.size) * 4,
            transcendentals=0),
        interpret=interpret,
    )(peq, tpack, nlen, sel, minit)


@functools.partial(jax.jit,
                   static_argnames=("n_words", "text_len", "interpret"))
def myers_pallas_packed(ppack: jnp.ndarray, tpack: jnp.ndarray,
                        nlen: jnp.ndarray, minit: jnp.ndarray,
                        n_words: int, text_len: int,
                        interpret: bool = False) -> jnp.ndarray:
    """Packed-pattern launch; same plane layout as myers_pallas but the
    pattern input is ppack: (n_prog * 2 * n_words * TB, 128) int32 and the
    Peq/sel planes live in VMEM scratch (see _myers_kernel_packed)."""
    n_prog = nlen.shape[0] // TB
    n_twords = (text_len + 15) // 16
    kernel = functools.partial(_myers_kernel_packed, n_words=n_words,
                               text_len=text_len)
    return pl.pallas_call(
        kernel,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((2 * n_words * TB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_twords * TB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_prog * TB, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((n_words * TB, LANES), jnp.int32),
            pltpu.VMEM((n_words * TB, LANES), jnp.int32),
            pltpu.VMEM((4 * n_words * TB, LANES), jnp.int32),
            pltpu.VMEM((n_words * TB, LANES), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n_prog * PAIRS_PER_PROG * text_len * n_words * 40,
            bytes_accessed=(ppack.size + tpack.size) * 4,
            transcendentals=0),
        interpret=interpret,
    )(ppack, tpack, nlen, minit)


# ---------------------------------------------------------------------------
# Sequence-pool path: dedup H2D for all-vs-all pair sets
# ---------------------------------------------------------------------------

_POOL_CODE = np.zeros(256, dtype=np.uint32)
for _b, _c in ((65, 0), (67, 1), (71, 2), (84, 3)):  # matches myers._ACGT
    _POOL_CODE[_b] = _c
_POOL_SHIFTS = (np.arange(16, dtype=np.uint32) * 2).astype(np.uint32)


def pack_pool_2bit(seqs: List[str], n_words_pool: int) -> np.ndarray:
    """(S, n_words_pool) int32, each row a sequence 2-bit packed (16 chars
    per word, char j -> bits 2(j%16)..+1 of word j//16, padding packs as
    'A'=0) — the same scheme pack_myers_packed uses per pair."""
    out = np.zeros((len(seqs), n_words_pool), dtype=np.uint32)
    for s, seq in enumerate(seqs):
        codes = _POOL_CODE[np.frombuffer(seq.encode("latin-1"), np.uint8)]
        n = len(codes)
        W = (n + 15) // 16
        buf = np.zeros(W * 16, dtype=np.uint32)
        buf[:n] = codes
        out[s, :W] = np.bitwise_or.reduce(
            buf.reshape(W, 16) << _POOL_SHIFTS, axis=1)
    return out.view(np.int32)


@functools.partial(jax.jit,
                   static_argnames=("n_words", "text_len", "interpret"))
def myers_pool_pallas(pool: jnp.ndarray, idx_pat: jnp.ndarray,
                      idx_txt: jnp.ndarray, nlen: jnp.ndarray,
                      minit: jnp.ndarray, n_words: int, text_len: int,
                      interpret: bool = False) -> jnp.ndarray:
    """Packed-pattern Myers over a deduplicated sequence pool.

    The reference's hottest call sites are all-vs-all distance matrices
    (n(n-1)/2 pairs over n alleles, analignments.cpp:117-124), so shipping
    per-pair planes sends every sequence ~n/2 times over the host->device
    link — the measured bottleneck through remote-TPU tunnels (~45 MB/s).
    This wrapper ships each unique sequence ONCE (2-bit packed pool rows)
    plus two (B,) index arrays, and expands to the kernel's plane layout
    with an XLA gather+transpose that never leaves HBM.

    pool: (S, W_pool) int32 from pack_pool_2bit, W_pool >= max(2*n_words,
    ceil(text_len/16)); idx_pat/idx_txt/nlen/minit: (B,) int32 with B a
    multiple of PAIRS_PER_PROG (padding: idx 0, nlen/minit 0)."""
    n_twords = (text_len + 15) // 16
    B = idx_pat.shape[0]
    n_prog = B // PAIRS_PER_PROG

    def planes(x):  # (B, d) -> (n_prog * d * TB, LANES), kernel row order
        d = x.shape[1]
        return x.reshape(n_prog, TB, LANES, d).transpose(0, 3, 1, 2) \
                .reshape(n_prog * d * TB, LANES)

    ppack = planes(pool[idx_pat, : 2 * n_words])
    tpack = planes(pool[idx_txt, :n_twords])
    nlen_p = nlen.reshape(n_prog * TB, LANES)
    minit_p = minit.reshape(n_prog * TB, LANES)
    return myers_pallas_packed(ppack, tpack, nlen_p, minit_p,
                               n_words, text_len, interpret=interpret)


def myers_pool_dispatch(pairs: List[Tuple[str, str]], n_words: int,
                        text_len: int, interpret: bool = False,
                        pad_to: int = PAIRS_PER_PROG):
    """Pool-dedup launch (async). Returns None when dedup would not cut
    H2D bytes by at least ~30% (the caller then uses myers_dispatch)."""
    n_twords = (text_len + 15) // 16
    W_pool = max(2 * n_words, n_twords)
    uniq: dict = {}
    uniq_get = uniq.get
    np_ = len(pairs)
    # python lists + one bulk np conversion: per-element numpy scalar
    # stores are ~10x a list append in this loop
    idx_p_l: list = []
    idx_t_l: list = []
    nlens_l: list = []
    minits_l: list = []
    ip_app = idx_p_l.append
    it_app = idx_t_l.append
    nl_app = nlens_l.append
    mi_app = minits_l.append
    for x, y in pairs:
        lx = len(x)
        ly = len(y)
        if lx <= ly:
            p, t = x, y
            mi_app(lx)
            nl_app(ly)
        else:
            p, t = y, x
            mi_app(ly)
            nl_app(lx)
        h = id(p)
        row = uniq_get(h)
        if row is None:
            row = uniq[h] = (len(uniq), p)
        ip_app(row[0])
        h = id(t)
        row = uniq_get(h)
        if row is None:
            row = uniq[h] = (len(uniq), t)
        it_app(row[0])
    idx_p = np.array(idx_p_l, dtype=np.int32)
    idx_t = np.array(idx_t_l, dtype=np.int32)
    nlens = np.array(nlens_l, dtype=np.int32)
    minits = np.array(minits_l, dtype=np.int32)
    S = len(uniq)
    Sp = 8
    while Sp < S:
        Sp *= 2
    B = max(pad_to, PAIRS_PER_PROG)
    # the direct path ships its PADDED plane batch, so compare at B
    direct_bytes = B * (2 * n_words + n_twords + 2) * 4
    pool_bytes = Sp * W_pool * 4 + B * 16
    if pool_bytes > 0.7 * direct_bytes:
        return None
    seqs = [None] * S
    for _h, (row, s) in uniq.items():
        seqs[row] = s
    pool = np.zeros((Sp, W_pool), dtype=np.int32)
    if os.environ.get("OTTER_TPU_NATIVE_PACK", "1") == "1":
        try:
            from ..native import pack_pool_2bit_native

            pool[:S] = pack_pool_2bit_native(seqs, W_pool)
        except Exception:
            pool[:S] = pack_pool_2bit(seqs, W_pool)
    else:
        pool[:S] = pack_pool_2bit(seqs, W_pool)
    ip = np.zeros(B, dtype=np.int32)
    it = np.zeros(B, dtype=np.int32)
    nlen = np.zeros(B, dtype=np.int32)
    minit = np.zeros(B, dtype=np.int32)
    ip[:np_] = idx_p
    it[:np_] = idx_t
    nlen[:np_] = nlens
    minit[:np_] = minits
    return myers_pool_pallas(jnp.asarray(pool), jnp.asarray(ip),
                             jnp.asarray(it), jnp.asarray(nlen),
                             jnp.asarray(minit), n_words, text_len,
                             interpret=interpret)


def myers_pool_dispatch_indexed(pv, members: np.ndarray, n_words: int,
                                text_len: int, interpret: bool = False,
                                pad_to: int = PAIRS_PER_PROG):
    """myers_pool_dispatch over an IndexedPairs view: the per-pair python
    dedup loop becomes np.unique over the chunk's index arrays — per-pair
    host work is O(1) numpy, per-sequence work runs once per UNIQUE
    sequence (the 2-bit pool pack). Returns None when dedup would not cut
    H2D bytes (caller falls back to the direct path), like the list
    variant."""
    members = np.asarray(members, dtype=np.int64)
    xi = pv.xi[members]
    yi = pv.yi[members]
    lx = pv.lens[xi]
    ly = pv.lens[yi]
    swap = lx > ly
    pi = np.where(swap, yi, xi)
    ti = np.where(swap, xi, yi)
    minits = np.where(swap, ly, lx).astype(np.int32)
    nlens = np.where(swap, lx, ly).astype(np.int32)
    cat = np.concatenate([pi, ti])
    u, inv = np.unique(cat, return_inverse=True)
    S = len(u)
    Sp = 8
    while Sp < S:
        Sp *= 2
    n_twords = (text_len + 15) // 16
    W_pool = max(2 * n_words, n_twords)
    B = max(pad_to, PAIRS_PER_PROG)
    direct_bytes = B * (2 * n_words + n_twords + 2) * 4
    pool_bytes = Sp * W_pool * 4 + B * 16
    if pool_bytes > 0.7 * direct_bytes:
        return None
    seqs_local = [pv.seqs[int(s)] for s in u]
    pool = np.zeros((Sp, W_pool), dtype=np.int32)
    if os.environ.get("OTTER_TPU_NATIVE_PACK", "1") == "1":
        try:
            from ..native import pack_pool_2bit_native

            pool[:S] = pack_pool_2bit_native(seqs_local, W_pool)
        except Exception:
            pool[:S] = pack_pool_2bit(seqs_local, W_pool)
    else:
        pool[:S] = pack_pool_2bit(seqs_local, W_pool)
    P = len(members)
    ip = np.zeros(B, dtype=np.int32)
    it = np.zeros(B, dtype=np.int32)
    nlen = np.zeros(B, dtype=np.int32)
    minit = np.zeros(B, dtype=np.int32)
    ip[:P] = inv[:P]
    it[:P] = inv[P:]
    nlen[:P] = nlens
    minit[:P] = minits
    return myers_pool_pallas(jnp.asarray(pool), jnp.asarray(ip),
                             jnp.asarray(it), jnp.asarray(nlen),
                             jnp.asarray(minit), n_words, text_len,
                             interpret=interpret)


def _to_planes(arr_b: np.ndarray, n_prog: int) -> np.ndarray:
    """(..., B) -> (n_prog * prod(...) * TB, 128) row-major per program."""
    lead = arr_b.shape[:-1]
    planes = arr_b.reshape(lead + (n_prog, TB, LANES))
    # bring prog axis first: (n_prog, *lead, TB, LANES)
    planes = np.moveaxis(planes, -3, 0)
    return np.ascontiguousarray(planes).reshape(-1, LANES)


def pack_for_pallas(pairs: List[Tuple[str, str]], n_words: int,
                    text_len: int, batch_pad: int = PAIRS_PER_PROG):
    """Pack a pair bucket into the kernel's flattened plane layout.

    Fast path: the threaded C++ packer writes the plane layout directly
    (native.myers_pack_planes, bit-identical); numpy oracle on fallback.
    """
    if os.environ.get("OTTER_TPU_NATIVE_PACK", "1") == "1":
        try:
            from ..native import myers_pack_planes

            return myers_pack_planes(pairs, n_words, text_len,
                                     pad_to=max(batch_pad, PAIRS_PER_PROG))
        except Exception:
            pass
    from .myers import pack_myers_bucket

    peq, tpack, mlen, nlen, sel_word, sel_bit = pack_myers_bucket(
        pairs, n_words, text_len, batch_pad=batch_pad)
    B = peq.shape[2]
    n_prog = B // PAIRS_PER_PROG
    words = np.arange(n_words)[:, None]
    sel_mask = np.where(words == sel_word[None, :], sel_bit[None, :],
                        np.uint32(0)).astype(np.uint32)
    peq_flat = _to_planes(peq.view(np.int32), n_prog)
    tpack_flat = _to_planes(tpack.view(np.int32), n_prog)
    sel_flat = _to_planes(sel_mask.view(np.int32), n_prog)
    nlen_flat = _to_planes(nlen[None, :], n_prog)
    minit_flat = _to_planes(mlen[None, :], n_prog)
    return peq_flat, tpack_flat, nlen_flat, sel_flat, minit_flat, n_prog


def pack_for_pallas_packed(pairs: List[Tuple[str, str]], n_words: int,
                           text_len: int, batch_pad: int = PAIRS_PER_PROG):
    """Pack a pair bucket in the packed-pattern layout (ppack, tpack, nlen,
    minit, n_prog). Native C++ packer first; numpy fallback packs the
    pattern with the same 2-bit np.packbits scheme the text uses."""
    if os.environ.get("OTTER_TPU_NATIVE_PACK", "1") == "1":
        try:
            from ..native import myers_pack_packed

            return myers_pack_packed(pairs, n_words, text_len,
                                     pad_to=max(batch_pad, PAIRS_PER_PROG))
        except Exception:
            pass
    from .myers import pack_myers_packed

    ppack, tpack, mlen, nlen = pack_myers_packed(
        pairs, n_words, text_len, batch_pad=batch_pad)
    B = ppack.shape[1]
    n_prog = B // PAIRS_PER_PROG
    ppack_flat = _to_planes(ppack.view(np.int32), n_prog)
    tpack_flat = _to_planes(tpack.view(np.int32), n_prog)
    nlen_flat = _to_planes(nlen[None, :], n_prog)
    minit_flat = _to_planes(mlen[None, :], n_prog)
    return ppack_flat, tpack_flat, nlen_flat, minit_flat, n_prog


def myers_dispatch(pairs: List[Tuple[str, str]], n_words: int,
                   text_len: int, interpret: bool = False,
                   pad_to: int = PAIRS_PER_PROG):
    """Pack + launch asynchronously; returns the device array (plane layout
    row-major (prog, sublane, lane) == pair order). Collect with
    ``np.asarray(out).reshape(-1)[:len(pairs)]``. ``pad_to`` rounds the
    batch up to a fixed program count so compile shapes stay few.

    Default route is the fused-input packed-pattern kernel (2-bit pattern
    expanded to Peq on device — ~40% fewer H2D bytes — shipped with the
    text/lengths as ONE array, so a remote-tunnel dispatch pays one
    transfer RPC instead of four); OTTER_TPU_MYERS_PACKED=0 forces the
    plane-input kernel, and any packed-path failure falls back to it.
    """
    if os.environ.get("OTTER_TPU_MYERS_PACKED", "1") == "1":
        try:
            ppack, tpack, nlen, minit, n_prog = pack_for_pallas_packed(
                pairs, n_words, text_len, batch_pad=pad_to)
            fused = fuse_packed_planes(ppack, tpack, nlen, minit, n_prog)
            return myers_pallas_fused(jnp.asarray(fused), n_words, text_len,
                                      interpret=interpret)
        except Exception:
            pass
    peq, tpack, nlen, sel, minit, n_prog = pack_for_pallas(
        pairs, n_words, text_len, batch_pad=pad_to)
    return myers_pallas(jnp.asarray(peq), jnp.asarray(tpack),
                        jnp.asarray(nlen), jnp.asarray(sel),
                        jnp.asarray(minit), n_words, text_len,
                        interpret=interpret)


def myers_distances(pairs: List[Tuple[str, str]], n_words: int,
                    text_len: int, interpret: bool = False) -> np.ndarray:
    """Convenience wrapper: pack, run, unpack. Returns (len(pairs),)."""
    out = myers_dispatch(pairs, n_words, text_len, interpret=interpret)
    return np.asarray(out).reshape(-1)[: len(pairs)]
