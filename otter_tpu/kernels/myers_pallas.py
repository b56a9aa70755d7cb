"""Pallas TPU kernel for batched Myers bit-parallel edit distance.

Layout: each program instance owns TB x 128 pairs (sublanes x lanes); the
pattern's bit-words iterate as a static python loop inside a fori over text
positions, carrying the adder/shift carries word to word. All math is int32
bitwise (carry-out of a+b+cin is recovered as the MSB of
(a & b) | ((a | b) & ~sum), avoiding unsigned compares).

Per text char and word: ~40 vector ops advancing 32 DP cells/lane — about
1.2 lane-ops per DP cell, ~25x fewer than the banded row kernel, with no
band-retry ladder (the full DP is computed, always exact).

Host packing comes from kernels/myers.py::pack_myers_bucket.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB = 8          # sublane rows of pairs per program
LANES = 128
PAIRS_PER_PROG = TB * LANES


def _msb1(x):
    return jax.lax.shift_right_logical(x, jnp.int32(31))


def _carry_out(a, b, s):
    """MSB carry-out of s = a + b (+cin already folded into s)."""
    return _msb1((a & b) | ((a | b) & ~s))


def _myers_kernel(peq_ref, tpack_ref, nlen_ref, sel_ref, minit_ref, out_ref,
                  *, n_words: int, text_len: int):
    neg1 = jnp.int32(-1)
    zero = jnp.int32(0)
    one = jnp.int32(1)

    nlen = nlen_ref[:, :]
    score0 = minit_ref[:, :]

    # state: Pv/Mv per word + score + captured
    Pv0 = [jnp.full((TB, LANES), neg1, dtype=jnp.int32) for _ in range(n_words)]
    Mv0 = [jnp.zeros((TB, LANES), dtype=jnp.int32) for _ in range(n_words)]

    def body(j, carry):
        Pv, Mv, score, captured = carry
        Pv = list(Pv)
        Mv = list(Mv)
        trow = tpack_ref[pl.ds((j // 16) * TB, TB), :]
        shift = jnp.broadcast_to((j % 16) * 2, trow.shape).astype(jnp.int32)
        c = jax.lax.shift_right_logical(trow, shift) & jnp.int32(3)
        is0 = c == 0
        is1 = c == 1
        is2 = c == 2
        carry_add = jnp.zeros((TB, LANES), dtype=jnp.int32)
        carry_ph = jnp.full((TB, LANES), 1, dtype=jnp.int32)
        carry_mh = jnp.zeros((TB, LANES), dtype=jnp.int32)
        for w in range(n_words):
            pA = peq_ref[(0 * n_words + w) * TB : (0 * n_words + w + 1) * TB, :]
            pC = peq_ref[(1 * n_words + w) * TB : (1 * n_words + w + 1) * TB, :]
            pG = peq_ref[(2 * n_words + w) * TB : (2 * n_words + w + 1) * TB, :]
            pT = peq_ref[(3 * n_words + w) * TB : (3 * n_words + w + 1) * TB, :]
            Eq = jnp.where(is0, pA, jnp.where(is1, pC, jnp.where(is2, pG, pT)))
            sel = sel_ref[w * TB : (w + 1) * TB, :]
            Pv_w = Pv[w]
            Mv_w = Mv[w]
            Xv = Eq | Mv_w
            t = Eq & Pv_w
            s = t + Pv_w + carry_add
            # carry out of t + Pv + cin: fold cin via two-step detection
            carry_next = _carry_out(t, Pv_w, t + Pv_w) | \
                (_carry_out(t + Pv_w, carry_add, s))
            Xh = (s ^ Pv_w) | Eq
            Ph = Mv_w | ~(Xh | Pv_w)
            Mh = Pv_w & Xh
            score = score + jnp.where((Ph & sel) != 0, one, zero)
            score = score - jnp.where((Mh & sel) != 0, one, zero)
            ph_out = _msb1(Ph)
            mh_out = _msb1(Mh)
            ones_sh = jnp.ones_like(Ph)
            Ph = jax.lax.shift_left(Ph, ones_sh) | carry_ph
            Mh = jax.lax.shift_left(Mh, ones_sh) | carry_mh
            carry_ph = ph_out
            carry_mh = mh_out
            carry_add = carry_next
            Pv[w] = Mh | ~(Xv | Ph)
            Mv[w] = Ph & Xv
        captured = jnp.where(nlen == j + 1, score, captured)
        return tuple(Pv), tuple(Mv), score, captured

    init = (tuple(Pv0), tuple(Mv0), score0, score0)
    _, _, _, captured = jax.lax.fori_loop(0, text_len, body, init)
    out_ref[:, :] = captured


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
        cost_estimate=pl.CostEstimate(
            flops=n_prog * PAIRS_PER_PROG * text_len * n_words * 40,
            bytes_accessed=(peq.size + tpack.size) * 4,
            transcendentals=0),
        interpret=interpret,
    )(peq, tpack, nlen, sel, minit)


def _to_planes(arr_b: np.ndarray, n_prog: int) -> np.ndarray:
    """(..., B) -> (n_prog * prod(...) * TB, 128) row-major per program."""
    lead = arr_b.shape[:-1]
    planes = arr_b.reshape(lead + (n_prog, TB, LANES))
    # bring prog axis first: (n_prog, *lead, TB, LANES)
    planes = np.moveaxis(planes, -3, 0)
    return np.ascontiguousarray(planes).reshape(-1, LANES)


def pack_for_pallas(pairs: List[Tuple[str, str]], n_words: int,
                    text_len: int):
    """Pack a pair bucket into the kernel's flattened plane layout."""
    from .myers import pack_myers_bucket

    peq, tpack, mlen, nlen, sel_word, sel_bit = pack_myers_bucket(
        pairs, n_words, text_len, batch_pad=PAIRS_PER_PROG)
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


def myers_dispatch(pairs: List[Tuple[str, str]], n_words: int,
                   text_len: int, interpret: bool = False):
    """Pack + launch asynchronously; returns the device array (plane layout
    row-major (prog, sublane, lane) == pair order). Collect with
    ``np.asarray(out).reshape(-1)[:len(pairs)]``."""
    peq, tpack, nlen, sel, minit, n_prog = pack_for_pallas(
        pairs, n_words, text_len)
    return myers_pallas(jnp.asarray(peq), jnp.asarray(tpack),
                        jnp.asarray(nlen), jnp.asarray(sel),
                        jnp.asarray(minit), n_words, text_len,
                        interpret=interpret)


def myers_distances(pairs: List[Tuple[str, str]], n_words: int,
                    text_len: int, interpret: bool = False) -> np.ndarray:
    """Convenience wrapper: pack, run, unpack. Returns (len(pairs),)."""
    out = myers_dispatch(pairs, n_words, text_len, interpret=interpret)
    return np.asarray(out).reshape(-1)[: len(pairs)]
