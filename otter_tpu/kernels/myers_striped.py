"""Striped Myers bit-parallel edit distance — arbitrary pattern lengths.

The base kernel (myers_pallas.py) keeps every pattern word's Pv/Mv as loop
state, capping patterns at ~64 words. This variant processes the pattern in
*stripes* of up to STRIPE_WORDS words: the only coupling between stripe s
and stripe s+1 is three carry bits per text character (the adder carry and
the Ph/Mh shift carries crossing the stripe's top word). Each stripe pass
re-scans the text, emitting its per-char boundary carries as packed bit
words; the next stripe consumes them as carry-ins. Carry arrays are jnp
device arrays chained call-to-call — nothing crosses the host boundary
until the final distances.

Total work stays O(m*n) cells at the same ~1 lane-op/32 cells rate, so a
20 kb x 20 kb pair costs ~2e7 lane-ops — far below the banded row kernel's
op count even for low error rates.

Score capture: a member's bottom row lives in exactly one stripe (its
sel mask is zero elsewhere), so each stripe's captured output is correct
for the members whose pattern ends in it; the host selects per member.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .myers import pack_myers_bucket
from .myers_pallas import LANES, TB

STRIPE_WORDS = 32


def _msb1(x):
    return jax.lax.shift_right_logical(x, jnp.int32(31))


CSTRIP = 4  # text chars per pattern-word visit (divides 32)


def _myers_stripe_kernel(peq_ref, tpack_ref, nlen_ref, sel_ref, minit_ref,
                         tb_ref, te_ref,
                         cin_a_ref, cin_p_ref, cin_m_ref,
                         out_ref, cout_a_ref, cout_p_ref, cout_m_ref,
                         pv_ref, mv_ref,
                         *, n_words: int, text_len: int, first_stripe: bool):
    """Pv/Mv live in VMEM scratch and the text is strip-mined CSTRIP chars
    per word visit (same layout rationale as myers_pallas._myers_kernel);
    the per-char boundary carries in/out pack as bit j%32 of word j//32."""
    neg1 = jnp.int32(-1)
    zero = jnp.int32(0)
    one = jnp.int32(1)
    C = CSTRIP
    nlen = nlen_ref[:, :]
    tbv = tb_ref[:, :]
    tev = te_ref[:, :]
    score0 = minit_ref[:, :]
    zeros = jnp.zeros((TB, LANES), dtype=jnp.int32)
    ones = jnp.full((TB, LANES), 1, jnp.int32)

    def init_word(w, _):
        pv_ref[pl.ds(w * TB, TB), :] = jnp.full((TB, LANES), neg1, jnp.int32)
        mv_ref[pl.ds(w * TB, TB), :] = zeros
        return 0

    jax.lax.fori_loop(0, n_words, init_word, 0)

    n_strips = (text_len + C - 1) // C

    def strip(sidx, carry):
        score, captured, acc_a, acc_p, acc_m = carry
        j0 = sidx * C
        trow = tpack_ref[pl.ds((j0 // 16) * TB, TB), :]
        isel = []
        ca0 = []
        cp0 = []
        cm0 = []
        if not first_stripe:
            arow = cin_a_ref[pl.ds((j0 // 32) * TB, TB), :]
            prow = cin_p_ref[pl.ds((j0 // 32) * TB, TB), :]
            mrow = cin_m_ref[pl.ds((j0 // 32) * TB, TB), :]
        for c in range(C):
            sh = jnp.broadcast_to((j0 + c) % 16 * 2, trow.shape)
            ch = jax.lax.shift_right_logical(trow, sh.astype(jnp.int32)) & 3
            isel.append((ch == 0, ch == 1, ch == 2))
            if first_stripe:
                ca0.append(zeros)
                cp0.append(jnp.where(j0 + c >= tbv, 1, 0).astype(jnp.int32))
                cm0.append(zeros)
            else:
                bsh = jnp.broadcast_to((j0 + c) % 32, (TB, LANES)
                                       ).astype(jnp.int32)
                ca0.append(jax.lax.shift_right_logical(arow, bsh) & one)
                cp0.append(jax.lax.shift_right_logical(prow, bsh) & one)
                cm0.append(jax.lax.shift_right_logical(mrow, bsh) & one)

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
                ca[c] = _msb1((t & Pv) | ((t | Pv) & ~ssum))
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

        init = tuple(ca0) + tuple(cp0) + tuple(cm0) + tuple([zeros] * C)
        wc = jax.lax.fori_loop(0, n_words, word, init)
        for c in range(C):
            j = j0 + c
            score = score + wc[3 * C + c]
            # free trailing text: running min of D[m][j'] over
            # j' in [n - te, n] (te = 0 degenerates to j' == n)
            in_window = ((j + 1) >= (nlen - tev)) & ((j + 1) <= nlen)
            captured = jnp.where(in_window, jnp.minimum(captured, score),
                                 captured)
            bpos = jnp.broadcast_to(j % 32, (TB, LANES)).astype(jnp.int32)
            acc_a = acc_a | jax.lax.shift_left(wc[c], bpos)
            acc_p = acc_p | jax.lax.shift_left(wc[C + c], bpos)
            acc_m = acc_m | jax.lax.shift_left(wc[2 * C + c], bpos)
        flush = (j0 + C - 1) % 32 == 31

        @pl.when(flush)
        def _():
            cout_a_ref[pl.ds((j0 // 32) * TB, TB), :] = acc_a
            cout_p_ref[pl.ds((j0 // 32) * TB, TB), :] = acc_p
            cout_m_ref[pl.ds((j0 // 32) * TB, TB), :] = acc_m

        acc_a = jnp.where(flush, zero, acc_a)
        acc_p = jnp.where(flush, zero, acc_p)
        acc_m = jnp.where(flush, zero, acc_m)
        return score, captured, acc_a, acc_p, acc_m

    cap0 = jnp.full((TB, LANES), jnp.int32(2 ** 30))
    _, captured, _, _, _ = jax.lax.fori_loop(
        0, n_strips, strip, (score0, cap0, zeros, zeros, zeros))
    out_ref[:, :] = captured


@functools.partial(jax.jit, static_argnames=("n_words", "text_len",
                                             "first_stripe", "interpret"))
def myers_stripe(peq, tpack, nlen, sel, minit, tb, te, cin_a, cin_p, cin_m,
                 n_words: int, text_len: int, first_stripe: bool,
                 interpret: bool = False):
    """One stripe pass. Returns (captured (B,128), cout_a, cout_p, cout_m)."""
    n_prog = nlen.shape[0] // TB
    n_twords = (text_len + 15) // 16
    n_cwords = (text_len + 31) // 32
    kernel = functools.partial(_myers_stripe_kernel, n_words=n_words,
                               text_len=text_len, first_stripe=first_stripe)
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
            pl.BlockSpec((TB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_cwords * TB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_cwords * TB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_cwords * TB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_cwords * TB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_cwords * TB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_cwords * TB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nlen.shape[0], LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_cwords * nlen.shape[0], LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_cwords * nlen.shape[0], LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_cwords * nlen.shape[0], LANES), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_words * TB, LANES), jnp.int32),
            pltpu.VMEM((n_words * TB, LANES), jnp.int32),
        ],
        # the in/out carry planes alone are ~12 MB at 16k-char stripes; the
        # default 16 MB scoped-vmem budget is a guardrail, not the physical
        # limit — raise it for this kernel
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(peq, tpack, nlen, sel, minit, tb, te, cin_a, cin_p, cin_m)


def _to_planes(arr_b: np.ndarray, n_prog: int) -> np.ndarray:
    lead = arr_b.shape[:-1]
    planes = arr_b.reshape(lead + (n_prog, TB, LANES))
    planes = np.moveaxis(planes, -3, 0)
    return np.ascontiguousarray(planes).reshape(-1, LANES)


def _striped_run(pairs: List[Tuple[str, str]], text_len: int,
                 tb_arr: np.ndarray, te_arr: np.ndarray,
                 interpret: bool = False) -> np.ndarray:
    """Shared striped-Myers driver. pairs are already (pattern, text)
    oriented; tb_arr/te_arr are per-pair free text begin/end lengths."""
    return _striped_collect(_striped_launch(pairs, text_len, tb_arr, te_arr,
                                            interpret=interpret))


def _striped_launch(pairs: List[Tuple[str, str]], text_len: int,
                    tb_arr: np.ndarray, te_arr: np.ndarray,
                    interpret: bool = False):
    """Dispatch half of _striped_run: returns a handle whose device work is
    in flight; materialize with _striped_collect (the only D2H)."""
    PAIRS = TB * LANES
    mlen_max = max(min(len(a), len(b)) for a, b in pairs)
    n_words_total = (mlen_max + 31) // 32
    n_stripes = (n_words_total + STRIPE_WORDS - 1) // STRIPE_WORDS
    nw_pad = n_stripes * STRIPE_WORDS
    peq, tpack, mlen, nlen, sel_word, sel_bit = pack_myers_bucket(
        pairs, nw_pad, text_len, batch_pad=PAIRS)
    B = peq.shape[2]
    n_prog = B // PAIRS
    words = np.arange(nw_pad)[:, None]
    sel_mask = np.where(words == sel_word[None, :], sel_bit[None, :],
                        np.uint32(0)).astype(np.uint32)
    tb_full = np.zeros(B, dtype=np.int32)
    te_full = np.zeros(B, dtype=np.int32)
    tb_full[: len(pairs)] = tb_arr
    te_full[: len(pairs)] = te_arr
    tpack_flat = jnp.asarray(_to_planes(tpack.view(np.int32), n_prog))
    nlen_flat = jnp.asarray(_to_planes(nlen[None, :], n_prog))
    minit_flat = jnp.asarray(_to_planes(mlen[None, :], n_prog))
    tb_flat = jnp.asarray(_to_planes(tb_full[None, :], n_prog))
    te_flat = jnp.asarray(_to_planes(te_full[None, :], n_prog))
    n_cwords = (text_len + 31) // 32
    zc = jnp.zeros((n_cwords * B, LANES), dtype=jnp.int32)
    cin = (zc, zc, zc)
    captured_per_stripe = []
    for s in range(n_stripes):
        lo = s * STRIPE_WORDS
        hi = lo + STRIPE_WORDS
        peq_s = jnp.asarray(_to_planes(
            peq[:, lo:hi, :].view(np.int32), n_prog))
        sel_s = jnp.asarray(_to_planes(
            sel_mask[lo:hi, :].view(np.int32), n_prog))
        captured, ca, cp, cm = myers_stripe(
            peq_s, tpack_flat, nlen_flat, sel_s, minit_flat,
            tb_flat, te_flat, *cin,
            n_words=STRIPE_WORDS, text_len=text_len,
            first_stripe=(s == 0), interpret=interpret)
        cin = (ca, cp, cm)
        captured_per_stripe.append(captured)
    return (jnp.stack(captured_per_stripe), sel_word, n_stripes, len(pairs))


def _striped_collect(handle) -> np.ndarray:
    """One materialization: stack arrived on device; pick per member."""
    stacked_dev, sel_word, n_stripes, n_pairs = handle
    return _striped_pick(np.asarray(stacked_dev), sel_word, n_stripes,
                         n_pairs)


def _striped_pick(stacked: np.ndarray, sel_word: np.ndarray,
                  n_stripes: int, n_pairs: int) -> np.ndarray:
    """Host half of _striped_collect over an already-materialized (S,B,128)
    capture stack (callers fusing many chunks into one D2H use this)."""
    stacked = stacked.reshape(n_stripes, -1)
    stripe_of = sel_word // STRIPE_WORDS
    out = stacked[stripe_of[:n_pairs], np.arange(n_pairs)]
    return out.astype(np.int64)


def _ends_free_degenerate(m: int, n: int, pb: int, pe: int,
                          tb: int, te: int) -> int:
    """Closed-form ends-free score when one side is empty."""
    if m == 0:
        return max(0, max(0, n - te) - tb)
    return max(0, max(0, m - pe) - pb)


def myers_striped_distances(pairs: List[Tuple[str, str]], text_len: int,
                            interpret: bool = False) -> np.ndarray:
    """Exact edit distances for ACGT pairs of any length (pattern = shorter
    side; stripes of STRIPE_WORDS words chained on device)."""
    if any(min(len(a), len(b)) == 0 for a, b in pairs):
        out = np.array([max(len(a), len(b)) for a, b in pairs],
                       dtype=np.int64)
        live = [i for i, (a, b) in enumerate(pairs)
                if min(len(a), len(b)) > 0]
        if live:
            z = np.zeros(len(live), dtype=np.int32)
            out[live] = _striped_run([pairs[i] for i in live], text_len,
                                     z, z, interpret=interpret)
        return out
    z = np.zeros(len(pairs), dtype=np.int32)
    return _striped_run(pairs, text_len, z, z, interpret=interpret)


def myers_striped_ends_free(jobs: List[Tuple[str, str, int, int, int, int]],
                            interpret: bool = False,
                            text_len: int | None = None) -> np.ndarray:
    """Exact ends-free edit distances on device for ACGT jobs whose frees
    are on at most ONE side (the spanning-read case, analignments.cpp:34-63).

    Each job is (pattern, text, pb, pe, tb, te) with edit_distance_ends_free
    semantics. Pattern-side frees are moved to the text side by transposing
    (Levenshtein is symmetric); text-side frees then map onto the Myers
    recurrence exactly: a free leading gap of tb zeroes the horizontal +1
    boundary carries of the first tb text chars, and a free trailing gap of
    te turns the final capture into a running min of the bottom row over the
    last te+1 columns.
    """
    return myers_striped_ends_free_collect(
        myers_striped_ends_free_async(jobs, interpret=interpret,
                                      text_len=text_len))


def myers_striped_ends_free_async(jobs: List[Tuple[str, str, int, int,
                                                   int, int]],
                                  interpret: bool = False,
                                  text_len: int | None = None):
    """Dispatch half of myers_striped_ends_free — the device work is in
    flight when this returns; materialize (one D2H) with
    myers_striped_ends_free_collect."""
    oriented: List[Tuple[str, str]] = []
    tbs = np.zeros(len(jobs), dtype=np.int32)
    tes = np.zeros(len(jobs), dtype=np.int32)
    out = np.zeros(len(jobs), dtype=np.int64)
    live: List[int] = []
    for i, (p, t, pb, pe, tb, te) in enumerate(jobs):
        if min(len(p), len(t)) == 0:
            out[i] = _ends_free_degenerate(len(p), len(t), pb, pe, tb, te)
            continue
        live.append(i)
        if pb or pe:
            if tb or te:
                raise ValueError("frees on both sides not device-routable")
            oriented.append((t, p))
            tbs[i], tes[i] = pb, pe
        else:
            oriented.append((p, t))
            tbs[i], tes[i] = tb, te
    h = None
    if oriented:
        if text_len is None:
            text_len = max(len(t) for _, t in oriented)
        h = _striped_launch(oriented, text_len, tbs[live], tes[live],
                            interpret=interpret)
    return out, live, h


def myers_striped_ends_free_collect(handle) -> np.ndarray:
    out, live, h = handle
    if h is not None:
        out[live] = _striped_collect(h)
    return out
