"""Pallas banded gap-affine DP with backpointer output — device consensus
alignments (the reference's WFAlignerGapAffine + PPOA feed,
src/analignments.cpp:266-282).

Scope: the common consensus buckets (band k = 63 -> W = 128 lanes; patterns
<= 1024 bp). Larger/wider jobs fall back to the vectorized host DP
(ops/align_batch.py) — same recurrences, same results.

Design:
  * band coordinates exactly like the edit kernel (w = j - i + (k+1)); the
    in-row E dependency is a prefix-min scan (no-gap-chaining property);
  * per row the kernel emits ONE int8 per cell with 4 traceback bits:
      bit0 H==F    bit1 H==E    bit2 F extends    bit3 E extends
    stored as aligned (TB=32, 128) int8 tiles — the host walks these bits
    to produce cigars byte-identical to the host value-traceback;
  * end-cell search data (final H row, best last-column value/row with the
    reference's tie order) is reduced on device and finished on host.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.align_np import GAP_EXT, GAP_OPEN, MISMATCH, _BIG, _codes

K_DEV = 63
W_DEV = 2 * (K_DEV + 1)  # 128 lanes
TBA = 32                 # members per program (int8 row-tile alignment)
LP_MAX = 1024            # max pattern rows handled on device

_INF = 1 << 28


def _prefix_min(x):
    w = x.shape[-1]
    shift = 1
    while shift < w:
        shifted = jnp.concatenate(
            [jnp.full(x.shape[:-1] + (shift,), _INF, dtype=x.dtype),
             x[..., :-shift]], axis=-1)
        x = jnp.minimum(x, shifted)
        shift *= 2
    return x


def _affine_kernel(a_ref, bpad_ref, mn_ref, bits_ref, hfin_ref, colv_ref,
                   coli_ref, *, max_rows: int):
    k = K_DEV
    W = W_DEV
    m2 = jnp.stack([mn_ref[t, 0] for t in range(TBA)]).reshape(TBA, 1)
    n2 = jnp.stack([mn_ref[t, 1] for t in range(TBA)]).reshape(TBA, 1)
    pb2 = jnp.stack([mn_ref[t, 2] for t in range(TBA)]).reshape(TBA, 1)
    tb2 = jnp.stack([mn_ref[t, 3] for t in range(TBA)]).reshape(TBA, 1)
    pe2 = jnp.stack([mn_ref[t, 4] for t in range(TBA)]).reshape(TBA, 1)
    w_idx = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    ew = GAP_EXT * w_idx
    j0 = w_idx - (k + 1)
    H0 = jnp.where(
        (j0 >= 0) & (j0 <= n2),
        jnp.where(j0 <= tb2, 0, GAP_OPEN + GAP_EXT * (j0 - tb2)), _INF)
    H0 = jnp.broadcast_to(H0, (TBA, W)).astype(jnp.int32)
    E0 = jnp.full((TBA, W), _INF, dtype=jnp.int32)
    F0 = jnp.full((TBA, W), _INF, dtype=jnp.int32)
    colv0 = jnp.full((TBA, 128), _INF, dtype=jnp.int32)
    coli0 = jnp.zeros((TBA, 128), dtype=jnp.int32)
    window0 = bpad_ref[:, 0:W]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TBA, 128), 1)

    def sel(chunk, r):
        return jnp.sum(jnp.where(lane == r, chunk, 0), axis=1, keepdims=True)

    inf_col = jnp.full((TBA, 1), _INF, dtype=jnp.int32)
    n_chunks = (max_rows + 127) // 128

    def outer(c, carry):
        H, E, F, window, colv, coli = carry
        base = pl.multiple_of(c * 128, 128)
        a_chunk = a_ref[:, pl.ds(base, 128)]
        b_chunk = bpad_ref[:, pl.ds(base + W, 128)]

        def inner(r, carry2):
            H, E, F, window, colv, coli = carry2
            i = c * 128 + r + 1
            a_col = sel(a_chunk, r)
            j = i + w_idx - (k + 1)
            sub = jnp.where(window == a_col, 0, MISMATCH).astype(jnp.int32)
            Hup = jnp.concatenate([H[:, 1:], inf_col], axis=1)
            Fup = jnp.concatenate([F[:, 1:], inf_col], axis=1)
            F_row = jnp.minimum(Hup + (GAP_OPEN + GAP_EXT), Fup + GAP_EXT)
            diag = H + sub
            Bv = jnp.minimum(diag, F_row)
            hb = jnp.where(i <= pb2, 0, GAP_OPEN + GAP_EXT * (i - pb2))
            Bv = jnp.where(j == 0, hb, Bv)
            invalid = (j < 0) | (j > n2)
            Bv = jnp.where(invalid, _INF, Bv)
            scan = _prefix_min(Bv - ew)
            E_row = jnp.concatenate([inf_col, scan[:, :-1]], axis=1) + ew + GAP_OPEN
            E_row = jnp.where(invalid, _INF, E_row)
            E_row = jnp.where(w_idx == 0, _INF, E_row)
            H_row = jnp.minimum(Bv, E_row)
            H_row = jnp.where(j == 0, hb, H_row)
            H_row = jnp.where(invalid, _INF, H_row)
            F_rowm = jnp.where(invalid, _INF, F_row)
            # traceback bits
            Eleft = jnp.concatenate([inf_col, E_row[:, :-1]], axis=1)
            bits = (
                jnp.where(H_row == F_rowm, 1, 0)
                | jnp.where(H_row == E_row, 2, 0)
                | jnp.where(F_rowm == Fup + GAP_EXT, 4, 0)
                | jnp.where(E_row == Eleft + GAP_EXT, 8, 0)
            ).astype(jnp.int8)
            bits_ref[pl.ds((i - 1) * TBA, TBA), :] = bits
            # freeze members beyond their pattern end
            keep = i <= m2
            H = jnp.where(keep, H_row, H)
            E = jnp.where(keep, E_row, E)
            F = jnp.where(keep, F_rowm, F)
            # last-column tracking (j == n): ascending i with <= keeps the
            # largest i among score ties, matching the reference's
            # descending strict-< scan (ops/align_batch._end_cell)
            wcol = n2 - i + (k + 1)
            hv = jnp.min(jnp.where(w_idx == wcol, H_row, _INF), axis=1,
                         keepdims=True)
            active = (i <= m2) & ((m2 - i) <= pe2) & (wcol >= 0) & (wcol < W)
            better = active & (hv <= colv[:, 0:1])
            colv = jnp.where(better, jnp.broadcast_to(hv, (TBA, 128)), colv)
            coli = jnp.where(better, jnp.full((TBA, 128), 1, jnp.int32) * i,
                             coli)
            # roll text window
            nxt = sel(b_chunk, r)
            window = jnp.concatenate([window[:, 1:], nxt], axis=1)
            return H, E, F, window, colv, coli

        return jax.lax.fori_loop(0, 128, inner, (H, E, F, window, colv, coli))

    H, E, F, _w, colv, coli = jax.lax.fori_loop(
        0, n_chunks, outer, (H0, E0, F0, window0, colv0, coli0))
    hfin_ref[:, :] = H
    colv_ref[:, :] = colv
    coli_ref[:, :] = coli


@functools.partial(jax.jit, static_argnames=("max_rows", "interpret"))
def affine_banded_pallas(a, bpad, mn, max_rows: int, interpret: bool = False):
    B = a.shape[0]
    n_prog = B // TBA
    kernel = functools.partial(_affine_kernel, max_rows=max_rows)
    return pl.pallas_call(
        kernel,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((TBA, a.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TBA, bpad.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TBA, 8), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((max_rows * TBA, W_DEV), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TBA, W_DEV), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TBA, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TBA, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * max_rows, W_DEV), jnp.int8),
            jax.ShapeDtypeStruct((B, W_DEV), jnp.int32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
        ),
        interpret=interpret,
    )(a, bpad, mn)


def pack_affine_jobs(jobs: List[Tuple[str, str, int, int, int, int]],
                     max_rows: int):
    """jobs: (pattern, text, pb, pe, tb, te) -> kernel inputs."""
    B = ((len(jobs) + TBA - 1) // TBA) * TBA
    a = np.zeros((B, max_rows), dtype=np.int32)
    W = W_DEV
    ntxt_max = max(len(j[1]) for j in jobs)
    bpad = np.zeros((B, max(max_rows, ntxt_max) + W + 2), dtype=np.int32)
    bpad -= 1
    a -= 2
    mn = np.zeros((B, 8), dtype=np.int32)
    for i, (p, t, pb, pe, tb, te) in enumerate(jobs):
        pc = _codes(p).astype(np.int32)
        tc = _codes(t).astype(np.int32)
        a[i, : len(pc)] = pc
        bpad[i, K_DEV + 1 : K_DEV + 1 + len(tc)] = tc
        mn[i] = (len(pc), len(tc), pb, tb, pe, te, 0, 0)
    return a, bpad, mn


def _end_cell_from_outputs(hfin_w, colv, coli, m, n, pe, te):
    """Reference tie order: (m,n) first, then last row larger j, then last
    column larger i (ops/align_batch._end_cell)."""
    k1 = K_DEV + 1
    wmn = n - m + k1
    best = (int(hfin_w[wmn]) if 0 <= wmn < W_DEV else _INF, m, n)
    for j in range(n - 1, max(0, n - te) - 1, -1):
        w = j - m + k1
        s = int(hfin_w[w]) if 0 <= w < W_DEV else _INF
        if s < best[0]:
            best = (s, m, j)
    if pe > 0 and int(colv) < best[0]:
        best = (int(colv), int(coli), n)
    return best


def _traceback_bits(bits, k, a, b, m, n, ei, ej) -> str:
    """Walk the 4-bit backpointers; identical decisions to the host
    value-traceback (ops/align_batch._traceback_banded)."""
    W = W_DEV
    kp1 = k + 1
    al = a
    bl = b
    ops = []
    ops.extend("I" * (n - ej))
    ops.extend("D" * (m - ei))
    i, j = ei, ej
    state = "H"
    while i > 0 or j > 0:
        w = j - i + kp1
        if state == "H":
            if i == 0:
                ops.extend("I" * j)
                break
            if j == 0:
                ops.extend("D" * i)
                break
            byte = int(bits[i - 1, w]) if 0 <= w < W else 0
            if byte & 1:
                state = "F"
                continue
            if byte & 2:
                state = "E"
                continue
            ops.append("M" if al[i - 1] == bl[j - 1] else "X")
            i -= 1
            j -= 1
        elif state == "F":
            ops.append("D")
            byte = int(bits[i - 1, w]) if 0 <= w < W else 0
            if (byte & 4) and i > 1:
                i -= 1
            else:
                i -= 1
                state = "H"
        else:
            ops.append("I")
            byte = int(bits[i - 1, w]) if 0 <= w < W else 0
            if (byte & 8) and j > 1:
                j -= 1
            else:
                j -= 1
                state = "H"
    return "".join(reversed(ops))


# ---------------------------------------------------------------------------
# On-device traceback variant: backpointer bits stay in VMEM scratch, the end
# cell is selected on device (reference tie order), and per-member cursor
# walks emit ~(m+n) one-byte op codes — the only D2H traffic (vs ~1 byte per
# DP cell for the bits kernel above, which loses through low-bandwidth
# tunnels). Reference semantics: WFA2 gap-affine traceback feeding PPOA,
# src/analignments.cpp:266-282.
# ---------------------------------------------------------------------------

OP_DIAG, OP_INS, OP_DEL = 1, 2, 3


def _affine_tb_kernel(a_ref, bpad_ref, mn_ref, ops_ref, end_ref, bits_scr,
                      *, max_rows: int, n_oprows: int):
    k = K_DEV
    W = W_DEV
    k1 = k + 1
    m2 = jnp.stack([mn_ref[t, 0] for t in range(TBA)]).reshape(TBA, 1)
    n2 = jnp.stack([mn_ref[t, 1] for t in range(TBA)]).reshape(TBA, 1)
    pb2 = jnp.stack([mn_ref[t, 2] for t in range(TBA)]).reshape(TBA, 1)
    tb2 = jnp.stack([mn_ref[t, 3] for t in range(TBA)]).reshape(TBA, 1)
    pe2 = jnp.stack([mn_ref[t, 4] for t in range(TBA)]).reshape(TBA, 1)
    te2 = jnp.stack([mn_ref[t, 5] for t in range(TBA)]).reshape(TBA, 1)
    w_idx = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    ew = GAP_EXT * w_idx
    j0 = w_idx - k1
    H0 = jnp.where(
        (j0 >= 0) & (j0 <= n2),
        jnp.where(j0 <= tb2, 0, GAP_OPEN + GAP_EXT * (j0 - tb2)), _INF)
    H0 = jnp.broadcast_to(H0, (TBA, W)).astype(jnp.int32)
    E0 = jnp.full((TBA, W), _INF, dtype=jnp.int32)
    F0 = jnp.full((TBA, W), _INF, dtype=jnp.int32)
    colv0 = jnp.full((TBA, 128), _INF, dtype=jnp.int32)
    coli0 = jnp.zeros((TBA, 128), dtype=jnp.int32)
    window0 = bpad_ref[:, 0:W]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TBA, 128), 1)

    def sel(chunk, r):
        return jnp.sum(jnp.where(lane == r, chunk, 0), axis=1, keepdims=True)

    inf_col = jnp.full((TBA, 1), _INF, dtype=jnp.int32)
    n_chunks = (max_rows + 127) // 128

    def outer(c, carry):
        H, E, F, window, colv, coli = carry
        base = pl.multiple_of(c * 128, 128)
        a_chunk = a_ref[:, pl.ds(base, 128)]
        b_chunk = bpad_ref[:, pl.ds(base + W, 128)]

        def inner(r, carry2):
            H, E, F, window, colv, coli = carry2
            i = c * 128 + r + 1
            a_col = sel(a_chunk, r)
            j = i + w_idx - k1
            sub = jnp.where(window == a_col, 0, MISMATCH).astype(jnp.int32)
            Hup = jnp.concatenate([H[:, 1:], inf_col], axis=1)
            Fup = jnp.concatenate([F[:, 1:], inf_col], axis=1)
            F_row = jnp.minimum(Hup + (GAP_OPEN + GAP_EXT), Fup + GAP_EXT)
            diag = H + sub
            Bv = jnp.minimum(diag, F_row)
            hb = jnp.where(i <= pb2, 0, GAP_OPEN + GAP_EXT * (i - pb2))
            Bv = jnp.where(j == 0, hb, Bv)
            invalid = (j < 0) | (j > n2)
            Bv = jnp.where(invalid, _INF, Bv)
            scan = _prefix_min(Bv - ew)
            E_row = jnp.concatenate([inf_col, scan[:, :-1]], axis=1) \
                + ew + GAP_OPEN
            E_row = jnp.where(invalid, _INF, E_row)
            E_row = jnp.where(w_idx == 0, _INF, E_row)
            H_row = jnp.minimum(Bv, E_row)
            H_row = jnp.where(j == 0, hb, H_row)
            H_row = jnp.where(invalid, _INF, H_row)
            F_rowm = jnp.where(invalid, _INF, F_row)
            Eleft = jnp.concatenate([inf_col, E_row[:, :-1]], axis=1)
            bits = (
                jnp.where(H_row == F_rowm, 1, 0)
                | jnp.where(H_row == E_row, 2, 0)
                | jnp.where(F_rowm == Fup + GAP_EXT, 4, 0)
                | jnp.where(E_row == Eleft + GAP_EXT, 8, 0)
            ).astype(jnp.int8)
            bits_scr[pl.ds((i - 1) * TBA, TBA), :] = bits
            keep = i <= m2
            H = jnp.where(keep, H_row, H)
            E = jnp.where(keep, E_row, E)
            F = jnp.where(keep, F_rowm, F)
            wcol = n2 - i + k1
            hv = jnp.min(jnp.where(w_idx == wcol, H_row, _INF), axis=1,
                         keepdims=True)
            active = (i <= m2) & ((m2 - i) <= pe2) & (wcol >= 0) & (wcol < W)
            better = active & (hv <= colv[:, 0:1])
            colv = jnp.where(better, jnp.broadcast_to(hv, (TBA, 128)), colv)
            coli = jnp.where(better, jnp.full((TBA, 128), 1, jnp.int32) * i,
                             coli)
            nxt = sel(b_chunk, r)
            window = jnp.concatenate([window[:, 1:], nxt], axis=1)
            return H, E, F, window, colv, coli

        return jax.lax.fori_loop(0, 128, inner, (H, E, F, window, colv, coli))

    H, E, F, _w, colv, coli = jax.lax.fori_loop(
        0, n_chunks, outer, (H0, E0, F0, window0, colv0, coli0))

    # ---- end-cell per member (host _end_cell_from_outputs tie order:
    # (m,n) wins ties; last-row window prefers larger j; last column only
    # on strict improvement) ----
    jw = w_idx - k1 + m2                       # j coordinate of lane at row m
    lower = jnp.maximum(0, n2 - te2)
    validw = (jw >= lower) & (jw <= n2 - 1)
    Hm = jnp.where(validw, H, _INF)
    smin = jnp.min(Hm, axis=1, keepdims=True)
    jbest = jnp.max(jnp.where(Hm == smin, jw, -1), axis=1, keepdims=True)
    wmn = n2 - m2 + k1
    s_mn = jnp.min(jnp.where(w_idx == wmn, H, _INF), axis=1, keepdims=True)
    best_s, best_i, best_j = s_mn, m2, n2
    up1 = smin < best_s
    best_s = jnp.where(up1, smin, best_s)
    best_j = jnp.where(up1, jbest, best_j)
    cv = colv[:, 0:1]
    ci = coli[:, 0:1]
    up2 = (pe2 > 0) & (cv < best_s)
    best_s = jnp.where(up2, cv, best_s)
    best_i = jnp.where(up2, ci, best_i)
    best_j = jnp.where(up2, jnp.broadcast_to(n2, best_j.shape), best_j)

    # ---- per-member cursor walk (host _traceback_bits decisions) ----
    # int8 VMEM row indexing must be provably 32-aligned, so the walk loads
    # the full 32-member bits block of row i-1 and mask-selects (sublane s,
    # lane w); op codes accumulate in a register-carried (n_oprows, 128)
    # buffer stored once per member, and end info in a carried (TBA, 128).
    sl = jax.lax.broadcasted_iota(jnp.int32, (TBA, 1), 0)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    slb = jax.lax.broadcasted_iota(jnp.int32, (TBA, 128), 0)
    sl_o = jax.lax.broadcasted_iota(jnp.int32, (n_oprows, 128), 0)
    lane_o = jax.lax.broadcasted_iota(jnp.int32, (n_oprows, 128), 1)
    obuf0 = jnp.zeros((n_oprows, 128), dtype=jnp.int32)

    def extract(col, s):
        return jnp.sum(jnp.where(sl == s, col, 0))

    def member(s, endall):
        ei = extract(best_i, s)
        ej = extract(best_j, s)
        es = extract(best_s, s)

        def cond(c):
            i, j, st, pos, obuf = c
            return (i > 0) | (j > 0)

        def body(c):
            i, j, st, pos, obuf = c
            w = j - i + k1
            iclamp = jnp.maximum(i - 1, 0)
            blk = bits_scr[pl.ds(pl.multiple_of(iclamp * TBA, TBA), TBA), :]
            byte = jnp.sum(jnp.where((slb == s) & (lane == w),
                                     blk.astype(jnp.int32), 0))
            byte = jnp.where((w >= 0) & (w < W), byte, 0)
            at_h = st == 0
            at_f = st == 1
            at_e = st == 2
            h_i0 = at_h & (i == 0)
            h_j0 = at_h & (i > 0) & (j == 0)
            h_in = at_h & (i > 0) & (j > 0)
            goF = h_in & ((byte & 1) != 0)
            goE = h_in & ((byte & 1) == 0) & ((byte & 2) != 0)
            h_diag = h_in & ((byte & 3) == 0)
            emit = ~(goF | goE)
            op = jnp.where(h_i0 | at_e, OP_INS,
                           jnp.where(h_j0 | at_f, OP_DEL,
                                     jnp.where(h_diag, OP_DIAG, 0)))
            di = jnp.where(h_j0 | h_diag | at_f, 1, 0)
            dj = jnp.where(h_i0 | h_diag | at_e, 1, 0)
            f_cont = at_f & ((byte & 4) != 0) & (i > 1)
            e_cont = at_e & ((byte & 8) != 0) & (j > 1)
            st2 = jnp.where(goF, 1,
                            jnp.where(goE, 2,
                                      jnp.where((at_f & ~f_cont)
                                                | (at_e & ~e_cont), 0, st)))
            obuf2 = jnp.where(emit & (sl_o == jax.lax.div(pos, 128))
                              & (lane_o == (pos & 127)), op, obuf)
            pos2 = pos + jnp.where(emit, 1, 0)
            return i - di, j - dj, st2, pos2, obuf2

        _i, _j, _st, pos, obuf = jax.lax.while_loop(
            cond, body, (ei, ej, jnp.int32(0), jnp.int32(0), obuf0))

        ops_ref[pl.ds(pl.multiple_of(s * n_oprows, n_oprows), n_oprows), :] \
            = obuf.astype(jnp.int8)
        endrow = jnp.where(lane1 == 0, es,
                           jnp.where(lane1 == 1, ei,
                                     jnp.where(lane1 == 2, ej,
                                               jnp.where(lane1 == 3, pos,
                                                         0))))
        return jnp.where(slb == s, endrow, endall)

    endall = jax.lax.fori_loop(0, TBA, member,
                               jnp.zeros((TBA, 128), dtype=jnp.int32))
    end_ref[:, :] = endall


@functools.partial(jax.jit,
                   static_argnames=("max_rows", "n_oprows", "interpret"))
def affine_tb_pallas(a, bpad, mn, max_rows: int, n_oprows: int,
                     interpret: bool = False):
    B = a.shape[0]
    n_prog = B // TBA
    kernel = functools.partial(_affine_tb_kernel, max_rows=max_rows,
                               n_oprows=n_oprows)
    return pl.pallas_call(
        kernel,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((TBA, a.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TBA, bpad.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TBA, 8), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((TBA * n_oprows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TBA, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * n_oprows, 128), jnp.int8),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((max_rows * TBA, W_DEV), jnp.int8),
        ],
        interpret=interpret,
    )(a, bpad, mn)


_OP_LUT = np.frombuffer(b"?MID", dtype=np.uint8)  # OP_DIAG/INS/DEL -> chars


def _decode_walk_ops(codes: np.ndarray, p: str, t: str,
                     ei: int, ej: int, m: int, n: int) -> str:
    """Reversed walk codes -> per-base op string with M/X resolved against
    the sequences (vectorized host finish; matches _traceback_bits)."""
    fwd = codes[::-1]
    chars = _OP_LUT[fwd]
    di = (fwd != OP_INS).astype(np.int64)
    dj = (fwd != OP_DEL).astype(np.int64)
    i_idx = np.cumsum(di) - di
    j_idx = np.cumsum(dj) - dj
    isd = fwd == OP_DIAG
    if isd.any():
        pa = np.frombuffer(p.encode(), dtype=np.uint8)
        ta = np.frombuffer(t.encode(), dtype=np.uint8)
        eq = pa[i_idx[isd]] == ta[j_idx[isd]]
        chars = chars.copy()
        chars[isd] = np.where(eq, ord("M"), ord("X"))
    return chars.tobytes().decode() + "D" * (m - ei) + "I" * (n - ej)


def affine_cigars_device_tb(jobs: List[Tuple[str, str, int, int, int, int]],
                            interpret: bool = False):
    """On-device-traceback cigars; returns (cigars, failed_indices)."""
    if not jobs:
        return [], []
    max_rows = 128
    mlen_max = max(len(j[0]) for j in jobs)
    while max_rows < mlen_max:
        max_rows *= 2
    # fixed 32 op-rows (4096-op capacity >= 2*LP_MAX + band): int8 stores at
    # s*n_oprows need 32-alignment, and LP_MAX=1024 keeps 32 sufficient
    n_oprows = 32
    a, bpad, mn = pack_affine_jobs(jobs, max_rows)
    ops, end = affine_tb_pallas(jnp.asarray(a), jnp.asarray(bpad),
                                jnp.asarray(mn), max_rows, n_oprows,
                                interpret=interpret)
    B = a.shape[0]
    n_prog = B // TBA
    ops = np.asarray(ops).reshape(n_prog, TBA, n_oprows * 128)
    end = np.asarray(end)
    cigars: List[str] = [""] * len(jobs)
    failed: List[int] = []
    for idx, (p, t, pb, pe, tb, te) in enumerate(jobs):
        prog, slot = idx // TBA, idx % TBA
        m, n = len(p), len(t)
        score, ei, ej, cnt = (int(end[idx, 0]), int(end[idx, 1]),
                              int(end[idx, 2]), int(end[idx, 3]))
        reach = max(abs(n - m), pb, pe, tb, te)
        if score >= GAP_OPEN + GAP_EXT * (K_DEV + 1 - reach):
            failed.append(idx)
            continue
        codes = ops[prog, slot, :cnt]
        cigars[idx] = _decode_walk_ops(codes, p, t, ei, ej, m, n)
    return cigars, failed


def affine_cigars_device(jobs: List[Tuple[str, str, int, int, int, int]],
                         interpret: bool = False):
    """Device cigars for eligible jobs; returns (cigars, failed_indices).
    Failed members (band escalation needed) must be re-run on the host."""
    if not jobs:
        return [], []
    max_rows = 128
    mlen_max = max(len(j[0]) for j in jobs)
    while max_rows < mlen_max:
        max_rows *= 2
    a, bpad, mn, = pack_affine_jobs(jobs, max_rows)
    bits, hfin, colv, coli = affine_banded_pallas(
        jnp.asarray(a), jnp.asarray(bpad), jnp.asarray(mn), max_rows,
        interpret=interpret)
    # layout: rows stored per program as (row, TBA, W); programs stacked
    B = a.shape[0]
    n_prog = B // TBA
    bits = np.asarray(bits).reshape(n_prog, max_rows, TBA, W_DEV)
    hfin = np.asarray(hfin)
    colv = np.asarray(colv)[:, 0]
    coli = np.asarray(coli)[:, 0]
    cigars: List[str] = [""] * len(jobs)
    failed: List[int] = []
    for idx, (p, t, pb, pe, tb, te) in enumerate(jobs):
        prog = idx // TBA
        slot = idx % TBA
        m = len(p)
        n = len(t)
        member_bits = bits[prog, :, slot, :]
        score, ei, ej = _end_cell_from_outputs(
            hfin[idx], colv[idx], coli[idx], m, n, pe, te)
        reach = max(abs(n - m), pb, pe, tb, te)
        if score >= GAP_OPEN + GAP_EXT * (K_DEV + 1 - reach):
            failed.append(idx)
            continue
        cigars[idx] = _traceback_bits(member_bits, K_DEV, p, t, m, n, ei, ej)
    return cigars, failed
