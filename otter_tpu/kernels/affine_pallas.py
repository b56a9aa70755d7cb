"""Pallas banded gap-affine DP with ON-DEVICE traceback — device consensus
alignments (the reference's WFAlignerGapAffine 4/6/2 + PPOA feed,
src/analignments.cpp:266-282).

Design (all DP state stays on chip):
  * band coordinates exactly like the edit kernel (w = j - i + (k+1)); the
    in-row E dependency is a prefix-min scan (no-gap-chaining property);
  * per row the DP phase stores 4 traceback bits per cell
      bit0 H==F    bit1 H==E    bit2 F extends    bit3 E extends
    into VMEM *scratch* (never leaves the chip), nibble-packed TWO ROWS
    PER BYTE (even row = low nibble, odd row = high nibble) so the row
    budget doubles for the same VMEM: 4096-row patterns at k=63 and
    2048-row at k=127 fit in the same 8 MiB that 1024 unpacked rows
    cost before;
  * the end cell is selected on device with the reference's tie order
    ((m,n) wins ties; last-row window prefers larger j; last column only on
    strict improvement — ops/align_batch._end_cell);
  * the traceback walk runs MEMBER-PARALLEL: a row sweep where every member
    whose cursor sits on the current frontier row steps simultaneously
    (masked vector ops over the 32-member tile), instead of 32 serial
    cursor walks. Each step appends one 2-bit op code (0 pad / 1 diag /
    2 ins / 3 del) at a global step index, packed 16 codes per int32 lane;
  * D2H per member is ~t_words int32 words (+16B end info) — hundreds of
    bytes, not the ~1 byte/DP-cell of a backpointer-output design.

Band variants k=63 (W=128) and k=127 (W=256) keep full per-row traceback
bits in VMEM up to 4096/2048 rows; everything beyond — the WFA high-error
regime (2.3 kb ONT members at e~150 score ~750, bands k=255/511) AND
long-read members to 16 kb at any band — runs the CHECKPOINTED kernel
(_affine_tb_ckpt_kernel), which stores H and F rows every 256 rows (E is
row-local, no carry needed) and recomputes traceback bits block-by-block
during the walk. Jobs are bucketed by (band, pattern rows) so short jobs
never pay a long bucket's DP, and failed members escalate to the next
admissible band on device before falling back to the host ladder
(ops/align_batch.py) — exactness is never sacrificed. Measured on TPU
v5e (2026-08-20): 16x 15 kb 0.3%-error members 338 ms steady vs 430 ms
native; 16x 7 kb 2% members 116 ms vs 320 ms; byte parity throughout.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.align_np import (GAP_EXT, GAP_OPEN, MISMATCH, _codes,
                            band_validity_cap)

K_DEV = 63               # default band (HiFi-error jobs)
K_WIDE = 127             # wide band (mixed-error jobs)
K_ONT = 255              # ONT-error band (checkpointed kernel)
K_XWIDE = 511            # extreme-divergence band (checkpointed kernel)
TBA = 32                 # members per program (int8 row-tile alignment)
# Per-band pattern-row caps. k=63/127 store the full nibble-packed
# traceback scratch (max_rows/2 * TBA * W bytes, 8 MiB budget). k=255/511
# use the CHECKPOINTED kernel: the forward DP stores H/E/F rows every
# _CKPT_BLK rows (3 * rows/BLK * TBA * W * 4 bytes) and the walk
# recomputes one block of bits at a time ((BLK/2) * TBA * W bytes), so
# the wide bands fit the same VMEM at full row depth.
LP_MAX_NARROW = 4096     # k=63  (W=128):  4096/2*32*128 = 8 MiB
LP_MAX_WIDE = 2048       # k=127 (W=256):  2048/2*32*256 = 8 MiB
LP_MAX_ONT = 16384       # k=255 (W=512):  H/F ckpt 8 MiB + block bits 2 MiB
LP_MAX_XWIDE = 16384     # k=511 (W=1024): H/F ckpt 16 MiB + block bits 4 MiB
#   (~25 MiB/program total at k=511 full depth — within the raised
#   vmem_limit below; caps were 8192/4096 before the limit was raised,
#   which silently excluded 10 kb medium-error members, VERDICT-r4-era
#   refscale consensus falling back to the native ladder)
# Rows past the nibble caps run the checkpointed kernel at ANY band (its
# VMEM grows only ~linearly in rows via the H/F checkpoints): 16 kb
# patterns at k=63/127 cost ~2.5/5 MiB of scratch — full long-read member
# coverage, not just the ONT bands.
LP_MAX = 16384           # overall device row cap (k=63/127 ckpt kernel)
LT_MAX = 16384           # max text length handled on device
_CKPT_BLK = 256          # checkpoint block rows (sqrt(32*rows) optimum)

_INF = 1 << 28

OP_DIAG, OP_INS, OP_DEL = 1, 2, 3


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


def _affine_tb_kernel(a_ref, bpad_ref, mn_ref, ops_ref, end_ref, bits_scr,
                      ci_scr, cj_scr, st_scr,
                      *, k: int, max_rows: int, t_words: int,
                      track_col: bool = True):
    W = 2 * (k + 1)
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
    window0 = bpad_ref[:, 0:W].astype(jnp.int32)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (TBA, 128), 1)
    laneW = jax.lax.broadcasted_iota(jnp.int32, (TBA, W), 1)

    def sel(chunk, r):
        return jnp.sum(jnp.where(lane128 == r, chunk, 0), axis=1,
                       keepdims=True)

    inf_col = jnp.full((TBA, 1), _INF, dtype=jnp.int32)
    # dynamic row bound: rows past the longest member in THIS tile are
    # no-ops (keep = i <= m2 everywhere), so the chunk loop stops at the
    # tile's own ceiling instead of the bucket's static max_rows — a
    # 10 kb tile in a 16384-row bucket runs 10048 rows, not 16384
    max_m = jnp.max(jnp.stack([mn_ref[t, 0] for t in range(TBA)]))
    n_chunks = jnp.minimum((max_m + 127) // 128, (max_rows + 127) // 128)

    def outer(c, carry):
        H, E, F, window, colv, coli = carry
        base = pl.multiple_of(c * 128, 128)
        a_chunk = a_ref[:, pl.ds(base, 128)].astype(jnp.int32)
        b_chunk = bpad_ref[:, pl.ds(base + W, 128)].astype(jnp.int32)

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
            )
            # nibble-pack: row ri=i-1 shares a byte with its row-pair
            # partner. Even ri overwrites the whole byte (low nibble set,
            # high zeroed — its partner row ri+1 is always written later);
            # odd ri ORs into the high nibble of the byte row ri wrote.
            ri = i - 1
            half = ri - (ri // 2) * 2
            rbase = pl.multiple_of((ri // 2) * TBA, TBA)
            prev = bits_scr[pl.ds(rbase, TBA), :].astype(jnp.int32)
            packed = jnp.where(half == 1,
                               (prev & 15) | jax.lax.shift_left(bits, 4),
                               bits)
            bits_scr[pl.ds(rbase, TBA), :] = packed.astype(jnp.int8)
            keep = i <= m2
            H = jnp.where(keep, H_row, H)
            E = jnp.where(keep, E_row, E)
            F = jnp.where(keep, F_rowm, F)
            if track_col:
                # last-column tracking (j == n): ascending i with <= keeps
                # the largest i among score ties, matching the reference's
                # descending strict-< scan (ops/align_batch._end_cell).
                # Compiled OUT (static track_col=False) for buckets whose
                # jobs all have pe == 0 — the end cell is then never on
                # the last column except at (m, n), which s_mn covers —
                # saving a masked min-reduce per DP row.
                wcol = n2 - i + k1
                hv = jnp.min(jnp.where(w_idx == wcol, H_row, _INF), axis=1,
                             keepdims=True)
                active = (i <= m2) & ((m2 - i) <= pe2) & (wcol >= 0) \
                    & (wcol < W)
                better = active & (hv <= colv[:, 0:1])
                colv = jnp.where(better, jnp.broadcast_to(hv, (TBA, 128)),
                                 colv)
                coli = jnp.where(better,
                                 jnp.full((TBA, 128), 1, jnp.int32) * i,
                                 coli)
            nxt = sel(b_chunk, r)
            window = jnp.concatenate([window[:, 1:], nxt], axis=1)
            return H, E, F, window, colv, coli

        return jax.lax.fori_loop(0, 128, inner, (H, E, F, window, colv, coli))

    H, E, F, _w, colv, coli = jax.lax.fori_loop(
        0, n_chunks, outer, (H0, E0, F0, window0, colv0, coli0))

    # ---- end-cell per member (reference tie order: (m,n) wins ties;
    # last-row window prefers larger j; last column only on strict
    # improvement) ----
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
    ci_ = coli[:, 0:1]
    up2 = (pe2 > 0) & (cv < best_s)
    best_s = jnp.where(up2, cv, best_s)
    best_i = jnp.where(up2, ci_, best_i)
    best_j = jnp.where(up2, jnp.broadcast_to(n2, best_j.shape), best_j)

    # ---- band-validity gate (mn[:,6] = band_validity_cap, computed on
    # host at pack time): members whose banded score is NOT provably
    # optimal never walk — their cursor starts at (0,0) (immediately done,
    # zero ops emitted) and the host fails them into the ladder. This is
    # what makes the _T_WORDS step budgets provable: only members whose
    # walked path has score < cap (hence a cap-bounded gap-char count)
    # consume walk iterations.
    cap2 = jnp.stack([mn_ref[t, 6] for t in range(TBA)]).reshape(TBA, 1)
    validb = best_s < cap2
    best_i = jnp.where(validb, best_i, 0)
    best_j = jnp.where(validb, best_j, 0)

    # ---- member-parallel traceback: row sweep over the frontier ----
    # Every iteration, all members whose cursor row equals the frontier
    # (max over unfinished members) take one walk step together; op codes
    # land at the shared global step index t, packed 16 two-bit codes per
    # int32 lane. Decisions per member are identical to the serial
    # reference walk (ops/align_batch._traceback_banded).
    # Walk state lives in VMEM scratch refs; the while_loop carries only
    # scalars (Mosaic cannot legalize vector carries whose lane layout
    # differs between init and yield).
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (TBA, t_words), 1)
    t_max = t_words * 16
    one = jnp.int32(1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (TBA, 128), 1)

    ci_scr[:, :] = jnp.broadcast_to(best_i, (TBA, 128)).astype(jnp.int32)
    cj_scr[:, :] = jnp.broadcast_to(best_j, (TBA, 128)).astype(jnp.int32)
    st_scr[:, :] = jnp.zeros((TBA, 128), dtype=jnp.int32)   # 0=H 1=F 2=E
    ops_ref[:, :] = jnp.zeros((TBA, t_words), dtype=jnp.int32)
    alldone0 = jnp.min(((best_i == 0) & (best_j == 0))
                       .astype(jnp.int32)).astype(jnp.int32)

    def w_cond(c):
        t, alldone = c
        return jnp.logical_and(t < t_max, alldone == 0)

    def w_body(c):
        t, alldone = c
        ci = ci_scr[:, :]
        cj = cj_scr[:, :]
        st = st_scr[:, :]
        done = ((ci == 0) & (cj == 0)).astype(jnp.int32)
        rcur = jnp.max(jnp.where(done != 0, -1, ci))
        rclamp = jnp.maximum(rcur, 1)
        ri = rclamp - 1
        half = ri - (ri // 2) * 2
        blkb = bits_scr[pl.ds(pl.multiple_of((ri // 2) * TBA, TBA),
                              TBA), :].astype(jnp.int32)
        blk = jnp.where(half == 1, (blkb & 255) >> 4, blkb & 15)
        w_col = cj[:, 0:1] - ci[:, 0:1] + k1
        byte = jnp.sum(
            jnp.where(laneW == w_col, blk, 0),
            axis=1, keepdims=True)
        byte = jnp.where((w_col >= 0) & (w_col < W), byte, 0)
        act = (done == 0) & (ci == rcur)
        at_h = act & (st == 0)
        at_f = act & (st == 1)
        at_e = act & (st == 2)
        h_i0 = at_h & (ci == 0)
        h_j0 = at_h & (ci > 0) & (cj == 0)
        h_in = at_h & (ci > 0) & (cj > 0)
        goF = h_in & ((byte & 1) != 0)
        goE = h_in & ((byte & 1) == 0) & ((byte & 2) != 0)
        h_diag = h_in & ((byte & 3) == 0)
        emit = act & ~(goF | goE)
        op = jnp.where(h_i0 | at_e, OP_INS,
                       jnp.where(h_j0 | at_f, OP_DEL,
                                 jnp.where(h_diag, OP_DIAG, 0)))
        di = jnp.where(h_j0 | h_diag | at_f, one, 0)
        dj = jnp.where(h_i0 | h_diag | at_e, one, 0)
        f_cont = at_f & ((byte & 4) != 0) & (ci > 1)
        e_cont = at_e & ((byte & 8) != 0) & (cj > 1)
        st2 = jnp.where(goF, 1,
                        jnp.where(goE, 2,
                                  jnp.where((at_f & ~f_cont)
                                            | (at_e & ~e_cont), 0, st)))
        ci = ci - jnp.where(act, di, 0)
        cj = cj - jnp.where(act, dj, 0)
        st_scr[:, :] = jnp.where(act, st2, st)
        ci_scr[:, :] = ci
        cj_scr[:, :] = cj
        word = jax.lax.div(t, 16)
        shift = (t - word * 16) * 2
        ops_ref[:, :] = ops_ref[:, :] | jnp.where(
            (lane_t == word) & emit[:, 0:1],
            jax.lax.shift_left(op[:, 0:1], shift), 0)
        alldone = jnp.min(((ci == 0) & (cj == 0)).astype(jnp.int32))
        return t + 1, alldone.astype(jnp.int32)

    _t, _ad = jax.lax.while_loop(w_cond, w_body, (jnp.int32(0), alldone0))

    done_fin = ((ci_scr[:, :] == 0) & (cj_scr[:, :] == 0)
                & validb).astype(jnp.int32)
    endall = jnp.where(lane1 == 0, jnp.broadcast_to(best_s, (TBA, 128)),
                       jnp.where(lane1 == 1,
                                 jnp.broadcast_to(best_i, (TBA, 128)),
                                 jnp.where(lane1 == 2,
                                           jnp.broadcast_to(best_j,
                                                            (TBA, 128)),
                                           jnp.where(lane1 == 3,
                                                     done_fin, 0))))
    end_ref[:, :] = endall


@functools.partial(jax.jit,
                   static_argnames=("k", "max_rows", "t_words", "track_col",
                                    "interpret"))
def affine_tb_pallas(a, bpad, mn, k: int, max_rows: int, t_words: int,
                     track_col: bool = True, interpret: bool = False):
    B = a.shape[0]
    n_prog = B // TBA
    W = 2 * (k + 1)
    kernel = functools.partial(_affine_tb_kernel, k=k, max_rows=max_rows,
                               t_words=t_words, track_col=track_col)
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
            pl.BlockSpec((TBA, t_words), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TBA, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, t_words), jnp.int32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((((max_rows + 1) // 2) * TBA, W), jnp.int8),
            pltpu.VMEM((TBA, 128), jnp.int32),
            pltpu.VMEM((TBA, 128), jnp.int32),
            pltpu.VMEM((TBA, 128), jnp.int32),
        ],
        # full-bits scratch to 16384 rows at k=63 (8192 at k=127) is
        # ~33.5 MiB — past the 16 MiB guardrail but well inside this
        # hardware's VMEM (same note as the ckpt/striped kernels). Full
        # bits beat the ckpt kernel for every fitting shape: the walk
        # reads stored nibbles instead of recomputing a DP pass over
        # every walked block
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(a, bpad, mn)


def _affine_tb_ckpt_kernel(a_ref, bpad_ref, mn_ref, ops_ref, end_ref,
                           bits_scr, ckh_scr, ckf_scr,
                           ci_scr, cj_scr, st_scr,
                           *, k: int, max_rows: int, t_words: int,
                           track_col: bool = True):
    """Checkpointed variant for wide bands (k=255/511, the WFA high-error
    regime): the forward DP stores H/E/F rows every _CKPT_BLK rows instead
    of per-row traceback bits; the walk then recomputes one block of
    nibble-packed bits at a time into a small VMEM buffer as the
    member-parallel frontier descends through it. Costs one extra DP pass
    over walked blocks; shrinks traceback VMEM from rows/2*TBA*W bytes to
    3*(rows/BLK)*TBA*W*4 + (BLK/2)*TBA*W, which is what lets 2.3 kb
    ONT-error members (score ~750, needs k>=255) run on device at all.
    DP math, end-cell tie order, walk decisions and packing are identical
    to _affine_tb_kernel."""
    W = 2 * (k + 1)
    k1 = k + 1
    BLK = _CKPT_BLK
    n_blocks = max_rows // BLK
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
    F0 = jnp.full((TBA, W), _INF, dtype=jnp.int32)
    colv0 = jnp.full((TBA, 128), _INF, dtype=jnp.int32)
    coli0 = jnp.zeros((TBA, 128), dtype=jnp.int32)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (TBA, 128), 1)
    laneW = jax.lax.broadcasted_iota(jnp.int32, (TBA, W), 1)

    def sel(chunk, r):
        return jnp.sum(jnp.where(lane128 == r, chunk, 0), axis=1,
                       keepdims=True)

    inf_col = jnp.full((TBA, 1), _INF, dtype=jnp.int32)

    def dp_row(i, H, F, window, a_col):
        """One DP row; returns (H_row, E_row, F_rowm, bits). Identical math
        to _affine_tb_kernel's inner body. E needs no carry at all: the
        E recurrence is row-local (prefix-min over B within the row — the
        no-gap-chaining property), so checkpoints store only H and F,
        which is what lets k=511 reach 4096 rows in budget."""
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
        )
        return H_row, E_row, F_rowm, bits

    # block-0 checkpoint = the initial state (uniform slot-b loads later)
    ckh_scr[pl.ds(0, TBA), :] = H0
    ckf_scr[pl.ds(0, TBA), :] = F0

    window0 = bpad_ref[:, 0:W].astype(jnp.int32)
    # dynamic row bound (see _affine_tb_kernel): stop at the tile's own
    # longest member, not the bucket's static max_rows
    max_m = jnp.max(jnp.stack([mn_ref[t, 0] for t in range(TBA)]))
    n_chunks = jnp.minimum((max_m + 127) // 128, (max_rows + 127) // 128)

    def outer(c, carry):
        H, F, window, colv, coli = carry
        base = pl.multiple_of(c * 128, 128)
        a_chunk = a_ref[:, pl.ds(base, 128)].astype(jnp.int32)
        b_chunk = bpad_ref[:, pl.ds(base + W, 128)].astype(jnp.int32)

        def inner(r, carry2):
            H, F, window, colv, coli = carry2
            i = c * 128 + r + 1
            a_col = sel(a_chunk, r)
            H_row, _E_row, F_rowm, _bits = dp_row(i, H, F, window, a_col)
            keep = i <= m2
            H = jnp.where(keep, H_row, H)
            F = jnp.where(keep, F_rowm, F)
            if track_col:
                # see _affine_tb_kernel: compiled out for pe == 0 buckets
                wcol = n2 - i + k1
                hv = jnp.min(jnp.where(w_idx == wcol, H_row, _INF), axis=1,
                             keepdims=True)
                active = (i <= m2) & ((m2 - i) <= pe2) & (wcol >= 0) \
                    & (wcol < W)
                better = active & (hv <= colv[:, 0:1])
                colv = jnp.where(better, jnp.broadcast_to(hv, (TBA, 128)),
                                 colv)
                coli = jnp.where(better,
                                 jnp.full((TBA, 128), 1, jnp.int32) * i,
                                 coli)
            ib = i // BLK
            @pl.when(jnp.logical_and(i - ib * BLK == 0, i < max_rows))
            def _():
                cbase = pl.multiple_of(ib * TBA, TBA)
                ckh_scr[pl.ds(cbase, TBA), :] = H
                ckf_scr[pl.ds(cbase, TBA), :] = F
            nxt = sel(b_chunk, r)
            window = jnp.concatenate([window[:, 1:], nxt], axis=1)
            return H, F, window, colv, coli

        return jax.lax.fori_loop(0, 128, inner, (H, F, window, colv, coli))

    H, F, _w, colv, coli = jax.lax.fori_loop(
        0, n_chunks, outer, (H0, F0, window0, colv0, coli0))

    # ---- end cell (identical tie order to _affine_tb_kernel) ----
    jw = w_idx - k1 + m2
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
    ci_ = coli[:, 0:1]
    up2 = (pe2 > 0) & (cv < best_s)
    best_s = jnp.where(up2, cv, best_s)
    best_i = jnp.where(up2, ci_, best_i)
    best_j = jnp.where(up2, jnp.broadcast_to(n2, best_j.shape), best_j)

    # band-validity gate (see _affine_tb_kernel)
    cap2 = jnp.stack([mn_ref[t, 6] for t in range(TBA)]).reshape(TBA, 1)
    validb = best_s < cap2
    best_i = jnp.where(validb, best_i, 0)
    best_j = jnp.where(validb, best_j, 0)

    # ---- walk: per block (last to first) recompute bits, then sweep ----
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (TBA, t_words), 1)
    t_max = t_words * 16
    one = jnp.int32(1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (TBA, 128), 1)

    ci_scr[:, :] = jnp.broadcast_to(best_i, (TBA, 128)).astype(jnp.int32)
    cj_scr[:, :] = jnp.broadcast_to(best_j, (TBA, 128)).astype(jnp.int32)
    st_scr[:, :] = jnp.zeros((TBA, 128), dtype=jnp.int32)
    ops_ref[:, :] = jnp.zeros((TBA, t_words), dtype=jnp.int32)
    done0 = (best_i == 0) & (best_j == 0)
    alldone0 = jnp.min(done0.astype(jnp.int32)).astype(jnp.int32)
    rcur0 = jnp.max(jnp.where(done0, -1, best_i)).astype(jnp.int32)

    def block_body(bi_rev, carry):
        t, alldone, rcur = carry
        block = n_blocks - 1 - bi_rev
        blo = block * BLK

        @pl.when(jnp.logical_and(alldone == 0, rcur > blo))
        def _():
            cbase = pl.multiple_of(block * TBA, TBA)
            Hc = ckh_scr[pl.ds(cbase, TBA), :]
            Fc = ckf_scr[pl.ds(cbase, TBA), :]
            wstart = pl.multiple_of(block * BLK, 128)
            window_c = bpad_ref[:, pl.ds(wstart, W)].astype(jnp.int32)

            def router(c2, carry2):
                rbase = pl.multiple_of(block * BLK + c2 * 128, 128)
                a_chunk = a_ref[:, pl.ds(rbase, 128)].astype(jnp.int32)
                b_chunk = bpad_ref[:, pl.ds(rbase + W, 128)].astype(jnp.int32)

                def rinner(r, carry3):
                    H, F, window = carry3
                    i = block * BLK + c2 * 128 + r + 1
                    a_col = sel(a_chunk, r)
                    H_row, _E_row, F_rowm, bits = dp_row(i, H, F, window,
                                                         a_col)
                    ril = i - 1 - blo
                    half = ril - (ril // 2) * 2
                    bbase = pl.multiple_of((ril // 2) * TBA, TBA)
                    prev = bits_scr[pl.ds(bbase, TBA), :].astype(jnp.int32)
                    packed = jnp.where(half == 1,
                                       (prev & 15) | jax.lax.shift_left(bits,
                                                                        4),
                                       bits)
                    bits_scr[pl.ds(bbase, TBA), :] = packed.astype(jnp.int8)
                    keep = i <= m2
                    H = jnp.where(keep, H_row, H)
                    F = jnp.where(keep, F_rowm, F)
                    nxt = sel(b_chunk, r)
                    window = jnp.concatenate([window[:, 1:], nxt], axis=1)
                    return H, F, window

                return jax.lax.fori_loop(0, 128, rinner, carry2)

            jax.lax.fori_loop(0, BLK // 128, router, (Hc, Fc, window_c))

        # block 0 additionally sweeps the row-0 insertion tails (rcur == 0)
        lo = jnp.where(block > 0, blo, -1).astype(jnp.int32)

        def w_cond(c):
            t, alldone, rcur = c
            return jnp.logical_and(
                jnp.logical_and(t < t_max, alldone == 0), rcur > lo)

        def w_body(c):
            t, alldone, rcur = c
            ci = ci_scr[:, :]
            cj = cj_scr[:, :]
            st = st_scr[:, :]
            done = ((ci == 0) & (cj == 0)).astype(jnp.int32)
            rclamp = jnp.maximum(rcur, 1)
            ril = rclamp - 1 - blo
            half = ril - (ril // 2) * 2
            blkb = bits_scr[pl.ds(pl.multiple_of((ril // 2) * TBA, TBA),
                                  TBA), :].astype(jnp.int32)
            blk = jnp.where(half == 1, (blkb & 255) >> 4, blkb & 15)
            w_col = cj[:, 0:1] - ci[:, 0:1] + k1
            byte = jnp.sum(
                jnp.where(laneW == w_col, blk, 0),
                axis=1, keepdims=True)
            byte = jnp.where((w_col >= 0) & (w_col < W), byte, 0)
            act = (done == 0) & (ci == rcur)
            at_h = act & (st == 0)
            at_f = act & (st == 1)
            at_e = act & (st == 2)
            h_i0 = at_h & (ci == 0)
            h_j0 = at_h & (ci > 0) & (cj == 0)
            h_in = at_h & (ci > 0) & (cj > 0)
            goF = h_in & ((byte & 1) != 0)
            goE = h_in & ((byte & 1) == 0) & ((byte & 2) != 0)
            h_diag = h_in & ((byte & 3) == 0)
            emit = act & ~(goF | goE)
            op = jnp.where(h_i0 | at_e, OP_INS,
                           jnp.where(h_j0 | at_f, OP_DEL,
                                     jnp.where(h_diag, OP_DIAG, 0)))
            di = jnp.where(h_j0 | h_diag | at_f, one, 0)
            dj = jnp.where(h_i0 | h_diag | at_e, one, 0)
            f_cont = at_f & ((byte & 4) != 0) & (ci > 1)
            e_cont = at_e & ((byte & 8) != 0) & (cj > 1)
            st2 = jnp.where(goF, 1,
                            jnp.where(goE, 2,
                                      jnp.where((at_f & ~f_cont)
                                                | (at_e & ~e_cont), 0, st)))
            ci = ci - jnp.where(act, di, 0)
            cj = cj - jnp.where(act, dj, 0)
            st_scr[:, :] = jnp.where(act, st2, st)
            ci_scr[:, :] = ci
            cj_scr[:, :] = cj
            word = jax.lax.div(t, 16)
            shift = (t - word * 16) * 2
            ops_ref[:, :] = ops_ref[:, :] | jnp.where(
                (lane_t == word) & emit[:, 0:1],
                jax.lax.shift_left(op[:, 0:1], shift), 0)
            done2 = ((ci == 0) & (cj == 0)).astype(jnp.int32)
            alldone = jnp.min(done2)
            rcur2 = jnp.max(jnp.where(done2 != 0, -1, ci)).astype(jnp.int32)
            return t + 1, alldone.astype(jnp.int32), rcur2

        return jax.lax.while_loop(w_cond, w_body, (t, alldone, rcur))

    _t, _ad, _rc = jax.lax.fori_loop(
        0, n_blocks, block_body, (jnp.int32(0), alldone0, rcur0))

    done_fin = ((ci_scr[:, :] == 0) & (cj_scr[:, :] == 0)
                & validb).astype(jnp.int32)
    endall = jnp.where(lane1 == 0, jnp.broadcast_to(best_s, (TBA, 128)),
                       jnp.where(lane1 == 1,
                                 jnp.broadcast_to(best_i, (TBA, 128)),
                                 jnp.where(lane1 == 2,
                                           jnp.broadcast_to(best_j,
                                                            (TBA, 128)),
                                           jnp.where(lane1 == 3,
                                                     done_fin, 0))))
    end_ref[:, :] = endall


@functools.partial(jax.jit,
                   static_argnames=("k", "max_rows", "t_words", "track_col",
                                    "interpret"))
def affine_tb_ckpt_pallas(a, bpad, mn, k: int, max_rows: int, t_words: int,
                          track_col: bool = True, interpret: bool = False):
    B = a.shape[0]
    n_prog = B // TBA
    W = 2 * (k + 1)
    n_blocks = max_rows // _CKPT_BLK
    kernel = functools.partial(_affine_tb_ckpt_kernel, k=k, max_rows=max_rows,
                               t_words=t_words, track_col=track_col)
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
            pl.BlockSpec((TBA, t_words), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TBA, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, t_words), jnp.int32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM(((_CKPT_BLK // 2) * TBA, W), jnp.int8),
            pltpu.VMEM((n_blocks * TBA, W), jnp.int32),
            pltpu.VMEM((n_blocks * TBA, W), jnp.int32),
            pltpu.VMEM((TBA, 128), jnp.int32),
            pltpu.VMEM((TBA, 128), jnp.int32),
            pltpu.VMEM((TBA, 128), jnp.int32),
        ],
        # full-depth wide bands (k=511 x 16384 rows) need ~25 MiB of
        # scoped VMEM; the default 16 MiB budget is a guardrail, not the
        # physical limit (same note as the striped Myers kernel)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(a, bpad, mn)


def pack_affine_jobs(jobs: List[Tuple[str, str, int, int, int, int]],
                     max_rows: int, k: int = K_DEV):
    """jobs: (pattern, text, pb, pe, tb, te) -> kernel inputs.

    Sequences ship as int8 (codes 0..3, pads -2/-1): H2D bytes are the
    dominant cost of a dispatch through tunneled TPUs (measured ~130 MB/s;
    the old int32 arrays cost 4x the wire time), the kernels widen to
    int32 on load."""
    B = ((len(jobs) + TBA - 1) // TBA) * TBA
    a = np.zeros((B, max_rows), dtype=np.int8)
    W = 2 * (k + 1)
    ntxt_max = max(len(j[1]) for j in jobs)
    bpad = np.zeros((B, max(max_rows, ntxt_max) + W + 2), dtype=np.int8)
    bpad -= 1
    a -= 2
    mn = np.zeros((B, 8), dtype=np.int32)
    for i, (p, t, pb, pe, tb, te) in enumerate(jobs):
        pc = _codes(p).astype(np.int8)
        tc = _codes(t).astype(np.int8)
        a[i, : len(pc)] = pc
        bpad[i, k + 1 : k + 1 + len(tc)] = tc
        cap = band_validity_cap(len(pc), len(tc), pb, pe, tb, te, k)
        mn[i] = (len(pc), len(tc), pb, tb, pe, te, cap, 0)
    return a, bpad, mn


def pack_affine_jobs_pooled(jobs: List[Tuple[str, str, int, int, int, int]],
                            max_rows: int, k: int = K_DEV,
                            batch_pad: int = 0, text_pad: int = 0):
    """pack_affine_jobs with the PATTERN side deduplicated: consensus
    aligns every member against its allele's one medoid rep
    (analignments.cpp:266-282), so a bucket of B jobs usually carries only
    a handful of distinct patterns — ship each once and gather on device.
    batch_pad/text_pad fix the batch and text dimensions to caller-chosen
    buckets so compile shapes stay bounded (pad tiles cost ~nothing: the
    kernels' dynamic row bound sees their m = 0).
    Returns (a_pool (U, max_rows) int8, pat_idx (B,), bpad, mn)."""
    B = max(batch_pad, ((len(jobs) + TBA - 1) // TBA) * TBA)
    W = 2 * (k + 1)
    ntxt_max = max(max(len(j[1]) for j in jobs), text_pad)
    bpad = np.zeros((B, max(max_rows, ntxt_max) + W + 2), dtype=np.int8)
    bpad -= 1
    mn = np.zeros((B, 8), dtype=np.int32)
    pat_idx = np.zeros(B, dtype=np.int32)
    uniq: dict = {}
    rows: List[np.ndarray] = []
    for i, (p, t, pb, pe, tb, te) in enumerate(jobs):
        key = id(p)
        u = uniq.get(key)
        if u is None:
            u = uniq[key] = len(rows)
            pc = _codes(p).astype(np.int8)
            row = np.full(max_rows, -2, dtype=np.int8)
            row[: len(pc)] = pc
            rows.append(row)
        pat_idx[i] = u
        tc = _codes(t).astype(np.int8)
        bpad[i, k + 1 : k + 1 + len(tc)] = tc
        cap = band_validity_cap(len(p), len(t), pb, pe, tb, te, k)
        mn[i] = (len(p), len(t), pb, tb, pe, te, cap, 0)
    # pad the pool to a power of two so compile shapes stay bounded
    U = 4
    while U < len(rows):
        U *= 2
    while len(rows) < U:
        rows.append(np.full(max_rows, -2, dtype=np.int8))
    a_pool = np.stack(rows)
    return a_pool, pat_idx, bpad, mn


@functools.partial(jax.jit,
                   static_argnames=("k", "max_rows", "t_words", "track_col",
                                    "use_ckpt", "interpret"))
def affine_tb_pooled(a_pool, pat_idx, bpad, mn, k: int, max_rows: int,
                     t_words: int, track_col: bool, use_ckpt: bool,
                     interpret: bool = False):
    """Pattern-pool dispatch: the (B, max_rows) pattern block is an XLA
    gather in HBM (never crosses the host link), then the regular kernel
    runs."""
    a = jnp.take(a_pool, pat_idx, axis=0)
    run = affine_tb_ckpt_pallas if use_ckpt else affine_tb_pallas
    return run(a, bpad, mn, k, max_rows, t_words, track_col=track_col,
               interpret=interpret)


_OP_LUT = np.frombuffer(b"?MID", dtype=np.uint8)  # OP_DIAG/INS/DEL -> chars


def _decode_walk_ops(codes: np.ndarray, p: str, t: str,
                     ei: int, ej: int, m: int, n: int) -> str:
    """Reversed walk codes -> per-base op string with M/X resolved against
    the sequences (vectorized host finish)."""
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


def _unpack_codes(obuf: np.ndarray, t_words: int) -> np.ndarray:
    """(B, t_words) int32 -> (B, t_words*16) uint8 2-bit codes, step order."""
    B = obuf.shape[0]
    shifts = (np.arange(16, dtype=np.uint32) * 2)[None, None, :]
    u = obuf.astype(np.uint32)[:, :, None]
    codes = (u >> shifts) & 3
    return codes.reshape(B, t_words * 16).astype(np.uint8)


def _rows_bucket(m: int) -> int:
    for cap in (256, 1024, 2048, 4096, 8192):
        if m <= cap:
            return cap
    return 16384


# per-band pattern-row caps (VMEM-derived, see constants above); rows
# beyond the nibble kernels' caps run the checkpointed kernel at any band
_ROWS_CAP = {K_DEV: LP_MAX, K_WIDE: LP_MAX,
             K_ONT: LP_MAX_ONT, K_XWIDE: LP_MAX_XWIDE}
# nibble (full-bits) kernel caps; (k, rows) beyond these -> ckpt kernel.
# Sized to ~33.5 MiB of bits scratch (rows/2 * TBA * W bytes) under the
# raised vmem_limit — full bits always beat the ckpt kernel when they fit
# (no walk-time DP recompute), so k=63 now covers the 16 kb device row cap
# outright, k=127 to 8192 rows, and the ONT-regime bands k=255/511 to
# 4096/2048 rows — 2.3 kb ONT-error members (the consensus wall of the
# ONT leg) now take the nibble kernel instead of the ckpt recompute
# (2026-08-21; caps were 4096/2048 @ k=63/127 only under the old 8 MiB
# budget)
_NIBBLE_CAP = {K_DEV: 16384, K_WIDE: 8192, K_ONT: 4096, K_XWIDE: 2048}


def _t_words(max_rows: int, k: int) -> int:
    """Walk-step budget in packed int32 words (t_max = 16 * t_words).

    PROOF that any single valid member's walk fits the budget. Only
    members passing the in-kernel validity gate walk (score < cap, with
    cap = band_validity_cap <= 2*GAP_OPEN + GAP_EXT*(3k+3) = 6k+18 for any
    admissible job: a_up <= k+1, b_up <= 2k+2 since admission requires the
    end-diagonal range to intersect the band). A walking member's
    iteration count decomposes as
      #diag + #D        <= ei             <= max_rows  (each decrements ci)
      scored I chars    <= (cap-GO)/GE    <= 3k+6      (each costs GAP_EXT)
      free-begin I tail <= start diagonal <= k+1       (walk stays in band)
      goF/goE entries   <= #gap runs      <= cap/GO    <= k+3
    so iterations <= max_rows + 5k + 10 when walking alone. The budget
    adds >=1000 steps of slack for MULTI-member frontier desync (the row
    sweep stalls on whichever member holds the frontier; stalls sum over
    members in the worst case) — overruns there mark the member failed
    (host ladder re-runs it; exactness is unconditional), they cannot
    produce a wrong cigar. tests/test_affine_device.py pins the
    alone-worst boundary. The word set is fixed so engine compiles stay
    bounded."""
    need = max_rows + 5 * k + 10 + 1000
    for w in (128, 256, 384, 512, 640, 768, 1152, 1280):
        if 16 * w >= need:
            return w
    return 1280


def _admissible_bands(m: int, n: int, pb: int, pe: int, tb: int, te: int,
                      hint) -> List[int]:
    """Bands (narrowest first) worth trying for one job. A band qualifies
    when the pattern fits its row cap, the allowed end-diagonal range
    [n-m-te, n-m+pe] intersects [-(k+1), k] (else no end cell is even
    representable), and its validity cap is attainable: with a dist hint e
    the affine score is >= 2e (gap-extend 2/edit is the floor), so
    2e at/past the cap is a certain escalation; without a hint require
    +16 diagonal slack around the length difference."""
    out: List[int] = []
    for cand in (K_DEV, K_WIDE, K_ONT, K_XWIDE):
        if m > _ROWS_CAP[cand]:
            continue
        if (n - m + pe) < -(cand + 1) or (n - m - te) > cand:
            continue
        cap = band_validity_cap(m, n, pb, pe, tb, te, cand)
        if cap <= 0:
            continue
        if hint is not None:
            if 2 * int(hint) >= cap:
                continue
            # giant-row buckets (>4096 rows) compile for minutes and run
            # long DPs: demand a realistic score ESTIMATE fit, not just
            # the 2e lower bound, so a doomed pass doesn't waste a huge
            # compile+DP (exactness unaffected — the ladder serves
            # whatever is skipped). The estimate splits the hint into the
            # length-difference part (gap chars ~2/edit, one open) and
            # the rest (mismatch-ish ~5/edit): a flat 5e rejected every
            # het-indel member (e.g. e=330 with a 300 bp gap scores ~760,
            # not 1650)
            delta = min(int(hint), abs(n - m))
            est = 6 + 2 * delta + 5 * (int(hint) - delta)
            if m > 4096 and est >= cap:
                continue
        elif abs(n - m) + 16 > cand:
            continue
        out.append(cand)
    return out


def affine_cigars_device_tb(jobs: List[Tuple[str, str, int, int, int, int]],
                            interpret: bool = False,
                            dist_hints=None):
    """On-device-traceback cigars; returns (cigars, failed_indices).

    Jobs are bucketed by (band k, pattern-rows); each bucket is one pallas
    call (static shapes -> compile-once per bucket). dist_hints (exact
    ends-free edit distances) route each job to the narrowest band that
    can prove optimality; without hints everything tries k=63 first.
    Members whose band proves insufficient ESCALATE to the next admissible
    band on device (at most one extra pass each in practice — the hint
    routing is usually right); only members exhausting every band (or
    overrunning the step budget) re-run on the host ladder."""
    if not jobs:
        return [], []
    cigars: List[str] = [""] * len(jobs)
    failed: List[int] = []
    pending: dict = {}          # idx -> remaining band list (narrowest first)
    for idx, (p, t, pb, pe, tb, te) in enumerate(jobs):
        m, n = len(p), len(t)
        if not (0 < m <= LP_MAX and 0 < n <= LT_MAX):
            failed.append(idx)
            continue
        hint = None
        if dist_hints is not None and dist_hints[idx] is not None:
            hint = int(dist_hints[idx])
        bands = _admissible_bands(m, n, pb, pe, tb, te, hint)
        if not bands:
            failed.append(idx)
            continue
        pending[idx] = bands
    while pending:
        buckets: dict = {}
        for idx, bands in pending.items():
            k = bands.pop(0)
            # pe == 0 jobs go to track_col=False buckets: the last-column
            # end-cell scan is compiled out of their DP rows entirely
            buckets.setdefault((k, _rows_bucket(len(jobs[idx][0])),
                                jobs[idx][3] > 0), []).append(idx)
        retry: dict = {}
        for (k, max_rows, track_col), all_idxs in sorted(buckets.items()):
            t_words = _t_words(max_rows, k)
            nib = _NIBBLE_CAP.get(k)
            use_ckpt = not (nib is not None and max_rows <= nib)
            # chunk to power-of-two batch + text buckets: compile shapes
            # stay a small fixed set across workloads (pad tiles are
            # skipped by the kernels' dynamic row bound)
            for c0 in range(0, len(all_idxs), 256):
                idxs = all_idxs[c0 : c0 + 256]
                Bp = TBA
                while Bp < len(idxs):
                    Bp *= 2
                sub = [jobs[i] for i in idxs]
                tl = 256
                ntxt = max(len(j[1]) for j in sub)
                while tl < ntxt:
                    tl *= 2
                a_pool, pat_idx, bpad, mn = pack_affine_jobs_pooled(
                    sub, max_rows, k, batch_pad=Bp, text_pad=tl)
                obuf, end = affine_tb_pooled(
                    jnp.asarray(a_pool), jnp.asarray(pat_idx),
                    jnp.asarray(bpad), jnp.asarray(mn), k, max_rows,
                    t_words, track_col=track_col, use_ckpt=use_ckpt,
                    interpret=interpret)
                obuf = np.asarray(obuf)
                end = np.asarray(end)
                codes_all = _unpack_codes(obuf[: len(sub)], t_words)
                _decode_bucket(jobs, idxs, codes_all, end, k, pending,
                               retry, failed, cigars)
        pending = retry
    return cigars, failed


def _decode_bucket(jobs, idxs, codes_all, end, k, pending, retry, failed,
                   cigars) -> None:
    """Per-bucket walk decode + escalation routing (see
    affine_cigars_device_tb)."""
    for bi, idx in enumerate(idxs):
        p, t, pb, pe, tb, te = jobs[idx]
        m, n = len(p), len(t)
        score, ei, ej, ok = (int(end[bi, 0]), int(end[bi, 1]),
                             int(end[bi, 2]), int(end[bi, 3]))
        if not ok or score >= band_validity_cap(m, n, pb, pe, tb, te, k):
            if pending[idx]:
                retry[idx] = pending[idx]
            else:
                failed.append(idx)
            continue
        row = codes_all[bi]
        codes = row[row != 0]
        cigars[idx] = _decode_walk_ops(codes, p, t, ei, ej, m, n)
