"""Myers bit-parallel edit distance (Myers, JACM 1999) — batched for TPU.

Computes the FULL unit-cost DP (no band, no retries): the pattern lives in
bit-vectors (32 rows per machine word), and each text character advances a
whole DP column with ~15 logical ops per word. That is ~0.5-1 vector op per
DP cell versus ~30 for the banded row kernel — the speed-of-light
formulation for the reference's hottest op (WFA2 pairwise distances,
src/analignments.cpp:117-124).

Batched layout (Pallas): pairs occupy the lane axis (and sublanes), pattern
words iterate serially per text step carrying the add/shift carries, text is
packed 2 bits/char (pairs containing non-ACGT characters are routed to the
banded kernel by the engine).

Word format: word w bit b (LSB-first) = pattern row w*32 + b + 1. Standard
multiword chain: the addition (Eq & Pv) + Pv propagates an inter-word carry;
the Ph/Mh left-shifts carry their MSB into the next word's LSB, with
carry-in 1 for Ph at word 0 (top boundary row D[0][j] = j).

This module holds the numpy reference implementation (vectorized over the
pair batch with uint64-free uint32 math) plus the bucket packing shared with
the Pallas kernel (kernels/myers_pallas.py).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

WORD = 32
_ACGT = {65: 0, 67: 1, 71: 2, 84: 3}  # A C G T


def is_acgt(s: str) -> bool:
    return s.encode().translate(None, b"ACGT") == b""


def pack_myers_bucket(pairs: List[Tuple[str, str]], n_words: int,
                      text_len: int, batch_pad: int = 128):
    """Pack (pattern, text) pairs for the bit-parallel kernel.

    pattern = the SHORTER string (fewer words), text = longer.
    Returns:
      peq:  (4, n_words, B) uint32 — per-letter pattern bitmasks
      tpack:(ceil(text_len/16), B) uint32 — 2-bit packed text
      mlen: (B,) int32 pattern lengths
      nlen: (B,) int32 text lengths
      sel_word: (B,) int32 word index of the score row
      sel_bit:  (B,) uint32 one-hot bit of the score row
    """
    B = len(pairs)
    Bp = ((B + batch_pad - 1) // batch_pad) * batch_pad
    n_twords = (text_len + 15) // 16
    # gather padded code matrices (vectorized; 255 = padding, matches nothing)
    code_of = np.full(256, 255, dtype=np.uint8)
    for byte, c in _ACGT.items():
        code_of[byte] = c
    mlen = np.zeros(Bp, dtype=np.int32)
    nlen = np.zeros(Bp, dtype=np.int32)
    pats: List[str] = []
    txts: List[str] = []
    for x, y in pairs:
        pat, txt = (x, y) if len(x) <= len(y) else (y, x)
        pats.append(pat)
        txts.append(txt)
    mlen[:B] = [len(p) for p in pats]
    nlen[:B] = [len(t) for t in txts]
    assert B == 0 or (mlen[:B].min() > 0 and mlen[:B].max() <= n_words * WORD
                      and nlen[:B].max() <= text_len)

    def _pad_codes(seqs: List[str], L: int) -> np.ndarray:
        """(Bp, L) uint8 code matrix, 255-padded. One bytes-join + one
        vectorized table lookup (50x the fancy-index scatter at scale)."""
        pad = b"\xff" * L
        buf = b"".join(s.encode() + pad[len(s):] for s in seqs)
        buf += pad * (Bp - len(seqs))
        return code_of[np.frombuffer(buf, np.uint8).reshape(Bp, L)]

    pat_codes = _pad_codes(pats, n_words * WORD)
    txt_codes = _pad_codes(txts, n_twords * 16)
    # bit-packing via np.packbits (little-endian words; C speed)
    peq = np.zeros((4, n_words, Bp), dtype=np.uint32)
    for c in range(4):
        bits = pat_codes == c  # (Bp, n_words*32)
        packed = np.packbits(bits, axis=1, bitorder="little")
        peq[c] = packed.view(np.uint32).T
    # 2-bit text packing: char j occupies bits 2j..2j+1 of word j//16
    tcc = np.where(txt_codes == 255, 0, txt_codes)  # pad chars pack as 'A';
    # harmless: score is captured at j == nlen before padding is consumed
    tbits = np.empty((Bp, n_twords * 16, 2), dtype=bool)
    tbits[:, :, 0] = (tcc & 1).astype(bool)
    tbits[:, :, 1] = (tcc >> 1).astype(bool)
    tpacked = np.packbits(tbits.reshape(Bp, -1), axis=1, bitorder="little")
    tpack = tpacked.view(np.uint32).T.copy()
    sel_word = np.maximum(mlen - 1, 0) // WORD
    sel_bit = (np.uint32(1) << (np.maximum(mlen - 1, 0) % WORD).astype(np.uint32))
    sel_bit = np.where(mlen > 0, sel_bit, 0).astype(np.uint32)
    return peq, tpack, mlen, nlen, sel_word.astype(np.int32), sel_bit


def pack_myers_packed(pairs: List[Tuple[str, str]], n_words: int,
                      text_len: int, batch_pad: int = 128):
    """Packed-pattern bucket layout (numpy oracle for the native packer and
    the _myers_kernel_packed device expansion): the pattern is 2-bit packed
    exactly like the text — char i -> bits 2(i%16)..2(i%16)+1 of word i//16,
    padding packs as 'A' (harmless: Myers' dataflow is strictly
    low-row -> high-row, so rows past m-1 never reach the scored row).

    Returns:
      ppack:(2*n_words, B) uint32   tpack:(ceil(text_len/16), B) uint32
      mlen, nlen: (B,) int32
    """
    B = len(pairs)
    Bp = ((B + batch_pad - 1) // batch_pad) * batch_pad
    n_twords = (text_len + 15) // 16
    n_pwords = 2 * n_words
    code_of = np.full(256, 255, dtype=np.uint8)
    for byte, c in _ACGT.items():
        code_of[byte] = c
    mlen = np.zeros(Bp, dtype=np.int32)
    nlen = np.zeros(Bp, dtype=np.int32)
    pats: List[str] = []
    txts: List[str] = []
    for x, y in pairs:
        pat, txt = (x, y) if len(x) <= len(y) else (y, x)
        pats.append(pat)
        txts.append(txt)
    mlen[:B] = [len(p) for p in pats]
    nlen[:B] = [len(t) for t in txts]
    assert B == 0 or (mlen[:B].min() > 0 and mlen[:B].max() <= n_words * WORD
                      and nlen[:B].max() <= text_len)
    pad = b"\xff"

    def _codes(seqs: List[str], L: int) -> np.ndarray:
        padrow = pad * L
        buf = b"".join(s.encode() + padrow[len(s):] for s in seqs)
        buf += padrow * (Bp - len(seqs))
        return code_of[np.frombuffer(buf, np.uint8).reshape(Bp, L)]

    def _pack2(codes: np.ndarray, nw: int) -> np.ndarray:
        cc = np.where(codes == 255, 0, codes)
        bits = np.empty((Bp, nw * 16, 2), dtype=bool)
        bits[:, :, 0] = (cc & 1).astype(bool)
        bits[:, :, 1] = (cc >> 1).astype(bool)
        packed = np.packbits(bits.reshape(Bp, -1), axis=1, bitorder="little")
        return packed.view(np.uint32).T.copy()

    ppack = _pack2(_codes(pats, n_pwords * 16), n_pwords)
    tpack = _pack2(_codes(txts, n_twords * 16), n_twords)
    return ppack, tpack, mlen, nlen


def myers_numpy(peq: np.ndarray, tpack: np.ndarray, mlen: np.ndarray,
                nlen: np.ndarray, sel_word: np.ndarray, sel_bit: np.ndarray,
                text_len: int) -> np.ndarray:
    """Vectorized multiword Myers over the batch. Returns (B,) int64
    edit distances (garbage for padded slots with mlen == 0)."""
    n_words, B = peq.shape[1], peq.shape[2]
    Pv = np.full((n_words, B), 0xFFFFFFFF, dtype=np.uint32)
    Mv = np.zeros((n_words, B), dtype=np.uint32)
    score = mlen.astype(np.int64).copy()
    captured = score.copy()
    words = np.arange(n_words)[:, None]
    sel_mask = np.where(words == sel_word[None, :], sel_bit[None, :],
                        np.uint32(0)).astype(np.uint32)
    one = np.uint32(1)
    for j in range(text_len):
        c = (tpack[j // 16] >> np.uint32(2 * (j % 16))) & np.uint32(3)
        carry_add = np.zeros(B, dtype=np.uint32)
        carry_ph = np.ones(B, dtype=np.uint32)   # boundary row: Ph carry-in 1
        carry_mh = np.zeros(B, dtype=np.uint32)
        for w in range(n_words):
            Eq = np.take_along_axis(
                peq[:, w, :], c[None, :].astype(np.int64), axis=0)[0]
            Pv_w = Pv[w]
            Mv_w = Mv[w]
            Xv = Eq | Mv_w
            t = Eq & Pv_w
            s1 = (t + Pv_w).astype(np.uint32)
            c1 = s1 < t
            s2 = (s1 + carry_add).astype(np.uint32)
            c2 = s2 < s1
            carry_add = (c1 | c2).astype(np.uint32)
            Xh = (s2 ^ Pv_w) | Eq
            Ph = Mv_w | ~(Xh | Pv_w)
            Mh = Pv_w & Xh
            # score delta at each pair's bottom row
            score += ((Ph & sel_mask[w]) != 0).astype(np.int64)
            score -= ((Mh & sel_mask[w]) != 0).astype(np.int64)
            # shift left with inter-word carries
            ph_out = Ph >> np.uint32(31)
            mh_out = Mh >> np.uint32(31)
            Ph = ((Ph << one) | carry_ph).astype(np.uint32)
            Mh = ((Mh << one) | carry_mh).astype(np.uint32)
            carry_ph = ph_out
            carry_mh = mh_out
            Pv[w] = Mh | ~(Xv | Ph)
            Mv[w] = Ph & Xv
        captured = np.where(nlen == j + 1, score, captured)
    return captured
