"""Synthetic BAM/FASTA/BED fixture generator for end-to-end tests.

Builds tandem-repeat-like references, simulates long reads with configurable
error rates and spanning status, and writes indexed BAM + FASTA files using
the framework's own writers (the reference depended on external samtools;
we are self-contained).
"""

from __future__ import annotations

import random
from typing import List, Optional, Tuple

from otter_tpu.io.bai import index_bam
from otter_tpu.io.bam import BamRecord, BamWriter, encode_aux
from otter_tpu.io.bam import BAM_CMATCH, BAM_CSOFT_CLIP, BAM_CINS, BAM_CDEL


def make_reference(rng: random.Random, length: int = 3000,
                   repeat: str = "CAG", repeat_at: int = 1500,
                   repeat_units: int = 20) -> str:
    bases = "ACGT"
    left = "".join(rng.choice(bases) for _ in range(repeat_at))
    right_len = max(0, length - repeat_at - len(repeat) * repeat_units)
    right = "".join(rng.choice(bases) for _ in range(right_len))
    return left + repeat * repeat_units + right


def mutate(rng: random.Random, seq: str, error_rate: float) -> str:
    """Apply random substitutions/insertions/deletions at error_rate."""
    bases = "ACGT"
    out = []
    for ch in seq:
        r = rng.random()
        if r < error_rate:
            kind = rng.random()
            if kind < 0.4:  # substitution
                out.append(rng.choice([b for b in bases if b != ch]))
            elif kind < 0.7:  # insertion
                out.append(ch)
                out.append(rng.choice(bases))
            # else deletion: drop
        else:
            out.append(ch)
    return "".join(out)


def simple_align(ref: str, read: str, ref_start: int) -> List[Tuple[int, int]]:
    """A trivially-correct cigar for simulated reads: call everything M of
    read length (tests that need exact cigars construct records directly)."""
    return [(len(read), BAM_CMATCH)]


def write_fasta(path: str, entries: List[Tuple[str, str]], width: int = 60) -> None:
    with open(path, "w") as fh:
        for name, seq in entries:
            fh.write(f">{name}\n")
            for i in range(0, len(seq), width):
                fh.write(seq[i : i + width] + "\n")


def make_bam(path: str, refs: List[Tuple[str, int]],
             records: List[BamRecord], rg: Optional[str] = None,
             pg_of: Optional[str] = None, extra_header: str = "") -> None:
    hdr_lines = ["@HD\tVN:1.6\tSO:coordinate"]
    for name, ln in refs:
        hdr_lines.append(f"@SQ\tSN:{name}\tLN:{ln}")
    if rg:
        hdr_lines.append(f"@RG\tID:{rg}")
    if pg_of:
        hdr_lines.append(f"@PG\tID:otter\tOF:{pg_of}")
    if extra_header:
        hdr_lines.append(extra_header)
    header_text = "\n".join(hdr_lines) + "\n"
    records = sorted(records, key=lambda r: (r.ref_id, r.pos))
    with BamWriter(path, header_text, refs) as w:
        for rec in records:
            w.write(rec)
    index_bam(path)


def read_record(name: str, tid: int, pos: int, seq: str,
                cigar: List[Tuple[int, int]], mapq: int = 60,
                flag: int = 0, tags: Optional[List[Tuple[str, str, object]]] = None
                ) -> BamRecord:
    rec = BamRecord()
    rec.name = name
    rec.flag = flag
    rec.ref_id = tid
    rec.pos = pos
    rec.mapq = mapq
    rec.cigar = cigar
    rec.seq = seq
    rec.qual = b"\x28" * len(seq)
    aux = bytearray()
    for tag, typ, val in tags or []:
        aux += encode_aux(tag, typ, val)
    rec.aux = bytes(aux)
    return rec


def simulate_region_bam(path: str, ref_name: str, ref_seq: str,
                        region: Tuple[int, int],
                        alleles: List[str], per_allele_cov: int,
                        error_rate: float, seed: int = 7,
                        flank: int = 400) -> None:
    """Simulate spanning reads over a region whose sequence is replaced by
    each allele, and write an indexed BAM with fully-M cigars computed
    against a pseudo-alignment (M-only, anchored at the flank start).

    Reads span [region_start - flank, region_end + flank]; the cigar is a
    simple match/indel walk recomputed from the simulated edits so that
    breakpoint projection works realistically.
    """
    rng = random.Random(seed)
    start, end = region
    records = []
    ridx = 0
    for a_i, allele in enumerate(alleles):
        for c in range(per_allele_cov):
            lf = rng.randint(flank // 2, flank)
            rf = rng.randint(flank // 2, flank)
            left = ref_seq[start - lf : start]
            right = ref_seq[end : end + rf]
            cigar: List[Tuple[int, int]] = []
            out = []

            def emit(op: int, ln: int):
                if ln <= 0:
                    return
                if cigar and cigar[-1][1] == op:
                    cigar[-1] = (cigar[-1][0] + ln, op)
                else:
                    cigar.append((ln, op))

            def walk(piece: str) -> int:
                """Emit an errorful M/I/D walk for piece; returns ref consumed."""
                consumed = 0
                for ch in piece:
                    r = rng.random()
                    if r < error_rate:
                        kind = rng.random()
                        if kind < 0.4:
                            out.append(rng.choice([b for b in "ACGT" if b != ch]))
                            emit(BAM_CMATCH, 1)
                            consumed += 1
                        elif kind < 0.7:
                            out.append(ch)
                            out.append(rng.choice("ACGT"))
                            emit(BAM_CMATCH, 1)
                            emit(BAM_CINS, 1)
                            consumed += 1
                        else:
                            emit(BAM_CDEL, 1)
                            consumed += 1
                    else:
                        out.append(ch)
                        emit(BAM_CMATCH, 1)
                        consumed += 1
                return consumed

            walk(left)
            # allele vs region: M-walk the allele, then rebalance ref
            # consumption to the region length with a trailing I/D run so
            # breakpoint projection recovers exactly the mutated allele
            consumed = walk(allele)
            region_len = end - start
            if consumed > region_len:
                # convert the excess ref consumption into an insertion run
                excess = consumed - region_len
                trimmed: List[Tuple[int, int]] = []
                need = excess
                for ln, op in reversed(cigar):
                    if need > 0 and op == BAM_CMATCH:
                        take = min(ln, need)
                        need -= take
                        if take < ln:
                            trimmed.append((take, BAM_CINS))
                            trimmed.append((ln - take, op))
                        else:
                            trimmed.append((take, BAM_CINS))
                    else:
                        trimmed.append((ln, op))
                cigar[:] = list(reversed(trimmed))
            elif consumed < region_len:
                emit(BAM_CDEL, region_len - consumed)
            walk(right)
            records.append(
                read_record(f"read_{ridx}", 0, start - lf, "".join(out), cigar,
                            tags=[("rq", "f", 0.999)])
            )
            ridx += 1
    make_bam(path, [(ref_name, len(ref_seq))], records, rg=None)
