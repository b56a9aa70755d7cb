"""``otter compare`` (hidden) workload (parity with src/compare.cpp).

Benchmark/eval tool: per region, all-vs-all WFA edit distances between a
"truth" otter BAM and a query otter BAM, picking the 2 best disjoint (i,j)
edges and emitting a TSV (compare.cpp:50-147). Doubles as our own parity
harness between pipelines.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from typing import Dict, List, TextIO, Optional

from ..config import OtterOpts
from ..io.bam import BamReader
from ..io.bed import BED, parse_bed_file
from ..io.sample_index import SampleIndex
from ..ops.align_np import edit_align_cigar_len, edit_distance
from ..seqs.extract import parse_anallele, parse_analleles
from ..seqs.model import AnAllele
from ..utils.timestamp import antimestamp


@dataclass
class DistCompare:
    i: int
    j: int
    edit: float
    ops: float


def local_parse_analleles(bam: BamReader, bed: BED, sample2index: Dict[str, int]):
    """(compare.cpp:26-48): like parse_analleles but records the sp tag and
    keeps only reads whose name starts with the region's chromosome."""
    anallele_block: List[AnAllele] = []
    allele_sample_indeces: List[int] = []
    spannings: List[int] = []
    for rec in bam.fetch(bed.chr, bed.start, bed.end):
        name = rec.name
        if name[: len(bed.chr)] == bed.chr:
            spanning = rec.get_aux("sp")
            spanning = spanning if isinstance(spanning, str) else "u"
            before = len(anallele_block)
            parse_anallele(bed.to_sc_string(), sample2index, rec,
                           anallele_block, allele_sample_indeces)
            if len(anallele_block) > before:
                spannings.append({"u": -1, "b": 0, "l": 1, "r": 2, "n": 3}.get(spanning, -1))
    return anallele_block, allele_sample_indeces, spannings


def get_distances(subjs: List[AnAllele], querys: List[AnAllele]) -> List[DistCompare]:
    """(compare.cpp:50-66) including the N/NDNNN special cases."""
    distances: List[DistCompare] = []
    for i, subj_a in enumerate(subjs):
        subj = subj_a.seq
        for j, query_a in enumerate(querys):
            query = query_a.seq
            if subj == query or (subj == "N" and query == "NDNNN") or \
                    (query == "N" and subj == "NDNNN"):
                distances.append(DistCompare(i, j, 0, len(query)))
            elif subj in ("N", "NDNNN") or query in ("N", "NDNNN"):
                distances.append(DistCompare(i, j, len(query) - 1, len(query)))
            else:
                if len(subj) > len(query):
                    edit, ops = edit_align_cigar_len(subj, query)
                else:
                    edit, ops = edit_align_cigar_len(query, subj)
                distances.append(DistCompare(i, j, edit, ops))
    return distances


def compare(params: OtterOpts, bed_file: str, reference: str, target: str,
            out: Optional[TextIO] = None) -> None:
    """(compare.cpp:68-150)"""
    if out is None:
        out = sys.stdout
    regions = parse_bed_file(bed_file)
    bam_ref = BamReader(reference, load_index=True)
    bam_target = BamReader(target, load_index=True)
    sample2index: Dict[str, int] = {}
    si = SampleIndex()
    si.init(reference)
    sample2index[si.index2sample[0]] = 0
    sit = SampleIndex()
    sit.init(target)
    sample2index[sit.index2sample[0]] = 1

    for region in regions:
        region_str = region.to_sc_string()
        reference_alleles, _, reference_spannings = local_parse_analleles(
            bam_ref, region, sample2index)
        query_alleles, _ = parse_analleles(params, bam_target, region, sample2index)
        if len(query_alleles) == 1:
            query_alleles.append(query_alleles[0])
        if len(reference_alleles) > 2:
            sys.stderr.write(
                f"({antimestamp()}): WARNING: skipping region due to multiple "
                f"expected alignments (>2) for region: {region_str}\n")
        elif len(reference_alleles) == 1:
            sys.stderr.write(
                f"({antimestamp()}): WARNING: skipping region due to single "
                f"expected alignment for region: {region_str}\n")
        elif len(reference_alleles) == 0:
            sys.stderr.write(
                f"({antimestamp()}): WARNING: skipping region due no expected "
                f"alignments for region: {region_str}\n")
        elif len(query_alleles) == 0:
            sys.stderr.write(
                f"({antimestamp()}): WARNING: skipping region due no query "
                f"alleles for region: {region_str}\n")
        else:
            dist_edges = get_distances(reference_alleles, query_alleles)
            dist_edges.sort(key=lambda x: (x.edit, x.ops))
            edge_0 = dist_edges[0]
            edge_1_j = 1
            while edge_1_j < len(dist_edges):
                edge_1 = dist_edges[edge_1_j]
                if edge_1.i != edge_0.i and edge_1.j != edge_0.j:
                    break
                edge_1_j += 1
            if edge_1_j >= len(dist_edges):
                edge_1_j = len(dist_edges) - 1
            for i in (0, edge_1_j):
                min_edge = dist_edges[i]
                out.write(
                    f"{region_str}\t{len(reference_alleles[min_edge.i].seq)}\t"
                    f"{len(query_alleles[min_edge.j].seq)}\t"
                    f"{reference_spannings[min_edge.i]}\t"
                    f"{_fmt_num(min_edge.edit)}\t{_fmt_num(min_edge.ops)}\n")
    bam_ref.close()
    bam_target.close()


def _fmt_num(x: float) -> str:
    """C++ streams doubles holding integers as integers."""
    return str(int(x)) if float(x).is_integer() else ("%g" % x)
