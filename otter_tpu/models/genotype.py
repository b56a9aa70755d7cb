"""``otter genotype`` workload (parity with src/genotype.cpp).

Joint genotyping of merged otter BAMs: sample index from @RG/@PG header
lines, internal reference sample OTTER_INTREF appended (genotype.cpp:175-189);
per region allele re-parse, reference allele fetch, diploid (min,max)
pairing, joint length x 3-mer clustering, GT re-centering so the reference
allele is GT 0, and VCF emission (genotype.cpp:16-67,80-164).
"""

from __future__ import annotations

import sys
from typing import List, Optional, TextIO, Tuple

from ..config import OtterOpts
from ..io.bam import BamReader
from ..io.bed import BED, parse_bed_file
from ..io.fasta import Faidx
from ..io.sample_index import SampleIndex
from ..ops.cluster import Genotype, anallele_cluster
from ..seqs.extract import parse_analleles
from ..seqs.model import AnAllele
from ..utils.fmt import fmt_double, fmt_float
from ..utils.timestamp import antimestamp

REFNAME = "OTTER_INTREF"


def output_vcf_header(bam_path: str, sample_index: List[str], ref_name: str,
                      out: TextIO) -> None:
    """(genotype.cpp:16-37)"""
    rd = BamReader(bam_path, load_index=True)
    out.write("##fileformat=VCFv4.2\n")
    for name, ln in zip(rd.ref_names, rd.ref_lens):
        out.write(f"##contig=<ID={name},length={ln}>\n")
    rd.close()
    out.write(
        '##INFO=<ID=HSD,Number=R,Type=Float,Description="Hill-Shannon Diversity Metric">\n'
        '##ALT=<ID=DEL,Description="Deletion">\n'
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
        '##FORMAT=<ID=PS,Number=1,Type=Integer,Description="Phase Set">\n'
        '##FORMAT=<ID=HP,Number=1,Type=Integer,Description="Haplotype Identifier">\n'
        '##FORMAT=<ID=TC,Number=1,Type=Integer,Description="Total Coverage of Region">\n'
        '##FORMAT=<ID=AC,Number=2,Type=Integer,Description="Total Coverage For Each Allele">\n'
        '##FORMAT=<ID=SC,Number=2,Type=Integer,Description="Total Coverage of Spanning Reads For Each Allele">\n'
        '##FORMAT=<ID=SE,Number=2,Type=Float,Description="Standard Mean Error of Spanning Reads For Each Allele">\n'
    )
    out.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT")
    for sample in sample_index:
        if sample != ref_name:
            out.write("\t" + sample)
    out.write("\n")


def output_vcf_line(offset_l: int, offset_r: int, region: BED, si: SampleIndex,
                    ref_allele_index: int, alleles: List[AnAllele],
                    genotypes: List[Genotype], reps: List[int],
                    sample2localindeces: List[Optional[Tuple[int, int]]],
                    out: TextIO) -> None:
    """(genotype.cpp:39-67)"""
    parts = [f"{region.chr}\t{1 + region.start - offset_l}\t{region.to_sc_string()}\t"
             f"{alleles[ref_allele_index].seq}\t"]
    if len(reps) == 1:
        parts.append(".")
    else:
        for i in range(1, len(reps)):
            if i > 1:
                parts.append(",")
            parts.append("<DEL>" if alleles[reps[i]].seq == "N" else alleles[reps[i]].seq)
    parts.append("\t.\t.\tHSD=")
    for i in range(len(reps)):
        if i > 0:
            parts.append(",")
        parts.append(fmt_double(genotypes[reps[i]].hsd))
    parts.append("\tGT:PS:HP:TC:AC:SC:SE")
    for i in range(len(sample2localindeces) - 1):
        pair = sample2localindeces[i]
        if pair is None:
            parts.append("\t./.:.:.:.:.:.:.")
        else:
            a1 = alleles[pair[0]]
            a2 = alleles[pair[1]]
            if a1.hpt != a2.hpt:
                sys.stderr.write(
                    f"({antimestamp()}): [WARNING] mismatching phased information for "
                    f"{si.index2sample[i]}: allele1=PS:{a1.hpt.ps}:HP:{a1.hpt.hp} "
                    f"allele2=PS:{a1.hpt.ps}:HP:{a1.hpt.hp}\n")
            parts.append(
                f"\t{genotypes[pair[0]].gt}/{genotypes[pair[1]].gt}:{a1.hpt.ps}:"
                f"{a1.hpt.hp}:{a1.tcov}:{a1.acov},{a2.acov}:{a1.scov},{a2.scov}:"
                f"{fmt_float(a1.se)},{fmt_float(a2.se)}")
    parts.append("\n")
    out.write("".join(parts))


def genotype_region(params: OtterOpts, region: BED, bam: BamReader,
                    faidx: Optional[Faidx], si: SampleIndex, refindex: int,
                    out: TextIO) -> None:
    """(genotype.cpp:80-165)"""
    anallele_block, allele_sample_indeces = parse_analleles(
        params, bam, region, si.sample2index)
    if len(anallele_block) != len(allele_sample_indeces):
        sys.stderr.write(
            f"({antimestamp()}): [ERROR] expected matching total number of alleles "
            f"and samples: {len(anallele_block)} vs {len(allele_sample_indeces)}\n")
        raise SystemExit(1)
    if not anallele_block:
        sys.stderr.write(
            f"({antimestamp()}): [WARNING] no alleles found for "
            f"{region.to_sc_string()}\n")
        return
    ref_allele_index = -1
    if faidx is not None:
        refseq = faidx.fetch(region.chr, region.start - si.offset_l,
                             region.end + si.offset_r - 1)
        ref_allele_index = len(allele_sample_indeces)
        allele_sample_indeces.append(refindex)
        anallele_block.append(AnAllele(seq=refseq))
    sample2localindeces: List[Optional[Tuple[int, int]]] = [None] * len(si.sample2index)
    for i, s_idx in enumerate(allele_sample_indeces):
        pair = sample2localindeces[s_idx]
        if pair is None:
            sample2localindeces[s_idx] = (i, i)
        else:
            lo, hi = pair
            if i < lo:
                sample2localindeces[s_idx] = (i, hi)
            elif i > hi:
                sample2localindeces[s_idx] = (lo, i)
    if faidx is None:
        for i in range(len(si.sample2index)):
            pair = sample2localindeces[i]
            if pair is not None and i != refindex:
                a1 = len(anallele_block[pair[0]].seq)
                a2 = len(anallele_block[pair[1]].seq)
                out.write(f"{region.to_sc_string()}\t{si.index2sample[i]}\t"
                          f"{min(a1, a2)}\t{max(a1, a2)}\n")
        return
    genotypes = [Genotype() for _ in range(len(anallele_block))]
    acc_gt, gt_reps = anallele_cluster(params.max_error, params.max_cosdis,
                                       anallele_block, genotypes)
    if acc_gt != len(gt_reps):
        sys.stderr.write(
            f"({antimestamp()}): ERROR unexpected representative alleles "
            f"({len(gt_reps)}) for {acc_gt} total alleles\n")
        raise SystemExit(1)
    ref_gt = genotypes[ref_allele_index].gt
    gt_reps_centered = list(gt_reps)
    for i in range(len(gt_reps_centered)):
        if i == 0:
            gt_reps_centered[0] = ref_allele_index
        elif i <= ref_gt:
            gt_reps_centered[i] = gt_reps[i - 1]
    for g in genotypes:
        if g.gt == ref_gt:
            g.gt = 0
        elif g.gt < ref_gt:
            g.gt += 1
    output_vcf_line(si.offset_l, si.offset_r, region, si, ref_allele_index,
                    anallele_block, genotypes, gt_reps_centered,
                    sample2localindeces, out)


def genotype_process(params: OtterOpts, bam_path: str, regions: List[BED],
                     reference: str, si: SampleIndex, refindex: int,
                     out: TextIO) -> None:
    bam = BamReader(bam_path, load_index=True)
    faidx = Faidx(reference) if reference else None
    for region in regions:
        genotype_region(params, region, bam, faidx, si, refindex, out)
    bam.close()
    if faidx is not None:
        faidx.close()


def genotype(params: OtterOpts, bam_path: str, bed: str, reference: str,
             out: Optional[TextIO] = None) -> None:
    """(genotype.cpp:173-192)

    Multi-host: regions shard across jax processes like assemble; only
    process 0 emits the VCF header."""
    if out is None:
        out = sys.stdout
    regions = parse_bed_file(bed)
    pidx = 0
    if params.device != "host":
        from ..parallel.distributed import maybe_initialize, shard_regions
        pidx, pcount = maybe_initialize()
        if pcount > 1:
            regions = shard_regions(regions, pidx, pcount)
            sys.stderr.write(
                f"({antimestamp()}): process {pidx}/{pcount} handling "
                f"{len(regions)} regions\n")
    si = SampleIndex()
    si.init(bam_path)
    sys.stderr.write(
        f"({antimestamp()}): Found {len(si.index2sample)} samples (read-group tags)\n")
    sys.stderr.write(
        f"({antimestamp()}): Using offset of {si.offset_l},{si.offset_r}\n")
    refindex = len(si.index2sample)
    si.index2sample.append(REFNAME)
    si.sample2index[REFNAME] = refindex
    if reference and pidx == 0:
        output_vcf_header(bam_path, si.index2sample, REFNAME, out)
    genotype_process(params, bam_path, regions, reference, si, refindex, out)
