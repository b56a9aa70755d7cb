"""``otter assemble`` workload (parity with src/assemble.cpp).

Pipeline per region (assemble.cpp:39-158): offsets -> parse_anreads -> skip
over-covered -> optional local realignment -> --reads-only early-out ->
valid/invalid partition (haplotag fallback) -> distance matrix -> otter_hclust
-> invalid reassignment -> rapid consensus -> allele emission with ic tag.

Execution model: instead of a thread pool over regions (BS_thread_pool,
assemble.cpp:43), regions are processed as batches whose pairwise distance
matrices are computed by the batched TPU kernel (see pipeline hook
``dist_backend``); everything downstream of the integer distances is exact
float64 host math so output parity holds bit-for-bit.
"""

from __future__ import annotations

import sys
from typing import Callable, List, Optional, TextIO

from ..config import OtterOpts
from ..io.bam import BamReader
from ..io.bed import BED, parse_bed_file
from ..io.fasta import Faidx
from ..ops.cluster import ClusteringStatus, otter_hclust
from ..ops.consensus import (
    fill_dist_matrix,
    invalid_reassignment,
    local_realignment,
    rapid_consensus,
)
from ..ops.distmat import DistMatrix
from ..seqs.extract import parse_anreads
from ..seqs.model import AnAllele, AnRead
from ..utils.timestamp import antimestamp


def count_spanning_reads(anread_block: List[AnRead]) -> int:
    return sum(1 for r in anread_block if r.is_spanning())


def partition_valid_reads(ignore_haps: bool, anread_block: List[AnRead]):
    """(assemble.cpp:27-37)"""
    valid: List[int] = []
    invalid: List[int] = []
    for i, read in enumerate(anread_block):
        if not read.is_spanning():
            invalid.append(i)
        else:
            if ignore_haps:
                valid.append(i)
            elif read.hpt.is_defined():
                valid.append(i)
            else:
                invalid.append(i)
    return valid, invalid


def assemble_region(params: OtterOpts, local_bed: BED, bam: BamReader,
                    faidx: Optional[Faidx], reads_only: bool, out: TextIO,
                    dist_backend=None) -> None:
    """Process one region end-to-end (assemble.cpp:51-154)."""
    mod_bed = BED(local_bed.chr, local_bed.start - params.offset_l,
                  local_bed.end + params.offset_r)
    if params.is_debug:
        sys.stderr.write(
            f"({antimestamp()}): [DEBUG] Processing {local_bed.to_sc_string()}\n")
    anread_block = parse_anreads(params, mod_bed, bam)
    if params.is_debug:
        sys.stderr.write(
            f"({antimestamp()}): [DEBUG] Loaded {len(anread_block)} reads\n")
    if len(anread_block) > params.max_cov:
        sys.stderr.write(
            f"({antimestamp()}): [WARNING] Skipping region with abnormal coverage: "
            f"{local_bed.to_sc_string()} ({len(anread_block)})\n")
        return
    if faidx is not None:
        local_realignment(mod_bed.chr, mod_bed.start, mod_bed.end, params.flank,
                          params.min_sim, faidx, anread_block)
        if params.is_debug:
            sys.stderr.write(
                f"({antimestamp()}): [DEBUG] Locally realigned "
                f"{len(anread_block)} reads\n")
    if reads_only:
        for read in anread_block:
            if params.is_fa:
                out.write(read.to_fa(local_bed.to_sc_string()) + "\n")
            else:
                out.write(read.to_sam(local_bed.chr, local_bed.start,
                                      local_bed.end, params.read_group) + "\n")
        return

    spanning_reads = count_spanning_reads(anread_block)
    if spanning_reads == 0:
        sys.stderr.write(
            f"({antimestamp()}): [WARNING] No spanning reads for "
            f"{local_bed.to_sc_string()}\n")
        return
    local_ignore_haps = params.ignore_haps
    valid_indeces, invalid_indeces = partition_valid_reads(local_ignore_haps, anread_block)
    if len(valid_indeces) < 2:
        local_ignore_haps = True
        valid_indeces, invalid_indeces = partition_valid_reads(local_ignore_haps, anread_block)
        if spanning_reads != len(valid_indeces):
            sys.stderr.write(
                f"({antimestamp()}): [ERROR] Unexpected number of valid reads after "
                f"switching to 'ignore-haps' mode: {spanning_reads} vs "
                f"{len(valid_indeces)}\n")
            raise SystemExit(1)
    if not valid_indeces:
        sys.stderr.write(
            f"({antimestamp()}): [WARNING] No spanning reads for "
            f"{local_bed.to_sc_string()}\n")
        return

    distmatrix = DistMatrix(len(valid_indeces))
    if params.max_alleles != 1:
        if dist_backend is not None:
            dist_backend.fill_matrix(local_ignore_haps, anread_block,
                                     valid_indeces, distmatrix)
        else:
            fill_dist_matrix(local_ignore_haps, anread_block, valid_indeces,
                             distmatrix)
    clustmsg = ClusteringStatus()
    otter_hclust(local_ignore_haps, params.max_alleles, params.bandwidth_short,
                 params.bandwidth_length, params.bandwidth_long, params.max_error,
                 params.min_cov_fraction, params.min_cov_fraction2_l,
                 params.min_cov_fraction2_f, valid_indeces, distmatrix,
                 anread_block, clustmsg)
    labels = [-1] * len(anread_block)
    for i in range(len(clustmsg.labels)):
        labels[valid_indeces[i]] = clustmsg.labels[i]
    if invalid_indeces:
        invalid_reassignment(local_ignore_haps, params.min_sim, params.max_error,
                             clustmsg.fc, anread_block, labels)
    alleles = [AnAllele() for _ in range(clustmsg.fc)]
    rapid_consensus(local_ignore_haps, anread_block, labels, valid_indeces,
                    clustmsg.fc, distmatrix, alleles)
    for l in range(clustmsg.fc):
        alleles[l].ic = clustmsg.ic
        if params.is_fa:
            out.write(alleles[l].to_fa(
                params.read_group, local_bed.to_sc_string() + "#" + str(l)) + "\n")
        else:
            out.write(alleles[l].to_sam(
                local_bed.to_sc_string() + "_" + str(l), local_bed.chr,
                local_bed.start, local_bed.end, params.read_group) + "\n")


def assemble_process(params: OtterOpts, bam_path: str, bed_regions: List[BED],
                     reference: str, reads_only: bool, out: TextIO) -> None:
    sys.stderr.write(
        f"({antimestamp()}): Processing {bam_path} ({params.read_group})\n")
    bam = BamReader(bam_path, load_index=True)
    faidx = Faidx(reference) if reference else None
    dist_backend = _make_dist_backend(params)
    for local_bed in bed_regions:
        assemble_region(params, local_bed, bam, faidx, reads_only, out,
                        dist_backend=dist_backend)
    bam.close()
    if faidx is not None:
        faidx.close()


def _make_dist_backend(params: OtterOpts):
    if params.device in ("tpu", "cpu", "auto"):
        try:
            from ..kernels.dist_backend import DeviceDistBackend
            return DeviceDistBackend(params.device)
        except Exception as e:  # pragma: no cover - jax unavailable fallback
            if params.device != "auto":
                sys.stderr.write(
                    f"({antimestamp()}): [WARNING] device backend unavailable "
                    f"({e}); falling back to host path\n")
    return None


def assemble(bam_path: str, bed: str, reference: str, reads_only: bool,
             params: OtterOpts, out: TextIO = sys.stdout) -> None:
    """Top level (assemble.cpp:160-179): SAM header then per-region work."""
    bed_regions = parse_bed_file(bed)
    if not params.is_fa:
        hdr = BamReader(bam_path, load_index=True)
        for name, ln in zip(hdr.ref_names, hdr.ref_lens):
            out.write(f"@SQ\tSN:{name}\tLN:{ln}\n")
        out.write(f"@RG\tID:{params.read_group}\n")
        out.write(f"@PG\tID:otter\tOF:{params.offset_l},{params.offset_r}\n")
        hdr.close()
    assemble_process(params, bam_path, bed_regions, reference, reads_only, out)
