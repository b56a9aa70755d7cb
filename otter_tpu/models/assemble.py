"""``otter assemble`` workload (parity with src/assemble.cpp).

Pipeline per region (assemble.cpp:39-158): offsets -> parse_anreads -> skip
over-covered -> optional local realignment -> --reads-only early-out ->
valid/invalid partition (haplotag fallback) -> distance matrix -> otter_hclust
-> invalid reassignment -> rapid consensus -> allele emission with ic tag.

Execution model: instead of a thread pool over regions (BS_thread_pool,
assemble.cpp:43), regions are processed in *batches*: host I/O prepares many
regions, their O(n^2) pair workloads are merged into one batched TPU
dispatch (kernels/dist_backend.py), and everything downstream of the exact
integer distances is float64 host math, so output is byte-identical to the
sequential host path (emission stays in region order).
"""

from __future__ import annotations

import io
import os

import numpy as np
import sys
from dataclasses import dataclass, field
from typing import List, Optional, TextIO, Tuple

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
from ..utils import metrics
from ..utils.timestamp import antimestamp

DEFAULT_REGION_BATCH = int(os.environ.get("OTTER_TPU_REGION_BATCH", "256"))


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


@dataclass
class RegionWork:
    """A region after host-side preparation, awaiting its distance matrix."""
    bed: BED
    reads: List[AnRead]
    ignore_haps: bool
    valid_indeces: List[int]
    invalid_indeces: List[int]


def prepare_region(params: OtterOpts, local_bed: BED, bam: BamReader,
                   faidx: Optional[Faidx], reads_only: bool,
                   out: TextIO) -> Optional[RegionWork]:
    """Host I/O + filters (assemble.cpp:51-122). Returns None when the
    region was fully handled (reads-only output, skips, warnings)."""
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
        return None
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
        return None

    spanning_reads = count_spanning_reads(anread_block)
    if spanning_reads == 0:
        sys.stderr.write(
            f"({antimestamp()}): [WARNING] No spanning reads for "
            f"{local_bed.to_sc_string()}\n")
        return None
    local_ignore_haps = params.ignore_haps
    valid_indeces, invalid_indeces = partition_valid_reads(local_ignore_haps,
                                                           anread_block)
    if len(valid_indeces) < 2:
        local_ignore_haps = True
        valid_indeces, invalid_indeces = partition_valid_reads(
            local_ignore_haps, anread_block)
        if spanning_reads != len(valid_indeces):
            sys.stderr.write(
                f"({antimestamp()}): [ERROR] Unexpected number of valid reads "
                f"after switching to 'ignore-haps' mode: {spanning_reads} vs "
                f"{len(valid_indeces)}\n")
            raise SystemExit(1)
    if not valid_indeces:
        sys.stderr.write(
            f"({antimestamp()}): [WARNING] No spanning reads for "
            f"{local_bed.to_sc_string()}\n")
        return None
    return RegionWork(local_bed, anread_block, local_ignore_haps,
                      valid_indeces, invalid_indeces)


def cluster_labels(params: OtterOpts, work: RegionWork,
                   distmatrix: DistMatrix, densities=None):
    """Hierarchical clustering into initial labels (assemble.cpp:128-133)."""
    clustmsg = ClusteringStatus()
    otter_hclust(work.ignore_haps, params.max_alleles, params.bandwidth_short,
                 params.bandwidth_length, params.bandwidth_long,
                 params.max_error, params.min_cov_fraction,
                 params.min_cov_fraction2_l, params.min_cov_fraction2_f,
                 work.valid_indeces, distmatrix, work.reads, clustmsg,
                 densities=densities)
    labels = [-1] * len(work.reads)
    for i in range(len(clustmsg.labels)):
        labels[work.valid_indeces[i]] = clustmsg.labels[i]
    return clustmsg, labels


def cluster_finish(params: OtterOpts, work: RegionWork,
                   distmatrix: DistMatrix, clustmsg, labels, pre):
    """Reassignment (with precomputed distances) + consensus preparation
    (assemble.cpp:134-141)."""
    from ..ops.consensus import consensus_prepare

    if work.invalid_indeces:
        invalid_reassignment(work.ignore_haps, params.min_sim, params.max_error,
                             clustmsg.fc, work.reads, labels, precomputed=pre)
    alleles = [AnAllele() for _ in range(clustmsg.fc)]
    tasks = consensus_prepare(work.ignore_haps, work.reads, labels,
                              work.valid_indeces, clustmsg.fc, distmatrix,
                              alleles)
    return alleles, tasks


def cluster_region(params: OtterOpts, work: RegionWork,
                   distmatrix: DistMatrix, dist_backend=None):
    """Clustering + reassignment + consensus preparation
    (assemble.cpp:128-141). Returns (clustmsg, alleles, poa_tasks)."""
    from ..ops.consensus import reassignment_distances_batched

    clustmsg, labels = cluster_labels(params, work, distmatrix)
    pre = None
    if work.invalid_indeces:
        engine = dist_backend.engine if dist_backend is not None else None
        pre = reassignment_distances_batched(work.reads, labels, engine=engine)
    alleles, tasks = cluster_finish(params, work, distmatrix, clustmsg,
                                    labels, pre)
    return clustmsg, alleles, tasks


def emit_region(params: OtterOpts, work: RegionWork, clustmsg, alleles,
                out: TextIO) -> None:
    """Allele emission with the ic tag (assemble.cpp:143-149)."""
    local_bed = work.bed
    for l in range(clustmsg.fc):
        alleles[l].ic = clustmsg.ic
        if params.is_fa:
            out.write(alleles[l].to_fa(
                params.read_group, local_bed.to_sc_string() + "#" + str(l)) + "\n")
        else:
            out.write(alleles[l].to_sam(
                local_bed.to_sc_string() + "_" + str(l), local_bed.chr,
                local_bed.start, local_bed.end, params.read_group) + "\n")


def finish_region(params: OtterOpts, work: RegionWork,
                  distmatrix: DistMatrix, out: TextIO) -> None:
    """Clustering -> reassignment -> consensus -> emission
    (assemble.cpp:128-149)."""
    from ..ops.consensus import consensus_apply_batched

    clustmsg, alleles, tasks = cluster_region(params, work, distmatrix)
    consensus_apply_batched(tasks)
    emit_region(params, work, clustmsg, alleles, out)


def _region_pair_coords(n: int) -> np.ndarray:
    """(P, 2) condensed-order (i, j) coordinates for n valid reads — the
    exact row-major upper-triangle order of fill_dist_matrix
    (analignments.cpp:117-124), so a region's kernel results ARE its
    DistMatrix.values block."""
    from ..ops.distmat import triu_pair_indices

    iu, ju = triu_pair_indices(n)
    return np.column_stack([iu, ju]).astype(np.int64)


def process_region_batch(params: OtterOpts, batch: List[RegionWork],
                         dist_backend, out: TextIO, pool=None) -> None:
    """Merge many regions' pair workloads into one device dispatch, then
    finish each region in order."""
    staged = _dispatch_batch(params, batch, dist_backend, pool=pool)
    _finish_batch(params, staged, dist_backend, out, pool=pool)


def _dispatch_batch(params: OtterOpts, batch: List[RegionWork],
                    dist_backend, pool=None):
    """Pool every region's pair workload and launch it asynchronously;
    returns a staged handle for _finish_batch. While the caller finishes a
    previous batch on the host, the device (and tunnel traffic) runs this
    one's distance matrices in the background.

    The reassignment workload rides the SAME chain: the (unassigned i,
    labeled spanning j) pair set depends only on the valid/invalid read
    partition — not on the cluster labels (reassignment_jobs scans
    labels[i] < 0 / labels[j] >= 0, which is exactly invalid/valid) — so
    its End2End pairs are appended to the pooled distance dispatch and its
    ends-free jobs launch asynchronously here, instead of costing a
    separate post-clustering device round trip per batch
    (assemble.cpp:43's full-overlap model; VERDICT r2 #6)."""
    from ..kernels.edit_pallas import IndexedPairs
    from ..ops.consensus import reassignment_jobs

    # unique sequence pool (by object identity — a region's pair set
    # shares each read.seq object ~n/2 times): per-pair host work becomes
    # O(1) numpy index math, per-sequence work runs once
    seq_ids: dict = {}
    seq_pool: List[str] = []

    def _sid(s: str) -> int:
        h = id(s)
        v = seq_ids.get(h)
        if v is None:
            v = seq_ids[h] = len(seq_pool)
            seq_pool.append(s)
        return v

    xi_parts: List[np.ndarray] = []
    yi_parts: List[np.ndarray] = []
    total = 0
    spans = []  # (work, coords, start_index)
    for work in batch:
        if params.max_alleles == 1 or not work.ignore_haps:
            spans.append((work, None, 0))
            continue
        vid = work.valid_indeces
        rs = np.fromiter((_sid(work.reads[v].seq) for v in vid),
                         np.int64, len(vid))
        coords = _region_pair_coords(len(vid))
        spans.append((work, coords, total))
        xi_parts.append(rs[coords[:, 0]])
        yi_parts.append(rs[coords[:, 1]])
        total += len(coords)
    # reassignment pools (pair set is label-independent; see docstring).
    # With the -t worker-process pool the finish path re-derives these on
    # host inside the workers (finish_region_worker) — skip the device
    # pre-dispatch entirely there instead of paying for unused work.
    reassign_infos: List = [None] * len(spans)
    pool_ef: list = []
    e2e_base = total
    use_pool = params.threads > 1 and pool is not None
    for si, (work, _c, _s) in enumerate(spans):
        if use_pool or not work.invalid_indeces:
            continue
        pseudo = [-1] * len(work.reads)
        for i in work.valid_indeces:
            pseudo[i] = 0
        pre, e2e_p, e2e_k, ef_j, ef_k, ef_n = reassignment_jobs(
            work.reads, pseudo)
        reassign_infos[si] = (pre, e2e_p, e2e_k, ef_j, ef_k, ef_n,
                              total, len(pool_ef))
        if e2e_p:
            xi_parts.append(np.fromiter((_sid(x) for x, _y in e2e_p),
                                        np.int64, len(e2e_p)))
            yi_parts.append(np.fromiter((_sid(y) for _x, y in e2e_p),
                                        np.int64, len(e2e_p)))
            total += len(e2e_p)
        pool_ef.extend(ef_j)
    xi = (np.concatenate(xi_parts) if xi_parts
          else np.zeros(0, dtype=np.int64))
    yi = (np.concatenate(yi_parts) if yi_parts
          else np.zeros(0, dtype=np.int64))
    all_pairs = IndexedPairs(seq_pool, xi, yi)
    with metrics.phase("device_dispatch"):
        handle = None
        if total:
            eng = dist_backend.engine
            if hasattr(eng, "distances_async_indexed"):
                handle = eng.distances_async_indexed(seq_pool, xi, yi)
            else:
                handle = eng.distances_async(all_pairs)
        ef_handle = (dist_backend.engine.ends_free_async(pool_ef)
                     if pool_ef else None)
    metrics.add("pair_alignments", total + len(pool_ef))
    return spans, all_pairs, handle, reassign_infos, ef_handle, e2e_base


def _finish_batch(params: OtterOpts, staged, dist_backend, out: TextIO,
                  pool=None) -> None:
    """Collect a _dispatch_batch handle and run the host half (cluster,
    reassignment, consensus, emission) for its regions in order."""
    spans, all_pairs, handle, reassign_infos, ef_handle, e2e_base = staged
    from ..ops.consensus import consensus_apply_batched

    # non-pair spans (haplotag 0/1 grids, single-allele) fill on host first:
    # their values are inputs to the fused device KDE below
    matrices: List = [None] * len(spans)
    for idx, (work, coords, start) in enumerate(spans):
        if coords is None:
            distmatrix = DistMatrix(len(work.valid_indeces))
            if params.max_alleles != 1:
                fill_dist_matrix(work.ignore_haps, work.reads,
                                 work.valid_indeces, distmatrix)
            matrices[idx] = distmatrix

    # KDE-eligible spans (known before any distance is collected)
    kde_rows = []  # (span_index, bandwidth)
    env_kde = os.environ.get("OTTER_TPU_MESH_KDE", "")
    for si, (work, _c, _s) in enumerate(spans):
        if params.max_alleles == 1 or len(work.valid_indeces) <= 2:
            continue  # otter_hclust never reaches the KDE for these
        bw = params.bandwidth_short
        for i in work.valid_indeces:
            if len(work.reads[i].seq) >= params.bandwidth_length:
                bw = params.bandwidth_long
                break
        kde_rows.append((si, bw))

    # fused collect: the per-region scaled KDE rides the SAME device chain
    # and D2H materialization as the pair distances (no separate dispatch).
    # Guarded by the tree-KDE intermediate size ((rows, grid, n_pad) f32)
    # and falls back to the two-step path whenever any pair needs the
    # banded ladder — results are identical either way (certified f32).
    dists = None
    scaled_rows = None
    if (handle is not None and kde_rows and env_kde != "0"
            and os.environ.get("OTTER_TPU_FUSED_KDE", "1") == "1"
            and getattr(dist_backend.engine, "mode", "") == "pallas"):
        n_rows = len(kde_rows)
        rid = np.full(len(all_pairs), n_rows, dtype=np.int32)
        slot = np.zeros(len(all_pairs), dtype=np.int32)
        nvals = np.zeros(n_rows, dtype=np.int64)
        bwv = np.zeros(n_rows, dtype=np.float32)
        ex_entries = []
        n_pad = 8
        for r, (si, bw) in enumerate(kde_rows):
            work, coords, start = spans[si]
            if coords is not None:
                nv = len(coords)
                rid[start : start + nv] = r
                slot[start : start + nv] = np.arange(nv, dtype=np.int32)
            else:
                vals = matrices[si].values
                nv = len(vals)
                ex_entries.extend(
                    (r, k, np.float32(v)) for k, v in enumerate(vals))
            nvals[r] = nv
            bwv[r] = bw
            while n_pad < nv:
                n_pad *= 2
        if n_rows * 401 * n_pad <= (1 << 27):
            with metrics.phase("device_dispatch"):
                fused = dist_backend.engine.distances_collect_kde(
                    handle, rid, slot, ex_entries, nvals, bwv, n_rows, n_pad)
            if fused is not None:
                dists, kde_m, kde_s = fused
                scaled_rows = (kde_m, kde_s)
    if dists is None:
        with metrics.phase("device_dispatch"):
            dists = (dist_backend.engine.distances_collect(handle)
                     if handle is not None else [])

    pair_maxlen = all_pairs.maxlens().astype(np.float64)
    dists_arr = np.asarray(dists, dtype=np.float64)
    for idx, (work, coords, start) in enumerate(spans):
        if coords is None:
            continue
        # coords are exactly condensed order (_region_pair_coords), so the
        # result block IS the DistMatrix.values vector — one vectorized
        # divide replaces the 19900-iteration set_dist loop at cov 200
        distmatrix = DistMatrix(len(work.valid_indeces))
        nv = len(coords)
        with np.errstate(divide="ignore", invalid="ignore"):
            distmatrix.values = (dists_arr[start : start + nv]
                                 / pair_maxlen[start : start + nv])
        matrices[idx] = distmatrix

    if params.threads > 1 and pool is not None:
        # fan the host math out over worker processes (the reference's
        # -t thread semantics; workers are jax-free)
        from ._finish_worker import finish_region_worker
        with metrics.phase("cluster_consensus"):
            results = pool.map(
                finish_region_worker,
                [(params, work, dm.values)
                 for (work, _c, _s), dm in zip(spans, matrices)])
        for (work, _c, _s), (clustmsg, alleles) in zip(spans, results):
            emit_region(params, work, clustmsg, alleles, out)
        return

    # Per-region KDE densities, pooled across the batch. With a pallas
    # engine the tree-reduction device KDE runs by default for large pooled
    # workloads; every region's decision margins are then CERTIFIED against
    # the modeled f32 error bound and uncertain regions are recomputed with
    # the float64 host oracle, so clustering output is byte-identical either
    # way (ops/kde.py::kde_decision_certified). OTTER_TPU_MESH_KDE=1 forces
    # the device path, =0 forces host.
    region_dens: dict = {}
    kde_regions = [(si, matrices[si].values, bw) for si, bw in kde_rows]
    use_device_kde = scaled_rows is not None
    if kde_regions and not use_device_kde and dist_backend is not None:
        if env_kde == "1":
            use_device_kde = True
        elif env_kde != "0" and \
                getattr(dist_backend.engine, "mode", "") == "pallas":
            # device pays one dispatch round-trip; worth it once the pooled
            # kernel-eval count is large (big regions or many of them)
            total_vals = sum(len(v) for _si, v, _b in kde_regions)
            use_device_kde = total_vals * 401 >= 2_000_000
    if kde_regions and use_device_kde:
        from ..ops.kde import (kde_decision_certified_scaled_batch,
                               kde_densities_batched, kde_grid)

        if scaled_rows is not None:
            kde_m, kde_s = scaled_rows
            scaled_list = [(kde_m[r], kde_s[r])
                           for r in range(len(kde_regions))]
        else:
            with metrics.phase("device_dispatch"):
                from ..parallel.mesh import pooled_kde_scaled

                scaled_list = pooled_kde_scaled(
                    [v for _si, v, _b in kde_regions],
                    [b for _si, _v, b in kde_regions])
        with metrics.phase("cluster_consensus"):
            radius = max(1, int(params.max_error / 0.0025))
            fallback = []
            with metrics.phase("kde_certify"):
                certs = kde_decision_certified_scaled_batch(
                    scaled_list, [v for _si, v, _b in kde_regions],
                    [b for _si, _v, b in kde_regions], radius)
                for r, (si, v, b) in enumerate(kde_regions):
                    ok, d64 = certs[r]
                    if ok:
                        region_dens[si] = d64
                    else:
                        fallback.append(r)
            if fallback:
                with metrics.phase("kde_f64_fallback"):
                    f64 = kde_densities_batched(
                        [kde_regions[r][1] for r in fallback],
                        [kde_regions[r][2] for r in fallback],
                        kde_grid(0.0025))
                for r, d in zip(fallback, f64):
                    region_dens[kde_regions[r][0]] = d
        metrics.add("kde_device_regions",
                    len(kde_regions) - len(fallback))
        metrics.add("kde_f64_fallback_regions", len(fallback))
    elif kde_regions:
        with metrics.phase("cluster_consensus"):
            from ..ops.kde import kde_densities_batched, kde_grid

            dens_list = kde_densities_batched(
                [v for _si, v, _b in kde_regions],
                [b for _si, _v, b in kde_regions], kde_grid(0.0025))
        region_dens = {si: d
                       for (si, _v, _b), d in zip(kde_regions, dens_list)}

    # phase 1: cluster every region on host. The reassignment pools were
    # dispatched WITH the distance chain in _dispatch_batch (their pair
    # set is label-independent); the e2e results arrived in the same
    # materialization as ``dists`` above, and the ends-free handle only
    # needs its collect — no post-clustering device round trip remains.
    region_jobs = []
    for si, ((work, coords, start), distmatrix) in enumerate(
            zip(spans, matrices)):
        with metrics.phase("cluster_consensus"), \
                metrics.phase("cluster_labels"):
            clustmsg, labels = cluster_labels(params, work, distmatrix,
                                              densities=region_dens.get(si))
        region_jobs.append((work, distmatrix, clustmsg, labels,
                            reassign_infos[si]))
    with metrics.phase("device_dispatch"):
        ef_d = (dist_backend.engine.ends_free_collect(ef_handle)
                if ef_handle is not None else [])

    staged = []
    all_tasks = []
    for work, distmatrix, clustmsg, labels, info in region_jobs:
        pre = None
        if info is not None:
            pre, e2e_p, e2e_k, ef_j, ef_k, ef_n, eo, fo = info
            for key, d, ml in zip(e2e_k, dists[eo : eo + len(e2e_p)],
                                  pair_maxlen[eo : eo + len(e2e_p)]):
                pre[key] = d / ml
            for key, d, nrm in zip(ef_k, ef_d[fo : fo + len(ef_j)], ef_n):
                pre[key] = d / nrm
        with metrics.phase("cluster_consensus"), \
                metrics.phase("cluster_finish"):
            alleles, tasks = cluster_finish(params, work, distmatrix,
                                            clustmsg, labels, pre)
        staged.append((work, clustmsg, alleles))
        all_tasks.extend(tasks)
    # one multi-pattern banded DP for every allele consensus in the batch,
    # band-seeded by one pooled device edit-distance dispatch
    with metrics.phase("cluster_consensus"), \
            metrics.phase("consensus_batch"):
        consensus_apply_batched(all_tasks, engine=dist_backend.engine)
    for work, clustmsg, alleles in staged:
        emit_region(params, work, clustmsg, alleles, out)


def assemble_region(params: OtterOpts, local_bed: BED, bam: BamReader,
                    faidx: Optional[Faidx], reads_only: bool, out: TextIO,
                    dist_backend=None) -> None:
    """Single-region path (host math, or one-region device batch)."""
    work = prepare_region(params, local_bed, bam, faidx, reads_only, out)
    if work is None:
        return
    if dist_backend is not None:
        process_region_batch(params, [work], dist_backend, out)
        return
    distmatrix = DistMatrix(len(work.valid_indeces))
    if params.max_alleles != 1:
        fill_dist_matrix(work.ignore_haps, work.reads, work.valid_indeces,
                         distmatrix)
    finish_region(params, work, distmatrix, out)


def assemble_process(params: OtterOpts, bam_path: str, bed_regions: List[BED],
                     reference: str, reads_only: bool, out: TextIO) -> None:
    sys.stderr.write(
        f"({antimestamp()}): Processing {bam_path} ({params.read_group})\n")
    bam = BamReader(bam_path, load_index=True)
    faidx = Faidx(reference) if reference else None
    dist_backend = _make_dist_backend(params)
    pool = None
    if (params.threads > 1 and dist_backend is not None
            and os.environ.get("OTTER_TPU_FINISH_POOL") == "1"):
        # jax-free worker processes for the whole finish phase (cluster +
        # host-DP reassignment + consensus). Loses to the pooled device
        # batch path on accelerator backends, so opt-in only.
        import multiprocessing as mp
        pool = mp.get_context("spawn").Pool(params.threads)
    try:
        with metrics.phase("region_total"):
            if dist_backend is None:
                for local_bed in bed_regions:
                    assemble_region(params, local_bed, bam, faidx, reads_only, out)
                    metrics.add("regions")
            else:
                _assemble_batched(params, bam_path, bed_regions, bam, faidx,
                                  reference, reads_only, dist_backend, pool,
                                  out)
    finally:
        if pool is not None:
            pool.close()
            pool.join()
    bam.close()
    if faidx is not None:
        faidx.close()


def _assemble_batched(params: OtterOpts, bam_path: str,
                      bed_regions: List[BED], bam: BamReader,
                      faidx: Optional[Faidx], reference: str,
                      reads_only: bool, dist_backend, pool,
                      out: TextIO) -> None:
    """Batched device pipeline. With -t > 1, region preparation (BAM fetch,
    breakpoint projection, realignment) fans out over a thread pool with
    per-thread BamReader/Faidx instances (the reference's per-thread
    BamInstance, assemble.cpp:45-50); BGZF inflate and the native record
    feeder release the GIL. Output order stays the BED order (reads-only
    text is buffered per region)."""
    import io as _io

    n_prep = min(params.threads, 8) if params.threads > 1 else 1
    executor = None
    thread_handles: List = []
    if n_prep > 1:
        import threading
        from concurrent.futures import ThreadPoolExecutor

        tls = threading.local()
        hlock = threading.Lock()

        def prep(local_bed: BED):
            r = getattr(tls, "bam", None)
            if r is None:
                tls.bam = BamReader(bam_path, load_index=True)
                tls.faidx = Faidx(reference) if reference else None
                with hlock:
                    thread_handles.append((tls.bam, tls.faidx))
            buf = _io.StringIO()
            work = prepare_region(params, local_bed, tls.bam, tls.faidx,
                                  reads_only, buf)
            return work, buf.getvalue()

        executor = ThreadPoolExecutor(max_workers=n_prep)
    try:
        pending: List[RegionWork] = []
        in_flight = None
        for c0 in range(0, len(bed_regions), DEFAULT_REGION_BATCH):
            chunk = bed_regions[c0 : c0 + DEFAULT_REGION_BATCH]
            with metrics.phase("host_io"):
                if executor is not None:
                    results = list(executor.map(prep, chunk))
                else:
                    results = []
                    for local_bed in chunk:
                        buf = _io.StringIO()
                        results.append((prepare_region(params, local_bed, bam,
                                                       faidx, reads_only, buf),
                                        buf.getvalue()))
            for work, text in results:
                if text:
                    out.write(text)
                metrics.add("regions")
                if work is not None:
                    pending.append(work)
            if len(pending) >= DEFAULT_REGION_BATCH:
                # two-stage pipeline: launch this batch's pooled distance
                # work, then finish the PREVIOUS batch on the host while
                # the device/tunnel chews on this one. Emission stays in
                # BED order (finish order == dispatch order).
                staged = _dispatch_batch(params, pending, dist_backend,
                                         pool=pool)
                if in_flight is not None:
                    _finish_batch(params, in_flight, dist_backend, out,
                                  pool=pool)
                in_flight = staged
                pending = []
        if pending:
            staged = _dispatch_batch(params, pending, dist_backend,
                                     pool=pool)
            if in_flight is not None:
                _finish_batch(params, in_flight, dist_backend, out, pool=pool)
            in_flight = staged
        if in_flight is not None:
            _finish_batch(params, in_flight, dist_backend, out, pool=pool)
    finally:
        if executor is not None:
            executor.shutdown(wait=True)
            for rdr, fx in thread_handles:
                rdr.close()
                if fx is not None:
                    fx.close()


def _make_dist_backend(params: OtterOpts):
    if params.device in ("tpu", "cpu", "auto", "mesh"):
        try:
            from ..kernels.dist_backend import DeviceDistBackend
            return DeviceDistBackend(params.device)
        except Exception as e:  # pragma: no cover - jax unavailable fallback
            if params.device != "auto":
                sys.stderr.write(
                    f"({antimestamp()}): [WARNING] device backend unavailable "
                    f"({e}); falling back to host path\n")
    return None


def completed_regions(partial_output_path: str) -> set:
    """Region ids (chr:start-end) already present in a partial assemble
    output (SAM ta: tags or FASTA headers) — the restart unit is a region,
    matching the reference's implicit recovery model (SURVEY.md §5)."""
    done = set()
    try:
        with open(partial_output_path) as fh:
            for line in fh:
                if line.startswith("@"):
                    continue
                if line.startswith(">"):
                    parts = line[1:].split("#")
                    if len(parts) >= 2:
                        done.add(parts[1])
                else:
                    for field in line.rstrip("\n").split("\t")[11:]:
                        if field.startswith("ta:Z:"):
                            done.add(field[5:])
                            break
    except OSError:
        pass
    return done


def _record_region(line: str) -> Optional[str]:
    """Region id (chr:start-end) of one output record line, or None for
    headers/unparseable lines."""
    if line.startswith(">"):
        parts = line[1:].split("#")
        return parts[1] if len(parts) >= 2 else None
    for field in line.rstrip("\n").split("\t")[11:]:
        if field.startswith("ta:Z:"):
            return field[5:]
    return None


def trim_partial_output(path: str) -> set:
    """Make a partial (possibly torn) assemble output safe to resume from.

    A killed worker (SIGKILL, OOM, node loss) can leave (a) a truncated
    final line and (b) a final region whose allele set is incomplete —
    records of one region are emitted contiguously, so dropping every
    trailing record of the LAST region id (plus any torn tail) leaves only
    whole regions. The file is rewritten in place; the surviving region ids
    (what ``completed_regions`` will report) are returned. Recovery then
    re-dispatches the worker's shard with ``resume_from`` pointing here —
    the region is the recovery unit, matching the reference's implicit
    restartability model (SURVEY.md §5)."""
    try:
        with open(path, "rb") as fh:
            raw = fh.read()
    except OSError:
        return set()
    complete, sep, _torn = raw.rpartition(b"\n")
    if not sep:
        complete = b""
    lines = complete.decode("utf-8", "replace").split("\n") if complete \
        else []
    # region id per line, with FASTA sequence lines (no id of their own)
    # inheriting the preceding header's region — a record is header +
    # sequence, and both must go if the record's region is trimmed
    regions_per_line: List[Optional[str]] = []
    cur: Optional[str] = None
    for line in lines:
        if line.startswith("@"):
            regions_per_line.append(None)  # SAM header: never trimmed
            cur = None
        elif line.startswith(">"):
            cur = _record_region(line)
            regions_per_line.append(cur)
        elif line and not line[0].isspace() and "\t" in line:
            cur = _record_region(line)  # SAM record line
            regions_per_line.append(cur)
        else:
            regions_per_line.append(cur)  # FASTA sequence continuation
    last_region = None
    for rid in reversed(regions_per_line):
        if rid is not None:
            last_region = rid
            break
    keep = len(lines)
    if last_region is not None:
        while keep > 0 and not lines[keep - 1].startswith("@") \
                and regions_per_line[keep - 1] == last_region:
            keep -= 1
    kept_lines = lines[:keep]
    with open(path, "w") as fh:
        for line in kept_lines:
            fh.write(line + "\n")
    done = set()
    for line in kept_lines:
        if not line.startswith("@"):
            rid = _record_region(line)
            if rid:
                done.add(rid)
    return done


def assemble(bam_path: str, bed: str, reference: str, reads_only: bool,
             params: OtterOpts, out: Optional[TextIO] = None,
             resume_from: str = "") -> None:
    """Top level (assemble.cpp:160-179): SAM header then per-region work.

    Multi-host: when running under jax.distributed, each process handles its
    contiguous block of regions (parallel/distributed.py); concatenating the
    per-process outputs in process order reproduces the single-host stream.
    """
    if out is None:
        out = sys.stdout
    bed_regions = parse_bed_file(bed)
    if resume_from:
        done = completed_regions(resume_from)
        before = len(bed_regions)
        bed_regions = [b for b in bed_regions
                       if b.to_sc_string() not in done]
        sys.stderr.write(
            f"({antimestamp()}): resume: skipping {before - len(bed_regions)} "
            f"completed regions\n")
    pidx, pcount = 0, 1
    if params.device != "host":
        from ..parallel.distributed import maybe_initialize, shard_regions
        pidx, pcount = maybe_initialize()
        if pcount > 1:
            bed_regions = shard_regions(bed_regions, pidx, pcount)
            sys.stderr.write(
                f"({antimestamp()}): process {pidx}/{pcount} handling "
                f"{len(bed_regions)} regions\n")
    # writer-host gather (OTTER_TPU_GATHER=1): every process's block is
    # collected to process 0 and emitted there as one stream — the analog
    # of the reference's stdout mutex (assemble.cpp:42,143-149). Default:
    # per-process streams whose in-order concatenation is byte-identical.
    from ..parallel.distributed import gather_enabled, gather_text_to_writer
    gather = gather_enabled(pcount)
    body_out: TextIO = io.StringIO() if gather else out
    # only the first process emits the header so the (concatenated or
    # gathered) per-process outputs form one valid SAM stream
    if (not params.is_fa) and pidx == 0:
        hdr = BamReader(bam_path, load_index=True)
        for name, ln in zip(hdr.ref_names, hdr.ref_lens):
            body_out.write(f"@SQ\tSN:{name}\tLN:{ln}\n")
        body_out.write(f"@RG\tID:{params.read_group}\n")
        body_out.write(
            f"@PG\tID:otter\tOF:{params.offset_l},{params.offset_r}\n")
        hdr.close()
    assemble_process(params, bam_path, bed_regions, reference, reads_only,
                     body_out)
    if gather:
        full = gather_text_to_writer(body_out.getvalue(), pidx, pcount)
        if full is not None:
            out.write(full)
