"""``otter genotype`` workload (parity with src/genotype.cpp).

Joint genotyping of merged otter BAMs: sample index from @RG/@PG header
lines, internal reference sample OTTER_INTREF appended (genotype.cpp:175-189);
per region allele re-parse, reference allele fetch, diploid (min,max)
pairing, joint length x 3-mer clustering, GT re-centering so the reference
allele is GT 0, and VCF emission (genotype.cpp:16-67,80-164).
"""

from __future__ import annotations

import io
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


def _genotype_prep(params: OtterOpts, region: BED, bam: BamReader,
                   faidx: Optional[Faidx], si: SampleIndex, refindex: int,
                   out: TextIO):
    """Everything in genotype_region before clustering: allele parse, ref
    allele fetch, sample->local-allele mapping. Returns None when the
    region is fully handled here (warning, or the no-reference TSV mode);
    otherwise (anallele_block, allele_sample_indeces, ref_allele_index,
    sample2localindeces)."""
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
        return None
    ref_allele_index = -1
    if faidx is not None:
        refseq = faidx.fetch(region.chr, region.start - si.offset_l,
                             region.end + si.offset_r - 1)
        ref_allele_index = len(allele_sample_indeces)
        allele_sample_indeces.append(refindex)
        anallele_block.append(AnAllele(seq=refseq))
    # diploid pairing (genotype.cpp:103-111) flattened to vector ops: the
    # (min, max) allele index per sample is the first/last occurrence in
    # the (ascending-i) walk — np.unique on the index array and its
    # reverse yields both in one pass
    sample2localindeces: List[Optional[Tuple[int, int]]] = [None] * len(si.sample2index)
    if allele_sample_indeces:
        import numpy as np

        arr = np.asarray(allele_sample_indeces, dtype=np.int64)
        uniq, first = np.unique(arr, return_index=True)
        rev_last = arr.size - 1 - np.unique(arr[::-1], return_index=True)[1]
        for s, lo, hi in zip(uniq.tolist(), first.tolist(),
                             rev_last.tolist()):
            sample2localindeces[s] = (lo, hi)
    if faidx is None:
        for i in range(len(si.sample2index)):
            pair = sample2localindeces[i]
            if pair is not None and i != refindex:
                a1 = len(anallele_block[pair[0]].seq)
                a2 = len(anallele_block[pair[1]].seq)
                out.write(f"{region.to_sc_string()}\t{si.index2sample[i]}\t"
                          f"{min(a1, a2)}\t{max(a1, a2)}\n")
        return None
    return (anallele_block, allele_sample_indeces, ref_allele_index,
            sample2localindeces)


def genotype_region(params: OtterOpts, region: BED, bam: BamReader,
                    faidx: Optional[Faidx], si: SampleIndex, refindex: int,
                    out: TextIO, precomputed: Optional[dict] = None,
                    prep=None) -> None:
    """(genotype.cpp:80-165)"""
    if prep is None:
        prep = _genotype_prep(params, region, bam, faidx, si, refindex, out)
    if prep is None:
        return
    (anallele_block, allele_sample_indeces, ref_allele_index,
     sample2localindeces) = prep
    genotypes = [Genotype() for _ in range(len(anallele_block))]
    acc_gt, gt_reps = anallele_cluster(params.max_error, params.max_cosdis,
                                       anallele_block, genotypes,
                                       precomputed=precomputed,
                                       hsd_indices=[ref_allele_index])
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
    """Sequential at -t 1; a region thread pool otherwise (the reference
    parallelizes genotype over regions with a stdout mutex,
    genotype.cpp:71-78 — we emit in REGION ORDER instead, so -t N output
    is byte-identical to -t 1). Each worker owns its BamReader/Faidx
    (per-thread handles, the BS_thread_pool pattern); the clustering math
    it runs is pure numpy + the native NN-chain, both thread-safe."""
    if (reference and len(regions) > 1
            and getattr(params, "device", "host") != "host"):
        genotype_process_batched(params, bam_path, regions, reference, si,
                                 refindex, out)
        return
    n_threads = max(1, int(getattr(params, "threads", 1) or 1))
    if n_threads <= 1 or len(regions) <= 1:
        bam = BamReader(bam_path, load_index=True)
        faidx = Faidx(reference) if reference else None
        for region in regions:
            genotype_region(params, region, bam, faidx, si, refindex, out)
        bam.close()
        if faidx is not None:
            faidx.close()
        return
    results = _pooled_regions(params, bam_path, regions, reference, si,
                              refindex, n_threads, prep_only=False)
    for text, _prep in results:
        if text:
            out.write(text)


def _pooled_regions(params: OtterOpts, bam_path: str, regions: List[BED],
                    reference: str, si: SampleIndex, refindex: int,
                    n_threads: int, prep_only: bool):
    """Region thread pool with per-thread BamReader/Faidx handles (the
    reference's BS_thread_pool pattern, genotype.cpp:71-78; shared
    exception-propagating pool in utils/pool.py). Returns per-region
    (emitted_text, prep) in region order; with prep_only the workers stop
    before clustering (the batched pipeline takes over)."""
    import io as _io

    from ..utils.pool import ordered_thread_map

    def make_ctx():
        return (BamReader(bam_path, load_index=True),
                Faidx(reference) if reference else None)

    def run_item(ctx, i):
        bam, faidx = ctx
        buf = _io.StringIO()
        if prep_only:
            prep = _genotype_prep(params, regions[i], bam, faidx,
                                  si, refindex, buf)
            return (buf.getvalue(), prep)
        genotype_region(params, regions[i], bam, faidx, si, refindex, buf)
        return (buf.getvalue(), None)

    def close_ctx(ctx):
        bam, faidx = ctx
        bam.close()
        if faidx is not None:
            faidx.close()

    return ordered_thread_map(len(regions), n_threads, make_ctx, run_item,
                              close_ctx)


# f32 batched-einsum error bound: a 65-term f32 dot accumulates ~65*2^-24
# relative error; scaled values reach 1000, so the absolute error stays
# under ~4e-3. The 1e-2 guard recomputes every pair the device could have
# mis-rounded (a few percent) with the scalar f64 oracle.
_ROUND_GUARD_F32 = 1e-2


def genotype_process_batched(params: OtterOpts, bam_path: str,
                             regions: List[BED], reference: str,
                             si: SampleIndex, refindex: int,
                             out: TextIO) -> None:
    """Assemble-style pooled genotype pipeline (otterclust.cpp:367-420,
    463-527 semantics, batched across regions):

      1. threaded region prep (allele parse + ref fetch), per-thread
         handles;
      2. ONE vectorized k-mer usage pass over every allele of every
         region (seqs/kmer.py::kusage_batch);
      3. the per-region length distances vectorized on host (elementwise
         f64, exact) and ALL regions' cosine similarity matrices as ONE
         pooled GEMM dispatch — a padded (R, n_max, 65) einsum on the
         device (f32) when it is direct-attached or forced
         (OTTER_TPU_GENOTYPE_DEVICE=1), the host f64 BLAS batch
         otherwise; both are certified pair-wise against the scalar-dot
         oracle (ops/cluster.py::kusage_cosine_condensed), so the VCF is
         byte-identical to the sequential host path either way;
      4. per-region hclust (native C++ NN-chain) + joint labels + VCF
         line, emitted in region order.
    """
    from ..ops.cluster import _ROUND_GUARD, kusage_cosine_condensed
    from ..seqs.kmer import kusage_batch_arrays
    from ..utils import metrics
    import numpy as np

    n_threads = max(1, int(getattr(params, "threads", 1) or 1))
    with metrics.phase("genotype_prep"):
        results = _pooled_regions(params, bam_path, regions, reference, si,
                                  refindex, n_threads, prep_only=True)
    live = [i for i, (_t, prep) in enumerate(results) if prep is not None]
    with metrics.phase("genotype_kusage"):
        all_seqs: List[str] = []
        spans = {}
        for i in live:
            block = results[i][1][0]
            spans[i] = (len(all_seqs), len(block))
            all_seqs.extend(a.seq for a in block)
        kus_all, vecs_all, vnorms_all = kusage_batch_arrays(3, all_seqs,
                                                            lazy=True)
    # pooled cosine GEMM: device f32 einsum over the padded region batch,
    # host f64 BLAS otherwise; certification makes them byte-equivalent
    scaled_by_region = {}
    Vs = {}
    norms_by_region = {}
    for i in live:
        s0, cnt = spans[i]
        Vs[i] = vecs_all[s0 : s0 + cnt]
        norms_by_region[i] = vnorms_all[s0 : s0 + cnt]
    mesh_mode = getattr(params, "device", "") == "mesh"
    use_device = mesh_mode or _genotype_device_default(params)
    guard = _ROUND_GUARD
    if use_device and live:
        try:
            with metrics.phase("genotype_cosine_device"):
                import jax
                import jax.numpy as jnp

                n_max = max(Vs[i].shape[0] for i in live)
                width = Vs[live[0]].shape[1]
                R = len(live)
                if mesh_mode:
                    # region-sharded pooled GEMM over the device mesh:
                    # the region axis splits across chips, XLA runs each
                    # shard's einsum locally (no collectives needed)
                    import os as _os

                    from ..parallel.mesh import make_mesh
                    from jax.sharding import NamedSharding
                    from jax.sharding import PartitionSpec as P

                    ndev = int(_os.environ.get("OTTER_TPU_MESH_DEVICES",
                                               "0") or 0) \
                        or len(jax.devices())
                    mesh = make_mesh(ndev)
                    R = ((len(live) + ndev - 1) // ndev) * ndev
                Vp = np.zeros((R, n_max, width), dtype=np.float32)
                for bi, i in enumerate(live):
                    Vp[bi, : Vs[i].shape[0]] = Vs[i]
                if mesh_mode:
                    xv = jax.device_put(
                        Vp, NamedSharding(mesh, P("dp", None, None)))
                else:
                    xv = jnp.asarray(Vp)
                # Precision.HIGHEST: the TPU MXU's default matmul
                # precision truncates f32 operands to bfloat16, whose
                # ~2^-8 relative error dwarfs the certification guard —
                # the guard's 65*2^-24 error model only holds at full
                # f32 precision
                S = jnp.einsum("rne,rme->rnm", xv, xv,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
                S = np.asarray(S, dtype=np.float64)
                for bi, i in enumerate(live):
                    n = Vs[i].shape[0]
                    nr = norms_by_region[i]
                    with np.errstate(invalid="ignore", divide="ignore"):
                        scaled_by_region[i] = (
                            S[bi, :n, :n] / np.outer(nr, nr)) * 1000.0
                guard = _ROUND_GUARD_F32
        except Exception:
            scaled_by_region = {}
            guard = _ROUND_GUARD
    if not scaled_by_region:
        with metrics.phase("genotype_cosine_host"):
            # raw GEMM only — the /(ni*nj)*1000 scaling happens inside the
            # native condensed pass (cosine_condensed_native prescaled=
            # False; numpy fallback applies the identical elementwise ops)
            for i in live:
                V = Vs[i]
                scaled_by_region[i] = ("raw", V @ V.T)
    with metrics.phase("genotype_finish"):
        import io as _io

        from ..ops.cluster import kusage_cosine_condensed_batch
        from ..ops.distmat import triu_pair_indices

        # condensed cosine rounding for every region in one stacked pass
        # (byte-equal per entry to the scalar kusage_cosine_condensed)
        kvals_all = kusage_cosine_condensed_batch(
            [scaled_by_region[i] for i in live], [Vs[i] for i in live],
            [norms_by_region[i] for i in live], guard)
        kvals_by_region = dict(zip(live, kvals_all))
        # length condensed matrices for every region (vector ops, f64 exact)
        lvals_by_region = {}
        for i in live:
            block = results[i][1][0]
            lens = np.asarray([len(a.seq) for a in block],
                              dtype=np.float64)
            iu, ju = triu_pair_indices(len(block))
            mx = np.maximum(lens[iu], lens[ju])
            lvals_by_region[i] = np.abs(lens[iu] - lens[ju])                 / np.maximum(mx, 1.0)
        # ONE threaded native NN-chain call for every region's two
        # matrices (the 500-sample regime runs 2R sequential n=1001
        # hclusts otherwise); the native batch is the same C++ core as
        # the per-matrix route — parity-exact, VCF unchanged
        dendros_by_region = {}
        try:
            import os as _os

            if _os.environ.get("OTTER_TPU_NATIVE_HCLUST", "1") != "1":
                raise RuntimeError("native hclust disabled")
            from ..native import hclust_average_native_batch

            mats = []
            owners = []
            for i in live:
                n_all = len(results[i][1][0])
                if n_all >= 2:
                    mats.append((lvals_by_region[i], n_all))
                    owners.append((i, "length_dendro"))
                    mats.append((kvals_by_region[i], n_all))
                    owners.append((i, "kusage_dendro"))
            if mats:
                outs = hclust_average_native_batch(mats)
                for (i, key), mh in zip(owners, outs):
                    dendros_by_region.setdefault(i, {})[key] = mh
        except Exception:
            dendros_by_region = {}

        def finish_region(i: int) -> str:
            text, prep = results[i]
            if prep is None:
                return text or ""
            s0, cnt = spans[i]
            kvals = kvals_by_region[i]
            lvals = lvals_by_region[i]
            pre = {"length_values": lvals, "kusage_values": kvals,
                   "kusages": kus_all[s0 : s0 + cnt]}
            pre.update(dendros_by_region.get(i, {}))
            buf = _io.StringIO()
            genotype_region(params, regions[i], None, None, si, refindex,
                            buf, precomputed=pre, prep=prep)
            return (text or "") + buf.getvalue()

        if n_threads > 1 and len(regions) > 1:
            # region finish pool (pure functions + GIL-releasing native
            # hclust/cutree); emission stays in region order, so -t N is
            # byte-identical to -t 1
            from ..utils.pool import ordered_thread_map

            texts = ordered_thread_map(
                len(regions), n_threads, lambda: None,
                lambda _ctx, i: finish_region(i), lambda _ctx: None)
            for t in texts:
                out.write(t)
        else:
            for i in range(len(regions)):
                out.write(finish_region(i))


_GENOTYPE_DEVICE_DECISION: Optional[bool] = None


def _genotype_device_default(params: OtterOpts) -> bool:
    """Route the pooled cosine GEMM to the device? Forced by
    OTTER_TPU_GENOTYPE_DEVICE=1/0; otherwise only when jax is live and the
    round trip is direct-attach-fast (<5 ms) — through a tunnel the host
    BLAS wins (the matrices are tiny; the dispatch is pure latency)."""
    import os

    global _GENOTYPE_DEVICE_DECISION
    env = os.environ.get("OTTER_TPU_GENOTYPE_DEVICE", "")
    if env == "1":
        return True
    if env == "0":
        return False
    if _GENOTYPE_DEVICE_DECISION is None:
        try:
            # never let this decision INITIALIZE the backend: through a
            # flaky tunnel that can hang the process for minutes
            # (CLAUDE.md quirks). Only measure when a backend is already
            # live in-process; otherwise host BLAS (the right answer for
            # tunnels regardless).
            if "jax" not in sys.modules:
                _GENOTYPE_DEVICE_DECISION = False
            else:
                from jax._src import xla_bridge

                if not xla_bridge._backends:
                    _GENOTYPE_DEVICE_DECISION = False
                else:
                    import jax

                    plat = jax.devices()[0].platform
                    if plat not in ("tpu", "axon"):
                        # jax-on-CPU "device" IS the host: the f32 einsum
                        # (+ its wide certify guard, thousands of scalar
                        # recomputes) can only lose to host f64 BLAS
                        _GENOTYPE_DEVICE_DECISION = False
                    else:
                        from ..utils.preflight import device_roundtrip_ms

                        _GENOTYPE_DEVICE_DECISION = \
                            device_roundtrip_ms() < 5.0
        except Exception:
            _GENOTYPE_DEVICE_DECISION = False
    return _GENOTYPE_DEVICE_DECISION


def genotype(params: OtterOpts, bam_path: str, bed: str, reference: str,
             out: Optional[TextIO] = None) -> None:
    """(genotype.cpp:173-192)

    Multi-host: regions shard across jax processes like assemble; only
    process 0 emits the VCF header."""
    if out is None:
        out = sys.stdout
    regions = parse_bed_file(bed)
    pidx, pcount = 0, 1
    if params.device != "host":
        from ..parallel.distributed import maybe_initialize, shard_regions
        pidx, pcount = maybe_initialize()
        if pcount > 1:
            regions = shard_regions(regions, pidx, pcount)
            sys.stderr.write(
                f"({antimestamp()}): process {pidx}/{pcount} handling "
                f"{len(regions)} regions\n")
    # writer-host gather mode: VCF rows collected to process 0
    # (parallel/distributed.py::gather_text_to_writer)
    from ..parallel.distributed import gather_enabled, gather_text_to_writer
    gather = gather_enabled(pcount)
    body_out = io.StringIO() if gather else out
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
        output_vcf_header(bam_path, si.index2sample, REFNAME, body_out)
    genotype_process(params, bam_path, regions, reference, si, refindex,
                     body_out)
    if gather:
        full = gather_text_to_writer(body_out.getvalue(), pidx, pcount)
        if full is not None:
            out.write(full)
