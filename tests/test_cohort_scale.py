"""Cohort-scale pipeline test (BASELINE config 5 analog, CPU-sized):
8 samples x 12 regions through assemble -> merge -> joint genotype,
checking VCF shape, genotype distribution, and multi-host region sharding
arithmetic."""

import io
import random

import pytest

from otter_tpu.config import OtterOpts
from otter_tpu.io.bai import index_bam
from otter_tpu.io.bam import parse_sam_to_bam
from otter_tpu.models.assemble import assemble
from otter_tpu.models.genotype import genotype
from otter_tpu.parallel.distributed import shard_regions

from fixtures import make_bam, make_reference, read_record, write_fasta
from otter_tpu.io.bam import BAM_CMATCH, BAM_CINS, BAM_CDEL


N_REGIONS = 12
N_SAMPLES = 8


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bigcohort")
    rng = random.Random(2024)
    span = 1500
    ref_len = 1000 + N_REGIONS * span + 1000
    ref = "".join(rng.choice("ACGT") for _ in range(ref_len))
    fa = str(tmp / "ref.fa")
    write_fasta(fa, [("chr1", ref)])
    bed = str(tmp / "regions.bed")
    regions = []
    with open(bed, "w") as fh:
        for r in range(N_REGIONS):
            start = 1000 + r * span
            end = start + 90
            regions.append((start, end))
            fh.write(f"chr1\t{start}\t{end}\n")

    # per-sample genotypes: sample s is hom-alt on regions where (r+s)%3==0,
    # het where (r+s)%3==1, hom-ref otherwise
    sam_texts = []
    for s in range(N_SAMPLES):
        records = []
        for r, (start, end) in enumerate(regions):
            ref_allele = ref[start:end]
            alt_allele = "CAG" * 40  # 120bp vs 90bp
            mode = (r + s) % 3
            if mode == 0:
                alleles = [alt_allele] * 2
            elif mode == 1:
                alleles = [ref_allele, alt_allele]
            else:
                alleles = [ref_allele] * 2
            for a_i, allele in enumerate(set(alleles)):
                for c in range(6):
                    lf = rng.randint(150, 250)
                    rf = rng.randint(150, 250)
                    seq = ref[start - lf : start] + allele + ref[end : end + rf]
                    cig = [(lf, BAM_CMATCH)]
                    rl = len(allele)
                    if rl >= (end - start):
                        cig.append((end - start, BAM_CMATCH))
                        if rl > end - start:
                            cig.append((rl - (end - start), BAM_CINS))
                    else:
                        cig.append((rl, BAM_CMATCH))
                        cig.append(((end - start) - rl, BAM_CDEL))
                    cig.append((rf, BAM_CMATCH))
                    records.append(read_record(
                        f"s{s}r{r}a{a_i}c{c}", 0, start - lf, seq, cig,
                        tags=[("rq", "f", 0.99)]))
        bam = str(tmp / f"s{s}.bam")
        make_bam(bam, [("chr1", ref_len)], records)
        params = OtterOpts()
        params.read_group = f"S{s}"
        params.device = "host"
        out = io.StringIO()
        assemble(bam, bed, "", False, params, out=out)
        sam_texts.append(out.getvalue())

    merged_lines = []
    for i, text in enumerate(sam_texts):
        for line in text.rstrip("\n").split("\n"):
            if line.startswith("@"):
                if i == 0 or line.startswith("@RG"):
                    merged_lines.append(line)
            else:
                merged_lines.append(line)
    hdr = [l for l in merged_lines if l.startswith("@")]
    body = [l for l in merged_lines if not l.startswith("@")]
    merged = str(tmp / "cohort.bam")
    parse_sam_to_bam("\n".join(hdr + body) + "\n", merged)
    index_bam(merged)
    return {"bam": merged, "bed": bed, "fa": fa, "regions": regions}


def test_cohort_vcf(cohort):
    params = OtterOpts()
    out = io.StringIO()
    genotype(params, cohort["bam"], cohort["bed"], cohort["fa"], out=out)
    lines = out.getvalue().rstrip("\n").split("\n")
    chrom = [l for l in lines if l.startswith("#CHROM")][0]
    samples = chrom.split("\t")[9:]
    assert samples == [f"S{s}" for s in range(N_SAMPLES)]
    records = [l for l in lines if not l.startswith("#")]
    assert len(records) == N_REGIONS
    correct = 0
    total = 0
    for r, line in enumerate(records):
        f = line.split("\t")
        for s in range(N_SAMPLES):
            gt = f[9 + s].split(":")[0]
            mode = (r + s) % 3
            want = {0: {"1/1"}, 1: {"0/1", "1/0"}, 2: {"0/0"}}[mode]
            total += 1
            if gt in want:
                correct += 1
    # joint genotyping should recover nearly all simulated genotypes
    assert correct / total > 0.95, (correct, total)


def test_shard_regions_partition():
    regions = list(range(10))
    parts = [shard_regions(regions, i, 3) for i in range(3)]
    assert parts == [[0, 1, 2, 3], [4, 5, 6], [7, 8, 9]]
    assert sum(parts, []) == regions
    # degenerate cases
    assert shard_regions(regions, 0, 1) == regions
    assert [shard_regions([], i, 4) for i in range(4)] == [[], [], [], []]


def test_cohort_vcf_threaded_identical(cohort):
    """-t 4 genotype (region thread pool, per-thread readers, ordered
    emission) must be byte-identical to -t 1. Ref: genotype.cpp:71-78."""
    params = OtterOpts()
    out1 = io.StringIO()
    genotype(params, cohort["bam"], cohort["bed"], cohort["fa"], out=out1)
    params4 = OtterOpts()
    params4.init_threads(4)
    out4 = io.StringIO()
    genotype(params4, cohort["bam"], cohort["bed"], cohort["fa"], out=out4)
    assert out1.getvalue() == out4.getvalue()


def test_cohort_vcf_batched_paths_identical(cohort, monkeypatch):
    """The assemble-style batched genotype pipeline (pooled kusage pass +
    pooled cosine GEMM + native hclust) and its forced-device variant
    (f32 einsum + certified rounding) must both be byte-identical to the
    sequential pure-host oracle."""
    params_h = OtterOpts()
    params_h.device = "host"
    out_h = io.StringIO()
    genotype(params_h, cohort["bam"], cohort["bed"], cohort["fa"], out=out_h)

    params_b = OtterOpts()  # device=auto -> batched host-BLAS pipeline
    out_b = io.StringIO()
    genotype(params_b, cohort["bam"], cohort["bed"], cohort["fa"], out=out_b)
    assert out_b.getvalue() == out_h.getvalue()

    monkeypatch.setenv("OTTER_TPU_GENOTYPE_DEVICE", "1")
    params_d = OtterOpts()
    out_d = io.StringIO()
    genotype(params_d, cohort["bam"], cohort["bed"], cohort["fa"], out=out_d)
    assert out_d.getvalue() == out_h.getvalue()


def test_cohort_500_samples_batched_identical(tmp_path):
    """O(500)-sample cohort (VERDICT r3 #7): n = 2*500+1 = 1001 allele
    matrices per region (~500k condensed entries) through the batched
    genotype pipeline, byte-identical to the sequential per-region path.
    Ref: otterclust.cpp:463-527 at real cohort scale."""
    import sys
    sys.path.insert(0, ".")
    from bench_e2e import build_cohort_fixture

    bam, bed, fa = build_cohort_fixture(str(tmp_path), n_samples=500,
                                        n_regions=3, seed=17)
    params_b = OtterOpts()  # device=auto -> batched pipeline
    out_b = io.StringIO()
    genotype(params_b, bam, bed, fa, out=out_b)

    params_h = OtterOpts()
    params_h.device = "host"
    out_h = io.StringIO()
    genotype(params_h, bam, bed, fa, out=out_h)
    assert out_b.getvalue() == out_h.getvalue()
    rows = [l for l in out_b.getvalue().splitlines()
            if l and not l.startswith("#")]
    assert len(rows) == 3
    # 500 samples + header columns all populated
    assert all(len(r.split("\t")) == 9 + 500 for r in rows)


def test_cosine_condensed_raw_fallback_parity(monkeypatch):
    """The ("raw", S) cosine handoff must give byte-identical condensed
    matrices through BOTH the native single-pass and the numpy fallback
    (OTTER_TPU_NATIVE_COSINE=0)."""
    import numpy as np

    from otter_tpu.ops.cluster import (_ROUND_GUARD,
                                       kusage_cosine_condensed,
                                       kusage_cosine_condensed_batch)

    rng = np.random.default_rng(5)
    n = 300
    V = rng.random((n, 65))
    V[7] = 0.0  # zero-total allele -> NaN norm path
    norms = np.sqrt((V * V).sum(axis=1))
    norms[norms == 0] = np.nan
    with np.errstate(invalid="ignore", divide="ignore"):
        scaled = ((V @ V.T) / np.outer(norms, norms)) * 1000.0
    want = kusage_cosine_condensed(scaled, V, norms, _ROUND_GUARD)
    got_native = kusage_cosine_condensed_batch(
        [("raw", V @ V.T)], [V], [norms], _ROUND_GUARD)[0]
    assert np.array_equal(got_native, want, equal_nan=True)
    monkeypatch.setenv("OTTER_TPU_NATIVE_COSINE", "0")
    got_np = kusage_cosine_condensed_batch(
        [("raw", V @ V.T)], [V], [norms], _ROUND_GUARD)[0]
    assert np.array_equal(got_np, want, equal_nan=True)
