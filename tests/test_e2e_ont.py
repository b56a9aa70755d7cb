"""ONT-like high-error e2e test (BASELINE.json config 3 analog): KDE
bandwidth switching and clustering-threshold adaptation, plus multi-region
batched-vs-host equality."""

import io
import random

import pytest

from otter_tpu.config import OtterOpts
from otter_tpu.models.assemble import assemble

from fixtures import make_reference, simulate_region_bam, write_fasta


def test_ont_error_rate_two_alleles(tmp_path):
    rng = random.Random(777)
    ref = make_reference(rng, length=4000, repeat="TTAGG", repeat_at=2000,
                         repeat_units=40)
    start, end = 2000, 2200
    short = ref[start:end]
    long_a = "TTAGG" * 60  # 300bp vs 200bp
    bam = str(tmp_path / "ont.bam")
    # ~5% error: ONT-ish
    simulate_region_bam(bam, "chr1", ref, (start, end), [short, long_a],
                        per_allele_cov=15, error_rate=0.05, seed=13)
    bed = str(tmp_path / "r.bed")
    with open(bed, "w") as fh:
        fh.write(f"chr1\t{start}\t{end}\n")
    params = OtterOpts()
    params.read_group = "ONT1"
    params.device = "host"
    out = io.StringIO()
    assemble(bam, bed, "", False, params, out=out)
    body = [l for l in out.getvalue().rstrip("\n").split("\n")
            if not l.startswith("@")]
    # the bandwidth_long path (reads >= 500? no — reads ~200-300 < 500 so
    # bandwidth stays short) must still separate a 50% length difference
    assert len(body) == 2
    lens = sorted(len(l.split("\t")[9]) for l in body)
    assert abs(lens[0] - 200) < 25
    assert abs(lens[1] - 300) < 30


def test_ont_long_reads_bandwidth_switch(tmp_path):
    rng = random.Random(778)
    ref = make_reference(rng, length=6000, repeat="TTAGGC", repeat_at=3000,
                         repeat_units=100)
    start, end = 3000, 3600  # 600bp region -> triggers bandwidth_long
    short = ref[start:end]
    long_a = "TTAGGC" * 120  # 720bp
    bam = str(tmp_path / "ontlong.bam")
    simulate_region_bam(bam, "chr1", ref, (start, end), [short, long_a],
                        per_allele_cov=14, error_rate=0.06, seed=14,
                        flank=500)
    bed = str(tmp_path / "r.bed")
    with open(bed, "w") as fh:
        fh.write(f"chr1\t{start}\t{end}\n")
    params = OtterOpts()
    params.read_group = "ONT1"
    params.device = "host"
    out = io.StringIO()
    assemble(bam, bed, "", False, params, out=out)
    body = [l for l in out.getvalue().rstrip("\n").split("\n")
            if not l.startswith("@")]
    assert len(body) == 2
    lens = sorted(len(l.split("\t")[9]) for l in body)
    assert abs(lens[0] - 600) < 60
    assert abs(lens[1] - 720) < 70


def test_multi_region_batched_equals_host(tmp_path):
    """10 regions through the batched device path == sequential host path."""
    rng = random.Random(99)
    ref = make_reference(rng, length=20000, repeat="CAG", repeat_at=0,
                         repeat_units=0)
    regions = []
    bed = str(tmp_path / "multi.bed")
    records_bams = []
    # build one BAM with reads for 10 regions
    from otter_tpu.io.bam import BamRecord
    from fixtures import read_record, make_bam
    from otter_tpu.io.bam import BAM_CMATCH

    all_records = []
    with open(bed, "w") as fh:
        for r in range(10):
            start = 1000 + r * 1800
            end = start + 60
            fh.write(f"chr1\t{start}\t{end}\n")
            alleles = [ref[start:end]]
            if r % 2 == 0:
                alleles.append("CAG" * 30)
            for a_i, allele in enumerate(alleles):
                for c in range(8):
                    lf = rng.randint(150, 300)
                    rf = rng.randint(150, 300)
                    seq = ref[start - lf : start] + allele + ref[end : end + rf]
                    # pure-M cigar with mid D/I rebalance
                    cig = [(lf, BAM_CMATCH)]
                    rl = len(allele)
                    if rl >= (end - start):
                        cig.append(((end - start), BAM_CMATCH))
                        if rl > (end - start):
                            cig.append((rl - (end - start), 1))  # BAM_CINS
                    else:
                        cig.append((rl, BAM_CMATCH))
                        cig.append(((end - start) - rl, 2))  # BAM_CDEL
                    cig.append((rf, BAM_CMATCH))
                    all_records.append(read_record(
                        f"r{r}_{a_i}_{c}", 0, start - lf, seq, cig,
                        tags=[("rq", "f", 0.99)]))
    bam = str(tmp_path / "multi.bam")
    make_bam(bam, [("chr1", len(ref))], all_records)

    outs = {}
    for device in ("host", "cpu"):
        params = OtterOpts()
        params.read_group = "S1"
        params.device = device
        out = io.StringIO()
        assemble(bam, bed, "", False, params, out=out)
        outs[device] = out.getvalue()
    assert outs["host"] == outs["cpu"]
    body = [l for l in outs["host"].split("\n") if l and not l.startswith("@")]
    assert len(body) == 15  # 5 het regions x2 + 5 hom x1


def test_reads_with_N_bases(tmp_path):
    """Reads containing N route through the banded kernel (Myers is
    ACGT-only) and still assemble; 'N'=='N' counts as a match like the
    reference's raw char comparison."""
    rng = random.Random(555)
    ref = make_reference(rng, length=3000, repeat="CAG", repeat_at=1500,
                         repeat_units=20)
    start, end = 1500, 1560
    from fixtures import read_record, make_bam
    from otter_tpu.io.bam import BAM_CMATCH
    recs = []
    for c in range(8):
        seq = list(ref[start - 150 : end + 150])
        # sprinkle N's
        for _ in range(6):
            seq[rng.randrange(len(seq))] = "N"
        seq = "".join(seq)
        recs.append(read_record(f"n{c}", 0, start - 150, seq,
                                [(len(seq), BAM_CMATCH)],
                                tags=[("rq", "f", 0.99)]))
    bam = str(tmp_path / "n.bam")
    make_bam(bam, [("chr1", len(ref))], recs)
    bed = str(tmp_path / "r.bed")
    with open(bed, "w") as fh:
        fh.write(f"chr1\t{start}\t{end}\n")
    outs = {}
    for device in ("host", "cpu"):
        params = OtterOpts()
        params.read_group = "S1"
        params.device = device
        out = io.StringIO()
        assemble(bam, bed, "", False, params, out=out)
        outs[device] = out.getvalue()
    assert outs["host"] == outs["cpu"]
    body = [l for l in outs["host"].rstrip("\n").split("\n")
            if not l.startswith("@")]
    assert len(body) >= 1
