"""End-to-end assemble tests on synthetic tandem-repeat fixtures
(BASELINE.json configs 1-3 analogs)."""

import io
import random

import pytest

from otter_tpu.config import OtterOpts
from otter_tpu.models.assemble import assemble

from fixtures import make_reference, simulate_region_bam, write_fasta


@pytest.fixture(scope="module")
def het_fixture(tmp_path_factory):
    """Reference + BAM with a heterozygous tandem-repeat expansion."""
    tmp = tmp_path_factory.mktemp("het")
    rng = random.Random(123)
    ref = make_reference(rng, length=3000, repeat="CAG", repeat_at=1500,
                         repeat_units=20)
    # region covering the repeat: [1500, 1500+60)
    start, end = 1500, 1560
    region_seq = ref[start:end]
    allele_long = "CAG" * 30  # expansion: 90bp vs 60bp
    bam = str(tmp / "reads.bam")
    simulate_region_bam(bam, "chr1", ref, (start, end),
                        [region_seq, allele_long], per_allele_cov=12,
                        error_rate=0.002, seed=99)
    fa = str(tmp / "ref.fa")
    write_fasta(fa, [("chr1", ref)])
    bed = str(tmp / "regions.bed")
    with open(bed, "w") as fh:
        fh.write(f"chr1\t{start}\t{end}\n")
    return {"bam": bam, "fa": fa, "bed": bed, "ref": ref,
            "start": start, "end": end,
            "alleles": [region_seq, allele_long]}


def _params(**kw):
    p = OtterOpts()
    p.read_group = "S1"
    p.device = "host"
    for k, v in kw.items():
        setattr(p, k, v)
    return p


def test_reads_only_fasta(het_fixture):
    params = _params(is_fa=True)
    out = io.StringIO()
    assemble(het_fixture["bam"], het_fixture["bed"], "", True, params, out=out)
    text = out.getvalue()
    entries = [l for l in text.split("\n") if l.startswith(">")]
    assert len(entries) == 24  # 2 alleles x 12 reads, all parsed
    # every entry carries region + spanning tag
    for e in entries:
        assert "#chr1:1500-1560#" in e
        assert "sp:A:" in e
    seqs = [l for l in text.split("\n") if l and not l.startswith(">")]
    # extracted subsequences must be ~allele sized (60 or 90 +- offsets/errors)
    lens = sorted(len(s) for s in seqs)
    assert lens[0] > 40 and lens[-1] < 110


def test_assemble_sam_two_alleles(het_fixture):
    params = _params()
    out = io.StringIO()
    assemble(het_fixture["bam"], het_fixture["bed"], "", False, params, out=out)
    lines = out.getvalue().rstrip("\n").split("\n")
    hdr = [l for l in lines if l.startswith("@")]
    body = [l for l in lines if not l.startswith("@")]
    assert "@SQ\tSN:chr1\tLN:3000" in hdr
    assert "@RG\tID:S1" in hdr
    assert "@PG\tID:otter\tOF:1,0" in hdr
    assert len(body) == 2  # two alleles
    # check tags present
    for line in body:
        fields = line.split("\t")
        tags = {f.split(":", 1)[0] for f in fields[11:]}
        assert {"RG", "ta", "tc", "ac", "sc", "ic", "se"} <= tags
    # allele sequences recover the two simulated alleles (low error, cov 12)
    seqs = sorted((line.split("\t")[9] for line in body), key=len)
    a_short, a_long = sorted(het_fixture["alleles"], key=len)
    # offsets: region queried with offset 1,0 -> one extra left base
    assert abs(len(seqs[0]) - (len(a_short) + 1)) <= 3
    assert abs(len(seqs[1]) - (len(a_long) + 1)) <= 3


def test_assemble_fasta_output_shape(het_fixture):
    params = _params(is_fa=True)
    out = io.StringIO()
    assemble(het_fixture["bam"], het_fixture["bed"], "", False, params, out=out)
    lines = [l for l in out.getvalue().split("\n") if l]
    assert not any(l.startswith("@") for l in lines)
    headers = [l for l in lines if l.startswith(">")]
    assert len(headers) == 2
    assert headers[0].startswith(">S1#chr1:1500-1560#0#")
    assert headers[1].startswith(">S1#chr1:1500-1560#1#")


def test_assemble_with_realignment(het_fixture):
    params = _params()
    out = io.StringIO()
    assemble(het_fixture["bam"], het_fixture["bed"], het_fixture["fa"],
             False, params, out=out)
    body = [l for l in out.getvalue().rstrip("\n").split("\n")
            if not l.startswith("@")]
    assert len(body) == 2


def test_assemble_max_alleles_one(het_fixture):
    params = _params(max_alleles=1)
    out = io.StringIO()
    assemble(het_fixture["bam"], het_fixture["bed"], "", False, params, out=out)
    body = [l for l in out.getvalue().rstrip("\n").split("\n")
            if not l.startswith("@")]
    assert len(body) == 1


def test_assemble_max_cov_skip(het_fixture, capsys):
    params = _params(max_cov=5)
    out = io.StringIO()
    assemble(het_fixture["bam"], het_fixture["bed"], "", False, params, out=out)
    body = [l for l in out.getvalue().rstrip("\n").split("\n")
            if l and not l.startswith("@")]
    assert body == []


def test_assemble_threads_pool_identical(het_fixture, monkeypatch):
    """-t paths produce byte-identical output: threaded prepare (default)
    and the opt-in jax-free finish process pool (OTTER_TPU_FINISH_POOL=1)."""
    base_params = _params()
    out1 = io.StringIO()
    assemble(het_fixture["bam"], het_fixture["bed"], "", False, base_params,
             out=out1)
    params = _params(device="cpu", threads=3)
    out2 = io.StringIO()
    assemble(het_fixture["bam"], het_fixture["bed"], "", False, params,
             out=out2)
    assert out1.getvalue() == out2.getvalue()
    monkeypatch.setenv("OTTER_TPU_FINISH_POOL", "1")
    out3 = io.StringIO()
    assemble(het_fixture["bam"], het_fixture["bed"], "", False, params,
             out=out3)
    assert out1.getvalue() == out3.getvalue()


def test_assemble_device_poa_identical(het_fixture, monkeypatch):
    """OTTER_TPU_POA_DEVICE=1 (jnp heaviest-path DP, ops/poa_device.py)
    produces byte-identical output to the host oracle."""
    base_params = _params()
    out1 = io.StringIO()
    assemble(het_fixture["bam"], het_fixture["bed"], "", False, base_params,
             out=out1)
    monkeypatch.setenv("OTTER_TPU_POA_DEVICE", "1")
    params = _params(device="cpu")
    out2 = io.StringIO()
    assemble(het_fixture["bam"], het_fixture["bed"], "", False, params,
             out=out2)
    assert out1.getvalue() == out2.getvalue()
