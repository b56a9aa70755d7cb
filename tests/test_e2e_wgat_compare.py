"""wgat and compare workload tests."""

import io
import random

import pytest

from otter_tpu.config import OtterOpts
from otter_tpu.io.bam import (
    BAM_CDEL,
    BAM_CINS,
    BAM_CMATCH,
    BAM_CSOFT_CLIP,
    parse_sam_to_bam,
)
from otter_tpu.io.bai import index_bam
from otter_tpu.models.compare import compare
from otter_tpu.models.wgat import wgat

from fixtures import make_bam, make_reference, read_record


@pytest.fixture(scope="module")
def wga_fixture(tmp_path_factory):
    """A 'whole-genome assembly' BAM: one long contig alignment covering two
    BED regions, one spanning cleanly and one hit by a deletion."""
    tmp = tmp_path_factory.mktemp("wga")
    rng = random.Random(77)
    ref = make_reference(rng, length=5000, repeat="AT", repeat_at=2000,
                         repeat_units=30)
    # contig aligned from 1000..4000, with a 20bp deletion at ref 2500
    seq_a = ref[1000:2500]
    seq_b = ref[2520:4000]
    contig = seq_a + seq_b
    cigar = [(1500, BAM_CMATCH), (20, BAM_CDEL), (1480, BAM_CMATCH)]
    recs = [read_record("contig_1", 0, 1000, contig, cigar)]
    bam = str(tmp / "assembly.bam")
    make_bam(bam, [("chr1", 5000)], recs)
    bed = str(tmp / "regions.bed")
    with open(bed, "w") as fh:
        fh.write("chr1\t2000\t2060\n")   # clean region (repeat)
        fh.write("chr1\t2490\t2530\n")   # overlaps the deletion
        fh.write("chr1\t4500\t4600\n")   # outside the alignment
    return {"bam": bam, "bed": bed, "ref": ref}


def test_wgat_sam(wga_fixture):
    params = OtterOpts()
    params.read_group = "ASM1"
    out = io.StringIO()
    wgat(params, wga_fixture["bam"], wga_fixture["bed"], out=out)
    lines = out.getvalue().rstrip("\n").split("\n")
    hdr = [l for l in lines if l.startswith("@")]
    body = [l for l in lines if not l.startswith("@")]
    assert "@SQ\tSN:chr1\tLN:5000" in hdr
    assert "@PG\tID:otter\tOF:1,0" in hdr
    # two regions overlapped by the contig produce two allele lines
    assert len(body) == 2
    names = [l.split("\t")[0] for l in body]
    assert names[0].startswith("contig_1#chr1:2000-2060_")
    assert names[1].startswith("contig_1#chr1:2490-2530_")
    # clean region: extracted sequence matches reference around the region
    seq0 = body[0].split("\t")[9]
    ref = wga_fixture["ref"]
    assert seq0 == ref[1999:2060]  # offset 1,0 widens left by 1
    # deletion region: 20bp deleted from the middle
    seq1 = body[1].split("\t")[9]
    assert len(seq1) == (2530 - 2489) - 20
    # sp tag present with value b
    assert "sp:A:b" in body[0]


def test_wgat_fasta(wga_fixture):
    params = OtterOpts()
    params.read_group = "ASM1"
    params.is_fa = True
    out = io.StringIO()
    wgat(params, wga_fixture["bam"], wga_fixture["bed"], out=out)
    lines = [l for l in out.getvalue().split("\n") if l]
    assert len([l for l in lines if l.startswith(">")]) == 2
    # stdout_fa prints read_group first (wgat.cpp:112 passes the read group
    # as the FASTA name and contig#region#idx as the region)
    assert lines[0].startswith(">ASM1#contig_1#chr1:2000-2060#0#")


def _otter_bam_from_alleles(tmp_path, name, alleles_by_region, sample):
    """Build an otter-style BAM (ta/RG tags) directly."""
    lines = ["@SQ\tSN:chr1\tLN:10000", f"@RG\tID:{sample}",
             "@PG\tID:otter\tOF:1,0"]
    for (region, start), allele_list in alleles_by_region.items():
        for i, (seq, sp) in enumerate(allele_list):
            lines.append(
                f"chr1:{region}_{i}\t0\tchr1\t{start}\t0\t{len(seq)}M\t*\t0\t0\t"
                f"{seq}\t{'!' * len(seq)}\tRG:Z:{sample}\tta:Z:chr1:{region}\t"
                f"tc:i:10\tac:i:5\tsc:i:5\tsp:A:{sp}\tic:i:2\tse:f:0")
    p = str(tmp_path / name)
    parse_sam_to_bam("\n".join(lines) + "\n", p)
    index_bam(p)
    return p


def test_compare(tmp_path):
    truth = _otter_bam_from_alleles(
        tmp_path, "truth.bam",
        {("100-200", 100): [("ACGTACGTAC", "b"), ("ACGTTTTTAC", "b")]},
        "T1")
    query = _otter_bam_from_alleles(
        tmp_path, "query.bam",
        {("100-200", 100): [("ACGTACGTAC", "b"), ("ACGTTTTGAC", "b")]},
        "Q1")
    bed = str(tmp_path / "r.bed")
    with open(bed, "w") as fh:
        fh.write("chr1\t100\t200\n")
    params = OtterOpts()
    out = io.StringIO()
    compare(params, bed, truth, query, out=out)
    rows = out.getvalue().rstrip("\n").split("\n")
    assert len(rows) == 2
    r0 = rows[0].split("\t")
    assert r0[0] == "chr1:100-200"
    assert r0[4] == "0"  # exact match edge first
    r1 = rows[1].split("\t")
    assert r1[4] == "1"  # second allele differs by 1 edit


def test_wgat_non_bam_warns_and_emits_nothing(tmp_path, capsys):
    """Reference behavior: non-.bam wgat input is a no-op (wgat.cpp:164-177);
    we add a stderr warning (PARITY.md divergence)."""
    import io

    from otter_tpu.config import OtterOpts
    from otter_tpu.models.wgat import wgat

    fa = tmp_path / "asm.fa"
    fa.write_text(">ctg1\nACGTACGT\n")
    bed = tmp_path / "r.bed"
    bed.write_text("chr1\t10\t20\n")
    p = OtterOpts()
    p.read_group = "S1"
    out = io.StringIO()
    wgat(p, str(fa), str(bed), out=out)
    assert out.getvalue() == ""
    err = capsys.readouterr().err
    assert "WARNING" in err and "unsupported input" in err


def test_wgat_threaded_identical(tmp_path):
    """-t 4 wgat (contig thread pool, per-thread readers, contig-ordered
    emission) is byte-identical to -t 1. Ref: wgat.cpp:148."""
    rng = random.Random(9)
    refs = []
    recs = []
    bed_lines = []
    for c in range(4):
        name = f"chr{c + 1}"
        ref = "".join(rng.choice("ACGT") for _ in range(3000))
        refs.append((name, 3000))
        contig = ref[200:2800]
        recs.append(read_record(f"ctg_{c}", c, 200, contig,
                                [(len(contig), BAM_CMATCH)]))
        for r in range(3):
            s = 500 + 600 * r
            bed_lines.append(f"{name}\t{s}\t{s + 80}\n")
    tmp = tmp_path
    bam = str(tmp / "asm_multi.bam")
    make_bam(bam, refs, recs)
    bed = str(tmp / "rois.bed")
    with open(bed, "w") as fh:
        fh.writelines(bed_lines)
    outs = {}
    for t in (1, 4):
        p = OtterOpts()
        p.read_group = "ASM1"
        p.init_threads(t)
        out = io.StringIO()
        wgat(p, bam, bed, out=out)
        outs[t] = out.getvalue()
    assert outs[1] == outs[4]
    body = [l for l in outs[1].splitlines()
            if l and not l.startswith("@")]
    assert len(body) == 12  # 4 contigs x 3 regions, all spanning


def test_compare_pooled_matches_host(tmp_path):
    """The pooled-engine compare path (VERDICT r3 #3: one batched distance
    dispatch + batched composite DP) must emit a TSV byte-identical to the
    scalar host path, across special cases (N/NDNNN, equal seqs, pure
    indels) and many regions."""
    rng = random.Random(4242)

    def acgt(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    def mut(s, rate):
        o = []
        for ch in s:
            x = rng.random()
            if x < rate * 0.4:
                o.append(rng.choice([b for b in "ACGT" if b != ch]))
            elif x < rate * 0.7:
                o.extend([ch, rng.choice("ACGT")])
            elif x < rate:
                pass
            else:
                o.append(ch)
        return "".join(o)

    truth_by_region = {}
    query_by_region = {}
    bed_rows = []
    start = 100
    for r in range(30):
        region = f"{start}-{start + 60}"
        base = acgt(rng.randint(40, 400))
        kind = r % 6
        if kind == 0:    # identical pair
            t = [(base, "b"), (base + "ACG", "b")]
            q = [(base, "b"), (base + "ACG", "b")]
        elif kind == 1:  # N/NDNNN special cases
            t = [("N", "b"), (base, "b")]
            q = [("NDNNN", "b"), (mut(base, 0.02), "b")]
        elif kind == 2:  # pure-indel difference (d == m-n shortcut)
            t = [(base, "b"), (base + "CAGCAGCAG", "l")]
            q = [(base + "CAG", "b")]
        elif kind == 3:  # high divergence (wide band)
            t = [(base, "b"), (mut(base, 0.5), "b")]
            q = [(mut(base, 0.3), "b"), (acgt(len(base)), "b")]
        else:            # typical small-divergence assemblies
            t = [(base, "b"), (mut(base, 0.05), "r")]
            q = [(mut(base, 0.01), "b"), (mut(base, 0.03), "b")]
        truth_by_region[(region, start)] = t
        query_by_region[(region, start)] = q
        bed_rows.append(f"chr1\t{start}\t{start + 60}\n")
        start += 200
    truth = _otter_bam_from_alleles(tmp_path, "truth_many.bam",
                                    truth_by_region, "T1")
    query = _otter_bam_from_alleles(tmp_path, "query_many.bam",
                                    query_by_region, "Q1")
    bed = str(tmp_path / "many.bed")
    with open(bed, "w") as fh:
        fh.writelines(bed_rows)

    outs = {}
    for device in ("host", "auto"):
        params = OtterOpts()
        params.device = device
        out = io.StringIO()
        compare(params, bed, truth, query, out=out)
        outs[device] = out.getvalue()
    assert outs["auto"] == outs["host"]
    assert outs["host"].count("\n") >= 40  # the fixture actually emits
