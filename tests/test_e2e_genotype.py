"""End-to-end genotype test: assemble 3 samples -> merge -> joint VCF
(BASELINE.json config 4 analog), plus wgat/vcf2mat/compare coverage."""

import io
import random

import pytest

from otter_tpu.config import OtterOpts
from otter_tpu.io.bam import parse_sam_to_bam
from otter_tpu.io.bai import index_bam
from otter_tpu.models.assemble import assemble
from otter_tpu.models.genotype import genotype
from otter_tpu.models.vcf2mat import vcf2mat

from fixtures import make_reference, simulate_region_bam, write_fasta


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cohort")
    rng = random.Random(321)
    ref = make_reference(rng, length=3000, repeat="CAG", repeat_at=1500,
                         repeat_units=20)
    start, end = 1500, 1560
    region_seq = ref[start:end]
    long_allele = "CAG" * 32
    fa = str(tmp / "ref.fa")
    write_fasta(fa, [("chr1", ref)])
    bed = str(tmp / "regions.bed")
    with open(bed, "w") as fh:
        fh.write(f"chr1\t{start}\t{end}\n")

    sample_allele_pairs = {
        "S1": [region_seq, region_seq],       # hom ref
        "S2": [region_seq, long_allele],      # het
        "S3": [long_allele, long_allele],     # hom alt
    }
    sam_texts = []
    for si, (sample, alleles) in enumerate(sample_allele_pairs.items()):
        bam = str(tmp / f"{sample}.reads.bam")
        simulate_region_bam(bam, "chr1", ref, (start, end), alleles,
                            per_allele_cov=10, error_rate=0.002, seed=40 + si)
        params = OtterOpts()
        params.read_group = sample
        params.device = "host"
        out = io.StringIO()
        assemble(bam, bed, "", False, params, out=out)
        sam_texts.append(out.getvalue())
    # merge: shared header from first + all body lines (samtools merge analog)
    merged_lines = []
    for i, text in enumerate(sam_texts):
        for line in text.rstrip("\n").split("\n"):
            if line.startswith("@"):
                if i == 0 or line.startswith("@RG"):
                    merged_lines.append(line)
            else:
                merged_lines.append(line)
    # put all @RG lines before the body, like samtools merge does
    hdr = [l for l in merged_lines if l.startswith("@")]
    body = [l for l in merged_lines if not l.startswith("@")]
    merged_bam = str(tmp / "cohort.bam")
    parse_sam_to_bam("\n".join(hdr + body) + "\n", merged_bam)
    index_bam(merged_bam)
    return {"bam": merged_bam, "fa": fa, "bed": bed, "tmp": tmp,
            "region_seq": region_seq, "long": long_allele}


def test_genotype_vcf(cohort):
    params = OtterOpts()
    params.max_error = 0.025
    params.max_cosdis = 0.025
    out = io.StringIO()
    genotype(params, cohort["bam"], cohort["bed"], cohort["fa"], out=out)
    text = out.getvalue()
    lines = text.rstrip("\n").split("\n")
    header = [l for l in lines if l.startswith("##")]
    assert "##fileformat=VCFv4.2" in header
    assert any(l.startswith("##contig=<ID=chr1") for l in header)
    chrom_line = [l for l in lines if l.startswith("#CHROM")][0]
    assert chrom_line.endswith("S1\tS2\tS3")
    records = [l for l in lines if not l.startswith("#")]
    assert len(records) == 1
    f = records[0].split("\t")
    assert f[0] == "chr1"
    assert f[1] == "1500"  # 1 + start - offset_l(1)
    assert f[2] == "chr1:1500-1560"
    fmt = f[8]
    assert fmt == "GT:PS:HP:TC:AC:SC:SE"
    gts = [s.split(":")[0] for s in f[9:12]]
    # S1 hom-ref, S2 het, S3 hom-alt
    assert gts[0] == "0/0"
    assert sorted(gts[1].split("/")) == ["0", "1"]
    assert gts[2] == "1/1"
    assert f[4] != "."  # one ALT allele
    assert "HSD=" in f[7]


def test_genotype_no_reference_tsv(cohort):
    params = OtterOpts()
    out = io.StringIO()
    genotype(params, cohort["bam"], cohort["bed"], "", out=out)
    lines = out.getvalue().rstrip("\n").split("\n")
    assert len(lines) == 3
    for line in lines:
        f = line.split("\t")
        assert f[0] == "chr1:1500-1560"
        assert int(f[2]) <= int(f[3])


def test_vcf2mat(cohort, tmp_path):
    params = OtterOpts()
    out = io.StringIO()
    genotype(params, cohort["bam"], cohort["bed"], cohort["fa"], out=out)
    vcf_path = str(tmp_path / "c.vcf")
    with open(vcf_path, "w") as fh:
        fh.write(out.getvalue())
    mat_out = io.StringIO()
    vcf2mat(params, cohort["bed"], vcf_path, 3, out=mat_out)
    rows = mat_out.getvalue().rstrip("\n").split("\n")
    assert len(rows) == 2  # REF + 1 ALT
    for i, row in enumerate(rows):
        f = row.split("\t")
        assert f[0] == "chr1:1500-1560"
        assert int(f[1]) == i
        assert 0.0 <= float(f[2]) <= 1.0  # GC
        assert len(f) == 5 + 4 ** 3 + 1  # region, idx, gc, len, hsd + 65 kmers


def test_native_analleles_feeder_parity(tmp_path):
    """The C++ allele feeder must reproduce the python parse_anallele walk
    field-for-field, including missing tags, empty-seq -> 'N', and
    ta-mismatch drops. Ref: anseqs.cpp:462-524."""
    import random

    from fixtures import make_bam, read_record
    from otter_tpu.config import OtterOpts
    from otter_tpu.io.bai import index_bam
    from otter_tpu.io.bam import BAM_CMATCH, BamReader
    from otter_tpu.io.bed import BED
    from otter_tpu.seqs.extract import parse_analleles

    rng = random.Random(13)
    region = "chr1:500-600"
    records = []
    for i in range(12):
        seq = "".join(rng.choice("ACGT") for _ in range(rng.randrange(5, 80)))
        tags = [("ta", "Z", region), ("RG", "Z", f"S{i % 3}")]
        if i % 2 == 0:
            tags += [("tc", "i", 7 + i), ("ac", "i", 3), ("sc", "i", 2),
                     ("se", "f", 0.125), ("ic", "i", 2)]
        if i % 3 == 0:
            tags += [("PS", "i", 42), ("HP", "i", 1 + i % 2)]
        if i == 5:
            tags[0] = ("ta", "Z", "chr1:999-1000")  # wrong region: dropped
        records.append(read_record(f"a{i}", 0, 500, seq,
                                   [(len(seq), BAM_CMATCH)], tags=tags))
    bam_path = str(tmp_path / "alleles.bam")
    extra = "\n".join(f"@RG\tID:S{s}" for s in range(3))
    make_bam(bam_path, [("chr1", 2000)], records, pg_of="1,0",
             extra_header=extra)
    index_bam(bam_path)
    s2i = {f"S{s}": s for s in range(3)}
    bed = BED("chr1", 500, 600)
    rd = BamReader(bam_path, load_index=True)
    ph = OtterOpts()
    ph.device = "host"
    blk_h, idx_h = parse_analleles(ph, rd, bed, s2i)
    pa = OtterOpts()  # device=auto -> native feeder
    blk_n, idx_n = parse_analleles(pa, rd, bed, s2i)
    rd.close()
    assert idx_h == idx_n
    assert len(blk_h) == len(blk_n) == 11
    for a, b in zip(blk_h, blk_n):
        assert (a.seq, a.scov, a.acov, a.tcov, a.se, a.ic,
                a.hpt.ps, a.hpt.hp) == \
               (b.seq, b.scov, b.acov, b.tcov, b.se, b.ic,
                b.hpt.ps, b.hpt.hp)
