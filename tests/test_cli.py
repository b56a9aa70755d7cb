"""CLI smoke tests: subcommand routing, flags/defaults parity, version."""

import io
import random
import sys

import pytest

from otter_tpu import OTTER_VERSION
from otter_tpu.cli.main import main

from fixtures import make_reference, simulate_region_bam, write_fasta


def test_version(capsys):
    assert main(["version"]) == 0
    assert capsys.readouterr().out.strip() == OTTER_VERSION


def test_help_listing(capsys):
    assert main([]) == 0
    out = capsys.readouterr().out
    # hidden commands not in help (main.cpp:11-17)
    assert "assemble" in out and "genotype" in out and "wgat" in out
    assert "vcf2mat" not in out and "compare" not in out


def test_unknown_command(capsys):
    assert main(["frobnicate"]) == 0
    assert "Usage" in capsys.readouterr().out


def test_assemble_cli(tmp_path, capsys, monkeypatch):
    rng = random.Random(3)
    ref = make_reference(rng, length=3000, repeat="CAG", repeat_at=1500,
                         repeat_units=20)
    start, end = 1500, 1560
    bam = str(tmp_path / "r.bam")
    simulate_region_bam(bam, "chr1", ref, (start, end),
                        [ref[start:end]], per_allele_cov=6,
                        error_rate=0.002, seed=4)
    bed = str(tmp_path / "r.bed")
    with open(bed, "w") as fh:
        fh.write(f"chr1\t{start}\t{end}\n")
    rc = main(["assemble", "-b", bed, "-R", "S1", "--fasta",
               "--device", "host", bam])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith(">S1#chr1:1500-1560#0#")


def test_assemble_missing_bed(tmp_path, capsys):
    rc = main(["assemble", "-R", "S1", "--device", "host", "x.bam"])
    assert rc == 1


def test_assemble_no_inputs_prints_help(capsys):
    assert main(["assemble"]) == 0
    assert "usage" in capsys.readouterr().out.lower()


def test_bandwidth_short_flag_is_h(tmp_path, capsys):
    """-h binds to --bandwidth like the reference (command_assemble.cpp:42)."""
    rng = random.Random(3)
    ref = make_reference(rng, length=3000, repeat="CAG", repeat_at=1500,
                         repeat_units=20)
    bam = str(tmp_path / "r.bam")
    simulate_region_bam(bam, "chr1", ref, (1500, 1560), [ref[1500:1560]],
                        per_allele_cov=6, error_rate=0.002, seed=4)
    bed = str(tmp_path / "r.bed")
    with open(bed, "w") as fh:
        fh.write("chr1\t1500\t1560\n")
    rc = main(["assemble", "-b", bed, "-R", "S1", "--fasta", "-h", "0.02",
               "--device", "host", bam])
    assert rc == 0


def test_assemble_resume_skips_completed(tmp_path, capsys):
    rng = random.Random(44)
    ref = make_reference(rng, length=6000, repeat="CAG", repeat_at=1500,
                         repeat_units=20)
    bam = str(tmp_path / "r.bam")
    from fixtures import make_bam, read_record
    from otter_tpu.io.bam import BAM_CMATCH
    recs = []
    regions = [(1500, 1560), (3000, 3060)]
    for r, (start, end) in enumerate(regions):
        for c in range(5):
            seq = ref[start - 150 : end + 150]
            recs.append(read_record(f"x{r}_{c}", 0, start - 150, seq,
                                    [(len(seq), BAM_CMATCH)],
                                    tags=[("rq", "f", 0.99)]))
    make_bam(bam, [("chr1", len(ref))], recs)
    bed = str(tmp_path / "r.bed")
    with open(bed, "w") as fh:
        for start, end in regions:
            fh.write(f"chr1\t{start}\t{end}\n")
    # full run captured as "partial" containing only the first region
    rc = main(["assemble", "-b", bed, "-R", "S1", "--device", "host", bam])
    assert rc == 0
    full = capsys.readouterr().out
    partial = str(tmp_path / "partial.sam")
    with open(partial, "w") as fh:
        for line in full.split("\n"):
            if line.startswith("@") or "ta:Z:chr1:1500-1560" in line:
                fh.write(line + "\n")
    rc = main(["assemble", "-b", bed, "-R", "S1", "--device", "host",
               "--resume", partial, bam])
    assert rc == 0
    resumed = capsys.readouterr().out
    body = [l for l in resumed.split("\n") if l and not l.startswith("@")]
    assert all("ta:Z:chr1:3000-3060" in l for l in body)
    assert len(body) >= 1


def test_genotype_wgat_compare_vcf2mat_cli(tmp_path, capsys):
    """CLI-level smoke for the remaining subcommands on a tiny cohort."""
    import io as iomod
    from otter_tpu.config import OtterOpts
    from otter_tpu.models.assemble import assemble as assemble_api
    from otter_tpu.io.bam import parse_sam_to_bam, BAM_CMATCH
    from otter_tpu.io.bai import index_bam
    from fixtures import make_bam, read_record, write_fasta

    rng = random.Random(77)
    ref = make_reference(rng, length=3000, repeat="CAG", repeat_at=1500,
                         repeat_units=20)
    start, end = 1500, 1560
    fa = str(tmp_path / "ref.fa")
    write_fasta(fa, [("chr1", ref)])
    bed = str(tmp_path / "r.bed")
    with open(bed, "w") as fh:
        fh.write(f"chr1\t{start}\t{end}\n")
    bam = str(tmp_path / "reads.bam")
    simulate_region_bam(bam, "chr1", ref, (start, end), [ref[start:end]],
                        per_allele_cov=8, error_rate=0.002, seed=3)
    params = OtterOpts()
    params.read_group = "S1"
    params.device = "host"
    buf = iomod.StringIO()
    assemble_api(bam, bed, "", False, params, out=buf)
    otter_bam = str(tmp_path / "S1.otter.bam")
    parse_sam_to_bam(buf.getvalue(), otter_bam)
    index_bam(otter_bam)

    # genotype CLI
    rc = main(["genotype", "-b", bed, "-r", fa, "--device", "cpu", otter_bam])
    assert rc == 0
    vcf_text = capsys.readouterr().out
    assert "##fileformat=VCFv4.2" in vcf_text
    vcf = str(tmp_path / "c.vcf")
    with open(vcf, "w") as fh:
        fh.write(vcf_text)

    # vcf2mat CLI
    rc = main(["vcf2mat", "-b", bed, vcf])
    assert rc == 0
    assert capsys.readouterr().out.count("\n") >= 1

    # wgat CLI on a simulated assembly
    asm_seq = ref
    asm_bam = str(tmp_path / "asm.bam")
    make_bam(asm_bam, [("chr1", len(ref))],
             [read_record("ctg1", 0, 0, asm_seq, [(len(asm_seq), BAM_CMATCH)])])
    rc = main(["wgat", "-b", bed, "-R", "ASM", asm_bam])
    assert rc == 0
    wgat_text = capsys.readouterr().out
    assert any("ta:Z:chr1:1500-1560" in l for l in wgat_text.split("\n"))

    # compare CLI (truth = wgat output, query = sample)
    truth_bam = str(tmp_path / "truth.bam")
    parse_sam_to_bam(wgat_text, truth_bam)
    index_bam(truth_bam)
    rc = main(["compare", "-b", bed, truth_bam, otter_bam])
    assert rc == 0
