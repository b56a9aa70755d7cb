#!/usr/bin/env python
"""Self-contained demo of the full otter-tpu workflow on synthetic data.

Generates a reference FASTA + three samples of simulated HiFi-like reads over
tandem-repeat regions (indexed BAMs written by the framework's own writers),
then runs the complete pipeline via the CLI code paths:

  assemble (per sample, SAM)  ->  merge (our samtools-free BAM writer)
  -> genotype (joint VCF)     ->  vcf2mat (feature matrix)
  -> wgat on a simulated assembly  ->  compare (eval TSV)

Usage:  python examples/demo.py [outdir]
"""

import io
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))


def main(outdir: str = "demo_out") -> None:
    os.makedirs(outdir, exist_ok=True)
    # preflight: never let the demo hang on a dead accelerator tunnel
    # (process-level jax init can stall for minutes; see utils/preflight.py)
    from otter_tpu.utils.preflight import wait_for_device
    if wait_for_device(retries=1, timeout_s=45, sleep_s=5) not in \
            ("tpu", "axon"):
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        os.environ["JAX_PLATFORMS"] = "cpu"
    from fixtures import make_reference, simulate_region_bam, write_fasta, \
        make_bam, read_record
    from otter_tpu.config import OtterOpts
    from otter_tpu.io.bai import index_bam
    from otter_tpu.io.bam import parse_sam_to_bam, BAM_CMATCH
    from otter_tpu.models.assemble import assemble
    from otter_tpu.models.genotype import genotype
    from otter_tpu.models.vcf2mat import vcf2mat
    from otter_tpu.models.wgat import wgat
    from otter_tpu.models.compare import compare

    rng = random.Random(42)
    ref = make_reference(rng, length=6000, repeat="CAG", repeat_at=3000,
                         repeat_units=20)
    start, end = 3000, 3060
    fa = os.path.join(outdir, "ref.fa")
    write_fasta(fa, [("chr1", ref)])
    bed = os.path.join(outdir, "regions.bed")
    with open(bed, "w") as fh:
        fh.write(f"chr1\t{start}\t{end}\n")

    ref_allele = ref[start:end]
    alt_allele = "CAG" * 30
    genotypes = {"S1": [ref_allele, ref_allele],
                 "S2": [ref_allele, alt_allele],
                 "S3": [alt_allele, alt_allele]}

    sam_texts = []
    for i, (sample, alleles) in enumerate(genotypes.items()):
        bam = os.path.join(outdir, f"{sample}.reads.bam")
        simulate_region_bam(bam, "chr1", ref, (start, end), alleles,
                            per_allele_cov=12, error_rate=0.005, seed=7 + i)
        params = OtterOpts()
        params.read_group = sample
        out = io.StringIO()
        assemble(bam, bed, fa, False, params, out=out)
        with open(os.path.join(outdir, f"{sample}.otter.sam"), "w") as fh:
            fh.write(out.getvalue())
        sam_texts.append(out.getvalue())
        print(f"[demo] assembled {sample}")

    # merge (samtools-free)
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
    merged = os.path.join(outdir, "cohort.bam")
    parse_sam_to_bam("\n".join(hdr + body) + "\n", merged)
    index_bam(merged)
    print("[demo] merged cohort BAM")

    params = OtterOpts()
    out = io.StringIO()
    genotype(params, merged, bed, fa, out=out)
    vcf = os.path.join(outdir, "cohort.vcf")
    with open(vcf, "w") as fh:
        fh.write(out.getvalue())
    print("[demo] joint VCF:")
    for line in out.getvalue().rstrip("\n").split("\n"):
        if not line.startswith("##"):
            print("   ", line[:110])

    out = io.StringIO()
    vcf2mat(params, bed, vcf, 3, out=out)
    with open(os.path.join(outdir, "features.tsv"), "w") as fh:
        fh.write(out.getvalue())
    print(f"[demo] vcf2mat -> {len(out.getvalue().splitlines())} feature rows")

    # simulated whole-genome assembly alignment -> wgat
    asm_seq = ref[:start] + alt_allele + ref[end:]
    cig = [(start, BAM_CMATCH)]
    if len(alt_allele) >= end - start:
        cig.append((end - start, BAM_CMATCH))
        if len(alt_allele) > end - start:
            cig.append((len(alt_allele) - (end - start), 1))
    cig.append((len(ref) - end, BAM_CMATCH))
    asm_bam = os.path.join(outdir, "assembly.bam")
    make_bam(asm_bam, [("chr1", len(ref))],
             [read_record("contig_1", 0, 0, asm_seq, cig)])
    params = OtterOpts()
    params.read_group = "ASM"
    out = io.StringIO()
    wgat(params, asm_bam, bed, out=out)
    wgat_sam = os.path.join(outdir, "assembly.otter.sam")
    with open(wgat_sam, "w") as fh:
        fh.write(out.getvalue())
    print("[demo] wgat emitted",
          sum(1 for l in out.getvalue().splitlines() if not l.startswith("@")),
          "alleles")

    # compare S2's assembly against the wgat truth
    truth_bam = os.path.join(outdir, "assembly.otter.bam")
    parse_sam_to_bam(out.getvalue(), truth_bam)
    index_bam(truth_bam)
    s2_bam = os.path.join(outdir, "S2.otter.bam")
    parse_sam_to_bam(sam_texts[1], s2_bam)
    index_bam(s2_bam)
    out = io.StringIO()
    compare(params, bed, truth_bam, s2_bam, out=out)
    print("[demo] compare TSV:")
    for line in out.getvalue().rstrip("\n").split("\n"):
        print("   ", line)
    print(f"[demo] all outputs in {outdir}/")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "demo_out")
