#!/usr/bin/env python
"""End-to-end regions/sec benchmark: synthetic multi-region assemble.

Simulates R tandem-repeat regions (het/hom mix, HiFi-like errors, ~COV reads
each), writes an indexed BAM with the framework's own writers, then times
``assemble`` end-to-end (BAM in -> SAM alleles out) on the selected device
backend. Prints one JSON line with regions/sec.
"""

import io
import json
import os
import random
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))


def build_fixture(tmp, n_regions=100, cov=12, err=0.01, region_len=120,
                  seed=11):
    from fixtures import make_bam, read_record
    from otter_tpu.io.bam import BAM_CMATCH, BAM_CINS, BAM_CDEL

    rng = random.Random(seed)
    span = 2500
    ref_len = 1000 + n_regions * span + 2000
    ref = "".join(rng.choice("ACGT") for _ in range(ref_len))
    bed = os.path.join(tmp, "regions.bed")
    records = []
    with open(bed, "w") as fh:
        for r in range(n_regions):
            start = 1000 + r * span
            end = start + region_len
            fh.write(f"chr1\t{start}\t{end}\n")
            alleles = [ref[start:end]]
            if r % 2 == 0:
                alleles.append("CAG" * (region_len // 2 // 3 + 20))
            for a_i, allele in enumerate(alleles):
                n_reads = cov if len(alleles) == 1 else cov // 2 + 2
                for c in range(n_reads):
                    lf = rng.randint(200, 400)
                    rf = rng.randint(200, 400)
                    out = []
                    cig = []

                    def emit(op, ln):
                        if ln <= 0:
                            return
                        if cig and cig[-1][1] == op:
                            cig[-1] = (cig[-1][0] + ln, op)
                        else:
                            cig.append((ln, op))

                    def walk(piece):
                        consumed = 0
                        for ch in piece:
                            x = rng.random()
                            if x < err * 0.4:
                                out.append(rng.choice(
                                    [b for b in "ACGT" if b != ch]))
                                emit(BAM_CMATCH, 1)
                                consumed += 1
                            elif x < err * 0.7:
                                out.append(ch)
                                out.append(rng.choice("ACGT"))
                                emit(BAM_CMATCH, 1)
                                emit(BAM_CINS, 1)
                                consumed += 1
                            elif x < err:
                                emit(BAM_CDEL, 1)
                                consumed += 1
                            else:
                                out.append(ch)
                                emit(BAM_CMATCH, 1)
                                consumed += 1
                        return consumed

                    walk(ref[start - lf : start])
                    consumed = walk(allele)
                    if consumed > region_len:
                        excess = consumed - region_len
                        trimmed = []
                        need = excess
                        for ln, op in reversed(cig):
                            if need > 0 and op == BAM_CMATCH:
                                take = min(ln, need)
                                need -= take
                                if take < ln:
                                    trimmed.append((take, BAM_CINS))
                                    trimmed.append((ln - take, op))
                                else:
                                    trimmed.append((take, BAM_CINS))
                            else:
                                trimmed.append((ln, op))
                        cig[:] = list(reversed(trimmed))
                    elif consumed < region_len:
                        emit(BAM_CDEL, region_len - consumed)
                    walk(ref[end : end + rf])
                    records.append(read_record(
                        f"r{r}_{a_i}_{c}", 0, start - lf, "".join(out), cig,
                        tags=[("rq", "f", 0.999)]))
    bam = os.path.join(tmp, "reads.bam")
    make_bam(bam, [("chr1", ref_len)], records)
    from fixtures import write_fasta

    write_fasta(os.path.join(tmp, "ref.fa"), [("chr1", ref)])
    return bam, bed


def run(device, bam, bed):
    from otter_tpu.config import OtterOpts
    from otter_tpu.models.assemble import assemble

    params = OtterOpts()
    params.read_group = "S1"
    params.device = device
    out = io.StringIO()
    t0 = time.perf_counter()
    assemble(bam, bed, "", False, params, out=out)
    dt = time.perf_counter() - t0
    return dt, out.getvalue()


def bench_genotype(tmp, bam, bed, n_regions, n_samples=3):
    """North-star second half: joint genotyping regions/sec. Builds a
    cohort with the framework's own pipeline (assemble per sample on the
    device path -> samtools-free merge -> indexed BAM), then times
    ``genotype`` (multi-sample VCF with the reference allele)."""
    from otter_tpu.config import OtterOpts
    from otter_tpu.io.bai import index_bam
    from otter_tpu.io.bam import parse_sam_to_bam
    from otter_tpu.models.assemble import assemble
    from otter_tpu.models.genotype import genotype

    sam_texts = []
    for si in range(n_samples):
        params = OtterOpts()
        params.read_group = f"S{si + 1}"
        params.device = "auto"
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
    merged_bam = os.path.join(tmp, "cohort.bam")
    parse_sam_to_bam("\n".join(hdr + body) + "\n", merged_bam)
    index_bam(merged_bam)
    fa = os.path.join(tmp, "ref.fa")

    def run_gt():
        params = OtterOpts()
        params.read_group = "S1"
        out = io.StringIO()
        t0 = time.perf_counter()
        genotype(params, merged_bam, bed, fa, out=out)
        return time.perf_counter() - t0, out.getvalue()

    run_gt()  # warm
    best = min(run_gt()[0] for _ in range(2))
    dt, vcf_text = run_gt()
    best = min(best, dt)
    vcf_rows = sum(1 for l in vcf_text.splitlines()
                   if l and not l.startswith("#"))
    return {"genotype_regions_per_sec": round(n_regions / best, 2),
            "genotype_vcf_rows": vcf_rows,
            "genotype_samples": n_samples}


def build_cohort_fixture(tmp, n_samples=64, n_regions=32, seed=5):
    """Directly fabricate a merged cohort BAM (otter-SAM allele records
    with per-sample @RG tags) — the joint-genotype input shape of
    genotype.cpp:173-192 at real cohort scale, without paying n_samples
    assemble runs."""
    from fixtures import make_bam, read_record, write_fasta
    from otter_tpu.io.bai import index_bam
    from otter_tpu.io.bam import BAM_CMATCH

    rng = random.Random(seed)
    span = 2500
    ref_len = 1000 + n_regions * span + 2000
    ref = "".join(rng.choice("ACGT") for _ in range(ref_len))
    bed = os.path.join(tmp, "cohort_regions.bed")
    records = []
    with open(bed, "w") as fh:
        for r in range(n_regions):
            start = 1000 + r * span
            end = start + 120
            fh.write(f"chr1\t{start}\t{end}\n")
            region = f"chr1:{start}-{end}"
            base = ref[start:end]
            exp = base + "CAG" * rng.randrange(10, 30)
            for s in range(n_samples):
                for hap, seq in enumerate((base, exp) if s % 2 else
                                          (base, base)):
                    sv = list(seq)
                    for _ in range(rng.randrange(0, 3)):
                        p = rng.randrange(len(sv))
                        sv[p] = rng.choice("ACGT")
                    records.append(read_record(
                        f"a{r}_{s}_{hap}", 0, start, "".join(sv),
                        [(len(sv), BAM_CMATCH)],
                        tags=[("ta", "Z", region), ("RG", "Z", f"S{s}"),
                              ("tc", "i", 20), ("ac", "i", 10),
                              ("sc", "i", 8), ("se", "f", 0.01),
                              ("ic", "i", 1)]))
    bam = os.path.join(tmp, "cohort64.bam")
    extra = "\n".join(f"@RG\tID:S{s}" for s in range(n_samples))
    make_bam(bam, [("chr1", ref_len)], records, pg_of="1,0",
             extra_header=extra)
    index_bam(bam)
    fa = os.path.join(tmp, "cohort_ref.fa")
    write_fasta(fa, [("chr1", ref)])
    return bam, bed, fa


def bench_genotype_cohort(tmp, n_samples=64, n_regions=32):
    """Cohort-scale joint genotyping (n = 2*samples+1 allele matrices per
    region — the regime the reference's genotype scaling story is about,
    otterclust.cpp:367-420). Times the batched pipeline and asserts the
    VCF byte-identical to the sequential pure-host oracle."""
    from otter_tpu.config import OtterOpts
    from otter_tpu.models.genotype import genotype

    bam, bed, fa = build_cohort_fixture(tmp, n_samples, n_regions)

    def run_gt(device):
        params = OtterOpts()
        params.device = device
        out = io.StringIO()
        t0 = time.perf_counter()
        genotype(params, bam, bed, fa, out=out)
        return time.perf_counter() - t0, out.getvalue()

    run_gt("auto")  # warm
    best = min(run_gt("auto")[0] for _ in range(2))
    _dt_host, vcf_host = run_gt("host")
    dt, vcf = run_gt("auto")
    best = min(best, dt)
    return {"genotype64_regions_per_sec": round(n_regions / best, 2),
            "genotype64_samples": n_samples,
            "genotype64_vcf_identical": vcf == vcf_host}


def build_ont_fixture(tmp, n_regions=16, err=0.06, cov=18, expansion=720,
                      seed=42):
    """BASELINE's ONT stress shape: 2.3 kb het expansions at ~6% read
    error — the gap-affine consensus regime (94%% of reference wall)."""
    from fixtures import make_bam, read_record
    from otter_tpu.io.bam import BAM_CDEL, BAM_CINS, BAM_CMATCH

    rng = random.Random(seed)

    def noisy(piece, out, cig):
        def emit(op, ln):
            if ln <= 0:
                return
            if cig and cig[-1][1] == op:
                cig[-1] = (cig[-1][0] + ln, op)
            else:
                cig.append((ln, op))

        consumed = 0
        for ch in piece:
            x = rng.random()
            if x < err * 0.4:
                out.append(rng.choice([b for b in "ACGT" if b != ch]))
                emit(BAM_CMATCH, 1)
            elif x < err * 0.7:
                out.append(ch)
                out.append(rng.choice("ACGT"))
                emit(BAM_CMATCH, 1)
                emit(BAM_CINS, 1)
            elif x < err:
                emit(BAM_CDEL, 1)
            else:
                out.append(ch)
                emit(BAM_CMATCH, 1)
            consumed += 1
        return consumed

    span = 6000
    ref_len = 1000 + n_regions * span + 2000
    ref = "".join(rng.choice("ACGT") for _ in range(ref_len))
    records = []
    bed = os.path.join(tmp, "ont_regions.bed")
    with open(bed, "w") as fh:
        for r in range(n_regions):
            start = 1000 + r * span
            end = start + 150
            fh.write(f"chr1\t{start}\t{end}\n")
            alleles = [ref[start:end], ref[start:end] + "CAG" * expansion]
            for allele in alleles:
                for _c in range(cov // 2):
                    lf = rng.randint(300, 500)
                    rf = rng.randint(300, 500)
                    out = []
                    cig = []
                    noisy(ref[start - lf : start], out, cig)
                    consumed = noisy(allele, out, cig)
                    extra = consumed - 150
                    if extra > 0:
                        trimmed = []
                        need = extra
                        for ln, op in reversed(cig):
                            if need > 0 and op == BAM_CMATCH:
                                take = min(ln, need)
                                need -= take
                                trimmed.append((take, BAM_CINS))
                                if take < ln:
                                    trimmed.append((ln - take, op))
                            else:
                                trimmed.append((ln, op))
                        cig = list(reversed(trimmed))
                    elif extra < 0:
                        cig.append((-extra, BAM_CDEL))
                    noisy(ref[end : end + rf], out, cig)
                    records.append(read_record(
                        f"o{r}_{len(records)}", 0, start - lf,
                        "".join(out), cig, tags=[("rq", "f", 0.99)]))
    bam = os.path.join(tmp, "ont_reads.bam")
    make_bam(bam, [("chr1", ref_len)], records)
    return bam, bed


def bench_ont(tmp):
    """ONT stress leg: device-affine consensus (checkpointed wide bands,
    volume-routed) vs the forced-native ladder, byte-compared."""
    from otter_tpu.config import OtterOpts
    from otter_tpu.models.assemble import assemble

    bam, bed = build_ont_fixture(tmp)
    n_regions = 16

    def run_ont(env):
        for k, v in env.items():
            os.environ[k] = v
        try:
            params = OtterOpts()
            params.read_group = "ONT1"
            params.device = "auto"
            out = io.StringIO()
            t0 = time.perf_counter()
            assemble(bam, bed, "", False, params, out=out)
            return time.perf_counter() - t0, out.getvalue()
        finally:
            for k in env:
                os.environ.pop(k, None)

    run_ont({})  # warm (compiles the wide-band buckets)
    best = min(run_ont({})[0] for _ in range(2))
    dt, out_auto = run_ont({})
    best = min(best, dt)
    dt_nat, out_nat = run_ont({"OTTER_TPU_AFFINE_DEVICE": "0"})
    return {"ont_regions_per_sec": round(n_regions / best, 2),
            "ont_native_regions_per_sec": round(n_regions / dt_nat, 2),
            "ont_outputs_identical": out_auto == out_nat}


def main():
    from otter_tpu.utils.preflight import wait_for_device

    plat = wait_for_device(retries=3, timeout_s=90, sleep_s=20)
    if plat not in ("tpu", "axon"):
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        os.environ["JAX_PLATFORMS"] = "cpu"
    n_regions = int(os.environ.get("BENCH_REGIONS", "100"))
    with tempfile.TemporaryDirectory() as tmp:
        bam, bed = build_fixture(tmp, n_regions=n_regions)
        device = "auto"
        # warmup (compiles)
        run(device, bam, bed)
        dt, out_text = run(device, bam, bed)
        alleles = sum(1 for l in out_text.split("\n")
                      if l and not l.startswith("@"))
        # host-path comparison
        dt_host, out_host = run("host", bam, bed)
        result = {
            "metric": "assemble_regions_per_sec",
            "value": round(n_regions / dt, 2),
            "unit": "regions/s",
            "vs_baseline": round(dt_host / dt, 2),
            "host_regions_per_sec": round(n_regions / dt_host, 2),
            "alleles": alleles,
            "outputs_identical": out_text == out_host,
        }
        try:
            result.update(bench_genotype(tmp, bam, bed, n_regions))
        except Exception as e:
            result["genotype_error"] = f"{type(e).__name__}: {e}"
        print(json.dumps(result))


if __name__ == "__main__":
    main()
