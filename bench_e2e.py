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


def _stats(times):
    """Per-rep variance fields (VERDICT r3 #8): round-over-round deltas are
    uninterpretable against 3x tunnel noise without spreads."""
    ts = sorted(times)
    n = len(ts)
    med = ts[n // 2] if n % 2 else 0.5 * (ts[n // 2 - 1] + ts[n // 2])
    mad = sorted(abs(t - med) for t in ts)[n // 2] if n else 0.0
    return {"best_s": round(min(ts), 4), "median_s": round(med, 4),
            "mad_s": round(mad, 4),
            "reps_s": [round(t, 4) for t in times]}


def _noisy_walk(piece, err, nprng, out, cig):
    """Vectorized read-error walker (mismatch 0.4e / ins 0.3e / del 0.3e;
    run-length-merged CIGAR appended to ``cig``, chars appended to ``out``).
    Returns the number of reference chars consumed (= len(piece))."""
    import numpy as _np

    from otter_tpu.io.bam import BAM_CDEL, BAM_CINS, BAM_CMATCH

    L = len(piece)
    if L == 0:
        return 0
    _NT = _np.frombuffer(b"ACGT", dtype=_np.uint8)
    _CODE = _np.zeros(256, dtype=_np.uint8)
    for _i, _c in enumerate(b"ACGT"):
        _CODE[_c] = _i
    u = nprng.random(L)
    cat = _np.where(u < err * 0.4, 1,
                    _np.where(u < err * 0.7, 2,
                              _np.where(u < err, 3, 0)))
    codes = _CODE[_np.frombuffer(piece.encode(), _np.uint8)]
    n_chars = _np.where(cat == 3, 0, _np.where(cat == 2, 2, 1))
    starts_c = _np.zeros(L, dtype=_np.int64)
    _np.cumsum(n_chars[:-1], out=starts_c[1:])
    chars = _np.zeros(int(n_chars.sum()), dtype=_np.uint8)
    keep = cat != 3
    newb = _np.where(cat == 1, (codes + nprng.integers(1, 4, L)) % 4, codes)
    chars[starts_c[keep]] = _NT[newb[keep]]
    ins = cat == 2
    if ins.any():
        chars[starts_c[ins] + 1] = _NT[nprng.integers(0, 4, int(ins.sum()))]
    out.append(chars.tobytes().decode("latin-1"))
    n_ops = _np.where(cat == 2, 2, 1)
    starts_o = _np.zeros(L, dtype=_np.int64)
    _np.cumsum(n_ops[:-1], out=starts_o[1:])
    ops = _np.zeros(int(n_ops.sum()), dtype=_np.uint8)
    ops[starts_o] = _np.where(cat == 3, BAM_CDEL, BAM_CMATCH)
    if ins.any():
        ops[starts_o[ins] + 1] = BAM_CINS
    bounds = _np.nonzero(_np.diff(ops))[0] + 1
    seg_start = _np.concatenate([[0], bounds])
    seg_end = _np.concatenate([bounds, [len(ops)]])
    for s0, s1 in zip(seg_start.tolist(), seg_end.tolist()):
        op = int(ops[s0])
        ln = s1 - s0
        if cig and cig[-1][1] == op:
            cig[-1] = (cig[-1][0] + ln, op)
        else:
            cig.append((ln, op))
    return L


def build_fixture(tmp, n_regions=100, cov=12, err=0.01, region_len=120,
                  seed=11):
    from fixtures import make_bam, read_record
    from otter_tpu.io.bam import BAM_CMATCH, BAM_CINS, BAM_CDEL

    import numpy as _np

    rng = random.Random(seed)
    nprng = _np.random.Generator(_np.random.PCG64(seed * 104729 + 7))
    span = 2500
    ref_len = 1000 + n_regions * span + 2000
    _NT4 = _np.frombuffer(b"ACGT", dtype=_np.uint8)
    ref = _NT4[nprng.integers(0, 4, ref_len)].tobytes().decode("latin-1")
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
                        return _noisy_walk(piece, err, nprng, out, cig)

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
    times = []
    vcf_text = ""
    for _ in range(3):
        dt, vcf_text = run_gt()
        times.append(dt)
    best = min(times)
    vcf_rows = sum(1 for l in vcf_text.splitlines()
                   if l and not l.startswith("#"))
    return {"genotype_regions_per_sec": round(n_regions / best, 2),
            "genotype_vcf_rows": vcf_rows,
            "genotype_samples": n_samples,
            "genotype_times": _stats(times)}


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
    times = []
    vcf = ""
    for _ in range(5):
        dt, vcf = run_gt("auto")
        times.append(dt)
    _dt_host, vcf_host = run_gt("host")
    return {"genotype64_regions_per_sec": round(n_regions / min(times), 2),
            "genotype64_samples": n_samples,
            "genotype64_vcf_identical": vcf == vcf_host,
            "genotype64_times": _stats(times)}


def bench_genotype_cohort500(tmp, n_samples=500, n_regions=8):
    """O(500)-sample cohort leg (VERDICT r3 #7): n = 2*500+1 = 1001 allele
    matrices per region (~500k condensed entries each) through the batched
    pipeline, VCF byte-compared to the sequential host path. Ref:
    otterclust.cpp:463-527."""
    from otter_tpu.config import OtterOpts
    from otter_tpu.models.genotype import genotype

    bam, bed, fa = build_cohort_fixture(tmp, n_samples, n_regions, seed=23)

    def run_gt(device):
        params = OtterOpts()
        params.device = device
        out = io.StringIO()
        t0 = time.perf_counter()
        genotype(params, bam, bed, fa, out=out)
        return time.perf_counter() - t0, out.getvalue()

    run_gt("auto")  # warm
    times = []
    vcf = ""
    for _ in range(3):
        dt, vcf = run_gt("auto")
        times.append(dt)
    _dt_host, vcf_host = run_gt("host")
    return {"genotype500_regions_per_sec": round(n_regions / min(times), 2),
            "genotype500_samples": n_samples,
            "genotype500_vcf_identical": vcf == vcf_host,
            "genotype500_times": _stats(times)}


def build_ont_fixture(tmp, n_regions=16, err=0.06, cov=18, expansion=720,
                      seed=42, region_len=150, flank_lo=300, flank_hi=500,
                      name="ont"):
    """BASELINE's ONT stress shape: 2.3 kb het expansions at ~6% read
    error — the gap-affine consensus regime (94%% of reference wall).
    Parameterized (region_len/cov/err) so the reference-scale leg (cov-200,
    10-20 kb alleles; command_assemble.cpp:38, SURVEY §3.4) reuses it."""
    from fixtures import make_bam, read_record
    from otter_tpu.io.bam import BAM_CDEL, BAM_CINS, BAM_CMATCH

    import numpy as _np

    rng = random.Random(seed)
    nprng = _np.random.Generator(_np.random.PCG64(seed * 7919 + 13))

    def noisy(piece, out, cig):
        return _noisy_walk(piece, err, nprng, out, cig)

    span = region_len + 2 * flank_hi + 2 * max(1000, region_len // 2)
    ref_len = 1000 + n_regions * span + 2000
    ref = "".join(rng.choice("ACGT") for _ in range(ref_len))
    records = []
    bed = os.path.join(tmp, f"{name}_regions.bed")
    with open(bed, "w") as fh:
        for r in range(n_regions):
            start = 1000 + r * span
            end = start + region_len
            fh.write(f"chr1\t{start}\t{end}\n")
            alleles = [ref[start:end], ref[start:end] + "CAG" * expansion]
            for allele in alleles:
                for _c in range(cov // 2):
                    lf = rng.randint(flank_lo, flank_hi)
                    rf = rng.randint(flank_lo, flank_hi)
                    out = []
                    cig = []
                    noisy(ref[start - lf : start], out, cig)
                    consumed = noisy(allele, out, cig)
                    extra = consumed - region_len
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
    bam = os.path.join(tmp, f"{name}_reads.bam")
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
    times = []
    out_auto = ""
    for _ in range(3):
        dt, out_auto = run_ont({})
        times.append(dt)
    dt_nat, out_nat = run_ont({"OTTER_TPU_AFFINE_DEVICE": "0"})
    return {"ont_regions_per_sec": round(n_regions / min(times), 2),
            "ont_native_regions_per_sec": round(n_regions / dt_nat, 2),
            "ont_outputs_identical": out_auto == out_nat,
            "ont_times": _stats(times)}


def bench_refscale(tmp):
    """Reference-scale leg (VERDICT r3 #1): the reference's own default
    regime — cov 200 reads/region (command_assemble.cpp:38), 10 kb alleles
    (SURVEY §3.4's read scale), HiFi-grade error. 19,900 all-vs-all pairs
    of ~10 kb sequences per region: the shape where the reference's thread
    pool saturates and the TPU batch advantage is largest.

    Times the device path on BENCH_REFSCALE_REGIONS regions (default 2)
    and the native-CPU path on region 1 only (it is ~an order of magnitude
    slower; its wall is measured, not assumed), then byte-compares region
    1's allele records between the two runs."""
    from otter_tpu.config import OtterOpts
    from otter_tpu.models.assemble import assemble

    n_regions = int(os.environ.get("BENCH_REFSCALE_REGIONS", "2"))
    cov = int(os.environ.get("BENCH_REFSCALE_COV", "200"))
    allele_bp = int(os.environ.get("BENCH_REFSCALE_BP", "10000"))
    bam, bed = build_ont_fixture(
        tmp, n_regions=n_regions, err=0.002, cov=cov, expansion=100,
        seed=77, region_len=allele_bp, flank_lo=300, flank_hi=500,
        name="refscale")
    bed1 = os.path.join(tmp, "refscale_r1.bed")
    with open(bed1, "w") as fh:
        fh.write(open(bed).read().splitlines()[0] + "\n")

    def run_leg(device, bedfile):
        params = OtterOpts()
        params.read_group = "RS1"
        params.device = device
        out = io.StringIO()
        t0 = time.perf_counter()
        assemble(bam, bedfile, "", False, params, out=out)
        return time.perf_counter() - t0, out.getvalue()

    run_leg("auto", bed1)  # warm (compiles the long-pair buckets)
    times = []
    out_auto = ""
    # >= 4 reps with the median quoted (VERDICT r4 #7): tunnel latency
    # bursts make 2-rep numbers swing 2x run to run
    for _ in range(int(os.environ.get("BENCH_REFSCALE_REPS", "4"))):
        dt, out_auto = run_leg("auto", bed)
        times.append(dt)
    dt_nat, out_nat1 = run_leg("cpu", bed1)
    # PINNED native baseline (tools/calibrate_refscale.py): the vs-native
    # multiplier uses the SMALLER of the pinned and live native wall so a
    # loaded box can only lower the claim, never inflate it
    dt_nat_claim = dt_nat
    pinned = None
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "REFSCALE_BASELINE.json")) as fh:
            pinned = json.load(fh)
        if (pinned.get("cov") == cov
                and pinned.get("allele_bp") == allele_bp
                and pinned.get("native_region_sec_best")):
            dt_nat_claim = min(dt_nat,
                               float(pinned["native_region_sec_best"]))
    except Exception:
        pinned = None
    # region-1 byte comparison: same header, same first-region records
    # (allele names are "<chr>:<start>-<end>_<i>", assemble emission order)
    chrom, rstart, rend = open(bed).read().splitlines()[0].split("\t")[:3]
    prefix = f"{chrom}:{rstart}-{rend}_"
    r1_auto = [l for l in out_auto.splitlines()
               if l.startswith("@") or l.split("\t")[0].startswith(prefix)]
    r1_nat = out_nat1.splitlines()
    ts = sorted(times)
    med = ts[len(ts) // 2] if len(ts) % 2 else 0.5 * (
        ts[len(ts) // 2 - 1] + ts[len(ts) // 2])
    return {"refscale_regions_per_sec": round(n_regions / med, 4),
            "refscale_region_sec_median": round(med / n_regions, 3),
            "refscale_native_region_sec": round(dt_nat, 2),
            "refscale_native_region_sec_pinned": (
                round(float(pinned["native_region_sec_best"]), 2)
                if pinned and pinned.get("native_region_sec_best")
                else None),
            "refscale_vs_native": round(
                dt_nat_claim / (med / n_regions), 2),
            "refscale_cov": cov, "refscale_allele_bp": allele_bp,
            "refscale_region1_identical":
                "\n".join(r1_auto) == "\n".join(r1_nat),
            "refscale_times": _stats(times)}


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
        times = []
        out_text = ""
        for _ in range(3):
            dt, out_text = run(device, bam, bed)
            times.append(dt)
        dt = min(times)
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
            "times": _stats(times),
        }
        try:
            result.update(bench_genotype(tmp, bam, bed, n_regions))
        except Exception as e:
            result["genotype_error"] = f"{type(e).__name__}: {e}"
        print(json.dumps(result))


if __name__ == "__main__":
    main()
