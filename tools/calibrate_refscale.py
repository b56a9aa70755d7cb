#!/usr/bin/env python
"""Pin the native-CPU refscale baseline (REFSCALE_BASELINE.json).

Measures the native C++ path's wall on region 1 of the reference-default
workload (cov 200, 10 kb alleles — src/command_assemble.cpp:38 defaults)
N times on an otherwise-idle box and records the BEST wall with the
measurement conditions. bench_e2e.bench_refscale then uses
min(pinned_best, live_measured) as the vs-native denominator, so a loaded
bench box can only LOWER the claimed multiplier (same policy as
CPU_BASELINE.json / tools/calibrate_cpu.py).
"""

import io
import json
import os
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from bench_e2e import build_ont_fixture
    from otter_tpu.config import OtterOpts
    from otter_tpu.models.assemble import assemble

    reps = int(os.environ.get("CALIBRATE_REPS", "3"))
    cov = int(os.environ.get("BENCH_REFSCALE_COV", "200"))
    allele_bp = int(os.environ.get("BENCH_REFSCALE_BP", "10000"))
    with tempfile.TemporaryDirectory() as tmp:
        bam, bed = build_ont_fixture(
            tmp, n_regions=2, err=0.002, cov=cov, expansion=100,
            seed=77, region_len=allele_bp, flank_lo=300, flank_hi=500,
            name="refscale")
        bed1 = os.path.join(tmp, "refscale_r1.bed")
        with open(bed1, "w") as fh:
            fh.write(open(bed).read().splitlines()[0] + "\n")
        walls = []
        for _ in range(reps):
            params = OtterOpts()
            params.read_group = "RS1"
            params.device = "cpu"
            out = io.StringIO()
            t0 = time.perf_counter()
            assemble(bam, bed1, "", False, params, out=out)
            walls.append(round(time.perf_counter() - t0, 2))
            print("native region wall: %.2f s" % walls[-1], flush=True)
    result = {
        "native_region_sec_best": min(walls),
        "native_region_sec_reps": walls,
        "cov": cov,
        "allele_bp": allele_bp,
        "loadavg_at_measure": list(os.getloadavg()),
        "cpu_count": os.cpu_count(),
        "note": ("best-of-%d native C++ (device='cpu') wall for region 1 "
                 "of the reference-default refscale workload; "
                 "bench_e2e.bench_refscale uses min(this, live) as the "
                 "vs-native denominator" % reps),
        "measured": time.strftime("%Y-%m-%d"),
    }
    path = os.path.join(HERE, "REFSCALE_BASELINE.json")
    with open(path, "w") as fh:
        json.dump(result, fh, indent=1)
        fh.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
