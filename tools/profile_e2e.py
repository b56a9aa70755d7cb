#!/usr/bin/env python
"""Steady-state phase profile of the e2e assemble path.

Runs the bench_e2e synthetic workload once for warmup (compiles), resets the
metrics accumulators, then times a second pass and prints the isolated phase
breakdown. PROFILE_REGIONS / PROFILE_DEVICE env override defaults.
"""

import io
import os
import sys
import tempfile
import time

os.environ["OTTER_TPU_METRICS"] = "1"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from bench_e2e import build_fixture, run  # noqa: E402


def main():
    from otter_tpu.utils.preflight import wait_for_device
    from otter_tpu.utils import metrics

    plat = wait_for_device(retries=3, timeout_s=90, sleep_s=20)
    if plat not in ("tpu", "axon"):
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        os.environ["JAX_PLATFORMS"] = "cpu"
    n_regions = int(os.environ.get("PROFILE_REGIONS", "96"))
    device = os.environ.get("PROFILE_DEVICE", "auto")
    with tempfile.TemporaryDirectory() as tmp:
        bam, bed = build_fixture(tmp, n_regions=n_regions)
        run(device, bam, bed)          # warmup: compiles
        metrics.reset()
        t0 = time.perf_counter()
        run(device, bam, bed)
        dt = time.perf_counter() - t0
        sys.stderr.write(f"\n== steady-state pass: {n_regions} regions in "
                         f"{dt:.3f}s = {n_regions/dt:.1f} regions/s ==\n")
        sys.stderr.write(metrics.summary() + "\n")
        metrics.reset()  # keep the atexit dump empty


if __name__ == "__main__":
    main()
