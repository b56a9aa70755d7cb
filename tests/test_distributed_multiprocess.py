"""Real multi-process jax.distributed execution: 2 CPU processes with a
coordinator shard an assemble run by region; concatenating the per-process
outputs in process order must reproduce the single-process byte stream.

This is the TPU-native analog of the reference's thread boundary
(src/assemble.cpp:43): region data-parallelism across processes with a
process-0-only header (parallel/distributed.py).
"""

import io
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from otter_tpu.config import OtterOpts
from otter_tpu.models.assemble import assemble

bam, bed, out_path = sys.argv[1:4]
params = OtterOpts()
params.read_group = "S1"
params.device = "cpu"
with open(out_path, "w") as fh:
    assemble(bam, bed, "", False, params, out=fh)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_assemble_matches_single(tmp_path):
    from fixtures import make_reference, simulate_region_bam
    import random

    rng = random.Random(21)
    n_regions = 6
    span = 1500
    ref = make_reference(rng, length=1000 + n_regions * span + 1000,
                         repeat="CAG", repeat_at=500, repeat_units=10)
    bam = str(tmp_path / "reads.bam")
    bed = str(tmp_path / "regions.bed")
    regions = []
    for r in range(n_regions):
        start = 1000 + r * span
        regions.append((start, start + 90))
    # one BAM covering all regions: simulate each region into its own BAM is
    # not possible with this helper, so lay alleles directly over the ref
    from fixtures import make_bam, read_record
    from otter_tpu.io.bam import BAM_CMATCH

    records = []
    for r, (start, end) in enumerate(regions):
        allele = ref[start:end]
        for c in range(8):
            lf, rf = 150, 150
            seq = ref[start - lf : start] + allele + ref[end : end + rf]
            records.append(read_record(
                f"r{r}_{c}", 0, start - lf, seq,
                [(len(seq), BAM_CMATCH)], tags=[("rq", "f", 0.999)]))
    make_bam(bam, [("chr1", len(ref))], records)
    with open(bed, "w") as fh:
        for start, end in regions:
            fh.write(f"chr1\t{start}\t{end}\n")

    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(repo=REPO))

    # single-process oracle (in-process, host path)
    from otter_tpu.config import OtterOpts
    from otter_tpu.models.assemble import assemble

    params = OtterOpts()
    params.read_group = "S1"
    params.device = "host"
    single = io.StringIO()
    assemble(bam, bed, "", False, params, out=single)

    port = _free_port()
    procs = []
    outs = []
    for pid in range(2):
        out_path = str(tmp_path / f"out_{pid}.sam")
        outs.append(out_path)
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "OTTER_TPU_NATIVE_AFFINE": os.environ.get(
                "OTTER_TPU_NATIVE_AFFINE", "1"),
        })
        env.pop("XLA_FLAGS", None)  # one local CPU device per process
        procs.append(subprocess.Popen(
            [sys.executable, str(worker), bam, bed, out_path],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    fails = []
    for pid, p in enumerate(procs):
        try:
            _so, se = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            _so, se = p.communicate()
            fails.append((pid, -1, "timeout\n" + se[-2000:]))
            continue
        if p.returncode != 0:
            fails.append((pid, p.returncode, se[-2000:]))
        else:
            # each process must have seen the 2-process topology
            assert "process %d/2" % pid in se, se[-2000:]
    assert not fails, fails
    combined = "".join(open(o).read() for o in outs)
    assert combined == single.getvalue()


MESH_WORKER = r"""
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from otter_tpu.config import OtterOpts
from otter_tpu.models.assemble import assemble

bam, bed, out_path = sys.argv[1:4]
params = OtterOpts()
params.read_group = "S1"
params.device = "mesh"
with open(out_path, "w") as fh:
    assemble(bam, bed, "", False, params, out=fh)
"""


def test_two_process_four_device_mesh_assemble(tmp_path):
    """The production pod topology in miniature (VERDICT r3 #5): 2
    processes (DCN region sharding) x 4 virtual devices EACH
    (ICI pair sharding, device="mesh" with the region-sharded tree KDE
    forced on) as ONE program; concatenated output must equal the
    single-process host oracle byte for byte."""
    import random

    from fixtures import make_bam, read_record
    from otter_tpu.io.bam import BAM_CMATCH

    rng = random.Random(31)
    n_regions = 6
    span = 1500
    ref = "".join(rng.choice("ACGT")
                  for _ in range(1000 + n_regions * span + 1000))
    bam = str(tmp_path / "reads.bam")
    bed = str(tmp_path / "regions.bed")
    records = []
    regions = []
    for r in range(n_regions):
        start = 1000 + r * span
        end = start + 90
        regions.append((start, end))
        alleles = [ref[start:end]]
        if r % 2 == 0:
            alleles.append(ref[start:end] + "CAG" * 12)
        for a_i, allele in enumerate(alleles):
            for c in range(8 // len(alleles) + 2):
                lf, rf = 150, 150
                seq = ref[start - lf : start] + allele + ref[end : end + rf]
                cig = [(lf + (end - start), BAM_CMATCH)]
                if len(allele) > end - start:
                    cig.append((len(allele) - (end - start), 1))  # BAM_CINS
                cig.append((rf, BAM_CMATCH))
                records.append(read_record(
                    f"r{r}_{a_i}_{c}", 0, start - lf, seq, cig,
                    tags=[("rq", "f", 0.999)]))
    make_bam(bam, [("chr1", len(ref))], records)
    with open(bed, "w") as fh:
        for start, end in regions:
            fh.write(f"chr1\t{start}\t{end}\n")

    # single-process host oracle
    from otter_tpu.config import OtterOpts
    from otter_tpu.models.assemble import assemble

    params = OtterOpts()
    params.read_group = "S1"
    params.device = "host"
    single = io.StringIO()
    assemble(bam, bed, "", False, params, out=single)

    worker = tmp_path / "mesh_worker.py"
    worker.write_text(MESH_WORKER.format(repo=REPO))
    port = _free_port()
    procs = []
    outs = []
    for pid in range(2):
        out_path = str(tmp_path / f"mesh_out_{pid}.sam")
        outs.append(out_path)
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "OTTER_TPU_MESH_DEVICES": "4",
            "OTTER_TPU_MESH_KDE": "1",
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(worker), bam, bed, out_path],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    fails = []
    for pid, p in enumerate(procs):
        try:
            _so, se = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            _so, se = p.communicate()
            fails.append((pid, -1, "timeout\n" + se[-2000:]))
            continue
        if p.returncode != 0:
            fails.append((pid, p.returncode, se[-2000:]))
        else:
            assert "process %d/2" % pid in se, se[-2000:]
    assert not fails, fails
    combined = "".join(open(o).read() for o in outs)
    assert combined == single.getvalue()
