"""Failure-path tests for the multi-process layer (VERDICT r4 #8):

  * empty shard — more processes than regions; late processes emit nothing
    and the writer-host gather still reproduces the single-process stream;
  * killed worker — SIGKILL one worker mid-run, trim its torn output to
    whole regions, re-dispatch its shard with resume_from (the per-region
    recovery unit of SURVEY.md §5);
  * coordinator env validation — malformed topology env degrades to
    single-process with a warning instead of hanging or crashing.

The reference has no analog of any of this (single process, exit(1) on
error — SURVEY.md §5); these are framework-level contracts of the TPU
build's region data-parallelism (src/assemble.cpp:43 analog).
"""

import io
import os
import signal
import socket
import subprocess
import sys
import time

import pytest

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
params.is_fa = os.environ.get("WORKER_FASTA") == "1"
with open(out_path, "w", buffering=1) as fh:
    assemble(bam, bed, "", False, params, out=fh)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_fixture(tmp_path, n_regions, cov=8, seed=21):
    import random

    from fixtures import make_bam, make_reference, read_record
    from otter_tpu.io.bam import BAM_CMATCH

    rng = random.Random(seed)
    span = 1500
    ref = make_reference(rng, length=1000 + n_regions * span + 1000,
                         repeat="CAG", repeat_at=500, repeat_units=10)
    bam = str(tmp_path / "reads.bam")
    bed = str(tmp_path / "regions.bed")
    records = []
    regions = []
    for r in range(n_regions):
        start = 1000 + r * span
        end = start + 90
        regions.append((start, end))
        for c in range(cov):
            lf, rf = 150, 150
            seq = ref[start - lf : start] + ref[start:end] + ref[end : end + rf]
            records.append(read_record(
                f"r{r}_{c}", 0, start - lf, seq,
                [(len(seq), BAM_CMATCH)], tags=[("rq", "f", 0.999)]))
    make_bam(bam, [("chr1", len(ref))], records)
    with open(bed, "w") as fh:
        for start, end in regions:
            fh.write(f"chr1\t{start}\t{end}\n")
    return bam, bed


def _single_process_oracle(bam, bed, is_fa=False) -> str:
    from otter_tpu.config import OtterOpts
    from otter_tpu.models.assemble import assemble

    params = OtterOpts()
    params.read_group = "S1"
    params.device = "host"
    params.is_fa = is_fa
    buf = io.StringIO()
    assemble(bam, bed, "", False, params, out=buf)
    return buf.getvalue()


def _spawn(worker, bam, bed, out_path, pid, nproc, port, extra_env=None):
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
        "JAX_NUM_PROCESSES": str(nproc),
        "JAX_PROCESS_ID": str(pid),
    })
    env.pop("XLA_FLAGS", None)
    if extra_env:
        env.update(extra_env)
    return subprocess.Popen(
        [sys.executable, str(worker), bam, bed, out_path],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)


def test_empty_shard_gather_to_writer(tmp_path):
    """3 processes, 2 regions: process 2's shard is empty; with the
    writer-host gather on, process 0 emits the full single-process byte
    stream and the others emit nothing (SURVEY §2.3 'allele tables gathered
    to the writer host' — the stdout-mutex analog, assemble.cpp:42)."""
    bam, bed = _make_fixture(tmp_path, n_regions=2)
    single = _single_process_oracle(bam, bed)

    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(repo=REPO))
    port = _free_port()
    procs, outs = [], []
    for pid in range(3):
        out_path = str(tmp_path / f"out_{pid}.sam")
        outs.append(out_path)
        procs.append(_spawn(worker, bam, bed, out_path, pid, 3, port,
                            extra_env={"OTTER_TPU_GATHER": "1"}))
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
    assert not fails, fails
    assert open(outs[0]).read() == single
    assert open(outs[1]).read() == ""
    assert open(outs[2]).read() == ""


def test_killed_worker_region_redispatch(tmp_path):
    """SIGKILL a worker mid-run; trim its torn output to whole regions
    (models/assemble.py::trim_partial_output) and re-dispatch its shard
    with resume_from. The spliced streams must equal the single-process
    run byte for byte — the region is the recovery unit."""
    from otter_tpu.config import OtterOpts
    from otter_tpu.io.bed import parse_bed_file
    from otter_tpu.models.assemble import assemble, trim_partial_output
    from otter_tpu.parallel.distributed import shard_regions

    n_regions = 8
    bam, bed = _make_fixture(tmp_path, n_regions=n_regions)
    single = _single_process_oracle(bam, bed, is_fa=True)

    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(repo=REPO))
    port = _free_port()
    out0 = str(tmp_path / "out_0.fa")
    out1 = str(tmp_path / "out_1.fa")
    p0 = _spawn(worker, bam, bed, out0, 0, 2, port,
                extra_env={"WORKER_FASTA": "1"})
    p1 = _spawn(worker, bam, bed, out1, 1, 2, port,
                extra_env={"WORKER_FASTA": "1"})
    # wait until worker 1 has produced at least one record, then kill it
    deadline = time.monotonic() + 240
    while time.monotonic() < deadline:
        if p1.poll() is not None:
            break  # finished before we could kill it — still a valid run
        try:
            if os.path.getsize(out1) > 0:
                break
        except OSError:
            pass
        time.sleep(0.05)
    if p1.poll() is None:
        os.kill(p1.pid, signal.SIGKILL)
    p1.wait()
    _so, se0 = p0.communicate(timeout=240)
    assert p0.returncode == 0, se0[-2000:]

    # recovery: trim the torn tail, then re-dispatch the dead worker's
    # shard with resume_from pointing at the trimmed partial
    done = trim_partial_output(out1)
    regions = parse_bed_file(bed)
    shard1 = shard_regions(regions, 1, 2)
    assert len(shard1) == n_regions // 2
    bed1 = str(tmp_path / "shard1.bed")
    with open(bed1, "w") as fh:
        for b in shard1:
            fh.write(f"{b.chr}\t{b.start}\t{b.end}\n")
    params = OtterOpts()
    params.read_group = "S1"
    params.device = "host"
    params.is_fa = True
    redone = io.StringIO()
    assemble(bam, bed1, "", False, params, out=redone,
             resume_from=out1)
    # every region of shard 1 is covered exactly once: trimmed partial
    # (whole regions only) + resumed remainder
    resumed_ids = {line[1:].split("#")[1]
                   for line in redone.getvalue().splitlines()
                   if line.startswith(">")}
    assert not (done & resumed_ids), "resume re-emitted a completed region"
    combined = open(out0).read() + open(out1).read() + redone.getvalue()
    # region order within shard 1 may differ after re-dispatch (trimmed
    # regions first, resumed after) — compare per-region record blocks
    def by_region(text):
        blocks = {}
        cur = None
        for line in text.splitlines():
            if line.startswith(">"):
                cur = line[1:].split("#")[1]
            blocks.setdefault(cur, []).append(line)
        return blocks

    assert by_region(combined) == by_region(single)
    # and the default in-order case (nothing torn mid-shard) is byte-equal
    if not done:
        assert combined == single


def test_coordinator_env_validation(monkeypatch, capsys):
    """Malformed topology env must degrade to single-process with a
    warning — never raise, never call jax.distributed.initialize."""
    import otter_tpu.parallel.distributed as dist

    called = []

    class _FakeDistributed:
        @staticmethod
        def initialize(**kwargs):
            called.append(kwargs)

    monkeypatch.setattr("jax.distributed", _FakeDistributed())
    cases = [
        {"JAX_COORDINATOR_ADDRESS": "127.0.0.1:1", "JAX_NUM_PROCESSES": "x"},
        {"JAX_COORDINATOR_ADDRESS": "127.0.0.1:1", "JAX_NUM_PROCESSES": "0"},
        {"JAX_COORDINATOR_ADDRESS": "127.0.0.1:1", "JAX_NUM_PROCESSES": "2",
         "JAX_PROCESS_ID": "7"},
        {"JAX_COORDINATOR_ADDRESS": "127.0.0.1:1", "JAX_NUM_PROCESSES": "2",
         "JAX_PROCESS_ID": "nope"},
    ]
    for env in cases:
        for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                  "JAX_PROCESS_ID"):
            monkeypatch.delenv(k, raising=False)
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        pidx, pcount = dist.maybe_initialize()
        assert (pidx, pcount) == (0, 1)
        assert not called, f"initialize() called for invalid env {env}"
        assert "[WARNING]" in capsys.readouterr().err
    # valid env DOES reach initialize, with the bounded timeout applied
    # (a listening socket stands in for the coordinator so the TCP
    # reachability probe passes)
    lsock = socket.socket()
    lsock.bind(("127.0.0.1", 0))
    lsock.listen(1)
    try:
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS",
                           "127.0.0.1:%d" % lsock.getsockname()[1])
        monkeypatch.setenv("JAX_PROCESS_ID", "1")
        monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
        monkeypatch.setenv("OTTER_TPU_COORD_TIMEOUT_S", "7")
        dist.maybe_initialize()
    finally:
        lsock.close()
    assert called and called[0]["initialization_timeout"] == 7
    assert called[0]["num_processes"] == 2 and called[0]["process_id"] == 1


def test_unreachable_coordinator_times_out():
    """A dead coordinator with OTTER_TPU_COORD_TIMEOUT_S must fail fast
    (warning + single-process), not hang for jax's 300 s default."""
    code = r"""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, %r)
os.environ["JAX_COORDINATOR_ADDRESS"] = "127.0.0.1:1"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = "1"
os.environ["OTTER_TPU_COORD_TIMEOUT_S"] = "5"
import jax
jax.config.update("jax_platforms", "cpu")
from otter_tpu.parallel.distributed import maybe_initialize
t0 = time.monotonic()
pidx, pcount = maybe_initialize()
dt = time.monotonic() - t0
print("RESULT", pidx, pcount, dt)
assert dt < 60, dt
""" % REPO
    # process 1 connects to a port nobody listens on; must return quickly
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "RESULT" in r.stdout
    assert "[WARNING]" in r.stderr


def test_trim_partial_output_fasta_multiline_records(tmp_path):
    """A FASTA partial torn mid-region (one of two alleles flushed, or a
    torn sequence line) must trim the WHOLE incomplete region — sequence
    lines carry no region id of their own and belong to the preceding
    header (regression: the torn region used to be kept and reported
    done, silently losing its other alleles on resume)."""
    from otter_tpu.models.assemble import trim_partial_output

    r1 = [">a0#chr1:100-200#x", "ACGTACGT", ">a1#chr1:100-200#x", "GGGG"]
    r2 = [">b0#chr1:300-400#x", "TTTT", ">b1#chr1:300-400#x", "CCCC"]
    # case 1: second region has only its first allele flushed
    p = tmp_path / "partial1.fa"
    p.write_text("\n".join(r1 + r2[:2]) + "\n")
    done = trim_partial_output(str(p))
    assert done == {"chr1:100-200"}
    assert p.read_text() == "\n".join(r1) + "\n"
    # case 2: torn (no trailing newline) sequence line of the last record
    p2 = tmp_path / "partial2.fa"
    p2.write_text("\n".join(r1 + r2) + "\n" + ">c0#chr1:500-600#x\nACG")
    done2 = trim_partial_output(str(p2))
    assert done2 == {"chr1:100-200", "chr1:300-400"}
    assert p2.read_text() == "\n".join(r1 + r2) + "\n"
    # case 3: complete file stays untouched
    p3 = tmp_path / "partial3.fa"
    full = "\n".join(r1 + r2) + "\n"
    p3.write_text(full)
    done3 = trim_partial_output(str(p3))
    # the last region is still dropped (completeness is unknowable), but
    # nothing BEFORE it may be lost
    assert "chr1:100-200" in done3
    assert p3.read_text().startswith("\n".join(r1))


GT_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {repo!r})
sys.path.insert(0, {repo_tests!r})
import jax
jax.config.update("jax_platforms", "cpu")
from otter_tpu.config import OtterOpts
from otter_tpu.models.genotype import genotype

bam, bed, fa, out_path = sys.argv[1:5]
params = OtterOpts()
params.device = "cpu"
with open(out_path, "w") as fh:
    genotype(params, bam, bed, fa, out=fh)
"""


def test_genotype_gather_to_writer(tmp_path):
    """The genotype workload's writer-host gather: 2 processes, cohort
    VCF collected to process 0 byte-identical to the single-process run
    (genotype.cpp:71-163's stdout mutex analog)."""
    import sys as _sys

    _sys.path.insert(0, REPO)
    from bench_e2e import build_cohort_fixture
    from otter_tpu.config import OtterOpts
    from otter_tpu.models.genotype import genotype

    bam, bed, fa = build_cohort_fixture(str(tmp_path), 4, 6, seed=9)
    params = OtterOpts()
    params.device = "host"
    single = io.StringIO()
    genotype(params, bam, bed, fa, out=single)

    worker = tmp_path / "gt_worker.py"
    worker.write_text(GT_WORKER.format(
        repo=REPO, repo_tests=os.path.join(REPO, "tests")))
    port = _free_port()
    procs, outs = [], []
    for pid in range(2):
        out_path = str(tmp_path / f"vcf_{pid}.vcf")
        outs.append(out_path)
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "OTTER_TPU_GATHER": "1",
        })
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(worker), bam, bed, fa, out_path],
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
    assert not fails, fails
    assert open(outs[0]).read() == single.getvalue()
    assert open(outs[1]).read() == ""
