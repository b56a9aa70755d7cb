"""Device distance backend parity: backend-filled matrices must equal the
host fill_dist_matrix exactly, and assemble output must be identical through
either path."""

import io
import random

import numpy as np
import pytest

from otter_tpu.config import OtterOpts
from otter_tpu.kernels.dist_backend import DeviceDistBackend
from otter_tpu.models.assemble import assemble
from otter_tpu.ops.consensus import fill_dist_matrix
from otter_tpu.ops.distmat import DistMatrix
from otter_tpu.seqs.model import AnRead

from fixtures import make_reference, simulate_region_bam


def _reads(rng, n, base_len):
    base = "".join(rng.choice("ACGT") for _ in range(base_len))
    reads = []
    for i in range(n):
        seq = []
        for ch in base:
            r = rng.random()
            if r < 0.01:
                seq.append(rng.choice("ACGT"))
            elif r < 0.02:
                seq.extend([ch, rng.choice("ACGT")])
            elif r < 0.03:
                pass
            else:
                seq.append(ch)
        reads.append(AnRead(seq="".join(seq), name=f"r{i}",
                            is_spanning_l=True, is_spanning_r=True))
    return reads


def test_backend_matrix_matches_host():
    rng = random.Random(51)
    reads = _reads(rng, 12, 300)
    indeces = list(range(len(reads)))
    dm_host = DistMatrix(len(indeces))
    fill_dist_matrix(True, reads, indeces, dm_host)
    backend = DeviceDistBackend("cpu")
    dm_dev = DistMatrix(len(indeces))
    backend.fill_matrix(True, reads, indeces, dm_dev)
    assert np.array_equal(dm_host.values, dm_dev.values)


def test_assemble_device_path_identical(tmp_path):
    rng = random.Random(61)
    ref = make_reference(rng, length=3000, repeat="CAG", repeat_at=1500,
                         repeat_units=20)
    start, end = 1500, 1560
    bam = str(tmp_path / "reads.bam")
    simulate_region_bam(bam, "chr1", ref, (start, end),
                        [ref[start:end], "CAG" * 30], per_allele_cov=10,
                        error_rate=0.003, seed=5)
    bed = str(tmp_path / "r.bed")
    with open(bed, "w") as fh:
        fh.write(f"chr1\t{start}\t{end}\n")

    outs = {}
    for device in ("host", "cpu"):
        params = OtterOpts()
        params.read_group = "S1"
        params.device = device
        out = io.StringIO()
        assemble(bam, bed, "", False, params, out=out)
        outs[device] = out.getvalue()
    assert outs["host"] == outs["cpu"]
    body = [l for l in outs["host"].split("\n") if l and not l.startswith("@")]
    assert len(body) == 2
