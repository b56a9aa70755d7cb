"""Fused distances+KDE collect (EditDistanceEngine.distances_collect_kde).

The fused device chain (kernels/edit_pallas.py -> parallel/mesh.py::
kde_fused_from_pairs) must return exactly the distances of the two-step
path, and its scaled KDE must certify to the float64 oracle's clustering
decision. Runs the pallas kernels in interpret mode on the CPU suite."""

import io
import random

import numpy as np
import pytest

from otter_tpu.kernels.edit_pallas import EditDistanceEngine


def _pairs(rng, n, length=80, rate=0.03):
    def mut(s):
        o = []
        for ch in s:
            x = rng.random()
            if x < rate * 0.4:
                o.append(rng.choice([b for b in "ACGT" if b != ch]))
            elif x < rate * 0.7:
                o.extend([ch, rng.choice("ACGT")])
            elif x < rate:
                pass
            else:
                o.append(ch)
        return "".join(o)

    out = []
    for _ in range(n):
        base = "".join(rng.choice("ACGT") for _ in range(length))
        out.append((base, mut(base)))
    return out


def test_fused_collect_matches_two_step():
    rng = random.Random(21)
    eng = EditDistanceEngine(mode="pallas", interpret=True)
    pairs = _pairs(rng, 24)
    pairs[3] = (pairs[3][0], pairs[3][0])  # shortcut pair (x == y)
    # two KDE rows of 10 pairs each; 4 pairs excluded (dump row)
    rid = np.array([0] * 10 + [1] * 10 + [2] * 4, dtype=np.int32)
    slot = np.array(list(range(10)) + list(range(10)) + [0] * 4,
                    dtype=np.int32)
    nvals = np.array([10, 10], dtype=np.int64)
    bw = np.array([0.01, 0.015], dtype=np.float32)
    handle = eng.distances_async(pairs)
    fused = eng.distances_collect_kde(handle, rid, slot, [], nvals, bw,
                                      n_rows=2, n_pad=16)
    assert fused is not None, "fused path unexpectedly fell back"
    dists, m, s = fused
    want = EditDistanceEngine(mode="pallas", interpret=True).distances(pairs)
    assert np.array_equal(dists, want)
    assert m.shape == (2, 401) and s.shape == (2, 401)
    # the scaled KDE must certify to the float64 oracle decision
    from otter_tpu.ops.kde import (kde_decision_certified_scaled_batch,
                                   kde_densities, kde_grid, kde_maximas)

    vlists = []
    for r in range(2):
        sel = np.nonzero(rid == r)[0]
        vals = np.array([want[i] / max(len(pairs[i][0]), len(pairs[i][1]))
                         for i in sel])
        vlists.append(vals)
    certs = kde_decision_certified_scaled_batch(
        [(m[r], s[r]) for r in range(2)], vlists, list(bw), 4)
    xs = kde_grid(0.0025)
    for r in range(2):
        ok, d64 = certs[r]
        if ok:
            # certification guarantees the DECISION (extrema indices feed
            # DecisionBound), not density byte-equality
            oracle = kde_densities(vlists[r], float(bw[r]), xs)
            assert [i for i, _v in kde_maximas(4, d64)[0]] == \
                [i for i, _v in kde_maximas(4, oracle)[0]]


def test_fused_collect_exceptional_rows():
    """Host-known (haplotag-grid) rows ride the exceptional scatter list and
    reproduce kde_tree_step_scaled on the same values."""
    import jax.numpy as jnp

    from otter_tpu.ops.kde import kde_grid
    from otter_tpu.parallel.mesh import kde_tree_step_scaled

    rng = random.Random(33)
    eng = EditDistanceEngine(mode="pallas", interpret=True)
    pairs = _pairs(rng, 8)
    rid = np.full(8, 1, dtype=np.int32)  # all pairs excluded (dump row)
    slot = np.zeros(8, dtype=np.int32)
    hap_vals = np.array([0.0, 1.0, 1.0, 0.0, 1.0, 0.0], dtype=np.float64)
    ex = [(0, k, float(v)) for k, v in enumerate(hap_vals)]
    nvals = np.array([len(hap_vals)], dtype=np.int64)
    bw = np.array([0.01], dtype=np.float32)
    handle = eng.distances_async(pairs)
    fused = eng.distances_collect_kde(handle, rid, slot, ex, nvals, bw,
                                      n_rows=1, n_pad=8)
    assert fused is not None
    _d, m, s = fused
    xs32 = kde_grid(0.0025).astype(np.float32)
    V = np.zeros((1, 8), dtype=np.float32)
    V[0, : len(hap_vals)] = hap_vals
    m2, s2 = kde_tree_step_scaled(jnp.asarray(V),
                                  jnp.asarray([len(hap_vals)], np.int32),
                                  jnp.asarray(bw), jnp.asarray(xs32), 8)
    assert np.array_equal(m[0], np.asarray(m2)[0])
    assert np.array_equal(s[0], np.asarray(s2)[0])


def test_fused_falls_back_on_ladder_pairs():
    """Non-ACGT pairs force the banded ladder: the fused collect must
    decline (return None) so the caller takes the two-step path."""
    rng = random.Random(44)
    eng = EditDistanceEngine(mode="pallas", interpret=True)
    pairs = _pairs(rng, 4) + [("ACGTN" * 10, "ACGTT" * 10)]
    rid = np.zeros(5, dtype=np.int32)
    slot = np.arange(5, dtype=np.int32)
    handle = eng.distances_async(pairs)
    fused = eng.distances_collect_kde(
        handle, rid, slot, [], np.array([5]), np.array([0.01], np.float32),
        n_rows=1, n_pad=8)
    assert fused is None
    assert len(eng.distances_collect(handle)) == 5


def test_assemble_fused_kde_byte_identical():
    """Full assemble through the fused collect (pallas interpret engine on
    CPU) is byte-identical to the host oracle."""
    import os
    import tempfile

    from fixtures import make_reference, simulate_region_bam
    from otter_tpu.config import OtterOpts
    from otter_tpu.kernels.dist_backend import DeviceDistBackend
    from otter_tpu.models.assemble import (_dispatch_batch, _finish_batch,
                                           assemble, prepare_region)
    from otter_tpu.io.bam import BamReader
    from otter_tpu.io.bed import parse_bed_file

    rng = random.Random(7)
    with tempfile.TemporaryDirectory() as tmp:
        ref = make_reference(rng, length=4000, repeat="CAG", repeat_at=1500,
                             repeat_units=20)
        start, end = 1500, 1560
        bam = os.path.join(tmp, "r.bam")
        simulate_region_bam(bam, "chr1", ref, (start, end),
                            [ref[start:end], "CAG" * 30], per_allele_cov=10,
                            error_rate=0.003, seed=11)
        bed = os.path.join(tmp, "r.bed")
        with open(bed, "w") as fh:
            fh.write(f"chr1\t{start}\t{end}\n")

        params = OtterOpts()
        params.read_group = "S1"
        params.device = "host"
        out_host = io.StringIO()
        assemble(bam, bed, "", False, params, out=out_host)

        backend = DeviceDistBackend("cpu")
        backend.engine = EditDistanceEngine(mode="pallas", interpret=True)
        reader = BamReader(bam, load_index=True)
        works = []
        buf = io.StringIO()
        for local_bed in parse_bed_file(bed):
            w = prepare_region(params, local_bed, reader, None, False, buf)
            if w is not None:
                works.append(w)
        out_dev = io.StringIO()
        staged = _dispatch_batch(params, works, backend)
        _finish_batch(params, staged, backend, out_dev)
        reader.close()
        host_body = [l for l in out_host.getvalue().splitlines()
                     if not l.startswith("@")]
        assert out_dev.getvalue().splitlines() == host_body
