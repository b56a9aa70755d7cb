"""Certified float32 device KDE: certified regions must reproduce the
float64 oracle's clustering decision exactly; known-divergent shapes must
fail certification."""

import random

import numpy as np

from otter_tpu.ops.cluster import otter_find_clustering_dist
from otter_tpu.ops.distmat import DistMatrix
from otter_tpu.ops.kde import (kde_decision_certified, kde_densities,
                               kde_grid)


def _tree_f32_density(values, bandwidth):
    """Host replica of parallel/mesh.py::kde_tree_step (float32 math,
    binary-tree pair fold, f32 cast of the f64 grid)."""
    xs = kde_grid(0.0025).astype(np.float32)
    v = np.asarray(values, dtype=np.float32)
    n_pad = 8
    while n_pad < len(v):
        n_pad *= 2
    V = np.zeros(n_pad, dtype=np.float32)
    V[: len(v)] = v
    h = np.float32(bandwidth)
    z = (xs[:, None] - V[None, :]) / h
    kern = (np.float32(1.0 / np.sqrt(2.0 * np.pi)) / h) \
        * np.exp(-(z * z) / np.float32(2.0))
    kern[:, len(v):] = 0.0
    w = n_pad
    while w > 1:
        kern = kern[:, : w // 2] + kern[:, w // 2 : w]
        w //= 2
    dens = kern[:, 0] / (h * np.float32(len(v)))
    total = np.sum(dens, dtype=np.float32)
    return (dens / total).astype(np.float32)


def _decision(values, densities, radius=4, bandwidth=0.01):
    dm = DistMatrix(2)
    dm.values = list(values)
    db = otter_find_clustering_dist(radius, 0.0025, bandwidth, dm,
                                    densities=densities)
    return (db.dist0, db.dist1, db.cut0)


def test_certified_regions_match_oracle():
    rng = random.Random(3)
    xs = kde_grid(0.0025)
    n_cert = 0
    for trial in range(60):
        kind = trial % 3
        if kind == 0:      # unimodal (hom region)
            vals = [abs(rng.gauss(0.01, 0.004)) for _ in range(66)]
        elif kind == 1:    # bimodal, close peaks
            vals = ([abs(rng.gauss(0.01, 0.004)) for _ in range(30)]
                    + [abs(rng.gauss(0.06, 0.01)) for _ in range(36)])
        else:              # bimodal, wide split (often uncertifiable: f32
            vals = ([abs(rng.gauss(0.005, 0.002)) for _ in range(20)]
                    + [abs(rng.gauss(0.45, 0.02)) for _ in range(46)])
        vals = [min(v, 1.0) for v in vals]
        f32 = _tree_f32_density(vals, 0.01)
        certified = kde_decision_certified(f32, vals, 0.01, 4)
        if certified:
            n_cert += 1
            oracle = kde_densities(np.asarray(vals), 0.01, xs)
            assert _decision(vals, f32) == _decision(vals, oracle), trial
    # the cert must actually pass on a healthy share of realistic regions
    assert n_cert >= 20, n_cert


def test_underflow_split_fails_certification():
    """Two far-apart clusters leave grid cells where f32 underflows to zero
    but f64 stays positive — the scan's minima index would diverge, so the
    cert must reject."""
    rng = random.Random(9)
    vals = ([abs(rng.gauss(0.005, 0.002)) for _ in range(20)]
            + [abs(rng.gauss(0.5, 0.003)) for _ in range(20)])
    f32 = _tree_f32_density(vals, 0.01)
    # cells between the clusters: f32 zero, f64 positive
    xs = kde_grid(0.0025)
    mid = (xs > 0.2) & (xs < 0.3)
    assert np.any(f32[mid] == 0.0)
    oracle = kde_densities(np.asarray(vals), 0.01, xs)
    assert np.all(oracle[mid] > 0.0)
    assert not kde_decision_certified(f32, vals, 0.01, 4)


def test_certified_zero_tail_is_accepted():
    """Exact-zero cells >= 39 bandwidths from every value are zero in both
    precisions; they must not spoil certification."""
    rng = random.Random(11)
    vals = [abs(rng.gauss(0.01, 0.003)) for _ in range(50)]
    f32 = _tree_f32_density(vals, 0.01)
    assert np.any(f32 == 0.0)  # far tail underflows in both precisions
    assert kde_decision_certified(f32, vals, 0.01, 4)


# -- scaled (log-sum-exp) device KDE ------------------------------------------

def _tree_scaled_host(values, bandwidth):
    """Host replica of parallel/mesh.py::kde_tree_step_scaled (f32 math)."""
    xs = kde_grid(0.0025).astype(np.float32)
    v = np.asarray(values, dtype=np.float32)
    n_pad = 8
    while n_pad < len(v):
        n_pad *= 2
    V = np.zeros(n_pad, dtype=np.float32)
    V[: len(v)] = v
    h = np.float32(bandwidth)
    z = (xs[:, None] - V[None, :]) / h
    e = (-(z * z) / np.float32(2.0)).astype(np.float32)
    e[:, len(v):] = -np.inf
    m = e.max(axis=1)
    with np.errstate(under="ignore"):
        t = np.exp(e - m[:, None]).astype(np.float32)
    t[:, len(v):] = 0.0
    w = n_pad
    while w > 1:
        t = t[:, : w // 2] + t[:, w // 2 : w]
        w //= 2
    return m, t[:, 0]


def test_scaled_certifies_separated_bimodal():
    """Widely separated distance clusters (the het expanded-allele shape)
    used to force an f64 fallback via f32 underflow dead zones; the scaled
    reconstruction must certify them and reproduce the oracle decision."""
    from otter_tpu.ops.kde import kde_decision_certified_scaled

    rng = random.Random(11)
    xs = kde_grid(0.0025)
    n_cert = 0
    for trial in range(30):
        lo = [rng.uniform(0.0, 0.04) for _ in range(rng.randrange(4, 12))]
        hi_c = rng.uniform(0.3, 0.95)
        hi = [hi_c + rng.uniform(-0.02, 0.02)
              for _ in range(rng.randrange(4, 12))]
        vals = np.asarray(lo + hi)
        m, s = _tree_scaled_host(vals, 0.01)
        ok, d64 = kde_decision_certified_scaled(m, s, vals, 0.01, 4)
        dens64 = kde_densities(vals, 0.01, xs)
        want = _decision(vals, dens64)
        if ok:
            n_cert += 1
            assert _decision(vals, d64) == want, trial
    # the whole point of the scaled variant: these shapes certify
    assert n_cert >= 28


def test_scaled_certified_matches_oracle_random():
    from otter_tpu.ops.kde import kde_decision_certified_scaled

    rng = random.Random(19)
    xs = kde_grid(0.0025)
    n_cert = 0
    for trial in range(40):
        n = rng.randrange(3, 40)
        kind = rng.randrange(3)
        if kind == 0:
            vals = [rng.uniform(0.0, 0.2) for _ in range(n)]
        elif kind == 1:
            vals = [round(rng.uniform(0.0, 1.0), 2) for _ in range(n)]
        else:
            c1, c2 = rng.uniform(0, 0.1), rng.uniform(0.1, 1.0)
            vals = [c1 + rng.uniform(-0.01, 0.01) for _ in range(n)] + \
                   [c2 + rng.uniform(-0.01, 0.01) for _ in range(n)]
        vals = np.asarray(vals)
        bw = rng.choice([0.01, 0.05])
        m, s = _tree_scaled_host(vals, bw)
        ok, d64 = kde_decision_certified_scaled(m, s, vals, bw, 4)
        dens64 = kde_densities(vals, bw, xs)
        want = _decision(vals, dens64, bandwidth=bw)
        if ok:
            n_cert += 1
            assert _decision(vals, d64, bandwidth=bw) == want, trial
    assert n_cert >= 32


def test_scaled_soundness_sweep():
    """300 random shapes: every certified region must match the oracle
    decision (soundness is the hard requirement; rate is best-effort)."""
    from otter_tpu.ops.kde import kde_decision_certified_scaled

    rng = random.Random(101)
    xs = kde_grid(0.0025)
    n_cert = 0
    for trial in range(300):
        n = rng.randrange(3, 30)
        shape = rng.randrange(4)
        if shape == 0:
            vals = [rng.uniform(0.0, 1.0) for _ in range(n)]
        elif shape == 1:
            vals = [round(rng.uniform(0.0, 1.0), rng.choice([1, 2, 3]))
                    for _ in range(n)]
        elif shape == 2:
            c = rng.uniform(0.0, 0.9)
            vals = [min(1.0, max(0.0, rng.gauss(c, 0.01))) for _ in range(n)]
        else:
            c1, c2 = rng.uniform(0, 0.2), rng.uniform(0.2, 1.0)
            vals = [c1] * (n // 2 + 1) + [c2] * (n // 2 + 1)
        vals = np.asarray(vals, dtype=np.float64)
        bw = rng.choice([0.01, 0.03, 0.05])
        m, s = _tree_scaled_host(vals, bw)
        ok, d64 = kde_decision_certified_scaled(m, s, vals, bw, 4)
        if not ok:
            continue
        n_cert += 1
        dens64 = kde_densities(vals, bw, xs)
        assert _decision(vals, d64, bandwidth=bw) == \
            _decision(vals, dens64, bandwidth=bw), trial
    assert n_cert >= 200


def test_kde_maximas_vectorized_equivalence():
    """Vectorized kde_maximas == the sequential reference scan, ties and
    plateaus included (ankde.cpp:25-62)."""
    from otter_tpu.ops.kde import kde_maximas, kde_maximas_scan_ref

    rng = random.Random(5)
    for trial in range(300):
        n = rng.randrange(3, 80)
        kind = rng.randrange(4)
        if kind == 0:
            d = np.array([rng.random() for _ in range(n)])
        elif kind == 1:
            d = np.array([rng.choice([0.0, 0.1, 0.2, 0.2, 0.3])
                          for _ in range(n)])
        elif kind == 2:
            d = np.zeros(n)
            d[rng.randrange(n)] = 1.0
        else:
            d = np.full(n, rng.choice([0.0, 0.5]))
        r = rng.randrange(1, 6)
        assert kde_maximas(r, d) == kde_maximas_scan_ref(r, d), (trial, n, r)

def test_scaled_batch_matches_scalar_bitwise():
    """kde_decision_certified_scaled_batch must return byte-identical
    results to the per-region scalar call for every region (the assemble
    pipeline's batched certify path)."""
    from otter_tpu.ops.kde import (kde_decision_certified_scaled,
                                   kde_decision_certified_scaled_batch)

    rng = random.Random(77)
    scaled, vlists, bws = [], [], []
    for trial in range(60):
        n = rng.randrange(3, 40)
        shape = rng.randrange(4)
        if shape == 0:
            vals = [rng.uniform(0.0, 1.0) for _ in range(n)]
        elif shape == 1:
            vals = [round(rng.uniform(0.0, 1.0), rng.choice([1, 2, 3]))
                    for _ in range(n)]
        elif shape == 2:
            c = rng.uniform(0.0, 0.9)
            vals = [min(1.0, max(0.0, rng.gauss(c, 0.01))) for _ in range(n)]
        else:  # separated clusters: exercises the tiny-cell scalar fallback
            c1, c2 = rng.uniform(0, 0.05), rng.uniform(0.4, 1.0)
            vals = [c1] * (n // 2 + 1) + [c2] * (n // 2 + 1)
        vals = np.asarray(vals, dtype=np.float64)
        bw = rng.choice([0.01, 0.015, 0.05])
        m, s = _tree_scaled_host(vals, bw)
        scaled.append((m, s))
        vlists.append(vals)
        bws.append(bw)
    got = kde_decision_certified_scaled_batch(scaled, vlists, bws, 4)
    for r in range(len(scaled)):
        ok, d64 = kde_decision_certified_scaled(
            scaled[r][0], scaled[r][1], vlists[r], bws[r], 4)
        gok, gd = got[r]
        assert gok == ok, r
        if ok:
            assert gd.tobytes() == d64.tobytes(), r
        else:
            assert gd is None, r
