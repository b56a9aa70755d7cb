"""Adversarial tie-sensitive parity fixtures (VERDICT r1 item 9).

Grows the tie-coverage beyond the reference's 4 golden PPOA fixtures
(test/ppoa_test.cpp:39-105): cigar ties (repeats/homopolymers where many
optimal gap-affine alignments exist) must resolve identically across the
host scalar DP, the batched numpy ladder, the native C++ ladder, and the
device (interpret-mode) traceback kernel; POA consensus over tie-bearing
member sets must match between the python oracle and the native engine;
and KDE near-tie densities must either certify AND match the float64
oracle decision, or fall back.
"""

import random

import numpy as np
import pytest

from otter_tpu.ops.align_np import affine_align_ends_free_cigar
from otter_tpu.ops.align_batch import affine_cigars_multi


def _tie_jobs():
    """Hand-built tie-heavy jobs: (pattern, text, pb, pe, tb, te)."""
    jobs = []
    # homopolymer indel placement: any of the A positions is optimal
    jobs.append(("AAAAAAA", "AAAAAA", 0, 0, 0, 0))
    jobs.append(("AAAAAA", "AAAAAAA", 0, 0, 0, 0))
    # tandem repeat unit deletion: CAG x5 vs x4 (3 placements x 3 phases)
    jobs.append(("CAGCAGCAGCAGCAG", "CAGCAGCAGCAG", 0, 0, 0, 0))
    jobs.append(("CAGCAGCAGCAG", "CAGCAGCAGCAGCAG", 0, 0, 0, 0))
    # dimer repeat with substitution-vs-indel score trade-offs
    jobs.append(("ATATATATAT", "ATATATAT", 0, 0, 0, 0))
    jobs.append(("ACACACACAC", "ACACACACGT", 0, 0, 0, 0))
    # two equal-cost mismatch placements
    jobs.append(("ACGTACGT", "ACCTACCT", 0, 0, 0, 0))
    # free-end ties: the gap can ride the free boundary or the interior
    jobs.append(("AAAA", "AAAAAA", 0, 0, 1, 1))
    jobs.append(("TTTTTT", "TTTT", 1, 1, 0, 0))
    jobs.append(("CAGCAGCAG", "CAGCAGCAGCAGCAG", 0, 0, 3, 3))
    # palindromic: forward and reverse placements tie
    jobs.append(("ACGTTGCA", "ACGTGCA", 0, 0, 0, 0))
    # long homopolymer runs inside context
    jobs.append(("GGCAAAAAAAAAATT", "GGCAAAAAAAATT", 0, 0, 0, 0))
    return jobs


def _rand_repeat_jobs(rng, n=30):
    """Random tandem-repeat pairs — dense with optimal-alignment ties."""
    jobs = []
    for _ in range(n):
        unit = "".join(rng.choice("ACGT") for _ in range(rng.randrange(1, 6)))
        a = unit * rng.randrange(3, 12)
        b = unit * rng.randrange(3, 12)
        # sprinkle a mutation to mix mismatch/indel trade-offs
        if b and rng.random() < 0.5:
            i = rng.randrange(len(b))
            b = b[:i] + rng.choice("ACGT") + b[i + 1:]
        frees = rng.choice([(0, 0, 0, 0), (0, 0, 2, 2), (1, 1, 0, 0)])
        jobs.append((a, b, *frees))
    return jobs


def _scalar(jobs):
    return [affine_align_ends_free_cigar(p, t, pb, pe, tb, te)
            for p, t, pb, pe, tb, te in jobs]


def test_cigar_ties_host_scalar_vs_numpy_ladder(monkeypatch):
    monkeypatch.setenv("OTTER_TPU_NATIVE_AFFINE", "0")
    monkeypatch.setenv("OTTER_TPU_AFFINE_DEVICE", "0")
    jobs = _tie_jobs() + _rand_repeat_jobs(random.Random(23))
    assert affine_cigars_multi(jobs) == _scalar(jobs)


def test_cigar_ties_host_scalar_vs_native(monkeypatch):
    pytest.importorskip("ctypes")
    from otter_tpu.native import get_lib
    try:
        get_lib()
    except Exception:
        pytest.skip("native lib unavailable")
    monkeypatch.setenv("OTTER_TPU_NATIVE_AFFINE", "1")
    monkeypatch.setenv("OTTER_TPU_AFFINE_DEVICE", "0")
    jobs = _tie_jobs() + _rand_repeat_jobs(random.Random(29))
    assert affine_cigars_multi(jobs) == _scalar(jobs)


def test_cigar_ties_device_interpret_kernel():
    from otter_tpu.kernels.affine_pallas import affine_cigars_device_tb

    jobs = _tie_jobs()
    cigs, failed = affine_cigars_device_tb(jobs, interpret=True)
    want = _scalar(jobs)
    ran = 0
    for i in range(len(jobs)):
        if i not in failed:
            assert cigs[i] == want[i], (i, jobs[i])
            ran += 1
    assert ran >= len(jobs) // 2  # most tie fixtures fit the k=63/127 bands


def test_poa_consensus_ties_native_vs_python():
    """Tie-bearing member cigars through PPOA: native == python oracle
    (anppoa.hpp:254-344 heaviest-path rules exercised on equal weights)."""
    try:
        from otter_tpu.native import poa_consensus_batch
        from otter_tpu.native import get_lib
        get_lib()
    except Exception:
        pytest.skip("native lib unavailable")
    from otter_tpu.ops.poa import Ppoa

    rng = random.Random(31)
    tasks = []
    for _ in range(12):
        unit = "".join(rng.choice("ACGT") for _ in range(rng.randrange(2, 5)))
        bb = unit * rng.randrange(4, 9)
        members = []
        for _m in range(rng.randrange(2, 6)):
            seq = unit * rng.randrange(3, 10)
            cig = affine_align_ends_free_cigar(seq, bb, 0, 0, 0, 0)
            members.append((seq, cig, 0, 0))
        tasks.append((bb, members))
    native = poa_consensus_batch(tasks, [1.0] * len(tasks), 0.3)
    for (bb, members), nat in zip(tasks, native):
        poa = Ppoa(bb)
        for seq, cig, sl, sr in members:
            poa.insert_alignment(seq, cig, sl, sr)
        poa.adjust_weights(1.0, float(np.float32(0.3)))
        want = poa.consensus() or "N"
        assert (nat or "N") == want


def test_kde_near_tie_certification_safe():
    """Engineered near-tie density shapes: every certified region must
    reproduce the float64 oracle decision bit-exactly (otterclust.cpp:20-38
    peak rules); uncertifiable shapes must report False."""
    from otter_tpu.ops.cluster import otter_find_clustering_dist
    from otter_tpu.ops.distmat import DistMatrix
    from otter_tpu.ops.kde import (kde_decision_certified, kde_densities,
                                   kde_grid)
    from test_kde_certified import _tree_f32_density

    def decision(values, densities):
        dm = DistMatrix(2)
        dm.values = list(values)
        db = otter_find_clustering_dist(4, 0.0025, 0.01, dm,
                                        densities=densities)
        return (db.dist0, db.dist1, db.cut0)

    xs = kde_grid(0.0025)
    rng = random.Random(37)
    cases = []
    # twin peaks with EXACTLY equal masses (f64 tie broken by peak rules)
    cases.append([0.01] * 6 + [0.05] * 6)
    # twin peaks one sample apart in mass
    cases.append([0.01] * 6 + [0.05] * 7)
    # peaks adjacent within the merge radius
    cases.append([0.02] * 5 + [0.03] * 5)
    # duplicate-heavy values (3-decimal style rounding)
    cases.append([round(rng.uniform(0.0, 0.2), 3) for _ in range(40)])
    cases.append([round(rng.uniform(0.0, 0.2), 2) for _ in range(40)])
    # near-boundary masses around the grid edge
    cases.append([0.0] * 8 + [0.9995] * 3)
    for trial in range(20):
        base = rng.uniform(0.005, 0.15)
        sep = rng.choice([0.0025, 0.005, 0.0075, 0.01])
        n1 = rng.randrange(3, 9)
        cases.append([base] * n1 + [base + sep] * n1)  # equal-mass near-tie

    n_cert = 0
    for vals in cases:
        v = np.asarray(vals, dtype=np.float64)
        dens64 = kde_densities(v, 0.01, xs)
        want = decision(v, dens64)
        dens32 = _tree_f32_density(v, 0.01)
        if kde_decision_certified(dens32, v, 0.01, 4):
            n_cert += 1
            got = decision(v, dens32.astype(np.float64))
            assert got == want, vals[:8]
    # certification must not be vacuous on these shapes
    assert n_cert >= 3
