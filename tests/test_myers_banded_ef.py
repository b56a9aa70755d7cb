"""Banded ends-free Myers kernel: oracle exactness + pallas interpret
parity (reference ends-free semantics: src/analignments.cpp:88-96 via
ops/align_np.py::edit_distance_ends_free)."""

import random

import numpy as np

from otter_tpu.kernels.myers_banded import (myers_banded_ends_free_launch,
                                            myers_banded_ends_free_ref)
from otter_tpu.ops.align_np import edit_distance_ends_free


def rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def mutate(rng, s, rate):
    out = []
    for ch in s:
        r = rng.random()
        if r < rate * 0.4:
            out.append(rng.choice([b for b in "ACGT" if b != ch]))
        elif r < rate * 0.7:
            out.extend([ch, rng.choice("ACGT")])
        elif r < rate:
            pass
        else:
            out.append(ch)
    return "".join(out)


def _jobs(rng, n_jobs, m_max=220):
    jobs = []
    for _ in range(n_jobs):
        m = rng.randrange(8, m_max)
        p = rand_seq(rng, m)
        lf = rng.randrange(0, 60)
        rf = rng.randrange(0, 60)
        t = rand_seq(rng, lf) + mutate(rng, p, rng.choice([0.0, 0.03])) \
            + rand_seq(rng, rf)
        ld = len(t) - len(p)
        if ld < 0:
            continue
        style = rng.randrange(3)
        if style == 0:
            tb, te = ld, 0
        elif style == 1:
            tb, te = 0, ld
        else:
            tb, te = ld // 2, ld - ld // 2
        jobs.append((p, t, tb, te))
    return jobs


def test_banded_ef_oracle_exact_when_within_band():
    rng = random.Random(11)
    for p, t, tb, te in _jobs(rng, 60):
        true = edit_distance_ends_free(p, t, 0, 0, tb, te)
        for k in (15, 31, 63):
            got = myers_banded_ends_free_ref(p, t, tb, te, k, klo=tb)
            if got <= k:
                assert got == true
            else:
                assert true > k


def test_banded_ef_pallas_interpret_matches_oracle():
    rng = random.Random(13)
    jobs = _jobs(rng, 40, m_max=180)
    k = 31
    klo = max(64, max(j[2] for j in jobs))
    klo = 1 << (klo - 1).bit_length()
    n_words = 8
    while n_words * 32 < max(len(j[0]) for j in jobs):
        n_words *= 2
    tl = 128
    while tl < max(len(j[1]) for j in jobs):
        tl *= 2
    dev = myers_banded_ends_free_launch(jobs, n_words, tl, k, klo,
                                        interpret=True)
    got = np.asarray(dev).reshape(-1)[: len(jobs)]
    for (p, t, tb, te), g in zip(jobs, got):
        true = edit_distance_ends_free(p, t, 0, 0, tb, te)
        if g <= k:
            assert g == true, (len(p), len(t), tb, te, g, true)
        else:
            assert true > k, (len(p), len(t), tb, te, g, true)


def test_engine_ends_free_banded_route_parity():
    """Long one-sided ends-free jobs route through the banded ladder
    (interpret mode) and match the host DP exactly (including escalation
    to striped for out-of-band jobs)."""
    from otter_tpu.kernels.edit_pallas import EditDistanceEngine
    from otter_tpu.ops.align_batch import edit_ends_free_batch

    rng = random.Random(17)
    jobs = []
    base = rand_seq(rng, 2600)
    for i in range(6):
        p = mutate(rng, base, 0.01)
        lf = rng.randrange(0, 200)
        rf = rng.randrange(0, 200)
        t = rand_seq(rng, lf) + mutate(rng, p, 0.01) + rand_seq(rng, rf)
        ld = len(t) - len(p)
        if ld < 0:
            t = t + rand_seq(rng, -ld)
            ld = 0
        style = i % 3
        if style == 0:
            jobs.append((p, t, 0, 0, ld, 0))       # text frees
        elif style == 1:
            jobs.append((p, t, 0, 0, 0, ld))
        else:
            jobs.append((t, p, ld // 2, ld - ld // 2, 0, 0))  # pattern frees
    eng = EditDistanceEngine(mode="pallas", interpret=True)
    got = eng.ends_free(jobs)
    want = edit_ends_free_batch(jobs)
    assert np.array_equal(np.asarray(got), np.asarray(want)), (got, want)
