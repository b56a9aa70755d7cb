"""Banded Myers kernel: oracle soundness + kernel/oracle parity.

The banded result is an over-estimate that equals the exact distance
whenever the true distance fits the band (computed <= k exactness — the
same invariant as the banded row kernel); the ladder escalates the rest.
"""

import random

import numpy as np
import pytest

from otter_tpu.kernels.myers_banded import (
    myers_banded_distances,
    myers_banded_pool_launch,
    myers_banded_ref,
)
from otter_tpu.ops.align_np import edit_distance


def _acgt(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def _mut(rng, s, rate):
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


def test_banded_oracle_sound_and_complete():
    """computed <= k -> computed == exact; exact <= k -> computed == exact."""
    rng = random.Random(42)
    for _ in range(150):
        m = rng.randint(1, 500)
        p = _acgt(rng, m)
        t = _mut(rng, p, rng.choice([0.0, 0.01, 0.05, 0.2, 0.5]))
        if rng.random() < 0.3:
            t = _acgt(rng, rng.randint(max(1, m - 60), m + 60))
        d = edit_distance(p, t)
        for k in (7, 31, 63, 127):
            got = myers_banded_ref(p, t, k)
            if got <= k:
                assert got == d, (m, len(t), k, d, got)
            if d <= k:
                assert got == d, (m, len(t), k, d, got)


def test_banded_kernel_matches_oracle_interpret():
    """Pallas kernel (interpret mode) == word-exact oracle, including
    word-boundary pattern lengths, padded slots, and >k escalation
    sentinels."""
    rng = random.Random(7)
    for k in (63, 127):
        pairs = []
        for m in (1, 31, 32, 33, 63, 64, 65, 200, 400):
            p = _acgt(rng, m)
            pairs.append((p, _mut(rng, p, 0.05)))
        for _ in range(30):
            m = rng.randint(1, 400)
            p = _acgt(rng, m)
            t = _mut(rng, p, rng.choice([0.0, 0.02, 0.15]))
            pairs.append((p, t))
        pairs = [(a, b) if len(a) <= len(b) else (b, a) for a, b in pairs]
        pairs = [(a, b) for a, b in pairs if len(b) - len(a) <= k]
        mxm = max(len(a) for a, b in pairs)
        nw = 4
        while nw * 32 < mxm:
            nw *= 2
        mx = max(len(b) for a, b in pairs)
        tl = 128
        while tl < mx:
            tl *= 2
        got = myers_banded_distances(pairs, nw, tl, k, interpret=True)
        want = [myers_banded_ref(a, b, k) for a, b in pairs]
        for g, w in zip(got.tolist(), want):
            assert (g == w) or (g > k and w > k), (g, w, k)


def test_banded_pool_launch_matches_oracle_interpret():
    """Pool-dedup launch (shared sequence objects, device-side plane
    expansion) == the per-pair oracle."""
    rng = random.Random(3)
    base = _acgt(rng, 300)
    members = [_mut(rng, base, 0.03) for _ in range(8)]
    pairs = []
    for i in range(8):
        for j in range(i + 1, 8):
            pairs.append((members[i], members[j]))
    k = 63
    dev = myers_banded_pool_launch(pairs, 16, 512, k, interpret=True)
    got = np.asarray(dev).reshape(-1)[: len(pairs)]
    want = [myers_banded_ref(a, b, k) for a, b in pairs]
    for g, w in zip(got.tolist(), want):
        assert (g == w) or (g > k and w > k), (g, w)


def test_engine_long_pair_route_parity():
    """Engine-level: long ACGT pairs (striped regime) through the banded
    ladder + striped fallback must equal the exact DP."""
    from otter_tpu.kernels.edit_pallas import EditDistanceEngine

    rng = random.Random(5)
    eng = EditDistanceEngine(mode="pallas", interpret=True)
    pairs = []
    for _ in range(10):
        L = rng.choice([2100, 2600])
        p = _acgt(rng, L)
        pairs.append((p, _mut(rng, p, rng.choice([0.004, 0.05, 0.15]))))
    pairs.append((_acgt(rng, 2100), _acgt(rng, 3300)))  # striped fallback
    got = eng.distances(pairs)
    want = np.array([edit_distance(a, b) for a, b in pairs])
    assert np.array_equal(got, want)


def test_pool_text_longer_than_pattern_words():
    """A pool sequence used only as TEXT may exceed the pattern word
    budget (n_words*32); pack_peq_pool must truncate it (its peq row is
    never gathered) instead of raising — the old ValueError silently
    demoted whole engine chunks to the striped kernel (code-review r4)."""
    import numpy as np

    from otter_tpu.kernels.edit_pallas import EditDistanceEngine

    rng = random.Random(12)
    base = _acgt(rng, 2100)          # pattern fits 66 words -> nw bucket 128
    long_text = base + _acgt(rng, 350)  # text exceeds... (bucketed by text)
    pairs = [(base, long_text), (base, _mut(rng, base, 0.01))]
    eng = EditDistanceEngine(mode="pallas", interpret=True)
    got = eng.distances(pairs)
    want = np.array([edit_distance(a, b) for a, b in pairs])
    assert np.array_equal(got, want)
