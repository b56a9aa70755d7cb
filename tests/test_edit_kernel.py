"""Banded edit-distance kernel parity tests (jnp fallback + Pallas interpret
mode) against the numpy oracle."""

import random

import numpy as np
import pytest

from otter_tpu.kernels.edit_pallas import EditDistanceEngine
from otter_tpu.ops.align_np import edit_distance


def rand_seq(rng, n):
    return "".join(rng.choice("ACGTN") for _ in range(n))


def mutate(rng, s, rate):
    out = []
    for ch in s:
        r = rng.random()
        if r < rate * 0.4:
            out.append(rng.choice([b for b in "ACGT" if b != ch]))
        elif r < rate * 0.7:
            out.append(ch)
            out.append(rng.choice("ACGT"))
        elif r < rate:
            pass
        else:
            out.append(ch)
    return "".join(out)


def _pairs(rng, n_pairs, max_len):
    pairs = []
    for _ in range(n_pairs):
        kind = rng.random()
        if kind < 0.4:
            # similar pair (low error)
            s = rand_seq(rng, rng.randrange(10, max_len))
            pairs.append((s, mutate(rng, s, 0.03)))
        elif kind < 0.7:
            # unrelated pair
            pairs.append((rand_seq(rng, rng.randrange(1, max_len)),
                          rand_seq(rng, rng.randrange(1, max_len))))
        elif kind < 0.8:
            # identical
            s = rand_seq(rng, rng.randrange(1, max_len))
            pairs.append((s, s))
        elif kind < 0.9:
            # big length difference (expansion)
            s = rand_seq(rng, rng.randrange(10, max_len))
            pairs.append((s, s + rand_seq(rng, rng.randrange(1, max_len))))
        else:
            pairs.append((rand_seq(rng, rng.randrange(1, 5)), ""))
    return pairs


def test_engine_jnp_vs_numpy():
    rng = random.Random(17)
    pairs = _pairs(rng, 40, 120)
    eng = EditDistanceEngine(mode="numpy", k_start=63)
    got = eng.distances(pairs)
    want = np.array([edit_distance(x, y) for x, y in pairs])
    assert np.array_equal(got, want), list(zip(pairs, got, want))


def test_engine_jnp_band_escalation():
    # small initial band forces the doubling path
    rng = random.Random(23)
    pairs = _pairs(rng, 16, 300)
    eng = EditDistanceEngine(mode="numpy", k_start=63)
    got = eng.distances(pairs)
    want = np.array([edit_distance(x, y) for x, y in pairs])
    assert np.array_equal(got, want)
    assert eng.cells > 0


def test_engine_pallas_interpret_vs_numpy():
    rng = random.Random(29)
    pairs = _pairs(rng, 12, 80)
    eng = EditDistanceEngine(use_pallas=True, interpret=True, k_start=63)
    got = eng.distances(pairs)
    want = np.array([edit_distance(x, y) for x, y in pairs])
    assert np.array_equal(got, want), list(zip(pairs, got, want))


def test_engine_long_sequences():
    rng = random.Random(31)
    s = rand_seq(rng, 2000)
    pairs = [(s, mutate(rng, s, 0.02)), (s, rand_seq(rng, 1900))]
    eng = EditDistanceEngine(mode="numpy")
    got = eng.distances(pairs)
    want = np.array([edit_distance(x, y) for x, y in pairs])
    assert np.array_equal(got, want)


def test_engine_jnp_small():
    rng = random.Random(37)
    pairs = _pairs(rng, 8, 40)
    eng = EditDistanceEngine(mode="jnp", k_start=63)
    got = eng.distances(pairs)
    want = np.array([edit_distance(x, y) for x, y in pairs])
    assert np.array_equal(got, want)


def test_striped_myers_interpret():
    from otter_tpu.kernels.myers_striped import myers_striped_distances
    rng = random.Random(71)
    pairs = []
    for _ in range(4):
        base = "".join(rng.choice("ACGT") for _ in range(1200))
        pairs.append((base, mutate(rng, base, 0.04)))
    d = myers_striped_distances(pairs, 2048, interpret=True)
    want = np.array([edit_distance(x, y) for x, y in pairs])
    assert np.array_equal(d, want)


def test_engine_pallas_interpret_long_acgt():
    """Long ACGT pairs route through the striped kernel in pallas mode."""
    rng = random.Random(72)
    base = "".join(rng.choice("ACGT") for _ in range(2500))
    pairs = [(base, mutate(rng, base, 0.03)), (base, base)]
    eng = EditDistanceEngine(mode="pallas", interpret=True)
    got = eng.distances(pairs)
    want = np.array([edit_distance(x, y) for x, y in pairs])
    assert np.array_equal(got, want)


def test_striped_ends_free_interpret():
    """Ends-free jobs (frees on one side, either side) match the host DP
    through the striped kernel, including a multi-stripe pattern."""
    from otter_tpu.kernels.myers_striped import myers_striped_ends_free
    from otter_tpu.ops.align_np import edit_distance_ends_free

    rng = random.Random(73)
    jobs = []
    for _ in range(12):
        m = rng.randint(1, 250)
        ld = rng.randint(0, 60)
        p = "".join(rng.choice("ACGT") for _ in range(m))
        t = "".join(rng.choice("ACGT") for _ in range(m + ld))
        mode = rng.randint(0, 5)
        if mode == 0:
            jobs.append((p, t, 0, 0, ld, 0))
        elif mode == 1:
            jobs.append((p, t, 0, 0, 0, ld))
        elif mode == 2:
            jobs.append((p, t, 0, 0, ld // 2, ld - ld // 2))
        elif mode == 3:
            jobs.append((t, p, ld, 0, 0, 0))
        elif mode == 4:
            jobs.append((t, p, 0, ld, 0, 0))
        else:
            jobs.append((t, p, ld // 2, ld - ld // 2, 0, 0))
    jobs.append(("", "ACGTAC", 0, 0, 2, 1))
    long_p = "".join(rng.choice("ACGT") for _ in range(1400))
    jobs.append((long_p, long_p[:5] + "".join(
        rng.choice("ACGT") for _ in range(1500)), 0, 0, 0, 105))
    got = myers_striped_ends_free(jobs, interpret=True)
    want = np.array([edit_distance_ends_free(*j) for j in jobs])
    assert np.array_equal(got, want)


def test_engine_ends_free_interpret():
    from otter_tpu.ops.align_np import edit_distance_ends_free

    rng = random.Random(74)
    jobs = []
    for _ in range(6):
        m = rng.randint(50, 400)
        ld = rng.randint(0, 40)
        y = "".join(rng.choice("ACGT") for _ in range(m + ld))
        x = mutate(rng, y[: m], 0.05)
        jobs.append((y, x, ld // 2, ld - ld // 2, 0, 0))
    # non-ACGT job exercises the host fallback branch
    jobs.append(("ACGNT", "ACGT", 1, 0, 0, 0))
    eng = EditDistanceEngine(mode="pallas", interpret=True)
    got = eng.ends_free(jobs)
    want = np.array([edit_distance_ends_free(*j) for j in jobs])
    assert np.array_equal(got, want)


def test_native_pack_planes_matches_numpy():
    """The threaded C++ packer (native.myers_pack_planes) must reproduce the
    numpy pack_for_pallas plane layout bit-for-bit (incl. tie-length pattern
    choice, padding slots, sel one-hots)."""
    import os

    from otter_tpu.kernels import myers_pallas as mp
    from otter_tpu.native import myers_pack_planes

    rng = random.Random(99)

    def acgt(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    pairs = []
    for _ in range(700):
        m = rng.randint(1, 500)
        n = rng.randint(m, 512)
        p = (acgt(m), acgt(n))
        pairs.append(p if rng.random() < 0.5 else (p[1], p[0]))
    pairs.append((acgt(7), acgt(7)))  # tie -> pattern = x
    old = os.environ.get("OTTER_TPU_NATIVE_PACK")
    os.environ["OTTER_TPU_NATIVE_PACK"] = "0"
    try:
        ref = mp.pack_for_pallas(pairs, 16, 512, batch_pad=1024)
    finally:
        if old is None:
            del os.environ["OTTER_TPU_NATIVE_PACK"]
        else:
            os.environ["OTTER_TPU_NATIVE_PACK"] = old
    nat = myers_pack_planes(pairs, 16, 512, pad_to=1024)
    assert ref[5] == nat[5]
    for i in range(5):
        assert ref[i].shape == nat[i].shape
        assert (ref[i] == nat[i]).all()


def test_native_pack_packed_matches_numpy():
    """The packed-pattern C++ packer (native.myers_pack_packed) must match
    the numpy pack_myers_packed + plane conversion bit-for-bit."""
    import os

    from otter_tpu.kernels import myers_pallas as mp
    from otter_tpu.native import myers_pack_packed

    rng = random.Random(1234)

    def acgt(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    pairs = []
    for _ in range(700):
        m = rng.randint(1, 500)
        n = rng.randint(m, 512)
        p = (acgt(m), acgt(n))
        pairs.append(p if rng.random() < 0.5 else (p[1], p[0]))
    pairs.append((acgt(7), acgt(7)))  # tie -> pattern = x
    old = os.environ.get("OTTER_TPU_NATIVE_PACK")
    os.environ["OTTER_TPU_NATIVE_PACK"] = "0"
    try:
        ref = mp.pack_for_pallas_packed(pairs, 16, 512, batch_pad=1024)
    finally:
        if old is None:
            del os.environ["OTTER_TPU_NATIVE_PACK"]
        else:
            os.environ["OTTER_TPU_NATIVE_PACK"] = old
    nat = myers_pack_packed(pairs, 16, 512, pad_to=1024)
    assert ref[4] == nat[4]
    for i in range(4):
        assert ref[i].shape == nat[i].shape
        assert (ref[i] == nat[i]).all()


def test_myers_packed_kernel_interpret():
    """Packed-pattern kernel (on-device Peq/sel expansion) must equal the
    plane-input kernel and the exact DP on ACGT pairs, including word
    boundaries (m = 31, 32, 33...) and padded slots."""
    import jax.numpy as jnp

    from otter_tpu.kernels import myers_pallas as mp

    rng = random.Random(4321)

    def acgt(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    pairs = []
    for m in (1, 2, 31, 32, 33, 63, 64, 65, 120):
        s = acgt(m)
        pairs.append((s, mutate(rng, s, 0.1)))
    for _ in range(40):
        m = rng.randint(1, 128)
        n = rng.randint(m, 256)
        pairs.append((acgt(m), acgt(n)))
    ppack, tpack, nlen, minit, n_prog = mp.pack_for_pallas_packed(
        pairs, 4, 256, batch_pad=mp.PAIRS_PER_PROG)
    got = np.asarray(mp.myers_pallas_packed(
        jnp.asarray(ppack), jnp.asarray(tpack), jnp.asarray(nlen),
        jnp.asarray(minit), 4, 256, interpret=True)).reshape(-1)[:len(pairs)]
    want = [edit_distance(a, b) for a, b in pairs]
    assert got.tolist() == want


def test_myers_pool_kernel_interpret():
    """Sequence-pool path (device-side gather from a deduplicated 2-bit
    pool) must equal the exact DP on an all-vs-all pair set — the workload
    shape it exists for — including shared string objects, equal-length
    orientation ties, and pool/batch padding."""
    import jax.numpy as jnp

    from otter_tpu.kernels import myers_pallas as mp

    rng = random.Random(987)

    def acgt(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    base = acgt(200)
    seqs = [base] + [mutate(rng, base, 0.05) for _ in range(9)]
    seqs.append(acgt(200))  # equal-length pair -> orientation tie
    pairs = [(seqs[i], seqs[j]) for i in range(len(seqs))
             for j in range(i + 1, len(seqs))]
    dev = mp.myers_pool_dispatch(pairs, 8, 256, interpret=True,
                                 pad_to=mp.PAIRS_PER_PROG)
    assert dev is not None  # 55 pairs over 11 seqs: dedup must engage
    got = np.asarray(dev).reshape(-1)[: len(pairs)]
    want = [edit_distance(a, b) for a, b in pairs]
    assert got.tolist() == want


def test_myers_pool_declines_unique_pairs():
    """A full batch of unique pairs with short patterns against long texts:
    pool rows are W_pool = max(2*n_words, n_twords) wide, so storing each
    200 bp pattern at 512 bp width costs more than the direct per-pair
    planes -> returns None (the caller uses the direct path)."""
    from otter_tpu.kernels import myers_pallas as mp

    rng = random.Random(988)

    def acgt(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    pairs = [(acgt(200), acgt(500)) for _ in range(mp.PAIRS_PER_PROG)]
    assert mp.myers_pool_dispatch(pairs, 8, 512, interpret=True,
                                  pad_to=mp.PAIRS_PER_PROG) is None


def test_engine_pool_route_parity():
    """Engine distances over an all-vs-all set route through the pool path
    and stay byte-identical to the numpy oracle."""
    rng = random.Random(989)

    def acgt(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    base = acgt(300)
    seqs = [base] + [mutate(rng, base, 0.08) for _ in range(11)]
    pairs = [(seqs[i], seqs[j]) for i in range(len(seqs))
             for j in range(i + 1, len(seqs))]
    eng = EditDistanceEngine(mode="pallas", interpret=True)
    got = eng.distances(pairs)
    want = np.array([edit_distance(a, b) for a, b in pairs])
    assert np.array_equal(got, want)


def test_myers_fused_kernel_interpret():
    """Direct coverage for the fused-input kernel (the default dispatch
    route, myers_pallas.py::myers_dispatch): pack_for_pallas_packed +
    fuse_packed_planes -> myers_pallas_fused must equal the exact DP,
    including word-boundary pattern lengths and padded slots (ADVICE r3)."""
    import jax.numpy as jnp

    from otter_tpu.kernels import myers_pallas as mp

    rng = random.Random(97531)

    def acgt(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    pairs = []
    for m in (1, 31, 32, 33, 63, 64, 65, 127, 128):
        s = acgt(m)
        pairs.append((s, mutate(rng, s, 0.08)))
    for _ in range(40):
        m = rng.randint(1, 128)
        n = rng.randint(m, 256)
        pairs.append((acgt(m), acgt(n)))
    ppack, tpack, nlen, minit, n_prog = mp.pack_for_pallas_packed(
        pairs, 4, 256, batch_pad=mp.PAIRS_PER_PROG)
    fused = mp.fuse_packed_planes(ppack, tpack, nlen, minit, n_prog)
    got = np.asarray(mp.myers_pallas_fused(
        jnp.asarray(fused), 4, 256, interpret=True)).reshape(-1)[:len(pairs)]
    want = [edit_distance(a, b) for a, b in pairs]
    assert got.tolist() == want


def test_engine_indexed_dispatch_parity():
    """distances_indexed (the assemble pipeline's vectorized-routing entry,
    models/assemble.py::_dispatch_batch) matches the list API and the numpy
    oracle, including the equal-object shortcut, non-ACGT fallback and
    mixed-length bucketing."""
    rng = random.Random(4242)

    def acgt(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    base = acgt(200)
    seqs = [base] + [mutate(rng, base, 0.05) for _ in range(6)]
    seqs.append(acgt(90))
    seqs.append("ACGTN" * 30)          # non-ACGT -> banded fallback
    seqs.append(acgt(400))             # different nw bucket
    xi, yi = [], []
    for i in range(len(seqs)):
        for j in range(i, len(seqs)):  # includes i == j (shortcut)
            xi.append(i)
            yi.append(j)
    eng = EditDistanceEngine(mode="pallas", interpret=True)
    got = eng.distances_indexed(seqs, np.asarray(xi), np.asarray(yi))
    pairs = [(seqs[a], seqs[b]) for a, b in zip(xi, yi)]
    want = np.array([edit_distance(x, y) for x, y in pairs])
    assert np.array_equal(got, want)
    got_list = eng.distances(pairs)
    assert np.array_equal(got_list, want)
