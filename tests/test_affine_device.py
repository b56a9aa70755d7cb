"""Device affine on-device-traceback kernel parity (interpret mode on CPU)."""

import random

import numpy as np

from otter_tpu.kernels.affine_pallas import affine_cigars_device_tb
from otter_tpu.ops.align_batch import affine_cigars_multi
from otter_tpu.ops.align_np import affine_align_ends_free_cigar


def _jobs(rng, n, lo=60, hi=140):
    def rand_seq(m):
        return "".join(rng.choice("ACGT") for _ in range(m))

    def mut(s, rate):
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

    jobs = []
    for _ in range(n):
        p = rand_seq(rng.randrange(lo, hi))
        t = mut(p, rng.choice([0.01, 0.06]))
        ld = len(p) - len(t)
        kind = rng.randrange(4)
        if kind == 1 and ld > 0:
            jobs.append((p, t, 0, ld, 0, 0))
        elif kind == 2 and ld < 0:
            jobs.append((p, t, 0, 0, 0, -ld))
        elif kind == 3:
            jobs.append((p, t, max(0, ld // 2), max(0, ld // 2), 0, 0))
        else:
            jobs.append((p, t, 0, 0, 0, 0))
    return jobs


def test_device_affine_tb_interpret_matches_host():
    """On-device-traceback kernel: identical cigars to the host path."""
    rng = random.Random(14)
    jobs = _jobs(rng, 10)
    cigs, failed = affine_cigars_device_tb(jobs, interpret=True)
    want = [affine_align_ends_free_cigar(j[0], j[1], *j[2:]) for j in jobs]
    for i in range(len(jobs)):
        if i not in failed:
            assert cigs[i] == want[i], i
    # k=127 wide band picks up what k=63 can't; few true escalations remain
    assert len(failed) < len(jobs)


def test_device_affine_tb_long_pattern_interpret():
    """>128-row patterns cross bits-scratch chunk boundaries; exactness must
    hold (walk reads rows written by different outer-loop chunks)."""
    rng = random.Random(77)
    jobs = _jobs(rng, 2)
    p = "".join(rng.choice("ACGT") for _ in range(300))
    t = list(p)
    t[40] = "A" if p[40] != "A" else "C"
    del t[200:203]
    jobs.append((p, "".join(t), 0, 0, 0, 0))
    cigs, failed = affine_cigars_device_tb(jobs, interpret=True)
    want = [affine_align_ends_free_cigar(j[0], j[1], *j[2:]) for j in jobs]
    for i in range(len(jobs)):
        if i not in failed:
            assert cigs[i] == want[i], i
    assert len(jobs) - 1 not in failed


def test_device_affine_tb_nibble_packed_long_buckets():
    """Patterns past the old 1024-row cap run on device via the
    nibble-packed traceback scratch (2 rows/byte): a ~1.3 kb low-error job
    lands in the (k=63, 2048-row) bucket, a deletion-heavy variant in the
    (k=127, 2048-row) bucket; both must match the host ladder exactly."""
    from otter_tpu.kernels.affine_pallas import _rows_bucket

    rng = random.Random(99)
    p = "".join(rng.choice("ACGT") for _ in range(1300))
    assert _rows_bucket(len(p)) == 2048
    # low error -> narrow band
    t = list(p)
    t[97] = "A" if p[97] != "A" else "C"
    del t[701:703]
    t.insert(1100, "G")
    jobs = [(p, "".join(t), 0, 0, 0, 0)]
    # ~100 bp net deletion -> reach forces the wide band
    t2 = list(p)
    del t2[400:500]
    jobs.append((p, "".join(t2), 0, 100, 0, 0))
    cigs, failed = affine_cigars_device_tb(jobs, interpret=True)
    want = [affine_align_ends_free_cigar(j[0], j[1], *j[2:]) for j in jobs]
    assert failed == []
    assert cigs == want


def test_device_affine_tb_dist_hints_route_bands():
    """dist_hints send low-error jobs to k=63 and high-error jobs to k=127
    without changing results."""
    from otter_tpu.ops.align_np import edit_distance_ends_free

    rng = random.Random(31)
    jobs = _jobs(rng, 8, lo=100, hi=200)
    hints = np.array([edit_distance_ends_free(j[0], j[1], *j[2:])
                      for j in jobs])
    cigs, failed = affine_cigars_device_tb(jobs, interpret=True,
                                           dist_hints=hints)
    want = [affine_align_ends_free_cigar(j[0], j[1], *j[2:]) for j in jobs]
    for i in range(len(jobs)):
        if i not in failed:
            assert cigs[i] == want[i], i


def test_band_validity_cap_is_sound_and_band_independent():
    """Randomized soundness check of band_validity_cap: whenever the banded
    score beats the cap, it must equal the full-matrix optimum AND the
    banded traceback must be identical to the full-matrix traceback (the
    band-independence property the device kernel relies on)."""
    from otter_tpu.ops.align_np import (
        _affine_end_cell,
        _affine_matrices,
        _codes,
        band_validity_cap,
    )
    from otter_tpu.ops.align_batch import (
        _banded_batch_multi,
        _end_cell,
        _MemberView,
        _traceback,
    )

    rng = random.Random(5)
    checked = 0
    for trial in range(120):
        m = rng.randrange(20, 90)
        p = "".join(rng.choice("ACGT") for _ in range(m))
        t = list(p)
        # random edits incl. occasional large indels that stress the cap
        for _ in range(rng.randrange(0, 4)):
            pos = rng.randrange(0, max(1, len(t) - 1))
            r = rng.random()
            if r < 0.4:
                t[pos] = rng.choice("ACGT")
            elif r < 0.7:
                t.insert(pos, "".join(rng.choice("ACGT")
                                      for _ in range(rng.randrange(1, 12))))
            else:
                del t[pos : pos + rng.randrange(1, 12)]
        t = "".join("".join(x) for x in t)
        frees = [0, 0, 0, 0]
        if rng.random() < 0.5:
            frees[rng.randrange(4)] = rng.randrange(0, 15)
        pb, pe, tb, te = frees
        a, b = _codes(p), _codes(t)
        n = len(b)
        k = max(rng.choice([8, 12, 16, 24]), abs(n - m) + 2)
        H, E, F, ms, ns = _banded_batch_multi(
            [a], [b], k, np.array([pb]), np.array([tb]))
        Hv = _MemberView(H[0], k)
        Ev = _MemberView(E[0], k)
        Fv = _MemberView(F[0], k)
        score, ei, ej = _end_cell(Hv, m, n, pe, te)
        cap = band_validity_cap(m, n, pb, pe, tb, te, k)
        if score >= cap:
            continue
        checked += 1
        Hf, Ef, Ff = _affine_matrices(a, b, pb=pb, tb=tb)
        fscore, fei, fej = _affine_end_cell(Hf, m, n, pe, te)
        assert score == fscore, (trial, score, fscore)
        banded_cig = _traceback(Hv, Ev, Fv, a, b, m, n, ei, ej)
        full_cig = _traceback(Hf, Ef, Ff, a, b, m, n, fei, fej)
        assert banded_cig == full_cig, trial
    assert checked >= 30  # the cap must actually certify a good fraction


def test_device_affine_tb_walk_budget_boundary():
    """Alone-worst walk accounting (_T_WORDS proof): a valid member whose
    walk spends the free-begin I tail + scored gaps + full diagonal still
    finishes on device — and deep-pe jobs far past the old loose bound
    (score >> GAP_OPEN + GAP_EXT*(k+1-reach)) are certified by the tight
    cap instead of burning a guaranteed-failed pass."""
    rng = random.Random(123)
    p = "".join(rng.choice("ACGT") for _ in range(250))
    # free text begin (walked as the I tail) + a 20bp del + a 15bp ins
    pre = "".join(rng.choice("ACGT") for _ in range(60))
    t = list(p)
    del t[100:120]
    t.insert(200, "".join(rng.choice("ACGT") for _ in range(15)))
    text = pre + "".join("".join(x) for x in t)
    jobs = [(p, text, 0, 0, 60, 0)]
    cigs, failed = affine_cigars_device_tb(jobs, interpret=True)
    assert failed == []
    want = [affine_align_ends_free_cigar(j[0], j[1], *j[2:]) for j in jobs]
    assert cigs == want


def _scatter_mutate(rng, p, n_mismatch, dels, inss):
    """Apply n_mismatch scattered substitutions plus the given (pos, len)
    deletions/insertions to p; returns the mutated text."""
    t = list(p)
    for pos, ln in dels:
        del t[pos : pos + ln]
    for pos, ln in inss:
        t.insert(pos, "".join(rng.choice("ACGT") for _ in range(ln)))
    flat = list("".join("".join(x) for x in t))
    for _ in range(n_mismatch):
        pos = rng.randrange(len(flat))
        flat[pos] = rng.choice([b for b in "ACGT" if b != flat[pos]])
    return "".join(flat)


def test_device_affine_ckpt_kernel_ont_regime():
    """k=255 checkpointed kernel: a high-error member (score ~800, beyond
    k=127's validity cap) gets its cigar from the device, byte-identical
    to the host ladder. This is the WFA regime the nibble kernels
    mathematically exclude (VERDICT r2 missing #1)."""
    from otter_tpu.ops.align_np import edit_distance_ends_free

    rng = random.Random(7)
    p = "".join(rng.choice("ACGT") for _ in range(950))
    t = _scatter_mutate(rng, p, 50, [(200, 150)], [(500, 150)])
    jobs = [(p, t, 0, 0, 0, 0)]
    hints = [edit_distance_ends_free(*jobs[0])]
    cigs, failed = affine_cigars_device_tb(jobs, interpret=True,
                                           dist_hints=hints)
    want = [affine_align_ends_free_cigar(j[0], j[1], *j[2:]) for j in jobs]
    assert failed == []
    assert cigs == want


def test_device_affine_ckpt_kernel_k511():
    """k=511 checkpointed kernel: 250 bp indel wander whose score exceeds
    even k=255's cap; the hint routes straight to k=511."""
    from otter_tpu.ops.align_np import edit_distance_ends_free

    rng = random.Random(8)
    p = "".join(rng.choice("ACGT") for _ in range(700))
    t = _scatter_mutate(rng, p, 25, [(100, 250)], [(380, 250)])
    jobs = [(p, t, 0, 0, 0, 0)]
    hints = [edit_distance_ends_free(*jobs[0])]
    cigs, failed = affine_cigars_device_tb(jobs, interpret=True,
                                           dist_hints=hints)
    want = [affine_align_ends_free_cigar(j[0], j[1], *j[2:]) for j in jobs]
    assert failed == []
    assert cigs == want


def test_device_affine_escalates_bands_without_hints():
    """Without dist hints a high-error job starts at k=63, fails its
    validity cap, and escalates on device (k=127 -> k=255) instead of
    falling back to the host ladder."""
    rng = random.Random(9)
    p = "".join(rng.choice("ACGT") for _ in range(400))
    t = _scatter_mutate(rng, p, 30, [(60, 140)], [(200, 140)])
    jobs = [(p, t, 0, 0, 0, 0)]
    cigs, failed = affine_cigars_device_tb(jobs, interpret=True)
    want = [affine_align_ends_free_cigar(j[0], j[1], *j[2:]) for j in jobs]
    assert failed == []
    assert cigs == want


def test_device_affine_ckpt_multiblock_boundary():
    """A >256-row pattern in the checkpointed kernel crosses block
    boundaries: the walk reads bits recomputed from different checkpoints
    (exactness across the block seam)."""
    from otter_tpu.ops.align_np import edit_distance_ends_free

    rng = random.Random(10)
    p = "".join(rng.choice("ACGT") for _ in range(1100))
    # edits placed either side of the row-256/512/768 block seams
    t = _scatter_mutate(rng, p, 40, [(250, 130), (760, 10)], [(520, 160)])
    jobs = [(p, t, 0, 0, 0, 0)]
    hints = [edit_distance_ends_free(*jobs[0])]
    cigs, failed = affine_cigars_device_tb(jobs, interpret=True,
                                           dist_hints=hints)
    want = [affine_align_ends_free_cigar(j[0], j[1], *j[2:]) for j in jobs]
    assert failed == []
    assert cigs == want


def test_ckpt_kernel_equals_nibble_kernel_same_bucket():
    """The checkpointed kernel now also serves NARROW bands for rows past
    the nibble caps (16 kb long-read members). At shapes both kernels
    support they must produce identical packed walks and end info — same
    DP, same tie order, same budgets."""
    import numpy as np

    from otter_tpu.kernels.affine_pallas import (_t_words,
                                                 affine_tb_ckpt_pallas,
                                                 affine_tb_pallas,
                                                 pack_affine_jobs)

    rng = random.Random(21)
    jobs = _jobs(rng, 6, lo=120, hi=250)
    k, max_rows = 63, 256
    a, bpad, mn = pack_affine_jobs(jobs, max_rows, k)
    tw = _t_words(max_rows, k)
    o1, e1 = affine_tb_pallas(a, bpad, mn, k, max_rows, tw, interpret=True)
    o2, e2 = affine_tb_ckpt_pallas(a, bpad, mn, k, max_rows, tw,
                                   interpret=True)
    assert np.array_equal(np.asarray(e1), np.asarray(e2))
    assert np.array_equal(np.asarray(o1), np.asarray(o2))


def test_multi_with_device_flag_falls_back_cleanly():
    """With the flag on but no TPU (CPU test env), the host path still
    produces complete, correct results."""
    rng = random.Random(15)
    jobs = _jobs(rng, 6)
    got = affine_cigars_multi(jobs, use_device=True)
    want = [affine_align_ends_free_cigar(j[0], j[1], *j[2:]) for j in jobs]
    assert got == want


def test_admissible_bands_het_indel_long_rows():
    """10 kb medium-error members (a het indel + scattered errors) must be
    servable on device: the giant-bucket score estimate splits the hint
    into gap chars (~2/edit) and the rest (~5/edit), so e=330 with a
    300 bp length difference admits k=511 at full row depth instead of
    falling back to the native ladder (refscale consensus regression,
    round 4)."""
    from otter_tpu.kernels.affine_pallas import (LP_MAX_ONT, LP_MAX_XWIDE,
                                                 _admissible_bands)

    assert LP_MAX_XWIDE >= 16384 and LP_MAX_ONT >= 16384
    bands = _admissible_bands(10300, 10001, 0, 0, 0, 0, 330)
    assert 511 in bands, bands
    # mismatch-dominated long jobs (no length diff) still reject doomed
    # wide-band passes: e=500 of pure mismatches estimates ~2500 > the
    # k=511 cap (~2060 for equal lengths)
    bands_mm = _admissible_bands(10300, 10300, 0, 0, 0, 0, 500)
    assert bands_mm == [], bands_mm
