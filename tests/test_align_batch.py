"""Batched affine aligner must exactly match the scalar path."""

import random

from otter_tpu.ops.align_batch import affine_cigars_batch
from otter_tpu.ops.align_np import affine_align_ends_free_cigar


def rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def mut(rng, s, rate):
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


def test_batch_matches_scalar():
    rng = random.Random(8)
    for trial in range(8):
        pattern = rand_seq(rng, rng.randrange(80, 400))
        jobs = []
        for _ in range(12):
            t = mut(rng, pattern, rng.choice([0.01, 0.05, 0.12]))
            ld = len(pattern) - len(t)
            kind = rng.randrange(4)
            if kind == 0:
                jobs.append((t, 0, 0, 0, 0))
            elif kind == 1 and ld > 0:
                jobs.append((t, 0, ld, 0, 0))
            elif kind == 2 and ld < 0:
                jobs.append((t, 0, 0, 0, -ld))
            else:
                jobs.append((t, max(0, ld // 2), max(0, ld // 2), 0, 0))
        got = affine_cigars_batch(pattern, jobs)
        want = [affine_align_ends_free_cigar(pattern, *j[:1], *j[1:])
                for j in jobs]
        assert got == want, trial


def test_batch_with_divergent_member():
    """A member needing band escalation falls back to the scalar path."""
    rng = random.Random(9)
    pattern = rand_seq(rng, 200)
    jobs = [
        (mut(rng, pattern, 0.02), 0, 0, 0, 0),
        (rand_seq(rng, 210), 0, 0, 0, 0),  # unrelated -> huge distance
        (mut(rng, pattern, 0.01), 0, 0, 0, 0),
    ]
    got = affine_cigars_batch(pattern, jobs)
    want = [affine_align_ends_free_cigar(pattern, *j[:1], *j[1:])
            for j in jobs]
    assert got == want


def test_native_affine_parity_scalar():
    """The native C++ banded engine emits byte-identical cigars to the
    scalar host path across free-end shapes, error rates, and the
    full-matrix band (native/otter_native.cpp::otter_affine_banded_batch)."""
    import os
    import random

    from otter_tpu.ops.align_batch import affine_cigars_multi
    from otter_tpu.ops.align_np import affine_align_ends_free_cigar

    rng = random.Random(19)

    def rseq(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    def mutate(s, rate):
        out = []
        for ch in s:
            x = rng.random()
            if x < rate / 3:
                out.append(rng.choice("ACGT"))
            elif x < 2 * rate / 3:
                out.extend([ch, rng.choice("ACGT")])
            elif x < rate:
                pass
            else:
                out.append(ch)
        return "".join(out)

    jobs = []
    for _ in range(14):
        p = rseq(rng.randint(50, 600))
        t = mutate(p, rng.choice([0.03, 0.2]))
        ld = abs(len(t) - len(p))
        mode = rng.randint(0, 3)
        if mode == 0:
            jobs.append((p, t, 0, 0, 0, 0))
        elif mode == 1:
            jobs.append((p, t, ld, 0, 0, 0))
        elif mode == 2:
            jobs.append((p, t, 0, 0, 0, ld))
        else:
            jobs.append((p, t, ld // 2, ld - ld // 2, 0, 0))
    p = rseq(800)
    jobs.append((p, p[:200] + p[600:], 0, 0, 0, 0))  # big deletion
    jobs.append(("A", "T", 0, 0, 0, 0))
    want = [affine_align_ends_free_cigar(*j) for j in jobs]
    prev = os.environ.get("OTTER_TPU_NATIVE_AFFINE")
    try:
        os.environ["OTTER_TPU_NATIVE_AFFINE"] = "1"
        got = affine_cigars_multi(jobs)
    finally:
        if prev is None:
            os.environ.pop("OTTER_TPU_NATIVE_AFFINE", None)
        else:
            os.environ["OTTER_TPU_NATIVE_AFFINE"] = prev
    assert got == want


def test_edit_cigar_cols_batch_matches_scalar():
    """Batched composite (edit, cols) DP == scalar edit_align_cigar_len,
    including pure-indel and equal-pair closed forms, wrong-hint fallback,
    and high-divergence bands (compare's hot op)."""
    import random

    from otter_tpu.ops.align_batch import edit_cigar_cols_batch
    from otter_tpu.ops.align_np import edit_align_cigar_len, edit_distance

    rng = random.Random(17)

    def acgt(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

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

    pairs = []
    for _ in range(60):
        m = rng.randint(1, 300)
        p = acgt(m)
        t = mut(p, rng.choice([0.0, 0.02, 0.1, 0.5]))
        if len(t) > len(p):
            p, t = t, p
        pairs.append((p, t))
    pairs.append(("ACGT" * 20, "ACGT" * 20))          # equal
    pairs.append(("ACGT" * 30, "ACGT" * 20))          # pure indel
    pairs.append(("A" * 50, ""))                       # empty text
    dists = [edit_distance(p, t) for p, t in pairs]
    got = edit_cigar_cols_batch(pairs, dists)
    want = [edit_align_cigar_len(p, t) for p, t in pairs]
    assert got == want
    # wrong (too-small) hints must still give exact results via fallback
    bad_hints = [max(0, d - 5) for d in dists]
    got2 = edit_cigar_cols_batch(pairs, bad_hints)
    assert got2 == want
