"""Alignment oracle tests: edit distance vs brute force, ends-free, affine."""

import random

import numpy as np
import pytest

from otter_tpu.ops.align_np import (
    GAP_EXT,
    GAP_OPEN,
    MISMATCH,
    affine_align_cigar,
    affine_align_ends_free_cigar,
    edit_align_cigar_len,
    edit_distance,
    edit_distance_ends_free,
)


def brute_edit(x, y):
    m, n = len(x), len(y)
    D = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        D[i][0] = i
    for j in range(n + 1):
        D[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            D[i][j] = min(D[i - 1][j] + 1, D[i][j - 1] + 1,
                          D[i - 1][j - 1] + (x[i - 1] != y[j - 1]))
    return D[m][n]


def rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def test_edit_distance_basic():
    assert edit_distance("", "") == 0
    assert edit_distance("A", "") == 1
    assert edit_distance("", "ACG") == 3
    assert edit_distance("ACGT", "ACGT") == 0
    assert edit_distance("ACGT", "AGGT") == 1
    assert edit_distance("AAAA", "AAA") == 1
    assert edit_distance("kitten", "sitting") == 3


def test_edit_distance_random_vs_brute():
    rng = random.Random(42)
    for _ in range(60):
        x = rand_seq(rng, rng.randrange(0, 40))
        y = rand_seq(rng, rng.randrange(0, 40))
        assert edit_distance(x, y) == brute_edit(x, y), (x, y)


def brute_edit_ends_free(p, t, pb, pe, tb, te):
    m, n = len(p), len(t)
    D = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        D[i][0] = max(0, i - pb)
    for j in range(n + 1):
        D[0][j] = max(0, j - tb)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            D[i][j] = min(D[i - 1][j] + 1, D[i][j - 1] + 1,
                          D[i - 1][j - 1] + (p[i - 1] != t[j - 1]))
    best = min(D[m][j] for j in range(max(0, n - te), n + 1))
    best = min(best, min(D[i][n] for i in range(max(0, m - pe), m + 1)))
    return best


def test_ends_free_random_vs_brute():
    rng = random.Random(3)
    for _ in range(60):
        p = rand_seq(rng, rng.randrange(1, 30))
        t = rand_seq(rng, rng.randrange(1, 30))
        pb, pe = rng.randrange(0, 10), rng.randrange(0, 10)
        tb, te = rng.randrange(0, 10), rng.randrange(0, 10)
        assert edit_distance_ends_free(p, t, pb, pe, tb, te) == \
            brute_edit_ends_free(p, t, pb, pe, tb, te)


def test_ends_free_prefix_suffix():
    # text has an extra suffix, free end gap on text absorbs it
    assert edit_distance_ends_free("ACGT", "ACGTTTT", 0, 0, 0, 3) == 0
    assert edit_distance_ends_free("ACGT", "TTTACGT", 0, 0, 3, 0) == 0
    assert edit_distance_ends_free("ACGT", "TTTACGT", 0, 0, 0, 3) == 3


def cigar_cost(cigar):
    cost = 0
    in_gap = None
    for op in cigar:
        if op == "X":
            cost += MISMATCH
            in_gap = None
        elif op in "ID":
            if in_gap != op:
                cost += GAP_OPEN
            cost += GAP_EXT
            in_gap = op
        else:
            in_gap = None
    return cost


def cigar_consumes(cigar):
    p = sum(1 for c in cigar if c in "MXD")
    t = sum(1 for c in cigar if c in "MXI")
    return p, t


def brute_affine_score(p, t):
    """O(mn) affine DP score for validation."""
    INF = 1 << 30
    m, n = len(p), len(t)
    H = [[INF] * (n + 1) for _ in range(m + 1)]
    E = [[INF] * (n + 1) for _ in range(m + 1)]
    F = [[INF] * (n + 1) for _ in range(m + 1)]
    H[0][0] = 0
    for j in range(1, n + 1):
        E[0][j] = min(H[0][j - 1] + GAP_OPEN + GAP_EXT, E[0][j - 1] + GAP_EXT)
        H[0][j] = E[0][j]
    for i in range(1, m + 1):
        F[i][0] = min(H[i - 1][0] + GAP_OPEN + GAP_EXT, F[i - 1][0] + GAP_EXT)
        H[i][0] = F[i][0]
        for j in range(1, n + 1):
            E[i][j] = min(H[i][j - 1] + GAP_OPEN + GAP_EXT, E[i][j - 1] + GAP_EXT)
            F[i][j] = min(H[i - 1][j] + GAP_OPEN + GAP_EXT, F[i - 1][j] + GAP_EXT)
            sub = 0 if p[i - 1] == t[j - 1] else MISMATCH
            H[i][j] = min(H[i - 1][j - 1] + sub, E[i][j], F[i][j])
    return H[m][n]


def test_affine_cigar_validity_and_optimality():
    rng = random.Random(9)
    for _ in range(50):
        p = rand_seq(rng, rng.randrange(1, 30))
        t = rand_seq(rng, rng.randrange(1, 30))
        cig = affine_align_cigar(p, t)
        cp, ct = cigar_consumes(cig)
        assert cp == len(p) and ct == len(t), (p, t, cig)
        assert cigar_cost(cig) == brute_affine_score(p, t), (p, t, cig)
        # M ops must be true matches, X true mismatches
        i = j = 0
        for op in cig:
            if op == "M":
                assert p[i] == t[j]
                i += 1
                j += 1
            elif op == "X":
                assert p[i] != t[j]
                i += 1
                j += 1
            elif op == "D":
                i += 1
            else:
                j += 1


def test_affine_gap_right_aligned():
    # WFA extends matches greedily: edits land after maximal match runs
    assert affine_align_cigar("AAAA", "AAA") == "MMMD"
    assert affine_align_cigar("AAA", "AAAA") == "MMMI"
    assert affine_align_cigar("ACGTACGT", "ACGTCGT") == "MMMMDMMM"


def test_affine_ends_free_cigar():
    cig = affine_align_ends_free_cigar("ACGT", "ACGTTT", 0, 0, 0, 2)
    assert cig == "MMMMII"
    assert cigar_consumes(cig) == (4, 6)
    cig2 = affine_align_ends_free_cigar("ACGTAA", "ACGT", 0, 2, 0, 0)
    assert cig2 == "MMMMDD"


def test_edit_align_cigar_len():
    e, ops = edit_align_cigar_len("ACGT", "ACGT")
    assert e == 0 and ops == 4
    e, ops = edit_align_cigar_len("ACGT", "AGGT")
    assert e == 1 and ops == 4
    e, ops = edit_align_cigar_len("AAAA", "AAA")
    assert e == 1 and ops == 4
