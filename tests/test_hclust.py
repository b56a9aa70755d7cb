"""hclust parity tests: NN-chain average linkage vs a brute-force O(n^3)
average-linkage implementation (unique distances -> unique dendrogram), and
cutree semantics."""

import random

import numpy as np

from otter_tpu.ops.hclust import (
    cutree_cdist,
    cutree_k,
    hclust_average,
    nn_chain_average,
)


def brute_average_linkage(n, condensed):
    """Greedy agglomeration picking the global min average-linkage distance.
    Returns merge heights (sorted) and the partition at any cut level."""
    D = np.zeros((n, n))
    iu = np.triu_indices(n, 1)
    D[iu] = condensed
    D += D.T
    np.fill_diagonal(D, np.inf)
    clusters = {i: [i] for i in range(n)}
    heights = []
    steps = []
    while len(clusters) > 1:
        keys = sorted(clusters)
        best = None
        for ai in range(len(keys)):
            for bi in range(ai + 1, len(keys)):
                a, b = keys[ai], keys[bi]
                d = np.mean([D[x, y] for x in clusters[a] for y in clusters[b]])
                if best is None or d < best[0]:
                    best = (d, a, b)
        d, a, b = best
        heights.append(d)
        steps.append((sorted(clusters[a] + clusters[b]), d))
        clusters[a] = clusters[a] + clusters[b]
        del clusters[b]
    return heights, steps


def test_nn_chain_heights_match_brute():
    rng = random.Random(5)
    for trial in range(20):
        n = rng.randrange(3, 12)
        condensed = np.array([rng.random() for _ in range(n * (n - 1) // 2)])
        merge, height = hclust_average(n, condensed)
        bh, _ = brute_average_linkage(n, condensed)
        assert np.allclose(sorted(height), sorted(bh)), trial
        # heights from hclust_average are sorted by construction
        assert np.all(np.diff(height) >= -1e-12)


def test_cutree_partitions_match_brute():
    rng = random.Random(11)
    for trial in range(20):
        n = rng.randrange(4, 12)
        condensed = np.array([rng.random() for _ in range(n * (n - 1) // 2)])
        merge, height = hclust_average(n, condensed)
        bh, steps = brute_average_linkage(n, condensed)
        # cut between consecutive merge heights -> partitions must agree
        cut = (bh[len(bh) // 2] + bh[len(bh) // 2 - 1]) / 2 if len(bh) > 1 else 0.5
        labels = cutree_cdist(n, merge, height, cut)
        # build brute partition at the same cut
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                x = parent[x]
            return x

        for members, d in steps:
            if d >= cut:
                break
            roots = {find(m) for m in members}
            rs = sorted(roots)
            for r in rs[1:]:
                parent[r] = rs[0]
        brute_labels = [find(i) for i in range(n)]
        # compare as partitions
        def canon(ls):
            seen = {}
            out = []
            for l in ls:
                if l not in seen:
                    seen[l] = len(seen)
                out.append(seen[l])
            return out

        assert canon(labels.tolist()) == canon(brute_labels), trial


def test_cutree_k_label_order():
    # 4 points: 0,1 close; 2,3 close; clusters labeled by first occurrence
    #    d(0,1)=.1 d(2,3)=.2 others .9
    n = 4
    condensed = np.array([0.1, 0.9, 0.9, 0.9, 0.9, 0.2])
    merge, height = hclust_average(n, condensed)
    labels = cutree_k(n, merge, 2)
    assert labels.tolist() == [0, 0, 1, 1]
    labels3 = cutree_k(n, merge, 3)
    assert labels3.tolist() == [0, 0, 1, 2] or labels3.tolist() == [0, 0, 1, 1]


def test_cutree_k_edge_cases():
    n = 3
    condensed = np.array([0.1, 0.2, 0.3])
    merge, height = hclust_average(n, condensed)
    assert cutree_k(n, merge, 1).tolist() == [0, 0, 0]
    assert cutree_k(n, merge, 5).tolist() == [0, 0, 0]
    # cut below all heights -> all singletons
    labels = cutree_cdist(n, merge, height, 0.05)
    assert labels.tolist() == [0, 1, 2]


def test_nn_chain_vectorized_matches_scalar_ref():
    """Vectorized NN-chain == scalar oracle, incl. engineered ties."""
    import random

    import numpy as np

    from otter_tpu.ops.hclust import nn_chain_average, nn_chain_average_ref

    rng = random.Random(17)
    for trial in range(30):
        n = rng.choice([3, 5, 17, 40])
        m = n * (n - 1) // 2
        if trial % 3 == 0:
            # heavy ties: quantized distances
            cond = np.asarray([rng.choice([0.1, 0.2, 0.3])
                               for _ in range(m)])
        else:
            cond = np.asarray([rng.random() for _ in range(m)])
        a = nn_chain_average(n, cond.copy())
        b = nn_chain_average_ref(n, cond.copy())
        assert a == b, (trial, n)


def test_native_hclust_exact_parity_with_ties():
    """Native C++ NN-chain vs the python oracle on tie-heavy matrices (the
    cohort regime: cosine distances rounded to 3 decimals, repeated length
    distances). Merges, heights, and cut labels must be IDENTICAL — the
    native path serves the cohort genotype route unguarded."""
    import random

    import numpy as np

    from otter_tpu.native import (hclust_average_native,
                                  hclust_average_native_batch)
    from otter_tpu.ops.hclust import cutree_cdist, hclust_average

    rng = random.Random(77)
    mats = []
    for trial in range(40):
        n = rng.choice([2, 3, 5, 17, 33, 129])
        m = n * (n - 1) // 2
        if trial % 2 == 0:
            # rounded-cosine style: few distinct values -> massive ties
            vals = np.array([rng.randrange(0, 25) / 1000.0
                             for _ in range(m)])
        else:
            vals = np.array([rng.random() for _ in range(m)])
            vals[rng.randrange(m)] = vals[rng.randrange(m)]  # one dup
        mats.append((vals, n))
    batch = hclust_average_native_batch(mats)
    for (vals, n), (bm, bh) in zip(mats, batch):
        merge_p, height_p = hclust_average(n, vals)
        merge_n, height_n = hclust_average_native(vals, n)
        assert np.array_equal(merge_p, merge_n), n
        assert np.array_equal(height_p, height_n), n  # bitwise f64
        assert np.array_equal(bm, merge_n) and np.array_equal(bh, height_n)
        for cd in (0.003, 0.01, 0.3):
            assert np.array_equal(cutree_cdist(n, merge_p, height_p, cd),
                                  cutree_cdist(n, merge_n, height_n, cd))


def test_native_medoid_matches_numpy_all_sizes():
    """otter_medoid_sums must match the numpy cumsum medoid for every
    cluster size — m < 512 runs the single-thread branch (regression:
    worker(0) once strode by n_threads and left half the sums at 0.0,
    silently picking a wrong representative allele)."""
    import os

    import numpy as np

    from otter_tpu.ops.distmat import DistMatrix

    rng = np.random.default_rng(17)
    for n, m in ((100, 30), (700, 600), (80, 79), (600, 3)):
        dm = DistMatrix(n)
        dm.values = rng.random(n * (n - 1) // 2)
        idx = sorted(rng.choice(n, size=m, replace=False).tolist())
        os.environ["OTTER_TPU_NATIVE_MEDOID"] = "0"
        try:
            want = dm.get_medoid(idx)
        finally:
            os.environ.pop("OTTER_TPU_NATIVE_MEDOID", None)
        got = dm.get_medoid(idx)  # native path (n >= 64)
        assert got == want, (n, m, got, want)
        from otter_tpu.native import medoid_sums_native

        sums = medoid_sums_native(dm.values, n, np.asarray(idx))
        assert np.all(sums > 0.0), (n, m)
