"""Device average-linkage vs host NN-chain: identical partitions on
tie-free matrices (heights equal; cutree results equal)."""

import random

import numpy as np

from otter_tpu.ops.hclust import cutree_cdist, cutree_k, hclust_average
from otter_tpu.ops.hclust_device import hclust_average_device


def canon(labels):
    seen = {}
    out = []
    for l in labels:
        if l not in seen:
            seen[l] = len(seen)
        out.append(seen[l])
    return out


def test_device_linkage_matches_host():
    rng = random.Random(41)
    for trial in range(10):
        n = rng.randrange(3, 24)
        condensed = np.array([rng.random() for _ in range(n * (n - 1) // 2)])
        mh, hh = hclust_average(n, condensed)
        md, hd = hclust_average_device(condensed, n)
        assert np.allclose(np.sort(hh), np.sort(hd), atol=1e-5), trial
        for cut in (0.25, 0.5, 0.75):
            lh = cutree_cdist(n, mh, hh, cut)
            ld = cutree_cdist(n, md, hd.astype(np.float64), cut)
            assert canon(lh.tolist()) == canon(ld.tolist()), (trial, cut)
        for kk in (2, 3):
            if kk < n:
                lh = cutree_k(n, mh, kk)
                ld = cutree_k(n, md, kk)
                assert canon(lh.tolist()) == canon(ld.tolist()), (trial, kk)
