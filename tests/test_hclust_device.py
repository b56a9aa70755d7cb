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


def test_cluter_to_e_device_route_matches_host(monkeypatch):
    """Forced device route through the cohort cluster path == host clusters;
    tie-bearing matrices fall back (otterclust.cpp:329-349 parity)."""
    from otter_tpu.ops.cluster import cluter_to_e
    from otter_tpu.ops.distmat import DistMatrix

    rng = random.Random(7)
    for trial in range(6):
        n = rng.randrange(4, 20)
        vals = np.array([rng.random() for _ in range(n * (n - 1) // 2)])
        dm_h = DistMatrix(n, vals.copy())
        dm_d = DistMatrix(n, vals.copy())
        monkeypatch.setenv("OTTER_TPU_HCLUST_DEVICE", "0")
        host_clusters = cluter_to_e(0.4, n, dm_h)
        monkeypatch.setenv("OTTER_TPU_HCLUST_DEVICE", "1")
        dev_clusters = cluter_to_e(0.4, n, dm_d)
        assert host_clusters == dev_clusters, trial


def test_cluter_to_e_tie_matrix_falls_back(monkeypatch):
    """Duplicate condensed values (the 3-decimal cosine rounding case) must
    take the host NN-chain even when the device is forced."""
    from otter_tpu.ops import cluster as cl
    from otter_tpu.ops.distmat import DistMatrix

    n = 8
    vals = np.round(np.linspace(0.1, 0.9, n * (n - 1) // 2), 1)  # many ties
    called = {"device": False}

    import otter_tpu.ops.hclust_device as hd
    orig = hd.hclust_average_device

    def spy(condensed, nn, n_pad=0):
        called["device"] = True
        return orig(condensed, nn, n_pad)

    monkeypatch.setattr(hd, "hclust_average_device", spy)
    monkeypatch.setenv("OTTER_TPU_HCLUST_DEVICE", "1")
    dm = DistMatrix(n, vals.copy())
    out = cl.cluter_to_e(0.4, n, dm)
    assert called["device"] is False
    monkeypatch.setenv("OTTER_TPU_HCLUST_DEVICE", "0")
    assert out == cl.cluter_to_e(0.4, n, DistMatrix(n, vals.copy()))
