"""Multi-device sharded region-step tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from __graft_entry__ import dryrun_multichip, entry


def test_eight_cpu_devices():
    assert len(jax.devices()) >= 8


def test_entry_compiles_and_runs():
    fn, args = entry()
    dists, dens = jax.jit(fn)(*args)
    assert dens.shape[1] == 401
    assert np.all(np.isfinite(np.asarray(dens)))


def test_dryrun_multichip_8():
    dryrun_multichip(8)


def test_dryrun_multichip_2():
    dryrun_multichip(2)


def test_sharded_matches_single_device():
    from otter_tpu.parallel.mesh import make_mesh, run_sharded_region_step
    from __graft_entry__ import _example_pair_batch

    a, bp, mn, rid, valid, k, L = _example_pair_batch(n_pairs=32)
    bw = np.full(2, 0.01, dtype=np.float32)
    out1 = run_sharded_region_step(make_mesh(1), a, bp, mn[:, 0], mn[:, 1],
                                   rid, valid, bw, k=k, max_rows=L,
                                   n_regions=2)
    out8 = run_sharded_region_step(make_mesh(8), a, bp, mn[:, 0], mn[:, 1],
                                   rid, valid, bw, k=k, max_rows=L,
                                   n_regions=2)
    np.testing.assert_array_equal(np.asarray(out1[0]), np.asarray(out8[0]))
    np.testing.assert_allclose(np.asarray(out1[1]), np.asarray(out8[1]),
                               rtol=1e-5)
