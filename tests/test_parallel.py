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


def test_mesh_kde_assemble_identical(tmp_path, monkeypatch):
    """OTTER_TPU_MESH_KDE=1 pools per-region KDE into tree-reduction device
    calls (region-sharded over the 8-device CPU mesh); outputs are
    byte-identical to the host oracle — certified regions use the f32
    densities, uncertain ones are recomputed in float64."""
    import io
    import random

    from fixtures import make_reference, simulate_region_bam
    from otter_tpu.config import OtterOpts
    from otter_tpu.models.assemble import assemble

    rng = random.Random(5)
    ref = make_reference(rng, length=4000, repeat="CAG", repeat_at=2000,
                         repeat_units=30)
    start, end = 2000, 2090
    short = ref[start:end]
    long_a = "CAG" * 45
    bam = str(tmp_path / "m.bam")
    simulate_region_bam(bam, "chr1", ref, (start, end), [short, long_a],
                        per_allele_cov=8, error_rate=0.01, seed=7)
    bed = str(tmp_path / "r.bed")
    with open(bed, "w") as fh:
        fh.write(f"chr1\t{start}\t{end}\n")

    def run(device, mesh):
        if mesh:
            monkeypatch.setenv("OTTER_TPU_MESH_KDE", "1")
        else:
            monkeypatch.delenv("OTTER_TPU_MESH_KDE", raising=False)
        p = OtterOpts()
        p.read_group = "S1"
        p.device = device
        out = io.StringIO()
        assemble(bam, bed, "", False, p, out=out)
        return out.getvalue()

    host = run("host", False)
    mesh = run("cpu", True)
    assert host == mesh


def test_mesh_ends_free_matches_host():
    """Engine ends_free in mesh mode (jnp pair-sharded banded pass) ==
    host numpy ladder == scalar oracle (reassignment + band-seed jobs,
    analignments.cpp:34-63 one-sided frees and general shapes)."""
    import random

    import numpy as np

    from otter_tpu.kernels.edit_pallas import EditDistanceEngine
    from otter_tpu.ops.align_batch import edit_ends_free_batch
    from otter_tpu.ops.align_np import edit_distance_ends_free
    from otter_tpu.parallel.mesh import make_mesh

    rng = random.Random(77)
    jobs = []
    for _ in range(50):
        p = "".join(rng.choice("ACGT") for _ in range(rng.randrange(1, 400)))
        t = "".join(rng.choice("ACGT") for _ in range(rng.randrange(1, 400)))
        ld = abs(len(p) - len(t))
        kind = rng.randrange(4)
        if kind == 0:
            jobs.append((p, t, 0, 0, 0, ld))
        elif kind == 1:
            jobs.append((p, t, ld, 0, 0, 0))
        elif kind == 2:
            jobs.append((p, t, ld // 2, ld - ld // 2, 0, 0))
        else:
            jobs.append((p, t, 0, 0, ld // 2, ld - ld // 2))
    eng = EditDistanceEngine(mode="jnp", mesh=make_mesh(8))
    got = eng.ends_free(jobs)
    want_host = edit_ends_free_batch(jobs)
    want_scalar = [edit_distance_ends_free(*j) for j in jobs]
    assert list(got) == list(want_host) == want_scalar


def test_ordered_thread_map_propagates_systemexit():
    """Worker SystemExit/exceptions must re-raise in the caller (naked
    threads swallow SystemExit via threading.excepthook, silently
    truncating output)."""
    import pytest

    from otter_tpu.utils.pool import ordered_thread_map

    def run_item(_ctx, i):
        if i == 3:
            raise SystemExit(1)
        return str(i)

    with pytest.raises(SystemExit):
        ordered_thread_map(8, 4, lambda: None, run_item, lambda c: None)

    def run_err(_ctx, i):
        if i == 2:
            raise ValueError("boom")
        return str(i)

    with pytest.raises(ValueError):
        ordered_thread_map(8, 2, lambda: None, run_err, lambda c: None)

    got = ordered_thread_map(5, 3, lambda: None,
                             lambda _c, i: i * i, lambda c: None)
    assert got == [0, 1, 4, 9, 16]
