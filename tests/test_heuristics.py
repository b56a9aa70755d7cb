"""Heuristic-level parity tests: KDE decision bounds, haplotag clustering,
read filters, and local realignment."""

import io
import random

import numpy as np
import pytest

from otter_tpu.config import OtterOpts
from otter_tpu.models.assemble import assemble
from otter_tpu.ops.cluster import DecisionBound, otter_find_clustering_dist
from otter_tpu.ops.consensus import get_dist_anreads, local_realignment
from otter_tpu.ops.distmat import DistMatrix
from otter_tpu.ops.kde import kde_densities, kde_grid, kde_maximas
from otter_tpu.seqs.model import AnRead, Haplotag

from fixtures import make_reference, read_record, make_bam, simulate_region_bam, write_fasta
from otter_tpu.io.bam import BAM_CMATCH, BAM_CSOFT_CLIP


def test_kde_grid_has_401_points():
    xs = kde_grid(0.0025)
    # the reference's accumulated loop yields 401 points when rounding
    # cooperates — assert against a direct simulation of the C++ loop
    count = 0
    x = 0.0
    while x <= 1.0:
        count += 1
        x += 0.0025
    assert len(xs) == count


def test_kde_two_modes_decision_bound():
    # two tight clusters of pairwise distances: ~0.01 (within) / ~0.5 (across)
    rng = random.Random(1)
    values = [0.01 + rng.gauss(0, 0.002) for _ in range(40)]
    values += [0.5 + rng.gauss(0, 0.01) for _ in range(40)]
    dm = DistMatrix(2)  # container only; values injected directly
    dm.values = np.array(values)
    db = otter_find_clustering_dist(radius=4, dinterval=0.0025,
                                    bandwidth=0.01, distmatrix=dm)
    assert abs(db.dist0 - 0.01) < 0.02
    assert abs(db.dist1 - 0.5) < 0.03
    assert db.dist0 < db.cut0 < db.dist1


def test_kde_single_mode():
    values = [0.01] * 50
    dm = DistMatrix(2)
    dm.values = np.array(values, dtype=float)
    db = otter_find_clustering_dist(radius=4, dinterval=0.0025,
                                    bandwidth=0.01, distmatrix=dm)
    assert db.dist0 == db.dist1
    assert db.cut0 == -1.0


def test_kde_maximas_alternation():
    # hand-built density with peaks at 10 and 30, valley at 20
    dens = np.zeros(41)
    for i in range(41):
        dens[i] = np.exp(-((i - 10) ** 2) / 20.0) + 0.8 * np.exp(-((i - 30) ** 2) / 20.0)
    maxs, mins = kde_maximas(2, dens)
    assert len(maxs) == 2 and len(mins) == 1
    assert abs(maxs[0][0] - 10) <= 1 and abs(maxs[1][0] - 30) <= 1
    assert abs(mins[0][0] - 20) <= 2


def test_haplotag_distance_shortcut():
    a = AnRead(seq="ACGT", hpt=Haplotag(1, 1), is_spanning_l=True,
               is_spanning_r=True)
    b = AnRead(seq="TTTT", hpt=Haplotag(1, 1), is_spanning_l=True,
               is_spanning_r=True)
    c = AnRead(seq="ACGT", hpt=Haplotag(1, 2), is_spanning_l=True,
               is_spanning_r=True)
    d = AnRead(seq="ACGT", is_spanning_l=True, is_spanning_r=True)  # untagged
    assert get_dist_anreads(False, a, b) == 0.0   # same haplotag -> 0
    assert get_dist_anreads(False, a, c) == 1.0   # different -> 1
    assert get_dist_anreads(False, a, d) == 1.0   # ambiguous -> 1
    assert get_dist_anreads(True, a, b) == 0.75   # ignore-haps: real distance


def test_haps_mode_two_alleles_by_tag(tmp_path):
    """--haps: identical sequences split purely by haplotag."""
    rng = random.Random(5)
    ref = make_reference(rng, length=2000, repeat="AT", repeat_at=1000,
                         repeat_units=10)
    start, end = 1000, 1020
    recs = []
    for i in range(10):
        lf, rf = 200, 200
        seq = ref[start - lf : end + rf]
        hp = 1 if i < 5 else 2
        recs.append(read_record(
            f"r{i}", 0, start - lf, seq, [(len(seq), BAM_CMATCH)],
            tags=[("rq", "f", 0.99), ("HP", "i", hp), ("PS", "i", 1000)]))
    bam = str(tmp_path / "haps.bam")
    make_bam(bam, [("chr1", len(ref))], recs)
    bed = str(tmp_path / "r.bed")
    with open(bed, "w") as fh:
        fh.write(f"chr1\t{start}\t{end}\n")
    params = OtterOpts()
    params.read_group = "S1"
    params.ignore_haps = False  # --haps
    params.device = "host"
    out = io.StringIO()
    assemble(bam, bed, "", False, params, out=out)
    body = [l for l in out.getvalue().rstrip("\n").split("\n")
            if not l.startswith("@")]
    assert len(body) == 2
    # PS/HP tags emitted on alleles
    assert any("PS:i:1000" in l and "HP:i:1" in l for l in body)
    assert any("PS:i:1000" in l and "HP:i:2" in l for l in body)


def test_omit_nonspanning_filter(tmp_path):
    rng = random.Random(6)
    ref = make_reference(rng, length=2000, repeat="AT", repeat_at=1000,
                         repeat_units=10)
    start, end = 1000, 1020
    spanning = ref[start - 100 : end + 100]
    partial = ref[start - 100 : start + 10]  # left-spanning only
    recs = [
        read_record("span", 0, start - 100, spanning,
                    [(len(spanning), BAM_CMATCH)], tags=[("rq", "f", 0.9)]),
        read_record("part", 0, start - 100, partial,
                    [(len(partial), BAM_CMATCH)], tags=[("rq", "f", 0.9)]),
    ]
    bam = str(tmp_path / "o.bam")
    make_bam(bam, [("chr1", len(ref))], recs)
    bed = str(tmp_path / "r.bed")
    with open(bed, "w") as fh:
        fh.write(f"chr1\t{start}\t{end}\n")
    for omit, expected in ((False, 2), (True, 1)):
        params = OtterOpts()
        params.read_group = "S1"
        params.omitnonspanning = omit
        params.is_fa = True
        params.device = "host"
        out = io.StringIO()
        assemble(bam, bed, "", True, params, out=out)
        n = sum(1 for l in out.getvalue().split("\n") if l.startswith(">"))
        assert n == expected, omit


def test_local_realignment_rescues_read(tmp_path):
    """A read clipped at the region edge is rescued to spanning when its
    tail matches the flanking reference (analignments.cpp:11-60)."""
    rng = random.Random(7)
    ref = make_reference(rng, length=3000, repeat="CAG", repeat_at=1500,
                         repeat_units=20)
    start, end = 1500, 1560

    class FakeFaidx:
        def fetch(self, chr, s, e):
            s = max(0, s)
            return ref[s : e + 1]

    # read: spans left, seq continues 150bp past region end matching ref
    seq = ref[1400:end] + ref[end : end + 150]
    read = AnRead(seq=seq, name="r", is_spanning_l=True, is_spanning_r=False,
                  ccoords=(100, len(seq) - 150))
    local_realignment("chr1", start, end, 100, 0.9, FakeFaidx(), [read])
    assert read.is_spanning()
    # trimmed at ccoords[1] + matched prefix of the flank
    assert len(read.seq) <= len(seq)


def test_rq_filter(tmp_path):
    rng = random.Random(8)
    ref = make_reference(rng, length=2000, repeat="AT", repeat_at=1000,
                         repeat_units=10)
    start, end = 1000, 1020
    seq = ref[start - 100 : end + 100]
    recs = [
        read_record("good", 0, start - 100, seq, [(len(seq), BAM_CMATCH)],
                    tags=[("rq", "f", 0.999)]),
        read_record("bad", 0, start - 100, seq, [(len(seq), BAM_CMATCH)],
                    tags=[("rq", "f", 0.5)]),
    ]
    bam = str(tmp_path / "q.bam")
    make_bam(bam, [("chr1", len(ref))], recs)
    bed = str(tmp_path / "r.bed")
    with open(bed, "w") as fh:
        fh.write(f"chr1\t{start}\t{end}\n")
    params = OtterOpts()
    params.read_group = "S1"
    params.read_quality = 0.99
    params.is_fa = True
    params.device = "host"
    out = io.StringIO()
    assemble(bam, bed, "", True, params, out=out)
    names = [l for l in out.getvalue().split("\n") if l.startswith(">")]
    assert len(names) == 1 and names[0].startswith(">good#")


def test_kde_densities_batched_byte_identical():
    """Bucketed batched KDE == per-region kde_densities bit-for-bit."""
    import random

    import numpy as np

    from otter_tpu.ops.kde import (kde_densities, kde_densities_batched,
                                   kde_grid)

    rng = random.Random(8)
    xs = kde_grid(0.0025)
    value_lists = []
    bws = []
    for _ in range(25):
        n = rng.choice([3, 6, 66, 190])
        value_lists.append([rng.random() * 0.4 for _ in range(n)])
        bws.append(rng.choice([0.01, 0.015]))
    batched = kde_densities_batched(value_lists, bws, xs)
    for v, b, got in zip(value_lists, bws, batched):
        want = kde_densities(np.asarray(v), b, xs)
        assert np.array_equal(want, got)


def test_kusage_batch_bitwise_parity():
    """Vectorized counts + unique-log hsdiv vs the scalar oracle: vec,
    vnorm, and hsdiv must be BIT-identical (the batch path serves both
    host and device genotype routes)."""
    import random

    import numpy as np

    from otter_tpu.seqs.kmer import Kusage, kusage_batch, seq2kcounts

    rng = random.Random(3)
    seqs = []
    for _ in range(40):
        n = rng.randrange(0, 300)
        s = "".join(rng.choice("ACGTN") for _ in range(n))
        seqs.append(s)
    seqs.extend(["", "A", "AC", "NNN", "ACG"])
    batch = kusage_batch(3, seqs)
    for s, kb in zip(seqs, batch):
        ko = Kusage(seq2kcounts(3, s))
        assert np.array_equal(kb.vec, ko.vec, equal_nan=True), s
        assert (kb.vnorm == ko.vnorm
                or (np.isnan(kb.vnorm) and np.isnan(ko.vnorm))), s
        assert kb.hsdiv() == ko.hsdiv(), s


def test_kusage_gemm_round_guard():
    """The cosine GEMM certify-or-fallback: the condensed distances from
    anallele_cluster_kusage must equal the per-pair scalar-dot + C++-round
    oracle exactly."""
    import random

    import numpy as np

    from otter_tpu.ops.cluster import _cpp_round, anallele_cluster_kusage
    from otter_tpu.ops.distmat import DistMatrix
    from otter_tpu.seqs.kmer import Kusage, seq2kcounts
    from otter_tpu.seqs.model import AnAllele

    rng = random.Random(4)
    alleles = []
    for _ in range(30):
        n = rng.randrange(3, 200)
        alleles.append(AnAllele(
            seq="".join(rng.choice("ACGT") for _ in range(n))))
    alleles.append(AnAllele(seq="AC"))  # total==0 -> NaN row
    idx = list(range(len(alleles)))
    dm = DistMatrix(len(idx))
    anallele_cluster_kusage(0.01, 3, alleles, idx, dm)
    kus = [Kusage(seq2kcounts(3, a.seq)) for a in alleles]
    n = len(idx)
    p = 0
    for i in range(n):
        for j in range(i + 1, n):
            sim = kus[i].cosine_sim(kus[j])
            import math as _m
            sim = (_cpp_round(sim * 1000.0) / 1000.0
                   if not _m.isnan(sim) else 0.0)
            assert dm.values[p] == 1.0 - sim, (i, j)
            p += 1


def test_kcounts_device_bitwise_parity():
    """Device one-hot scatter-add k-mer counts are integer-exact and
    bit-identical to the scalar oracle (SURVEY §2.1 k-mer-on-TPU plan)."""
    import random

    import numpy as np

    from otter_tpu.seqs.kmer import kcounts_device, seq2kcounts

    rng = random.Random(11)
    seqs = ["".join(rng.choice("ACGTN") for _ in range(rng.randrange(0, 400)))
            for _ in range(25)] + ["", "AC", "NN" * 40, "ACG"]
    got = kcounts_device(3, seqs)
    for s, row in zip(seqs, got):
        assert np.array_equal(row, seq2kcounts(3, s)), s


def test_kusage_batch_device_env_route(monkeypatch):
    """OTTER_TPU_KMER_DEVICE=1 routes kusage_batch through the device
    counts with unchanged results."""
    import numpy as np

    from otter_tpu.seqs.kmer import kusage_batch

    seqs = ["ACGTACGTAC", "TTTTT", "", "ACGNNNACG"]
    base = kusage_batch(3, seqs)
    monkeypatch.setenv("OTTER_TPU_KMER_DEVICE", "1")
    dev = kusage_batch(3, seqs)
    for a, b in zip(base, dev):
        assert np.array_equal(a.vec, b.vec, equal_nan=True)
        assert a.hsdiv() == b.hsdiv()
