"""Edge-case branch coverage: tiny clusters, max-alleles 0, missing samples,
empty regions."""

import io
import random

import numpy as np
import pytest

from otter_tpu.config import OtterOpts
from otter_tpu.models.assemble import assemble
from otter_tpu.models.genotype import genotype
from otter_tpu.ops.cluster import ClusteringStatus, otter_hclust
from otter_tpu.ops.distmat import DistMatrix
from otter_tpu.seqs.model import AnRead

from fixtures import make_bam, make_reference, read_record, write_fasta
from otter_tpu.io.bam import BAM_CMATCH, parse_sam_to_bam
from otter_tpu.io.bai import index_bam


def _spanning_read(seq, name="r"):
    return AnRead(seq=seq, name=name, is_spanning_l=True, is_spanning_r=True)


def _cluster(reads, max_alleles=2, dists=None, max_error=0.01):
    indeces = list(range(len(reads)))
    dm = DistMatrix(len(indeces))
    if dists is not None:
        dm.values = np.asarray(dists, dtype=np.float64)
    msg = ClusteringStatus()
    otter_hclust(True, max_alleles, 0.01, 500, 0.015, max_error, 0.2, 500,
                 0.1, indeces, dm, reads, msg)
    return msg


def test_single_read_cluster():
    msg = _cluster([_spanning_read("ACGT")])
    assert msg.labels == [0] and msg.ic == 1 and msg.fc == 1


def test_two_reads_close():
    reads = [_spanning_read("ACGT"), _spanning_read("ACGT")]
    msg = _cluster(reads, dists=[0.0])
    assert msg.labels == [0, 0] and msg.ic == 1 and msg.fc == 1


def test_two_reads_far():
    reads = [_spanning_read("ACGT"), _spanning_read("TTTT")]
    msg = _cluster(reads, dists=[0.75])
    assert msg.labels == [0, 1] and msg.ic == 2 and msg.fc == 2


def test_two_reads_max_alleles_one():
    reads = [_spanning_read("ACGT"), _spanning_read("TTTT")]
    msg = _cluster(reads, dists=[0.75], max_alleles=1)
    assert msg.labels == [0, 0] and msg.ic == 1 and msg.fc == 1


def test_max_alleles_zero_keeps_initial_clusters():
    """max_alleles == 0 skips the coverage/seed logic entirely
    (otterclust.cpp:194) and keeps cutree labels; ic set, fc left 0."""
    rng = random.Random(1)
    reads = []
    for i in range(8):
        reads.append(_spanning_read("A" * 50 if i < 4 else "G" * 50))
    # distances: within group tiny, across ~1.0
    dm = []
    for i in range(8):
        for j in range(i + 1, 8):
            same = (i < 4) == (j < 4)
            dm.append(0.001 if same else 0.9)
    msg = _cluster(reads, max_alleles=0, dists=dm)
    assert msg.ic == 2
    assert msg.fc == 0
    assert len(set(msg.labels)) == 2


def test_empty_bed_region_warns(tmp_path, capsys):
    rng = random.Random(5)
    ref = make_reference(rng, length=2000, repeat="AT", repeat_at=1000,
                         repeat_units=5)
    recs = [read_record("r0", 0, 100, ref[100:300], [(200, BAM_CMATCH)],
                        tags=[("rq", "f", 0.9)])]
    bam = str(tmp_path / "x.bam")
    make_bam(bam, [("chr1", len(ref))], recs)
    bed = str(tmp_path / "r.bed")
    with open(bed, "w") as fh:
        fh.write("chr1\t1500\t1550\n")  # no reads there
    params = OtterOpts()
    params.read_group = "S1"
    params.device = "host"
    out = io.StringIO()
    assemble(bam, bed, "", False, params, out=out)
    body = [l for l in out.getvalue().split("\n") if l and not l.startswith("@")]
    assert body == []
    assert "No spanning reads" in capsys.readouterr().err


def test_genotype_missing_sample_dots(tmp_path):
    """A sample with no alleles in a region gets ./.:... (genotype.cpp:57)."""
    rng = random.Random(9)
    ref = make_reference(rng, length=2000, repeat="AT", repeat_at=1000,
                         repeat_units=10)
    fa = str(tmp_path / "ref.fa")
    write_fasta(fa, [("chr1", ref)])
    region = "chr1:1000-1020"
    lines = ["@SQ\tSN:chr1\tLN:2000", "@RG\tID:SA", "@RG\tID:SB",
             "@PG\tID:otter\tOF:1,0"]
    # only sample SA has an allele line
    seq = ref[999:1020]
    lines.append(
        f"{region}_0\t0\tchr1\t1000\t0\t{len(seq)}M\t*\t0\t0\t{seq}\t"
        f"{'!' * len(seq)}\tRG:Z:SA\tta:Z:{region}\ttc:i:5\tac:i:5\tsc:i:5\t"
        f"ic:i:1\tse:f:0")
    bam = str(tmp_path / "m.bam")
    parse_sam_to_bam("\n".join(lines) + "\n", bam)
    index_bam(bam)
    bed = str(tmp_path / "r.bed")
    with open(bed, "w") as fh:
        fh.write("chr1\t1000\t1020\n")
    params = OtterOpts()
    out = io.StringIO()
    genotype(params, bam, bed, fa, out=out)
    rec = [l for l in out.getvalue().split("\n")
           if l and not l.startswith("#")][0]
    fields = rec.split("\t")
    assert fields[9] != "./.:.:.:.:.:.:."   # SA present
    assert fields[10] == "./.:.:.:.:.:.:."  # SB missing
