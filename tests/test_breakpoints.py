"""CIGAR breakpoint-projection unit tests (per-case coverage of
get_breakpoints semantics, reference anseqs.cpp:286-408)."""

from otter_tpu.io.bam import (
    BAM_CDEL,
    BAM_CINS,
    BAM_CMATCH,
    BAM_CSOFT_CLIP,
    BAM_CHARD_CLIP,
    BamRecord,
)
from otter_tpu.seqs.breakpoints import ParseMsg, get_breakpoints, parse_alignment
from otter_tpu.seqs.model import AnRead


def rec(pos, cigar, seq):
    r = BamRecord()
    r.name = "r"
    r.pos = pos
    r.cigar = cigar
    r.seq = seq
    return r


def test_simple_spanning():
    # read aligned 100..120, region 105..110
    r = rec(100, [(20, BAM_CMATCH)], "A" * 20)
    msg = ParseMsg()
    q = get_breakpoints(105, 110, r, msg)
    assert msg.successful and msg.spanning_l and msg.spanning_r
    assert q == (5, 10)
    seq = parse_alignment(105, 110, r, ParseMsg())
    assert seq == "A" * 5


def test_insertion_inside_region():
    # 10M 5I 10M at pos 100; region 105..115: insertion at query 10..15
    r = rec(100, [(10, BAM_CMATCH), (5, BAM_CINS), (10, BAM_CMATCH)],
            "ACGTACGTAC" + "TTTTT" + "GGGGGGGGGG")
    msg = ParseMsg()
    q = get_breakpoints(105, 115, r, msg)
    assert msg.spanning_l and msg.spanning_r
    # q start: ref 105 -> query 5; q end: ref 115 -> query 20
    assert q == (5, 20)
    seq = parse_alignment(105, 115, r, ParseMsg())
    assert seq == "CGTACTTTTTGGGGG"


def test_deletion_covering_region():
    # deletion spans the whole region -> seq "N", still spanning
    r = rec(100, [(5, BAM_CMATCH), (20, BAM_CDEL), (5, BAM_CMATCH)], "AAAAACCCCC")
    msg = ParseMsg()
    seq = parse_alignment(107, 118, r, msg)
    assert msg.successful and msg.spanning_l and msg.spanning_r
    assert seq == "N"


def test_not_spanning_left():
    # alignment starts after region start
    r = rec(110, [(20, BAM_CMATCH)], "G" * 20)
    msg = ParseMsg()
    q = get_breakpoints(105, 120, r, msg)
    assert msg.successful
    assert not msg.spanning_l and msg.spanning_r
    assert q == (0, 10)


def test_not_spanning_right():
    r = rec(100, [(10, BAM_CMATCH)], "G" * 10)
    msg = ParseMsg()
    q = get_breakpoints(105, 120, r, msg)
    assert msg.successful
    assert msg.spanning_l and not msg.spanning_r
    assert q == (5, 10)


def test_no_overlap():
    r = rec(100, [(10, BAM_CMATCH)], "G" * 10)
    msg = ParseMsg()
    q = get_breakpoints(200, 220, r, msg)
    assert q is None and not msg.successful


def test_softclip_readjustment_left():
    # clipped on the left, first aligned base after region start:
    # 8S 12M at pos 107, region 105..115 -> leftmost_r=107>105, clipped_l,
    # qstart_cigar_i==1 -> expand into the soft clip
    r = rec(107, [(8, BAM_CSOFT_CLIP), (12, BAM_CMATCH)], "ACGTACGT" + "G" * 12)
    msg = ParseMsg()
    q = get_breakpoints(105, 115, r, msg)
    assert msg.successful
    assert not msg.spanning_l and msg.spanning_r
    # qstart readjusts through the clip (8 -> 0); spanning_r-only reads
    # return (0, qend_q) (anseqs.cpp:403)
    assert q == (0, 16)


def test_hardclip_no_query_shift():
    r = rec(100, [(5, BAM_CHARD_CLIP), (20, BAM_CMATCH)], "C" * 20)
    msg = ParseMsg()
    q = get_breakpoints(105, 110, r, msg)
    assert q == (5, 10)
    assert msg.spanning_l and msg.spanning_r


def test_transfer_status_elif_chain():
    read = AnRead()
    msg = ParseMsg()
    msg.spanning_l = False
    msg.spanning_r = True
    msg.alignment_coords = (3, 9)
    msg.transfer_status(read)
    assert not read.is_spanning_l and read.is_spanning_r
    assert read.ccoords == (3, 9)


def test_native_anreads_matches_python_oracle(tmp_path):
    """The C++ extractor (otter_anreads_parse) reproduces the python oracle
    field-for-field across clips, region-spanning deletions, non-spanning
    reads, secondary flags, mapq cuts, HP/PS/rq tags, and both
    omit-nonspanning settings."""
    import random

    from fixtures import make_bam, read_record
    from otter_tpu.config import OtterOpts
    from otter_tpu.io.bam import BamReader
    from otter_tpu.io.bed import BED
    from otter_tpu.seqs.extract import _parse_anreads_native, parse_anreads

    rng = random.Random(44)

    def rand_seq(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    start, end = 1000, 1100
    recs = []
    # spanning M-only
    recs.append(read_record("m0", 0, 950, rand_seq(200), [(200, BAM_CMATCH)],
                            tags=[("rq", "f", 0.99), ("HP", "i", 1),
                                  ("PS", "i", 1000)]))
    # insertion inside region
    recs.append(read_record("ins", 0, 940, rand_seq(230),
                            [(100, BAM_CMATCH), (30, BAM_CINS),
                             (100, BAM_CMATCH)]))
    # deletion covering the whole region
    recs.append(read_record("delspan", 0, 900, rand_seq(160),
                            [(80, BAM_CMATCH), (250, BAM_CDEL),
                             (80, BAM_CMATCH)]))
    # left soft-clip with readjustment shape
    recs.append(read_record("clipL", 0, 1010, rand_seq(220),
                            [(60, BAM_CSOFT_CLIP), (160, BAM_CMATCH)]))
    # right clip
    recs.append(read_record("clipR", 0, 920, rand_seq(220),
                            [(170, BAM_CMATCH), (50, BAM_CSOFT_CLIP)]))
    # hard clips both sides
    recs.append(read_record("hard", 0, 930, rand_seq(200),
                            [(10, BAM_CHARD_CLIP), (200, BAM_CMATCH),
                             (5, BAM_CHARD_CLIP)]))
    # non-spanning left / right
    recs.append(read_record("nsl", 0, 1050, rand_seq(120),
                            [(120, BAM_CMATCH)]))
    recs.append(read_record("nsr", 0, 900, rand_seq(120),
                            [(120, BAM_CMATCH)]))
    # no overlap at all
    recs.append(read_record("far", 0, 5000, rand_seq(50), [(50, BAM_CMATCH)]))
    # secondary + low mapq
    recs.append(read_record("sec", 0, 950, rand_seq(200), [(200, BAM_CMATCH)],
                            flag=0x100))
    recs.append(read_record("lowq", 0, 950, rand_seq(200),
                            [(200, BAM_CMATCH)], mapq=3))
    # low rq tag
    recs.append(read_record("lowrq", 0, 950, rand_seq(200),
                            [(200, BAM_CMATCH)], tags=[("rq", "f", 0.2)]))
    recs.sort(key=lambda r: r.pos)
    bam_path = str(tmp_path / "x.bam")
    make_bam(bam_path, [("chr1", 10000)], recs)

    for omit, mapq, rqmin in [(False, 0, 0.0), (True, 0, 0.0),
                              (False, 10, 0.0), (False, 0, 0.5)]:
        params = OtterOpts()
        params.omitnonspanning = omit
        params.mapq = mapq
        params.read_quality = rqmin
        params.device = "cpu"
        bed = BED("chr1", start, end)
        bam = BamReader(bam_path)
        native = _parse_anreads_native(params, bed, bam)
        params.device = "host"
        oracle = parse_anreads(params, bed, bam)
        bam.close()
        assert native is not None
        assert len(native) == len(oracle), (omit, mapq, rqmin)
        for a, b in zip(native, oracle):
            assert a.name == b.name
            assert a.seq == b.seq, a.name
            assert a.is_spanning_l == b.is_spanning_l, a.name
            assert a.is_spanning_r == b.is_spanning_r, a.name
            assert a.ccoords == b.ccoords, a.name
            assert a.rq == b.rq, a.name
            assert a.hpt.hp == b.hpt.hp and a.hpt.ps == b.hpt.ps, a.name
