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
