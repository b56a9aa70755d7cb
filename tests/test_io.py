"""I/O layer tests: BGZF/BAM round-trip, BAI queries, faidx, BED parsing."""

import os
import random

import pytest

from otter_tpu.io.bam import BamReader, BamRecord, BAM_CMATCH, BAM_CSOFT_CLIP
from otter_tpu.io.bai import index_bam
from otter_tpu.io.bed import parse_bed_file
from otter_tpu.io.bgzf import BgzfReader, BgzfWriter
from otter_tpu.io.fasta import Faidx

from fixtures import make_bam, read_record, write_fasta


def test_bgzf_roundtrip(tmp_path):
    data = bytes(random.Random(0).randrange(256) for _ in range(300000))
    p = str(tmp_path / "x.bgzf")
    with BgzfWriter(p) as w:
        w.write(data)
    with BgzfReader(p) as r:
        assert r.read(len(data) + 10) == data


def test_bam_roundtrip_and_fetch(tmp_path):
    p = str(tmp_path / "t.bam")
    recs = [
        read_record("r1", 0, 100, "ACGTACGT", [(8, BAM_CMATCH)],
                    tags=[("rq", "f", 0.99), ("HP", "i", 1)]),
        read_record("r2", 0, 500, "GGGG", [(4, BAM_CMATCH)]),
        read_record("r3", 0, 104, "TTTTT", [(2, BAM_CSOFT_CLIP), (3, BAM_CMATCH)]),
    ]
    make_bam(p, [("chr1", 10000)], recs, rg="S1", pg_of="1,0")
    rd = BamReader(p)
    assert rd.ref_names == ["chr1"]
    assert rd.ref_lens == [10000]
    assert rd.index is not None
    got = list(rd.fetch("chr1", 100, 110))
    assert [r.name for r in got] == ["r1", "r3"]
    r1 = got[0]
    assert r1.seq == "ACGTACGT"
    assert abs(r1.get_aux_float("rq") - 0.99) < 1e-6
    assert r1.get_aux_int("HP") == 1
    got2 = list(rd.fetch("chr1", 499, 501))
    assert [r.name for r in got2] == ["r2"]
    # missing chrom warns and yields nothing
    assert list(rd.fetch("chrX", 0, 10)) == []
    rd.close()


def test_bam_fetch_no_index(tmp_path):
    p = str(tmp_path / "t.bam")
    recs = [read_record("r1", 0, 100, "ACGT", [(4, BAM_CMATCH)])]
    make_bam(p, [("chr1", 1000)], recs)
    os.remove(p + ".bai")
    rd = BamReader(p)
    assert rd.index is None
    assert [r.name for r in rd.fetch("chr1", 50, 200)] == ["r1"]
    rd.close()


def test_bai_many_records(tmp_path):
    rng = random.Random(1)
    recs = []
    for i in range(500):
        pos = rng.randrange(0, 200000)
        recs.append(read_record(f"r{i}", 0, pos, "ACGTACGTAC", [(10, BAM_CMATCH)]))
    p = str(tmp_path / "many.bam")
    make_bam(p, [("chr1", 300000)], recs)
    rd = BamReader(p)
    for _ in range(20):
        s = rng.randrange(0, 199000)
        e = s + rng.randrange(1, 5000)
        got = sorted(r.name for r in rd.fetch("chr1", s, e))
        want = sorted(r.name for r in recs if r.pos < e and r.pos + 10 > s)
        assert got == want, (s, e)
    rd.close()


def test_faidx(tmp_path):
    p = str(tmp_path / "ref.fa")
    seq1 = "acgtACGTNN" * 13
    seq2 = "TTTTGGGGCCCCAAAA"
    write_fasta(p, [("chr1", seq1), ("chr2", seq2)], width=7)
    fa = Faidx(p)
    # 0-based inclusive, uppercased
    assert fa.fetch("chr1", 0, 3) == "ACGT"
    assert fa.fetch("chr1", 2, 11) == "GTACGTNNAC"
    assert fa.fetch("chr2", 0, 15) == seq2
    # clamping
    assert fa.fetch("chr2", 10, 100) == seq2[10:].upper()
    assert fa.fetch("chr2", -5, 2) == "TTT"
    assert fa.fetch("chrX", 0, 5) == ""
    assert fa.fetch("chr2", 12, 5) == ""
    fa.close()
    # .fai reuse
    fa2 = Faidx(p)
    assert fa2.fetch("chr1", 5, 9) == seq1[5:10].upper()
    fa2.close()


def test_bed_parsing(tmp_path, capsys):
    p = str(tmp_path / "r.bed")
    with open(p, "w") as fh:
        fh.write("chr1\t100\t200\n")
        fh.write("#comment\n")
        fh.write("chr2:300-400\n")
        fh.write("chr3\t5\t6\textra\tcols\n")
    beds = parse_bed_file(p)
    assert len(beds) == 3
    assert beds[0].chr == "chr1" and beds[0].start == 100 and beds[0].end == 200
    assert beds[1].to_sc_string() == "chr2:300-400"
    assert beds[2].to_string() == "chr3\t5\t6"


def test_long_cigar_cg_tag_roundtrip(tmp_path):
    """>65535-op cigars round-trip via the CG:B,I convention (SAM §4.2.2)."""
    rng = random.Random(9)
    from otter_tpu.io.bam import BAM_CINS, BAM_CDEL
    cig = []
    qlen = 0
    rlen = 0
    for _ in range(40000):
        cig.append((1, BAM_CMATCH))
        qlen += 1
        rlen += 1
        cig.append((1, BAM_CINS))
        qlen += 1
    assert len(cig) > 0xFFFF
    seq = "".join(rng.choice("ACGT") for _ in range(qlen))
    rec = read_record("long", 0, 100, seq, cig)
    p = str(tmp_path / "long.bam")
    make_bam(p, [("chr1", rlen + 1000)], [rec])
    rd = BamReader(p)
    got = list(rd.fetch("chr1", 100, 200))
    assert len(got) == 1
    assert got[0].cigar == cig
    assert got[0].seq == seq
    # the consumed CG tag is stripped on expansion (reader or native feeder)
    assert got[0].get_aux("CG") is None
    rd.close()
    # second round-trip: re-write the expanded record; the CG tag must not
    # duplicate and the cigar must survive again
    p2 = str(tmp_path / "long2.bam")
    make_bam(p2, [("chr1", rlen + 1000)], got)
    rd2 = BamReader(p2)
    got2 = list(rd2.fetch("chr1", 100, 200))
    assert len(got2) == 1
    assert got2[0].cigar == cig
    assert got2[0].get_aux("CG") is None
    assert got2[0].aux.count(b"CG") == 0
    rd2.close()


def test_bai_long_reads_bin_levels(tmp_path):
    """Reads spanning >16kb land in higher-level BAI bins; queries inside
    their span must still find them."""
    recs = [
        read_record("huge", 0, 50000, "A" * 100, [(120000, BAM_CMATCH)]),
        read_record("tiny", 0, 100000, "ACGT", [(4, BAM_CMATCH)]),
    ]
    p = str(tmp_path / "levels.bam")
    make_bam(p, [("chr1", 500000)], recs)
    rd = BamReader(p)
    got = sorted(r.name for r in rd.fetch("chr1", 100001, 100002))
    assert got == ["huge", "tiny"]
    got2 = [r.name for r in rd.fetch("chr1", 60000, 60010)]
    assert got2 == ["huge"]
    got3 = [r.name for r in rd.fetch("chr1", 400000, 400010)]
    assert got3 == []
    rd.close()


def test_bgzf_read_span_matches_read(tmp_path):
    """read_span(vbeg, vend) == seek+read loop across block boundaries."""
    import random

    from otter_tpu.io.bgzf import BgzfReader, BgzfWriter

    rng = random.Random(3)
    payload = bytes(rng.randrange(256) for _ in range(300_000))
    p = str(tmp_path / "x.bgzf")
    w = BgzfWriter(p, level=1)
    # small writes to get multiple blocks
    for c0 in range(0, len(payload), 70_000):
        w.write(payload[c0 : c0 + 70_000])
    w.close()
    rd = BgzfReader(p)
    # collect virtual offsets at some byte positions by streaming
    rd.seek_virtual(0)
    offsets = [rd.tell_virtual()]
    for _ in range(10):
        rd.read(29_999)
        offsets.append(rd.tell_virtual())
    for a in range(0, len(offsets), 3):
        for b in range(a + 1, len(offsets), 2):
            va, vb = offsets[a], offsets[b]
            rd.seek_virtual(va)
            want = rd.read(29_999 * (b - a))
            got = rd.seek_virtual(va) or rd.read_span(va, vb)
            assert got == want[: len(got)] and len(got) == 29_999 * (b - a)
            assert rd.tell_virtual() == vb


# -- compressed FASTA containers (io/razf.py; reference src/razf.c+faidx.c) --

def _random_fasta(rng, n_seqs=3, width=60):
    lines = []
    seqs = {}
    for s in range(n_seqs):
        name = f"ctg{s}"
        ln = rng.randrange(1, 90000)
        seq = "".join(rng.choice("ACGTacgtn") for _ in range(ln))
        seqs[name] = seq.upper()
        lines.append(f">{name} desc{s}")
        for i in range(0, ln, width):
            lines.append(seq[i:i + width])
    return ("\n".join(lines) + "\n").encode(), seqs


def test_razf_roundtrip_random_access(tmp_path):
    import random
    from otter_tpu.io.razf import RazfReader, razf_compress

    rng = random.Random(5)
    data = bytes(rng.randrange(32, 127) for _ in range(200123))
    path = str(tmp_path / "blob.rz")
    razf_compress(data, path)
    rd = RazfReader(path)
    assert rd.size == len(data)
    for _ in range(40):
        beg = rng.randrange(0, len(data))
        n = rng.randrange(0, 5000)
        rd.seek(beg)
        assert rd.read(n) == data[beg:beg + n]
    # sequential full read
    rd.seek(0)
    assert rd.read(-1) == data
    rd.close()


def test_faidx_compressed_containers_match_plain(tmp_path):
    import gzip
    import random
    from otter_tpu.io.bgzf import BgzfWriter
    from otter_tpu.io.fasta import Faidx
    from otter_tpu.io.razf import razf_compress

    rng = random.Random(17)
    raw, seqs = _random_fasta(rng)
    plain = str(tmp_path / "ref.fa")
    with open(plain, "wb") as fh:
        fh.write(raw)
    rz = str(tmp_path / "ref.rz.fa")
    razf_compress(raw, rz)
    bg = str(tmp_path / "ref.bg.fa")
    w = BgzfWriter(bg)
    w.write(raw)
    w.close()
    gz = str(tmp_path / "ref.gz.fa")
    with gzip.open(gz, "wb") as fh:
        fh.write(raw)

    fps = {p: Faidx(p) for p in (plain, rz, bg, gz)}
    # identical .fai (uncompressed offsets, reference faidx.c:81,105)
    base = fps[plain]
    for fp in fps.values():
        assert fp.index == base.index and fp.order == base.order
    for _ in range(25):
        name = rng.choice(list(seqs))
        ln = len(seqs[name])
        beg = rng.randrange(0, ln)
        end = min(ln - 1, beg + rng.randrange(0, 400))
        want = seqs[name][beg:end + 1]
        for fp in fps.values():
            assert fp.fetch(name, beg, end) == want, (name, beg, end)
    for fp in fps.values():
        fp.close()
