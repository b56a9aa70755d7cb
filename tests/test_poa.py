"""PPOA golden-consensus tests.

The four expected consensus strings are fixtures taken from the reference's
own unit test (test/ppoa_test.cpp:39-105), driven by gap-affine cigars
exactly as the original (backbone = first sequence; every member including
the backbone is aligned End2End against it, ppoa_test.cpp:14-21).
"""

import numpy as np

from otter_tpu.ops.align_np import affine_align_cigar
from otter_tpu.ops.poa import Ppoa


def run_ppoa(sequences, expected):
    poa = Ppoa(sequences[0])
    for seq in sequences:
        cigar = affine_align_cigar(sequences[0], seq)
        poa.insert_alignment(seq, cigar, True, True)
    poa.adjust_weights(float(np.float32(len(sequences) * np.float32(0.4))), 0.3)
    consensus = poa.consensus()
    assert consensus == expected, f"\nobserved: {consensus}\nexpected: {expected}"


def test01():
    sequences = [
        "TCTGTTTCAAAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAGAAAAGAAAAAGCATGTTCTA",
        "TCTGTTTCAAAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAAGCATGTTCTA",
        "TCTGTTTCAAAAAAGAAAAGAAAAGAAAAGAAAAGAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAAGCATGTTCTA",
        "TCTGTTTCAAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAAGCATGTTCT",
        "TCTGTTTCAAAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAAGCATGTTCTA",
        "TCTGTTTCAAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAAGCATGTTCT",
        "TCTGTTTCAAAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAGAAAAGAAAGAAAAGAAAAAGCATGTTCTA",
        "TCTGTTTCAAAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAGAAAAGAAAGAAAAGAAAAAGCATGTTCTA",
    ]
    expected = "TCTGTTTCAAAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAAGCATGTTCTA"
    run_ppoa(sequences, expected)


def test02():
    sequences = [
        "TGGGTCCTTCATGTTAGAAAACCTGGCTTTACTACTACTACTACTACTACTACTACTACTACTACTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCATTTTTTAAAAATATATTATCTTATTTTAC",
        "TGGGTCCTTCATGTTAGAAAACCTGGCTTTACTACTACTACTACTACTACTACTACTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCATTTTTTAAAATATATTATCTTATTTTAC",
        "TGGGTCCTTCATGTTAGAAAACCTGGCTTTACTACTACTACTACTACTACTACTACTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCATTTTTTAAAAATATATTATCTTATTTTAC",
        "TGGGTCCTTCATGTTAGAAAACCTGGCTTTACTACTACTACTACTACTACTACTACTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCATTTTTTAAAAATATATTATCTTATTTTAC",
        "TGGGTCCTTCATGTTAGAAAACCTGGCTTTACTACTACTACTACTACTACTACTACTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCATTTTTTAAAAATATATTATCTTATTTTAC",
        "TGGGTCCTTCATGTTAGAAAACCTGGCTTTACTACTACTACTACTACTACTACTACTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCATTTTTTAAAATATATTATCTTATTTTAC",
        "TGGGTCCTTCATGTTAGAAAACCTGGCTTTACTACTACTACTACTACTACTACTACTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCATTTTTTAAAAATATATTATCTTATTTTAC",
        "TGGGTCCTTCATGTTAGAAAACCTGGCTTTACTACTACTACTACTACTACTACTACTACTACTACTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCATTTTTTAAAAATATATTATCTTATTTTAC",
        "TGGGTCCTTCATGTTAGAAAACCTGGCTTTACTACTACTACTACTACTACTACTACTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCATTTTTTAAAAATATATTATCTTATTTTAC",
        "TGGGTCCTTCATGTTAGAAAACCTGGCTTTACTACTACTACTACTACTACTACTACTACTACTACTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCATTTTTTAAAAATATATTATCTTATTTTAC",
        "TGGGTCCTTCATGTTAGAAAACCTGGCTTTACTACTACTACTACTACTACTACTACTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCATTTTTTAAAAATATATTATCTTATTTTAC",
    ]
    expected = "TGGGTCCTTCATGTTAGAAAACCTGGCTTTACTACTACTACTACTACTACTACTACTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCTGCATTTTTTAAAAATATATTATCTTATTTTAC"
    run_ppoa(sequences, expected)


def test03():
    sequences = [
        "ATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTAT",
        "ATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTAT",
        "ATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTAT",
        "TTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTT",
        "ATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTAT",
    ]
    expected = "ATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTAT"
    run_ppoa(sequences, expected)


def test04():
    sequences = ["ACTGGA", "ACAGGA", "ACCGA", "ACTGGA", "ACTGGA"]
    expected = "ACTGGA"
    run_ppoa(sequences, expected)


def test_native_poa_matches_python_golden():
    """Native C++ PPOA (otter_native.cpp) is byte-identical to the python
    oracle on the reference's golden fixtures."""
    from otter_tpu.native import poa_consensus_batch

    sequences = [
        "TCTGTTTCAAAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAGAAAAGAAAAAGCATGTTCTA",
        "TCTGTTTCAAAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAAGCATGTTCTA",
        "TCTGTTTCAAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAAGCATGTTCT",
        "TCTGTTTCAAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAAGCATGTTCT",
    ]
    members = []
    for seq in sequences:
        cigar = affine_align_cigar(sequences[0], seq)
        members.append((seq, cigar, True, True))
    poa = Ppoa(sequences[0])
    for seq, cig, sl, sr in members:
        poa.insert_alignment(seq, cig, sl, sr)
    c = float(np.float32(len(sequences) * np.float32(0.4)))
    poa.adjust_weights(c, 0.3)
    want = poa.consensus()
    got = poa_consensus_batch([(sequences[0], members)], [c], 0.3)
    assert got == [want]


def test_native_poa_matches_python_random():
    """Randomized batch incl. non-spanning members, mismatch/indel cigars,
    and the stale-cigar reuse shape (cigar repeated for a later member)."""
    import random

    from otter_tpu.native import poa_consensus_batch

    rng = random.Random(31)

    def rand_seq(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    def mut(s, rate):
        o = []
        for ch in s:
            x = rng.random()
            if x < rate * 0.4:
                o.append(rng.choice([b for b in "ACGT" if b != ch]))
            elif x < rate * 0.7:
                o.extend([ch, rng.choice("ACGT")])
            elif x < rate:
                pass
            else:
                o.append(ch)
        return "".join(o)

    tasks = []
    cvals = []
    wants = []
    for _ in range(12):
        bb = rand_seq(rng.randrange(50, 220))
        members = []
        for _m in range(rng.randrange(2, 8)):
            seq = mut(bb, rng.choice([0.02, 0.08]))
            sl = rng.random() > 0.2
            sr = rng.random() > 0.2
            if not sl:
                seq = seq[rng.randrange(1, 10):]
            if not sr:
                seq = seq[: len(seq) - rng.randrange(1, 10)]
            from otter_tpu.ops.align_np import affine_align_ends_free_cigar
            ld = len(bb) - len(seq)
            pe = max(0, ld) if not sr else 0
            pb = max(0, ld) if not sl and sr else 0
            cigar = affine_align_ends_free_cigar(bb, seq, pb, pe, 0, 0)
            members.append((seq, cigar, sl, sr))
        n_members = len(members) + 1
        c = float(np.float32(1.0 if n_members < 4
                             else np.float32(n_members * 0.4)))
        poa = Ppoa(bb)
        for seq, cig, sl, sr in members:
            poa.insert_alignment(seq, cig, sl, sr)
        poa.adjust_weights(c, float(np.float32(0.3)))
        wants.append(poa.consensus())
        tasks.append((bb, members))
        cvals.append(c)
    got = poa_consensus_batch(tasks, cvals, float(np.float32(0.3)))
    assert got == wants
