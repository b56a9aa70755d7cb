"""Device (jnp) PPOA heaviest-path DP parity vs the python Ppoa oracle.

The device DP (ops/poa_device.py) must reproduce the oracle's consensus
byte-for-byte: same f32 path arithmetic (anppoa.hpp:258-277), same
first-incoming-edge tie rule, same ascending best-ending-node rule
(:356-367). Runs on the test suite's virtual CPU devices; also exercised
sharded over the 8-device mesh."""

import random

import numpy as np
import pytest

from otter_tpu.ops.align_np import affine_align_cigar
from otter_tpu.ops.poa import Ppoa
from otter_tpu.ops.poa_device import poa_consensus_device_batch


def build_poa(sequences, spans=None):
    poa = Ppoa(sequences[0])
    for mi, seq in enumerate(sequences):
        cigar = affine_align_cigar(sequences[0], seq)
        sl, sr = (True, True) if spans is None else spans[mi]
        poa.insert_alignment(seq, cigar, sl, sr)
    poa.adjust_weights(
        float(np.float32(len(sequences) * np.float32(0.4))), 0.3)
    return poa


GOLDEN = [
    [
        "TCTGTTTCAAAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAGAAAAGAAAAAGCATGTTCTA",
        "TCTGTTTCAAAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAAGCATGTTCTA",
        "TCTGTTTCAAAAAAGAAAAGAAAAGAAAAGAAAAGAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAAGCATGTTCTA",
        "TCTGTTTCAAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAAGCATGTTCT",
        "TCTGTTTCAAAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAGAAAAAGCATGTTCTA",
    ],
    [
        "ATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTAT",
        "ATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTAT",
        "ATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTAT",
        "ATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTATTTTAT",
    ],
]


def test_device_matches_oracle_golden():
    poas = [build_poa(seqs) for seqs in GOLDEN]
    want = [p.consensus() for p in poas]
    got = poa_consensus_device_batch(poas)
    assert got == want


def _mutate(rng, s, rate):
    out = []
    for ch in s:
        x = rng.random()
        if x < rate * 0.4:
            out.append(rng.choice([b for b in "ACGT" if b != ch]))
        elif x < rate * 0.7:
            out.extend([ch, rng.choice("ACGT")])
        elif x < rate:
            pass
        else:
            out.append(ch)
    return "".join(out)


def test_device_matches_oracle_random():
    rng = random.Random(5)
    poas = []
    for trial in range(30):
        L = rng.randrange(20, 200)
        base = "".join(rng.choice("ACGT") for _ in range(L))
        n = rng.randrange(3, 9)
        rate = rng.choice([0.01, 0.05, 0.15])
        seqs = [base] + [_mutate(rng, base, rate) for _ in range(n - 1)]
        spans = [(rng.random() < 0.9, rng.random() < 0.9) for _ in seqs]
        poas.append(build_poa(seqs, spans))
    want = [p.consensus() for p in poas]
    got = poa_consensus_device_batch(poas)
    assert got == want


def test_device_matches_oracle_ties():
    """Tandem-repeat unit-count ties: alternate heaviest paths with exactly
    equal f32 weights — the first-incoming-edge and ascending-ending-node
    rules must pick the oracle's path."""
    rng = random.Random(9)
    poas = []
    for trial in range(12):
        unit = rng.choice(["CAG", "AT", "TTTA"])
        n_units = rng.randrange(4, 10)
        base = unit * n_units
        seqs = [base]
        for _ in range(4):
            k = n_units + rng.choice([-1, 0, 1])
            seqs.append(unit * k)
        poas.append(build_poa(seqs))
    want = [p.consensus() for p in poas]
    got = poa_consensus_device_batch(poas)
    assert got == want


def test_device_matches_oracle_on_mesh():
    import jax
    from otter_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    rng = random.Random(13)
    poas = []
    for trial in range(10):
        base = "".join(rng.choice("ACGT") for _ in range(60))
        seqs = [base] + [_mutate(rng, base, 0.05) for _ in range(4)]
        poas.append(build_poa(seqs))
    want = [p.consensus() for p in poas]
    got = poa_consensus_device_batch(poas, mesh=make_mesh())
    assert got == want


def test_degenerate_single_node():
    poa = Ppoa("A")
    assert poa_consensus_device_batch([poa]) == [poa.consensus()]
