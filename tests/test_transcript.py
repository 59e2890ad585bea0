"""Transcript layer: IO pattern shape, sponge golden vectors, Merlin/Arthur
round-trips, and the reference STARK/FRI pattern byte accounting."""

import pytest

from ministark_tpu.fields import BabyBear, Goldilocks, GOLDILOCKS_FP, GOLDILOCKS_FP2
from ministark_tpu.transcript import Arthur, DigestSponge, IOPattern, Merlin
from ministark_tpu.transcript.iopattern import (
    bytes_uniform_modp,
    new_stark_iopattern,
)
from ministark_tpu.utils import TranscriptError


def test_bytes_uniform_modp():
    assert bytes_uniform_modp(64) == 24
    assert bytes_uniform_modp(31) == 19


def test_iopattern_serialization():
    io = IOPattern("proto").add_bytes(32, "commit").challenge_bytes(8, "chal")
    assert io.as_string() == "proto\x00A32commit\x00S8chal"


def test_iopattern_merging():
    io = IOPattern("x").absorb(3, "a").absorb(5, "b").squeeze(2, "c").squeeze(2, "d")
    assert io.finalize() == [("A", 8), ("S", 4)]


def test_stark_iopattern_shape():
    """Goldilocks e2e config: rounds=5, constrain_queries=1, fri_queries=10."""
    io = new_stark_iopattern(Goldilocks, 5, 1, 10, "🐺")
    s = io.as_string()
    assert s.startswith("🐺\x00A32commit to original trace\x00S24ZK: pick random shift of domain")
    # 1 ext DEEP-ALI query = 2 base scalars * 24B
    assert "S48number of queries in DEEP ALI" in s
    # FRI fold round: z (48B squeeze), B poly (2 * 16B absorb), alpha, digest
    assert s.count("S48(DEEP) FRI: pick random z") == 4
    assert s.count("A32(DEEP) FRI: degree one B polynomial") == 4
    assert s.count("S48FRI COMMIT Phase: random scalar challenge") == 4
    assert s.count("A32FRI COMMIT Phase: commit to folded codeword") == 4
    assert s.endswith("S80FRI QUERY Phase: choose a random element in the domain")


def test_stark_iopattern_babybear():
    io = new_stark_iopattern(BabyBear, 5, 1, 10, "🐺")
    s = io.as_string()
    # base challenges 19B; ext (deg 4) challenges 76B; ext scalars 16B
    assert "S19ZK: pick random shift of domain" in s
    assert "S76number of queries in DEEP ALI" in s
    assert "S76(DEEP) FRI: pick random z" in s
    assert "A32(DEEP) FRI: degree one B polynomial" in s


def test_sponge_streaming_squeeze():
    s1 = DigestSponge(b"tag")
    s1.absorb(b"hello")
    a = s1.squeeze(16) + s1.squeeze(16)
    s2 = DigestSponge(b"tag")
    s2.absorb(b"hello")
    assert a == s2.squeeze(32)


def test_sponge_absorb_granularity():
    s1 = DigestSponge(b"tag")
    s1.absorb(b"hel")
    s1.absorb(b"lo")
    s2 = DigestSponge(b"tag")
    s2.absorb(b"hello")
    assert s1.squeeze(32) == s2.squeeze(32)


def test_sponge_domain_separation():
    assert DigestSponge(b"a").squeeze(8) != DigestSponge(b"b").squeeze(8)


def test_sponge_golden_pinned():
    """Self-golden vector: pins the reconstructed DigestBridge semantics so
    accidental changes are caught (PARITY.md documents the reconstruction)."""
    s = DigestSponge(b"iop")
    s.absorb(b"data")
    out1 = s.squeeze(8)
    s.absorb(b"more")
    out2 = s.squeeze(8)
    assert out1.hex() == s_golden_1
    assert out2.hex() == s_golden_2


# computed once from the implementation and pinned
s_golden_1 = "b1dbba19df5409e1"
s_golden_2 = "4a18a1c52fd54c87"


def test_merlin_arthur_roundtrip():
    io = (
        IOPattern("t")
        .add_bytes(4, "x")
        .challenge_bytes(8, "c1")
        .add_bytes(2, "y")
        .challenge_bytes(4, "c2")
    )
    m = Merlin(io)
    m.add_bytes(b"abcd")
    c1 = m.fill_challenge_bytes(8)
    m.add_bytes(b"ef")
    c2 = m.fill_challenge_bytes(4)

    a = Arthur(io, m.transcript())
    assert a.fill_next_units(4) == b"abcd"
    assert a.fill_challenge_bytes(8) == c1
    assert a.fill_next_units(2) == b"ef"
    assert a.fill_challenge_bytes(4) == c2


def test_merlin_enforces_pattern():
    io = IOPattern("t").add_bytes(4, "x")
    m = Merlin(io)
    with pytest.raises(TranscriptError):
        m.fill_challenge_bytes(8)
    m2 = Merlin(io)
    with pytest.raises(TranscriptError):
        m2.add_bytes(b"abcdef")  # overflow declared 4


def test_field_challenges_and_scalars():
    E = GOLDILOCKS_FP2
    io = (
        IOPattern("t")
        .challenge_scalars(E, 1, "z")
        .add_scalars(E, 2, "b")
        .challenge_scalars(GOLDILOCKS_FP, 1, "r")
    )
    m = Merlin(io)
    z = m.challenge_scalar(E)
    assert isinstance(z, tuple) and len(z) == 2
    m.add_scalars(E, [(1, 2), (3, 4)])
    r = m.challenge_scalar(GOLDILOCKS_FP)
    assert 0 <= r < GOLDILOCKS_FP.p

    a = Arthur(io, m.transcript())
    assert a.challenge_scalar(E) == z
    assert a.next_scalars(E, 2) == [(1, 2), (3, 4)]
    assert a.challenge_scalar(GOLDILOCKS_FP) == r
