"""Field layer tests: constants from src/field.rs, arithmetic laws, encodings."""

import pytest

from ministark_tpu.fields import (
    BABYBEAR_FP,
    BABYBEAR_FP2,
    BABYBEAR_FP4,
    GOLDILOCKS_FP,
    GOLDILOCKS_FP2,
    BabyBear,
    Goldilocks,
)


def test_moduli_and_generators():
    assert GOLDILOCKS_FP.p == 18446744069414584321 == 2**64 - 2**32 + 1
    assert GOLDILOCKS_FP.generator == 7
    assert GOLDILOCKS_FP.modulus_bit_size == 64
    assert GOLDILOCKS_FP.two_adicity == 32

    assert BABYBEAR_FP.p == 2013265921 == 15 * 2**27 + 1
    assert BABYBEAR_FP.generator == 440564289
    assert BABYBEAR_FP.modulus_bit_size == 31
    assert BABYBEAR_FP.two_adicity == 27


def test_two_adic_roots():
    for F in (GOLDILOCKS_FP, BABYBEAR_FP):
        root = F.two_adic_root_of_unity
        # order exactly 2^two_adicity
        assert pow(root, 1 << F.two_adicity, F.p) == 1
        assert pow(root, 1 << (F.two_adicity - 1), F.p) == F.p - 1
    # known Goldilocks 2^32 root for generator 7
    assert GOLDILOCKS_FP.two_adic_root_of_unity == pow(7, 2**32 - 1, GOLDILOCKS_FP.p)


def test_soundness_check():
    Goldilocks.soundness_check()
    BabyBear.soundness_check()
    assert Goldilocks.extension.extension_degree == 2
    assert BabyBear.extension.extension_degree == 4


@pytest.mark.parametrize("E", [GOLDILOCKS_FP2, BABYBEAR_FP2, BABYBEAR_FP4])
def test_extension_field_laws(E):
    a = E.from_base_coeffs(tuple((i * 7919 + 13) % E.base.p for i in range(E.extension_degree)))
    b = E.from_base_coeffs(tuple((i * 104729 + 5) % E.base.p for i in range(E.extension_degree)))
    one, zero = E.one(), E.zero()
    assert E.mul(a, one) == a
    assert E.add(a, zero) == a
    assert E.mul(a, b) == E.mul(b, a)
    assert E.sub(E.add(a, b), b) == a
    assert E.mul(a, E.inv(a)) == one
    assert E.pow(a, E.base.p**E.extension_degree - 1) == one  # Fermat in F_{p^d}
    # distributivity
    c = E.from_int(12345)
    assert E.mul(E.add(a, b), c) == E.add(E.mul(a, c), E.mul(b, c))


def test_nonresidues_are_nonsquares():
    # u^2 = NR must have no root in the base field for the tower to be a field
    F = GOLDILOCKS_FP
    assert pow(7, (F.p - 1) // 2, F.p) == F.p - 1
    F = BABYBEAR_FP
    assert pow(11, (F.p - 1) // 2, F.p) == F.p - 1


def test_display_strings():
    assert GOLDILOCKS_FP.to_string(12345) == "12345"
    assert GOLDILOCKS_FP2.to_string((3, 4)) == "QuadExtField(3 + 4 * u)"
    # Fp4 nests Fp2 Displays (ark QuadExtField over Fp2)
    s = BABYBEAR_FP4.to_string(((1, 2), (3, 4)))
    assert s == "QuadExtField(QuadExtField(1 + 2 * u) + QuadExtField(3 + 4 * u) * u)"


def test_serialization_roundtrip():
    assert GOLDILOCKS_FP.compressed_size == 8
    assert BABYBEAR_FP.compressed_size == 4
    assert GOLDILOCKS_FP2.compressed_size == 16
    assert BABYBEAR_FP4.compressed_size == 16
    for E in (GOLDILOCKS_FP, BABYBEAR_FP, GOLDILOCKS_FP2, BABYBEAR_FP4):
        a = E.from_int(987654321)
        assert E.deserialize_compressed(E.serialize_compressed(a)) == a


def test_from_be_bytes_mod_order():
    F = GOLDILOCKS_FP
    assert F.from_be_bytes_mod_order(b"\x01\x00") == 256
    big = (2**190 + 12345).to_bytes(24, "big")
    assert F.from_be_bytes_mod_order(big) == (2**190 + 12345) % F.p


def test_extension_from_base_prime_field():
    x = BABYBEAR_FP4.from_base_prime_field(42)
    assert x == ((42, 0), (0, 0))
    assert BABYBEAR_FP4.base_coeffs(x) == (42, 0, 0, 0)
    assert BABYBEAR_FP4.from_base_coeffs((1, 2, 3, 4)) == ((1, 2), (3, 4))


def test_frobenius_coefficients_match_reference_tables():
    # src/field.rs:54-61: Goldilocks FROBENIUS_COEFF_FP2_C1 = [1, p-1]
    assert GOLDILOCKS_FP2._frobenius_coeffs == [1, GOLDILOCKS_FP.p - 1]
    # src/field.rs:84-91: BabyBear Fp2 = [1, p-1]
    assert BABYBEAR_FP2._frobenius_coeffs == [1, BABYBEAR_FP.p - 1]


def test_frobenius_map():
    E = GOLDILOCKS_FP2
    a = (123456789, 987654321)
    # frobenius = x^q must agree with explicit exponentiation
    assert E.frobenius_map(a, 1) == E.pow(a, GOLDILOCKS_FP.p)
    assert E.frobenius_map(a, 0) == a
    assert E.frobenius_map(E.frobenius_map(a, 1), 1) == a


def test_fft_root_in_extension_is_base_valued():
    w = GOLDILOCKS_FP2.get_root_of_unity(16)
    assert w[1] == 0
    assert pow(w[0], 16, GOLDILOCKS_FP.p) == 1
