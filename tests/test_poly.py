"""Polynomial / domain layer tests (ark-poly semantics)."""

import pytest

from ministark_tpu.fields import BABYBEAR_FP, GOLDILOCKS_FP, GOLDILOCKS_FP2
from ministark_tpu.poly import DensePolynomial, Radix2EvaluationDomain


def test_domain_rounding_and_generator():
    d = Radix2EvaluationDomain(GOLDILOCKS_FP, 10)
    assert d.size() == 16
    assert pow(d.group_gen, 16, GOLDILOCKS_FP.p) == 1
    assert pow(d.group_gen, 8, GOLDILOCKS_FP.p) != 1


def test_fft_ifft_roundtrip():
    F = GOLDILOCKS_FP
    d = Radix2EvaluationDomain(F, 16)
    coeffs = [(i * 31 + 7) % F.p for i in range(16)]
    evals = d.fft(coeffs)
    # evals[i] == f(g^i), cross-checked with Horner
    p = DensePolynomial(F, coeffs)
    for i in (0, 1, 5, 15):
        assert evals[i] == p.evaluate(d.element(i))
    assert d.ifft(evals) == coeffs


def test_coset_fft():
    F = BABYBEAR_FP
    d = Radix2EvaluationDomain(F, 8).get_coset(F.from_int(5))
    coeffs = [1, 2, 3, 4, 5, 0, 0, 0]
    p = DensePolynomial(F, coeffs)
    evals = d.fft(coeffs)
    for i in range(8):
        assert evals[i] == p.evaluate(d.element(i))
    assert d.ifft(evals) == coeffs


def test_fft_shorter_input_zero_pads():
    F = GOLDILOCKS_FP
    d = Radix2EvaluationDomain(F, 8)
    p = DensePolynomial(F, [3, 1])
    evals = p.evaluate_over_domain(d)
    for i in range(8):
        assert evals[i] == p.evaluate(d.element(i))


def test_extension_field_domain():
    E = GOLDILOCKS_FP2
    d = Radix2EvaluationDomain(E, 8)
    coeffs = [(i, i + 1) for i in range(8)]
    evals = d.fft(coeffs)
    p = DensePolynomial(E, coeffs)
    assert evals[3] == p.evaluate(d.element(3))
    assert d.ifft(evals) == [E.from_base_coeffs((c[0], c[1])) for c in coeffs]


def test_zero_poly_semantics():
    F = GOLDILOCKS_FP
    z = DensePolynomial(F, [0, 0, 0])
    assert z.is_zero()
    assert z.degree() == 0  # ark: zero poly degree() == 0
    assert z.to_vec() == []


def test_division():
    F = GOLDILOCKS_FP
    a = DensePolynomial(F, [2, 0, 3, 1])      # 2 + 3x^2 + x^3
    b = DensePolynomial(F, [1, 1])            # 1 + x
    q, r = a.divide_with_remainder(b)
    assert q * b + r == a
    assert (a * b) / b == a                   # exact division via __truediv__


def test_divide_by_vanishing_poly_order():
    """ark returns (quotient, remainder) — pin the order (SURVEY §8.3)."""
    F = GOLDILOCKS_FP
    d = Radix2EvaluationDomain(F, 4)
    low = DensePolynomial(F, [1, 2, 3])       # degree < 4
    q, r = low.divide_by_vanishing_poly(d)
    assert q.is_zero() and r == low

    p = DensePolynomial(F, [0, 0, 0, 0, 1])   # x^4 = Z(x) + 1
    q, r = p.divide_by_vanishing_poly(d)
    assert q == DensePolynomial(F, [1])
    assert r == DensePolynomial(F, [1])

    # generic consistency: p == q * Z + r
    p = DensePolynomial(F, [(i * 13 + 5) % F.p for i in range(11)])
    q, r = p.divide_by_vanishing_poly(d)
    z = DensePolynomial(F, d.vanishing_poly_coeffs())
    assert q * z + r == p
    assert r.degree() < 4 or r.is_zero()


def test_divide_by_vanishing_poly_coset():
    F = BABYBEAR_FP
    d = Radix2EvaluationDomain(F, 4).get_coset(F.from_int(3))
    p = DensePolynomial(F, [(i * 7 + 1) % F.p for i in range(9)])
    q, r = p.divide_by_vanishing_poly(d)
    z = DensePolynomial(F, d.vanishing_poly_coeffs())
    assert q * z + r == p


def test_mul_by_vanishing_poly():
    F = GOLDILOCKS_FP
    d = Radix2EvaluationDomain(F, 4)
    p = DensePolynomial(F, [1, 2])
    m = p.mul_by_vanishing_poly(d)
    for i in range(4):
        assert m.evaluate(d.element(i)) == 0


def test_extend_poly():
    from ministark_tpu.fields import Goldilocks

    p = DensePolynomial(GOLDILOCKS_FP, [1, 2, 3])
    e = p.extend(Goldilocks)
    assert e.coeffs == [(1, 0), (2, 0), (3, 0)]
    assert e.field is Goldilocks.extension
