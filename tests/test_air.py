"""AIR layer tests mirroring src/air.rs:188-358 (2-register fixture) and the
trace-table semantics."""

from ministark_tpu.air import Provable, TraceTable
from ministark_tpu.fields import GOLDILOCKS_FP
from ministark_tpu.poly import DensePolynomial, Radix2EvaluationDomain

F = GOLDILOCKS_FP
ONE = F.one()
ZERO = F.zero()


class FibonacciClaim2(Provable):
    """The reference's in-module 2-register fixture (src/air.rs:198-241)."""

    def __init__(self, step, output):
        self.step = step
        self.output = output

    def trace(self, _witness):
        trace = TraceTable(F, self.step, 2)
        omega = trace.omega
        a = b = ONE
        trace.add_boundary_constrain(0, 0)
        trace.add_boundary_constrain(0, 1)
        for i in range(self.step):
            c = F.add(a, b)
            trace.add_row(i, [a, b])
            a, b = b, c
        trace.add_boundary_constrain(self.step - 1, 1)
        trace.add_transition_constrain(
            lambda tp: tp[0] * DensePolynomial(F, [omega]) - tp[1]
        )
        trace.add_transition_constrain(
            lambda tp: tp[1].scale(omega) - (tp[0] + tp[1])
        )
        return trace


def test_air_trace():
    claim = FibonacciClaim2(3, F.from_int(3))
    trace = claim.trace(None)
    assert trace.trace.length == 4
    assert trace.trace.width == 2
    assert trace.trace.get_value(0, 0) == ONE
    assert trace.trace.get_value(claim.step - 1, 1) == claim.output
    # random padding after steps — non-zero, not the output
    assert trace.trace.get_value(claim.step, 0) != claim.output
    assert trace.trace.get_value(claim.step, 0) != ZERO

    claim = FibonacciClaim2(4, F.from_int(5))
    trace = claim.trace(None)
    assert trace.trace.length == 8
    assert trace.trace.get_value(claim.step - 1, 1) == claim.output
    assert trace.trace.get_value(claim.step, 0) != ZERO

    claim = FibonacciClaim2(5, F.from_int(8))
    trace = claim.trace(None)
    assert trace.trace.length == 8
    assert trace.trace.get_value(claim.step - 1, 1) == claim.output


def test_padding_is_single_deterministic_value():
    """Fresh test_rng per cell => every padding cell holds the same value
    (src/air.rs:79-83, SURVEY §8.7)."""
    trace = FibonacciClaim2(3, F.from_int(3)).trace(None)
    pads = {trace.trace.get_value(3, j) for j in range(2)}
    assert len(pads) == 1
    from ministark_tpu.utils.rng import ark_test_rng_fp

    assert pads.pop() == ark_test_rng_fp(F.p, F.modulus_bit_size)


def test_air_trace_polynomials():
    claim = FibonacciClaim2(3, F.from_int(3))
    trace = claim.trace(None)
    polys = trace.get_trace_polys()
    domain = Radix2EvaluationDomain(F, trace.trace.length)
    for i in range(claim.step):
        row = domain.element(i)
        assert trace.trace.get_value(i, 0) == polys[0].evaluate(row)
        assert trace.trace.get_value(i, 1) == polys[1].evaluate(row)


def test_air_constrains():
    claim = FibonacciClaim2(3, F.from_int(3))
    trace = claim.trace(None)
    domain = trace.domain
    constrains = trace.derive_constrains()
    assert constrains.transition_constrains_num == 2

    w0 = domain.element(0)
    root = DensePolynomial(F, [F.neg(w0), ONE])
    boundary1 = constrains.get_constrain_poly(0)
    assert (boundary1 * root).evaluate(ONE) == ZERO

    w2 = domain.element(claim.step - 1)
    root = DensePolynomial(F, [F.neg(w2), ONE])
    boundary3 = constrains.get_constrain_poly(1)
    assert (boundary3 * root).evaluate(w2) == ZERO

    carry = constrains.get_constrain_poly(2).mul_by_vanishing_poly(domain)
    s = constrains.get_constrain_poly(3).mul_by_vanishing_poly(domain)
    for i in range(trace.trace.length - 1):
        w_i = domain.element(i)
        assert carry.evaluate(w_i) == ZERO
        assert s.evaluate(w_i) == ZERO
