"""End-to-end STARK prove + verify over BabyBear (+Fp4), mirroring
tests/e2e_babybear.rs."""

from ministark_tpu.fields import BabyBear, BABYBEAR_FP
from ministark_tpu.models import FibonacciClaim, Witness
from ministark_tpu.stark import Stark, StarkConfig

F = BABYBEAR_FP
ZERO = F.zero()


def _setup():
    witness = Witness(secret_b=F.from_int(2))
    claim = FibonacciClaim(field=F, step=7, output=F.from_int(13))
    return witness, claim


def test_fibonacci_air_constrains():
    witness, claim = _setup()
    trace = claim.trace(witness)
    constrains = trace.derive_constrains()
    domain = trace.get_domain()

    carry = constrains.get_constrain_poly(2).mul_by_vanishing_poly(domain)
    s = constrains.get_constrain_poly(3).mul_by_vanishing_poly(domain)
    for i in range(trace.step_number() - 1):
        w_i = domain.element(i)
        assert carry.evaluate(w_i) == ZERO
        assert s.evaluate(w_i) == ZERO


def test_stark_prover():
    witness, claim = _setup()
    trace = claim.trace(witness)
    constrains = trace.derive_constrains()

    blowup_factor = 2
    columns = trace.constrain_number()
    assert columns == 6

    config = StarkConfig(BabyBear, 20, blowup_factor, trace.step_number(), columns)
    proof_system = Stark(config)
    proof = proof_system.prove(claim, witness)
    assert proof_system.verify(constrains, proof)
