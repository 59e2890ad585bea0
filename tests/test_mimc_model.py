"""MiMC cubing hash-chain AIR: the first nonlinear (cubic) transition
constraint — host roundtrip, engine/host byte equality, fast-mode roundtrip."""

import numpy as np
import pytest

from ministark_tpu.fields import BabyBear, Goldilocks
from ministark_tpu.models.mimc import (
    MimcClaim,
    MimcWitness,
    mimc_chain_output,
    mimc_device_trace,
    round_constant,
)
from ministark_tpu.stark import (
    FastStark,
    FastStarkConfig,
    Stark,
    StarkConfig,
)
from ministark_tpu.stark.engine import DeviceEngine


def test_chain_semantics():
    p = Goldilocks.base.p
    s = 3
    for i in range(5):
        s = pow((s + round_constant(i, p)) % p, 3, p)
    assert mimc_chain_output(p, 5, 3) == s


@pytest.mark.parametrize("sf,steps", [(Goldilocks, 25), (BabyBear, 13)])
def test_mimc_host_roundtrip(sf, steps):
    base = sf.base
    out = mimc_chain_output(base.p, steps, 3)
    claim = MimcClaim(field=base, steps=steps, output=out)
    trace = claim.trace(MimcWitness(s0=3))
    assert trace.constrain_number() == 4
    # trace rows really follow the chain (the cubic constraint is meaningful)
    s = 3
    for i in range(steps):
        u = pow((s + round_constant(i, base.p)) % base.p, 3, base.p)
        assert trace.trace.get_value(i, 0) == base.from_int(s)
        assert trace.trace.get_value(i, 1) == base.from_int(u)
        s = u
    cfg = StarkConfig(sf, 20, 2, steps, trace.constrain_number())
    stark = Stark(cfg)
    proof = stark.prove(claim, MimcWitness(s0=3))
    assert stark.verify(trace.derive_constrains(), proof)


def test_mimc_device_matches_host():
    sf = Goldilocks
    steps = 25
    base = sf.base
    claim = MimcClaim(field=base, steps=steps,
                      output=mimc_chain_output(base.p, steps, 3))
    trace = claim.trace(MimcWitness(s0=3))
    cfg = StarkConfig(sf, 20, 2, steps, trace.constrain_number())
    host_proof = Stark(cfg).prove(claim, MimcWitness(s0=3))
    dev_proof = DeviceEngine(cfg).prove(mimc_device_trace(sf, steps, 3))
    assert dev_proof.arthur == host_proof.arthur
    assert dev_proof.trace_commit == host_proof.trace_commit
    assert dev_proof.constrain_trace_commit == host_proof.constrain_trace_commit
    assert dev_proof.validity_queries == host_proof.validity_queries


def test_mimc_device_matches_host_babybear():
    sf = BabyBear
    steps = 13
    base = sf.base
    claim = MimcClaim(field=base, steps=steps,
                      output=mimc_chain_output(base.p, steps, 3))
    cfg = StarkConfig(sf, 20, 2, steps, 4)
    host_proof = Stark(cfg).prove(claim, MimcWitness(s0=3))
    dev_proof = DeviceEngine(cfg).prove(mimc_device_trace(sf, steps, 3))
    assert dev_proof.arthur == host_proof.arthur


def test_mimc_generic_core():
    """The compile-check prover core (stark/core.py) builds from ANY
    DeviceTrace; MiMC's inline transitions must be bit-identical to the
    engine-path closures and the core must compile with them nested in."""
    import jax
    import jax.numpy as jnp

    from ministark_tpu.ops.ntt_device import get_ntt_fns
    from ministark_tpu.ops.registry import get_kernels
    from ministark_tpu.stark.core import make_prove_core

    sf = Goldilocks
    base = sf.base
    kb = get_kernels(base)
    t = mimc_device_trace(sf, 63)
    n = t.domain_size
    cols = jnp.asarray(kb.pack(t.cols.reshape(-1)).reshape((2, n) + kb.elem_axes))
    _, ifft, _, _ = get_ntt_fns(base, n)
    tp = ifft(cols)
    for f_eng, f_inl in zip(t.transitions, t.transitions_inline):
        a = np.asarray(f_eng(tp))
        b = np.asarray(jax.jit(f_inl)(tp))
        assert np.array_equal(a, b)

    core, example_args = make_prove_core(sf, n, trace_builder=mimc_device_trace)
    lde, mixed, folded = core(*example_args())
    assert lde.shape[:2] == (4, 2 * n)
    assert mixed.shape[0] == n and folded.shape[0] == n // 2


def test_mimc_fast_mode():
    sf = Goldilocks
    steps = 100
    stark = FastStark(FastStarkConfig(sf, steps, queries=8, final_len=8))
    trace = mimc_device_trace(sf, steps, 3)
    proof = stark.prove(trace)
    assert proof.width == 2 and proof.transitions == 2
    assert stark.verify(np.asarray(stark._constraint_polys(trace)), proof)
