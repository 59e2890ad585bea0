"""Device decimal leaf hashing vs hashlib / native engine."""

import hashlib

import numpy as np
import jax.numpy as jnp
import pytest

from ministark_tpu.fields import BABYBEAR_FP4, GOLDILOCKS_FP, GOLDILOCKS_FP2
from ministark_tpu.ops.leaf_hash import leaf_hash_device_jit, u64_digits
from ministark_tpu.ops.sha256 import digests_to_bytes

rng = np.random.default_rng(9)


def _comps_u32(vals_u64):
    v = np.asarray(vals_u64, dtype=np.uint64)
    lo = (v & 0xFFFFFFFF).astype(np.uint32)
    hi = (v >> 32).astype(np.uint32)
    return jnp.asarray(np.stack([lo, hi], axis=-1))


def test_u64_digits():
    vals = np.array([0, 1, 9, 10, 12345, 2**63 + 7, 18446744073709551615], dtype=np.uint64)
    arr = _comps_u32(vals.reshape(-1, 1))
    dig, length = u64_digits(arr[..., 0], arr[..., 1])
    dig = np.asarray(dig)
    length = np.asarray(length)
    for i, v in enumerate(vals):
        s = str(int(v))
        assert int(length[i, 0]) == len(s)
        got = "".join(str(int(d)) for d in dig[i, 0][: len(s)][::-1])
        assert got == s


def test_leaf_hash_fmt0():
    vals = np.array([10, 11, 12, 13, 0, 18446744069414584320], dtype=np.uint64)
    comps = _comps_u32(vals.reshape(-1, 1))
    out = digests_to_bytes(leaf_hash_device_jit(comps, 2, 0))
    for g in range(3):
        pre = (str(int(vals[2 * g])) + str(int(vals[2 * g + 1]))).encode()
        assert out[g].tobytes() == hashlib.sha256(pre).digest()


def test_leaf_hash_fmt0_wide_group():
    vals = rng.integers(0, GOLDILOCKS_FP.p, size=12, dtype=np.uint64)
    comps = _comps_u32(vals.reshape(-1, 1))
    out = digests_to_bytes(leaf_hash_device_jit(comps, 6, 0))
    for g in range(2):
        pre = "".join(str(int(v)) for v in vals[6 * g : 6 * g + 6]).encode()
        assert out[g].tobytes() == hashlib.sha256(pre).digest()


def test_leaf_hash_fmt1():
    E = GOLDILOCKS_FP2
    elems = [(1, 2), (3, 4), (GOLDILOCKS_FP.p - 1, 0), (12345678901234567890 % GOLDILOCKS_FP.p, 7)]
    comps = _comps_u32(np.array(elems, dtype=np.uint64))
    out = digests_to_bytes(leaf_hash_device_jit(comps, 2, 1))
    for g in range(2):
        pre = (E.to_string(elems[2 * g]) + E.to_string(elems[2 * g + 1])).encode()
        assert out[g].tobytes() == hashlib.sha256(pre).digest()


def test_leaf_hash_fmt2():
    E = BABYBEAR_FP4
    elems = [((1, 2), (3, 4)), ((2013265920, 0), (7, 123456789))]
    comps = _comps_u32(
        np.array([[c for pair in e for c in pair] for e in elems], dtype=np.uint64)
    )
    out = digests_to_bytes(leaf_hash_device_jit(comps, 2, 2))
    pre = (E.to_string(elems[0]) + E.to_string(elems[1])).encode()
    assert out[0].tobytes() == hashlib.sha256(pre).digest()


def test_leaf_hash_matches_native_engine():
    from ministark_tpu.commit import native

    if not native.available():
        pytest.skip("native engine unavailable")
    vals = rng.integers(0, GOLDILOCKS_FP.p, size=64, dtype=np.uint64)
    dev = digests_to_bytes(leaf_hash_device_jit(_comps_u32(vals.reshape(-1, 1)), 2, 0))
    nat = native.leaf_hash_batch(vals, 2, 0)
    assert np.array_equal(dev, nat)

    pairs = rng.integers(0, GOLDILOCKS_FP.p, size=(32, 2), dtype=np.uint64)
    dev = digests_to_bytes(leaf_hash_device_jit(_comps_u32(pairs), 2, 1))
    nat = native.leaf_hash_batch(pairs, 2, 1)
    assert np.array_equal(dev, nat)


def test_fp4_digits10_matches_digits20():
    """BabyBear components (< 2^31) hash identically with the 10-digit
    u32 ladder and the generic 20-digit u64 ladder (packed_tree passes
    max_digits=10 for u32 fields)."""
    import numpy as np

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 2013265921, size=(8, 4), dtype=np.uint64)
    comps = np.stack([(vals & 0xFFFFFFFF).astype(np.uint32),
                      (vals >> 32).astype(np.uint32)], axis=-1)
    a = digests_to_bytes(leaf_hash_device_jit(comps, 2, 2, 10))
    b = digests_to_bytes(leaf_hash_device_jit(comps, 2, 2, 20))
    assert a.tobytes() == b.tobytes()


def test_base_digits10_matches_digits20():
    import numpy as np

    rng = np.random.default_rng(12)
    vals = rng.integers(0, 2013265921, size=(8, 1), dtype=np.uint64)
    comps = np.stack([(vals & 0xFFFFFFFF).astype(np.uint32),
                      (vals >> 32).astype(np.uint32)], axis=-1)
    a = digests_to_bytes(leaf_hash_device_jit(comps, 2, 0, 10))
    b = digests_to_bytes(leaf_hash_device_jit(comps, 2, 0, 20))
    assert a.tobytes() == b.tobytes()
