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


def test_u64_digit_nibbles_chunked():
    """The chunked magic-divide extraction (v = q1*10^10 + a*10^5 + b)
    must agree with str() digit-for-digit, including at the split
    boundaries where an off-by-one magic would first show."""
    from ministark_tpu.ops.leaf_hash import u64_digit_nibbles

    edges = []
    for k in range(20):
        for d in (-1, 0, 1):
            v = 10**k + d
            if 0 <= v < 2**64:
                edges.append(v)
    edges += [0, 1, 2**31 - 1, 2**31, 2**32 - 1, 2**32, 2**63, 2**64 - 1,
              18446744069414584320, 9999999999, 10000000000, 10000000001]
    edges += [int(x) for x in rng.integers(0, 2**63, size=500, dtype=np.uint64)]
    vals = np.array(edges, dtype=np.uint64)
    arr = _comps_u32(vals.reshape(-1, 1))
    nib, length = u64_digit_nibbles(arr[..., 0], arr[..., 1], 20)
    nib = np.asarray(nib)
    length = np.asarray(length)
    for i, v in enumerate(vals):
        s = str(int(v))
        assert int(length[i, 0]) == len(s), (v, int(length[i, 0]))
        digs = [(int(nib[i, 0, j // 8]) >> (4 * (j % 8))) & 15
                for j in range(len(s))]
        got = "".join(str(d) for d in digs[::-1])
        assert got == s, (v, got, s)
    # BabyBear width: values < 2^31, 10 digits
    vals32 = np.array([0, 1, 9, 99999, 100000, 100001, 2013265920,
                       2**31 - 1] +
                      [int(x) for x in rng.integers(0, 2**31, size=300)],
                      dtype=np.uint64)
    arr = _comps_u32(vals32.reshape(-1, 1))
    nib, length = u64_digit_nibbles(arr[..., 0], arr[..., 1], 10)
    nib = np.asarray(nib)
    length = np.asarray(length)
    for i, v in enumerate(vals32):
        s = str(int(v))
        assert int(length[i, 0]) == len(s)
        digs = [(int(nib[i, 0, j // 8]) >> (4 * (j % 8))) & 15
                for j in range(len(s))]
        assert "".join(str(d) for d in digs[::-1]) == s


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


def test_leaf_hash_pallas_masked_matches_xla(monkeypatch):
    """The Pallas masked-compression path (MINISTARK_SHA_PALLAS=1, wide
    batches) is digest-identical to the XLA sha256_blocks path for the
    variable-length decimal preimages."""
    from ministark_tpu.ops import sha256_pallas as sp
    from ministark_tpu.ops.leaf_hash import leaf_hash_device

    n = sp.MIN_LANES * 2  # groups; k=2 elements per group, fmt 1 (GL Fp2)
    vals = rng.integers(0, GOLDILOCKS_FP.p, size=(2 * n, 2), dtype=np.uint64)
    lo = (vals & 0xFFFFFFFF).astype(np.uint32)
    hi = (vals >> 32).astype(np.uint32)
    comps = jnp.asarray(np.stack([lo, hi], axis=-1))
    monkeypatch.setenv("MINISTARK_SHA_PALLAS", "0")
    want = np.asarray(leaf_hash_device(comps, 2, 1))
    monkeypatch.setenv("MINISTARK_SHA_PALLAS", "1")
    got = np.asarray(leaf_hash_device(comps, 2, 1))
    assert got.shape == want.shape
    assert np.array_equal(got, want)


def test_leaf_hash_pallas_masked_bb_fmt2(monkeypatch):
    """Same for the BabyBear Fp4 format (10-digit ladder, 4 components,
    more active-block variance)."""
    from ministark_tpu.ops import sha256_pallas as sp
    from ministark_tpu.ops.leaf_hash import leaf_hash_device

    p = 2013265921
    n = sp.MIN_LANES  # groups; k=2, fmt 2
    vals = rng.integers(0, p, size=(2 * n, 4), dtype=np.uint64)
    # force some short digit strings for mask variance
    vals[: n // 4] %= 10
    lo = (vals & 0xFFFFFFFF).astype(np.uint32)
    hi = (vals >> 32).astype(np.uint32)
    comps = jnp.asarray(np.stack([lo, hi], axis=-1))
    monkeypatch.setenv("MINISTARK_SHA_PALLAS", "0")
    want = np.asarray(leaf_hash_device(comps, 2, 2, 10))
    monkeypatch.setenv("MINISTARK_SHA_PALLAS", "1")
    got = np.asarray(leaf_hash_device(comps, 2, 2, 10))
    assert got.shape == want.shape
    assert np.array_equal(got, want)
