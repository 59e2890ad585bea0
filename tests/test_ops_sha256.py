"""Device SHA-256 vs hashlib."""

import hashlib

import numpy as np
import jax.numpy as jnp

from ministark_tpu.ops.sha256 import (
    bytes_to_digests,
    digests_to_bytes,
    merkle_inner_level2,
    merkle_inner_levels_device,
    sha256_blocks_jit,
)


def _pad_message(data: bytes) -> np.ndarray:
    """Standard SHA-256 padding -> (n_blocks, 16) u32 BE words."""
    bitlen = len(data) * 8
    data = data + b"\x80"
    while len(data) % 64 != 56:
        data += b"\x00"
    data += bitlen.to_bytes(8, "big")
    arr = np.frombuffer(data, dtype=">u4").astype(np.uint32)
    return arr.reshape(-1, 16)


def test_single_block():
    msgs = [b"abc", b"", b"hello world"]
    blocks = np.stack([_pad_message(m) for m in msgs])
    digests = digests_to_bytes(sha256_blocks_jit(jnp.asarray(blocks)))
    for i, m in enumerate(msgs):
        assert digests[i].tobytes() == hashlib.sha256(m).digest()


def test_two_blocks():
    msgs = [bytes(range(100)), b"a" * 64, b"b" * 119]
    blocks = np.stack([_pad_message(m) for m in msgs])
    assert blocks.shape[1] == 2
    digests = digests_to_bytes(sha256_blocks_jit(jnp.asarray(blocks)))
    for i, m in enumerate(msgs):
        assert digests[i].tobytes() == hashlib.sha256(m).digest()


def test_variable_block_counts_with_active_mask():
    msgs = [b"short", bytes(range(100))]  # 1 block vs 2 blocks
    padded = [_pad_message(m) for m in msgs]
    blocks = np.zeros((2, 2, 16), dtype=np.uint32)
    active = np.zeros((2, 2), dtype=bool)
    for i, p in enumerate(padded):
        blocks[i, : p.shape[0]] = p
        active[i, : p.shape[0]] = True
    digests = digests_to_bytes(
        sha256_blocks_jit(jnp.asarray(blocks), jnp.asarray(active))
    )
    for i, m in enumerate(msgs):
        assert digests[i].tobytes() == hashlib.sha256(m).digest()


def test_merkle_inner_level_matches_hashlib():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, size=(8, 32), dtype=np.uint8)
    parents = digests_to_bytes(merkle_inner_level2(bytes_to_digests(raw)))
    for i in range(4):
        expect = hashlib.sha256(raw[2 * i].tobytes() + raw[2 * i + 1].tobytes()).digest()
        assert parents[i].tobytes() == expect


def test_merkle_inner_levels_match_native():
    from ministark_tpu.commit import native

    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, size=(16, 32), dtype=np.uint8)
    dev = digests_to_bytes(merkle_inner_levels_device(bytes_to_digests(raw)))
    if native.available():
        nat = native.inner_levels(raw, 2)
        assert np.array_equal(dev, nat)
    assert dev.shape == (15, 32)
