"""Array-resident Merkle tree for large codewords (native hashing engine).

Produces digests identical to commit/merkle.py (same decimal-Display leaf
preimages, same level-by-level build, same first-occurrence value lookup) but
stores leaf values as packed numpy uint64 component arrays and all nodes as a
single (total, 32) uint8 array — no per-element Python objects. Used by the
array-native prover engine (stark/engine.py) for 2^20-row traces.

Component packing per field (must mirror fields/host.py Display semantics):
  base fields      -> (n, 1) canonical u64          (fmt 0)
  quadratic ext    -> (n, 2) [c0, c1]               (fmt 1)
  BabyBear Fp4     -> (n, 4) [c00, c01, c10, c11]   (fmt 2)
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from ..utils import LeafNotFound, logarithm_of_two_k
from . import native
from .merkle import MerklePath, MerkleTree, MerkleTreeConfig


def field_fmt(field) -> int:
    d = field.extension_degree
    if d == 1:
        return 0
    if d == 2:
        return 1
    if d == 4:
        return 2
    raise ValueError(f"unsupported extension degree {d}")


def pack_scalars(field, scalars) -> np.ndarray:
    """Host scalars -> (n, comps) uint64 component array."""
    d = field.extension_degree
    if d == 1:
        return np.asarray([int(s) for s in scalars], dtype=np.uint64).reshape(-1, 1)
    return np.asarray(
        [list(field.base_coeffs(s)) for s in scalars], dtype=np.uint64
    )


def to_leaf_comps(field, device_arr):
    """Packed device array -> (n_elems, comps, 2) u32 [lo, hi] component
    layout for ops/leaf_hash.py."""
    import jax.numpy as jnp

    d = field.extension_degree
    a = device_arr
    if a.ndim >= 2 and a.shape[-1] == 2 and (d == 1 or a.ndim == 3):
        # goldilocks: base (n, 2) -> (n, 1, 2); fp2 (n, 2, 2) stays
        return a[:, None, :] if a.ndim == 2 else a
    # babybear: base (n,) -> (n, 1); fp4 (n, 4)
    if a.ndim == 1:
        a = a[:, None]
    zero = jnp.zeros_like(a)
    return jnp.stack([a, zero], axis=-1)


def unpack_scalar(field, row: np.ndarray):
    d = field.extension_degree
    if d == 1:
        return int(row[0])
    return field.from_base_coeffs(tuple(int(x) for x in row))


class PackedMerkleTree:
    """Same commitment as commit/merkle.py MerkleTree, array-native.

    Hash backends (identical digests): on-device (JAX SHA-256 kernels, when
    ``device_vals`` is passed and MINISTARK_DEVICE_HASH=1), native C++
    (SHA-NI), or pure-python hashlib fallback.
    """

    def __init__(self, field, packed_vals: np.ndarray, config: MerkleTreeConfig,
                 device_vals=None):
        n = packed_vals.shape[0]
        k = config.leafs_per_node
        c = config.inner_children
        assert n % k == 0
        group_num = n // k
        self.levels = logarithm_of_two_k(group_num, c) + 1
        assert c ** (self.levels - 1) == group_num

        self.field = field
        self.config = config
        self.packed = np.ascontiguousarray(packed_vals, dtype=np.uint64)
        self.fmt = field_fmt(field)

        use_device = (
            device_vals is not None
            and c == 2
            and os.environ.get("MINISTARK_DEVICE_HASH") == "1"
        )
        if use_device:
            from ..ops.leaf_hash import leaf_hash_device_jit
            from ..ops.sha256 import digests_to_bytes, merkle_inner_levels_device

            comps = to_leaf_comps(field, device_vals)
            leaf_dig = leaf_hash_device_jit(comps, k, self.fmt)
            if group_num > 1:
                import jax.numpy as jnp

                upper = merkle_inner_levels_device(leaf_dig, c)
                all_dig = jnp.concatenate([leaf_dig, upper], axis=0)
            else:
                all_dig = leaf_dig
            self.nodes = digests_to_bytes(all_dig)
        elif native.available():
            leaf_digests = native.leaf_hash_batch(self.packed, k, self.fmt)
            if group_num > 1:
                upper = native.inner_levels(leaf_digests, c)
                self.nodes = np.concatenate([leaf_digests, upper], axis=0)
            else:
                self.nodes = leaf_digests
        else:  # pure-python fallback (slow; correctness path)
            scalars = [unpack_scalar(field, self.packed[i]) for i in range(n)]
            host = MerkleTree(field, scalars, config)
            self.nodes = np.frombuffer(
                b"".join(host.nodes), dtype=np.uint8
            ).reshape(-1, 32).copy()

        self._value_index = None  # built lazily for proof generation

    @classmethod
    def from_scalars(cls, field, scalars, config) -> "PackedMerkleTree":
        return cls(field, pack_scalars(field, scalars), config)

    def root(self) -> bytes:
        return self.nodes[-1].tobytes()

    def get_node_number(self) -> int:
        return self.packed.shape[0] + self.nodes.shape[0]

    # --- proofs (value lookup, first occurrence — §8.6) ---
    def _leaf_index(self, packed_value: np.ndarray) -> int:
        hits = np.all(self.packed == packed_value[None, :], axis=1)
        idx = int(np.argmax(hits))
        if not hits[idx]:
            raise LeafNotFound()
        return idx

    def _parent_idx(self, index: int) -> int:
        """Reference virtual-index parent arithmetic (src/merkle.rs:188-207).
        NOTE: the inner-node formula is only a true parent map for
        inner_children == 2 — for wider fan-ins the reference (and hence this
        replica) walks 'wrong' sibling groups; FRI ignores check_proof results
        (§8.5) and the STARK always uses fan-in 2, so parity wins here."""
        n_leafs = self.packed.shape[0]
        if index < n_leafs:
            return n_leafs + index // self.config.leafs_per_node
        return index + (self.get_node_number() - index + 1) // self.config.inner_children

    def generate_proof_packed(self, packed_value: np.ndarray) -> MerklePath:
        i = self._leaf_index(np.asarray(packed_value, dtype=np.uint64))
        k = self.config.leafs_per_node
        c = self.config.inner_children
        n_leafs = self.packed.shape[0]
        start = i - i % k
        leaf_neighbours = [
            unpack_scalar(self.field, self.packed[j]) for j in range(start, start + k)
        ]
        path: List[List[bytes]] = []
        current = self._parent_idx(i)
        for _ in range(1, self.levels):
            shifted = current - n_leafs
            s = shifted - shifted % c
            # slice (not index) so fan-ins > 2 truncate exactly like the host
            # tree; the reference would panic here and never exercises this
            level = self.nodes[s : s + c]
            path.append([level[t].tobytes() for t in range(level.shape[0])])
            current = self._parent_idx(current)
        return MerklePath(leaf_neighbours=leaf_neighbours, path=path)

    def generate_proof(self, leaf) -> MerklePath:
        return self.generate_proof_packed(pack_scalars(self.field, [leaf])[0])
