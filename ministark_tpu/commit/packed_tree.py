"""Array-resident Merkle tree for large codewords.

Produces digests identical to commit/merkle.py (same decimal-Display leaf
preimages, same level-by-level build, same first-occurrence value lookup) but
stores leaf values as packed component arrays and all nodes as one digest
array — no per-element Python objects.

Hash backends (identical digests):
  * device  — JAX SHA-256 kernels (ops/leaf_hash.py); the codeword never
              leaves HBM: root/paths/neighbours are pulled individually
              (crucial when host<->device transfers ride a slow tunnel);
  * native  — C++ SHA-NI engine over host arrays (commit/native.py);
  * python  — hashlib fallback.

Selection: device when ``device_vals`` is given, fan-in 2, and
MINISTARK_DEVICE_HASH=1; else native; else python.

Component packing per field (mirrors fields/host.py Display semantics):
  base fields      -> (n, 1) canonical u64          (fmt 0)
  quadratic ext    -> (n, 2) [c0, c1]               (fmt 1)
  BabyBear Fp4     -> (n, 4) [c00, c01, c10, c11]   (fmt 2)
"""

from __future__ import annotations

import os
from typing import List, Optional

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


def comps_np_to_u64(comps_np: np.ndarray) -> np.ndarray:
    """(n, comps, 2) u32 [lo, hi] host array -> (n, comps) u64."""
    a = np.asarray(comps_np)
    return a[..., 0].astype(np.uint64) | (a[..., 1].astype(np.uint64) << 32)


def unpack_scalar(field, row: np.ndarray):
    d = field.extension_degree
    if d == 1:
        return int(row[0])
    return field.from_base_coeffs(tuple(int(x) for x in row))


def _first_match_find(comps, value_rows):
    """Jitted first-match search: (q,) indices where (n, comps, 2) == each
    of (q, comps, 2); n where absent. Dispatches asynchronously — callers
    may defer the pull (engine FRI query pipelining)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def find(comps, value_rows):
        flat = comps.reshape(comps.shape[0], -1)
        v = value_rows.reshape(value_rows.shape[0], -1)
        hits = jnp.all(flat[None, :, :] == v[:, None, :], axis=2)  # (q, n)
        n = comps.shape[0]
        idx = jnp.arange(n)[None, :]
        return jnp.min(jnp.where(hits, idx, n), axis=1)

    return find(comps, value_rows)


def _first_match_device_batch(comps, value_rows):
    """First indices where (n, comps, 2) == each of (q, comps, 2); n if absent."""
    return [int(i) for i in np.asarray(_first_match_find(comps, value_rows))]


class PackedMerkleTree:
    """Same commitment as commit/merkle.py MerkleTree, array-native."""

    def __init__(self, field, packed_vals: Optional[np.ndarray],
                 config: MerkleTreeConfig, device_vals=None,
                 mesh=None, mesh_axis: str = "shards"):
        self.field = field
        self.config = config
        self.fmt = field_fmt(field)
        self._dev_comps = None
        self._dev_digests = None
        self._packed = None
        self._nodes = None
        self._root = None

        k = config.leafs_per_node
        c = config.inner_children

        use_device = (
            device_vals is not None
            and c == 2
            and os.environ.get("MINISTARK_DEVICE_HASH") == "1"
        )

        if use_device:
            comps = to_leaf_comps(field, device_vals)
            n = comps.shape[0]
        else:
            assert packed_vals is not None, "need host values without device hashing"
            self._packed = np.ascontiguousarray(packed_vals, dtype=np.uint64)
            n = self._packed.shape[0]

        assert n % k == 0
        group_num = n // k
        self.n_leafs = n
        self.levels = logarithm_of_two_k(group_num, c) + 1
        assert c ** (self.levels - 1) == group_num

        if use_device:
            import jax.numpy as jnp

            from ..ops.leaf_hash import leaf_hash_device_jit
            from ..ops.sha256 import merkle_inner_levels_device

            self._dev_comps = comps
            shard_build = False
            if mesh is not None and group_num > 1:
                from ..parallel.merkle_sharded import (
                    can_shard_tree,
                    sharded_tree_digests,
                )

                shard_build = can_shard_tree(n, k, mesh.shape[mesh_axis])
            # decimal-digit bound per component: 10 for u32 fields
            # (BabyBear p < 2^31), 20 for u64 (Goldilocks) — the smaller
            # ladder/placement loops make BB trees ~GL-cost instead of 3.7x
            md = 10 if int(field.p) < (1 << 32) else 20
            if shard_build:
                # multi-chip build: local leaf hashing + subtrees, one
                # gather of subtree roots — digests identical to below
                self._dev_digests = sharded_tree_digests(
                    comps, k, self.fmt, mesh, mesh_axis, max_digits=md
                )
            else:
                leaf_dig = leaf_hash_device_jit(comps, k, self.fmt, md)
                if group_num > 1:
                    upper = merkle_inner_levels_device(leaf_dig, c)
                    self._dev_digests = jnp.concatenate([leaf_dig, upper], axis=0)
                else:
                    self._dev_digests = leaf_dig
        elif native.available():
            leaf_digests = native.leaf_hash_batch(self._packed, k, self.fmt)
            if group_num > 1:
                upper = native.inner_levels(leaf_digests, c)
                self._nodes = np.concatenate([leaf_digests, upper], axis=0)
            else:
                self._nodes = leaf_digests
        else:  # pure-python fallback (slow; correctness path)
            scalars = [unpack_scalar(field, self._packed[i]) for i in range(n)]
            host = MerkleTree(field, scalars, config)
            self._nodes = np.frombuffer(
                b"".join(host.nodes), dtype=np.uint8
            ).reshape(-1, 32).copy()

    # ------------------------------------------------------ lazy host views
    @property
    def packed(self) -> np.ndarray:
        if self._packed is None:
            self._packed = comps_np_to_u64(np.asarray(self._dev_comps))
        return self._packed

    @property
    def nodes(self) -> np.ndarray:
        if self._nodes is None:
            from ..ops.sha256 import digests_to_bytes

            self._nodes = digests_to_bytes(self._dev_digests)
        return self._nodes

    @classmethod
    def from_scalars(cls, field, scalars, config) -> "PackedMerkleTree":
        return cls(field, pack_scalars(field, scalars), config)

    def root(self) -> bytes:
        if self._root is None:
            if self._nodes is not None:
                self._root = self._nodes[-1].tobytes()
            else:
                from ..ops.sha256 import digests_to_bytes

                self._root = digests_to_bytes(
                    np.asarray(self._dev_digests[-1:])
                )[0].tobytes()
        return self._root

    def get_node_number(self) -> int:
        n_nodes = (
            self._nodes.shape[0] if self._nodes is not None
            else self._dev_digests.shape[0]
        )
        return self.n_leafs + n_nodes

    # --- proofs (value lookup, first occurrence — §8.6) ---
    def _leaf_indices(self, packed_values: np.ndarray):
        """First-occurrence indices for a (q, comps) u64 batch."""
        if self._packed is not None:
            out = []
            for pv in packed_values:
                hits = np.all(self._packed == pv[None, :], axis=1)
                idx = int(np.argmax(hits))
                if not hits[idx]:
                    raise LeafNotFound()
                out.append(idx)
            return out
        # device search without pulling the codeword
        import jax.numpy as jnp

        lo = (packed_values & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi = (packed_values >> np.uint64(32)).astype(np.uint32)
        rows = jnp.asarray(np.stack([lo, hi], axis=-1))
        idxs = _first_match_device_batch(self._dev_comps, rows)
        if any(i >= self.n_leafs for i in idxs):
            raise LeafNotFound()
        return idxs

    def _leaf_index(self, packed_value: np.ndarray) -> int:
        return self._leaf_indices(packed_value[None, :])[0]

    def _node_bytes(self, indices: List[int]) -> List[bytes]:
        """Fetch specific node digests (by flat node index)."""
        if self._nodes is not None:
            return [self._nodes[i].tobytes() for i in indices]
        from ..ops.sha256 import digests_to_bytes

        rows = np.asarray(self._dev_digests[np.asarray(indices, dtype=np.int64)])
        b = digests_to_bytes(rows)
        return [b[i].tobytes() for i in range(len(indices))]

    def _parent_idx(self, index: int) -> int:
        """Reference virtual-index parent arithmetic (src/merkle.rs:188-207).
        NOTE: the inner-node formula is only a true parent map for
        inner_children == 2 — for wider fan-ins the reference (and hence this
        replica) walks 'wrong' sibling groups; FRI ignores check_proof results
        (§8.5) and the STARK always uses fan-in 2, so parity wins here."""
        if index < self.n_leafs:
            return self.n_leafs + index // self.config.leafs_per_node
        return index + (self.get_node_number() - index + 1) // self.config.inner_children

    # --- staged proof generation (engine FRI query pipelining) ---------
    #
    # The engine overlaps every round's value search, gather and
    # device->host copy: search_rows_async in its dispatch pass,
    # proofs_gather_async once the indices arrive, proofs_finish last.
    # generate_proofs_packed composes the same stages synchronously.

    @property
    def device_resident(self) -> bool:
        """True iff this tree was built device-side. INVARIANT: _dev_comps
        and _dev_digests are set together (only the use_device constructor
        branch populates either); the staged async proof pipeline
        (search_rows_async -> proofs_gather_async) relies on both, so any
        future construction path that half-populates the pair is a bug —
        checked here, the single gate both stages assert through."""
        has_comps = self._dev_comps is not None
        has_digests = self._dev_digests is not None
        assert has_comps == has_digests, (
            "half-populated device tree: _dev_comps and _dev_digests must "
            "be set together (see PackedMerkleTree.__init__ use_device)"
        )
        return has_comps

    def search_rows_async(self, rows_dev):
        """Dispatch the §8.6 first-occurrence value search for device rows
        already in this tree's leaf component format ((q, C, 2) u32 — e.g.
        rows gathered from the committed codeword itself). Returns the
        un-pulled (q,) device index array with its host copy streaming."""
        assert self.device_resident, "device-resident trees only"
        out = _first_match_find(self._dev_comps, rows_dev)
        try:
            out.copy_to_host_async()
        except AttributeError:
            pass
        return out

    def _sibling_groups(self, idxs: List[int]):
        k = self.config.leafs_per_node
        c = self.config.inner_children
        n_nodes = self.get_node_number() - self.n_leafs
        all_groups: List[List[List[int]]] = []
        for i in idxs:
            groups: List[List[int]] = []
            current = self._parent_idx(i)
            for _ in range(1, self.levels):
                shifted = current - self.n_leafs
                s = shifted - shifted % c
                # slice semantics (truncate) for fan-ins > 2, like the host tree
                groups.append(list(range(s, min(s + c, n_nodes))))
                current = self._parent_idx(current)
            all_groups.append(groups)
        return all_groups

    def proofs_gather_async(self, idxs: List[int]):
        """Host leaf indices -> dispatch the digest + leaf-group gathers
        (device-resident trees) and start their host copies; returns an
        opaque handle for proofs_finish."""
        import jax.numpy as jnp

        assert self.device_resident, "device-resident trees only"
        k = self.config.leafs_per_node
        all_groups = self._sibling_groups(idxs)
        flat = [g for groups in all_groups for grp in groups for g in grp]
        neigh_starts = [i - i % k for i in idxs]
        didx = jnp.asarray(np.asarray(flat, dtype=np.int64))
        lidx = jnp.asarray(np.asarray(
            [s + j for s in neigh_starts for j in range(k)], dtype=np.int64
        ))
        dig_rows = self._dev_digests[didx]
        leaf_rows = self._dev_comps[lidx]
        for h in (dig_rows, leaf_rows):
            try:
                h.copy_to_host_async()
            except AttributeError:
                pass
        return (all_groups, len(flat), k, dig_rows, leaf_rows)

    def proofs_finish(self, handle) -> List[MerklePath]:
        from ..ops.sha256 import digests_to_bytes

        all_groups, n_flat, k, dig_rows, leaf_rows = handle
        b = digests_to_bytes(np.asarray(dig_rows))
        fetched = [b[i].tobytes() for i in range(n_flat)]
        rows_u64 = comps_np_to_u64(np.asarray(leaf_rows))
        all_neigh = [
            [unpack_scalar(self.field, rows_u64[qi * k + j]) for j in range(k)]
            for qi in range(len(all_groups))
        ]
        proofs = []
        pos = 0
        for qi, groups in enumerate(all_groups):
            path: List[List[bytes]] = []
            for grp in groups:
                path.append(fetched[pos : pos + len(grp)])
                pos += len(grp)
            proofs.append(MerklePath(leaf_neighbours=all_neigh[qi], path=path))
        return proofs

    def generate_proofs_packed(self, packed_values: np.ndarray) -> List[MerklePath]:
        """Batched proof generation: ONE device search, ONE node fetch and
        ONE neighbour fetch for the whole batch (device round-trips are the
        scarce resource on tunneled hardware)."""
        idxs = self._leaf_indices(np.asarray(packed_values, dtype=np.uint64))

        if self._nodes is None and self._packed is None:
            return self.proofs_finish(self.proofs_gather_async(idxs))

        k = self.config.leafs_per_node
        all_groups = self._sibling_groups(idxs)
        flat = [g for groups in all_groups for grp in groups for g in grp]
        neigh_starts = [i - i % k for i in idxs]
        fetched = self._node_bytes(flat) if flat else []
        all_neigh = self._leaf_rows_batch(neigh_starts, k)

        proofs = []
        pos = 0
        for qi, groups in enumerate(all_groups):
            path: List[List[bytes]] = []
            for grp in groups:
                path.append(fetched[pos : pos + len(grp)])
                pos += len(grp)
            proofs.append(MerklePath(leaf_neighbours=all_neigh[qi], path=path))
        return proofs

    def _leaf_rows_batch(self, starts: List[int], count: int):
        """Fetch `count` consecutive leaves from each start in one transfer."""
        flat_idx = np.asarray(
            [s + j for s in starts for j in range(count)], dtype=np.int64
        )
        if self._packed is not None:
            rows = self._packed[flat_idx]
        else:
            rows = comps_np_to_u64(np.asarray(self._dev_comps[flat_idx]))
        out = []
        for qi in range(len(starts)):
            out.append([
                unpack_scalar(self.field, rows[qi * count + j]) for j in range(count)
            ])
        return out

    def generate_proof_packed(self, packed_value: np.ndarray) -> MerklePath:
        return self.generate_proofs_packed(
            np.asarray(packed_value, dtype=np.uint64)[None, :]
        )[0]

    def generate_proof(self, leaf) -> MerklePath:
        return self.generate_proof_packed(pack_scalars(self.field, [leaf])[0])

    def generate_proofs(self, leafs) -> List[MerklePath]:
        return self.generate_proofs_packed(pack_scalars(self.field, leafs))
