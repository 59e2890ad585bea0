"""Index-addressed Merkle tree with configurable 2^k arity (fast mode).

This is the NON-PARITY commitment used by the batched multi-polynomial FRI
(fri/batched.py): standard Merkle semantics — leaves are SHA-256 over the
raw little-endian bytes of a row of field components (ops/sha256.py
binary_row_digests), parents hash the concatenation of their children, and
openings are BY INDEX with per-level sibling groups.

Contrast with the parity tree (commit/packed_tree.py / commit/merkle.py),
which replicates the reference's decimal-Display preimages, value-search
lookups (src/merkle.rs:150-186) and its fan-in>2 virtual-index parent-walk
quirk (src/merkle.rs:188-207). That quirk makes wide fan-ins unusable for
real verification, which is why the reference's own STARK sticks to fan-in
2 — the fast mode instead uses the clean semantics below, where 4/8-ary
trees are sound and cut tree levels (and build dispatches) by 2-3x.

Arity handling: every level groups `arity` children except when fewer
remain (a 2^21-leaf 4-ary tree ends with one fan-in-2 level). Level shapes
are static, so the whole upper tree is ONE fused executable per
(n_leaves, arity) like the parity builder.

Build runs wherever the leaf array lives (TPU HBM in production, CPU under
tests); verification is pure-host hashlib.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sha256 import (
    _inner_level,
    binary_row_digests,
    digests_to_bytes,
)


def _build_digests_xla(comps, arity: int):
    """The plain-XLA tree build (also the reference for the Pallas A/B)."""
    levels = [binary_row_digests(comps)]
    cur = levels[0]
    while cur.shape[0] > 1:
        f = min(arity, cur.shape[0])
        cur = _inner_level(cur, f)
        levels.append(cur)
    return jnp.concatenate(levels, axis=0) if len(levels) > 1 else levels[0]


@partial(jax.jit, static_argnums=1)
def _build_digests(comps, arity: int):
    """(n, C, 2) u32 rows -> concatenated digest levels (leaves first,
    root last), one executable for the whole tree.

    Large trees take the Pallas SHA-256 path (whole compression in VMEM;
    ops/sha256_pallas.py) when MINISTARK_SHA_PALLAS allows — the digests
    are bit-identical either way, so the choice never affects proofs.
    The env var is read at TRACE time (first call per shape)."""
    from ..ops import sha256_pallas as sp

    if sp.enabled() and comps.shape[0] % sp.MIN_LANES == 0 \
            and comps.shape[0] >= sp.MIN_LANES:
        return sp.build_digests_tr(comps, arity, interpret=not sp._on_tpu())
    return _build_digests_xla(comps, arity)


_SHARDED_CACHE: dict = {}


def _build_digests_sharded(comps, arity: int, mesh, axis: str):
    """Multi-chip build, digest- and layout-identical to _build_digests.

    Leaf hashing and the lower levels are embarrassingly parallel: each
    shard hashes its contiguous row block and folds fan-``arity`` while its
    local level size divides the fan (local blocks stay group-aligned
    because every shard holds the same power-of-two node count). The
    remaining top levels finish replicated after one gather — the same
    local-subtrees + tiny-top pattern as parallel/merkle_sharded.py."""
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    key = (tuple(comps.shape), arity, mesh, axis)
    if key not in _SHARDED_CACHE:
        n_dev = mesh.shape[axis]
        n_loc = comps.shape[0] // n_dev

        def body(comps_local):
            levels = [binary_row_digests(comps_local)]
            while levels[-1].shape[0] % arity == 0:
                levels.append(_inner_level(levels[-1], arity))
            return tuple(levels)

        n_local = 1
        m = n_loc
        while m % arity == 0:
            m //= arity
            n_local += 1
        shmapped = shard_map(
            body, mesh=mesh, in_specs=(P(axis, None, None),),
            out_specs=tuple(P(axis, None) for _ in range(n_local)),
            check_vma=False,
        )
        replicated = NamedSharding(mesh, P())

        @jax.jit
        def build(comps):
            levels = list(shmapped(comps))
            # gather the tiny sharded top ONCE (an efficient all-gather);
            # without the explicit replicated spec XLA reshards the small
            # tensors inside every _inner_level reshape/slice and warns
            # "Involuntary full rematerialization" (VERDICT r2 item 4)
            cur = jax.lax.with_sharding_constraint(levels[-1], replicated)
            while cur.shape[0] > 1:
                cur = _inner_level(cur, min(arity, cur.shape[0]))
                levels.append(
                    jax.lax.with_sharding_constraint(cur, replicated)
                )
            return jnp.concatenate(levels, axis=0)

        _SHARDED_CACHE[key] = build
    return _SHARDED_CACHE[key](comps)


def _level_sizes(n_leaves: int, arity: int) -> List[int]:
    sizes = [n_leaves]
    while sizes[-1] > 1:
        f = min(arity, sizes[-1])
        assert sizes[-1] % f == 0, "leaf count must be a power of two"
        sizes.append(sizes[-1] // f)
    return sizes


@dataclass
class IndexMerklePath:
    """Opening of one leaf: its row bytes + per-level sibling digest groups
    (each group includes the queried node's own slot)."""

    row: bytes
    groups: List[bytes]  # level l: concatenated digests of the sibling group


class IndexMerkleTree:
    def __init__(self, comps, arity: int = 2, mesh=None, mesh_axis: str = "shards",
                 digests=None):
        """comps: (n, C, 2) u32 [lo, hi] row components (device or host).

        ``mesh``: optional jax.sharding.Mesh — shards the leaf hashing and
        lower levels across devices (digest-identical to single-device).
        ``digests``: precomputed level digests (from a fused builder jit,
        e.g. fri/batched._rows_tree_jit) — skips the build."""
        assert arity >= 2 and arity & (arity - 1) == 0
        n = int(comps.shape[0])
        assert n & (n - 1) == 0, "leaf count must be a power of two"
        self.arity = arity
        self.n_leaves = n
        self.sizes = _level_sizes(n, arity)
        self.offsets = np.concatenate([[0], np.cumsum(self.sizes)])
        self._comps = comps
        if digests is not None:
            self._digests = digests
        elif mesh is not None and n % mesh.shape[mesh_axis] == 0 \
                and n > mesh.shape[mesh_axis]:
            self._digests = _build_digests_sharded(
                jnp.asarray(comps), arity, mesh, mesh_axis
            )
        else:
            self._digests = _build_digests(jnp.asarray(comps), arity)

    _root = None

    def root(self) -> bytes:
        if self._root is None:  # one tunnel round trip per pull — cache it
            self._root = digests_to_bytes(
                np.asarray(self._digests[-1:])
            )[0].tobytes()
        return self._root

    def open_many(self, indices: List[int]) -> List[IndexMerklePath]:
        """Open several leaves with ONE digest gather + ONE row gather
        (device round-trips are the scarce resource on tunneled hardware)."""
        arity = self.arity
        all_groups: List[List[range]] = []
        for idx in indices:
            pos = idx
            groups = []
            for lvl, size in enumerate(self.sizes[:-1]):
                f = min(arity, size)
                start = self.offsets[lvl] + (pos - pos % f)
                groups.append(range(int(start), int(start + f)))
                pos //= f
            all_groups.append(groups)

        flat = np.asarray(
            [i for groups in all_groups for g in groups for i in g],
            dtype=np.int64,
        )
        fetched = digests_to_bytes(np.asarray(self._digests[flat]))
        rows = np.asarray(self._comps[np.asarray(indices, dtype=np.int64)])

        out = []
        pos = 0
        for qi, groups in enumerate(all_groups):
            path_groups = []
            for g in groups:
                path_groups.append(
                    fetched[pos : pos + len(g)].tobytes()
                )
                pos += len(g)
            row_u64 = rows[qi, :, 0].astype(np.uint64) | (
                rows[qi, :, 1].astype(np.uint64) << 32
            )
            out.append(IndexMerklePath(row=row_u64.tobytes(), groups=path_groups))
        return out

    @staticmethod
    def verify_path(
        root: bytes, n_leaves: int, arity: int, index: int, path: IndexMerklePath
    ) -> bool:
        """Pure-host verification: recompute the leaf digest from the row
        bytes and fold sibling groups up to the root."""
        digest = hashlib.sha256(path.row).digest()
        pos = index
        for size, group in zip(_level_sizes(n_leaves, arity)[:-1], path.groups):
            f = min(arity, size)
            if len(group) != 32 * f:
                return False
            slot = pos % f
            if group[32 * slot : 32 * (slot + 1)] != digest:
                return False
            digest = hashlib.sha256(group).digest()
            pos //= f
        return digest == root
