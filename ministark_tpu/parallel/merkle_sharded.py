"""Sharded (multi-chip) Merkle tree digest construction.

The tree build is embarrassingly parallel until the level width drops below
the device count: each shard hashes its contiguous block of leaf groups
(decimal Display preimages + SHA-256, ops/leaf_hash.py) and folds its local
subtree level-by-level with the fan-in-2 inner kernel (ops/sha256.py). The
per-shard subtree roots (one digest per device) are then gathered and the
remaining log2(n_dev) levels finish replicated — one tiny collective for the
whole tree.

Output layout and digest bytes are IDENTICAL to the single-device path
(leaf level first, upper levels in order, root last), so a
PackedMerkleTree built over a mesh commits to exactly the same root
(tests/test_sharded.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.leaf_hash import leaf_hash_device
from ..ops.sha256 import merkle_inner_level2


def can_shard_tree(n_elems: int, leafs_per_node: int, n_dev: int) -> bool:
    if n_dev <= 1 or n_elems % leafs_per_node:
        return False
    n_groups = n_elems // leafs_per_node
    # need whole leaf-group blocks per shard and a power-of-two local subtree
    if n_groups % n_dev:
        return False
    g_loc = n_groups // n_dev
    return g_loc >= 1 and (g_loc & (g_loc - 1)) == 0


_CLOSURE_CACHE: dict = {}


def _make_builder(n_elems: int, comps: int, leafs_per_node: int, fmt: int,
                  mesh: Mesh, axis: str, max_digits: int = 20):
    n_dev = mesh.shape[axis]
    g_loc = (n_elems // leafs_per_node) // n_dev

    def body(comps_local):
        # comps_local: (n_elems/D, comps, 2) — whole leaf groups per shard.
        # use_pallas=False: pallas_call under shard_map has never been
        # hardware-validated on a real multi-chip mesh (all probes are
        # single-chip, and interpret-mode tests don't cover Mosaic
        # lowering) — keep the sharded builder on the XLA compression
        # until a multi-chip probe exists (ADVICE r4).
        levels = [leaf_hash_device(comps_local, leafs_per_node, fmt,
                                   max_digits, use_pallas=False)]
        while levels[-1].shape[0] > 1:
            levels.append(merkle_inner_level2(levels[-1]))
        return tuple(levels)

    n_local_levels = max(g_loc.bit_length(), 1)  # leaf level + log2(g_loc)
    in_spec = P(axis, None, None)
    out_specs = tuple(P(axis, None) for _ in range(n_local_levels))
    shmapped = shard_map(
        body, mesh=mesh, in_specs=(in_spec,), out_specs=out_specs,
        check_vma=False,
    )

    replicated = NamedSharding(mesh, P())

    @jax.jit
    def build(comps):
        levels = list(shmapped(comps))
        # cross-shard levels: per-shard subtree roots downward to the root.
        # Gather the tiny sharded top ONCE (an efficient all-gather) and pin
        # the remaining levels replicated — without the explicit specs XLA
        # reshards the small tensors inside every inner-level reshape and
        # warns "Involuntary full rematerialization" (VERDICT r2 item 4).
        cur = jax.lax.with_sharding_constraint(levels[-1], replicated)
        while cur.shape[0] > 1:
            cur = merkle_inner_level2(cur)
            levels.append(jax.lax.with_sharding_constraint(cur, replicated))
        return jnp.concatenate(levels, axis=0)

    return build


def sharded_tree_digests(comps, leafs_per_node: int, fmt: int, mesh: Mesh,
                         axis: str = "shards", max_digits: int = 20):
    """comps: (n_elems, comps, 2) u32 [lo, hi] component array (global).
    Returns ALL level digests concatenated (leaf level first, root last) as a
    (2 * n_groups - 1, 8) u32 global array — same layout as
    leaf_hash_device_jit + merkle_inner_levels_device."""
    key = (comps.shape, leafs_per_node, fmt, mesh, axis, max_digits)
    if key not in _CLOSURE_CACHE:
        _CLOSURE_CACHE[key] = _make_builder(
            comps.shape[0], comps.shape[1], leafs_per_node, fmt, mesh, axis,
            max_digits
        )
    return _CLOSURE_CACHE[key](comps)
