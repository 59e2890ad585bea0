from .mesh import make_mesh, default_axis
from .ntt_sharded import (
    can_shard,
    get_sharded_ntt_fns,
    make_sharded_ntt_fns,
    sharded_lde,
)
from .fri_sharded import get_sharded_fri_fns, make_sharded_fri_fns
from .merkle_sharded import can_shard_tree, sharded_tree_digests

__all__ = [
    "make_mesh", "default_axis", "make_sharded_ntt_fns", "sharded_lde",
    "can_shard", "get_sharded_ntt_fns", "get_sharded_fri_fns",
    "make_sharded_fri_fns", "can_shard_tree", "sharded_tree_digests",
]
