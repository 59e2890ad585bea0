"""PackedMerkleTree (native engine) must produce identical commitments and
proofs to the host MerkleTree."""

import numpy as np
import pytest

from ministark_tpu.commit import MerkleRoot, MerkleTree, MerkleTreeConfig
from ministark_tpu.commit.packed_tree import PackedMerkleTree, pack_scalars
from ministark_tpu.fields import (
    BABYBEAR_FP,
    BABYBEAR_FP4,
    GOLDILOCKS_FP,
    GOLDILOCKS_FP2,
)

rng = np.random.default_rng(3)


def _scalars(field, n):
    if field.extension_degree == 1:
        return [int(x) % field.p for x in rng.integers(0, 2**63, size=n, dtype=np.uint64)]
    return [
        field.from_base_coeffs(
            tuple(int(x) % field.p for x in rng.integers(0, 2**63, size=field.extension_degree, dtype=np.uint64))
        )
        for _ in range(n)
    ]


CONFIGS = [
    MerkleTreeConfig(2, 2),
    MerkleTreeConfig(4, 2),
    MerkleTreeConfig(4, 4),
    MerkleTreeConfig(6, 2),
]


@pytest.mark.parametrize("field", [GOLDILOCKS_FP, GOLDILOCKS_FP2, BABYBEAR_FP, BABYBEAR_FP4])
@pytest.mark.parametrize("config", CONFIGS)
def test_packed_matches_host(field, config):
    n_groups = config.inner_children ** 3  # full tree required
    n = n_groups * config.leafs_per_node
    scalars = _scalars(field, n)
    host = MerkleTree(field, scalars, config)
    packed = PackedMerkleTree.from_scalars(field, scalars, config)

    assert packed.root() == host.root()
    assert packed.get_node_number() == host.get_node_number()
    assert [packed.nodes[i].tobytes() for i in range(packed.nodes.shape[0])] == host.nodes

    # proofs identical + verify under host checker
    for probe in (scalars[0], scalars[n // 2], scalars[-1]):
        hp = host.generate_proof(probe)
        pp = packed.generate_proof(probe)
        assert pp.leaf_neighbours == hp.leaf_neighbours
        assert pp.path == hp.path
        if config.inner_children == 2:
            assert MerkleRoot(packed.root()).check_proof(field, pp)
        # for fan-in > 2 the reference's parent-index walk visits wrong
        # sibling groups (its own tests never prove on such trees); paths
        # match the host replica bit-for-bit but are not checkable.


def test_packed_first_occurrence_semantics():
    field = GOLDILOCKS_FP
    scalars = [5, 6, 5, 7]
    packed = PackedMerkleTree.from_scalars(field, scalars, MerkleTreeConfig(2, 2))
    proof = packed.generate_proof(5)
    assert proof.leaf_neighbours == [5, 6]


def test_staged_proofs_match_generate_proofs(monkeypatch):
    """The engine's pipelined path (search_rows_async + proofs_gather_async
    + proofs_finish on device-gathered rows) must yield the same MerklePaths
    as the synchronous generate_proofs, including §8.6 first-occurrence
    semantics on duplicate values."""
    import jax.numpy as jnp

    monkeypatch.setenv("MINISTARK_DEVICE_HASH", "1")
    field = GOLDILOCKS_FP2
    n = 16
    scalars = _scalars(field, n)
    scalars[5] = scalars[2]  # duplicate -> both resolve to index 2
    from ministark_tpu.ops.registry import get_kernels

    ke = get_kernels(field)
    codeword = jnp.asarray(
        np.asarray(ke.pack(scalars)).reshape((n,) + ke.elem_axes)
    )
    cfg = MerkleTreeConfig(2, 2)
    tree = PackedMerkleTree(field, None, cfg, device_vals=codeword)
    assert tree._dev_comps is not None

    idx = np.asarray([2, 5, 7, 0], dtype=np.int64)
    rows_dev = codeword[jnp.asarray(idx)]
    from ministark_tpu.commit.packed_tree import to_leaf_comps

    sidx = tree.search_rows_async(to_leaf_comps(field, rows_dev))
    sidxs = [int(v) for v in np.asarray(sidx)]
    assert sidxs == [2, 2, 7, 0]  # duplicate hits first occurrence
    staged = tree.proofs_finish(tree.proofs_gather_async(sidxs))
    sync = tree.generate_proofs([scalars[i] for i in idx])
    for a, b in zip(staged, sync):
        assert a.leaf_neighbours == b.leaf_neighbours
        assert a.path == b.path


def test_pack_scalars_layouts():
    assert pack_scalars(GOLDILOCKS_FP, [7]).tolist() == [[7]]
    assert pack_scalars(GOLDILOCKS_FP2, [(1, 2)]).tolist() == [[1, 2]]
    assert pack_scalars(BABYBEAR_FP4, [((1, 2), (3, 4))]).tolist() == [[1, 2, 3, 4]]
