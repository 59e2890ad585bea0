"""Merkle layer tests mirroring src/merkle.rs:341-482 plus the
scripts/merkle_tree.py offline vectors."""

import hashlib

import pytest

from ministark_tpu.commit import MerkleRoot, MerkleTree, MerkleTreeConfig
from ministark_tpu.fields import GOLDILOCKS_FP, GOLDILOCKS_FP2
from ministark_tpu.utils import OutOfRangeError

TWO = MerkleTreeConfig(leafs_per_node=2, inner_children=2)
TWO_FOUR = MerkleTreeConfig(leafs_per_node=4, inner_children=2)
FOUR = MerkleTreeConfig(leafs_per_node=4, inner_children=4)
SIXTEEN = MerkleTreeConfig(leafs_per_node=16, inner_children=16)


def make_tree(config):
    return MerkleTree(GOLDILOCKS_FP, list(range(16)), config)


def test_panic_for_not_full_trees():
    with pytest.raises(AssertionError):
        MerkleTree(GOLDILOCKS_FP, [0, 1, 2], TWO)


def test_node_calculation():
    tree = make_tree(TWO)
    assert tree.get_node_number() == 31
    assert len(tree.leafs) == 16
    assert len(tree.nodes) == 15

    tree = make_tree(TWO_FOUR)
    assert tree.get_node_number() == 23
    assert len(tree.nodes) == 7

    tree = make_tree(FOUR)
    assert tree.get_node_number() == 21
    assert len(tree.nodes) == 5

    tree = make_tree(SIXTEEN)
    assert tree.get_node_number() == 17
    assert len(tree.nodes) == 1


def test_merkle_tree_parent_index():
    tree = make_tree(TWO)
    assert tree.get_parent_idx(1) == 16
    assert tree.get_parent_idx(4) == 18
    assert tree.get_parent_idx(9) == 20
    assert tree.get_parent_idx(13) == 22
    assert tree.get_parent_idx(16) == 24
    assert tree.get_parent_idx(18) == 25
    assert tree.get_parent_idx(20) == 26
    assert tree.get_parent_idx(22) == 27
    assert tree.get_parent_idx(24) == 28
    assert tree.get_parent_idx(25) == 28
    assert tree.get_parent_idx(26) == 29
    assert tree.get_parent_idx(27) == 29
    assert tree.get_parent_idx(28) == 30
    assert tree.get_parent_idx(29) == 30

    tree = make_tree(TWO_FOUR)
    assert tree.get_parent_idx(1) == 16
    assert tree.get_parent_idx(4) == 17
    assert tree.get_parent_idx(9) == 18
    assert tree.get_parent_idx(13) == 19
    assert tree.get_parent_idx(16) == 20
    assert tree.get_parent_idx(17) == 20
    assert tree.get_parent_idx(18) == 21
    assert tree.get_parent_idx(19) == 21
    assert tree.get_parent_idx(20) == 22
    assert tree.get_parent_idx(21) == 22

    with pytest.raises(OutOfRangeError):
        tree.get_parent_idx(tree.get_node_number())


def test_check_proof():
    tree = make_tree(TWO)
    root = tree.root()
    proof = tree.generate_proof(7)
    assert 7 in proof.leaf_neighbours
    assert len(proof.path) == 3
    assert MerkleRoot(root).check_proof(GOLDILOCKS_FP, proof)

    tree = make_tree(TWO_FOUR)
    proof = tree.generate_proof(7)
    assert 7 in proof.leaf_neighbours
    assert len(proof.path) == 2
    assert MerkleRoot(tree.root()).check_proof(GOLDILOCKS_FP, proof)


def test_scripts_merkle_tree_vectors():
    """Replicates scripts/merkle_tree.py (leaf = sha256(str(value)))."""
    leafs = list(range(8))
    tree = MerkleTree(GOLDILOCKS_FP, leafs, MerkleTreeConfig(1, 2))
    values = [hashlib.sha256(str(x).encode()).digest() for x in leafs]
    assert tree.nodes[:8] == values
    h0 = hashlib.sha256(values[0] + values[1]).digest()
    assert tree.nodes[8] == h0
    h1 = hashlib.sha256(values[2] + values[3]).digest()
    h2 = hashlib.sha256(values[4] + values[5]).digest()
    h3 = hashlib.sha256(values[6] + values[7]).digest()
    h00 = hashlib.sha256(h0 + h1).digest()
    h01 = hashlib.sha256(h2 + h3).digest()
    assert tree.root() == hashlib.sha256(h00 + h01).digest()


def test_leaf_hash_is_display_string():
    """Leaf hashing must concatenate decimal Display strings (§8.1)."""
    h = MerkleTree.calculate_from_leafs(GOLDILOCKS_FP, [10, 11])
    assert h == hashlib.sha256(b"1011").digest()


def test_extension_leaf_hash_uses_quadext_display():
    h = MerkleTree.calculate_from_leafs(GOLDILOCKS_FP2, [(1, 2), (3, 4)])
    pre = b"QuadExtField(1 + 2 * u)QuadExtField(3 + 4 * u)"
    assert h == hashlib.sha256(pre).digest()


def test_duplicate_leaf_value_first_occurrence():
    """Proofs are looked up by value; duplicates resolve to the first
    occurrence (§8.6)."""
    leafs = [5, 6, 5, 7]
    tree = MerkleTree(GOLDILOCKS_FP, leafs, TWO)
    proof = tree.generate_proof(5)
    assert proof.leaf_neighbours == [5, 6]
