#!/usr/bin/env python3
"""Offline Merkle test-vector generator (parity tooling for the reference's
scripts/merkle_tree.py): prints SHA-256 leaf/level/root vectors for 8 integer
leaves with the decimal-Display leaf preimage scheme, cross-checked against
the framework's own tree."""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ministark_tpu.commit import MerkleTree, MerkleTreeConfig
from ministark_tpu.fields import GOLDILOCKS_FP


def u8(b: bytes) -> str:
    return "[" + ", ".join(str(x) for x in b) + "]"


def main():
    leafs = list(range(8))
    print(f"values: {leafs}")
    values = [hashlib.sha256(str(x).encode()).digest() for x in leafs]
    print(f"first leaf: {u8(values[0])}")
    print(f"fifth leaf: {u8(values[5])}")
    level1 = [hashlib.sha256(values[i] + values[i + 1]).digest() for i in range(0, 8, 2)]
    print("1st level:", ", ".join(u8(h) for h in level1))
    level2 = [hashlib.sha256(level1[i] + level1[i + 1]).digest() for i in range(0, 4, 2)]
    print("2nd level:", ", ".join(u8(h) for h in level2))
    root = hashlib.sha256(level2[0] + level2[1]).digest()
    print(f"root array: {u8(root)}")

    tree = MerkleTree(GOLDILOCKS_FP, leafs, MerkleTreeConfig(1, 2))
    assert tree.root() == root, "framework tree disagrees with vectors!"
    print("framework MerkleTree root matches ✔")


if __name__ == "__main__":
    main()
