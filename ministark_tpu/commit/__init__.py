from .merkle import MerkleTree, MerkleTreeConfig, MerklePath, MerkleRoot
from .index_tree import IndexMerkleTree, IndexMerklePath

__all__ = ["MerkleTree", "MerkleTreeConfig", "MerklePath", "MerkleRoot",
           "IndexMerkleTree", "IndexMerklePath"]
