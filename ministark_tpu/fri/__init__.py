from .fri import Fri, FriConfig, FriProof, FriRound
from .batched import BatchedFri, BatchedFriConfig, BatchedFriProof

__all__ = ["Fri", "FriConfig", "FriProof", "FriRound",
           "BatchedFri", "BatchedFriConfig", "BatchedFriProof"]
