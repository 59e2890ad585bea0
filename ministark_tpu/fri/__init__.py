from .fri import Fri, FriConfig, FriProof, FriRound
from .batched import BatchedFri, BatchedFriConfig, BatchedFriProof
from .stir import Stir, StirConfig, StirProof, StirResult

__all__ = ["Fri", "FriConfig", "FriProof", "FriRound",
           "BatchedFri", "BatchedFriConfig", "BatchedFriProof",
           "Stir", "StirConfig", "StirProof", "StirResult"]
