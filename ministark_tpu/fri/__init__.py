from .fri import Fri, FriConfig, FriProof, FriRound
from .batched import BatchedFri, BatchedFriConfig, BatchedFriProof
from .stir import Stir, StirConfig, StirProof, StirResult
from .whir import Whir, WhirConfig, WhirProof

__all__ = ["Fri", "FriConfig", "FriProof", "FriRound",
           "BatchedFri", "BatchedFriConfig", "BatchedFriProof",
           "Stir", "StirConfig", "StirProof", "StirResult",
           "Whir", "WhirConfig", "WhirProof"]
