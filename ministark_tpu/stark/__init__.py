from .stark import Stark, StarkConfig, StarkProof
from .fast import FastStark, FastStarkConfig, FastStarkProof

__all__ = ["Stark", "StarkConfig", "StarkProof",
           "FastStark", "FastStarkConfig", "FastStarkProof"]
