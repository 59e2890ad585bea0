from .fibonacci import FibonacciClaim, Witness, fibonacci_air
from .mimc import MimcClaim, MimcWitness, mimc_chain_output, mimc_device_trace

__all__ = [
    "FibonacciClaim", "Witness", "fibonacci_air",
    "MimcClaim", "MimcWitness", "mimc_chain_output", "mimc_device_trace",
]
