"""NTT entry points used by the protocol layers.

For now this provides the host fallback (exact, Python ints); the jitted
device NTT over uint32 limb arrays lands in ops/ntt_device.py and is
dispatched from here when the size threshold and backend allow.
"""

from __future__ import annotations

from typing import List


def batch_ifft_columns(field, flat_data: List, length: int, width: int, domain) -> List[List]:
    """iFFT every column of a row-major (length x width) scalar matrix.

    Returns a list of ``width`` coefficient vectors. Dispatches to the device
    batch NTT for large power-of-two sizes when available.
    """
    from . import device_enabled

    if device_enabled():
        try:
            from .ntt_device import batch_ifft_columns_device

            return batch_ifft_columns_device(field, flat_data, length, width, domain)
        except ImportError:
            pass
    cols = []
    for i in range(width):
        evals = [flat_data[j * width + i] for j in range(length)]
        cols.append(domain.ifft(evals))
    return cols
