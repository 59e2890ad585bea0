"""Mirrors the reference's src/util.rs unit tests (src/util.rs:46-97)."""

import pytest

from ministark_tpu.utils import is_power_of_two, logarithm_of_two_k, ceil_log2_k


def test_is_power_of_two():
    assert is_power_of_two(0)
    assert is_power_of_two(1)
    assert is_power_of_two(2)
    assert is_power_of_two(32)
    assert is_power_of_two(128)
    assert is_power_of_two(512)
    assert is_power_of_two(1024)
    assert not is_power_of_two(24)
    assert not is_power_of_two(48)


def test_logarithm_of_two_k():
    assert logarithm_of_two_k(32, 2) == 5
    with pytest.raises(ValueError, match="number if not a power of 2"):
        logarithm_of_two_k(6, 2)

    assert logarithm_of_two_k(256, 4) == 4
    with pytest.raises(ValueError, match="number if not a power of 2"):
        logarithm_of_two_k(12, 4)
    with pytest.raises(ValueError, match="number if not a power of base"):
        logarithm_of_two_k(32, 4)

    assert logarithm_of_two_k(512, 8) == 3
    with pytest.raises(ValueError):
        logarithm_of_two_k(15, 8)
    with pytest.raises(ValueError, match="number if not a power of base"):
        logarithm_of_two_k(16, 8)

    assert logarithm_of_two_k(256, 16) == 2
    with pytest.raises(ValueError):
        logarithm_of_two_k(48, 16)
    with pytest.raises(ValueError, match="number if not a power of base"):
        logarithm_of_two_k(64, 16)


def test_ceil_log_power_two():
    assert ceil_log2_k(2, 2) == 1
    assert ceil_log2_k(21, 2) == 5
    assert ceil_log2_k(32, 2) == 5

    assert ceil_log2_k(4, 4) == 2
    assert ceil_log2_k(3, 4) == 2
    assert ceil_log2_k(13, 4) == 4
    assert ceil_log2_k(21, 4) == 6
