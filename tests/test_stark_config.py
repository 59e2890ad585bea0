"""StarkConfig math tests mirroring src/starks.rs:335-375."""

import pytest

from ministark_tpu.fields import Goldilocks
from ministark_tpu.stark import StarkConfig


def test_stark_config_with_low_security_bits():
    with pytest.raises(AssertionError):
        StarkConfig.num_queries_from_config(Goldilocks, 1, 4, 128)


def test_stark_config_query_numbers():
    assert Goldilocks.base.modulus_bit_size == 64

    cq, fq = StarkConfig.num_queries_from_config(Goldilocks, 20, 4, 129)
    assert (cq, fq) == (1, 3)

    cq, fq = StarkConfig.num_queries_from_config(Goldilocks, 20, 2, 9)
    assert (cq, fq) == (1, 10)

    cq, fq = StarkConfig.num_queries_from_config(Goldilocks, 128, 4, 129)
    assert (cq, fq) == (3, 19)

    cq, fq = StarkConfig.num_queries_from_config(Goldilocks, 256, 4, 513)
    assert (cq, fq) == (5, 32)


def test_stark_config_derived_parameters():
    cfg = StarkConfig(Goldilocks, 20, 2, 9, 6)
    assert cfg.degree == 8
    assert cfg.rounds == 5
    assert cfg.constrain_queries == 1
    assert cfg.fri_queries == 10
    assert cfg.merkle_config.leafs_per_node == 6
    assert cfg.merkle_config.inner_children == 2
    assert cfg.fri_config.merkle_config.leafs_per_node == 2
    assert cfg.io.as_string().startswith("🐺\x00")
