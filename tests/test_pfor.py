"""FOR/PFOR codec (lucene_codec.cpp:163-208 format shape): roundtrip +
property gates, including the block/tail boundary cases."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from trinity_spark.functions.pfor import BLOCK, pfor_decode, pfor_encode


def _roundtrip(vals):
    arr = np.asarray(vals, dtype=np.uint64)
    assert list(pfor_decode(pfor_encode(arr))) == list(arr)


def test_empty_and_small():
    _roundtrip([])
    _roundtrip([0])
    _roundtrip([7, 0, 2**40, 1])


def test_exact_block_sizes():
    rng = np.random.default_rng(3)
    for n in (BLOCK - 1, BLOCK, BLOCK + 1, 3 * BLOCK, 3 * BLOCK + 17):
        _roundtrip(rng.integers(0, 2**50, size=n, dtype=np.uint64))


def test_all_zero_blocks():
    _roundtrip(np.zeros(2 * BLOCK + 5, dtype=np.uint64))


def test_mixed_width_blocks():
    # adjacent blocks with very different widths exercise the width grouping
    a = np.ones(BLOCK, dtype=np.uint64)
    b = np.full(BLOCK, 2**63 - 1, dtype=np.uint64)
    c = np.arange(BLOCK, dtype=np.uint64)
    _roundtrip(np.concatenate([a, b, c, np.array([5], dtype=np.uint64)]))


def test_packing_is_denser_than_varbyte_for_wide_uniform():
    from trinity_spark.functions.varbyte import encode_varbyte

    rng = np.random.default_rng(9)
    vals = rng.integers(2**20, 2**21, size=10 * BLOCK, dtype=np.uint64)
    assert len(pfor_encode(vals)) < len(encode_varbyte(vals))


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=0, max_size=500)
)
def test_property_roundtrip(vals):
    _roundtrip(vals)


def test_tail_count_mismatch_raises():
    # header/tail disagreement is corruption: extra tail values must not be
    # silently dropped, missing ones must not yield a short array.
    import pytest

    arr = np.arange(BLOCK + 2, dtype=np.uint64)
    buf = pfor_encode(arr)
    with pytest.raises(ValueError, match="tail"):
        pfor_decode(buf + b"\x03")  # one extra single-byte varbyte group
    with pytest.raises(ValueError, match="tail"):
        # tail values are 128,129 (2-byte groups); dropping the whole last
        # group decodes cleanly through varbyte but comes up one value short
        pfor_decode(buf[:-2])
