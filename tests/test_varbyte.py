import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from trinity_spark.functions.varbyte import (
    decode_varbyte,
    delta_decode,
    delta_encode,
    encode_varbyte,
)


def test_empty():
    assert encode_varbyte(np.array([], dtype=np.uint64)) == b""
    assert decode_varbyte(b"").size == 0


def test_known_values():
    assert encode_varbyte(np.array([0], dtype=np.uint64)) == b"\x00"
    assert encode_varbyte(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert encode_varbyte(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert decode_varbyte(b"\x80\x01").tolist() == [128]


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert decode_varbyte(encode_varbyte(arr)).tolist() == values


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200),
    st.integers(min_value=0, max_value=1000),
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(values, base_off):
    s = sorted(values)
    base = max(s[0] - base_off, 0)
    buf = delta_encode(np.array(s, dtype=np.uint64), base=base)
    assert delta_decode(buf, base=base).tolist() == s


def test_over_long_group_raises():
    # ceil(64/7) = 10 bytes is the longest legitimate uint64 group; an
    # 11+-byte group would shift payload >=70 bits (numpy wraps shifts
    # >=64) into a silent garbage value — must raise instead.
    import pytest

    corrupt = bytes([0x80] * 12 + [0x01])
    with pytest.raises(ValueError, match="over-long group"):
        decode_varbyte(corrupt)
    # the 10-byte boundary itself still decodes (2**63 needs 10 groups)
    big = np.array([2**64 - 1], dtype=np.uint64)
    assert decode_varbyte(encode_varbyte(big)).tolist() == [2**64 - 1]
