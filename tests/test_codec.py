import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.functions.codec import (
    decode_positions,
    delta_decode_docs,
    delta_encode_docs,
    encode_positions,
    vb_decode,
    vb_encode,
)


def test_vb_known_values():
    # 5 -> single byte 0x85; 128 -> 0x01 0x80 (MSB-first groups, high bit on last)
    assert vb_encode(np.array([5])) == bytes([0x85])
    assert vb_encode(np.array([128])) == bytes([0x01, 0x80])
    assert vb_encode(np.array([0])) == bytes([0x80])
    np.testing.assert_array_equal(vb_decode(bytes([0x01, 0x80])), [128])


def test_vb_empty():
    assert vb_encode(np.array([], dtype=np.int64)) == b""
    assert vb_decode(b"").size == 0


@given(
    st.lists(st.integers(min_value=0, max_value=2**56 - 1), min_size=0, max_size=500)
)
@settings(max_examples=200, deadline=None)
def test_vb_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = vb_decode(vb_encode(arr))
    np.testing.assert_array_equal(out, arr)


@given(
    st.lists(st.integers(min_value=0, max_value=10**13), min_size=0, max_size=300).map(
        lambda xs: sorted(set(xs))
    )
)
@settings(max_examples=200, deadline=None)
def test_delta_docs_roundtrip(ids):
    arr = np.array(ids, dtype=np.int64)
    out = delta_decode_docs(delta_encode_docs(arr))
    np.testing.assert_array_equal(out, arr)


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=10**6), min_size=0, max_size=20).map(
            lambda xs: sorted(set(xs))
        ),
        min_size=0,
        max_size=50,
    )
)
@settings(max_examples=200, deadline=None)
def test_positions_roundtrip(lists):
    flat = np.array([p for sub in lists for p in sub], dtype=np.int64)
    counts = np.array([len(sub) for sub in lists], dtype=np.int64)
    buf = encode_positions(flat, counts)
    out = decode_positions(buf, counts)
    np.testing.assert_array_equal(out, flat)


def test_positions_with_zero_count_docs():
    flat = np.array([3, 7, 9, 0, 2], dtype=np.int64)
    counts = np.array([2, 0, 1, 0, 2], dtype=np.int64)
    out = decode_positions(encode_positions(flat, counts), counts)
    np.testing.assert_array_equal(out, flat)
