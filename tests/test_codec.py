"""Delta+VByte codec: round-trip property tests (FIXTURES.md F3)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from awesome_spark_search import codec


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_vbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(codec.vbyte_decode(codec.vbyte_encode(arr)), arr)


@given(
    st.lists(st.integers(min_value=1, max_value=10**6), min_size=0, max_size=200)
)
@settings(max_examples=200, deadline=None)
def test_delta_vbyte_roundtrip_sorted(gaps):
    ids = np.cumsum(np.array(gaps, dtype=np.int64)) if gaps else np.zeros(0, np.int64)
    assert np.array_equal(codec.delta_vbyte_decode(codec.delta_vbyte_encode(ids)), ids)


def test_vbyte_wire_format():
    # little-endian 7-bit groups, 0x80 continuation on non-final bytes
    # (matches ref: src/io/index/CompressedIndexWriter.java:24-39)
    assert codec.vbyte_encode(np.array([0], np.uint64)) == b"\x00"
    assert codec.vbyte_encode(np.array([127], np.uint64)) == b"\x7f"
    assert codec.vbyte_encode(np.array([128], np.uint64)) == b"\x80\x01"
    assert codec.vbyte_encode(np.array([300], np.uint64)) == b"\xac\x02"


def test_edge_values():
    arr = np.array([0, 1, 127, 128, 2**14 - 1, 2**14, 2**63 - 1, 2**64 - 1], np.uint64)
    assert np.array_equal(codec.vbyte_decode(codec.vbyte_encode(arr)), arr)


def test_block_max():
    tfs = np.array([1, 5, 2] * 100)
    dls = np.full(300, 100)
    bm = codec.block_max_scores(tfs, dls, avgdl=100.0, k1=1.2, b=0.75)
    assert len(bm) == (300 + codec.BLOCK - 1) // codec.BLOCK
    expect = 5 / (5 + 1.2)
    assert abs(bm[0] - expect) < 1e-12
