import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from blacklab_spark.index import codec


@given(st.lists(st.integers(0, 2**50), max_size=500))
@settings(max_examples=100, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    assert np.array_equal(codec.varint_decode(codec.varint_encode(arr)), arr)


@given(st.sets(st.integers(0, 2**31), min_size=1, max_size=300))
@settings(max_examples=100, deadline=None)
def test_doc_ids_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.int64)
    assert np.array_equal(codec.decode_doc_ids(codec.encode_doc_ids(arr)), arr)


@given(
    st.lists(
        st.sets(st.integers(0, 511), min_size=1, max_size=20), min_size=1, max_size=40
    )
)
@settings(max_examples=100, deadline=None)
def test_positions_roundtrip(doc_positions):
    freqs = np.array([len(p) for p in doc_positions], dtype=np.int64)
    flat = np.concatenate([np.sort(np.array(list(p))) for p in doc_positions])
    enc = codec.encode_positions(flat, freqs)
    assert np.array_equal(codec.decode_positions(enc, freqs), flat)


def test_empty():
    assert codec.varint_encode(np.array([], dtype=np.int64)) == b""
    assert codec.varint_decode(b"").size == 0
    assert codec.encode_positions(np.array([]), np.array([])) == b""


def test_compression_is_real():
    # dense doc ids should cost ~1 byte each after delta
    ids = np.arange(10_000, 20_000, dtype=np.int64)
    assert len(codec.encode_doc_ids(ids)) < 1.2 * len(ids)
