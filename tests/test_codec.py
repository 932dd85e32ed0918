import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from lucene_spark.codec.vbyte import (
    delta_decode,
    delta_encode,
    vbyte_decode,
    vbyte_encode,
)
from lucene_spark.codec.blocks import build_block_meta


def test_vbyte_simple():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**31, 2**40], dtype=np.int64)
    assert np.array_equal(vbyte_decode(vbyte_encode(vals)), vals)


def test_vbyte_empty():
    assert vbyte_encode(np.array([], dtype=np.int64)) == b""
    assert vbyte_decode(b"").size == 0


def test_vbyte_single_byte_values():
    vals = np.arange(128, dtype=np.int64)
    blob = vbyte_encode(vals)
    assert len(blob) == 128  # each fits one byte
    assert np.array_equal(vbyte_decode(blob), vals)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
def test_vbyte_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.int64)
    assert np.array_equal(vbyte_decode(vbyte_encode(vals)), vals)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=500, unique=True))
def test_delta_roundtrip_property(xs):
    vals = np.array(sorted(xs), dtype=np.int64)
    assert np.array_equal(delta_decode(delta_encode(vals)), vals)


def test_block_meta():
    n = 300
    docs = np.arange(0, n * 2, 2, dtype=np.int64)
    tfs = np.arange(1, n + 1, dtype=np.int64)
    dls = np.arange(10, n + 10, dtype=np.int64)
    bl, bmt, bmd = build_block_meta(docs, tfs, dls, block_size=128)
    assert bl.size == 3
    assert bl[0] == docs[127] and bl[1] == docs[255] and bl[2] == docs[-1]
    assert bmt[0] == 128 and bmt[1] == 256 and bmt[2] == 300
    assert bmd[0] == 10 and bmd[1] == 138 and bmd[2] == 266
    # invariant: block upper bounds dominate every member
    for b in range(3):
        lo, hi = b * 128, min((b + 1) * 128, n)
        assert tfs[lo:hi].max() == bmt[b]
        assert dls[lo:hi].min() == bmd[b]
        assert docs[lo:hi].max() == bl[b]


def test_block_meta_empty():
    e = np.empty(0, dtype=np.int64)
    bl, bmt, bmd = build_block_meta(e, e, e)
    assert bl.size == 0
