"""Codec round-trip: exact inversion, property-tested (SURVEY §5.1)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sequential_query_expansion_spark.index.codec import (
    decode_block,
    delta_decode,
    delta_encode,
    encode_block,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    a = np.array(values, dtype=np.uint64)
    assert (varint_decode(varint_encode(a), len(a)) == a).all()


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=500)
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(values):
    a = np.unique(np.array(values, dtype=np.int64))
    assert (delta_decode(delta_encode(a)) == a).all()


def test_delta_encode_does_not_mutate_input():
    a = np.array([3, 10, 20], dtype=np.int64)
    delta_encode(a)
    assert a.tolist() == [3, 10, 20]


@given(st.data())
@settings(max_examples=100, deadline=None)
def test_block_roundtrip(data):
    n = data.draw(st.integers(min_value=1, max_value=300))
    doc_ids = np.unique(
        np.array(
            data.draw(
                st.lists(
                    st.integers(min_value=0, max_value=10**12),
                    min_size=n,
                    max_size=n,
                )
            ),
            dtype=np.int64,
        )
    )
    n = len(doc_ids)
    tfs = np.array(
        data.draw(st.lists(st.integers(1, 10_000), min_size=n, max_size=n)),
        dtype=np.int64,
    )
    dls = np.array(
        data.draw(st.lists(st.integers(1, 100_000), min_size=n, max_size=n)),
        dtype=np.int64,
    )
    d, t, l = decode_block(*encode_block(doc_ids, tfs, dls), n)
    assert (d == doc_ids).all() and (t == tfs).all() and (l == dls).all()


def test_varint_sizes():
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varint_encode(np.array([], dtype=np.uint64)) == b""


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_pfor_roundtrip(values):
    from sequential_query_expansion_spark.index.codec import (
        pfor_decode,
        pfor_encode,
    )

    a = np.array(values, dtype=np.uint64)
    assert (pfor_decode(pfor_encode(a), len(a)) == a).all()


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_block_roundtrip_both_codecs(data):
    n = data.draw(st.integers(min_value=1, max_value=200))
    doc_ids = np.unique(
        np.array(
            data.draw(
                st.lists(
                    st.integers(min_value=0, max_value=10**12),
                    min_size=n, max_size=n,
                )
            ),
            dtype=np.int64,
        )
    )
    n = len(doc_ids)
    tfs = np.ones(n, dtype=np.int64)
    dls = np.full(n, 7, dtype=np.int64)
    for codec in ("varint", "pfor"):
        d, t, l = decode_block(*encode_block(doc_ids, tfs, dls, codec=codec), n)
        assert (d == doc_ids).all() and (t == tfs).all() and (l == dls).all()


def test_pfor_smaller_on_skewed_blocks():
    """The codec's reason to exist: tight gaps + a few outliers pack
    better than varint (which pays a whole byte per 7 bits)."""
    from sequential_query_expansion_spark.index.codec import pfor_encode

    rng = np.random.default_rng(7)
    gaps = rng.integers(1, 2000, 128).astype(np.uint64)
    gaps[5] = 2**40  # outlier → exception, not a wider frame
    assert len(pfor_encode(gaps)) < len(varint_encode(gaps))


def test_unknown_codec_tag_rejected():
    import pytest as _pytest

    from sequential_query_expansion_spark.index.codec import _decode_tagged

    with _pytest.raises(ValueError, match="unknown codec tag"):
        _decode_tagged(b"\xffjunk", 3)
