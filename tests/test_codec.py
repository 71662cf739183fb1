"""Codec round-trip: property-based (SURVEY.md §5 / §7 hard-part d)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from information_retrieval_spark.index.codec import (
    decode_doc_gaps,
    encode_doc_gaps,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    enc = varint_encode(np.array(vals, dtype=np.uint64))
    dec = varint_decode(enc)
    assert dec.tolist() == vals


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300)
)
@settings(max_examples=200, deadline=None)
def test_doc_gap_roundtrip(vals):
    docs = sorted(set(vals))
    enc = encode_doc_gaps(np.array(docs, dtype=np.uint64))
    dec = decode_doc_gaps(enc)
    assert dec.tolist() == docs


def test_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").tolist() == []
    assert decode_doc_gaps(b"").tolist() == []


def test_known_bytes():
    # LEB128: 300 = 0b100101100 → [0xAC, 0x02]
    assert varint_encode(np.array([300], dtype=np.uint64)) == bytes([0xAC, 0x02])
    assert varint_encode(np.array([0], dtype=np.uint64)) == bytes([0x00])
    assert varint_encode(np.array([127], dtype=np.uint64)) == bytes([0x7F])
    assert varint_encode(np.array([128], dtype=np.uint64)) == bytes([0x80, 0x01])


def test_compression_beats_raw():
    docs = np.arange(0, 128_000, 7, dtype=np.uint64)  # small gaps
    enc = encode_doc_gaps(docs)
    assert len(enc) < docs.size * 2  # vs 8 bytes/doc raw


@given(st.lists(st.integers(min_value=1, max_value=2**40), max_size=200))
@settings(max_examples=150, deadline=None)
def test_gamma_roundtrip(vals):
    from information_retrieval_spark.index.codec import gamma_decode, gamma_encode

    enc = gamma_encode(np.array(vals, dtype=np.uint64))
    dec = gamma_decode(enc, len(vals))
    assert dec.tolist() == vals


def test_gamma_known_bits():
    """γ(9): k=3 → unary 1110, offset 001 → '1110001' (+1 pad bit)."""
    from information_retrieval_spark.index.codec import gamma_encode

    assert gamma_encode(np.array([9], dtype=np.uint64)) == bytes([0b11100010])
    assert gamma_encode(np.array([1], dtype=np.uint64)) == bytes([0b00000000])


def test_gamma_rejects_zero():
    import pytest

    from information_retrieval_spark.index.codec import gamma_encode

    with pytest.raises(ValueError):
        gamma_encode(np.array([0], dtype=np.uint64))
