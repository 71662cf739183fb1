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


# ------------------------------------------------- wide-payload packing


def test_binary_from_offsets_large_binary_fallback():
    """A varint payload past pa.binary()'s int32 offset range must come
    back as pa.large_binary() (int64 offsets) with a loud warning — not
    a silent int32 wrap that corrupts the packed blocks. Allocates a
    real >2^31-byte buffer so the round-trip is genuine."""
    import warnings

    import pyarrow as pa

    from information_retrieval_spark.index.pack import _binary_from_offsets

    big = 2**31 + 16
    buf = bytearray(big)
    buf[0:4] = b"head"
    buf[big - 4:big] = b"tail"
    offs = np.array([0, big - 8, big], dtype=np.int64)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        arr = _binary_from_offsets(bytes(buf), offs)
    assert arr.type == pa.large_binary()
    assert any("int32" in str(x.message) for x in w)
    assert len(arr) == 2
    assert len(arr[0].as_py()) == big - 8
    assert arr[0].as_py()[:4] == b"head"
    assert arr[1].as_py() == b"\x00\x00\x00\x00tail"
    # the int32 path is untouched for normal payloads
    small = _binary_from_offsets(b"abcdef", np.array([0, 2, 6]))
    assert small.type == pa.binary()
    assert small.to_pylist() == [b"ab", b"cdef"]


def test_pack_batch_arrow_chunks_wide_payload(monkeypatch):
    """When a batch's varint payload exceeds the binary-offset ceiling,
    _pack_batch_arrow splits at BLOCK boundaries: several batches, every
    binary column still plain pa.binary() (no large_binary reaches
    Spark), each chunk's payload within the ceiling, and the
    concatenation byte-identical to the unchunked single batch."""
    import pyarrow as pa

    import information_retrieval_spark.index.pack as pk

    n = 700  # ~6 blocks of BLOCK=128 across two (term,section) groups
    tb = pa.table(
        {
            "term": ["alpha"] * 400 + ["beta"] * (n - 400),
            "section": ["content"] * n,
            "bucket": pa.array([0] * n, type=pa.int32()),
            "doc_id": pa.array(np.arange(n) * 7, type=pa.int64()),
            "tf": pa.array(np.arange(n) % 13 + 1, type=pa.int32()),
            "dl": pa.array(np.arange(n) % 97 + 5, type=pa.int32()),
        }
    )
    want = pk._pack_batch_arrow(tb)
    assert len(want) == 1  # normal path: one batch
    single = pa.Table.from_batches(want)

    monkeypatch.setattr(pk, "MAX_BINARY_PAYLOAD", 200)
    got = pk._pack_batch_arrow(tb)
    assert len(got) > 1
    for rb in got:
        for col in ("docs_bin", "tfs_bin", "dls_bin"):
            a = rb.column(rb.schema.get_field_index(col))
            assert a.type == pa.binary()
            payload = sum(len(v.as_py()) for v in a)
            assert payload <= 200, (col, payload)
    chunked = pa.Table.from_batches(got)
    assert chunked.equals(single)
