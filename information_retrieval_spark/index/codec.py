"""Delta-gap + varint posting codec, numpy-vectorized (no per-value Python
in the hot path).

Logical content matches the reference's variable-byte index format
(`ir-phase-1.ipynb:c25:63-99` encode, `c26:61-69` decode): 7-bit groups,
little-endian within a value, high bit = continuation. Deviation from the
reference (documented in SURVEY.md §2.11 Q9): the reference's vb writer
stores RAW positions while its γ writer gap-encodes; we always delta-gap
doc_ids (north_star: "delta-gap + varint") — same information, smaller.

Encoding layout used by ``index/pack.py`` per block:
  docs_bin = varint(doc_id[0], doc_id[1]-doc_id[0], ...)   (strictly ↑)
  tfs_bin  = varint(tf[0], tf[1], ...)                      (raw)

Both directions are O(total_bytes) numpy: encode scatters each value's k-th
7-bit group with one vectorized step per byte-width level; decode segments
the byte stream by continuation bits and folds groups with
``np.add.reduceat``.
"""

from __future__ import annotations

import numpy as np


def varint_encode_offsets(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode a non-negative int array as concatenated LEB128 varints,
    returning ``(buffer, offsets)`` where ``offsets`` has ``len+1`` entries
    and value ``i`` occupies ``buffer[offsets[i]:offsets[i+1]]``. Values are
    encoded independently, so slicing the buffer at any value boundary
    yields exactly the bytes a separate encode of that slice would — the
    packer (index/pack.py) encodes a whole sorted column ONCE and slices
    per-block ranges out, instead of one encode call per block."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(1, dtype=np.int64)
    # bytes per value = how many 7-bit groups it spans (≥1)
    nbytes = np.ones(v.shape, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbytes[nz] += 1
        tmp = tmp >> np.uint64(7)
    offsets = np.concatenate(([0], np.cumsum(nbytes)))
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)
    starts = offsets[:-1]
    max_b = int(nbytes.max())
    for k in range(max_b):
        sel = nbytes > k
        byte = (v[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (nbytes[sel] - 1 > k).astype(np.uint8) << 7
        out[starts[sel] + k] = byte.astype(np.uint8) | cont
    return out.tobytes(), offsets


def varint_encode(values: np.ndarray) -> bytes:
    """Encode a non-negative int array as concatenated LEB128 varints."""
    return varint_encode_offsets(values)[0]


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode concatenated LEB128 varints → uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = (b & 0x80) == 0          # terminal byte of each value
    starts = np.empty_like(ends)
    starts[0] = True
    starts[1:] = ends[:-1]
    start_idx = np.flatnonzero(starts)
    pos_in_group = np.arange(b.size) - np.repeat(
        start_idx, np.diff(np.append(start_idx, b.size))
    )
    contrib = (b & 0x7F).astype(np.uint64) << (7 * pos_in_group).astype(np.uint64)
    return np.add.reduceat(contrib, start_idx)


def encode_doc_gaps(doc_ids: np.ndarray) -> bytes:
    """Strictly-increasing doc_ids → delta-gap varint block."""
    d = np.asarray(doc_ids, dtype=np.uint64)
    if d.size == 0:
        return b""
    gaps = np.empty_like(d)
    gaps[0] = d[0]
    gaps[1:] = d[1:] - d[:-1]
    return varint_encode(gaps)


def decode_doc_gaps(buf: bytes) -> np.ndarray:
    gaps = varint_decode(buf)
    return np.cumsum(gaps, dtype=np.uint64)


# ------------------------------------------------------------- Elias gamma

def gamma_encode(values: np.ndarray) -> bytes:
    """Elias-γ bitstream of POSITIVE ints, MSB-first, zero-padded to a byte.

    Format parity with the reference's γ writer (`ir-phase-1.ipynb:
    c25:10-27`): per value v (≥1) with k = bit_length−1, emit k ones, a
    zero, then the k low bits of v. The reference's +1 shift for
    0-valued positions (quirk Q9) is the CALLER's job (encode pos+1).
    γ is the compatibility codec; varint is the production codec.
    """
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    if (v == 0).any():
        raise ValueError("gamma code requires values >= 1 (shift first)")
    acc = 0
    nbits = 0
    for x in v.tolist():
        k = x.bit_length() - 1
        # k ones, one zero, k offset bits  → width 2k+1
        word = (((1 << k) - 1) << (k + 1)) | (x & ((1 << k) - 1))
        acc = (acc << (2 * k + 1)) | word
        nbits += 2 * k + 1
    pad = (-nbits) % 8
    acc <<= pad
    nbits += pad
    return acc.to_bytes(nbits // 8, "big")


def gamma_decode(buf: bytes, count: int) -> np.ndarray:
    """Decode ``count`` γ-coded values from an MSB-first bitstream."""
    out = np.empty(count, dtype=np.uint64)
    if count == 0:
        return out
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))
    i = 0
    for j in range(count):
        k = 0
        while bits[i]:
            k += 1
            i += 1
        i += 1  # the zero terminator
        x = 1
        for _ in range(k):
            x = (x << 1) | int(bits[i])
            i += 1
        out[j] = x
    return out
