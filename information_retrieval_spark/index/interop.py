"""Reference index-file interop: read/write the EXACT byte stream the
reference persists its trie index to (`ir-phase-1.ipynb:c25` writers /
`:c26` readers, used by `store_index`/`load_index`).

Stream layout, repeated per word (big-endian throughout):

    [1B len][utf8 word][4B n_docs]
      per doc: [1B len][utf8 doc_id]
        per section (title, then abstract):
          gamma-code:     [1B n_bytes][2B bit_len][bit-packed γ codes]
          variable-byte:  [4B n_bytes][VB bytes]

Gamma payload semantics (reference parity, including its quirks):
* positions are shifted +1 (γ can't code 0), delta-gapped, each gap coded
  as unary(len(offset)) + '0' + offset where offset = binary sans the
  leading 1;
* the bit string is LEFT-padded with zeros to a byte boundary — and when
  it is already aligned (len % 8 == 0, including the empty list) the
  reference pads a FULL extra zero byte; ``bit_len`` records the unpadded
  length (0 ⇒ empty list).

Variable-byte payload: ABSOLUTE positions (no +1, no gaps), 7-bit groups
big-endian with the high bit set on the LAST byte of each number.

This is a driver-side interop/debug tool (the reference's whole index is a
single in-RAM file); the engine's scale format remains the parquet
``postings_flat`` + packed block-max shards. The export iterates the
term-sorted postings with ``toLocalIterator`` so nothing corpus-sized
materializes on the driver beyond one term group at a time.
"""

from __future__ import annotations

import os
from collections.abc import Iterable, Iterator

SECTIONS = ("title", "abstract")


# ------------------------------------------------------------ gamma payload

def _gamma_bits(positions: list[int]) -> str:
    if not positions:
        return ""
    shifted = [p + 1 for p in sorted(positions)]
    gaps = [shifted[0]] + [
        shifted[i] - shifted[i - 1] for i in range(1, len(shifted))
    ]
    out = []
    for gap in gaps:
        offset = bin(gap)[3:]  # binary of gap without its leading 1
        out.append("1" * len(offset) + "0" + offset)
    return "".join(out)


def _gamma_payload(positions: list[int]) -> bytes:
    bits = _gamma_bits(positions)
    bit_len = len(bits)
    pad = "0" * (8 - bit_len % 8)  # full extra byte when already aligned
    total = pad + bits
    n_bytes = len(total) // 8
    # the binding limit is the 1-byte n_bytes field (≈2,040 gamma bits ≈
    # a ~600-position dense run), which the REFERENCE format shares — its
    # own writer would silently overflow here; we fail loudly instead of
    # emitting a truncated stream
    if n_bytes > 0xFF:
        raise ValueError(
            f"posting run of {len(positions)} positions needs {n_bytes}"
            " payload bytes; the reference gamma format caps n_bytes at"
            " 255 — use the variable-byte format for this corpus"
        )
    body = bytes(int(total[i : i + 8], 2) for i in range(0, len(total), 8))
    return (
        n_bytes.to_bytes(1, "big") + bit_len.to_bytes(2, "big") + body
    )


def _gamma_parse(body: bytes, bit_len: int) -> list[int]:
    if bit_len == 0:
        return []
    val = int.from_bytes(body, "big")
    bits = format(val, "b").zfill(bit_len)[-bit_len:]
    out, i, acc = [], 0, 0
    while i < len(bits):
        L = 0
        while bits[i] == "1":
            L += 1
            i += 1
        i += 1  # the terminating '0'
        offset = bits[i : i + L]
        i += L
        acc += int("1" + offset, 2)
        out.append(acc - 1)
    return out


# --------------------------------------------------------------- vb payload

def _vb_number(n: int) -> bytes:
    groups = []
    while True:
        groups.insert(0, n % 128)
        n //= 128
        if n == 0:
            break
    groups[-1] += 128  # reference convention: marker on the LAST byte
    return bytes(groups)


def _vb_payload(positions: list[int]) -> bytes:
    body = b"".join(_vb_number(p) for p in positions)
    return len(body).to_bytes(4, "big") + body


def _vb_parse(body: bytes) -> list[int]:
    out, n = [], 0
    for b in body:
        n = n * 128 + (b % 128)
        if b >= 128:
            out.append(n)
            n = 0
    return out


# ------------------------------------------------------------- file writers

def write_reference_index(
    words: Iterable[tuple[str, dict[str, dict[str, list[int]]]]],
    path: str,
    compression: str = "gamma-code",
) -> int:
    """Write (word → doc → section → positions) groups in the reference's
    stream format; returns the file size (reference `store_index` contract).
    """
    if compression not in ("gamma-code", "variable-byte"):
        raise ValueError(f"unsupported compression: {compression}")
    payload = _gamma_payload if compression == "gamma-code" else _vb_payload
    with open(path, "wb") as f:
        for word, docs in words:
            w = word.encode("utf-8")
            assert len(w) < 256
            f.write(len(w).to_bytes(1, "big"))
            f.write(w)
            f.write(len(docs).to_bytes(4, "big"))
            for doc_id, secs in docs.items():
                d = doc_id.encode("utf-8")
                f.write(len(d).to_bytes(1, "big"))
                f.write(d)
                for s in SECTIONS:
                    f.write(payload(secs.get(s, [])))
    return os.path.getsize(path)


def read_reference_index(
    path: str, compression: str = "gamma-code"
) -> Iterator[tuple[str, dict[str, dict[str, list[int]]]]]:
    """Stream (word, {doc_id: {title: [...], abstract: [...]}}) groups back
    out of a reference index file."""
    if compression not in ("gamma-code", "variable-byte"):
        raise ValueError(f"unsupported compression: {compression}")
    with open(path, "rb") as f:
        while True:
            head = f.read(1)
            if not head:
                return
            word = f.read(int.from_bytes(head, "big")).decode("utf-8")
            n_docs = int.from_bytes(f.read(4), "big")
            docs: dict[str, dict[str, list[int]]] = {}
            for _ in range(n_docs):
                dlen = int.from_bytes(f.read(1), "big")
                doc_id = f.read(dlen).decode("utf-8")
                secs = {}
                for s in SECTIONS:
                    if compression == "gamma-code":
                        n_bytes = int.from_bytes(f.read(1), "big")
                        bit_len = int.from_bytes(f.read(2), "big")
                        secs[s] = _gamma_parse(f.read(n_bytes), bit_len)
                    else:
                        n_bytes = int.from_bytes(f.read(4), "big")
                        secs[s] = _vb_parse(f.read(n_bytes))
                docs[doc_id] = secs
            yield word, docs


# ----------------------------------------------------------- Spark bridges

def export_index(
    spark, index_dir: str, out_path: str, compression: str = "gamma-code"
) -> int:
    """Export the engine's ``postings_flat`` as a reference-format file.

    Requires an index whose sections are exactly title/abstract (the
    format hardcodes them). Words sorted lexicographically, docs by
    numeric id; one term group on the driver at a time.
    """
    from information_retrieval_spark.index.catalog import read_table

    p = read_table(spark, index_dir, "postings_flat")
    secs = {r.section for r in p.select("section").distinct().collect()}
    if not secs <= set(SECTIONS):
        raise ValueError(
            f"reference format requires sections ⊆ {SECTIONS}, got {secs}"
        )
    rows = (
        p.select("term", "section", "doc_id", "positions")
        .orderBy("term", "doc_id", "section")
        .toLocalIterator()
    )

    def groups():
        cur_term = None
        docs: dict[str, dict[str, list[int]]] = {}
        for r in rows:
            if r.term != cur_term:
                if cur_term is not None:
                    yield cur_term, docs
                cur_term, docs = r.term, {}
            docs.setdefault(str(r.doc_id), {})[r.section] = list(r.positions)
        if cur_term is not None:
            yield cur_term, docs

    return write_reference_index(groups(), out_path, compression)


def import_index_df(spark, path: str, compression: str = "gamma-code"):
    """Read a reference index file into a (term, section, doc_id, tf,
    positions) DataFrame — empty sections dropped, doc ids parsed as
    longs."""
    rows = []
    for word, docs in read_reference_index(path, compression):
        for doc_id, secs in docs.items():
            for s, pos in secs.items():
                if pos:
                    rows.append((word, s, int(doc_id), len(pos), pos))
    return spark.createDataFrame(
        rows, "term string, section string, doc_id long, tf int,"
        " positions array<int>"
    )
