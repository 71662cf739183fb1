"""Reference index-file interop: byte-exact golden vectors (hand-derived
from the `ir-phase-1.ipynb:c25-26` format spec) + engine round-trip."""

import pytest

from information_retrieval_spark.index.interop import (
    export_index,
    import_index_df,
    read_reference_index,
    write_reference_index,
)

WORDS = [("ab", {"7": {"title": [0], "abstract": [1, 3]}})]

# Hand-derived gamma stream for WORDS:
#  word: len=02 'ab'; n_docs=00000001; doc: len=01 '7'
#  title [0] -> +1=[1], gaps [1], gamma '0' -> pad 7 -> 0x00, n_bytes=01,
#    bit_len=0001
#  abstract [1,3] -> +1=[2,4], gaps [2,2], gamma '100100' -> pad 2 ->
#    0x24, n_bytes=01, bit_len=0006
GOLDEN_GAMMA = bytes.fromhex("0261620000000101370100010001000624")

# vb: title [0] -> 0x80; abstract [1,3] -> 0x81 0x83 (absolute positions,
# high bit marks the LAST byte of each number)
GOLDEN_VB = bytes.fromhex("026162000000010137000000018000000002" "8183")


def test_gamma_golden_bytes(tmp_path):
    p = str(tmp_path / "idx.gamma")
    write_reference_index(iter(WORDS), p, "gamma-code")
    assert open(p, "rb").read() == GOLDEN_GAMMA
    got = list(read_reference_index(p, "gamma-code"))
    assert got == [("ab", {"7": {"title": [0], "abstract": [1, 3]}})]


def test_vb_golden_bytes(tmp_path):
    p = str(tmp_path / "idx.vb")
    write_reference_index(iter(WORDS), p, "variable-byte")
    assert open(p, "rb").read() == GOLDEN_VB
    got = list(read_reference_index(p, "variable-byte"))
    assert got == [("ab", {"7": {"title": [0], "abstract": [1, 3]}})]


def test_gamma_aligned_padding_quirk(tmp_path):
    """When the gamma bit string is byte-aligned (incl. empty), the
    reference pads a FULL extra zero byte; bit_len still records the
    unpadded length."""
    words = [("x", {"1": {"title": [], "abstract": [0] * 0}})]
    p = str(tmp_path / "idx.g")
    write_reference_index(iter(words), p, "gamma-code")
    raw = open(p, "rb").read()
    # word 'x', one doc '1', then two empty sections: n_bytes=1, bit_len=0,
    # one zero byte each
    assert raw == bytes.fromhex("01780000000101310100000001000000")
    assert list(read_reference_index(p, "gamma-code")) == [
        ("x", {"1": {"title": [], "abstract": []}})
    ]
    # 8 gaps of 1 -> bits '0'*8 (aligned) -> extra byte: n_bytes=2
    words = [("y", {"2": {"title": [0, 1, 2, 3, 4, 5, 6, 7], "abstract": []}})]
    write_reference_index(iter(words), p, "gamma-code")
    raw = open(p, "rb").read()
    assert raw[8] == 2  # n_bytes for the title payload
    assert list(read_reference_index(p, "gamma-code"))[0][1]["2"]["title"] == [
        0, 1, 2, 3, 4, 5, 6, 7
    ]


@pytest.mark.parametrize("compression", ["gamma-code", "variable-byte"])
def test_engine_index_round_trips(spark, index_dir, tmp_path, compression):
    """Exporting the built index and importing it back must reproduce the
    postings table exactly (terms, sections, doc ids, tf, positions)."""
    out = str(tmp_path / f"ref_index_{compression}")
    size = export_index(spark, index_dir, out, compression)
    assert size > 0
    back = {
        (r.term, r.section, r.doc_id): (r.tf, list(r.positions))
        for r in import_index_df(spark, out, compression).collect()
    }
    want = {
        (r.term, r.section, r.doc_id): (int(r.tf), list(r.positions))
        for r in spark.read.parquet(f"{index_dir}/postings_flat").collect()
    }
    assert back == want


def test_gamma_rejects_over_long_run_cleanly(tmp_path):
    """The reference gamma format's 1-byte n_bytes field caps a posting
    run at 255 payload bytes; the writer must fail loudly (the reference's
    own writer would silently emit a corrupt stream) while variable-byte
    handles the same run fine."""
    # dense runs gamma-compress to ~1 bit/posting, so exceeding the 255-
    # byte cap takes WIDE gaps (~41 bits each at million-sized gaps)
    sparse = [i * 1_000_000 for i in range(120)]
    words = [("w", {"1": {"title": sparse, "abstract": []}})]
    with pytest.raises(ValueError, match="caps n_bytes"):
        write_reference_index(iter(words), str(tmp_path / "g"), "gamma-code")
    p = str(tmp_path / "v")
    write_reference_index(iter(words), p, "variable-byte")
    got = list(read_reference_index(p, "variable-byte"))
    assert got[0][1]["1"]["title"] == sparse
