"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

Image and (half the) audio payloads are REAL parseable formats:
``media_table`` synthesizes valid 24-bit BMP files, PNG headers, and PCM
WAV files (all constructed JVM-side from hex-literal expressions — no
UDF), and ``decode_bmp_header`` / ``decode_png_header`` /
``decode_wav_header`` parse width/height/channels (resp. channels/
sample-rate/bit-depth) back out of the raw bytes with pure byte
arithmetic, exactly as a real decoder's header pass does. Remaining
audio/video payloads keep the declared stub (no codec libs in this
container): ``decode_image_stub`` produces a deterministic fake feature
vector; swapping in a real decoder (PIL/ffmpeg) is a one-function change
behind the same schema.

Synthesis: the testdata has no binary tables, so ``media_table`` derives a
deterministic media table from ``documents``. This is the pattern a 100 TB
image corpus uses: payloads stay opaque bytes end to end, metadata columns
are queryable/prunable, and per-batch vectorized processing never holds
more than one Arrow batch of payloads in memory.

Scale notes: feature extraction is map-only (no shuffle); frame sampling /
resize parallelize per-row. Partition sizing is governed by
``spark.sql.files.maxPartitionBytes`` against payload size, NOT row count —
documented in the README's deployment section.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, functions as F, types as T

from information_retrieval_spark.ops.common import portable_hash32, sql_hash32

FEATURE_DIM = 16
MAX_DIM = 16  # synthetic image dims in [1, MAX_DIM]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("payload_sha256", T.StringType(), False),
        # decoded header metadata — null where the format doesn't carry it
        # (images: width/height/channels; WAV: channels/sample-rate/bits;
        # stub-decoded rows: all null)
        T.StructField("dec_width", T.IntegerType(), True),
        T.StructField("dec_height", T.IntegerType(), True),
        T.StructField("dec_channels", T.IntegerType(), True),
        T.StructField("dec_sample_rate", T.IntegerType(), True),
        T.StructField("dec_bits", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def _le_hex(c: Column, nbytes: int) -> Column:
    """Hex string of an int column as ``nbytes`` little-endian bytes."""
    return F.concat(
        *[
            F.format_string(
                "%02x", F.shiftright(c.cast("long"), 8 * b).bitwiseAND(F.lit(255))
            )
            for b in range(nbytes)
        ]
    )


def _be_hex(c: Column, nbytes: int) -> Column:
    """Hex string of an int column as ``nbytes`` big-endian bytes."""
    return F.concat(
        *[
            F.format_string(
                "%02x", F.shiftright(c.cast("long"), 8 * b).bitwiseAND(F.lit(255))
            )
            for b in range(nbytes - 1, -1, -1)
        ]
    )


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from documents. Image rows carry
    REAL image bytes — doc_id % 6 == 0 a complete 24-bit BMP (54-byte
    header + zeroed, 4-byte-row-padded pixel data); doc_id % 6 == 3 split
    by (doc_id // 6) parity into a PNG (signature + IHDR chunk) or a JPEG
    (SOI + APP0/JFIF + SOF0-or-SOF2 frame header), each followed by the
    doc text as opaque body — and doc_id % 6 == 1 audio rows a complete
    PCM WAV (44-byte RIFF/fmt/data header + the doc text as sample data)
    — all built entirely from JVM-side hex expressions (unhex of
    format_string), no UDF. Remaining audio/video rows keep the declared
    b'IMG0' stub payload. Dims / channel counts / sample rates /
    JPEG frame type are portable-hash-derived so the DuckDB twin
    reconstructs byte-identical payloads."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = (
        portable_hash32(F.concat(F.col("doc_id").cast("string"), F.lit("w")))
        % MAX_DIM + 1
    ).cast("int")
    h = (
        portable_hash32(F.concat(F.col("doc_id").cast("string"), F.lit("h")))
        % MAX_DIM + 1
    ).cast("int")
    # 24-bit BMP rows are padded to 4-byte multiples
    rowbytes = ((w * 3 + 3) / 4).cast("int") * 4
    psz = (rowbytes * h).cast("int")
    bmp_payload = F.unhex(
        F.concat(
            F.lit("424d"),                  # 'BM'
            _le_hex(psz + 54, 4),           # file size
            F.lit("00000000"),              # reserved
            F.lit("36000000"),              # pixel data offset = 54
            F.lit("28000000"),              # BITMAPINFOHEADER size = 40
            _le_hex(w, 4),
            _le_hex(h, 4),
            F.lit("0100"),                  # planes = 1
            F.lit("1800"),                  # bit count = 24
            F.lit("00000000"),              # compression = BI_RGB
            _le_hex(psz, 4),                # image size
            F.lit("130b0000130b0000"),      # 2835 ppm x/y
            F.lit("0000000000000000"),      # palette counts
            F.expr("repeat('00', __psz)"),  # zeroed padded pixel rows
        )
    )
    png_payload = F.concat(
        F.unhex(
            F.concat(
                F.lit("89504e470d0a1a0a"),  # PNG signature
                F.lit("0000000d"),          # IHDR length = 13
                F.lit("49484452"),          # 'IHDR'
                _be_hex(w, 4),
                _be_hex(h, 4),
                F.lit("08"),                # bit depth
                F.lit("02"),                # color type 2 = truecolor RGB
                F.lit("000000"),            # compression/filter/interlace
                F.lit("00000000"),          # CRC placeholder
            )
        ),
        F.encode(F.col("text"), "utf-8"),   # opaque body
    )
    # PCM WAV: hash-derived channels (1-2) and sample rate (8/16/24/32/40
    # kHz), fixed 16-bit depth; the doc text is the opaque sample data.
    wc = (
        portable_hash32(F.concat(F.col("doc_id").cast("string"), F.lit("c")))
        % 2 + 1
    ).cast("int")
    wsr = (
        (
            portable_hash32(
                F.concat(F.col("doc_id").cast("string"), F.lit("r"))
            )
            % 5 + 1
        ) * 8000
    ).cast("int")
    dsz = F.length(F.encode(F.col("text"), "utf-8"))
    wav_payload = F.concat(
        F.unhex(
            F.concat(
                F.lit("52494646"),            # 'RIFF'
                _le_hex(dsz + 36, 4),         # chunk size = 36 + data size
                F.lit("57415645"),            # 'WAVE'
                F.lit("666d7420"),            # 'fmt '
                F.lit("10000000"),            # fmt chunk size = 16
                F.lit("0100"),                # audio format 1 = PCM
                _le_hex(wc, 2),               # channels
                _le_hex(wsr, 4),              # sample rate
                _le_hex(wsr * wc * 2, 4),     # byte rate
                _le_hex(wc * 2, 2),           # block align
                F.lit("1000"),                # bits per sample = 16
                F.lit("64617461"),            # 'data'
                _le_hex(dsz, 4),              # data size
            )
        ),
        F.encode(F.col("text"), "utf-8"),
    )
    # JPEG: SOI + 18-byte APP0/JFIF + SOF0 (baseline) or SOF2 (progressive)
    # frame header carrying the hash-derived dims, 1 (grayscale) or 3
    # (YCbCr) components, then the doc text as opaque body. UTF-8 never
    # contains 0xFF, so a marker scanner cannot misfire inside the body.
    jc = (
        F.when(
            portable_hash32(
                F.concat(F.col("doc_id").cast("string"), F.lit("jc"))
            ) % 2 == 0,
            3,
        )
        .otherwise(1)
        .cast("int")
    )
    sof_marker = F.when(
        portable_hash32(
            F.concat(F.col("doc_id").cast("string"), F.lit("jp"))
        ) % 2 == 0,
        F.lit("ffc0"),
    ).otherwise(F.lit("ffc2"))
    jpeg_payload = F.concat(
        F.unhex(
            F.concat(
                F.lit("ffd8"),                                    # SOI
                F.lit("ffe000104a46494600010100000100010000"),    # APP0 JFIF
                sof_marker,                                       # SOF0/SOF2
                _be_hex(F.lit(8) + jc * 3, 2),                    # frame len
                F.lit("08"),                                      # precision
                _be_hex(h, 2),
                _be_hex(w, 2),
                _be_hex(jc, 1),                                   # n components
                F.when(jc == 3, F.lit("012200021101031101"))      # id/sampling/qtbl
                .otherwise(F.lit("011100")),
            )
        ),
        F.encode(F.col("text"), "utf-8"),
    )
    stub_payload = F.concat(F.lit(b"IMG0"), F.encode(F.col("text"), "utf-8"))
    return d.withColumn("__psz", psz).select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.when(F.col("doc_id") % 3 == 0, w)
        .otherwise(
            (F.pmod(F.xxhash64("doc_id"), F.lit(1024)) + 64).cast("int")
        )
        .alias("width"),
        F.when(F.col("doc_id") % 3 == 0, h)
        .otherwise(
            (F.pmod(F.xxhash64("doc_id", "text"), F.lit(768)) + 64).cast("int")
        )
        .alias("height"),
        F.when(F.col("doc_id") % 6 == 0, bmp_payload)
        .when(
            (F.col("doc_id") % 6 == 3) & (F.expr("(doc_id DIV 6) % 2") == 0),
            png_payload,
        )
        .when(F.col("doc_id") % 6 == 3, jpeg_payload)
        .when(F.col("doc_id") % 6 == 1, wav_payload)
        .otherwise(stub_payload)
        .alias("payload"),
    )


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# PNG color type → sample channels (spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_bmp_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from a BMP file's BITMAPINFOHEADER —
    pure byte arithmetic, the real decode pass of the format. Raises
    ValueError on malformed input like any decoder."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    width = struct.unpack_from("<i", payload, 18)[0]
    height = struct.unpack_from("<i", payload, 22)[0]
    bitcount = struct.unpack_from("<H", payload, 28)[0]
    # negative height = top-down row order; dims are magnitudes
    return width, abs(height), max(1, bitcount // 8)


def decode_png_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from a PNG signature + IHDR chunk."""
    if payload[:8] != PNG_MAGIC or len(payload) < 26 or payload[12:16] != b"IHDR":
        raise ValueError("not a PNG payload")
    width, height = struct.unpack_from(">II", payload, 16)
    colortype = payload[25]
    if colortype not in _PNG_CHANNELS:
        raise ValueError(f"bad PNG color type {colortype}")
    return width, height, _PNG_CHANNELS[colortype]


def decode_jpeg_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from a JPEG by walking the marker chain
    to the first start-of-frame segment — SOF0 (baseline) or SOF2
    (progressive), the two frame types real corpora contain. Pure byte
    arithmetic over the JFIF marker structure (ITU T.81 §B.2.2): each
    segment is 0xFF, marker, 2-byte big-endian length (self-inclusive);
    the frame header is [precision u8][height u16be][width u16be][ncomp
    u8]. Raises ValueError on malformed input like any decoder."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {i}")
        marker = payload[i + 1]
        if marker in (0xC0, 0xC2):  # SOF0 / SOF2
            if i + 10 > len(payload):
                raise ValueError("truncated JPEG frame header")
            height, width = struct.unpack_from(">HH", payload, i + 5)
            ncomp = payload[i + 9]
            return width, height, ncomp
        if marker == 0xD9:  # EOI before any frame header
            break
        seg_len = struct.unpack_from(">H", payload, i + 2)[0]
        if seg_len < 2:
            raise ValueError("bad JPEG segment length")
        i += 2 + seg_len
    raise ValueError("no SOF0/SOF2 frame header found")


def decode_wav_header(payload: bytes) -> tuple[int, int, int]:
    """(channels, sample_rate, bits_per_sample) from a RIFF/WAVE file's
    canonical 44-byte header — pure byte arithmetic, the real decode pass
    of the format. Raises ValueError on malformed input like any decoder.
    Assumes the canonical layout ('fmt ' first chunk at offset 12), which
    is what every PCM encoder emits."""
    if (
        payload[:4] != b"RIFF"
        or len(payload) < 44
        or payload[8:12] != b"WAVE"
        or payload[12:16] != b"fmt "
    ):
        raise ValueError("not a WAV payload")
    channels = struct.unpack_from("<H", payload, 22)[0]
    sample_rate = struct.unpack_from("<I", payload, 24)[0]
    bits = struct.unpack_from("<H", payload, 34)[0]
    return channels, sample_rate, bits


def payload_fingerprint(payload: bytes) -> str:
    """sha256 hex digest over the UPPERCASE-HEX encoding of the payload.

    Hashing the hex encoding (a bijection of the bytes) instead of the raw
    bytes keeps the fingerprint engine-portable: DuckDB's sha256() accepts
    only VARCHAR, and hex(blob) is uppercase in both engines."""
    return hashlib.sha256(payload.hex().upper().encode()).hexdigest()


def decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB decoder: real pipelines call PIL/torchvision here.

    Deterministic fake: FEATURE_DIM floats derived from the payload
    fingerprint, scaled to [0, 1). Raises on a malformed header exactly
    like a real decoder would.
    """
    if not payload.startswith(b"IMG0"):
        raise ValueError("bad magic: not a fake-image payload")
    h = bytes.fromhex(payload_fingerprint(payload))
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4],
                        dtype=np.uint32)
    return (raw % 10_000).astype(np.float32) / 10_000.0


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    One ``mapInPandas`` pass: per batch, magic-byte dispatch — BMP, PNG,
    JPEG (SOF0/SOF2 marker-chain walk) and WAV payloads get a REAL header
    decode (dims/channels resp. channels/sample-rate/bits, leading the
    FEATURE_DIM vector), anything else the deterministic stub; plus
    vectorized sha256. The payload
    column is DROPPED from the output (features tables must not carry the
    raw bytes forward — that's the 100 TB mistake)."""

    def decode_one(p: bytes):
        """(dec_width, dec_height, dec_channels, dec_sample_rate,
        dec_bits, features)"""
        feats = np.zeros(FEATURE_DIM, dtype=np.float32)
        if p[:4] == b"RIFF":
            c, sr, bits = decode_wav_header(p)
            feats[0], feats[1], feats[2] = c, sr, bits
            return None, None, c, sr, bits, feats
        if p[:2] == b"BM":
            w, h, c = decode_bmp_header(p)
        elif p[:8] == PNG_MAGIC:
            w, h, c = decode_png_header(p)
        elif p[:2] == b"\xff\xd8":
            w, h, c = decode_jpeg_header(p)
        else:
            return None, None, None, None, None, decode_image_stub(p)
        feats[0], feats[1], feats[2] = w, h, c
        return w, h, c, None, None, feats

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dec = [decode_one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].str.len().astype("int32"),
                    "payload_sha256": [
                        payload_fingerprint(p) for p in pdf["payload"]
                    ],
                    "dec_width": pd.array(
                        [d[0] for d in dec], dtype="Int32"
                    ),
                    "dec_height": pd.array(
                        [d[1] for d in dec], dtype="Int32"
                    ),
                    "dec_channels": pd.array(
                        [d[2] for d in dec], dtype="Int32"
                    ),
                    "dec_sample_rate": pd.array(
                        [d[3] for d in dec], dtype="Int32"
                    ),
                    "dec_bits": pd.array(
                        [d[4] for d in dec], dtype="Int32"
                    ),
                    "features": [d[5] for d in dec],
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (doc_id, frame_no,
    frame_bytes) rows. The stub treats every ``every_n`` bytes of payload
    as one 'frame'; a real impl seeks keyframes. Demonstrates the
    1→N explode shape (mapInPandas, not explode, so frames never
    materialize as one giant array column)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("frame_bytes", T.BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for r in pdf.itertuples(index=False):
                if r.media_type != "video":
                    continue
                body = r.payload[4:]
                for k, s in enumerate(range(0, len(body), every_n)):
                    ids.append(r.doc_id)
                    nos.append(k)
                    frames.append(bytes(body[s : s + every_n]))
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "frame_no": pd.Series(nos, dtype="int32"),
                 "frame_bytes": frames if frames else pd.Series([], dtype=object)}
            )

    return media.mapInPandas(run, schema)


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: per-media feature stats over the binary pipeline.

    Image and WAV rows are value-checked END TO END: the DuckDB twin
    reconstructs the same BMP/PNG/WAV payload bytes (blob concat of hex
    literals), then independently re-parses width/height/channels (resp.
    channels/sample-rate/bits) by SLICING THE BLOB's header bytes — two
    unrelated parsers (Python struct vs SQL byte arithmetic) agreeing on
    the same binary. Stub (remaining audio/video) rows are
    checked as before: the twin re-derives the 16 float32 features from
    the hex digest (LE uint32 % 10000 / 10000, quantized ``::FLOAT`` —
    bit-identical to the numpy float32 path for all 10k values) folded in
    ``F.aggregate``'s left-to-right order."""
    feats = extract_features(media_table(spark, sf_dir))
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        "payload_sha256",
        "dec_width",
        "dec_height",
        "dec_channels",
        "dec_sample_rate",
        "dec_bits",
        F.round(
            F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 6
        ).alias("feat_sum_r"),
    )


def _sql_le32(expr: str) -> str:
    """DuckDB hex string of ``expr`` as 4 little-endian bytes."""
    e = f"({expr})::BIGINT"
    return (
        "format('{:02x}{:02x}{:02x}{:02x}', "
        f"{e} % 256, ({e} // 256) % 256, ({e} // 65536) % 256,"
        f" ({e} // 16777216) % 256)"
    )


def _sql_be32(expr: str) -> str:
    """DuckDB hex string of ``expr`` as 4 big-endian bytes."""
    e = f"({expr})::BIGINT"
    return (
        "format('{:02x}{:02x}{:02x}{:02x}', "
        f"({e} // 16777216) % 256, ({e} // 65536) % 256, ({e} // 256) % 256,"
        f" {e} % 256)"
    )


def _sql_le16(expr: str) -> str:
    """DuckDB hex string of ``expr`` as 2 little-endian bytes."""
    e = f"({expr})::BIGINT"
    return f"format('{{:02x}}{{:02x}}', {e} % 256, ({e} // 256) % 256)"


def _sql_blob_byte(blob: str, off: int) -> str:
    """DuckDB int value of the byte at 0-based ``off`` in a blob."""
    return f"('0x' || substr(hex({blob}), {2 * off + 1}, 2))::INTEGER"


def _sql_blob_le32(blob: str, off: int) -> str:
    """DuckDB int of the little-endian u32 at 0-based ``off`` in a blob."""
    return " + ".join(
        f"{_sql_blob_byte(blob, off + b)} * {256 ** b}" for b in range(4)
    )


def _sql_blob_be32(blob: str, off: int) -> str:
    """DuckDB int of the big-endian u32 at 0-based ``off`` in a blob."""
    return " + ".join(
        f"{_sql_blob_byte(blob, off + b)} * {256 ** (3 - b)}" for b in range(4)
    )


def _sql_blob_le16(blob: str, off: int) -> str:
    """DuckDB int of the little-endian u16 at 0-based ``off`` in a blob."""
    return (
        f"{_sql_blob_byte(blob, off)} + {_sql_blob_byte(blob, off + 1)} * 256"
    )


def _sql_blob_be16(blob: str, off: int) -> str:
    """DuckDB int of the big-endian u16 at 0-based ``off`` in a blob."""
    return (
        f"{_sql_blob_byte(blob, off)} * 256 + {_sql_blob_byte(blob, off + 1)}"
    )


def _sql_be16(expr: str) -> str:
    """DuckDB hex string of ``expr`` as 2 big-endian bytes."""
    e = f"({expr})::BIGINT"
    return f"format('{{:02x}}{{:02x}}', ({e} // 256) % 256, {e} % 256)"


def _sql_media_features() -> str:
    """DuckDB twin of q_media_features.

    Image/WAV rows: the payload blob is reconstructed with the same
    hex-literal recipe as media_table (BMP: full 54-byte header + zeroed
    padded pixel rows; PNG: signature + IHDR + text body; WAV: 44-byte
    RIFF/fmt/data header + text body), then dec_width/height/channels
    (resp. dec_channels/sample_rate/bits) are parsed back by SLICING THE
    BLOB's header bytes — an independent implementation of the same header
    layout the Python struct decoder reads. Stub rows: the digest repeats
    (h*2)[:64], so features
    8..15 equal features 0..7; the fold order (f0..f7, f0..f7) mirrors
    Spark's left-to-right ``F.aggregate``."""
    terms = []
    for i in range(8):
        j = 4 * i
        le_hex = " || ".join(
            f"substr(payload_sha256, {2 * (j + b) + 1}, 2)" for b in (3, 2, 1, 0)
        )
        terms.append(
            f"((('0x' || {le_hex})::BIGINT % 10000) / 10000.0)::FLOAT::DOUBLE"
        )
    stub_fold = " + ".join(["0.0"] + terms + terms)
    bmp_hex = (
        f"'424d' || {_sql_le32('psz + 54')} || '00000000' || '36000000'"
        f" || '28000000' || {_sql_le32('w')} || {_sql_le32('h')}"
        " || '0100' || '1800' || '00000000'"
        f" || {_sql_le32('psz')} || '130b0000130b0000'"
        " || '0000000000000000' || repeat('00', psz)"
    )
    png_hex = (
        "'89504e470d0a1a0a' || '0000000d' || '49484452'"
        f" || {_sql_be32('w')} || {_sql_be32('h')}"
        " || '08' || '02' || '000000' || '00000000'"
    )
    wav_hex = (
        f"'52494646' || {_sql_le32('dsz + 36')} || '57415645' || '666d7420'"
        f" || '10000000' || '0100' || {_sql_le16('wc')} || {_sql_le32('wsr')}"
        f" || {_sql_le32('wsr * wc * 2')} || {_sql_le16('wc * 2')}"
        f" || '1000' || '64617461' || {_sql_le32('dsz')}"
    )
    # JPEG twin: same SOI + APP0 + SOF layout as media_table. The Python
    # decoder walks the marker chain generically; the SQL twin exploits
    # that the synthesized chain puts SOF at byte 20 (SOI=2 + APP0=18),
    # so the frame header fields sit at fixed offsets 25/27/29 — a
    # deterministic precomputation of the scan, per the fixed APP0 length.
    jpeg_hex = (
        "'ffd8' || 'ffe000104a46494600010100000100010000' || sofm"
        f" || {_sql_be16('8 + jc * 3')} || '08'"
        f" || {_sql_be16('h')} || {_sql_be16('w')}"
        " || format('{:02x}', jc)"
        " || CASE WHEN jc = 3 THEN '012200021101031101' ELSE '011100' END"
    )
    return f"""
WITH dims AS (
  SELECT doc_id, text,
         ({sql_hash32("doc_id::VARCHAR || 'w'")} % {MAX_DIM} + 1) AS w,
         ({sql_hash32("doc_id::VARCHAR || 'h'")} % {MAX_DIM} + 1) AS h,
         ({sql_hash32("doc_id::VARCHAR || 'c'")} % 2 + 1) AS wc,
         (({sql_hash32("doc_id::VARCHAR || 'r'")} % 5 + 1) * 8000) AS wsr,
         (CASE WHEN {sql_hash32("doc_id::VARCHAR || 'jc'")} % 2 = 0
               THEN 3 ELSE 1 END) AS jc,
         (CASE WHEN {sql_hash32("doc_id::VARCHAR || 'jp'")} % 2 = 0
               THEN 'ffc0' ELSE 'ffc2' END) AS sofm,
         octet_length(encode(text)) AS dsz
  FROM documents
),
geo AS (SELECT *, ((w * 3 + 3) // 4) * 4 * h AS psz FROM dims),
blobs AS (
  SELECT doc_id, text, w, h,
         CASE WHEN doc_id % 6 = 0 THEN unhex({bmp_hex})
              WHEN doc_id % 6 = 3 AND (doc_id // 6) % 2 = 0
                THEN unhex({png_hex}) || encode(text)
              WHEN doc_id % 6 = 3 THEN unhex({jpeg_hex}) || encode(text)
              WHEN doc_id % 6 = 1 THEN unhex({wav_hex}) || encode(text)
              ELSE ('IMG0' || text)::BLOB END AS payload
  FROM geo
),
m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         octet_length(payload)::INTEGER AS n_bytes,
         sha256(hex(payload)) AS payload_sha256,
         CASE WHEN doc_id % 6 = 0 THEN {_sql_blob_le32('payload', 18)}
              WHEN doc_id % 6 = 3 AND (doc_id // 6) % 2 = 0
                THEN {_sql_blob_be32('payload', 16)}
              WHEN doc_id % 6 = 3 THEN {_sql_blob_be16('payload', 27)}
              END::INTEGER AS dec_width,
         CASE WHEN doc_id % 6 = 0 THEN {_sql_blob_le32('payload', 22)}
              WHEN doc_id % 6 = 3 AND (doc_id // 6) % 2 = 0
                THEN {_sql_blob_be32('payload', 20)}
              WHEN doc_id % 6 = 3 THEN {_sql_blob_be16('payload', 25)}
              END::INTEGER AS dec_height,
         CASE WHEN doc_id % 6 = 0 THEN {_sql_blob_byte('payload', 28)} // 8
              WHEN doc_id % 6 = 3 AND (doc_id // 6) % 2 = 0 THEN 3
              WHEN doc_id % 6 = 3 THEN {_sql_blob_byte('payload', 29)}
              WHEN doc_id % 6 = 1 THEN {_sql_blob_le16('payload', 22)}
              END::INTEGER AS dec_channels,
         CASE WHEN doc_id % 6 = 1 THEN {_sql_blob_le32('payload', 24)}
              END::INTEGER AS dec_sample_rate,
         CASE WHEN doc_id % 6 = 1 THEN {_sql_blob_le16('payload', 34)}
              END::INTEGER AS dec_bits
  FROM blobs
)
SELECT doc_id, media_type, n_bytes, payload_sha256,
       dec_width, dec_height, dec_channels, dec_sample_rate, dec_bits,
       round(CASE WHEN doc_id % 3 = 0
                  THEN (dec_width + dec_height + dec_channels)::DOUBLE
                  WHEN doc_id % 6 = 1
                  THEN (dec_channels + dec_sample_rate + dec_bits)::DOUBLE
                  ELSE {stub_fold} END, 6) AS feat_sum_r
FROM m
"""


SQL_MEDIA_FEATURES = _sql_media_features()
