"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED (no image/audio libs in this container):
``decode_image_stub`` produces a deterministic fake feature vector from the
bytes. Everything AROUND the stub is real and tested — schema, batch shape,
partitioning, UDF signature — so swapping in a real decoder (PIL/ffmpeg) is
a one-function change.

Synthesis: the testdata has no binary tables, so ``media_table`` derives a
deterministic media table from ``documents`` (payload = utf-8 bytes of the
text + an md5 "magic" header; width/height from the portable hash). This is
the pattern a 100 TB image corpus uses: payloads stay opaque bytes end to
end, metadata columns are queryable/prunable, and per-batch vectorized
processing never holds more than one Arrow batch of payloads in memory.

Scale notes: feature extraction is map-only (no shuffle); frame sampling /
resize parallelize per-row. Partition sizing is governed by
``spark.sql.files.maxPartitionBytes`` against payload size, NOT row count —
documented in the README's deployment section.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

FEATURE_DIM = 16

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
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table derived from documents: payload =
    b'IMG0' + utf8(text); dims from the doc hash. Binary column stays
    JVM-side until the decode UDF."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        (F.pmod(F.xxhash64("doc_id"), F.lit(1024)) + 64).cast("int").alias("width"),
        (F.pmod(F.xxhash64("doc_id", "text"), F.lit(768)) + 64)
        .cast("int")
        .alias("height"),
        F.concat(
            F.lit(b"IMG0"), F.encode(F.col("text"), "utf-8")
        ).alias("payload"),
    )


def decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB decoder: real pipelines call PIL/torchvision here.

    Deterministic fake: FEATURE_DIM floats derived from the sha256 of the
    payload, scaled to [0, 1). Raises on a malformed header exactly like a
    real decoder would.
    """
    if not payload.startswith(b"IMG0"):
        raise ValueError("bad magic: not a fake-image payload")
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4],
                        dtype=np.uint32)
    return (raw % 10_000).astype(np.float32) / 10_000.0


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    One ``mapInPandas`` pass: per batch, vectorized sha256 + stub decode;
    the payload column is DROPPED from the output (features tables must not
    carry the raw bytes forward — that's the 100 TB mistake)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].str.len().astype("int32"),
                    "payload_sha256": [
                        hashlib.sha256(p).hexdigest() for p in pdf["payload"]
                    ],
                    "features": feats,
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

    Value-checkable against DuckDB (SQL_MEDIA_FEATURES) because the stub
    decoder is a pure function of sha256(payload): the twin re-derives the
    16 float32 features from the hex digest (LE uint32 % 10000 / 10000,
    quantized ``::FLOAT`` — verified bit-identical to the numpy float32
    path for all 10k possible values) and folds them in the same order as
    ``F.aggregate``'s left fold. A real (non-stub) decoder would drop the
    oracle back to rows-only — the plumbing being checked here (schema,
    Arrow batching, payload drop) is decoder-independent."""
    feats = extract_features(media_table(spark, sf_dir))
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        "payload_sha256",
        F.round(
            F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 6
        ).alias("feat_sum_r"),
    )


def _sql_media_features() -> str:
    """DuckDB twin of q_media_features. The digest repeats (h*2)[:64], so
    features 8..15 equal features 0..7; the fold order (f0..f7, f0..f7)
    mirrors Spark's left-to-right ``F.aggregate``. Byte k of the digest is
    hex chars (2k+1, 2k+2); a LE uint32 at offset 4i reverses bytes
    4i+3..4i."""
    terms = []
    for i in range(8):
        j = 4 * i
        le_hex = " || ".join(
            f"substr(payload_sha256, {2 * (j + b) + 1}, 2)" for b in (3, 2, 1, 0)
        )
        terms.append(
            f"((('0x' || {le_hex})::BIGINT % 10000) / 10000.0)::FLOAT::DOUBLE"
        )
    fold = " + ".join(["0.0"] + terms + terms)
    return f"""
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         (4 + octet_length(encode(text)))::INTEGER AS n_bytes,
         sha256('IMG0' || text) AS payload_sha256
  FROM documents
)
SELECT doc_id, media_type, n_bytes, payload_sha256,
       round({fold}, 6) AS feat_sum_r
FROM m
"""


SQL_MEDIA_FEATURES = _sql_media_features()
