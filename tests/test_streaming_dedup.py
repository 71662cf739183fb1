"""Streaming exact dedup: first-seen-wins across micro-batches (state
survives a drain/restart via the checkpoint), and bounded-state
dedup-within-watermark evicts old digests."""

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(path, rows):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            }
        ),
        path,
    )


TS = dt.datetime(2026, 1, 1, 10, 0, 0)


def test_streaming_dedup_first_seen_wins_across_batches(spark, tmp_path):
    from information_retrieval_spark.streaming.dedup import (
        dedup_stream,
        drain_to_memory,
    )

    watch = tmp_path / "in"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    watch.mkdir()

    # batch 1: ten unique docs
    b1 = [(i, f"text number {i}", TS) for i in range(10)]
    _write_docs(str(watch / "b1.parquet"), b1)
    stream = dedup_stream(spark, str(watch))
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got1 = {(r.doc_id, r.text) for r in spark.read.parquet(out).collect()}
    assert got1 == set((i, t) for i, t, _ in b1)

    # batch 2: five exact dups of batch 1 + five new docs; the restart
    # reloads digest state from the checkpoint, so the dups are dropped
    b2 = [(10 + i, f"text number {i}", TS) for i in range(5)] + [
        (15 + i, f"fresh text {i}", TS) for i in range(5)
    ]
    _write_docs(str(watch / "b2.parquet"), b2)
    stream = dedup_stream(spark, str(watch))
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got2 = {(r.doc_id, r.text) for r in spark.read.parquet(out).collect()}
    assert got2 == got1 | {(15 + i, f"fresh text {i}") for i in range(5)}


def test_streaming_dedup_within_watermark_evicts_old_state(spark, tmp_path):
    from information_retrieval_spark.streaming.dedup import (
        dedup_stream_within_watermark,
    )

    watch = tmp_path / "in"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    watch.mkdir()

    def drain():
        q = (
            dedup_stream_within_watermark(spark, str(watch), "2 hours")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {(r.doc_id, r.text) for r in spark.read.parquet(out).collect()}

    _write_docs(str(watch / "b1.parquet"), [(0, "alpha", TS), (1, "beta", TS)])
    got = drain()
    assert got == {(0, "alpha"), (1, "beta")}

    # inside the horizon (+1h): duplicate suppressed
    _write_docs(
        str(watch / "b2.parquet"),
        [(2, "beta", TS + dt.timedelta(hours=1))],
    )
    got = drain()
    assert got == {(0, "alpha"), (1, "beta")}

    # advance the watermark past alpha's state expiry (first-seen 10:00 +
    # 2h horizon = 12:00): a fresh doc at 14:30 moves the watermark to
    # 12:30, evicting alpha's digest; a far-apart alpha duplicate then
    # legitimately reappears — the documented bounded-state trade
    _write_docs(
        str(watch / "b3.parquet"),
        [(9, "gamma", TS + dt.timedelta(hours=4, minutes=30))],
    )
    got = drain()
    assert got == {(0, "alpha"), (1, "beta"), (9, "gamma")}
    _write_docs(
        str(watch / "b4.parquet"),
        [(3, "alpha", TS + dt.timedelta(hours=5))],
    )
    got = drain()
    assert got == {(0, "alpha"), (1, "beta"), (9, "gamma"), (3, "alpha")}
