"""Streaming windowed aggregation with watermarked late-data handling.

The same tumbling-window count/sum as ``ops/events.q_event_windows``, but
over a file stream with a 2-hour watermark: late events inside the
watermark still update their window; events later than that are dropped —
standard Structured Streaming semantics. Complete-drain equivalence with
the batch plan is asserted in tests (with ``availableNow`` every event is
within the watermark, so stream == batch exactly).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F, types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

WATERMARK = "2 hours"
WINDOW = "1 hour"


def windowed_counts_stream(
    spark: SparkSession, watch_dir: str
):
    """readStream over parquet files → watermark → tumbling-window agg.
    Returns the (unstarted) streaming DataFrame."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(watch_dir)
    return (
        stream.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value_r"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_s"),
            "event_type",
            "n",
            "sum_value_r",
        )
    )


def drain_to_memory(spark: SparkSession, watch_dir: str, checkpoint_dir: str,
                    table: str = "stream_windows"):
    """Drain all available files into an in-memory sink table; returns the
    result DataFrame (complete output mode — final window states)."""
    q = (
        windowed_counts_stream(spark, watch_dir)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table)
