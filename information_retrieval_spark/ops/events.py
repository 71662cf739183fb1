"""Event-stream analytics over the ``events`` table — windowed aggregation,
gap-based sessionization, JSON property extraction.

The reference engine has no time/JSON operators at all (SURVEY.md §2.8
"Absent"); these are beyond-reference capabilities a training-data /
telemetry pipeline needs, expressed as one declarative plan each with a
DuckDB twin. Timestamps cross the engine boundary as epoch seconds
(BIGINT) — never as formatted strings — so the value-hash compare is
timezone-proof (session TZ is pinned to UTC in ``session.get_spark``).

The streaming variant of the tumbling-window aggregation (same logical
query + watermark) lives in ``streaming/windows.py``; tests assert the
drained stream equals this batch plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

WINDOW = "1 hour"
SESSION_GAP_S = 30 * 60


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(window_s, event_type, n, sum_value_r): tumbling 1-hour windows.
    One partial+final hash agg; window start exported as epoch seconds."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value_r"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_s"),
            "event_type",
            "n",
            "sum_value_r",
        )
    )


SQL_EVENT_WINDOWS = """
SELECT epoch(time_bucket(INTERVAL '1 hour', ts))::BIGINT AS window_s,
       event_type, count(*) AS n, round(sum(value), 6) AS sum_value_r
FROM events GROUP BY 1, 2
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, session_id, n_events, start_s, end_s): gap-based sessions
    (30-min inactivity). lag → gap flag → running sum = session ordinal —
    the standard two-window sessionizer; shuffles once on user_id."""
    e = _events(spark, sf_dir).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    wu = Window.partitionBy("user_id").orderBy("ts")
    gapped = e.withColumn(
        "new_session",
        (
            F.coalesce(
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(wu)),
                F.lit(SESSION_GAP_S + 1),
            )
            > SESSION_GAP_S
        ).cast("int"),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(
            wu.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return gapped.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.unix_timestamp(F.min("ts")).alias("start_s"),
        F.unix_timestamp(F.max("ts")).alias("end_s"),
    )


SQL_SESSIONIZE = f"""
WITH gapped AS (
  SELECT user_id, ts,
    CASE WHEN coalesce(
           floor(epoch(ts))::BIGINT
           - floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)))::BIGINT,
           {SESSION_GAP_S + 1}) > {SESSION_GAP_S}
         THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts,
    sum(new_session) OVER (
      PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    )::BIGINT AS session_id
  FROM gapped
)
SELECT user_id, session_id, count(*) AS n_events,
       floor(epoch(min(ts)))::BIGINT AS start_s,
       floor(epoch(max(ts)))::BIGINT AS end_s
FROM sessions GROUP BY user_id, session_id
"""


def q_event_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n, avg_k_r): JSON property extraction + agg —
    ``get_json_object`` stays in whole-stage codegen (no UDF)."""
    e = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("double")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.avg(k), 6).alias("avg_k_r")
    )


SQL_EVENT_JSON = """
SELECT event_type, count(*) AS n,
       round(avg((props->>'$.k')::DOUBLE), 6) AS avg_k_r
FROM events GROUP BY event_type
"""
