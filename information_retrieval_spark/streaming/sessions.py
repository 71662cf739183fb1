"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The batch twin is ``ops/events.q_sessionize`` (30-min inactivity gap); the
streaming version keeps one state blob per user — (open-session start,
last event ts, event count, sessions closed so far) — and EMITS a session
row the moment an arriving event's gap closes it. The per-user session_id
is the running closed-session ordinal, identical to the batch plan's
windowed ``sum(new_session)`` numbering when events arrive in ts order per
user (the file-stream test feeds ordered batches; out-of-order arrivals
within a micro-batch are sorted before folding).

Closing the LAST session of a user needs an end-of-input signal: in
production that is an event-time timeout against the watermark
(``GroupStateTimeout.EventTimeTimeout``); the drain-equivalence test uses
the simpler deterministic device of a far-future flush sentinel per user,
which closes every real session and leaves only the sentinel's own session
open (never emitted).

Scale notes: state is O(active users) × a few scalars, partitioned by
user_id — the canonical keyed-state shape; each micro-batch shuffles only
its own events on user_id.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import SparkSession, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from information_retrieval_spark.ops.events import SESSION_GAP_S
from information_retrieval_spark.streaming.windows import EVENTS_SCHEMA

SESSIONS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("start_s", T.LongType(), False),
        T.StructField("end_s", T.LongType(), False),
    ]
)

# state: (open_start_s, last_s, n_events, closed_count)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("open_start_s", T.LongType(), True),
        T.StructField("last_s", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("closed", T.LongType(), True),
    ]
)


def _load(state: GroupState):
    if state.exists:
        return state.get
    return None, None, 0, 0


def _fold(user_id, pdfs, open_start, last, n_ev, closed, out):
    """Shared gap fold: consume the batch's events in ts order, appending
    closed sessions to ``out``; returns the updated state tuple.

    ``applyInPandasWithState`` delivers a group's micro-batch as MULTIPLE
    Arrow chunks (≤ ~10k rows each), so all chunks are materialized and
    sorted TOGETHER — a per-chunk sort would fold events out of ts order
    across chunk boundaries, splitting/numbering sessions differently
    from the batch twin. A single user's per-batch events are bounded, so
    the concat is small; state stays O(1) per user."""
    ts_all = sorted(
        int(v)
        for pdf in pdfs
        for v in (pdf["ts"].astype("int64") // 10**9)
    )
    for t in ts_all:
        if open_start is None:
            open_start, last, n_ev = t, t, 1
            continue
        if t - last > SESSION_GAP_S:
            closed += 1
            out.append((user_id, closed, n_ev, open_start, last))
            open_start, last, n_ev = t, t, 1
        else:
            last = t
            n_ev += 1
    return open_start, last, n_ev, closed


def _emit(out) -> pd.DataFrame:
    return pd.DataFrame(
        out, columns=[f.name for f in SESSIONS_SCHEMA.fields]
    ).astype("int64")


def _fold_sessions(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    open_start, last, n_ev, closed = _load(state)
    out = []
    open_start, last, n_ev, closed = _fold(
        user_id, pdfs, open_start, last, n_ev, closed, out
    )
    state.update((open_start, last, n_ev, closed))
    yield _emit(out)


def _make_event_time_fold(state_ttl_s: int | None):
    """EventTimeTimeout fold: the open session also closes when the
    WATERMARK passes its last event + gap — no sentinel needed; this is
    the production end-of-session signal.

    After a timeout closes the session, the state (with no open session)
    is KEPT so a returning user's session numbering continues where it
    left off, matching the batch twin's running ordinal. Without a TTL
    that residual is one tuple per ever-seen user — unbounded over an
    unbounded key space. ``state_ttl_s`` bounds it: the close re-arms the
    timer at watermark + TTL, and a second fire with nothing open REMOVES
    the state. Documented divergence: a user idle longer than the TTL
    restarts numbering at 1 (state is O(users active within TTL))."""

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            open_start, last, n_ev, closed = _load(state)
            out = []
            if open_start is not None:
                closed += 1
                out.append((user_id, closed, n_ev, open_start, last))
                state.update((None, None, 0, closed))
                if state_ttl_s is not None:
                    # purge timer: if the user stays idle past the TTL,
                    # the next fire finds nothing open and drops the state
                    state.setTimeoutTimestamp(
                        state.getCurrentWatermarkMs() + state_ttl_s * 1000
                    )
            else:
                state.remove()  # the purge timer fired: user idle > TTL
            yield _emit(out)
            return
        open_start, last, n_ev, closed = _load(state)
        out = []
        open_start, last, n_ev, closed = _fold(
            user_id, pdfs, open_start, last, n_ev, closed, out
        )
        state.update((open_start, last, n_ev, closed))
        if last is not None:
            # fire when the event-time watermark passes the gap after the
            # open session's last event; clamped above the CURRENT
            # watermark — an event already older than (watermark − gap)
            # would otherwise set a timestamp in the past, which Spark
            # rejects and fails the query
            fire_ms = (last + SESSION_GAP_S + 1) * 1000
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(fire_ms, wm_ms + 1))
        yield _emit(out)

    return fold


_fold_sessions_event_time = _make_event_time_fold(None)


def sessionize_stream_event_time(
    spark: SparkSession,
    watch_dir: str,
    files_per_trigger: int | None = 1,
    watermark: str = "0 seconds",
    state_ttl_s: int | None = None,
):
    """readStream → watermark → stateful fold with EventTimeTimeout:
    sessions close either by an arriving event's gap or by the watermark
    overtaking the open session — the production path (the NoTimeout
    variant needs an explicit flush signal). ``state_ttl_s`` purges the
    per-user residual state after that much idle event-time (bounding
    state to users active within the TTL, at the documented cost of
    session numbering restarting for longer-idle users)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(files_per_trigger))
    stream = reader.parquet(watch_dir)
    return (
        stream.select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_event_time_fold(state_ttl_s),
            outputStructType=SESSIONS_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_stream(
    spark: SparkSession, watch_dir: str, files_per_trigger: int | None = 1
):
    """readStream → per-user stateful fold → closed-session rows.
    ``files_per_trigger=1`` (default) processes one file per micro-batch so
    state genuinely carries across batches (tests feed time-ordered
    files); None lets availableNow drain everything in one batch."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(files_per_trigger))
    stream = reader.parquet(watch_dir)
    return (
        stream.select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _fold_sessions,
            outputStructType=SESSIONS_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def drain_sessions(
    spark: SparkSession,
    watch_dir: str,
    checkpoint_dir: str,
    table: str = "stream_sessions",
):
    """Drain all available files; returns the emitted closed sessions."""
    q = (
        sessionize_stream(spark, watch_dir)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table)
