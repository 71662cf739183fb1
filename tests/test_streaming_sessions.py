"""Stateful streaming sessionization (applyInPandasWithState) must emit
exactly the batch sessionizer's sessions once every session is closed.

The stream is fed time-ordered parquet files one per micro-batch (state
carries open sessions across batches); a far-future flush sentinel per
user closes each user's final session (production uses an event-time
timeout instead — see module docstring)."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from information_retrieval_spark.ops.events import SESSION_GAP_S, q_sessionize
from information_retrieval_spark.streaming.sessions import drain_sessions

SF = "/root/testdata/sf0.001"


def test_streaming_sessions_match_batch(spark, tmp_path):
    events = pd.read_parquet(f"{SF}/events.parquet")
    # microsecond precision: Spark's parquet reader rejects ns INT64 here
    events["ts"] = pd.to_datetime(events["ts"]).astype("datetime64[us]")
    events = events.sort_values("ts").reset_index(drop=True)

    watch = tmp_path / "incoming"
    watch.mkdir()
    cut = len(events) // 2
    for i, part in enumerate((events.iloc[:cut], events.iloc[cut:])):
        pq.write_table(pa.Table.from_pandas(part), str(watch / f"p{i}.parquet"))
    flush_ts = events["ts"].max() + pd.Timedelta(seconds=10 * SESSION_GAP_S)
    sentinel = pd.DataFrame(
        {
            "event_id": -1,
            "ts": flush_ts,
            "user_id": sorted(events["user_id"].unique()),
            "event_type": "flush",
            "value": 0.0,
            "props": "{}",
        }
    )
    sentinel["ts"] = sentinel["ts"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(sentinel), str(watch / "p9.parquet"))

    got = {
        (r.user_id, r.session_id, r.n_events, r.start_s, r.end_s)
        for r in drain_sessions(
            spark, str(watch), str(tmp_path / "cp")
        ).collect()
    }
    want = {
        (r.user_id, r.session_id, r.n_events, r.start_s, r.end_s)
        for r in q_sessionize(spark, SF).collect()
    }
    assert len(got) == len(want)
    assert got == want


def test_event_time_timeout_closes_sessions(spark, tmp_path):
    """The EventTimeTimeout variant closes sessions when the watermark
    overtakes them — no flush sentinel. Feeding a far-future second file
    advances the watermark past every first-period session, so by drain
    end exactly those sessions have emitted (the far-future events' own
    sessions stay open)."""
    from information_retrieval_spark.streaming.sessions import (
        sessionize_stream_event_time,
    )

    events = pd.read_parquet(f"{SF}/events.parquet")
    events["ts"] = pd.to_datetime(events["ts"]).astype("datetime64[us]")
    events = events.sort_values("ts").reset_index(drop=True)
    watch = tmp_path / "incoming"
    watch.mkdir()
    pq.write_table(pa.Table.from_pandas(events), str(watch / "p0.parquet"))
    far = events.tail(len(events["user_id"].unique())).copy()
    far["ts"] = events["ts"].max() + pd.Timedelta(seconds=100 * SESSION_GAP_S)
    far["ts"] = far["ts"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(far), str(watch / "p1.parquet"))

    q = (
        sessionize_stream_event_time(spark, str(watch))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("et_sessions")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_id, r.n_events, r.start_s, r.end_s)
        for r in spark.table("et_sessions").collect()
    }
    want = {
        (r.user_id, r.session_id, r.n_events, r.start_s, r.end_s)
        for r in q_sessionize(spark, SF).collect()
    }
    # every real (first-period) session is closed by the watermark; the
    # far-future rows' own open sessions are the only thing missing
    assert got == want


def test_returning_user_keeps_session_numbering(spark, tmp_path):
    """After an EventTimeTimeout closes a user's session, the closed-
    session counter survives in state: the returning user's next session
    gets the NEXT ordinal (the batch twin's running numbering), not 1."""
    from information_retrieval_spark.streaming.sessions import (
        sessionize_stream_event_time,
    )

    base = pd.Timestamp("2026-01-01 00:00:00")

    def mk(path, ts_list):
        df = pd.DataFrame(
            {
                "event_id": range(len(ts_list)),
                "ts": pd.Series(ts_list).astype("datetime64[us]"),
                "user_id": 1,
                "event_type": "view",
                "value": 0.0,
                "props": "{}",
            }
        )
        pq.write_table(pa.Table.from_pandas(df), path)

    watch = tmp_path / "in"
    watch.mkdir()
    gap = pd.Timedelta(seconds=SESSION_GAP_S)
    mk(str(watch / "p0.parquet"), [base, base + pd.Timedelta(seconds=60)])
    mk(str(watch / "p1.parquet"), [base + 10 * gap])   # closes session 1
    mk(str(watch / "p2.parquet"), [base + 20 * gap])   # closes session 2

    q = (
        sessionize_stream_event_time(spark, str(watch))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ret_sessions")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.session_id, r.n_events)
        for r in spark.table("ret_sessions").collect()
    )
    assert got == [(1, 2), (2, 1)]


def test_state_ttl_purges_idle_users(spark, tmp_path):
    """With state_ttl_s, a user idle past the TTL has their residual
    state REMOVED (bounding state to TTL-active users); when they return,
    numbering restarts at 1 — the documented divergence from the
    keep-forever default (previous test)."""
    from information_retrieval_spark.streaming.sessions import (
        sessionize_stream_event_time,
    )

    base = pd.Timestamp("2026-01-01 00:00:00")
    gap = pd.Timedelta(seconds=SESSION_GAP_S)

    def mk(path, user_id, ts_list):
        df = pd.DataFrame(
            {
                "event_id": range(len(ts_list)),
                "ts": pd.Series(ts_list).astype("datetime64[us]"),
                "user_id": user_id,
                "event_type": "view",
                "value": 0.0,
                "props": "{}",
            }
        )
        pq.write_table(pa.Table.from_pandas(df), path)

    watch = tmp_path / "in"
    watch.mkdir()
    mk(str(watch / "p0.parquet"), 1, [base, base + pd.Timedelta(seconds=60)])
    # user 2 drives the watermark forward one file per micro-batch
    mk(str(watch / "p1.parquet"), 2, [base + 10 * gap])
    mk(str(watch / "p2.parquet"), 2, [base + 20 * gap])  # closes u1 s1
    mk(str(watch / "p3.parquet"), 2, [base + 30 * gap])  # purge fires (ttl=2gap)
    mk(str(watch / "p4.parquet"), 1, [base + 40 * gap])  # u1 returns
    mk(str(watch / "p5.parquet"), 2, [base + 50 * gap])
    mk(str(watch / "p6.parquet"), 2, [base + 60 * gap])  # closes u1 s2

    q = (
        sessionize_stream_event_time(
            spark, str(watch), state_ttl_s=2 * SESSION_GAP_S
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ttl_sessions")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    u1 = sorted(
        (r.session_id, r.n_events)
        for r in spark.table("ttl_sessions").collect()
        if r.user_id == 1
    )
    # both of user 1's sessions carry ordinal 1: the second one started
    # AFTER the purge, so numbering restarted (without TTL it would be 2,
    # as test_returning_user_keeps_session_numbering shows)
    assert u1 == [(1, 1), (1, 2)]


def test_fold_sorts_across_chunk_boundaries():
    """applyInPandasWithState delivers a group's micro-batch as multiple
    Arrow chunks; events out of ts order ACROSS chunks must still fold in
    global ts order (a per-chunk sort would split sessions differently
    from the batch twin)."""
    from information_retrieval_spark.streaming.sessions import _fold

    gap = SESSION_GAP_S

    def pdf(ts_seconds):
        return pd.DataFrame(
            {"ts": pd.to_datetime(pd.Series(ts_seconds), unit="s")}
        )

    # chunk 1 holds the LATER events; sorted globally these are one
    # contiguous session, but a per-chunk fold sees 100,101 then 0,1 and
    # fabricates a session break at the chunk boundary
    chunks = [pdf([100, 101]), pdf([0, 1])]
    out_chunked: list = []
    state_chunked = _fold(7, iter(chunks), None, None, 0, 0, out_chunked)

    out_single: list = []
    state_single = _fold(7, iter([pdf([0, 1, 100, 101])]),
                         None, None, 0, 0, out_single)
    assert out_chunked == out_single
    assert state_chunked == state_single

    # and a genuine gap across chunks still closes exactly one session
    chunks = [pdf([3 * gap, 3 * gap + 5]), pdf([0, 5])]
    out: list = []
    open_start, last, n_ev, closed = _fold(
        7, iter(chunks), None, None, 0, 0, out
    )
    assert out == [(7, 1, 2, 0, 5)]
    assert (open_start, last, n_ev, closed) == (3 * gap, 3 * gap + 5, 2, 1)
