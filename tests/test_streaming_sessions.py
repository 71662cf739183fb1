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
