"""Watermarked streaming windowed aggregation == batch tumbling-window plan
after a complete drain (every event within the watermark)."""

import shutil

from information_retrieval_spark.ops.events import q_event_windows
from information_retrieval_spark.streaming.windows import drain_to_memory

SF = "/root/testdata/sf0.001"


def test_stream_windows_equal_batch(spark, tmp_path):
    watch = tmp_path / "ev"
    watch.mkdir()
    shutil.copy(f"{SF}/events.parquet", str(watch / "events.parquet"))
    got = {
        (r.window_s, r.event_type): (r.n, r.sum_value_r)
        for r in drain_to_memory(
            spark, str(watch), str(tmp_path / "cp"), table="tw_test"
        ).collect()
    }
    want = {
        (r.window_s, r.event_type): (r.n, r.sum_value_r)
        for r in q_event_windows(spark, SF).collect()
    }
    assert got == want
    assert len(want) > 10
