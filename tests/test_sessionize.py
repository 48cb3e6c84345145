"""Stateful streaming sessionization (applyInPandasWithState) test.

Note: with ProcessingTimeTimeout, an availableNow query keeps scheduling
micro-batches so timeouts can fire — it does not self-terminate when the
source is drained.  The test therefore polls the sink for the expected
rows and stops the query explicitly (the production pattern is a
continuously-running stream anyway).
"""

import time

import pandas as pd
import pytest

from language_detection_spark.streaming.sessionize import sessionize


def test_sessionize_stream(spark, tmp_path):
    d = tmp_path / "events_in"
    d.mkdir()
    rows = []
    for u in (1, 2):
        for i in range(5):
            rows.append(
                (u, pd.Timestamp("2024-01-01 00:00:00") + pd.Timedelta(minutes=i), 1.0)
            )
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    sdf = spark.createDataFrame(pdf)
    sdf.write.mode("overwrite").parquet(str(d))

    events = spark.readStream.schema(sdf.schema).parquet(str(d))
    sessions = sessionize(events, gap_seconds=1)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        deadline = time.time() + 120
        got = []
        while time.time() < deadline:
            got = spark.sql("select * from sessions_out").collect()
            closed = [r for r in got if r.status == "closed"]
            if len(closed) == 2:
                break
            time.sleep(1)
    finally:
        q.stop()

    opened = {r.user_id: r for r in got if r.status == "open"}
    closed = {r.user_id: r for r in got if r.status == "closed"}
    assert set(opened) == {1, 2}
    assert set(closed) == {1, 2}
    for r in list(opened.values()) + list(closed.values()):
        assert r.n_events == 5
        assert r.total_value == pytest.approx(5.0)
        assert (r.session_end - r.session_start).total_seconds() == 240
