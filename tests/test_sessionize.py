"""Stateful streaming sessionization (applyInPandasWithState) test."""

import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from language_detection_spark.streaming.sessionize import sessionize


def test_sessionize_stream(spark, tmp_path):
    d = tmp_path / "events_in"
    d.mkdir()
    rows = []
    for u in (1, 2):
        for i in range(5):
            rows.append((u, pd.Timestamp("2024-01-01 00:00:00") + pd.Timedelta(minutes=i), 1.0))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    sdf = spark.createDataFrame(pdf)
    sdf.write.mode("overwrite").parquet(str(d))

    events = spark.readStream.schema(sdf.schema).parquet(str(d))
    sessions = sessionize(events, gap_seconds=1800)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select * from sessions_out").collect()
    by_user = {r.user_id: r for r in got if r.status == "open"}
    assert set(by_user) == {1, 2}
    for r in by_user.values():
        assert r.n_events == 5
        assert r.total_value == pytest.approx(5.0)
        assert (r.session_end - r.session_start).total_seconds() == 240
