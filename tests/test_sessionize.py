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


def test_sessionize_event_time_late_data(spark, tmp_path):
    """Replay with out-of-order data: a late event inside the watermark
    delay merges into (and backdates) its session; the session closes only
    when the WATERMARK passes end+gap — fully wall-clock independent.
    Three checkpointed availableNow runs emulate a resuming stream."""
    from language_detection_spark.streaming.sessionize import sessionize_event_time

    src = tmp_path / "ev_in"
    src.mkdir()
    out = str(tmp_path / "ev_out")
    ckpt = str(tmp_path / "ev_ckpt")
    schema = "user_id bigint, ts timestamp, value double"
    T0 = pd.Timestamp("2024-01-01 00:00:00")

    def write_batch(name, rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
        spark.createDataFrame(pdf, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    def run_once():
        events = spark.readStream.schema(schema).parquet(str(src))
        q = (
            sessionize_event_time(events, gap_seconds=1800,
                                  watermark="30 minutes")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # run 1: user 1 events at 00:00 and 00:05 (+ a watermark clock user)
    write_batch("b1", [
        (1, T0, 1.0),
        (1, T0 + pd.Timedelta(minutes=5), 1.0),
        (99, T0 + pd.Timedelta(minutes=20), 0.0),
    ])
    run_once()
    # run 2: OUT-OF-ORDER event at 00:02 (watermark so far < 00:02 → must
    # merge), plus a clock event pushing the watermark to 01:00
    write_batch("b2", [
        (1, T0 + pd.Timedelta(minutes=2), 1.0),
        (99, T0 + pd.Timedelta(minutes=90), 0.0),
    ])
    run_once()
    # run 3: clock tick so the 01:00 watermark is APPLIED to timeouts
    # (user 1 timeout = 00:05 + 30min = 00:35 < 01:00 → session closes)
    write_batch("b3", [(99, T0 + pd.Timedelta(minutes=95), 0.0)])
    run_once()

    got = spark.read.parquet(out).collect()
    closed = [r for r in got if r.user_id == 1 and r.status == "closed"]
    assert len(closed) == 1, f"rows: {sorted((r.user_id, r.status, r.n_events) for r in got)}"
    s = closed[0]
    # the late 00:02 event merged: 3 events, window [00:00, 00:05]
    assert s.n_events == 3
    assert s.total_value == pytest.approx(3.0)
    assert s.session_start == T0.to_pydatetime()
    assert s.session_end == (T0 + pd.Timedelta(minutes=5)).to_pydatetime()
    # open updates for user 1 never regressed the window
    opens = [r for r in got if r.user_id == 1 and r.status == "open"]
    assert opens and max(r.n_events for r in opens) == 3


def test_merge_gap_sessions_unit():
    """Pure interval-merge semantics: split on gaps >= gap, fuse under it,
    bridge when a middle event lands between two candidates."""
    from language_detection_spark.streaming.sessionize import _merge_gap_sessions

    g = 1000
    # two singletons exactly gap apart stay separate (strict <)
    assert _merge_gap_sessions([(0, 0, 1, 1.0), (1000, 1000, 1, 1.0)], g) == [
        (0, 0, 1, 1.0),
        (1000, 1000, 1, 1.0),
    ]
    # under the gap they fuse
    assert _merge_gap_sessions([(0, 0, 1, 1.0), (999, 999, 1, 2.0)], g) == [
        (0, 999, 2, 3.0)
    ]
    # a bridging event fuses two previously disjoint candidates
    assert _merge_gap_sessions(
        [(0, 0, 1, 1.0), (1500, 1500, 1, 1.0), (800, 800, 1, 1.0)], g
    ) == [(0, 1500, 3, 3.0)]


def test_sessionize_event_time_same_batch_gap_split(spark, tmp_path):
    """Two events of one user separated by more than the gap must become
    TWO sessions even when they arrive in the same micro-batch (the round-2
    implementation fused them — ADVICE regression)."""
    from language_detection_spark.streaming.sessionize import sessionize_event_time

    src = tmp_path / "gap_in"
    src.mkdir()
    out = str(tmp_path / "gap_out")
    ckpt = str(tmp_path / "gap_ckpt")
    schema = "user_id bigint, ts timestamp, value double"
    T0 = pd.Timestamp("2024-01-01 00:00:00")

    def run_once():
        q = (
            sessionize_event_time(
                spark.readStream.schema(schema).parquet(str(src)),
                gap_seconds=1800,
                watermark="30 minutes",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # ONE batch: user 1 at 00:00, 00:05 (session A) and 02:00, 02:03
    # (session B — 115 min after A's end, far beyond the 30-min gap)
    rows = [
        (1, T0, 1.0),
        (1, T0 + pd.Timedelta(minutes=5), 1.0),
        (1, T0 + pd.Timedelta(minutes=120), 1.0),
        (1, T0 + pd.Timedelta(minutes=123), 1.0),
    ]
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "value"]), schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    run_once()
    # clock ticks: push the watermark past B's end+gap (02:33)
    spark.createDataFrame(
        pd.DataFrame(
            [(99, T0 + pd.Timedelta(minutes=200), 0.0)],
            columns=["user_id", "ts", "value"],
        ),
        schema,
    ).coalesce(1).write.mode("append").parquet(str(src))
    run_once()
    spark.createDataFrame(
        pd.DataFrame(
            [(99, T0 + pd.Timedelta(minutes=205), 0.0)],
            columns=["user_id", "ts", "value"],
        ),
        schema,
    ).coalesce(1).write.mode("append").parquet(str(src))
    run_once()

    got = spark.read.parquet(out).collect()
    closed = sorted(
        ((r.session_start, r.session_end, r.n_events) for r in got
         if r.user_id == 1 and r.status == "closed")
    )
    A = (T0.to_pydatetime(), (T0 + pd.Timedelta(minutes=5)).to_pydatetime(), 2)
    B = (
        (T0 + pd.Timedelta(minutes=120)).to_pydatetime(),
        (T0 + pd.Timedelta(minutes=123)).to_pydatetime(),
        2,
    )
    assert closed == [A, B], f"closed sessions: {closed}"


def test_stream_sessions_reconcile_with_batch(spark, tmp_path):
    """Ground-truth check: the streaming operator's CLOSED sessions on a
    drained stream equal the batch gaps-and-islands sessionization
    (sessionize_batch) of the same events — same windows, counts, sums."""
    from language_detection_spark.streaming.sessionize import (
        sessionize_batch,
        sessionize_event_time,
    )

    import numpy as np

    rng = np.random.default_rng(11)
    T0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    for u in range(1, 9):
        t = 0.0
        for _ in range(40):
            # mix of intra-session steps and > gap jumps
            t += float(rng.choice([60, 300, 900, 4000, 8000]))
            rows.append((u, T0 + pd.Timedelta(seconds=t), float(u)))
    # sentinel user pushing the watermark far past every end+gap
    rows.append((99, T0 + pd.Timedelta(days=10), 0.0))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    schema = "user_id bigint, ts timestamp, value double"

    src = tmp_path / "rc_in"
    src.mkdir()
    spark.createDataFrame(pdf, schema).coalesce(1).write.mode("append").parquet(
        str(src)
    )
    out = str(tmp_path / "rc_out")
    for _ in range(2):  # second run lets timeouts fire on the final watermark
        q = (
            sessionize_event_time(
                spark.readStream.schema(schema).parquet(str(src)),
                gap_seconds=1800,
                watermark="30 minutes",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "rc_ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events,
         round(r.total_value, 6))
        for r in spark.read.parquet(out).collect()
        if r.status == "closed" and r.user_id != 99
    }
    events = spark.createDataFrame(pdf, schema).filter("user_id != 99")
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events,
         round(r.total_value, 6))
        for r in sessionize_batch(events, gap_seconds=1800).collect()
    }
    assert got == want, (
        f"stream-only: {sorted(got - want)[:3]} "
        f"batch-only: {sorted(want - got)[:3]}"
    )
    assert len(want) > 50  # the mix actually produced many sessions


def test_sessionize_rocksdb_state_store(spark, tmp_path):
    """The production state backend: RocksDB state store (bounded executor
    memory for huge key cardinalities — the 10^12-doc shape) runs the same
    event-time sessionization unchanged."""
    from language_detection_spark.streaming.sessionize import sessionize_event_time

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = tmp_path / "rdb_in"
        src.mkdir()
        schema = "user_id bigint, ts timestamp, value double"
        T0 = pd.Timestamp("2024-01-01 00:00:00")
        rows = [(1, T0, 1.0), (1, T0 + pd.Timedelta(minutes=5), 1.0),
                (99, T0 + pd.Timedelta(minutes=90), 0.0)]
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["user_id", "ts", "value"]), schema
        ).coalesce(1).write.mode("append").parquet(str(src))
        out = str(tmp_path / "rdb_out")
        q = (
            sessionize_event_time(
                spark.readStream.schema(schema).parquet(str(src)),
                gap_seconds=1800, watermark="30 minutes",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "rdb_ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        # second batch advances the watermark past user 1's end+gap
        spark.createDataFrame(
            pd.DataFrame([(99, T0 + pd.Timedelta(minutes=95), 0.0)],
                         columns=["user_id", "ts", "value"]), schema
        ).coalesce(1).write.mode("append").parquet(str(src))
        q = (
            sessionize_event_time(
                spark.readStream.schema(schema).parquet(str(src)),
                gap_seconds=1800, watermark="30 minutes",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "rdb_ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = spark.read.parquet(out).collect()
        closed = [r for r in got if r.user_id == 1 and r.status == "closed"]
        assert len(closed) == 1 and closed[0].n_events == 2
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
