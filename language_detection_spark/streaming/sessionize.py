"""Custom stateful streaming operator: user sessionization over the events
stream via ``applyInPandasWithState`` (the SURVEY §2 "custom operators"
path (b): semantics Spark's built-ins can't express — gap-based session
windows with per-key mutable state).

A session = consecutive events of one user with gaps < ``gap``.  Two
variants:

* ``sessionize`` — processing-time timeout: a session closes when the gap
  elapses on the wall clock (simple file-replay testing; no late-data
  semantics).
* ``sessionize_event_time`` — watermark + event-time timeout: a session
  closes when the WATERMARK passes session_end + gap, so out-of-order
  events within the watermark delay still merge into their session, and
  events older than the watermark are dropped by Spark before the
  operator.  This is the production shape for late data.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
        StructField("total_value", DoubleType()),
        StructField("status", StringType()),  # open | closed
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("n_events", IntegerType()),
        StructField("total_value", DoubleType()),
    ]
)


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """events(ts, user_id, value, ...) stream → session rows.

    Emits an updated (open) session row per batch; a closed row when the
    gap passes with no new events (state timeout).
    """
    gap_ms = gap_seconds * 1000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_ms, end_ms, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(end_ms, unit="ms")],
                    "n_events": [n],
                    "total_value": [total],
                    "status": ["closed"],
                }
            )
            return
        rows = pd.concat(list(pdfs))
        ts_ms = (rows["ts"].astype("int64") // 1_000_000).to_numpy()
        n_new = len(rows)
        v_new = float(rows["value"].sum())
        if state.exists:
            start_ms, end_ms, n, total = state.get
            start_ms = min(start_ms, int(ts_ms.min()))
            end_ms = max(end_ms, int(ts_ms.max()))
            n += n_new
            total += v_new
        else:
            start_ms, end_ms = int(ts_ms.min()), int(ts_ms.max())
            n, total = n_new, v_new
        state.update((start_ms, end_ms, n, total))
        state.setTimeoutDuration(gap_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_ms, unit="ms")],
                "session_end": [pd.Timestamp(end_ms, unit="ms")],
                "n_events": [n],
                "total_value": [total],
                "status": ["open"],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def sessionize_event_time(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time sessionization: sessions close when the watermark passes
    ``session_end + gap`` — wall-clock-independent and deterministic under
    replay.  Late events within the watermark delay merge into their
    session (possibly extending it backwards); older ones are dropped by
    the watermark before reaching the operator."""
    gap_ms = gap_seconds * 1000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_ms, end_ms, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(end_ms, unit="ms")],
                    "n_events": [n],
                    "total_value": [total],
                    "status": ["closed"],
                }
            )
            return
        rows = pd.concat(list(pdfs))
        ts_ms = (rows[ts_col].astype("int64") // 1_000_000).to_numpy()
        n_new = len(rows)
        v_new = float(rows["value"].sum())
        if state.exists:
            start_ms, end_ms, n, total = state.get
            start_ms = min(start_ms, int(ts_ms.min()))
            end_ms = max(end_ms, int(ts_ms.max()))
            n += n_new
            total += v_new
        else:
            start_ms, end_ms = int(ts_ms.min()), int(ts_ms.max())
            n, total = n_new, v_new
        state.update((start_ms, end_ms, n, total))
        # close when the WATERMARK (not the wall clock) passes end + gap;
        # must stay ahead of the current watermark or Spark rejects it
        timeout_ms = max(
            end_ms + gap_ms, state.getCurrentWatermarkMs() + 1
        )
        state.setTimeoutTimestamp(timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_ms, unit="ms")],
                "session_end": [pd.Timestamp(end_ms, unit="ms")],
                "n_events": [n],
                "total_value": [total],
                "status": ["open"],
            }
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
