"""Custom stateful streaming operator: user sessionization over the events
stream via ``applyInPandasWithState`` (the SURVEY §2 "custom operators"
path (b): semantics Spark's built-ins can't express — gap-based session
windows with per-key mutable state).

A session = consecutive events of one user with gaps < ``gap``.  Two
variants:

* ``sessionize`` — processing-time timeout: the gap is measured on the
  WALL CLOCK (a session closes when no event arrives for ``gap`` of real
  time; event timestamps only set the session window bounds).  Simple
  file-replay testing; no late-data semantics.
* ``sessionize_event_time`` — watermark + event-time timeout: the gap is
  measured in EVENT TIME.  State holds a list of disjoint candidate
  sessions per user; incoming events merge interval-style (splitting on
  event-time gaps > ``gap``, so two events of one user separated by more
  than the gap are never fused even when they land in the same
  micro-batch), and a session closes only when the WATERMARK passes
  session_end + gap — at that point no admissible event can bridge it,
  so the closed output is deterministic under replay regardless of batch
  boundaries.  Out-of-order events within the watermark delay still merge
  into (and may backdate or bridge) their session; older ones are dropped
  by the watermark before reaching the operator.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
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

# Event-time variant: a LIST of disjoint candidate sessions per user
# (parallel arrays, sorted by start_ms) — required for correctness, since a
# user's events more than ``gap`` apart must stay separate sessions even when
# they arrive in one micro-batch, and the earlier one cannot close until the
# watermark passes its end+gap (a late event could still bridge it).
MULTI_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", ArrayType(LongType())),
        StructField("end_ms", ArrayType(LongType())),
        StructField("n_events", ArrayType(IntegerType())),
        StructField("total_value", ArrayType(DoubleType())),
    ]
)


def _merge_gap_sessions(sessions: list, gap_ms: int) -> list:
    """Merge (start, end, n, total) interval summaries: sort by start and
    fuse neighbours whose event-time gap is < gap_ms (sessions = maximal
    runs with gaps strictly under the gap; an event at exactly end+gap
    starts a new session, consistent with the close-at-watermark>=end+gap
    rule).  Pure function — unit-testable without Spark."""
    sessions = sorted(sessions, key=lambda s: (s[0], s[1]))
    merged: list = []
    for s in sessions:
        if merged and s[0] < merged[-1][1] + gap_ms:
            p = merged[-1]
            merged[-1] = (
                min(p[0], s[0]),
                max(p[1], s[1]),
                p[2] + s[2],
                p[3] + s[3],
            )
        else:
            merged.append(tuple(s))
    return merged


def sessionize_batch(
    events: DataFrame, gap_seconds: int = 1800, ts_col: str = "ts"
) -> DataFrame:
    """BATCH twin of the streaming sessionization: gaps-and-islands over a
    static events table with the SAME session semantics (a session =
    maximal run of one user's events with event-time gaps strictly under
    ``gap``).  Pure DataFrame ops — per-user lag + running sum of
    gap-break flags — so Catalyst plans it as two window passes over one
    hash-partition-by-user_id exchange; no Python.

    Used (a) as the independently-oracled surface for the session
    semantics (driver query ``event_sessions`` re-derives it in DuckDB),
    and (b) to reconcile the streaming operator's closed sessions against
    a batch ground truth on the same input (tests)."""
    from pyspark.sql.window import Window

    gap_ms = gap_seconds * 1000
    # cast through TIMESTAMP for NTZ inputs (parquet writes TIMESTAMP_NTZ);
    # unix_millis is exact where double-seconds arithmetic could round
    ts_ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(ts_col)
    with_break = events.withColumn("_ts_ms", ts_ms).withColumn(
        "_new",
        (
            F.col("_ts_ms") - F.lag("_ts_ms").over(w) >= F.lit(gap_ms)
        ).cast("int"),
    )
    numbered = with_break.withColumn(
        "session_no", F.sum(F.coalesce(F.col("_new"), F.lit(0))).over(w)
    )
    return (
        numbered.groupBy("user_id", "session_no")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).cast("int").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .drop("session_no")
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
    session (possibly extending it backwards or bridging two candidates);
    older ones are dropped by the watermark before reaching the operator.
    Events of one user separated by more than the gap stay separate
    sessions even inside a single micro-batch (state holds a LIST of
    disjoint candidates; only watermark passage closes one)."""
    gap_ms = gap_seconds * 1000

    def _emit(user_id, sessions, status):
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(sessions),
                "session_start": [
                    pd.Timestamp(s[0], unit="ms") for s in sessions
                ],
                "session_end": [pd.Timestamp(s[1], unit="ms") for s in sessions],
                "n_events": [s[2] for s in sessions],
                "total_value": [s[3] for s in sessions],
                "status": [status] * len(sessions),
            }
        )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        sessions: list = []
        if state.exists:
            starts, ends, ns, totals = state.get
            sessions = list(zip(starts, ends, ns, totals))
        fresh = False
        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs))
            if len(rows):
                fresh = True
                ts_ms = (rows[ts_col].astype("int64") // 1_000_000).to_numpy()
                vals = rows["value"].to_numpy()
                sessions.extend(
                    (int(t), int(t), 1, float(v)) for t, v in zip(ts_ms, vals)
                )
        sessions = _merge_gap_sessions(sessions, gap_ms)
        wm = state.getCurrentWatermarkMs()
        # a session is definitively closed once the watermark passes
        # end+gap: any event that could bridge it has ts < end+gap <= wm
        # and is already dropped by the watermark
        closed = [s for s in sessions if s[1] + gap_ms <= wm]
        open_ = [s for s in sessions if s[1] + gap_ms > wm]
        if closed:
            yield _emit(user_id, closed, "closed")
        if open_:
            state.update(
                (
                    [s[0] for s in open_],
                    [s[1] for s in open_],
                    [s[2] for s in open_],
                    [s[3] for s in open_],
                )
            )
            # wake when the watermark passes the EARLIEST candidate's
            # end+gap; must stay strictly ahead of the current watermark
            # or Spark rejects the timestamp
            timeout_ms = max(min(s[1] + gap_ms for s in open_), wm + 1)
            state.setTimeoutTimestamp(timeout_ms)
            if fresh:
                yield _emit(user_id, open_, "open")
        elif state.exists:
            state.remove()

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=MULTI_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
