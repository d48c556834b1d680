"""Event sessionization — batch (window functions) and streaming
(custom stateful operator via applyInPandasWithState).

Batch form: classic gap-based sessions with one shuffle — lag() marks
session starts, a running sum numbers sessions per user, one aggregate
summarizes. SQL-expressible, so it carries a DuckDB oracle
(__spark_entry__ `evt_sessions`).

Streaming form: per-user session state (start, end, count, sum) kept
in the state store; a session is emitted when the event-time watermark
passes its end + gap (EventTimeTimeout). This is the brief's "custom
stateful operator" slot: the grouping key partitions state across
executors, Arrow batches carry the per-group rows, and the watermark
bounds state size — the properties a 100 TB / unbounded stream needs.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)


def session_summaries(events: DataFrame, gap_minutes: int = 30,
                      user_col: str = "user_id", ts_col: str = "ts",
                      value_col: str = "value") -> DataFrame:
    """Batch gap-based sessionization: (user_id, session_start,
    session_end, n_events, total_value). One shuffle on the user key;
    both window functions reuse the same partitioning."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    # NTZ timestamps cannot cast to long directly; the session split
    # only uses DIFFERENCES, so the intermediate LTZ interpretation
    # cancels out regardless of session timezone
    secs = F.col(ts_col).cast("timestamp").cast("long")
    lag_secs = F.lag(F.col(ts_col)).over(w).cast("timestamp").cast("long")
    new_session = (secs - lag_secs > gap_minutes * 60).cast("int")
    numbered = events.withColumn(
        "__new", F.coalesce(new_session, F.lit(0))
    ).withColumn("__session", F.sum("__new").over(w))
    return (
        numbered.groupBy(
            F.col(user_col).alias("user_id"), F.col("__session")
        )
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("total_value"),
        )
        .drop("__session")
    )


def sessionize_stream(events: DataFrame, gap_minutes: int = 30,
                      watermark_delay: str = "0 seconds") -> DataFrame:
    """Streaming sessionization over an unbounded event stream:
    applyInPandasWithState keyed by user_id, EventTimeTimeout flushes a
    session once the watermark passes session_end + gap. Late events
    behind the watermark are dropped by the watermark operator before
    they reach state. Returns a session-summary stream
    (SESSION_SCHEMA)."""
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    gap_ms = gap_minutes * 60 * 1000

    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_ms, end_ms, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id,
                  pd.Timestamp(start_ms, unit="ms"),
                  pd.Timestamp(end_ms, unit="ms"),
                  n, round(total, 2))],
                columns=["user_id", "session_start", "session_end",
                         "n_events", "total_value"],
            )
            return
        rows = pd.concat(list(pdfs)).sort_values("ts")
        ts_sorted = (rows["ts"].astype("int64") // 1_000_000).tolist()
        vals = rows["value"].tolist()
        if state.exists:
            start_ms, end_ms, n, total = state.get
        else:
            start_ms, end_ms, n, total = ts_sorted[0], ts_sorted[0], 0, 0.0
        out = []
        for t, v in zip(ts_sorted, vals):
            if n > 0 and t - end_ms > gap_ms:
                out.append((user_id, pd.Timestamp(start_ms, unit="ms"),
                            pd.Timestamp(end_ms, unit="ms"), n,
                            round(total, 2)))
                start_ms, end_ms, n, total = t, t, 0, 0.0
            end_ms = max(end_ms, t)
            n += 1
            total += float(v)
        state.update((start_ms, end_ms, n, total))
        state.setTimeoutTimestamp(end_ms + gap_ms)
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "session_start", "session_end",
                              "n_events", "total_value"])

    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType="start_ms long, end_ms long, n long, total double",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
