"""Sessionization: batch window-function form vs the streaming
applyInPandasWithState form (rdf_spark.streaming.sessions)."""

import time
from datetime import datetime, timedelta

import pytest

from pyspark.sql import functions as F

from rdf_spark.streaming.sessions import session_summaries, sessionize_stream

BASE = datetime(2024, 1, 1, 0, 0, 0)


def _mk(minutes, user, value):
    return (BASE + timedelta(minutes=minutes), user, float(value))


EVENTS = [
    _mk(0, 1, 1.0), _mk(10, 1, 2.0),          # user 1 session A
    _mk(60, 1, 4.0), _mk(65, 1, 8.0),         # user 1 session B (gap 50min)
    _mk(5, 2, 16.0),                          # user 2 session C
]
SENTINEL = [(BASE + timedelta(days=10), 99, 0.0)]
DDL = "ts timestamp, user_id long, value double"


def test_batch_sessions(spark):
    df = spark.createDataFrame(EVENTS, DDL)
    got = {(r["user_id"], r["session_start"], r["session_end"]):
           (r["n_events"], r["total_value"])
           for r in session_summaries(df, gap_minutes=30).collect()}
    assert got == {
        (1, BASE, BASE + timedelta(minutes=10)): (2, 3.0),
        (1, BASE + timedelta(minutes=60), BASE + timedelta(minutes=65)): (2, 12.0),
        (2, BASE + timedelta(minutes=5), BASE + timedelta(minutes=5)): (1, 16.0),
    }


def test_stream_sessionize_matches_batch(spark, tmp_path):
    """Stateful streaming sessions (EventTimeTimeout) equal the batch
    result once the watermark passes every session: two files, the
    second advancing the watermark far enough to flush all real
    sessions; the sentinel's own session stays in state."""
    in_dir = str(tmp_path / "in")
    spark.createDataFrame(EVENTS, DDL).coalesce(1).write.mode(
        "append").parquet(in_dir)
    time.sleep(1.2)  # distinct mod times -> deterministic file order
    spark.createDataFrame(SENTINEL, DDL).coalesce(1).write.mode(
        "append").parquet(in_dir)

    stream = (
        spark.readStream.schema(DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out = sessionize_stream(stream, gap_minutes=30)
    q = (
        out.writeStream.format("memory").queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["user_id"], r["session_start"], r["session_end"]):
           (r["n_events"], round(r["total_value"], 2))
           for r in spark.sql("SELECT * FROM sess_out").collect()}

    batch = session_summaries(spark.createDataFrame(EVENTS, DDL), 30)
    want = {(r["user_id"], r["session_start"], r["session_end"]):
            (r["n_events"], round(r["total_value"], 2))
            for r in batch.collect()}
    assert got == want
    assert all(u != 99 for (u, _, _) in got)  # sentinel never flushed
