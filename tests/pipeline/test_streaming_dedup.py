"""Streaming exact dedup (rdf_spark.streaming.dedup): first-seen-only
within the watermark, exactly-once, resume keeps state."""

import datetime

import pytest

from pyspark.sql import functions as F

from rdf_spark.streaming.dedup import dedup_available

T0 = datetime.datetime(2026, 1, 1, 12, 0, 0)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + datetime.timedelta(seconds=s), t) for i, s, t in rows],
        "doc_id long, ts timestamp, text string",
    )


@pytest.fixture()
def dirs(tmp_path):
    return {k: str(tmp_path / k) for k in ("in", "out", "ckpt")}


def test_dedup_drops_in_window_duplicates(spark, dirs):
    rows = [(1, 0, "alpha"), (2, 10, "alpha"), (3, 20, "beta"),
            (4, 30, "alpha"), (5, 40, "gamma"), (6, 50, "beta")]
    _docs(spark, rows).coalesce(1).write.parquet(dirs["in"])
    dedup_available(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    out = spark.read.parquet(dirs["out"])
    kept = {r["text"] for r in out.collect()}
    assert kept == {"alpha", "beta", "gamma"}
    assert out.count() == 3
    # survivor is the earliest sighting per hash
    first = {r["text"]: r["doc_id"] for r in out.collect()}
    assert first == {"alpha": 1, "beta": 3, "gamma": 5}


def test_resume_remembers_seen_hashes(spark, dirs):
    _docs(spark, [(1, 0, "alpha"), (2, 5, "beta")]) \
        .coalesce(1).write.parquet(dirs["in"])
    dedup_available(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    # new file with a duplicate of 'alpha' arriving within the
    # watermark and one new text
    _docs(spark, [(3, 20, "alpha"), (4, 25, "delta")]) \
        .coalesce(1).write.mode("append").parquet(dirs["in"])
    dedup_available(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    out = spark.read.parquet(dirs["out"])
    assert {r["doc_id"] for r in out.collect()} == {1, 2, 4}


def test_rerun_with_no_new_input_is_noop(spark, dirs):
    _docs(spark, [(1, 0, "alpha")]).coalesce(1).write.parquet(dirs["in"])
    dedup_available(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    n1 = spark.read.parquet(dirs["out"]).count()
    dedup_available(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    assert spark.read.parquet(dirs["out"]).count() == n1 == 1


def test_content_hash_matches_batch_operator(spark, dirs):
    """The streaming key is the same md5(text) the batch
    exact_dedup_groups uses — stream survivors + batch groups agree."""
    from rdf_spark.operators.dedup import exact_dedup_groups

    rows = [(i, i, "dup" if i % 2 == 0 else f"uniq{i}") for i in range(10)]
    docs = _docs(spark, rows)
    docs.coalesce(1).write.parquet(dirs["in"])
    dedup_available(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    streamed = spark.read.parquet(dirs["out"])
    assert streamed.count() == 6  # 1 'dup' survivor + 5 uniques
    g = exact_dedup_groups(docs.select("doc_id", "text")).collect()
    assert len(g) == 1 and g[0]["n_docs"] == 5
    assert streamed.where(F.col("text") == "dup").count() == 1
