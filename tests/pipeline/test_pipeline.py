"""End-to-end pipeline tests: extraction -> triples, checkpoint-resume
(kill between partitions, re-run, byte-equal output), idempotence,
lineage (SURVEY.md §5.2)."""

import pytest

from rdf_spark.plans.pipeline import PipelineRun, build_triples
from rdf_spark.sources.pages import entity_dictionary, generate_pages


@pytest.fixture(scope="module")
def pages(spark):
    return generate_pages(spark, 60, seed=42, partitions=4).cache()


def _normalized(df):
    return sorted(tuple(r) for r in df.collect())


def test_end_to_end_html_extraction(spark, pages):
    out = build_triples(pages, from_html=True)
    rows = out.collect()
    assert len(rows) > 100
    assert all(r.support >= 1 for r in rows)


def test_resume_skips_completed_and_output_identical(spark, pages, tmp_path):
    d = entity_dictionary(spark, 50)
    full = PipelineRun(spark, str(tmp_path / "full"), n_buckets=4, run_id="full")
    full.run(pages, d)
    assert sorted(full.completed_buckets()) == [0, 1, 2, 3]

    crash = PipelineRun(spark, str(tmp_path / "crash"), n_buckets=4, run_id="r1")
    with pytest.raises(RuntimeError, match="injected failure"):
        crash.run(pages, d, fail_after_bucket=1)
    done_after_crash = crash.completed_buckets()
    assert done_after_crash == {0, 1}

    resumed = PipelineRun(spark, str(tmp_path / "crash"), n_buckets=4, run_id="r2")
    stats = resumed.run(pages, d)
    assert stats["skipped"] == [0, 1]        # watermark hit-rate 100%
    assert stats["processed"] == [2, 3]

    # byte-equal final output vs the uninterrupted run
    assert _normalized(resumed.read_output()) == _normalized(full.read_output())


def test_rerun_is_idempotent_noop(spark, pages, tmp_path):
    p = PipelineRun(spark, str(tmp_path / "o"), n_buckets=2, run_id="a")
    p.run(pages)
    first = _normalized(p.read_output())
    stats = p.run(pages)  # everything watermarked -> no work
    assert stats["processed"] == [] and stats["skipped"] == [0, 1]
    assert _normalized(p.read_output()) == first


def test_bucket_loop_parses_once_per_bucket(spark, pages, tmp_path, monkeypatch):
    """Plan regression: the bucket loop must build exactly one parse
    plan per bucket (triples, error count and lineage all derive from
    the one persisted parsed DataFrame — a second parse_pages call per
    bucket doubles the dominant cost at scale)."""
    import rdf_spark.plans.pipeline as pl

    calls = []
    real = pl.parse_pages

    def counting(df, *a, **k):
        calls.append(1)
        return real(df, *a, **k)

    monkeypatch.setattr(pl, "parse_pages", counting)
    p = PipelineRun(spark, str(tmp_path / "once"), n_buckets=2, run_id="a")
    p.run(pages)
    assert len(calls) == 2


def test_lineage_recorded(spark, tmp_path):
    noisy = generate_pages(spark, 40, seed=7, partitions=4, bad_fraction=0.3)
    p = PipelineRun(spark, str(tmp_path / "l"), n_buckets=2, run_id="a")
    p.run(noisy)
    lineage = p.lineage()
    assert len(lineage) == 2
    assert sum(x["docs_in"] for x in lineage) == 40
    assert all(x["triples_out"] > 0 for x in lineage)
    assert sum(x["docs_failed"] for x in lineage) >= 1  # malformed fixtures


def test_bucketed_table_finalize_star_join(spark, pages, tmp_path):
    """bucketed_table= opt-in: after all checkpoint buckets complete,
    the pipeline materializes a subj-bucketed catalog table; a BGP
    star self-join over the pipeline's OWN output must then plan with
    zero Exchange (the co-located-join lever on the flagship output)."""
    from pyspark.sql import functions as F

    table = "t_pipeline_bucketed_test"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    p = PipelineRun(spark, str(tmp_path / "b"), n_buckets=2, run_id="b")
    try:
        stats = p.run(pages, bucketed_table=table, table_buckets=4)
        assert stats["processed"] == [0, 1]
        t = spark.table(table)
        # same rows as the plain checkpoint output
        assert _normalized(t) == _normalized(p.read_output())
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            a = t.alias("a")
            b = t.alias("b")
            j = a.join(b, F.col("a.subj") == F.col("b.subj")).select(
                F.col("a.pred"), F.col("b.pred"))
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert j.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        # a resumed run with nothing to do leaves the table alone
        # (no re-shuffle) but a fresh-processed run refreshes it
        stats2 = PipelineRun(spark, str(tmp_path / "b"), n_buckets=2,
                             run_id="b2").run(pages, bucketed_table=table)
        assert stats2["processed"] == []
        assert _normalized(spark.table(table)) == _normalized(p.read_output())
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
