"""Physical-plan assertions (SURVEY.md §4.2): these lock in the
scale-critical plan properties — filter pushdown to the parquet scan,
column pruning, broadcast-only joins for entity linking, no shuffle in
the parse->skolemize chain. A regression here is a 100TB incident, not
a style issue."""

import pytest

from pyspark.sql import functions as F

from rdf_spark.operators.graphops import find_all
from rdf_spark.operators.link import link_entities
from rdf_spark.operators.parse import good_triples, parse_pages
from rdf_spark.operators.skolemize import skolemize


@pytest.fixture(scope="module")
def triples_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "triples.parquet")
    spark.createDataFrame(
        [("http://u/1", 0, "http://ex/s1", "http://ex/name", 2, "A", None, None,
          None, None),
         ("http://u/2", 0, "http://ex/s2", "http://ex/type", 0, "http://ex/T",
          None, None, None, None)],
        "url string, subj_kind tinyint, subj string, pred string, "
        "obj_kind tinyint, obj_lex string, obj_datatype string, "
        "obj_lang string, graph_kind tinyint, graph string",
    ).write.parquet(p)
    return spark.read.parquet(p)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_triple_pattern_filter_pushed_to_scan(triples_parquet):
    plan = _plan(find_all(triples_parquet, pred="http://ex/name").select("subj"))
    assert "EqualTo(pred,http://ex/name)" in plan  # PushedFilters
    assert "ReadSchema: struct<subj:string,pred:string>" in plan  # pruning


def test_link_is_broadcast_only(triples_parquet, spark):
    d = spark.createDataFrame(
        [("http://ex/s1", "http://kg/x")], "surface string, canonical_iri string"
    )
    plan = _plan(link_entities(triples_parquet, d))
    assert plan.count("BroadcastHashJoin") == 2  # subj + obj rewrite
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_partitioned_triple_table_prunes(spark, tmp_path):
    """The materialized triple table is partitioned by bucket
    (pipeline's part=N layout); a bucket filter must prune at the scan,
    not post-filter — at 10^12 docs this is the difference between
    reading one partition and reading the corpus."""
    p = str(tmp_path / "triples")
    df = spark.range(100).select(
        F.col("id").alias("n"),
        (F.col("id") % 8).alias("part"),
        F.concat(F.lit("http://ex/s"), F.col("id").cast("string")).alias("subj"),
    )
    df.write.partitionBy("part").parquet(p)
    plan = _plan(spark.read.parquet(p).where(F.col("part") == 3))
    assert "PartitionFilters: [isnotnull(part" in plan
    assert "(part" in plan and "= 3)" in plan


def test_parse_skolemize_chain_has_no_shuffle(spark):
    pages = spark.createDataFrame(
        [("http://u/1", "turtle", "@prefix ex: <http://ex/> . ex:a ex:b [] .")],
        "url string, format string, text string",
    )
    plan = _plan(skolemize(good_triples(parse_pages(pages))))
    assert "Exchange" not in plan  # partition-preserving end to end
