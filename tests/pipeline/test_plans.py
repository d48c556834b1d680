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


def test_parse_skolemize_chain_has_no_shuffle(spark):
    pages = spark.createDataFrame(
        [("http://u/1", "turtle", "@prefix ex: <http://ex/> . ex:a ex:b [] .")],
        "url string, format string, text string",
    )
    plan = _plan(skolemize(good_triples(parse_pages(pages))))
    assert "Exchange" not in plan  # partition-preserving end to end
