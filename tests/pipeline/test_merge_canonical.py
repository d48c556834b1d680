"""Incremental canonical-table maintenance (canonical.py:
canonicalize_sketched + merge_canonical)."""

import pytest

from pyspark.sql import functions as F

from rdf_spark.operators.canonical import (
    TRIPLE_KEY,
    canonicalize_sketched,
    merge_canonical,
    with_source_estimates,
)

SCHEMA = (
    "url string, subj_kind tinyint, subj string, pred string, "
    "obj_kind tinyint, obj_lex string, obj_datatype string, "
    "obj_lang string, graph_kind tinyint, graph string"
)


def _triples(spark, n_docs, offset=0):
    rows = []
    for d in range(n_docs):
        u = f"http://crawl.example/{d + offset}"
        # every doc asserts the shared head triple + one unique triple
        rows.append((u, 0, "http://ex/head", "http://ex/p", 2, "v",
                     None, None, None, None))
        rows.append((u, 0, f"http://ex/s{d + offset}", "http://ex/p", 2, "v",
                     None, None, None, None))
    return spark.createDataFrame(rows, SCHEMA)


def test_merge_equals_full_batch(spark):
    """Canonicalizing two halves and merging equals canonicalizing the
    whole corpus at once — support and exemplar exactly, sketch
    estimates identically (same sketch family/params)."""
    full = canonicalize_sketched(_triples(spark, 40))
    a = canonicalize_sketched(_triples(spark, 25))
    b = canonicalize_sketched(_triples(spark, 15, offset=25))
    merged = merge_canonical(a, b)

    def norm(df):
        return sorted(
            tuple(r) for r in with_source_estimates(df)
            .select(*TRIPLE_KEY, "support", "first_url", "approx_sources")
            .collect()
        )

    assert norm(merged) == norm(full)
    head = [r for r in with_source_estimates(merged).collect()
            if r["subj"] == "http://ex/head"]
    assert head[0]["support"] == 40
    assert abs(head[0]["approx_sources"] - 40) <= 2  # lg_k=12 on n=40


def test_merge_is_associative_enough(spark):
    """Repeated incremental merges converge to the same table as one
    merge (order independence of the aggregates)."""
    parts = [canonicalize_sketched(_triples(spark, 5, offset=5 * i))
             for i in range(4)]
    left = merge_canonical(merge_canonical(parts[0], parts[1]),
                           merge_canonical(parts[2], parts[3]))
    right = merge_canonical(
        merge_canonical(merge_canonical(parts[0], parts[1]), parts[2]),
        parts[3])

    def norm(df):
        return sorted(
            tuple(r) for r in with_source_estimates(df)
            .select(*TRIPLE_KEY, "support", "first_url", "approx_sources")
            .collect()
        )

    assert norm(left) == norm(right)


def test_merge_single_shuffle_plan(spark):
    a = canonicalize_sketched(_triples(spark, 3))
    b = canonicalize_sketched(_triples(spark, 3, offset=3))
    plan = merge_canonical(a, b)._jdf.queryExecution().executedPlan().toString()
    # the merge itself adds exactly one exchange on the triple key
    # (inputs each have their own aggregation exchange)
    assert plan.count("Exchange") <= 3
