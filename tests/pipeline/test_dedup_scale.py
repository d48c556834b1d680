"""Scale-safety behaviors of the dedup operators:

- jaccard_pairs prunes to candidate documents BEFORE the shingle
  self-join (left-semi in the plan) and can drop hot shingles;
- exact_dedup_groups caps the materialized doc_ids list while keeping
  the full count;
- _spread_small_input never converts the plan to an RDD.
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def _sh(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, shingle string")


def test_jaccard_candidates_semi_join_in_plan(spark):
    from rdf_spark.operators.dedup import jaccard_pairs

    rows = []
    for i in range(200):
        rows += [(i, "hot shingle x"), (i, f"unique {i}")]
    rows += [(0, "shared 01"), (1, "shared 01")]
    sh = _sh(spark, rows)
    cands = spark.createDataFrame([(0, 1)], "doc_a long, doc_b long")
    out = jaccard_pairs(sh, threshold=0.0, candidates=cands)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, "candidate pruning must precede the self-join"
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out.collect()}
    # docs 0/1: shingles {hot, unique_i, shared01} -> inter=2, union=4
    assert got == {(0, 1): 0.5}


def test_jaccard_hot_shingle_cap_is_lower_bound(spark):
    from rdf_spark.operators.dedup import jaccard_pairs

    rows = []
    for i in range(50):
        rows += [(i, "hot shingle x"), (i, f"unique {i}")]
    rows += [(0, "shared 01"), (1, "shared 01")]
    sh = _sh(spark, rows)
    capped = jaccard_pairs(sh, threshold=0.0, max_shingle_df=10)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in capped.collect()}
    # hot shingle dropped from the intersection join: only (0, 1)
    # survives, with inter=1 but FULL denominators (3 + 3 - 1)
    assert got == {(0, 1): 0.2}
    # uncapped finds all 50*49/2 hot pairs
    assert jaccard_pairs(sh, threshold=0.0).count() == 50 * 49 // 2


def test_jaccard_unrestricted_unchanged(spark):
    from rdf_spark.operators.dedup import jaccard_pairs

    sh = _sh(spark, [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "c")])
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in jaccard_pairs(sh, threshold=0.5).collect()}
    assert got == {(1, 2): 1.0}


def test_exact_dedup_groups_caps_ids_keeps_count(spark):
    from rdf_spark.operators.dedup import exact_dedup_groups

    docs = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.lit("same text").alias("text")
    ).unionByName(spark.createDataFrame(
        [(1000, "solo")], "doc_id long, text string"))
    row = exact_dedup_groups(docs, max_ids=5).collect()
    assert len(row) == 1
    r = row[0]
    assert r["n_docs"] == 100
    assert list(r["doc_ids"]) == [0, 1, 2, 3, 4]
    # unbounded legacy path
    full = exact_dedup_groups(docs, max_ids=None).collect()[0]
    assert len(full["doc_ids"]) == 100


def test_exact_dedup_salted_matches_single_window(spark):
    """A 10^5-member duplicate group: the salted two-phase path must
    return exactly the single-window result, and its plan must never
    sort the whole group in one task — the bottom window partitions by
    (content_hash, __salt), so the giant group fans out over salts."""
    from rdf_spark.operators.dedup import exact_dedup_groups

    docs = spark.range(0, 100_000).select(
        F.col("id").alias("doc_id"), F.lit("mega boilerplate").alias("text")
    ).unionByName(spark.range(200_000, 200_010).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("pair"), (F.col("id") % 5).cast("string")).alias("text"),
    ))
    plain = {(r["content_hash"], r["n_docs"], tuple(r["doc_ids"]))
             for r in exact_dedup_groups(docs, max_ids=8).collect()}
    salted_df = exact_dedup_groups(docs, max_ids=8, salts=16)
    salted = {(r["content_hash"], r["n_docs"], tuple(r["doc_ids"]))
              for r in salted_df.collect()}
    assert salted == plain
    assert any(n == 100_000 for _, n, _ in salted)  # the giant group

    plan = salted_df._jdf.queryExecution().executedPlan().toString()
    windows = [ln for ln in plan.splitlines() if "Window" in ln]
    # every window (there is one, phase 1) is salt-partitioned; the
    # merge is a plain aggregate, so no full-group single-task sort
    assert windows and all("__salt" in ln for ln in windows), plan


def test_exact_dedup_salted_requires_finite_cap(spark):
    """salts + max_ids=None is a contradiction (the per-salt cap is
    what bounds the phase-2 merge) — must raise, not silently ignore
    the salts or filter everything through a null comparison."""
    import pytest

    from rdf_spark.operators.dedup import exact_dedup_groups

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="finite max_ids"):
        exact_dedup_groups(docs, max_ids=None, salts=4)


def test_remove_duplicated_spans_keeper_semantics(spark):
    """The smallest doc_id containing a duplicated span keeps it; every
    other doc loses exactly the covered tokens; docs shorter than n and
    unique docs pass through (whitespace-normalized)."""
    from rdf_spark.operators.dedup import remove_duplicated_spans

    docs = spark.createDataFrame([
        (0, "alpha beta gamma delta epsilon zeta unique0 tail0"),
        (1, "alpha beta gamma delta epsilon zeta unique1 tail1"),
        (2, "totally different words here nothing shared at all"),
        (3, "short  text"),
    ], "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_removed"])
           for r in remove_duplicated_spans(docs, n=6, min_df=2).collect()}
    assert got[0] == ("alpha beta gamma delta epsilon zeta unique0 tail0", 0)
    assert got[1] == ("unique1 tail1", 6)
    assert got[2][1] == 0
    assert got[3] == ("short text", 0)  # ws normalized, < n tokens


def test_remove_duplicated_spans_overlap_union(spark):
    """Overlapping duplicated spans union their coverage — no token is
    double-counted and the survivor text has no seams."""
    from rdf_spark.operators.dedup import remove_duplicated_spans

    # docs 1 and 2 each share a different 3-span with keeper doc 0;
    # in doc 3 the two spans overlap ("b c d" + "c d e" covering b..e)
    docs = spark.createDataFrame([
        (0, "b c d x c d e"),
        (3, "pre b c d e post"),
    ], "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_removed"])
           for r in remove_duplicated_spans(docs, n=3, min_df=2).collect()}
    assert got[0][1] == 0  # keeper of both spans
    assert got[3] == ("pre post", 4)  # union of b c d + c d e


def test_remove_duplicated_spans_all_removed(spark):
    """A doc that is entirely one duplicated span collapses to ''."""
    from rdf_spark.operators.dedup import remove_duplicated_spans

    docs = spark.createDataFrame([
        (0, "one two three four"),
        (1, "one two three four"),
    ], "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_removed"])
           for r in remove_duplicated_spans(docs, n=4, min_df=2).collect()}
    assert got[0] == ("one two three four", 0)
    assert got[1] == ("", 4)


def test_remove_duplicated_spans_randomized_parity(spark):
    """Seeded random corpora with a tiny vocabulary (dense span
    collisions, overlaps, repeats within one doc, empty docs) must
    match an independent driver-side implementation exactly."""
    import numpy as np

    from rdf_spark.operators.dedup import remove_duplicated_spans

    def ref(texts, n, min_df):
        toks = {d: [t for t in s.split() if t] for d, s in texts.items()}
        occ = {}
        for d, ts in toks.items():
            for i in range(len(ts) - n + 1):
                occ.setdefault(tuple(ts[i:i + n]), []).append((d, i))
        cov = {d: set() for d in toks}
        for occs in occ.values():
            within = {d for d, _ in occs}
            if len(within) >= min_df:
                keeper = min(within)
                for d, i in occs:
                    if d != keeper:
                        cov[d].update(range(i, i + n))
        return {d: (" ".join(t for i, t in enumerate(ts) if i not in cov[d]),
                    len(cov[d]))
                for d, ts in toks.items()}

    rng = np.random.RandomState(42)
    vocab = ["a", "b", "c", "d"]
    for _ in range(4):
        texts = {d: " ".join(rng.choice(vocab, rng.randint(0, 18)))
                 for d in range(12)}
        df = spark.createDataFrame(list(texts.items()),
                                   "doc_id long, text string")
        got = {r["doc_id"]: (r["text"], r["n_removed"])
               for r in remove_duplicated_spans(df, n=3, min_df=2).collect()}
        assert got == ref(texts, 3, 2)


def test_spread_small_input_no_rdd_conversion(spark, tmp_path, monkeypatch):
    from pyspark.sql import DataFrame

    from rdf_spark.operators.dedup import _spread_small_input

    p = str(tmp_path / "docs")
    spark.createDataFrame([(1, "x")], "doc_id long, text string") \
        .coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)

    def boom(self):
        raise AssertionError("df.rdd must not be touched")

    monkeypatch.setattr(DataFrame, "rdd", property(boom))
    out = _spread_small_input(df)
    monkeypatch.undo()
    # single-file scan spread to the default parallelism
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
