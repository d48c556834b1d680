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


def test_canonicalize_has_partial_aggregation(triples_parquet):
    """The canonical dedupe must keep Spark's two-level (partial ->
    final) hash aggregation — map-side combine is what makes the one
    shuffle affordable at 10^12 triples."""
    from rdf_spark.operators.canonical import canonicalize

    plan = _plan(canonicalize(triples_parquet))
    assert "partial_count" in plan  # map-side combine before the shuffle
    assert plan.count("Exchange") == 1


def test_stratified_sample_is_map_only(triples_parquet, spark):
    """Deterministic sampling must add NO shuffle and NO job — it is a
    filter over a hash expression."""
    from rdf_spark.operators.curation import stratified_sample

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    plan = _plan(stratified_sample(df, "lang", {"en": 0.5}))
    assert "Exchange" not in plan


def test_session_summaries_single_shuffle(spark):
    """Both window functions and the final aggregate must reuse ONE
    hash partitioning on the user key."""
    from rdf_spark.streaming.sessions import session_summaries

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0)], "user_id long, ts string, value double"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    plan = _plan(session_summaries(df))
    assert plan.count("Exchange") == 1


def test_lsh_max_bucket_reuses_signature_exchange(spark):
    """The max_bucket path references the minhash aggregation twice
    (bucket-size count + member join) but the exchange must execute
    once (ReusedExchange) — the expensive shingle/minhash upstream is
    never recomputed."""
    from rdf_spark.operators.dedup import lsh_candidate_pairs

    sigs_src = spark.createDataFrame(
        [(i, "a", "a", "b", "b") for i in range(10)],
        "doc_id long, mh_0 string, mh_1 string, mh_2 string, mh_3 string",
    )
    # aggregate upstream so the plan contains a reusable exchange
    sigs = sigs_src.groupBy("doc_id").agg(
        F.min("mh_0").alias("mh_0"), F.min("mh_1").alias("mh_1"),
        F.min("mh_2").alias("mh_2"), F.min("mh_3").alias("mh_3"),
    )
    df = lsh_candidate_pairs(sigs, num_hashes=4, band_size=2, max_bucket=3)
    df.collect()  # AQE finalizes reuse at execution
    plan = _plan(df)
    assert "ReusedExchange" in plan or "ReusedQueryStage" in plan or \
        "TableCacheQueryStage" in plan


def test_exact_dedup_single_exchange(spark, tmp_path):
    """The rank-window form of exact_dedup_groups must shuffle the
    corpus exactly once (both window specs and the final partial
    aggregate share the content_hash partitioning)."""
    from rdf_spark.operators.dedup import exact_dedup_groups

    p = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, "t%d" % (i % 3)) for i in range(30)],
        "doc_id long, text string",
    ).write.parquet(p)
    plan = _plan(exact_dedup_groups(spark.read.parquet(p)))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_domain_cap_no_shuffle_beyond_rank_windows(spark, tmp_path):
    """cap_per_domain: domain derivation is broadcast-join only; the
    only exchanges are the two rank windows' hash partitionings (salted
    then bare domain key)."""
    from rdf_spark.operators.curation import cap_per_domain

    p = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, "http://ex%d.example.com/p" % (i % 4)) for i in range(20)],
        "doc_id long, url string",
    ).write.parquet(p)
    plan = _plan(cap_per_domain(spark.read.parquet(p), 3))
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan  # the PSL suffix joins


def test_remove_duplicated_spans_no_cartesian(spark, tmp_path):
    """Duplicated-span removal must stay equi-keyed end to end: every
    join keys on the span hash or (doc_id, pos) — no cartesian or
    nested-loop fallback, and the span df aggregate is partial (the
    count-distinct expands map-side before shuffling)."""
    from rdf_spark.operators.dedup import remove_duplicated_spans

    p = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, " ".join("tok%d" % ((i * 17 + j) % 23) for j in range(12)))
         for i in range(30)],
        "doc_id long, text string",
    ).write.parquet(p)
    plan = _plan(remove_duplicated_spans(spark.read.parquet(p), n=4))
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan
    assert "partial_count" in plan, plan


def test_pagerank_iteration_no_data_cartesian(spark):
    """One PageRank iteration's plan: the contribution join is an
    equi-join on the vertex key and the only nested-loop is the
    broadcast of the 1-row N / dangling-mass aggregates (a constant,
    not a data-path cartesian product). A CartesianProduct on the
    rank x edges path would be quadratic at KG scale."""
    from rdf_spark.operators.graphalgo import pagerank

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")],
        "src string, dst string",
    )
    plan = _plan(pagerank(e, iters=1))
    assert "CartesianProduct" not in plan, plan
    # the cross-joined scalars must arrive broadcast, never shuffled
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_dangling_refs_partial_agg_and_anti_join(triples_parquet):
    """Referential-integrity screen: hub IRIs (rdf:type targets) are
    the skewed keys — the count must combine map-side (partial_count)
    before the shuffle, and the subject check is an anti equi-join."""
    from rdf_spark.operators.graphalgo import dangling_refs

    plan = _plan(dangling_refs(triples_parquet))
    assert "partial_count" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan


def test_graph_diff_is_two_anti_equi_joins(spark):
    """Snapshot diff: both directions are anti equi-joins on the
    triple key — no full outer join materializing the unchanged
    majority, no nested-loop fallback."""
    from rdf_spark.operators.graphalgo import graph_diff

    cols = "subj string, pred string, obj_lex string"
    old = spark.createDataFrame([("s1", "p", "o1"), ("s2", "p", "o2")], cols)
    new = spark.createDataFrame([("s2", "p", "o2"), ("s3", "p", "o3")], cols)
    plan = _plan(graph_diff(old, new))
    assert plan.count("LeftAnti") == 2, plan
    assert "FullOuter" not in plan, plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan


def test_fuzzy_link_broadcasts_dictionary(spark):
    """Edit-distance linking: the dictionary side must arrive as a
    BroadcastHashJoin on the block key — a sort-merge join (or worse,
    a cartesian with the levenshtein as post-filter) would shuffle
    the 100 TB mention side."""
    from rdf_spark.operators.fuse import fuzzy_link

    m = spark.createDataFrame([("Germany",), ("Frannce",)], "mention string")
    d = spark.createDataFrame(
        [("Germany", "ex:de"), ("France", "ex:fr")],
        "surface string, canonical_iri string",
    )
    plan = _plan(fuzzy_link(m, d))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan


def test_majority_vote_partial_aggregation(triples_parquet):
    """Claim counting must combine map-side before the shuffle — hot
    values of a contested (subj, pred) are exactly the skewed keys."""
    from rdf_spark.operators.fuse import majority_vote

    plan = _plan(majority_vote(triples_parquet))
    assert "partial_count" in plan, plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan


def test_rdfs_closure_instance_side_broadcast_only(triples_parquet, spark):
    """Every instance-rule join in rdfs_closure (rdfs2/3/7/9) must
    broadcast the schema-sized side — at 10^12 instance triples a
    single SortMergeJoin against the TBox shuffles the corpus. The
    only exchange allowed on the instance path is the final
    duplicate-collapsing aggregate."""
    from rdf_spark.operators.infer import RDFS_SUBCLASS, rdfs_closure

    tbox = spark.createDataFrame(
        [(None, 0, "http://ex/T", RDFS_SUBCLASS, 0, "http://ex/U",
          None, None, None, None)],
        triples_parquet.schema,
    )
    plan = _plan(rdfs_closure(triples_parquet.unionByName(tbox)))
    # single-pass form: four broadcast LEFT joins (the superprop /
    # domain-type / range-type / superclass maps) on ONE scan of the
    # instance table; the remaining broadcast joins build the
    # schema-sized maps themselves (schema x schema).
    assert plan.count("LeftOuter, BuildRight") == 4, plan
    # the instance relation (parquet scan) is read exactly once — a
    # union-of-rule-branches plan rescans the corpus per rule; the
    # TBox extraction pass is pinned by an eager localCheckpoint and
    # so never shows as a parquet scan here.
    assert plan.count("Scan parquet") == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan


def test_sameas_rewrite_broadcast_map_no_shuffle_joins(triples_parquet, spark):
    """With broadcast_map=True both alias-map rewrites (subj, obj)
    must be broadcast joins: the instance side stays map-only until
    the merged-duplicate distinct."""
    from rdf_spark.operators.infer import OWL_SAMEAS, sameas_rewrite

    sa = spark.createDataFrame(
        [(None, 0, "http://ex/s2", OWL_SAMEAS, 0, "http://ex/s1",
          None, None, None, None)],
        triples_parquet.schema,
    )
    plan = _plan(sameas_rewrite(triples_parquet.unionByName(sa),
                                broadcast_map=True))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan


def test_bucketed_table_star_join_has_no_exchange(spark, tmp_path_factory):
    """A subj-bucketed catalog table must feed subj-keyed self-joins
    (BGP star patterns) with ZERO Exchange: both join branches read
    pre-partitioned bucketed scans. This is the co-located-join lever
    at 100 TB — a shuffle here is the whole corpus over the wire."""
    from rdf_spark.plans.bucketed import (
        read_bucketed_triples, write_bucketed_triples,
    )

    wh = str(tmp_path_factory.mktemp("bucketed") / "t")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS t_bucketed_test")
    rows = [("http://u/%d" % i, 0, "http://ex/s%d" % (i % 5),
             "http://ex/p%d" % (i % 3), 2, "v%d" % i, None, None,
             None, None) for i in range(50)]
    df = spark.createDataFrame(
        rows,
        "url string, subj_kind tinyint, subj string, pred string, "
        "obj_kind tinyint, obj_lex string, obj_datatype string, "
        "obj_lang string, graph_kind tinyint, graph string")
    write_bucketed_triples(df, "t_bucketed_test", n_buckets=4, path=wh)
    t = read_bucketed_triples(spark, "t_bucketed_test")
    try:
        # force a real shuffle-or-bucket decision (no broadcast)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = t.where(F.col("pred") == "http://ex/p0").alias("a")
        b = t.where(F.col("pred") == "http://ex/p1").alias("b")
        j = a.join(b, F.col("a.subj") == F.col("b.subj")).select(
            F.col("a.subj"), F.col("a.obj_lex"), F.col("b.obj_lex"))
        plan = _plan(j)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert j.count() > 0
        # the same join over the identical data WITHOUT bucketing
        # shuffles both sides — proves the layout earns its keep
        plain = df
        a2 = plain.where(F.col("pred") == "http://ex/p0").alias("a")
        b2 = plain.where(F.col("pred") == "http://ex/p1").alias("b")
        plan2 = _plan(a2.join(b2, F.col("a.subj") == F.col("b.subj")))
        assert "Exchange" in plan2, plan2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS t_bucketed_test")
