"""Connected components over near-dup pairs (dedup.dup_clusters)."""

from rdf_spark.operators.dedup import dup_clusters


def test_chain_and_islands(spark):
    # chain 1-2-3-4 (diameter 3), pair {10,11}, triangle {20,21,22}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a long, doc_b long",
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_single_pair(spark):
    pairs = spark.createDataFrame([(7, 3)], "doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
    assert got == {3: 3, 7: 3}


def test_empty_pairs(spark):
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert dup_clusters(pairs).count() == 0


def test_deep_chain_converges_in_log_rounds(spark):
    """Pointer doubling: a 100-deep path converges well within 8
    rounds (min-propagation alone needs ~100)."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100)], "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: r["cluster_id"]
           for r in dup_clusters(pairs, max_iters=8).collect()}
    assert got == {i: 0 for i in range(101)}


def test_unconverged_raises(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100)], "doc_a long, doc_b long"
    )
    import pytest

    with pytest.raises(RuntimeError, match="did not converge"):
        dup_clusters(pairs, max_iters=1)


def test_unconverged_warn_mode(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100)], "doc_a long, doc_b long"
    )
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = dup_clusters(pairs, max_iters=1, on_unconverged="warn")
        assert out.count() == 101
    assert any("did not converge" in str(x.message) for x in w)
