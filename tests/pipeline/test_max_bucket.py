"""Oversized-LSH-bucket handling (dedup.lsh_candidate_pairs max_bucket)."""

import sys
sys.path.insert(0, "/root/repo")


def test_max_bucket_star_pairs_same_components(spark):
    from rdf_spark.operators.dedup import dup_clusters, lsh_candidate_pairs

    # 30 identical docs -> identical signatures -> one bucket of 30;
    # plus one distinct pair
    rows = [(i, "aa", "aa", "bb", "bb") for i in range(30)]
    rows += [(100, "zz", "zz", "yy", "yy"), (101, "zz", "zz", "yy", "yy")]
    sigs = spark.createDataFrame(
        rows, "doc_id long, mh_0 string, mh_1 string, mh_2 string, mh_3 string"
    )
    exact = lsh_candidate_pairs(sigs, num_hashes=4, band_size=2)
    capped = lsh_candidate_pairs(sigs, num_hashes=4, band_size=2, max_bucket=5)
    # star output is linear, not quadratic
    assert exact.count() == 30 * 29 // 2 + 1
    assert capped.count() == 29 + 1
    # identical connected components either way
    a = {tuple(sorted((r["doc_id"], r["cluster_id"])))
         for r in dup_clusters(exact).collect()}
    b = {tuple(sorted((r["doc_id"], r["cluster_id"])))
         for r in dup_clusters(capped).collect()}
    assert {r for r in a} == {r for r in b}


def test_simhash_max_bucket_star_pairs(spark):
    """simhash_near_dups mirrors the LSH star-pair cap: oversized band
    buckets emit linear member->min pairs with exact hamming."""
    from rdf_spark.operators.dedup import dup_clusters, simhash_near_dups

    rows = [(i, 0x1234) for i in range(30)]          # one near-dup blob
    rows += [(100, -42), (101, -42)]                  # distinct small pair
    sig = spark.createDataFrame(rows, "doc_id long, simhash long")
    exact = simhash_near_dups(sig, max_hamming=3)
    capped = simhash_near_dups(sig, max_hamming=3, max_bucket=5)
    assert exact.count() == 30 * 29 // 2 + 1
    assert capped.count() == 29 + 1
    assert {r["hamming"] for r in capped.collect()} == {0}
    a = {tuple(sorted((r["doc_id"], r["cluster_id"])))
         for r in dup_clusters(exact.select("doc_a", "doc_b")).collect()}
    b = {tuple(sorted((r["doc_id"], r["cluster_id"])))
         for r in dup_clusters(capped.select("doc_a", "doc_b")).collect()}
    assert a == b


def test_simhash_max_bucket_small_buckets_exact(spark):
    from rdf_spark.operators.dedup import simhash_near_dups

    rows = [(1, 7), (2, 7), (3, 1 << 40)]
    sig = spark.createDataFrame(rows, "doc_id long, simhash long")
    exact = sorted(map(tuple, simhash_near_dups(sig, 3).collect()))
    capped = sorted(map(tuple,
                        simhash_near_dups(sig, 3, max_bucket=10).collect()))
    assert exact == capped == [(1, 2, 0)]


def test_emb_lsh_near_dups_max_bucket(spark):
    """Oversized LSH signature buckets emit member->min star pairs
    with exact cosine; small buckets stay all-pairs."""
    from rdf_spark.operators.dedup import embedding_near_dups_lsh

    rows = [(i, [1.0, 2.0, 3.0]) for i in range(20)]      # one blob
    rows += [(100, [-1.0, -2.0, -3.0]), (101, [-1.0, -2.0, -3.1])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = embedding_near_dups_lsh(emb, threshold=0.9, planes=4)
    capped = embedding_near_dups_lsh(emb, threshold=0.9, planes=4,
                                     max_bucket=5)
    assert exact.count() == 20 * 19 // 2 + 1
    assert capped.count() == 19 + 1
    star = {(r["doc_a"], r["doc_b"]): r["cos"] for r in capped.collect()}
    assert all(a == 0 for (a, b) in star if b < 100)       # star center
    assert star[(100, 101)] >= 0.99                        # exact cosine


def test_max_bucket_small_buckets_exact(spark):
    from rdf_spark.operators.dedup import lsh_candidate_pairs

    rows = [(1, "aa", "aa", "b1", "b1"), (2, "aa", "aa", "b2", "b2"),
            (3, "cc", "cc", "b3", "b3")]
    sigs = spark.createDataFrame(
        rows, "doc_id long, mh_0 string, mh_1 string, mh_2 string, mh_3 string"
    )
    exact = sorted(map(tuple, lsh_candidate_pairs(sigs, num_hashes=4, band_size=2).collect()))
    capped = sorted(map(tuple, lsh_candidate_pairs(sigs, num_hashes=4, band_size=2, max_bucket=10).collect()))
    assert exact == capped == [(1, 2)]
