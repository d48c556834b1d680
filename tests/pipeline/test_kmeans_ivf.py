"""Deterministic k-means + IVF ANN (operators/ann.py)."""

import pytest

from pyspark.sql import functions as F

from rdf_spark.operators.ann import (
    brute_force_topk,
    ivf_kmeans_topk,
    kmeans_fit,
    kmeans_transform,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_fit_deterministic(emb):
    a = kmeans_fit(emb, k=4, iters=3)
    b = kmeans_fit(emb, k=4, iters=3)
    assert a == b and len(a) == 4 and len(a[0]) == 64


def test_transform_covers_all_rows(emb):
    cents = kmeans_fit(emb, k=4, iters=2)
    a = kmeans_transform(emb, cents)
    assert a.count() == emb.count()
    sizes = {r["centroid"]: r["count"] for r in a.groupBy("centroid").count().collect()}
    assert set(sizes) <= {0, 1, 2, 3} and sum(sizes.values()) == emb.count()
    assert min(sizes.values()) > 0  # no empty clusters on this data


def test_ivf_recall_vs_brute_force(emb):
    q = emb.where(F.col("vec_id") < 10)
    bf = {(r["query_id"], r["neighbor_id"])
          for r in brute_force_topk(emb, q, k=3).collect()}
    iv = {(r["query_id"], r["neighbor_id"])
          for r in ivf_kmeans_topk(emb, q, k=3, nlist=4, iters=2).collect()}
    assert len(iv) > 0
    recall = len(bf & iv) / len(bf)
    assert recall >= 0.6, recall  # nprobe=1 coarse search


def test_ivf_exact_within_cluster(emb):
    """Within the query's own cluster the IVF result IS the exact
    top-k: verify one query against a manual within-cluster ranking."""
    cents = kmeans_fit(emb, k=4, iters=2)
    a = kmeans_transform(emb, cents)
    q = a.where(F.col("vec_id") == 0)
    qc = q.first()["centroid"]
    got = [r["neighbor_id"] for r in
           ivf_kmeans_topk(emb, emb.where(F.col("vec_id") == 0),
                           k=3, nlist=4, iters=2).collect()]
    cluster = a.where((F.col("centroid") == qc) & (F.col("vec_id") != 0))
    want = [r["neighbor_id"] for r in
            brute_force_topk(cluster, q, k=3).collect()]
    assert got == want
