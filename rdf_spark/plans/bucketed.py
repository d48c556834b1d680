"""Bucketed triple-table layout: the co-located-join lever for the
query side at 100 TB.

The pipeline's ``part=<bucket>`` directories are CHECKPOINT units
(resume/idempotence, plans/pipeline.py); they do nothing for join
locality. This module writes the canonical triple table as a Spark
bucketed table — ``bucketBy(n, "subj")`` + ``sortBy("subj")`` — so
every subj-keyed self-join (BGP star patterns: N patterns sharing
``?s`` = N-1 self-joins on subj), subj-keyed aggregation
(predicate-object maps, SHACL focus grouping), and subj-keyed merge
reads both sides pre-partitioned: ZERO Exchange in the join plan
(locked by tests/pipeline/test_plans.py).

Sizing note (100 TB): pick ``n_buckets`` so one bucket's biggest
column chunk fits an executor core's working memory — at ~100 TB of
canonical triples and 4 GiB/task, n_buckets ≈ 32-64 k; bucket counts
only pay off if REUSED, so fix them per table generation, not per
query. The write itself costs one repartition by the same key the
table is bucketed on (map-side only when the upstream already hashes
on subj).

The reference stores a graph as one in-memory slice (graph.go) —
layout-for-joins has no counterpart there; this is Spark-native
design, not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_triples(
    triples: DataFrame, table: str, n_buckets: int = 64,
    mode: str = "overwrite", path: str | None = None,
) -> None:
    """Materialize the triple table bucketed+sorted by ``subj`` as a
    catalog table (Spark's bucketing metadata lives in the catalog —
    a bare parquet path cannot carry it). Pass ``path`` to create an
    EXTERNAL table at an explicit location (production: the Iceberg/
    lakehouse data root) instead of the session warehouse."""
    w = (
        triples.repartition(n_buckets, "subj")
        .sortWithinPartitions("subj")
        .write.format("parquet")
        .bucketBy(n_buckets, "subj")
        .sortBy("subj")
        .mode(mode)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed_triples(spark: SparkSession, table: str) -> DataFrame:
    """Read back with bucketing metadata intact (spark.table, not
    spark.read.parquet — the path read would drop the layout)."""
    return spark.table(table)
