#!/usr/bin/env python
"""Scaling-efficiency evidence (north_rule: >=0.8 throughput scaling
from N to 4N executors; sandbox stand-in: local[N] vs local[4N]).

Runs ONLY the end-to-end KG pipeline (the headline triples/sec metric)
through bench.best_rep — the steal-aware best-of-REPS that discards
and re-runs reps whose /proc/stat steal fraction exceeds the 5 %
threshold — because single runs on this shared box vary by 2-3x.

Corpus size is SPARK_GRAFT_SCALING_MULT x the sf dir (distinct urls
per replica): MULT=4 is the recorded sf0.1 baseline table; MULT=12
is the sf0.3-equivalent run that shows the canonical-dedupe exchange
(the only hot-path shuffle) scaling past the current corpus.

Usage: SPARK_GRAFT_CPUS=8 python scaling_bench.py
Prints one JSON line per invocation; BENCH.md aggregates both levels.
"""

from __future__ import annotations

import json
import os
import sys

REPS = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "3"))
# Corpus replication factor: the scaling measurement needs enough work
# per core that fixed per-job costs (stage scheduling, broadcast, AQE
# planning) don't dominate the 4N-level run. Each replica gets a
# distinct url (skolemization/dedup see distinct documents).
MULT = int(os.environ.get("SPARK_GRAFT_SCALING_MULT", "4"))
# Fixed partition count across levels: same dataset, same layout; many
# small partitions -> multiple task waves at both N and 4N (no
# last-wave straggling at the higher level).
PARTS = int(os.environ.get("SPARK_GRAFT_SCALING_PARTS", "256"))


def main() -> None:
    # identical logical AND physical plan at both levels: fix the
    # shuffle partitioning so only the executor count varies
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "64")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench

    spark = bench.make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from rdf_spark.submit import ship_package

    ship_package(spark)
    from pyspark.sql import functions as F

    corpus = bench.build_corpus(spark)
    base_pages = spark.read.parquet(os.path.join(corpus, "pages.parquet"))
    # scaled corpus lives INSIDE the signature-keyed corpus cache dir,
    # so a new sf dir / regenerated testdata invalidates it with the
    # base corpus instead of silently reusing a stale replication
    scaled = os.path.join(corpus, f"pages_x{MULT}.parquet")
    if not os.path.exists(os.path.join(scaled, "_SUCCESS")):
        (
            base_pages.crossJoin(
                spark.range(MULT).withColumnRenamed("id", "__rep"))
            .withColumn(
                "url", F.concat(F.col("url"), F.lit("?rep="), F.col("__rep"))
            )
            .drop("__rep")
            .repartition(PARTS)
            .write.mode("overwrite").parquet(scaled)
        )
    pages = spark.read.parquet(scaled)
    from rdf_spark.operators.parse import parse_pages

    parse_pages(pages.limit(256).repartition(bench.CPUS)).count()  # warm workers

    wall, frac, n_triples, redone = bench.best_rep(
        bench.bench_kg_pipeline, spark, pages, reps=REPS
    )
    print(json.dumps({
        "metric": "kg_pipeline_triples_per_sec",
        "value": round(n_triples / wall, 1),
        "unit": "triples/sec",
        "cpus": bench.CPUS,
        "sf_dir": bench.SF_DIR,
        "corpus_mult": MULT,
        "triples_out": n_triples,
        "best_sec": round(wall, 3),
        "steal": {
            "threshold": bench.STEAL_THRESHOLD,
            "clean": frac <= bench.STEAL_THRESHOLD,
            "winning_rep_frac": round(frac, 4),
            "reps_redone": redone,
        },
    }))
    spark.stop()


if __name__ == "__main__":
    main()
