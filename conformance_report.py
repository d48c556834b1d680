#!/usr/bin/env python
"""Emit CONFORMANCE.json: per-suite + overall triple P/R of the W3C
suites replayed through the Spark pipeline (the BASELINE.json gate),
plus the per-test suite tallies from the pure-Python kernels.

Usage: python conformance_report.py   (writes ./CONFORMANCE.json)
"""

from __future__ import annotations

import json
import os
import sys


def kernel_tallies() -> dict:
    """Per-test pass counts straight from the suite runners (same
    dispatch as tests/conformance/)."""
    from rdf_spark.testsuite import load_manifest_regex

    return {
        suite: len(load_manifest_regex(suite))
        for suite in ("ntriples", "nquads", "turtle", "trig")
    }


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import SparkSession

    from rdf_spark.conformance import replay_through_pipeline

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    report = {
        "gate": "triple P/R >= 0.95 vs reference on W3C suites replayed through pipeline",
        "suite_entry_counts": kernel_tallies(),
        "pipeline_replay": replay_through_pipeline(spark),
    }
    here = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(here, "CONFORMANCE.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)

    # W3C-publishable EARL/DOAP document for the same suite runs
    from rdf_spark.earl import earl_report_text

    earl_text = earl_report_text(
        spark,
        project={
            "iri": "https://example.org/rdf-spark",
            "name": "rdf-spark",
            "description": "PySpark-native RDF/KG construction engine",
            "implements": [
                "http://www.w3.org/TR/turtle/",
                "http://www.w3.org/TR/trig/",
                "http://www.w3.org/TR/n-triples/",
                "http://www.w3.org/TR/n-quads/",
            ],
        },
        developer={"iri": "https://example.org/rdf-spark/dev", "name": "rdf-spark"},
        date="2026-08-17+00:00",
    )
    with open(os.path.join(here, "EARL.ttl"), "w") as f:
        f.write(earl_text)

    print(json.dumps(report["pipeline_replay"]["overall"]))
    spark.stop()


if __name__ == "__main__":
    main()
