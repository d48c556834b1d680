"""End-to-end KG-construction pipeline (north_rule):

  pages -> extract embedded RDF blocks -> vectorized parse ->
  skolemize blank nodes -> entity-link (broadcast dict) ->
  canonical dedupe -> partitioned triple-table materialization,
  with per-partition lineage manifests and checkpoint-resume via
  processed-partition watermarks.

Storage: partitioned parquet laid out Iceberg-style (a `_progress`
watermark table and a `_lineage` metrics table beside the data). On a
production cluster the writes target Iceberg tables (append +
snapshot); the sandbox has no Iceberg runtime jar, so the layout and
the resume protocol are implemented over directories — the logic
(skip-completed-partitions, idempotent re-run) is identical.

Resume protocol:
  input is bucketed into `n_buckets` by hash(url). Each bucket is an
  independent unit of work: parse -> ... -> append `part=<bucket>` to
  the output + write `_progress/<bucket>.json` LAST (write-ahead on
  data, commit on watermark). A re-run skips buckets whose watermark
  exists; a killed run re-processes its in-flight bucket, overwriting
  the same partition directory (idempotent: the bucket's output is a
  pure function of its input).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.canonical import canonicalize, cluster_for_write
from ..operators.link import link_entities
from ..operators.parse import good_triples, parse_pages
from ..operators.skolemize import skolemize
from ..sources.extract import extract_pages


def parse_stage(pages: DataFrame, from_html: bool = True,
                text_format: str = "turtle") -> DataFrame:
    """pages -> parsed rows (good triples AND errors-as-rows; lazy).
    The single expensive stage: extract + grammar parse. Everything
    downstream (triple build, error accounting) derives from this one
    DataFrame so the parse runs once per bucket. ``text_format`` names
    the syntax of the ``text`` column when not extracting from HTML; a
    ``format`` column on the input overrides it per row."""
    if from_html:
        blocks = extract_pages(pages)
    elif "format" in pages.columns:
        blocks = pages.select("url", "format", "text")
    else:
        blocks = pages.select("url", F.lit(text_format).alias("format"), "text")
    return parse_pages(blocks)


def finish_triples(parsed: DataFrame,
                   dictionary: DataFrame | None = None) -> DataFrame:
    """parsed rows -> canonical triples (skolemize -> link -> dedupe)."""
    triples = skolemize(good_triples(parsed))
    if dictionary is not None:
        triples = link_entities(triples, dictionary)
    return canonicalize(triples)


def build_triples(
    pages: DataFrame,
    dictionary: DataFrame | None = None,
    from_html: bool = True,
    text_format: str = "turtle",
) -> DataFrame:
    """The logical plan pages -> canonical triples (lazy; no actions)."""
    return finish_triples(parse_stage(pages, from_html, text_format), dictionary)


def parse_errors(pages: DataFrame, from_html: bool = True,
                 text_format: str = "turtle") -> DataFrame:
    parsed = parse_stage(pages, from_html, text_format)
    return parsed.where(F.col("error").isNotNull()).select("url", "error")


class PipelineRun:
    """Checkpointed, lineage-recording pipeline execution."""

    def __init__(self, spark: SparkSession, out_dir: str, n_buckets: int = 8,
                 run_id: str = "run"):
        from ..submit import ship_package

        ship_package(spark)  # executors import rdf_spark from any cwd
        self.spark = spark
        self.out_dir = out_dir
        self.n_buckets = n_buckets
        self.run_id = run_id
        self.progress_dir = os.path.join(out_dir, "_progress")
        self.lineage_dir = os.path.join(out_dir, "_lineage")
        self.data_dir = os.path.join(out_dir, "triples")
        os.makedirs(self.progress_dir, exist_ok=True)
        os.makedirs(self.lineage_dir, exist_ok=True)

    def completed_buckets(self) -> set[int]:
        return {
            int(f[:-5]) for f in os.listdir(self.progress_dir) if f.endswith(".json")
        }

    def run(self, pages: DataFrame, dictionary: DataFrame | None = None,
            from_html: bool = True, fail_after_bucket: int | None = None,
            text_format: str = "turtle",
            bucketed_table: str | None = None,
            table_buckets: int = 16) -> dict:
        """Process all buckets not yet in the watermark table.
        `fail_after_bucket` injects a crash for the resume test.

        ``bucketed_table`` (opt-in): once EVERY checkpoint bucket is
        complete, additionally materialize the full output as a
        subj-bucketed+sorted catalog table (plans/bucketed.py) so
        downstream subj-keyed consumers — BGP star joins, PO maps,
        property-graph export — read a zero-Exchange layout. One
        extra shuffle by subj at the end of the run; skipped (like
        the data buckets) when the run resumed with nothing to do
        AND the table already exists."""
        done = self.completed_buckets()
        stats = {"processed": [], "skipped": sorted(done), "triples_out": 0}
        bucketed = pages.withColumn(
            "__bucket", F.pmod(F.xxhash64("url"), F.lit(self.n_buckets)).cast("int")
        )
        # Per bucket: ONE parse. The parsed rows (flat triple columns,
        # far smaller than the raw HTML) are persisted and feed both the
        # triple build and the error count; docs_in is a column-pruned
        # count of the bucket's pages (url only, no parse) and
        # triples_out a parquet-footer count of the written partition.
        # At real scale each bucket is an Iceberg partition-filtered
        # scan instead of the hash filter.
        for b in range(self.n_buckets):
            if b in done:
                continue
            t0 = time.monotonic()
            part = bucketed.where(F.col("__bucket") == b).drop("__bucket")
            docs_in = part.select("url").count()
            parsed = parse_stage(part, from_html=from_html,
                                 text_format=text_format).persist()
            try:
                canonical = finish_triples(parsed, dictionary)
                out_path = os.path.join(self.data_dir, f"part={b}")
                clustered = cluster_for_write(canonical, buckets=4)
                clustered.write.mode("overwrite").parquet(out_path)
                failed = parsed.where(F.col("error").isNotNull()).count()
                triples_out = self.spark.read.parquet(out_path).count()
            finally:
                parsed.unpersist()
            wall_ms = int((time.monotonic() - t0) * 1000)
            lineage = {
                "input_partition": b,
                "job_run_id": self.run_id,
                "docs_in": docs_in,
                "docs_failed": failed,
                "triples_out": triples_out,
                "wall_ms": wall_ms,
            }
            with open(os.path.join(self.lineage_dir, f"{b}.json"), "w") as f:
                json.dump(lineage, f)
            # watermark LAST: commit point for this bucket
            with open(os.path.join(self.progress_dir, f"{b}.json"), "w") as f:
                json.dump({"bucket": b, "run_id": self.run_id}, f)
            stats["processed"].append(b)
            stats["triples_out"] += triples_out
            if fail_after_bucket is not None and b >= fail_after_bucket:
                raise RuntimeError(f"injected failure after bucket {b}")
        if bucketed_table is not None and \
                self.completed_buckets() >= set(range(self.n_buckets)):
            if stats["processed"] or not self.spark.catalog.tableExists(
                    bucketed_table):
                self.finalize_bucketed(bucketed_table,
                                       n_buckets=table_buckets)
        return stats

    def finalize_bucketed(self, table: str, n_buckets: int = 16,
                          path: str | None = None) -> DataFrame:
        """Rewrite the completed triple output as a subj-bucketed
        catalog table (same schema as :meth:`read_output`, incl. the
        ``part`` checkpoint-provenance column) and return the
        bucketing-aware reader. Idempotent: overwrites the table."""
        from .bucketed import read_bucketed_triples, write_bucketed_triples

        if path is None:
            path = os.path.join(self.out_dir, "triples_bucketed")
        write_bucketed_triples(self.read_output(), table,
                               n_buckets=n_buckets, path=path)
        return read_bucketed_triples(self.spark, table)

    def read_output(self) -> DataFrame:
        return self.spark.read.parquet(self.data_dir)

    def lineage(self) -> list[dict]:
        out = []
        for f in sorted(os.listdir(self.lineage_dir)):
            if f.endswith(".json"):
                with open(os.path.join(self.lineage_dir, f)) as fh:
                    out.append(json.load(fh))
        return out
