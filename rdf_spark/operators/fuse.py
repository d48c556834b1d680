"""Knowledge fusion: resolve conflicting assertions into one canonical
value per (subject, predicate).

A continuously re-crawled KG asserts the same (subj, pred) many times
with different objects — stale snapshots, case variants, vandalism,
per-source disagreement. The reference library stops at storage
(graph.go:11-48); construction at web scale needs a fusion step
between canonical dedupe (operators/canonical.py) and the triple-table
write. Strategies here are the two classic deterministic ones:

- :func:`latest_values` — temporal resolution: keep the value(s) of
  the most recent assertion per (subj, pred); recency is what a
  recrawl feed means by "current".
- :func:`majority_vote` — truth discovery by support: keep the object
  asserted most often (optionally weighted by a support column, e.g.
  distinct-source counts from canonical dedupe).

Both are ONE hash-partial-aggregated shuffle on (subj, pred) followed
by a window rank inside each key — the same shape at 100 TB, because
(subj, pred) cardinality grows with the corpus (no giant single
group: one entity-attribute rarely has 10^8 distinct claims; if one
does, the salted two-phase escalation in operators/dedup.py applies
verbatim). Ties are broken canonically (min obj_lex) so output is
deterministic and oracle-replayable.

:func:`fuzzy_link` extends exact-dictionary entity linking
(operators/link.py) to typo'd mentions: blocked candidate generation
(equi-join on a cheap block key over the BROADCAST dictionary) +
JVM-side ``levenshtein`` filter + best-match rank. No all-pairs
compare, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_values(
    triples: DataFrame,
    ts_col: str = "warc_ts",
    key_cols: list[str] | None = None,
    value_col: str = "obj_lex",
) -> DataFrame:
    """Per key, keep the single most recent value; ties on the
    timestamp break to the canonically smallest value (deterministic).

    One shuffle on the key + one in-partition window sort. Input rows
    with NULL timestamps lose to any timestamped row (``desc_nulls_
    last``) but still win keys that only have NULL-ts claims."""
    key_cols = key_cols or ["subj", "pred"]
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).desc_nulls_last(), F.col(value_col).asc()
    )
    return (
        triples.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(*key_cols, value_col, ts_col)
    )


def majority_vote(
    triples: DataFrame,
    key_cols: list[str] | None = None,
    value_col: str = "obj_lex",
    support_col: str | None = None,
) -> DataFrame:
    """Per key, keep the value with the highest support (row count, or
    the sum of ``support_col`` when given — e.g. the distinct-source
    counts canonical dedupe emits). Ties break to the canonically
    smallest value. Output adds the winning ``support`` so downstream
    filters can threshold confidence.

    Two-level aggregation: count/sum per (key, value) — partial
    map-side combine absorbs the hot values BEFORE the shuffle — then
    a window rank over the per-key value list (small: distinct claims
    per entity-attribute)."""
    key_cols = key_cols or ["subj", "pred"]
    weight = (
        F.sum(support_col) if support_col else F.count(F.lit(1))
    ).alias("support")
    counted = triples.groupBy(*key_cols, value_col).agg(weight)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("support").desc(), F.col(value_col).asc()
    )
    return (
        counted.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(*key_cols, value_col, "support")
    )


def _block_key(col):
    """Cheap blocking key: lowercased first character. Recall contract
    (documented, mirrored by the oracle): candidate pairs whose edit
    distance fix touches the first character are missed — acceptable
    for the dominant typo classes (interior edits, case, suffixes);
    callers needing first-char robustness pass their own key."""
    return F.substring(F.lower(col), 1, 1)


def fuzzy_link(
    mentions: DataFrame,
    dictionary: DataFrame,
    mention_col: str = "mention",
    surface_col: str = "surface",
    canonical_col: str = "canonical_iri",
    max_dist: int = 2,
) -> DataFrame:
    """Link free-text mentions to canonical IRIs tolerating up to
    ``max_dist`` edits (case-insensitive Levenshtein): ``(mention,
    canonical_iri, dist)``, best match per mention, ties to the
    canonically smallest surface. Unmatched mentions are dropped
    (linking output, not enrichment — union with the exact path in
    link.py for rewrite semantics).

    Scale shape: the dictionary is broadcast; candidates come from an
    equi-join on (block key, plus a length band |len(m)-len(s)| <=
    max_dist enforced as a post-filter the optimizer keeps beside the
    join) — the 100 TB mention side is never shuffled, never
    all-pairs-compared. ``levenshtein`` is a JVM builtin inside
    whole-stage codegen; no Python in the row path."""
    m = mentions.select(
        F.col(mention_col).alias("__m"),
        _block_key(F.col(mention_col)).alias("__blk"),
    )
    d = F.broadcast(
        dictionary.select(
            F.col(surface_col).alias("__s"),
            F.col(canonical_col).alias("__iri"),
            _block_key(F.col(surface_col)).alias("__blk"),
        ).dropDuplicates(["__s"])
    )
    cand = (
        m.join(d, "__blk")
        .where(
            F.abs(F.length("__m") - F.length("__s")) <= max_dist
        )
        .withColumn("dist", F.levenshtein(F.lower("__m"), F.lower("__s")))
        .where(F.col("dist") <= max_dist)
    )
    w = Window.partitionBy("__m").orderBy(
        F.col("dist").asc(), F.col("__s").asc()
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            F.col("__m").alias("mention"),
            F.col("__iri").alias("canonical_iri"),
            F.col("dist").cast("int").alias("dist"),
        )
    )
