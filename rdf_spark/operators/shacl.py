"""SHACL-lite shape validation over the canonical triple table.

Constructing a KG at web scale is only half the job — the other half
is proving the graph you built obeys its schema. This module
implements the core SHACL constraint kinds (a deliberate subset of
W3C SHACL: class-targeted property shapes with cardinality, node
kind, datatype, and lexical-pattern constraints) as one relational
plan; the reference library has no validation layer at all
(storage + conformance only), so this is construction-side QA, not
parity.

Shape spec: a list of dicts, one per property shape::

    {"shape_id": "NationName", "target_class": "http://ex/Nation",
     "path": "http://ex/name",          # the constrained predicate
     "min_count": 1, "max_count": 1,    # optional cardinality bounds
     "node_kind": "literal",            # optional: iri|bnode|literal
     "datatype": "http://...#integer",  # optional literal datatype
     "pattern": "^[A-Z]+$"}             # optional RLIKE regex

Output: violation rows ``(shape_id, focus, constraint, value)`` —
empty DataFrame = conforms. ``value`` is NULL for cardinality
violations (they are about the set, not one value).

Scale shape: the shape list is tiny and broadcast twice (focus
targeting, value checks). Focus selection is one broadcast join on
the rdf:type triples; value checks are one broadcast join keyed on
pred with per-row constraint predicates (whole-stage codegen — the
pattern check is JVM ``RLIKE``, not Python); cardinality is one
partial-aggregated count per (shape, focus) left-joined back onto
the focus set (so min_count catches focus nodes with ZERO values).
No shuffle is keyed on anything coarser than (shape_id, focus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..terms import KIND_BNODE, KIND_IRI, KIND_LITERAL

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_KINDS = {"iri": KIND_IRI, "bnode": KIND_BNODE, "literal": KIND_LITERAL}

_SHAPE_SCHEMA = (
    "shape_id string, target_class string, path string, "
    "min_count long, max_count long, node_kind string, "
    "datatype string, pattern string"
)


def _shapes_df(spark, shapes: list[dict]) -> DataFrame:
    rows = []
    for s in shapes:
        unknown = set(s) - {
            "shape_id", "target_class", "path", "min_count", "max_count",
            "node_kind", "datatype", "pattern",
        }
        if unknown:
            raise ValueError(f"unknown shape keys {sorted(unknown)} in {s!r}")
        if s.get("node_kind") is not None and s["node_kind"] not in _KINDS:
            raise ValueError(
                f"node_kind must be one of {sorted(_KINDS)}, got {s['node_kind']!r}"
            )
        rows.append((
            s["shape_id"], s["target_class"], s["path"],
            s.get("min_count"), s.get("max_count"),
            s.get("node_kind"), s.get("datatype"), s.get("pattern"),
        ))
    return spark.createDataFrame(rows, _SHAPE_SCHEMA)


def validate_shapes(triples: DataFrame, shapes: list[dict]) -> DataFrame:
    """Validate class-targeted property shapes -> violation rows
    ``(shape_id, focus, constraint, value)``; empty result = the graph
    conforms. See module docstring for the shape spec and the plan
    shape."""
    if not shapes:
        raise ValueError("empty shape list")
    sh = _shapes_df(triples.sparkSession, shapes)

    focus = (
        triples.where(F.col("pred") == RDF_TYPE)
        .select(F.col("subj").alias("focus"), F.col("obj_lex").alias("__cls"))
        .distinct()
        .join(F.broadcast(sh), F.col("__cls") == F.col("target_class"))
        .select("shape_id", "focus", "path", "min_count", "max_count")
    )
    values = focus.join(
        triples.select(
            F.col("subj").alias("focus"),
            F.col("pred").alias("path"),
            "obj_kind", "obj_lex", "obj_datatype",
        ),
        ["focus", "path"],
    )

    # cardinality: count per (shape, focus), zero-filled via left join
    counts = values.groupBy("shape_id", "focus").agg(
        F.count(F.lit(1)).alias("__n")
    )
    card = focus.join(counts, ["shape_id", "focus"], "left").withColumn(
        "__n", F.coalesce(F.col("__n"), F.lit(0))
    )
    too_few = card.where(
        F.col("min_count").isNotNull() & (F.col("__n") < F.col("min_count"))
    ).select(
        "shape_id", "focus", F.lit("minCount").alias("constraint"),
        F.lit(None).cast("string").alias("value"),
    )
    too_many = card.where(
        F.col("max_count").isNotNull() & (F.col("__n") > F.col("max_count"))
    ).select(
        "shape_id", "focus", F.lit("maxCount").alias("constraint"),
        F.lit(None).cast("string").alias("value"),
    )

    # per-value checks: re-join values against the full shape row
    checked = values.join(
        F.broadcast(sh.select("shape_id", "node_kind", "datatype", "pattern")),
        "shape_id",
    )
    kind_code = F.when(F.col("node_kind") == "iri", F.lit(KIND_IRI)).when(
        F.col("node_kind") == "bnode", F.lit(KIND_BNODE)
    ).otherwise(F.lit(KIND_LITERAL))
    bad_kind = checked.where(
        F.col("node_kind").isNotNull() & (F.col("obj_kind") != kind_code)
    ).select(
        "shape_id", "focus", F.lit("nodeKind").alias("constraint"),
        F.col("obj_lex").alias("value"),
    )
    bad_datatype = checked.where(
        F.col("datatype").isNotNull()
        & ~F.col("obj_datatype").eqNullSafe(F.col("datatype"))
    ).select(
        "shape_id", "focus", F.lit("datatype").alias("constraint"),
        F.col("obj_lex").alias("value"),
    )
    bad_pattern = checked.where(
        F.col("pattern").isNotNull()
        & ~F.regexp_like(F.col("obj_lex"), F.col("pattern"))
    ).select(
        "shape_id", "focus", F.lit("pattern").alias("constraint"),
        F.col("obj_lex").alias("value"),
    )

    return (
        too_few.unionByName(too_many)
        .unionByName(bad_kind)
        .unionByName(bad_datatype)
        .unionByName(bad_pattern)
    )
