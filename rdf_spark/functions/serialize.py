"""Term/triple serialization as pure Spark SQL expressions (SURVEY.md
S8/F6: reference ntriples/doc.go:147-153, 210-212, 271-279;
nquads/doc.go:193-198). No UDF — stays inside whole-stage codegen."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..terms import KIND_BNODE, KIND_IRI, KIND_LITERAL, KIND_QUOTED


def term_expr(kind: Column, lex: Column, datatype: Column = None, lang: Column = None) -> Column:
    """(kind, lex, datatype, lang) columns -> serialized term string."""
    iri = F.concat(F.lit("<"), lex, F.lit(">"))
    bnode = F.concat(F.lit("_:"), lex)
    lit = F.concat(F.lit('"'), lex, F.lit('"'))
    if datatype is not None:
        lit = F.when(
            datatype.isNotNull(),
            F.concat(F.lit('"'), lex, F.lit('"^^<'), datatype, F.lit(">")),
        ).otherwise(
            F.when(
                lang.isNotNull(),
                F.concat(F.lit('"'), lex, F.lit('"@'), lang),
            ).otherwise(lit)
        )
    return (
        F.when(kind == KIND_IRI, iri)
        .when(kind == KIND_BNODE, bnode)
        .when(kind == KIND_QUOTED, lex)  # quoted triples stored pre-serialized
        .otherwise(lit)
    )


def subj_expr(df_prefix: str = "") -> Column:
    p = df_prefix
    return term_expr(F.col(p + "subj_kind"), F.col(p + "subj"))


def obj_expr(df_prefix: str = "") -> Column:
    p = df_prefix
    return term_expr(
        F.col(p + "obj_kind"), F.col(p + "obj_lex"),
        F.col(p + "obj_datatype"), F.col(p + "obj_lang"),
    )


def line_expr(with_graph: bool = True) -> Column:
    """Full N-Triples/N-Quads line expression over the triples schema."""
    parts = [
        subj_expr(),
        F.concat(F.lit("<"), F.col("pred"), F.lit(">")),
        obj_expr(),
    ]
    if with_graph:
        g = term_expr(F.col("graph_kind"), F.col("graph"))
        line_g = F.concat_ws(" ", *parts, g, F.lit("."))
        line = F.concat_ws(" ", *parts, F.lit("."))
        return F.when(F.col("graph_kind").isNotNull(), line_g).otherwise(line)
    return F.concat_ws(" ", *parts, F.lit("."))


def serialize_ntriples(triples: DataFrame) -> DataFrame:
    """triples -> single-column DataFrame of canonical NT/NQ lines
    (write with df.write.text)."""
    return triples.select(line_expr().alias("value"))


_SAFE_LOCAL = "^[A-Za-z_][A-Za-z0-9_-]*$"


def _compact(iri_col: Column, prefixes: dict[str, str]) -> Column:
    """IRI -> prefixed name when a namespace matches and the local part
    is unescaped-safe; else <iri>. Deterministic: longest-namespace-
    first, then alphabetical prefix."""
    expr = F.concat(F.lit("<"), iri_col, F.lit(">"))
    # apply shortest namespace first: later whens wrap earlier ones, so
    # the longest matching namespace ends up taking precedence
    for pfx, ns in sorted(prefixes.items(), key=lambda kv: (len(kv[1]), kv[0])):
        local = F.substring(iri_col, len(ns) + 1, 1 << 20)
        expr = F.when(
            iri_col.startswith(ns) & local.rlike(_SAFE_LOCAL),
            F.concat(F.lit(pfx + ":"), local),
        ).otherwise(expr)
    return expr


def serialize_turtle(triples: DataFrame,
                     prefixes: dict[str, str] | None = None) -> DataFrame:
    """Pretty-printed Turtle sink (SURVEY.md S9, reference
    turtle/doc.go:389-396 per-node String()): one block per subject
    with ';'-grouped predicate-object pairs, 'a' for rdf:type,
    prefix-compacted IRIs. Pure SQL expressions + one groupBy(subject)
    shuffle; blocks are deterministic (pairs sorted lexicographically).

    Returns (subj, value); prepend prefix_header() lines when writing a
    whole document."""
    from ..terms import RDF_TYPE

    prefixes = prefixes or {}
    pred_str = F.when(F.col("pred") == RDF_TYPE, F.lit("a")).otherwise(
        _compact(F.col("pred"), prefixes)
    )
    obj_str = F.when(
        F.col("obj_kind") == KIND_IRI, _compact(F.col("obj_lex"), prefixes)
    ).otherwise(obj_expr())
    subj_str = F.when(
        F.col("subj_kind") == KIND_IRI, _compact(F.col("subj"), prefixes)
    ).otherwise(subj_expr())
    pairs = F.sort_array(
        F.collect_list(F.concat(pred_str, F.lit(" "), obj_str))
    )
    return (
        triples.groupBy(subj_str.alias("subj"))
        .agg(pairs.alias("pairs"))
        .select(
            "subj",
            F.concat(
                F.col("subj"), F.lit(" "),
                F.array_join(F.col("pairs"), " ;\n  "),
                F.lit(" ."),
            ).alias("value"),
        )
    )


def serialize_trig(quads: DataFrame,
                   prefixes: dict[str, str] | None = None) -> DataFrame:
    """Pretty-printed TriG sink (S9 dataset form): per-graph sections —
    default-graph subject blocks bare, named graphs wrapped in
    ``<label> { ... }``. Returns (graph, value) with one row per graph;
    deterministic (blocks sorted by subject). Two shuffles:
    groupBy(graph, subject) then groupBy(graph). An export/debug sink —
    a whole graph section materializes in one row, so route truly
    massive default graphs through serialize_turtle/serialize_ntriples
    instead."""
    from ..terms import RDF_TYPE

    prefixes = prefixes or {}
    pred_str = F.when(F.col("pred") == RDF_TYPE, F.lit("a")).otherwise(
        _compact(F.col("pred"), prefixes)
    )
    obj_str = F.when(
        F.col("obj_kind") == KIND_IRI, _compact(F.col("obj_lex"), prefixes)
    ).otherwise(obj_expr())
    subj_str = F.when(
        F.col("subj_kind") == KIND_IRI, _compact(F.col("subj"), prefixes)
    ).otherwise(subj_expr())
    graph_str = F.when(
        F.col("graph_kind").isNull(), F.lit(None).cast("string")
    ).otherwise(term_expr(F.col("graph_kind"), F.col("graph")))

    blocks = (
        quads.groupBy(graph_str.alias("graph"), subj_str.alias("subj"))
        .agg(F.sort_array(
            F.collect_list(F.concat(pred_str, F.lit(" "), obj_str))
        ).alias("pairs"))
        .select(
            "graph",
            F.concat(F.col("subj"), F.lit(" "),
                     F.array_join(F.col("pairs"), " ;\n  "),
                     F.lit(" .")).alias("block"),
        )
    )
    body = F.array_join(F.sort_array(F.collect_list(F.col("block"))), "\n")
    return blocks.groupBy("graph").agg(body.alias("body")).select(
        "graph",
        F.when(
            F.col("graph").isNull(), F.col("body")
        ).otherwise(
            F.concat(F.col("graph"), F.lit(" {\n"), F.col("body"), F.lit("\n}"))
        ).alias("value"),
    )


def prefix_header(prefixes: dict[str, str]) -> list[str]:
    """@prefix lines for a pretty-printed document (driver-side; tiny)."""
    return [f"@prefix {p}: <{ns}> ." for p, ns in sorted(prefixes.items())]
