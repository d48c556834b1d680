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
