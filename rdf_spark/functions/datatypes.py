"""XSD datatype validation and native-type conversion as Spark SQL
expressions (SURVEY.md §2.5 F4/F5; reference datatypes.go:28-94).

Semantics replicated from the reference's lexical rules:
- ``xsd:boolean``  — ``true | false | 1 | 0``
- ``xsd:integer``  — optional sign, digits only (arbitrary precision in
  the reference via big.Int; here validation is unbounded but
  *conversion* caps at DecimalType(38,0) — documented deviation, SURVEY
  §1.3)
- ``xsd:decimal``  — optional sign, digits with optional fraction;
  **exponent notation rejected** (datatypes.go:44-46)
- ``xsd:double``   — decimal with optional exponent, or the sentinels
  ``INF`` / ``-INF`` / ``NaN`` (Spark doubles carry these natively)
- ``xsd:string`` / ``rdf:langString`` — any lexical form

Everything is a Column expression: JVM-side, whole-stage codegen, no
Python. ``try_cast`` keeps bad data as NULL instead of failing the job
(bad literals at web scale are data, not exceptions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..terms import (
    RDF_LANG_STRING,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
)

_BOOLEAN_RE = r"^(true|false|1|0)$"
_INTEGER_RE = r"^[+-]?[0-9]+$"
_DECIMAL_RE = r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)$"  # no exponent
_DOUBLE_RE = (
    r"^([+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?|[+-]?INF|NaN)$"
)


def xsd_is_valid(lex: Column, datatype: Column) -> Column:
    """True iff the lexical form is valid for the datatype IRI
    (reference Validate, datatypes.go:65-94). Unknown datatypes
    validate as true (the reference's anyType behavior)."""
    return (
        F.when(datatype == XSD_BOOLEAN, lex.rlike(_BOOLEAN_RE))
        .when(datatype == XSD_INTEGER, lex.rlike(_INTEGER_RE))
        .when(datatype == XSD_DECIMAL, lex.rlike(_DECIMAL_RE))
        .when(datatype == XSD_DOUBLE, lex.rlike(_DOUBLE_RE))
        .when(datatype.isin(XSD_STRING, RDF_LANG_STRING), F.lit(True))
        .otherwise(F.lit(True))
    )


def xsd_native(lex: Column, datatype: Column):
    """Native-typed columns (reference NativeType, datatypes.go:28-62):
    returns a struct<bool, int, dec, dbl, str> with exactly one non-null
    branch for known datatypes. Lexical-rule guards run BEFORE the cast
    so e.g. '1e3' never sneaks into decimal via try_cast."""
    as_bool = F.when(
        (datatype == XSD_BOOLEAN) & lex.rlike(_BOOLEAN_RE),
        F.when(lex.isin("true", "1"), F.lit(True)).otherwise(F.lit(False)),
    )
    as_int = F.when(
        (datatype == XSD_INTEGER) & lex.rlike(_INTEGER_RE),
        lex.try_cast("decimal(38,0)"),
    )
    as_dec = F.when(
        (datatype == XSD_DECIMAL) & lex.rlike(_DECIMAL_RE),
        lex.try_cast("decimal(38,18)"),
    )
    as_dbl = F.when(
        (datatype == XSD_DOUBLE) & lex.rlike(_DOUBLE_RE),
        F.when(lex == "INF", F.lit(float("inf")))
        .when(lex == "-INF", F.lit(float("-inf")))
        .when(lex == "NaN", F.lit(float("nan")))
        .otherwise(lex.try_cast("double")),
    )
    as_str = F.when(datatype.isin(XSD_STRING, RDF_LANG_STRING), lex)
    return F.struct(
        as_bool.alias("bool"),
        as_int.alias("int"),
        as_dec.alias("dec"),
        as_dbl.alias("dbl"),
        as_str.alias("str"),
    )


def validate_literals(triples: DataFrame) -> DataFrame:
    """Annotate literal objects with datatype validity + native value
    (objects with kind != literal or no datatype pass through NULL)."""
    is_typed = F.col("obj_datatype").isNotNull()
    return triples.withColumn(
        "obj_valid",
        F.when(is_typed, xsd_is_valid(F.col("obj_lex"), F.col("obj_datatype"))),
    ).withColumn(
        "obj_native",
        F.when(is_typed, xsd_native(F.col("obj_lex"), F.col("obj_datatype"))),
    )
