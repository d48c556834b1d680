"""XSD datatype validation/conversion exprs (functions/datatypes.py;
reference datatypes.go:28-94 lexical rules, incl. the
decimal-rejects-exponent quirk)."""

import pytest

from pyspark.sql import functions as F

from rdf_spark.functions.datatypes import validate_literals, xsd_is_valid, xsd_native
from rdf_spark.terms import XSD_BOOLEAN, XSD_DECIMAL, XSD_DOUBLE, XSD_INTEGER

CASES = [
    # (lex, datatype, valid)
    ("true", XSD_BOOLEAN, True),
    ("false", XSD_BOOLEAN, True),
    ("1", XSD_BOOLEAN, True),
    ("0", XSD_BOOLEAN, True),
    ("TRUE", XSD_BOOLEAN, False),
    ("yes", XSD_BOOLEAN, False),
    ("42", XSD_INTEGER, True),
    ("-7", XSD_INTEGER, True),
    ("+0", XSD_INTEGER, True),
    ("4.2", XSD_INTEGER, False),
    ("4e2", XSD_INTEGER, False),
    ("", XSD_INTEGER, False),
    ("3.14", XSD_DECIMAL, True),
    (".5", XSD_DECIMAL, True),
    ("-2.", XSD_DECIMAL, True),
    ("1e3", XSD_DECIMAL, False),  # exponent rejected (datatypes.go:44-46)
    ("1E3", XSD_DECIMAL, False),
    ("1e3", XSD_DOUBLE, True),
    ("-4.2E-7", XSD_DOUBLE, True),
    ("INF", XSD_DOUBLE, True),
    ("-INF", XSD_DOUBLE, True),
    ("NaN", XSD_DOUBLE, True),
    ("inf", XSD_DOUBLE, False),
    ("4.2.1", XSD_DOUBLE, False),
]


@pytest.fixture(scope="module")
def validated(spark):
    df = spark.createDataFrame(
        [(lex, dt) for lex, dt, _ in CASES], "lex string, dt string"
    ).select(
        "lex", "dt",
        xsd_is_valid(F.col("lex"), F.col("dt")).alias("valid"),
        xsd_native(F.col("lex"), F.col("dt")).alias("nat"),
    )
    return {(r["lex"], r["dt"]): r for r in df.collect()}


def test_validity(validated):
    for lex, dt, want in CASES:
        assert validated[(lex, dt)]["valid"] is want, (lex, dt)


def test_native_boolean(validated):
    assert validated[("true", XSD_BOOLEAN)]["nat"]["bool"] is True
    assert validated[("1", XSD_BOOLEAN)]["nat"]["bool"] is True
    assert validated[("0", XSD_BOOLEAN)]["nat"]["bool"] is False
    assert validated[("yes", XSD_BOOLEAN)]["nat"]["bool"] is None


def test_native_numeric(validated):
    import math

    assert int(validated[("42", XSD_INTEGER)]["nat"]["int"]) == 42
    assert validated[("4.2", XSD_INTEGER)]["nat"]["int"] is None  # guard before cast
    assert float(validated[("3.14", XSD_DECIMAL)]["nat"]["dec"]) == pytest.approx(3.14)
    assert validated[("1e3", XSD_DECIMAL)]["nat"]["dec"] is None
    assert validated[("1e3", XSD_DOUBLE)]["nat"]["dbl"] == 1000.0
    assert validated[("INF", XSD_DOUBLE)]["nat"]["dbl"] == float("inf")
    assert math.isnan(validated[("NaN", XSD_DOUBLE)]["nat"]["dbl"])


def test_validate_literals_passthrough(spark):
    triples = spark.createDataFrame(
        [
            (0, "http://ex/s", "http://ex/p", 2, "12", XSD_INTEGER, None),
            (0, "http://ex/s", "http://ex/p", 2, "bad1", XSD_INTEGER, None),
            (0, "http://ex/s", "http://ex/p", 0, "http://ex/o", None, None),
        ],
        "subj_kind tinyint, subj string, pred string, obj_kind tinyint, "
        "obj_lex string, obj_datatype string, obj_lang string",
    )
    rows = validate_literals(triples).orderBy("obj_lex").collect()
    by_lex = {r["obj_lex"]: r for r in rows}
    assert by_lex["12"]["obj_valid"] is True
    assert by_lex["bad1"]["obj_valid"] is False
    assert by_lex["http://ex/o"]["obj_valid"] is None  # non-literal untouched
