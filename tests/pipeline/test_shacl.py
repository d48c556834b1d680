"""SHACL-lite validation (operators/shacl.py): each constraint kind
against hand-computed violation sets, zero-value minCount, conforming
graph, and spec validation errors."""

import pytest
from pyspark.sql import functions as F

from rdf_spark.operators.shacl import RDF_TYPE, validate_shapes
from rdf_spark.terms import KIND_IRI, KIND_LITERAL

SCHEMA = (
    "subj string, pred string, obj_kind tinyint, obj_lex string, "
    "obj_datatype string"
)
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


@pytest.fixture(scope="module")
def kg(spark):
    E = "http://ex/"
    rows = [
        # p1: conforming person (one name, literal, uppercase)
        (E + "p1", RDF_TYPE, KIND_IRI, E + "Person", None),
        (E + "p1", E + "name", KIND_LITERAL, "ALICE", None),
        (E + "p1", E + "age", KIND_LITERAL, "30", XSD_INT),
        # p2: two names (maxCount), one lowercase (pattern)
        (E + "p2", RDF_TYPE, KIND_IRI, E + "Person", None),
        (E + "p2", E + "name", KIND_LITERAL, "BOB", None),
        (E + "p2", E + "name", KIND_LITERAL, "bob", None),
        # p3: no name at all (minCount), IRI-valued age (nodeKind +
        # datatype), plain-literal age would fail datatype too
        (E + "p3", RDF_TYPE, KIND_IRI, E + "Person", None),
        (E + "p3", E + "age", KIND_IRI, E + "forty", None),
        # not a Person: never a focus node, violations don't apply
        (E + "x1", RDF_TYPE, KIND_IRI, E + "Place", None),
        (E + "x1", E + "name", KIND_LITERAL, "untyped lowercase", None),
    ]
    return spark.createDataFrame(rows, SCHEMA)


NAME_SHAPE = {
    "shape_id": "PersonName", "target_class": "http://ex/Person",
    "path": "http://ex/name", "min_count": 1, "max_count": 1,
    "node_kind": "literal", "pattern": "^[A-Z]+$",
}
AGE_SHAPE = {
    "shape_id": "PersonAge", "target_class": "http://ex/Person",
    "path": "http://ex/age", "node_kind": "literal", "datatype": XSD_INT,
}


def test_all_constraint_kinds(kg):
    E = "http://ex/"
    got = {
        (r.shape_id, r.focus, r.constraint, r.value)
        for r in validate_shapes(kg, [NAME_SHAPE, AGE_SHAPE]).collect()
    }
    assert got == {
        ("PersonName", E + "p2", "maxCount", None),
        ("PersonName", E + "p2", "pattern", "bob"),
        ("PersonName", E + "p3", "minCount", None),
        ("PersonAge", E + "p3", "nodeKind", E + "forty"),
        ("PersonAge", E + "p3", "datatype", E + "forty"),
    }


def test_conforming_graph_is_empty(kg):
    shape = {
        "shape_id": "TypedThing", "target_class": "http://ex/Place",
        "path": "http://ex/name", "min_count": 1,
    }
    assert validate_shapes(kg, [shape]).count() == 0


def test_spec_validation(kg):
    with pytest.raises(ValueError, match="empty shape list"):
        validate_shapes(kg, [])
    with pytest.raises(ValueError, match="unknown shape keys"):
        validate_shapes(kg, [{**NAME_SHAPE, "mincount": 2}])
    with pytest.raises(ValueError, match="node_kind"):
        validate_shapes(kg, [{**AGE_SHAPE, "node_kind": "IRI "}])
