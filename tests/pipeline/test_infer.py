"""RDFS materialization + owl:sameAs smushing (operators/infer.py):
each rule against hand-computed closures, deep hierarchies, the
derived-only delta, and sameAs chain/rewrite semantics."""

import pytest
from pyspark.sql import functions as F

from rdf_spark.operators.infer import (
    OWL_SAMEAS, RDF_TYPE, RDFS_DOMAIN, RDFS_RANGE, RDFS_SUBCLASS,
    RDFS_SUBPROP, rdfs_closure, sameas_components, sameas_rewrite,
)
from rdf_spark.terms import KIND_IRI, KIND_LITERAL

SCHEMA = "subj string, pred string, obj_kind tinyint, obj_lex string"
E = "http://ex/"


def df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def spo(frame):
    return {(r.subj, r.pred, r.obj_lex) for r in frame.collect()}


@pytest.fixture(scope="module")
def ontology(spark):
    return df(spark, [
        # TBox: Dog < Mammal < Animal; hasPet < knows; domain/range
        (E + "Dog", RDFS_SUBCLASS, KIND_IRI, E + "Mammal"),
        (E + "Mammal", RDFS_SUBCLASS, KIND_IRI, E + "Animal"),
        (E + "hasPet", RDFS_SUBPROP, KIND_IRI, E + "knows"),
        (E + "knows", RDFS_DOMAIN, KIND_IRI, E + "Person"),
        (E + "hasPet", RDFS_RANGE, KIND_IRI, E + "Animal"),
        # ABox
        (E + "rex", RDF_TYPE, KIND_IRI, E + "Dog"),
        (E + "ann", E + "hasPet", KIND_IRI, E + "rex"),
        (E + "ann", E + "name", KIND_LITERAL, "Ann"),
    ])


def test_rdfs_rules(ontology):
    got = spo(rdfs_closure(ontology))
    asserted = spo(ontology)
    derived = {
        # rdfs11 transitivity
        (E + "Dog", RDFS_SUBCLASS, E + "Animal"),
        # rdfs7: hasPet -> knows
        (E + "ann", E + "knows", E + "rex"),
        # rdfs2: domain of knows (via the rdfs7-derived triple)
        (E + "ann", RDF_TYPE, E + "Person"),
        # rdfs3: range of hasPet
        (E + "rex", RDF_TYPE, E + "Animal"),
        # rdfs9 over asserted and derived types
        (E + "rex", RDF_TYPE, E + "Mammal"),
    }
    assert got == asserted | derived


def test_delta_excludes_asserted(ontology):
    delta = spo(rdfs_closure(ontology, include_asserted=False))
    assert delta == {
        (E + "Dog", RDFS_SUBCLASS, E + "Animal"),
        (E + "ann", E + "knows", E + "rex"),
        (E + "ann", RDF_TYPE, E + "Person"),
        (E + "rex", RDF_TYPE, E + "Animal"),
        (E + "rex", RDF_TYPE, E + "Mammal"),
    }
    # a derived triple that is also asserted must drop out of the delta
    extra = ontology.sparkSession.createDataFrame(
        [(E + "rex", RDF_TYPE, KIND_IRI, E + "Mammal")], SCHEMA)
    delta2 = spo(rdfs_closure(ontology.unionByName(extra),
                              include_asserted=False))
    assert (E + "rex", RDF_TYPE, E + "Mammal") not in delta2


def test_deep_hierarchy_and_literal_range(spark):
    # 9-level class chain: pointer doubling needs ceil(log2 9) rounds
    rows = [(f"{E}c{i}", RDFS_SUBCLASS, KIND_IRI, f"{E}c{i+1}")
            for i in range(9)]
    rows.append((E + "x", RDF_TYPE, KIND_IRI, E + "c0"))
    # literal object must NOT receive a range type (rdfs3 guard)
    rows.append((E + "age", RDFS_RANGE, KIND_IRI, E + "Number"))
    rows.append((E + "x", E + "age", KIND_LITERAL, "7"))
    got = spo(rdfs_closure(df(spark, rows)))
    for i in range(10):
        assert (E + "x", RDF_TYPE, f"{E}c{i}") in got
    assert ("7", RDF_TYPE, E + "Number") not in got
    # closed TBox pairs materialized (rdfs11)
    assert (E + "c0", RDFS_SUBCLASS, E + "c9") in got


def test_no_schema_is_identity(spark):
    plain = df(spark, [(E + "a", E + "p", KIND_IRI, E + "b")])
    assert spo(rdfs_closure(plain)) == {(E + "a", E + "p", E + "b")}


def test_incremental_closure_equals_full(spark, ontology):
    """Under a fixed schema, closure(old ∪ delta) ==
    closure(old) ∪ closure(delta, tbox=schema): the increment is a
    single map-apply over the new batch, never rescanning old data."""
    delta = df(spark, [
        (E + "bob", E + "hasPet", KIND_IRI, E + "miu"),
        (E + "miu", RDF_TYPE, KIND_IRI, E + "Dog"),
    ])
    full = spo(rdfs_closure(ontology.unionByName(delta)))
    incr = spo(rdfs_closure(ontology)) | spo(
        rdfs_closure(delta, tbox=ontology))
    assert incr == full
    # the rdfs7/2/3/9 consequents really fired on the delta batch
    inc_only = spo(rdfs_closure(delta, tbox=ontology))
    assert (E + "bob", E + "knows", E + "miu") in inc_only
    assert (E + "bob", RDF_TYPE, E + "Person") in inc_only
    assert (E + "miu", RDF_TYPE, E + "Animal") in inc_only
    assert (E + "miu", RDF_TYPE, E + "Mammal") in inc_only


def test_explicit_tbox_ignores_inline_schema(spark):
    """When tbox= is given, schema statements inside the batch do NOT
    extend the rule maps (a delta that edits schema needs a full
    recompute — documented contract)."""
    batch = df(spark, [
        (E + "New", RDFS_SUBCLASS, KIND_IRI, E + "Thing"),
        (E + "x", RDF_TYPE, KIND_IRI, E + "New"),
    ])
    empty_tbox = df(spark, [])
    got = spo(rdfs_closure(batch, tbox=empty_tbox))
    assert (E + "x", RDF_TYPE, E + "Thing") not in got
    assert got == spo(batch)


@pytest.fixture(scope="module")
def aliased(spark):
    return df(spark, [
        # chain a1 - a2 - a3 (one class), b1 - b2 (another)
        (E + "a2", OWL_SAMEAS, KIND_IRI, E + "a1"),
        (E + "a2", OWL_SAMEAS, KIND_IRI, E + "a3"),
        (E + "b2", OWL_SAMEAS, KIND_IRI, E + "b1"),
        # malformed literal-valued sameAs: ignored
        (E + "a1", OWL_SAMEAS, KIND_LITERAL, "a9"),
        (E + "a3", E + "likes", KIND_IRI, E + "b2"),
        (E + "a1", E + "name", KIND_LITERAL, "A"),
        (E + "a3", E + "name", KIND_LITERAL, "A"),
        (E + "solo", E + "likes", KIND_IRI, E + "a2"),
    ])


def test_sameas_components(aliased):
    got = {(r.node, r.representative)
           for r in sameas_components(aliased).collect()}
    assert got == {
        (E + "a1", E + "a1"), (E + "a2", E + "a1"), (E + "a3", E + "a1"),
        (E + "b1", E + "b1"), (E + "b2", E + "b1"),
    }


def test_sameas_rewrite(aliased):
    got = spo(sameas_rewrite(aliased, broadcast_map=True))
    assert got == {
        # subjects and IRI objects rewritten; literal "a9" untouched
        (E + "a1", E + "likes", E + "b1"),
        # the two name triples merge into ONE row after smushing
        (E + "a1", E + "name", "A"),
        (E + "solo", E + "likes", E + "a1"),
    }
    n_name = sameas_rewrite(aliased).where(
        F.col("pred") == E + "name").count()
    assert n_name == 1
    # keep_sameas keeps exactly one self-loop marker per class
    kept = sameas_rewrite(aliased, keep_sameas=True)
    loops = {(r.subj, r.obj_lex) for r in kept.where(
        (F.col("pred") == OWL_SAMEAS)
        & (F.col("obj_kind") != KIND_LITERAL)).collect()}
    assert loops == {(E + "a1", E + "a1"), (E + "b1", E + "b1")}


def test_core_defaults_missing_obj_kind_to_iri(spark):
    # r4 ADVICE regression: a hand-built subj/pred/obj_lex frame (no
    # obj_kind column) must still drive TBox extraction — a null
    # obj_kind made the == IRI filters match nothing
    bare = spark.createDataFrame(
        [(E + "Dog", RDFS_SUBCLASS, E + "Animal"),
         (E + "rex", RDF_TYPE, E + "Dog"),
         (E + "a", OWL_SAMEAS, E + "b"),
         (E + "b", E + "name", "B")],
        "subj string, pred string, obj_lex string")
    got = spo(rdfs_closure(bare))
    assert (E + "rex", RDF_TYPE, E + "Animal") in got
    comp = {(r.node, r.representative)
            for r in sameas_components(bare).collect()}
    assert comp == {(E + "a", E + "a"), (E + "b", E + "a")}
