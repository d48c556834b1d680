"""Lightweight ontology reasoning for the constructed KG: RDFS
forward-chaining materialization and owl:sameAs smushing.

The reference library (0x51-dev/rdf) stores and serializes triples but
performs no entailment; construction pipelines at web scale almost
always materialize the RDFS closure (so downstream pattern queries hit
plain equi-joins instead of reasoning) and merge co-referent entities.

Scale design — the one that survives 10^12 instance triples: the
schema (TBox: subClassOf / subPropertyOf / domain / range triples) is
orders of magnitude smaller than the instance data, so

1. close the TBox FIRST with the existing pointer-doubling
   ``transitive_closure`` (rdfs5/rdfs11 — O(log depth) rounds over a
   schema-sized frame), then
2. apply ALL instance rules (rdfs2/3/7/9) in ONE pass of broadcast
   joins against the closed schema — the 10^12-row side is never
   shuffled and never iterated.

This is the standard two-stage split (schema closure, then a single
map-side instance pass) used by distributed RDFS materializers; it is
complete for the rho-df fragment (subClassOf, subPropertyOf, domain,
range) under the usual assumption that instance triples do not define
new schema (no rdfs:subClassOf statements *derived* from instance
joins). Axiomatic triples (rdfs4a/4b resource-typing, container
membership properties, literal generalization) are deliberately out of
scope — they add a triple per node, not information.

owl:sameAs smushing reuses the pointer-doubling min-label
``connected_components`` kernel: the sameAs graph collapses to one
canonical representative per equivalence class (minimum IRI —
deterministic), and subjects/objects are rewritten through the
node->representative map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..terms import KIND_IRI, KIND_LITERAL

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
RDFS_SUBPROP = "http://www.w3.org/2000/01/rdf-schema#subPropertyOf"
RDFS_DOMAIN = "http://www.w3.org/2000/01/rdf-schema#domain"
RDFS_RANGE = "http://www.w3.org/2000/01/rdf-schema#range"
OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"

_CORE = ("subj_kind", "subj", "pred", "obj_kind", "obj_lex",
         "obj_datatype", "obj_lang")


def _core(triples: DataFrame) -> DataFrame:
    """Project onto the canonical 7-column triple core, null-filling
    metadata columns the caller's frame lacks (subj_kind defaults to
    IRI: every parser in this repo emits it, but hand-built test
    frames often carry only subj/pred/obj columns)."""
    cols = []
    for c in _CORE:
        if c in triples.columns:
            cols.append(F.col(c))
        elif c == "subj_kind":
            cols.append(F.lit(KIND_IRI).cast("tinyint").alias(c))
        else:
            cols.append(F.lit(None).cast("string").alias(c))
    return triples.select(*cols)


def _closure_pairs(edges: DataFrame, max_rounds: int) -> DataFrame:
    """Transitive closure of a schema-sized edge list as ``(src,
    dst)`` pairs, src != dst paths included per rdfs5/rdfs11."""
    from .graphalgo import transitive_closure

    return transitive_closure(edges, max_rounds=max_rounds)


def rdfs_closure(
    triples: DataFrame,
    include_asserted: bool = True,
    max_schema_rounds: int = 16,
) -> DataFrame:
    """Materialize the RDFS (rho-df) closure of a triple table.

    Rules applied (names from the RDF Semantics spec):

    - rdfs5/11: transitivity of subPropertyOf / subClassOf (TBox side,
      pointer doubling);
    - rdfs7: ``(s p o), (p subPropertyOf+ q) -> (s q o)`` — the
      derived triple keeps the original object metadata
      (datatype/lang), since only the predicate changed;
    - rdfs2: ``(s p o), (p domain c) -> (s rdf:type c)``, with domain
      looked up through the subPropertyOf closure (the rdfs7 output
      feeds it);
    - rdfs3: ``(s p o), (p range c), o not a literal ->
      (o rdf:type c)``;
    - rdfs9: ``(s rdf:type c), (c subClassOf+ d) -> (s rdf:type d)``,
      applied to asserted AND rule-derived type triples.

    One instance pass: every join broadcasts a schema-sized frame
    (closed subPropertyOf pairs, closed subClassOf pairs, domain and
    range maps), so the instance side is map-only until the final
    ``distinct`` — the one shuffle, and it is keyed on the full triple
    (no skew hot-spot beyond genuine duplicate triples).

    Returns the 7-column triple core, deduplicated. With
    ``include_asserted=False`` only the DERIVED triples (closure minus
    the asserted input) are returned — the Iceberg-friendly delta to
    append next to the raw layer.
    """
    inst = _core(triples)

    is_iri = F.col("obj_kind") == KIND_IRI
    prop_edges = inst.where((F.col("pred") == RDFS_SUBPROP) & is_iri).select(
        F.col("subj").alias("src"), F.col("obj_lex").alias("dst")
    )
    cls_edges = inst.where((F.col("pred") == RDFS_SUBCLASS) & is_iri).select(
        F.col("subj").alias("src"), F.col("obj_lex").alias("dst")
    )
    prop_pairs = _closure_pairs(prop_edges, max_schema_rounds)
    cls_pairs = _closure_pairs(cls_edges, max_schema_rounds)
    dom = inst.where((F.col("pred") == RDFS_DOMAIN) & is_iri).select(
        F.col("subj").alias("__p"), F.col("obj_lex").alias("__cls")
    ).distinct()
    rng = inst.where((F.col("pred") == RDFS_RANGE) & is_iri).select(
        F.col("subj").alias("__p"), F.col("obj_lex").alias("__cls")
    ).distinct()

    def type_triple(subj_kind, subj, cls):
        return (
            subj_kind.alias("subj_kind"), subj.alias("subj"),
            F.lit(RDF_TYPE).alias("pred"),
            F.lit(KIND_IRI).cast("tinyint").alias("obj_kind"),
            cls.alias("obj_lex"),
            F.lit(None).cast("string").alias("obj_datatype"),
            F.lit(None).cast("string").alias("obj_lang"),
        )

    def schema_triple(pairs, pred_iri):
        return pairs.select(
            F.lit(KIND_IRI).cast("tinyint").alias("subj_kind"),
            F.col("src").alias("subj"),
            F.lit(pred_iri).alias("pred"),
            F.lit(KIND_IRI).cast("tinyint").alias("obj_kind"),
            F.col("dst").alias("obj_lex"),
            F.lit(None).cast("string").alias("obj_datatype"),
            F.lit(None).cast("string").alias("obj_lang"),
        )

    # rdfs5/11: the closed TBox pairs ARE derived schema triples
    tbox_derived = schema_triple(prop_pairs, RDFS_SUBPROP).unionByName(
        schema_triple(cls_pairs, RDFS_SUBCLASS)
    )

    # rdfs7: predicate rewrite through the closed subPropertyOf pairs
    derived_props = (
        inst.join(F.broadcast(prop_pairs), inst["pred"] == prop_pairs["src"])
        .select(
            "subj_kind", "subj", F.col("dst").alias("pred"),
            "obj_kind", "obj_lex", "obj_datatype", "obj_lang",
        )
    )
    all_props = inst.unionByName(derived_props)

    # rdfs2/rdfs3 over asserted + rdfs7-derived predicates
    types_dom = (
        all_props.join(F.broadcast(dom), all_props["pred"] == dom["__p"])
        .select(*type_triple(F.col("subj_kind"), F.col("subj"),
                             F.col("__cls")))
    )
    types_rng = (
        all_props.where(F.col("obj_kind") != KIND_LITERAL)
        .join(F.broadcast(rng), all_props["pred"] == rng["__p"])
        .select(*type_triple(F.col("obj_kind"), F.col("obj_lex"),
                             F.col("__cls")))
    )
    all_types = (
        inst.where(F.col("pred") == RDF_TYPE)
        .select(*_CORE)
        .unionByName(types_dom)
        .unionByName(types_rng)
    )

    # rdfs9: lift every type triple through the closed subClassOf pairs
    derived_types = (
        all_types.join(F.broadcast(cls_pairs),
                       all_types["obj_lex"] == cls_pairs["src"])
        .select(*type_triple(F.col("subj_kind"), F.col("subj"),
                             F.col("dst")))
    )

    derived = (
        tbox_derived
        .unionByName(derived_props)
        .unionByName(types_dom)
        .unionByName(types_rng)
        .unionByName(derived_types)
    )
    if include_asserted:
        return inst.unionByName(derived).distinct()
    # the delta excludes anything already asserted; null-safe equality
    # because the metadata columns (datatype/lang) are usually NULL
    asserted = inst.alias("a")
    cond = None
    for c in _CORE:
        eq = F.col(f"d.{c}").eqNullSafe(F.col(f"a.{c}"))
        cond = eq if cond is None else cond & eq
    return derived.alias("d").join(asserted, cond, "left_anti").distinct()


def sameas_components(triples: DataFrame, max_iters: int = 25) -> DataFrame:
    """owl:sameAs equivalence classes -> ``(node, representative)``
    where representative is the minimum IRI in the class (canonical
    and deterministic). Literal-valued sameAs statements are ignored
    (malformed data, not an identity). Nodes with no sameAs edge are
    absent — they represent themselves."""
    from .graphalgo import connected_components

    edges = triples.where(
        (F.col("pred") == OWL_SAMEAS) & (F.col("obj_kind") != KIND_LITERAL)
    ).select(F.col("subj").alias("src"), F.col("obj_lex").alias("dst"))
    return connected_components(edges, max_iters=max_iters).select(
        F.col("node"), F.col("component").alias("representative")
    )


def sameas_rewrite(
    triples: DataFrame,
    keep_sameas: bool = False,
    broadcast_map: bool = False,
    max_iters: int = 25,
) -> DataFrame:
    """Smush owl:sameAs equivalence classes: rewrite every subject and
    every non-literal object to its class representative (minimum IRI)
    and deduplicate the merged triples.

    Scale shape: the node->representative map covers only
    sameAs-connected nodes — typically orders of magnitude smaller
    than the KG. With ``broadcast_map=True`` both rewrites are
    broadcast joins (instance side map-only until the final
    duplicate-collapsing ``distinct``); the default is two shuffled
    left equi-joins keyed on subj / obj_lex, which is the safe choice
    when the alias map itself is huge. sameAs triples collapse to
    self-loops after rewriting and are dropped unless
    ``keep_sameas=True`` (which keeps exactly one
    ``rep owl:sameAs rep`` loop per class as a marker).
    """
    inst = _core(triples)
    comp = sameas_components(triples, max_iters=max_iters)
    m = F.broadcast(comp) if broadcast_map else comp

    smushed_subj = (
        inst.join(m.withColumnRenamed("node", "__sn"),
                  F.col("subj") == F.col("__sn"), "left")
        .withColumn("subj", F.coalesce(F.col("representative"), F.col("subj")))
        .drop("__sn", "representative")
    )
    out = (
        smushed_subj.join(
            m.withColumnRenamed("node", "__on"),
            (F.col("obj_kind") != KIND_LITERAL)
            & (F.col("obj_lex") == F.col("__on")), "left")
        .withColumn("obj_lex",
                    F.coalesce(F.col("representative"), F.col("obj_lex")))
        .drop("__on", "representative")
    )
    if not keep_sameas:
        out = out.where(F.col("pred") != OWL_SAMEAS)
    return out.distinct()
