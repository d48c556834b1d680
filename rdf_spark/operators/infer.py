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
    metadata columns the caller's frame lacks (subj_kind AND obj_kind
    default to IRI: every parser in this repo emits them, but
    hand-built test frames often carry only subj/pred/obj_lex — and a
    null obj_kind would make the TBox ``obj_kind == IRI`` filters and
    sameAs literal guards evaluate to NULL and silently match
    nothing)."""
    cols = []
    for c in _CORE:
        if c in triples.columns:
            cols.append(F.col(c))
        elif c in ("subj_kind", "obj_kind"):
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
    tbox: DataFrame | None = None,
) -> DataFrame:
    """Materialize the RDFS (rho-df) closure of a triple table.

    Rules applied (names from the RDF Semantics spec):

    - rdfs5/11: transitivity of subPropertyOf / subClassOf (TBox side,
      pointer doubling);
    - rdfs7: ``(s p o), (p subPropertyOf+ q) -> (s q o)`` — the
      derived triple keeps the original object metadata
      (datatype/lang), since only the predicate changed;
    - rdfs2: ``(s p o), (p domain c) -> (s rdf:type c)``, with domain
      looked up through the subPropertyOf closure (rdfs7 feeds it);
    - rdfs3: ``(s p o), (p range c), o not a literal ->
      (o rdf:type c)``;
    - rdfs9: ``(s rdf:type c), (c subClassOf+ d) -> (s rdf:type d)``,
      applied to asserted AND domain/range-derived type triples.

    SINGLE instance pass: the rule consequents are pre-folded into
    four schema-sized lookup maps —

    - ``pred -> [superproperties]``            (rdfs7)
    - ``pred -> [type classes via domain]``    (rdfs2 ∘ rdfs7 ∘ rdfs9:
      domains of the predicate AND its superproperties, each already
      lifted through the subClassOf closure)
    - ``pred -> [type classes via range]``     (rdfs3, same folding)
    - ``class -> [superclasses]``              (rdfs9 on asserted types)

    — so the instance table is scanned ONCE, left-broadcast-joined
    against the four maps, and every derived triple comes out of one
    ``explode`` over the concatenated consequent arrays.  The only
    wide exchange on the instance path is the final
    duplicate-collapsing ``distinct``, keyed on the full triple (no
    skew hot-spot beyond genuine duplicate triples).  At 10^12
    instance triples the alternative — a union of per-rule branches —
    re-scans the corpus once per rule; this form does not.

    Out of scope (documented, standard for rho-df materializers):
    axiomatic triples (rdfs4a/4b, container membership), literal
    generalization, and schema entailed *by* instance joins (e.g. a
    property declared ``subPropertyOf rdf:type``).

    Returns the 7-column triple core, deduplicated. With
    ``include_asserted=False`` only the DERIVED triples (closure minus
    the asserted input) are returned — the Iceberg-friendly delta to
    append next to the raw layer.

    Incremental maintenance: because the rule maps depend only on the
    TBox, the closure of ``old ∪ delta`` under a FIXED schema is
    ``closure(old) ∪ closure(delta, tbox=schema)`` — pass the already-
    known schema triples via ``tbox`` and feed ONLY the new batch as
    ``triples``; the closure increment never rescans old data.  (If
    the delta itself changes the schema, recompute from scratch — a
    new subClassOf edge can entail types for *old* instances.)  When
    ``tbox`` is given, schema statements inside ``triples`` are
    deliberately NOT merged into the rule maps.
    """
    inst = _core(triples)

    # Extract the TBox in ONE filtered, column-pruned pass and pin it
    # with an eager localCheckpoint: every downstream schema frame
    # (edges, closures, refl sets, the four maps) derives from this
    # schema-sized cache instead of re-scanning the corpus per rule.
    tbox = (
        (_core(tbox) if tbox is not None else inst).where(
            F.col("pred").isin(RDFS_SUBPROP, RDFS_SUBCLASS,
                               RDFS_DOMAIN, RDFS_RANGE)
            & (F.col("obj_kind") == KIND_IRI))
        .select("subj", "pred", "obj_lex")
        .localCheckpoint(eager=True)
    )
    prop_edges = tbox.where(F.col("pred") == RDFS_SUBPROP).select(
        F.col("subj").alias("src"), F.col("obj_lex").alias("dst")
    )
    cls_edges = tbox.where(F.col("pred") == RDFS_SUBCLASS).select(
        F.col("subj").alias("src"), F.col("obj_lex").alias("dst")
    )
    prop_pairs = _closure_pairs(prop_edges, max_schema_rounds)
    cls_pairs = _closure_pairs(cls_edges, max_schema_rounds)
    dom = tbox.where(F.col("pred") == RDFS_DOMAIN).select(
        F.col("subj").alias("__p"), F.col("obj_lex").alias("__cls")
    ).distinct()
    rng = tbox.where(F.col("pred") == RDFS_RANGE).select(
        F.col("subj").alias("__p"), F.col("obj_lex").alias("__cls")
    ).distinct()

    # ---- fold the rule graph into schema-sized maps (all tiny) ----
    # reflexive subProp pairs: {p} ∪ sp+(p) for every p with a domain/
    # range/superproperty — lets one join cover "p or any superprop"
    sp_refl = prop_pairs.unionByName(
        prop_pairs.select("src").union(dom.select(F.col("__p")))
        .union(rng.select(F.col("__p"))).distinct()
        .select(F.col("src"), F.col("src").alias("dst"))
    ).distinct()
    sc_refl = cls_pairs.unionByName(
        cls_pairs.select("src").union(dom.select(F.col("__cls")))
        .union(rng.select(F.col("__cls"))).distinct()
        .select(F.col("src"), F.col("src").alias("dst"))
    ).distinct()

    def _pred_type_map(pc, alias):
        """pred -> [classes]: (p sp* q), (q dom/rng c), (c sc* d) -> d."""
        lifted = (
            sp_refl.join(F.broadcast(pc), sp_refl["dst"] == pc["__p"])
            .select(F.col("src").alias("__pred"), F.col("__cls"))
            .join(F.broadcast(sc_refl), F.col("__cls") == sc_refl["src"])
            .select("__pred", sc_refl["dst"].alias("__cls2"))
            .distinct()
        )
        return lifted.groupBy("__pred").agg(
            F.collect_list("__cls2").alias(alias))

    sp_map = prop_pairs.groupBy("src").agg(
        F.collect_list("dst").alias("__sups")
    ).withColumnRenamed("src", "__sp_p")
    dom_map = _pred_type_map(dom, "__dom_types").withColumnRenamed(
        "__pred", "__dom_p")
    rng_map = _pred_type_map(rng, "__rng_types").withColumnRenamed(
        "__pred", "__rng_p")
    sc_map = cls_pairs.groupBy("src").agg(
        F.collect_list("dst").alias("__sup_cls")
    ).withColumnRenamed("src", "__sc_c")

    # ---- ONE pass over the instance table -------------------------
    empty_s = F.array().cast("array<string>")
    joined = (
        inst
        .join(F.broadcast(sp_map), inst["pred"] == F.col("__sp_p"), "left")
        .join(F.broadcast(dom_map), inst["pred"] == F.col("__dom_p"), "left")
        .join(F.broadcast(rng_map), inst["pred"] == F.col("__rng_p"), "left")
        .join(F.broadcast(sc_map),
              (inst["pred"] == RDF_TYPE) & (inst["obj_lex"] == F.col("__sc_c")),
              "left")
    )

    def mk(subj_kind, subj, pred, obj_kind, obj_lex, dt, lang):
        return F.struct(
            subj_kind.cast("tinyint").alias("subj_kind"),
            subj.alias("subj"), pred.alias("pred"),
            obj_kind.cast("tinyint").alias("obj_kind"),
            obj_lex.alias("obj_lex"), dt.alias("obj_datatype"),
            lang.alias("obj_lang"),
        )

    k = F.col("subj_kind")
    iri = F.lit(KIND_IRI)
    null_s = F.lit(None).cast("string")
    self_row = F.array(mk(k, F.col("subj"), F.col("pred"), F.col("obj_kind"),
                          F.col("obj_lex"), F.col("obj_datatype"),
                          F.col("obj_lang")))
    sup_rows = F.transform(
        F.coalesce(F.col("__sups"), empty_s),
        lambda q: mk(k, F.col("subj"), q, F.col("obj_kind"),
                     F.col("obj_lex"), F.col("obj_datatype"),
                     F.col("obj_lang")))
    dom_rows = F.transform(
        F.coalesce(F.col("__dom_types"), empty_s),
        lambda c: mk(k, F.col("subj"), F.lit(RDF_TYPE), iri, c,
                     null_s, null_s))
    rng_rows = F.when(
        F.col("obj_kind") == KIND_LITERAL, F.array().cast(
            "array<struct<subj_kind:tinyint,subj:string,pred:string,"
            "obj_kind:tinyint,obj_lex:string,obj_datatype:string,"
            "obj_lang:string>>")
    ).otherwise(F.transform(
        F.coalesce(F.col("__rng_types"), empty_s),
        lambda c: mk(F.col("obj_kind"), F.col("obj_lex"), F.lit(RDF_TYPE),
                     iri, c, null_s, null_s)))
    sc_rows = F.transform(
        F.coalesce(F.col("__sup_cls"), empty_s),
        lambda d: mk(k, F.col("subj"), F.lit(RDF_TYPE), iri, d,
                     null_s, null_s))

    consequents = F.concat(sup_rows, dom_rows, rng_rows, sc_rows)
    if include_asserted:
        consequents = F.concat(self_row, consequents)
    exploded = (
        joined.select(F.explode(consequents).alias("t"))
        .select([F.col(f"t.{c}").alias(c) for c in _CORE])
    )

    # rdfs5/11: the closed TBox pairs ARE derived schema triples
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

    tbox_derived = schema_triple(prop_pairs, RDFS_SUBPROP).unionByName(
        schema_triple(cls_pairs, RDFS_SUBCLASS)
    )

    out = exploded.unionByName(tbox_derived)
    if include_asserted:
        return out.distinct()
    # the delta excludes anything already asserted; null-safe equality
    # because the metadata columns (datatype/lang) are usually NULL
    asserted = inst.alias("a")
    cond = None
    for c in _CORE:
        eq = F.col(f"d.{c}").eqNullSafe(F.col(f"a.{c}"))
        cond = eq if cond is None else cond & eq
    return out.alias("d").join(asserted, cond, "left_anti").distinct()


def sameas_components(triples: DataFrame, max_iters: int = 25) -> DataFrame:
    """owl:sameAs equivalence classes -> ``(node, representative)``
    where representative is the minimum IRI in the class (canonical
    and deterministic). Literal-valued sameAs statements are ignored
    (malformed data, not an identity). Nodes with no sameAs edge are
    absent — they represent themselves."""
    from .graphalgo import connected_components

    edges = _core(triples).where(
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
