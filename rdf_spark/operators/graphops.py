"""Relational operators over triple collections (SURVEY.md §2.4):
triple-pattern filters (R1/R2), insert/delete (R3/R4), group-by-graph
(R7), subject map (R10). All plain DataFrame ops — Catalyst pushes the
equality filters into the scan (R2's wildcard semantics: None = match
anything, reference graph.go:17-39)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def find_all(
    triples: DataFrame,
    subj: str | None = None,
    pred: str | None = None,
    obj: str | None = None,
    graph: str | None = None,
) -> DataFrame:
    """Triple-pattern filter; None = wildcard (reference Graph.FindAll,
    graph.go:29-39). Predicates push down to the parquet scan."""
    out = triples
    if subj is not None:
        out = out.where(F.col("subj") == subj)
    if pred is not None:
        out = out.where(F.col("pred") == pred)
    if obj is not None:
        out = out.where(F.col("obj_lex") == obj)
    if graph is not None:
        out = out.where(F.col("graph") == graph)
    return out


def find(triples: DataFrame, **kw) -> DataFrame:
    """First match (reference Graph.Find, graph.go:17-26)."""
    return find_all(triples, **kw).limit(1)


def add(triples: DataFrame, new_triples: DataFrame) -> DataFrame:
    """Insert (reference Graph.Add, graph.go:11-14)."""
    return triples.unionByName(new_triples, allowMissingColumns=True)


def remove(triples: DataFrame, doomed: DataFrame, key_cols=None) -> DataFrame:
    """Delete matching triples (reference Graph.Remove, graph.go:41-48 —
    set semantics here: removes ALL equal rows; production target is an
    Iceberg MERGE/row-level delete)."""
    key_cols = key_cols or ["subj", "pred", "obj_lex"]
    return triples.join(doomed.select(*key_cols), on=key_cols, how="left_anti")


def graphs(triples: DataFrame) -> DataFrame:
    """Group by graph label (reference nquads Graphs(), doc.go:81-91):
    per-graph triple counts + distinct subjects."""
    return triples.groupBy("graph").agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("subj").alias("n_subjects"),
    )


def predicate_object_map(triples: DataFrame) -> DataFrame:
    """Per-subject predicate->objects map (reference turtle
    SubjectMap/PredicateObjectMap, doc.go:398-417, 1120-1127)."""
    return triples.groupBy("subj").agg(
        F.collect_list(F.struct(F.col("pred"), F.col("obj_lex"))).alias("po")
    )


def bgp_match(
    triples: DataFrame, patterns, path_max_rounds: int = 16,
    keep_kinds: bool = False,
) -> DataFrame:
    """SPARQL-style basic-graph-pattern matching: conjunctive
    triple patterns with shared variables -> a bindings DataFrame
    (one column per variable).

    ``patterns`` is a list of (subj, pred, obj) — or (subj, pred,
    obj, graph) for named-graph patterns over a quad table — where a
    string starting with ``?`` is a variable and anything else is a
    constant (IRI/literal lexical form); None is a don't-care
    wildcard. A 4-tuple requires a ``graph`` column (raises
    otherwise).

    The predicate position also accepts a SPARQL property-path
    expression (recognized by its first character ``<``, ``^``, ``!``
    or ``(`` — the operators/paths.py syntax, full-IRI terminals):
    that pattern's relation becomes the evaluated ``(src, dst)`` pair
    set instead of a triple scan, so `` (?a, "<broader>+/<label>",
    ?l) `` composes closures with ordinary patterns through the same
    shared-variable equi-joins. A path pattern binds its endpoints
    (no predicate variable); in a 4-tuple a constant graph scopes
    the path to that one named graph, and a graph VARIABLE evaluates
    the path per named graph and binds it (eval_path_per_graph);
    ``path_max_rounds`` bounds the path's ``+``/``*`` closures (see
    paths.eval_path). Caveat: a path pattern's relation is evaluated
    over the WHOLE graph before constant-endpoint filters apply — a
    closure anchored at one constant still computes the graph-wide
    closure, so for single-seed reachability prefer khop_neighbors
    (a seeded frontier expansion) over ``(const, "<p>+", ?x)``.

    Spark-first design (no reference counterpart — the reference stops
    at single-pattern Find/FindAll, graph.go:17-39): each pattern is a
    constant-filtered projection of the triple table (filters push
    into the scan) and shared variables become equi-join keys.
    Catalyst orders/chooses the joins — with the triple table bucketed
    by subject (cluster_for_write), subject-subject joins co-locate.
    A pattern sharing NO variable with the ones before it raises
    (a cross join is never implicit at scale)."""
    if not patterns:
        raise ValueError("empty pattern list")
    pos_cols = {"subj": "subj", "pred": "pred", "obj": "obj_lex",
                "graph": "graph"}
    # with keep_kinds, a subject- or object-position variable also
    # carries `<var>__kind/__datatype/__lang` columns (term metadata
    # for CONSTRUCT templates — subject kind distinguishes blank
    # nodes from IRIs so a bnode-subject binding is not re-emitted as
    # an IRI); emitted once per variable across patterns, first
    # position seen wins (both positions bind the same term for a
    # shared variable, so either copy is authoritative)
    kinded: set[str] = set()

    def one(p):
        if len(p) == 4:
            s, pr, o, gr = p
            if gr is not None and "graph" not in triples.columns:
                raise ValueError(
                    "graph-position pattern over a triple table with "
                    "no 'graph' column")
        else:
            (s, pr, o), gr = p, None
        if isinstance(pr, str) and pr[:1] in ("<", "^", "!", "("):
            from .paths import eval_path, eval_path_per_graph

            gr_var = isinstance(gr, str) and gr.startswith("?")
            if gr is None:
                # no GRAPH clause: the path runs over the merged graph
                pairs = eval_path(triples, pr,
                                  max_rounds=path_max_rounds)
            elif gr_var:
                # GRAPH ?g: per-named-graph evaluation, ?g becomes a
                # bound column (composite-node encoding — see
                # paths.eval_path_per_graph)
                pairs = eval_path_per_graph(triples, pr,
                                            max_rounds=path_max_rounds)
            else:
                # GRAPH <iri>: scope the edge set (and the
                # zero-length term universe) to that one graph
                # BEFORE evaluation — the filter pushes into the scan
                pairs = eval_path(triples.where(F.col("graph") == gr),
                                  pr, max_rounds=path_max_rounds)
            df = pairs
            cols = []
            seen = {}
            endpoints = [("src", s), ("dst", o)]
            if gr_var:
                endpoints.append(("graph", gr))
            for col, val in endpoints:
                if val is None:
                    continue
                if isinstance(val, str) and val.startswith("?"):
                    var = val[1:]
                    if var in seen:  # same var at both endpoints
                        df = df.where(F.col(col) == F.col(seen[var]))
                    else:
                        seen[var] = col
                        cols.append(F.col(col).alias(var))
                else:
                    df = df.where(F.col(col) == val)
            return df.select(*cols), set(seen)
        df = triples
        cols = []
        seen = {}
        for pos, val in zip(("subj", "pred", "obj", "graph"),
                            (s, pr, o, gr)):
            col = pos_cols[pos]
            if val is None:
                continue
            if isinstance(val, str) and val.startswith("?"):
                var = val[1:]
                if var in seen:  # same var twice within one pattern
                    df = df.where(F.col(col) == F.col(seen[var]))
                else:
                    seen[var] = col
                    cols.append(F.col(col).alias(var))
                    if (keep_kinds and pos in ("subj", "obj")
                            and var not in kinded):
                        kinded.add(var)
                        null_s = F.lit(None).cast("string")
                        null_k = F.lit(None).cast("tinyint")
                        have = set(triples.columns)
                        kind_col = pos + "_kind"
                        cols.append(
                            (F.col(kind_col) if kind_col in have
                             else null_k).alias(f"{var}__kind"))
                        if pos == "obj":
                            cols.extend([
                                (F.col("obj_datatype")
                                 if "obj_datatype" in have
                                 else null_s).alias(f"{var}__datatype"),
                                (F.col("obj_lang") if "obj_lang" in have
                                 else null_s).alias(f"{var}__lang"),
                            ])
                        else:
                            # subjects are IRI/BLANK — no datatype/lang
                            cols.extend([
                                null_s.alias(f"{var}__datatype"),
                                null_s.alias(f"{var}__lang"),
                            ])
            else:
                df = df.where(F.col(col) == val)
        return df.select(*cols), set(seen)

    out, bound = one(patterns[0])
    order = list(out.columns)
    for p in patterns[1:]:
        df, vs = one(p)
        shared = sorted(bound & vs)
        if not shared:
            raise ValueError(
                f"pattern {p!r} shares no variable with previous patterns "
                "(would be a cross join)"
            )
        out = out.join(df, on=shared)
        bound |= vs
        order += [c for c in df.columns if c not in order]
    return out.select(*order)  # variables in first-seen order


def graph_profile(triples: DataFrame) -> DataFrame:
    """Schema discovery over an unknown KG: per-predicate usage stats
    ``(pred, n_triples, n_subjects, n_objects, n_iri_objects,
    n_literal_objects)`` — the first report anyone runs on a freshly
    constructed graph (which predicates exist, their fan-out, whether
    they are object or datatype properties).

    One shuffle on pred; counts partial-aggregate map-side. The
    distinct counts are exact (two expand-style distinct aggregates) —
    at 10^12 triples swap in approx_count_distinct for a sketch-sized
    plan; exact is kept here so the DuckDB oracle can replay it."""
    from ..terms import KIND_IRI, KIND_LITERAL

    return triples.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("subj").alias("n_subjects"),
        F.countDistinct("obj_lex").alias("n_objects"),
        F.sum((F.col("obj_kind") == KIND_IRI).cast("long")).alias("n_iri_objects"),
        F.sum((F.col("obj_kind") == KIND_LITERAL).cast("long")).alias(
            "n_literal_objects"
        ),
    )


def khop_neighbors(triples: DataFrame, start_subjects: DataFrame,
                   k: int = 2) -> DataFrame:
    """Entities reachable from ``start_subjects`` (column ``subj``) in
    at most k hops along IRI objects: (entity, hops) with hops = the
    minimum hop count. Each round is one equi-join frontier expansion
    + an anti-join against the visited set (classic distributed BFS;
    bounded k keeps the loop driver-side and the lineage shallow via
    localCheckpoint)."""
    from ..terms import KIND_IRI

    edges = (
        triples.where(F.col("obj_kind") == KIND_IRI)
        .select(F.col("subj").alias("src"), F.col("obj_lex").alias("dst"))
        .distinct()
    )
    visited = start_subjects.select(
        F.col("subj").alias("entity")
    ).distinct().withColumn("hops", F.lit(0)).localCheckpoint()
    frontier = visited
    for depth in range(1, k + 1):
        nxt = (
            edges.join(frontier, edges.src == frontier.entity)
            .select(F.col("dst").alias("entity"))
            .distinct()
            .join(visited.select("entity"), "entity", "left_anti")
            .withColumn("hops", F.lit(depth))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return visited
