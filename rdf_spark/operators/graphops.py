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
