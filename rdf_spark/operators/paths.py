"""SPARQL 1.1 property-path evaluation over the canonical triple
table -> ``(src, dst)`` pair sets.

The reference stops at triple storage + pattern filters (graph.go:
17-48); BGP conjunctions and k-hop live in operators/graphops.py. This
module adds the remaining SPARQL path algebra as *composable
DataFrame operators* so a KG user can ask reachability questions
(`skos:broader+`, `(org:unit|org:memberOf)+/org:name`) without leaving
Spark:

  ``<iri>``    predicate step            -> one filtered projection
  ``^p``       inverse                    -> column swap
  ``p1/p2``    sequence                   -> one equi-join on the
                                            intermediate node
  ``p1|p2``    alternative                -> union + distinct
  ``p+``       one-or-more                -> pointer-doubling closure
                                            (graphalgo.transitive_closure)
  ``p*`` ``p?``  zero-or-more / zero-or-one -> closure/step unioned with
                                            the identity relation over
                                            the graph's term universe
                                            (SPARQL zero-length-path
                                            semantics: every term in
                                            the graph matches itself)
  ``!(<a>|<b>)`` negated property set      -> anti-filter on pred

Everything is set semantics (DISTINCT pair sets, per the SPARQL spec —
paths are not counted by multiplicity). Plan shape: predicate steps
are pushed-down filters on the scan; sequence/alternative stay
equi-join/union; only the ``+``/``*`` closures iterate, and they
inherit transitive_closure's O(log diameter) round count and its
convergence guard. Nothing in the evaluator touches the driver except
the closure's fixpoint count.

Scale note: as with transitive_closure, closures over dense relations
have inherently quadratic OUTPUT; scope ``+``/``*`` to hierarchy-like
predicates. The non-closure operators are linear in the edge sets.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graphalgo import transitive_closure


# --- AST -----------------------------------------------------------------

@dataclass(frozen=True)
class Link:
    iri: str


@dataclass(frozen=True)
class NegatedSet:
    iris: tuple[str, ...]


@dataclass(frozen=True)
class Inv:
    inner: object


@dataclass(frozen=True)
class Seq:
    left: object
    right: object


@dataclass(frozen=True)
class Alt:
    left: object
    right: object


@dataclass(frozen=True)
class Repeat:
    inner: object
    mod: str  # '+', '*', or '?'


# --- parser --------------------------------------------------------------

_TOKEN = re.compile(r"<[^<>\s]*>|[()|/^+*?!]|\S")


class PathSyntaxError(ValueError):
    pass


def parse_path(text: str):
    """Parse the SPARQL path grammar subset above into an AST.

    Grammar (SPARQL 1.1 §9.1, full-IRI terminals only — prefixed names
    are the caller's concern):

      Path     := Sequence ('|' Sequence)*
      Sequence := EltOrInv ('/' EltOrInv)*
      EltOrInv := '^' Elt | Elt
      Elt      := Primary ('+' | '*' | '?')?
      Primary  := '<iri>' | '!' '(' '<iri>' ('|' '<iri>')* ')'
                | '(' Path ')'
    """
    toks = _TOKEN.findall(text)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take(expected=None):
        nonlocal pos
        t = peek()
        if t is None or (expected is not None and t != expected):
            raise PathSyntaxError(
                f"expected {expected or 'a path token'} at position {pos} in {text!r}, got {t!r}"
            )
        pos += 1
        return t

    def primary():
        t = peek()
        if t == "(":
            take("(")
            inner = path()
            take(")")
            return inner
        if t == "!":
            take("!")
            take("(")
            iris = [take()]
            while peek() == "|":
                take("|")
                iris.append(take())
            take(")")
            bad = [i for i in iris if not (i.startswith("<") and i.endswith(">"))]
            if bad:
                raise PathSyntaxError(f"negated set expects <iri> members, got {bad}")
            return NegatedSet(tuple(i[1:-1] for i in iris))
        t = take()
        if t.startswith("<") and t.endswith(">"):
            return Link(t[1:-1])
        raise PathSyntaxError(f"unexpected token {t!r} in {text!r}")

    def elt():
        p = primary()
        if peek() in ("+", "*", "?"):
            p = Repeat(p, take())
        return p

    def elt_or_inv():
        if peek() == "^":
            take("^")
            return Inv(elt())
        return elt()

    def sequence():
        p = elt_or_inv()
        while peek() == "/":
            take("/")
            p = Seq(p, elt_or_inv())
        return p

    def path():
        p = sequence()
        while peek() == "|":
            take("|")
            p = Alt(p, sequence())
        return p

    out = path()
    if peek() is not None:
        raise PathSyntaxError(f"trailing tokens from {peek()!r} in {text!r}")
    return out


# --- evaluator -----------------------------------------------------------

def _identity(triples: DataFrame) -> DataFrame:
    """The zero-length-path relation: every term occurring in the
    graph (subject or object position, literals included) reaches
    itself."""
    nodes = (
        triples.select(F.col("subj").alias("n"))
        .unionByName(triples.select(F.col("obj_lex").alias("n")))
        .distinct()
    )
    return nodes.select(F.col("n").alias("src"), F.col("n").alias("dst"))


def _eval(ast, triples: DataFrame, max_rounds: int) -> DataFrame:
    if isinstance(ast, Link):
        return (
            triples.where(F.col("pred") == ast.iri)
            .select(F.col("subj").alias("src"), F.col("obj_lex").alias("dst"))
            .distinct()
        )
    if isinstance(ast, NegatedSet):
        return (
            triples.where(~F.col("pred").isin(*ast.iris))
            .select(F.col("subj").alias("src"), F.col("obj_lex").alias("dst"))
            .distinct()
        )
    if isinstance(ast, Inv):
        inner = _eval(ast.inner, triples, max_rounds)
        return inner.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    if isinstance(ast, Seq):
        a = _eval(ast.left, triples, max_rounds).alias("a")
        b = _eval(ast.right, triples, max_rounds).alias("b")
        return (
            a.join(b, F.col("a.dst") == F.col("b.src"))
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
            .distinct()
        )
    if isinstance(ast, Alt):
        a = _eval(ast.left, triples, max_rounds)
        b = _eval(ast.right, triples, max_rounds)
        return a.unionByName(b).distinct()
    if isinstance(ast, Repeat):
        inner = _eval(ast.inner, triples, max_rounds)
        if ast.mod == "?":
            return inner.unionByName(_identity(triples)).distinct()
        closed = transitive_closure(inner, max_rounds=max_rounds)
        if ast.mod == "+":
            return closed
        return closed.unionByName(_identity(triples)).distinct()
    raise TypeError(f"not a path AST node: {ast!r}")


def eval_path(
    triples: DataFrame, path: str | object, max_rounds: int = 16
) -> DataFrame:
    """Evaluate a property path over a triple table -> the DISTINCT
    ``(src, dst)`` pair relation. ``path`` is either a path-expression
    string (see :func:`parse_path`) or a pre-built AST node.

    ``max_rounds`` bounds each ``+``/``*`` closure (pointer doubling:
    handles path lengths up to 2^max_rounds; raises rather than
    silently under-reporting, per transitive_closure)."""
    ast = parse_path(path) if isinstance(path, str) else path
    return _eval(ast, triples, max_rounds)


# graph-label/node separator for the composite-node encoding below.
# NUL never occurs in a graph label (graph position holds IRIs or
# blank-node labels, both NUL-free), and the split takes the FIRST
# NUL, so node content after it survives verbatim.
_GSEP = "\x00"


def eval_path_per_graph(
    quads: DataFrame, path: str | object, max_rounds: int = 16
) -> DataFrame:
    """Evaluate a property path WITHIN each named graph of a quad
    table -> the DISTINCT ``(graph, src, dst)`` relation (SPARQL
    ``GRAPH ?g { ?a <p>+ ?b }`` semantics: the path never crosses
    graph boundaries, and ?g ranges over NAMED graphs only — rows
    with a null graph label are the default graph and excluded,
    per spec §13.3).

    Composite-node encoding: each node is prefixed with its graph
    label (``g NUL node``) and the ordinary single-graph evaluator
    runs over the rewritten edges — an edge only ever connects
    same-graph composites, so sequences, alternatives and the
    pointer-doubling closures are per-graph BY CONSTRUCTION, with no
    per-graph loop, no groupBy, and the same O(log diameter) round
    count as the merged-graph evaluator.  The zero-length relation
    (``*``/``?``) is likewise scoped to each graph's own term
    universe.  One extra projection each way; no extra shuffle."""
    named = quads.where(F.col("graph").isNotNull())
    composite = named.select(
        "pred",
        F.concat(F.col("graph"), F.lit(_GSEP), F.col("subj")).alias("subj"),
        F.concat(F.col("graph"), F.lit(_GSEP),
                 F.col("obj_lex")).alias("obj_lex"),
    )
    pairs = eval_path(composite, path, max_rounds=max_rounds)

    def split(col):
        g = F.substring_index(col, _GSEP, 1)
        node = col.substr(F.length(g) + F.lit(2), F.length(col))
        return g, node

    g, src = split(F.col("src"))
    _, dst = split(F.col("dst"))
    return pairs.select(g.alias("graph"), src.alias("src"),
                        dst.alias("dst"))
