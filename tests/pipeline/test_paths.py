"""Property-path engine (operators/paths.py): parser shape/precedence,
each operator against a tiny independent Python evaluator, SPARQL
zero-length-path semantics, and set semantics under duplicate
triples."""

import pytest
from pyspark.sql import functions as F

from rdf_spark.operators.paths import (
    Alt,
    Inv,
    Link,
    NegatedSet,
    PathSyntaxError,
    Repeat,
    Seq,
    eval_path,
    parse_path,
)

TRIPLE_COLS = "subj string, pred string, obj_lex string"


def _triples(spark, rows):
    return spark.createDataFrame(rows, TRIPLE_COLS)


def _pairs(df):
    return {(r.src, r.dst) for r in df.collect()}


# independent reference evaluator over python sets -----------------------

def _py_eval(ast, rows):
    terms = {s for s, _, _ in rows} | {o for _, _, o in rows}
    ident = {(t, t) for t in terms}
    if isinstance(ast, Link):
        return {(s, o) for s, p, o in rows if p == ast.iri}
    if isinstance(ast, NegatedSet):
        return {(s, o) for s, p, o in rows if p not in ast.iris}
    if isinstance(ast, Inv):
        return {(b, a) for a, b in _py_eval(ast.inner, rows)}
    if isinstance(ast, Seq):
        a, b = _py_eval(ast.left, rows), _py_eval(ast.right, rows)
        return {(x, w) for x, y in a for z, w in b if y == z}
    if isinstance(ast, Alt):
        return _py_eval(ast.left, rows) | _py_eval(ast.right, rows)
    if isinstance(ast, Repeat):
        base = _py_eval(ast.inner, rows)
        if ast.mod == "?":
            return base | ident
        closed = set(base)
        while True:
            nxt = closed | {(x, w) for x, y in closed for z, w in closed if y == z}
            if nxt == closed:
                break
            closed = nxt
        return closed if ast.mod == "+" else closed | ident
    raise TypeError(ast)


class TestParser:
    def test_alt_binds_looser_than_seq(self):
        ast = parse_path("<a>/<b>|<c>")
        assert ast == Alt(Seq(Link("a"), Link("b")), Link("c"))

    def test_inverse_binds_one_element(self):
        ast = parse_path("^<a>/<b>")
        assert ast == Seq(Inv(Link("a")), Link("b"))

    def test_modifier_binds_primary_and_parens_group(self):
        assert parse_path("<a>+") == Repeat(Link("a"), "+")
        assert parse_path("(<a>/<b>)*") == Repeat(Seq(Link("a"), Link("b")), "*")

    def test_negated_set(self):
        assert parse_path("!(<a>|<b>)") == NegatedSet(("a", "b"))

    @pytest.mark.parametrize(
        "bad", ["<a>/", "(<a>", "<a> <b>", "!(<a>", "^", "<a>|"]
    )
    def test_syntax_errors(self, bad):
        with pytest.raises(PathSyntaxError):
            parse_path(bad)


ROWS = [
    ("o1", "in", "c1"), ("o2", "in", "c1"), ("c1", "in", "n1"),
    ("c2", "in", "n1"), ("n1", "memberOf", "r1"),
    ("n2", "memberOf", "r1"), ("n1", "label", "North"),
]


class TestEval:
    @pytest.mark.parametrize(
        "expr",
        [
            "<in>",
            "^<in>",
            "<in>/<in>",
            "<in>|<memberOf>",
            "<in>+",
            "<in>*",
            "<memberOf>?",
            "!(<in>|<label>)",
            "<in>*/<memberOf>",
            "(<in>|<memberOf>)+",
            "^<memberOf>/<label>",
        ],
    )
    def test_matches_python_reference(self, spark, expr):
        df = _triples(spark, ROWS)
        got = _pairs(eval_path(df, expr))
        want = _py_eval(parse_path(expr), ROWS)
        assert got == want, expr

    def test_star_identity_includes_literals(self, spark):
        # zero-length paths match every term in the graph — including
        # the literal "North" in object position
        df = _triples(spark, ROWS)
        got = _pairs(eval_path(df, "<in>*"))
        assert ("North", "North") in got

    def test_cycle_plus_converges(self, spark):
        df = _triples(spark, [("a", "p", "b"), ("b", "p", "a")])
        assert _pairs(eval_path(df, "<p>+")) == {
            ("a", "b"), ("b", "a"), ("a", "a"), ("b", "b")
        }

    def test_duplicate_triples_are_set_semantics(self, spark):
        df = _triples(spark, [("a", "p", "b"), ("a", "p", "b")])
        out = eval_path(df, "<p>")
        assert out.count() == 1

    def test_closure_bound_raises(self, spark):
        rows = [(f"n{i}", "p", f"n{i+1}") for i in range(9)]
        with pytest.raises(RuntimeError, match="did not converge"):
            eval_path(_triples(spark, rows), "<p>+", max_rounds=2)


def test_eval_path_per_graph(spark):
    from rdf_spark.operators.paths import eval_path_per_graph

    E = "http://ex/"
    quads = spark.createDataFrame(
        [(E + "a", E + "p", E + "b", E + "g1"),
         (E + "b", E + "p", E + "c", E + "g1"),
         (E + "c", E + "p", E + "d", E + "g2"),
         (E + "x", E + "p", E + "y", None)],
        "subj string, pred string, obj_lex string, graph string")
    plus = {(r.graph, r.src, r.dst)
            for r in eval_path_per_graph(quads, f"<{E}p>+").collect()}
    assert plus == {(E + "g1", E + "a", E + "b"),
                    (E + "g1", E + "a", E + "c"),
                    (E + "g1", E + "b", E + "c"),
                    (E + "g2", E + "c", E + "d")}
    # '*' zero-length identity is scoped to EACH graph's term
    # universe: a self-matches only in g1; c occurs in both graphs
    # (object in g1, subject in g2) so it self-matches in both
    star = {(r.graph, r.src, r.dst)
            for r in eval_path_per_graph(quads, f"<{E}p>*").collect()}
    assert star >= plus
    idents = star - plus
    assert (E + "g1", E + "a", E + "a") in idents
    assert (E + "g2", E + "a", E + "a") not in idents
    assert (E + "g1", E + "c", E + "c") in idents
    assert (E + "g2", E + "c", E + "c") in idents
    assert not any(g is None for g, _, _ in star)
