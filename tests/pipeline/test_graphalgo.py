"""Graph analytics/integrity operators (operators/graphalgo.py):
PageRank vs an independent numpy power iteration, transitive closure
vs itertools reachability (incl. cycles + convergence raise), graph
diff and dangling-refs vs hand-computed sets."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rdf_spark.operators.graphalgo import (
    apply_diff,
    dangling_refs,
    graph_diff,
    pagerank,
    transitive_closure,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _np_pagerank(pairs, iters, d=0.85):
    nodes = sorted({x for p in pairs for x in p})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    edges = {(idx[a], idx[b]) for a, b in pairs}
    out = np.zeros(n)
    for a, _ in edges:
        out[a] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dang = r[out == 0].sum()
        nxt = np.full(n, (1 - d) / n + d * dang / n)
        for a, b in edges:
            nxt[b] += d * r[a] / out[a]
        r = nxt
    return dict(zip(nodes, r))


class TestPageRank:
    def test_matches_numpy_power_iteration(self, spark):
        pairs = [
            ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
            ("d", "c"), ("e", "c"), ("f", "e"),
            # g is dangling (no out-edges), referenced by a hub
            ("c", "g"),
        ]
        got = {
            r["node"]: r["rank"]
            for r in pagerank(_edges(spark, pairs), iters=5).collect()
        }
        want = _np_pagerank(pairs, iters=5)
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-12)

    def test_mass_conserved_with_dangling(self, spark):
        # star into a dangling sink: without redistribution sum < 1
        pairs = [(f"s{i}", "sink") for i in range(6)]
        df = pagerank(_edges(spark, pairs), iters=4)
        total = df.agg(F.sum("rank")).collect()[0][0]
        assert total == pytest.approx(1.0, abs=1e-12)

    def test_duplicate_edges_are_set_semantics(self, spark):
        once = pagerank(_edges(spark, [("a", "b"), ("b", "a")]), iters=3)
        twice = pagerank(
            _edges(spark, [("a", "b"), ("a", "b"), ("b", "a")]), iters=3
        )
        assert sorted(once.collect()) == sorted(twice.collect())


class TestTransitiveClosure:
    def _want(self, pairs):
        adj = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
        out = set()
        for start in {x for p in pairs for x in p}:
            seen, stack = set(), [start]
            while stack:
                for nxt in adj.get(stack.pop(), ()):
                    if nxt not in seen:
                        seen.add(nxt)
                        stack.append(nxt)
            out |= {(start, x) for x in seen}
        return out

    def test_chain_and_branch(self, spark):
        pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("b", "e")]
        got = {(r.src, r.dst) for r in
               transitive_closure(_edges(spark, pairs)).collect()}
        assert got == self._want(pairs)

    def test_cycle_converges(self, spark):
        pairs = [("a", "b"), ("b", "c"), ("c", "a")]
        got = {(r.src, r.dst) for r in
               transitive_closure(_edges(spark, pairs)).collect()}
        assert got == self._want(pairs)
        assert ("a", "a") in got  # self-reachability through the cycle

    def test_long_chain_logarithmic_rounds(self, spark):
        # depth 40 chain closes within 6 doubling rounds (2^6 >= 40);
        # round 7 observes the fixpoint
        pairs = [(f"n{i}", f"n{i+1}") for i in range(40)]
        got = transitive_closure(_edges(spark, pairs), max_rounds=7)
        assert got.count() == 40 * 41 // 2

    def test_unconverged_raises(self, spark):
        pairs = [(f"n{i}", f"n{i+1}") for i in range(9)]
        with pytest.raises(RuntimeError, match="did not converge"):
            # path length 9 needs 2^k >= 9 -> 4 rounds; 2 is not enough
            transitive_closure(_edges(spark, pairs), max_rounds=2)


class TestGraphDiff:
    def test_added_removed_only(self, spark):
        cols = "subj string, pred string, obj_lex string"
        old = spark.createDataFrame(
            [("s1", "p", "o1"), ("s2", "p", "o2"), ("s3", "p", "o3")], cols
        )
        new = spark.createDataFrame(
            # s2 unchanged (duplicated row: set semantics), s1 removed,
            # s4 added
            [("s2", "p", "o2"), ("s2", "p", "o2"),
             ("s3", "p", "o3"), ("s4", "p", "o4")],
            cols,
        )
        got = {(r.subj, r.change) for r in graph_diff(old, new).collect()}
        assert got == {("s4", "added"), ("s1", "removed")}


class TestApplyDiff:
    COLS = "subj string, pred string, obj_lex string"

    def test_roundtrip_recovers_new_snapshot(self, spark):
        old = spark.createDataFrame(
            [("s1", "p", "o1"), ("s2", "p", "o2"), ("s3", "p", "o3")],
            self.COLS,
        )
        new = spark.createDataFrame(
            [("s2", "p", "o2"), ("s3", "p", "o3b"), ("s4", "p", "o4")],
            self.COLS,
        )
        got = apply_diff(old, graph_diff(old, new))
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, new.distinct().collect())
        )

    def test_empty_diff_is_identity_set(self, spark):
        old = spark.createDataFrame(
            [("s1", "p", "o1"), ("s1", "p", "o1")], self.COLS
        )
        got = apply_diff(old, graph_diff(old, old))
        assert sorted(map(tuple, got.collect())) == [("s1", "p", "o1")]


class TestDanglingRefs:
    def test_counts_object_only_iris(self, spark):
        from rdf_spark.terms import KIND_IRI, KIND_LITERAL

        rows = [
            # s1 described, references s2 (described) and ghost (not)
            ("s1", "p", KIND_IRI, "s2"),
            ("s1", "p", KIND_IRI, "ghost"),
            ("s2", "p", KIND_IRI, "ghost"),
            # literal objects never count as references
            ("s2", "q", KIND_LITERAL, "ghost"),
        ]
        t = spark.createDataFrame(
            rows, "subj string, pred string, obj_kind tinyint, obj_lex string"
        )
        got = {(r.iri, r.n_refs) for r in dangling_refs(t).collect()}
        assert got == {("ghost", 2)}


def test_transitive_closure_rejects_unknown_unconverged_mode(spark):
    e = _edges(spark, [("a", "b")])
    with pytest.raises(ValueError, match="on_unconverged"):
        transitive_closure(e, on_unconverged="Raise")


class TestConnectedComponents:
    def test_components_are_min_reachable_label(self, spark):
        from rdf_spark.operators.graphalgo import connected_components

        # two components: {a,b,c} (via chain) and {x,y}
        e = _edges(spark, [("b", "a"), ("c", "b"), ("x", "y")])
        got = {(r.node, r.component)
               for r in connected_components(e).collect()}
        assert got == {
            ("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")
        }

    def test_direction_is_ignored(self, spark):
        from rdf_spark.operators.graphalgo import connected_components

        fwd = connected_components(_edges(spark, [("a", "b"), ("b", "c")]))
        rev = connected_components(_edges(spark, [("c", "b"), ("b", "a")]))
        assert sorted(map(tuple, fwd.collect())) == sorted(map(tuple, rev.collect()))


def test_property_graph_bnode_links_become_edges(spark):
    from rdf_spark.operators.graphalgo import property_graph

    rows = [
        ("u", 0, "http://ex/a", "http://ex/addr", 1, "b1", None, None,
         None, None),
        ("u", 1, "b1", "http://ex/city", 2, "London", None, None,
         None, None),
        ("u", 0, "http://ex/a",
         "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", 0,
         "http://ex/Person", None, None, None, None),
    ]
    t = spark.createDataFrame(
        rows,
        "url string, subj_kind tinyint, subj string, pred string, "
        "obj_kind tinyint, obj_lex string, obj_datatype string, "
        "obj_lang string, graph_kind tinyint, graph string")
    nodes, edges = property_graph(t)
    e = {(r["src"], r["rel"], r["dst"]) for r in edges.collect()}
    # the bnode link IS an edge (not a literal property), with the
    # _: prefix disambiguating bnode ids from IRIs
    assert ("http://ex/a", "http://ex/addr", "_:b1") in e
    n = {r["id"]: (r["labels"], r["n_props"]) for r in nodes.collect()}
    assert n["http://ex/a"] == ("http://ex/Person", 0)  # no literal props
    assert n["_:b1"] == ("", 1)  # the city literal
    assert "http://ex/Person" not in [s for s, _, _ in e]
