"""Knowledge fusion (operators/fuse.py): latest/majority conflict
resolution vs hand-computed winners (ties, NULL timestamps, weighted
support) and fuzzy entity linking vs an independent python
edit-distance scan (within the documented blocking recall contract)."""

import datetime

import pytest
from pyspark.sql import functions as F

from rdf_spark.operators.fuse import fuzzy_link, latest_values, majority_vote


def _ts(day):
    return datetime.datetime(2026, 1, day)


class TestLatestValues:
    def test_latest_wins_and_ties_break_canonically(self, spark):
        rows = [
            ("s1", "p", "old", _ts(1)),
            ("s1", "p", "new", _ts(9)),
            # s2: two claims at the same instant -> min obj_lex wins
            ("s2", "p", "bbb", _ts(5)),
            ("s2", "p", "aaa", _ts(5)),
            # s3: only NULL-ts claims -> still resolved
            ("s3", "p", "only", None),
            # s4: NULL ts loses to any timestamped claim
            ("s4", "p", "nullts", None),
            ("s4", "p", "dated", _ts(2)),
        ]
        df = spark.createDataFrame(
            rows, "subj string, pred string, obj_lex string, warc_ts timestamp"
        )
        got = {(r.subj, r.obj_lex) for r in latest_values(df).collect()}
        assert got == {
            ("s1", "new"), ("s2", "aaa"), ("s3", "only"), ("s4", "dated")
        }


class TestMajorityVote:
    def test_counts_and_ties(self, spark):
        rows = [
            ("s1", "p", "x"), ("s1", "p", "x"), ("s1", "p", "y"),
            # s2: 1-1 tie -> min obj_lex
            ("s2", "p", "b"), ("s2", "p", "a"),
        ]
        df = spark.createDataFrame(rows, "subj string, pred string, obj_lex string")
        got = {(r.subj, r.obj_lex, r.support) for r in majority_vote(df).collect()}
        assert got == {("s1", "x", 2), ("s2", "a", 1)}

    def test_weighted_support(self, spark):
        rows = [
            ("s1", "p", "rare_but_trusted", 10),
            ("s1", "p", "common", 3),
            ("s1", "p", "common", 3),
        ]
        df = spark.createDataFrame(
            rows, "subj string, pred string, obj_lex string, support long"
        )
        got = majority_vote(df, support_col="support").collect()
        assert [(r.obj_lex, r.support) for r in got] == [("rare_but_trusted", 10)]


DICT = [
    ("Germany", "ex:de"),
    ("France", "ex:fr"),
    ("Greece", "ex:gr"),
]


class TestFuzzyLink:
    def _dict(self, spark):
        return spark.createDataFrame(DICT, "surface string, canonical_iri string")

    def test_exact_case_and_typo_matches(self, spark):
        mentions = spark.createDataFrame(
            [("germany",), ("Francce",), ("Grece",), ("Zimbabwe",)],
            "mention string",
        )
        got = {
            (r.mention, r.canonical_iri, r.dist)
            for r in fuzzy_link(mentions, self._dict(spark)).collect()
        }
        # Zimbabwe: no candidate within 2 edits -> dropped
        assert got == {
            ("germany", "ex:de", 0),
            ("Francce", "ex:fr", 1),
            ("Grece", "ex:gr", 1),
        }

    def test_best_match_tie_breaks_to_min_surface(self, spark):
        d = spark.createDataFrame(
            [("abcd", "ex:1"), ("abce", "ex:2")],
            "surface string, canonical_iri string",
        )
        m = spark.createDataFrame([("abcf",)], "mention string")
        got = fuzzy_link(m, d).collect()
        assert [(r.canonical_iri, r.dist) for r in got] == [("ex:1", 1)]

    def test_matches_python_scan_within_blocking_contract(self, spark):
        # randomized-ish deterministic corpus: interior edits only, so
        # the first-char blocking misses nothing and the operator must
        # equal a full O(n*m) python scan
        surfaces = ["alpha", "bravo", "charlie", "delta", "echo", "alphb"]
        d = spark.createDataFrame(
            [(s, f"ex:{s}") for s in surfaces],
            "surface string, canonical_iri string",
        )
        mentions = ["alpa", "brravo", "charlee", "dlta", "exho", "zulu", "alp"]
        m = spark.createDataFrame([(x,) for x in mentions], "mention string")

        def lev(a, b):
            import numpy as np
            dp = np.arange(len(b) + 1)
            for i, ca in enumerate(a, 1):
                prev, dp[0] = dp[0], i
                for j, cb in enumerate(b, 1):
                    prev, dp[j] = dp[j], min(
                        dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                    )
            return int(dp[len(b)])

        want = {}
        for x in mentions:
            best = sorted(
                (
                    (lev(x.lower(), s.lower()), s)
                    for s in surfaces
                    if lev(x.lower(), s.lower()) <= 2
                ),
            )
            if best:
                want[x] = (f"ex:{best[0][1]}", best[0][0])
        got = {
            r.mention: (r.canonical_iri, r.dist)
            for r in fuzzy_link(m, d).collect()
        }
        assert got == want

    def test_duplicate_surface_is_deterministic_min_iri(self, spark):
        d = spark.createDataFrame(
            [("Georgia", "ex:us-state"), ("Georgia", "ex:country")],
            "surface string, canonical_iri string",
        )
        m = spark.createDataFrame([("georgia",)], "mention string")
        for _ in range(3):
            got = fuzzy_link(m, d).collect()
            assert [(r.canonical_iri, r.dist) for r in got] == [("ex:country", 0)]

    def test_no_window_exchange_best_match_is_partial_agg(self, spark):
        # the best-match reduction must partial-combine map-side: a
        # window rank over the mention key would pile a hot mention's
        # candidates into one partition
        m = spark.createDataFrame([("Germany",)], "mention string")
        d = spark.createDataFrame(
            [("Germany", "ex:de")], "surface string, canonical_iri string"
        )
        plan = fuzzy_link(m, d)._jdf.queryExecution().executedPlan().toString()
        assert "partial_min" in plan, plan
        assert "Window" not in plan, plan


class TestResolveFunctional:
    SCHEMA = "subj string, pred string, obj_lex string, support long"

    def _kg(self, spark):
        rows = [
            # name is functional and contested: 'Alice' has support 3
            ("s1", "name", "Alice", 3),
            ("s1", "name", "alice", 1),
            # knows is multi-valued and must pass through untouched
            ("s1", "knows", "s2", 1),
            ("s1", "knows", "s3", 1),
            ("s2", "name", "Bob", 2),
        ]
        return spark.createDataFrame(rows, self.SCHEMA)

    def test_majority_fuses_only_listed_predicates(self, spark):
        from rdf_spark.operators.fuse import resolve_functional

        got = resolve_functional(self._kg(spark), ["name"])
        rows = {tuple(r) for r in got.collect()}
        assert rows == {
            ("s1", "name", "Alice", 3),
            ("s1", "knows", "s2", 1),
            ("s1", "knows", "s3", 1),
            ("s2", "name", "Bob", 2),
        }
        # schema is preserved exactly
        assert got.columns == ["subj", "pred", "obj_lex", "support"]

    def test_latest_requires_ts_and_validates_strategy(self, spark):
        from rdf_spark.operators.fuse import resolve_functional

        kg = self._kg(spark)
        with pytest.raises(ValueError, match="requires ts_col"):
            resolve_functional(kg, ["name"], strategy="latest")
        with pytest.raises(ValueError, match="strategy"):
            resolve_functional(kg, ["name"], strategy="newest")

    def test_latest_strategy_picks_most_recent_claim_row(self, spark):
        from rdf_spark.operators.fuse import resolve_functional

        rows = [
            ("s1", "name", "Old", _ts(1)),
            ("s1", "name", "New", _ts(8)),
            ("s1", "knows", "s2", _ts(1)),
        ]
        kg = spark.createDataFrame(
            rows, "subj string, pred string, obj_lex string, warc_ts timestamp"
        )
        got = {(r.subj, r.pred, r.obj_lex) for r in resolve_functional(
            kg, ["name"], strategy="latest", ts_col="warc_ts").collect()}
        assert got == {("s1", "name", "New"), ("s1", "knows", "s2")}
