"""BGP matching + k-hop traversal (rdf_spark.operators.graphops)."""

import pytest

from pyspark.sql import functions as F

from rdf_spark.operators.graphops import bgp_match, khop_neighbors

SCHEMA = (
    "url string, subj_kind tinyint, subj string, pred string, "
    "obj_kind tinyint, obj_lex string, obj_datatype string, "
    "obj_lang string, graph_kind tinyint, graph string"
)


@pytest.fixture(scope="module")
def kg(spark):
    E = "http://ex/"
    rows = [
        ("u", 0, E + "a", E + "knows", 0, E + "b", None, None, None, None),
        ("u", 0, E + "b", E + "knows", 0, E + "c", None, None, None, None),
        ("u", 0, E + "c", E + "knows", 0, E + "d", None, None, None, None),
        ("u", 0, E + "a", E + "name", 2, "Alice", None, None, None, None),
        ("u", 0, E + "b", E + "name", 2, "Bob", None, None, None, None),
        ("u", 0, E + "loop", E + "knows", 0, E + "loop", None, None, None, None),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_bgp_two_patterns(kg):
    E = "http://ex/"
    got = sorted(
        tuple(r) for r in bgp_match(
            kg, [("?x", E + "knows", "?y"), ("?x", E + "name", "?n")]
        ).collect()
    )
    assert got == [(E + "a", E + "b", "Alice"), (E + "b", E + "c", "Bob")]


def test_bgp_chain_join(kg):
    E = "http://ex/"
    got = sorted(
        tuple(r) for r in bgp_match(
            kg, [("?x", E + "knows", "?y"), ("?y", E + "knows", "?z")]
        ).collect()
    )
    assert (E + "a", E + "b", E + "c") in got
    assert (E + "b", E + "c", E + "d") in got
    assert (E + "loop", E + "loop", E + "loop") in got


def test_bgp_repeated_var_in_one_pattern(kg):
    E = "http://ex/"
    got = [tuple(r) for r in bgp_match(kg, [("?x", E + "knows", "?x")]).collect()]
    assert got == [(E + "loop",)]


def test_bgp_cross_join_refused(kg):
    E = "http://ex/"
    with pytest.raises(ValueError, match="cross join"):
        bgp_match(kg, [("?x", E + "knows", "?y"), ("?a", E + "name", "?b")])


def test_bgp_constant_filter_pushed_to_scan(spark, tmp_path, kg):
    p = str(tmp_path / "t.parquet")
    kg.write.parquet(p)
    t = spark.read.parquet(p)
    df = bgp_match(t, [("?x", "http://ex/name", "?n")])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(pred,http://ex/name)" in plan  # PushedFilters


def test_khop_min_hops_and_early_stop(spark, kg):
    E = "http://ex/"
    start = spark.createDataFrame([(E + "a",)], "subj string")
    got = {r["entity"]: r["hops"]
           for r in khop_neighbors(kg, start, k=10).collect()}
    assert got == {E + "a": 0, E + "b": 1, E + "c": 2, E + "d": 3}


def test_bgp_path_pattern_composes_with_plain_pattern(kg):
    # everyone transitively known from ?x, with ?x's name — the path
    # pattern's closure pairs equi-join the name pattern on ?x
    E = "http://ex/"
    got = sorted(
        tuple(r) for r in bgp_match(
            kg, [("?x", f"<{E}knows>+", "?y"), ("?x", E + "name", "?n")]
        ).collect()
    )
    assert got == [
        (E + "a", E + "b", "Alice"),
        (E + "a", E + "c", "Alice"),
        (E + "a", E + "d", "Alice"),
        (E + "b", E + "c", "Bob"),
        (E + "b", E + "d", "Bob"),
    ]


def test_bgp_path_pattern_constant_endpoint_and_inverse(kg):
    E = "http://ex/"
    got = sorted(
        tuple(r) for r in bgp_match(
            kg, [(E + "d", f"^<{E}knows>+", "?who"),
                 ("?who", E + "name", "?n")]
        ).collect()
    )
    assert got == [(E + "a", "Alice"), (E + "b", "Bob")]


def test_bgp_path_pattern_repeated_endpoint_var(kg):
    E = "http://ex/"
    got = [tuple(r) for r in
           bgp_match(kg, [("?x", f"<{E}knows>+", "?x")]).collect()]
    assert got == [(E + "loop",)]


def test_bgp_empty_string_predicate_is_a_constant_not_a_path(kg):
    # regression: '' must filter pred == '' (empty result), not be
    # routed to the path parser
    got = bgp_match(kg, [("?x", "", "?y")]).collect()
    assert got == []
