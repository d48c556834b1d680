"""URL functions (rdf_spark.functions.web) — edge cases beyond the
contract corpus."""

from pyspark.sql import functions as F

from rdf_spark.functions.web import registrable_domain, url_host, url_normalize


def _one(spark, url, fn):
    df = spark.createDataFrame([(url,)], "u string")
    return df.select(fn(F.col("u")).alias("v")).first()["v"]


def test_host_and_normalize_edges(spark):
    cases = {
        # no authority: only the fragment is stripped
        "urn:isbn:12345#frag": ("", "urn:isbn:12345"),
        # non-default port kept, host lowercased
        "http://A.B.C:8080/p?q=1#f": ("a.b.c", "http://a.b.c:8080/p?q=1"),
        # default https port dropped
        "https://X.example:443": ("x.example", "https://x.example"),
        # root path '/' dropped
        "http://x.example/": ("x.example", "http://x.example"),
        # non-root trailing slash kept
        "http://x.example/a/": ("x.example", "http://x.example/a/"),
        # query without path kept
        "http://x.example?q=2": ("x.example", "http://x.example?q=2"),
    }
    for url, (host, norm) in cases.items():
        assert _one(spark, url, url_host) == host, url
        assert _one(spark, url, url_normalize) == norm, url


def test_registrable_domain_heuristic(spark):
    assert _one(spark, "http://a.b.example.com/x", registrable_domain) == "example.com"
    assert _one(spark, "http://localhost/x", registrable_domain) == ""
    assert _one(spark, "mailto:x@y.z", registrable_domain) == ""
