"""Training-data curation operators (rdf_spark.operators.curation +
functions.text.repetition_ratio)."""

from pyspark.sql import functions as F

from rdf_spark.operators.curation import (
    boilerplate_lines,
    remove_boilerplate,
    stratified_sample,
)


def _docs(spark):
    rows = [
        (1, "MENU\nalpha one\nFOOTER"),
        (2, "MENU\nbeta two\nmid unique\nFOOTER"),
        (3, "MENU\ngamma three\nFOOTER"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_detection(spark):
    bp = {r["line"]: r["n_docs"] for r in
          boilerplate_lines(_docs(spark), min_docs=2).collect()}
    assert bp == {"MENU": 3, "FOOTER": 3}


def test_remove_boilerplate_preserves_order(spark):
    out = {r["doc_id"]: r["text"] for r in
           remove_boilerplate(_docs(spark), min_docs=2).collect()}
    assert out == {1: "alpha one", 2: "beta two\nmid unique",
                   3: "gamma three"}


def test_remove_boilerplate_counts_docs_not_occurrences(spark):
    # a line repeated 5x inside ONE doc is content, not boilerplate
    rows = [(1, "echo\necho\necho\necho\necho"), (2, "other")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert boilerplate_lines(docs, min_docs=2).count() == 0
    out = {r["doc_id"]: r["text"] for r in
           remove_boilerplate(docs, min_docs=2).collect()}
    assert out[1] == "echo\necho\necho\necho\necho"


def test_remove_boilerplate_keeps_all_doc_ids(spark):
    # a doc whose EVERY line is boilerplate (and an empty doc) must
    # survive as an empty-text row, not vanish from the output
    rows = [(1, "SHARED\nunique one"), (2, "SHARED\nunique two"),
            (3, "SHARED"), (4, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text"] for r in
           remove_boilerplate(docs, min_docs=2).collect()}
    assert out == {1: "unique one", 2: "unique two", 3: "", 4: ""}


def test_cap_per_domain(spark):
    """Subdomains of one registrable domain share a single budget;
    order_col keeps the BEST rows, default keeps the lowest ids."""
    from rdf_spark.operators.curation import cap_per_domain

    rows = [
        (1, "http://a.example.co.uk/1", 0.9),
        (2, "http://b.example.co.uk/2", 0.5),
        (3, "http://example.co.uk/3", 0.7),
        (4, "http://other.com/4", 0.1),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string, q double")
    ids = {r["doc_id"] for r in cap_per_domain(docs, 2).collect()}
    assert ids == {1, 2, 4}  # example.co.uk budget=2 -> lowest ids
    best = {r["doc_id"]
            for r in cap_per_domain(docs, 2, order_col="q").collect()}
    assert best == {1, 3, 4}  # highest q wins within the shared budget
    # schema passes through unchanged
    assert cap_per_domain(docs, 2).columns == ["doc_id", "url", "q"]


def test_cap_per_domain_salted_equals_global_topn(spark):
    """The two-phase salted ranking must equal the global top-N for a
    single hot domain (the skew case the salting exists for)."""
    from rdf_spark.operators.curation import cap_per_domain

    rows = [(i, "http://hot.example.com/%d" % i, float((i * 37) % 101))
            for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id long, url string, q double")
    got = {r["doc_id"]
           for r in cap_per_domain(docs, 20, order_col="q").collect()}
    want = {i for i, _, _ in
            sorted(rows, key=lambda r: (-r[2], r[0]))[:20]}
    assert got == want and len(got) == 20


def test_stratified_sample_deterministic_and_subset(spark):
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    a = sorted(r["doc_id"] for r in
               stratified_sample(df, "lang", {"en": 0.5, "de": 0.1}).collect())
    b = sorted(r["doc_id"] for r in
               stratified_sample(df, "lang", {"en": 0.5, "de": 0.1}).collect())
    assert a == b and len(a) > 0
    # rates land near the requested fractions (hash-uniformity)
    en = sum(1 for i in a if i % 2 == 0) / 1000
    de = sum(1 for i in a if i % 2 == 1) / 1000
    assert 0.4 < en < 0.6 and 0.05 < de < 0.16
    # smaller fraction selects a subset of the larger one (nested samples)
    small = set(r["doc_id"] for r in
                stratified_sample(df, "lang", {"en": 0.2, "de": 0.1}).collect()
                if r["lang"] == "en")
    big = set(i for i in a if i % 2 == 0)
    assert small <= big


def test_repetition_ratio_edges(spark):
    from rdf_spark.functions.text import repetition_ratio

    rows = [(1, "a b c a b c a b c"),   # 7 grams, 3 distinct
            (2, "all words unique here now"),
            (3, "too short")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["r"] for r in
           df.select("doc_id", repetition_ratio(F.col("text")).alias("r")).collect()}
    assert got[1] == round(1 - 3 / 7, 4)
    assert got[2] == 0.0
    assert got[3] == 0.0
