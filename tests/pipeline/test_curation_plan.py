"""End-to-end curation plan (rdf_spark.plans.curation): planted
boilerplate, junk, exact dups and near dups are dropped in order,
everything else survives, and a re-run is identical."""

import pytest

from rdf_spark.plans.curation import curate_corpus

GOOD = ("the quick brown fox jumps over the lazy dog and then "
        "runs far away into the quiet woods to rest for a while "
        "before returning home at dusk with calm steady steps")


def _corpus(spark):
    near = GOOD.replace("dusk", "dawn")        # near-dup of GOOD
    rows = [
        (1, "BANNER\n" + GOOD + "\nFOOTER", "http://a.example.com/1", "en"),
        (2, "BANNER\n" + GOOD + "\nFOOTER", "http://b.example.com/2", "en"),
        (3, "BANNER\n" + near + "\nFOOTER", "http://a.example.com/3", "en"),
        (4, "BANNER\ntoo short\nFOOTER", "http://a.example.com/4", "en"),
        (5, "BANNER\n" + GOOD.replace("fox", "cat") + "\nFOOTER",
         "http://c.example.com/5", "de"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, url string, lang string"
    )


@pytest.fixture(scope="module")
def result(spark):
    # boilerplate threshold 3: BANNER/FOOTER (5 docs) are template,
    # but the GOOD body shared by the two exact-dup docs (2 docs) is
    # NOT — so the dup pair reaches the exact-dedup stage intact
    return curate_corpus(
        _corpus(spark), min_tokens=20, boilerplate_min_docs=3,
        num_hashes=4, url_col="url",
    )


def test_stage_order_and_counts(result):
    rep = dict(result.report())
    assert rep["input"] == 5
    assert rep["boilerplate"] == 5          # rows survive, text shrinks
    assert rep["quality"] == 4              # doc 4 too_short
    assert rep["exact_dedup"] == 3          # doc 2 == doc 1 byte-identical
    assert rep["near_dedup"] <= 3           # doc 3 may cluster with doc 1
    assert list(result.stages) == ["input", "boilerplate", "quality",
                                   "exact_dedup", "near_dedup"]


def test_boilerplate_stripped_columns_ride_along(result):
    rows = {r["doc_id"]: r for r in result.stages["boilerplate"].collect()}
    assert "BANNER" not in rows[1]["text"] and "FOOTER" not in rows[1]["text"]
    assert rows[1]["url"] == "http://a.example.com/1"
    assert rows[1]["lang"] == "en"


def test_exact_dup_keeps_min_id(result):
    kept = {r["doc_id"] for r in result.stages["exact_dedup"].collect()}
    assert 1 in kept and 2 not in kept


def test_rerun_identical(spark, result):
    again = curate_corpus(
        _corpus(spark), min_tokens=20, boilerplate_min_docs=3,
        num_hashes=4, url_col="url",
    )
    a = sorted(r["doc_id"] for r in result.kept.collect())
    b = sorted(r["doc_id"] for r in again.kept.collect())
    assert a == b


def test_domain_cap_and_sampling_stages(spark):
    docs = _corpus(spark)
    r = curate_corpus(
        docs, min_tokens=5, boilerplate_min_docs=None, num_hashes=4,
        url_col="url", max_docs_per_domain=1,
        lang_col="lang", lang_fractions={"en": 1.0, "de": 1.0},
    )
    assert "domain_cap" in r.stages and "sample" in r.stages
    kept = {row["doc_id"] for row in r.kept.collect()}
    # every distinct registrable domain contributes at most 1 doc
    doms = [row["url"].split("/")[2].split(".", 1)[1]
            for row in r.kept.collect()]
    assert len(doms) == len(set(doms))
    assert kept  # sampling at fraction 1.0 drops nothing


def test_span_dedup_stage(spark):
    """span_ngram turns on cross-doc duplicated-span removal between
    boilerplate and quality: the shared GOOD body is stripped from
    every doc but its keeper (doc 1), which empties doc 2 into the
    too_short verdict; unique docs keep their (ws-normalized) text."""
    r = curate_corpus(
        _corpus(spark), min_tokens=20, boilerplate_min_docs=3,
        span_ngram=8, num_hashes=4, url_col="url",
    )
    assert list(r.stages)[:3] == ["input", "boilerplate", "span_dedup"]
    spanned = {row["doc_id"]: row for row in r.stages["span_dedup"].collect()}
    assert spanned[1]["text"] == GOOD          # keeper intact
    assert spanned[2]["text"] == ""            # exact dup fully despanned
    assert spanned[2]["url"] == "http://b.example.com/2"  # cols ride along
    assert "cat" in spanned[5]["text"]         # unique doc keeps its text
    kept = {row["doc_id"] for row in r.kept.collect()}
    assert 1 in kept and 2 not in kept         # doc 2 died at quality
    rep = dict(r.report())
    assert rep["span_dedup"] == 5 and rep["quality"] <= 3


def test_flag_contaminated(spark):
    """A training doc embedding an eval item verbatim (any casing) is
    flagged; clean and too-short docs come back n_shared=0. The
    benchmark side is never flagged — it isn't in the output at all."""
    from rdf_spark.operators.curation import flag_contaminated

    bench = spark.createDataFrame(
        [(100, "What is the exact eval question about foxes and dogs?")],
        "doc_id long, text string")
    docs = spark.createDataFrame([
        (1, "prefix WHAT IS THE EXACT EVAL QUESTION ABOUT FOXES AND DOGS? suffix"),
        (2, "completely unrelated training text with no overlap at all here"),
        (3, "too short"),
    ], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_shared"], r["contaminated"])
           for r in flag_contaminated(docs, bench, n=5, min_shared=1).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1][1] and got[1][0] >= 5   # every 5-gram of the item leaks
    assert got[2] == (0, False)
    assert got[3] == (0, False)


def test_assign_split_domain_coherent_and_total(spark):
    """All pages of one registrable domain land in ONE split (the
    leakage guard), the mapping is total (every doc gets a split),
    deterministic across calls, and over many domains every split
    actually receives members at 60/20/20."""
    from rdf_spark.operators.curation import assign_split

    rows = [(i, f"http://sub{i % 3}.site{i % 40}.example{i % 40}.com/p/{i}")
            for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, url string")
    out = assign_split(docs, (("train", 0.6), ("val", 0.2), ("test", 0.2)))
    got = out.collect()
    assert len(got) == 400 and all(r["split"] for r in got)
    by_domain = {}
    for r in got:
        by_domain.setdefault(r["domain"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_domain.values()), by_domain
    seen = {r["split"] for r in got}
    assert seen == {"train", "val", "test"}, seen
    again = {(r["doc_id"], r["split"]) for r in assign_split(
        docs, (("train", 0.6), ("val", 0.2), ("test", 0.2))).collect()}
    assert again == {(r["doc_id"], r["split"]) for r in got}


def test_domain_cap_requires_url(spark):
    with pytest.raises(ValueError):
        curate_corpus(_corpus(spark), max_docs_per_domain=1)


def _jobs_in_group(spark, group, fn):
    """Run fn() inside a job group; return (result, jobs_spawned)."""
    sc = spark.sparkContext
    sc.setJobGroup(group, group, False)
    try:
        out = fn()
    finally:
        sc.setJobGroup(None, None, False)
    return out, len(sc.statusTracker().getJobIdsForGroup(group))


def test_observed_report_matches_counts_in_one_pass(spark):
    # observe_counts=True must (a) reproduce the legacy per-stage
    # recount exactly and (b) cost report() exactly ONE materialization
    # of `kept` — not one full-chain recompute per stage.  "One job"
    # isn't measurable directly (AQE spawns a job per shuffle stage and
    # every broadcast exchange is its own job), so the bar is: report()
    # spawns no more jobs than a plain kept.count(), and strictly fewer
    # than the legacy per-stage recount.
    legacy_result = curate_corpus(
        _corpus(spark), min_tokens=20, boilerplate_min_docs=3,
        num_hashes=4, url_col="url",
    )
    legacy, legacy_jobs = _jobs_in_group(
        spark, "legacy-report", legacy_result.report)
    observed = curate_corpus(
        _corpus(spark), min_tokens=20, boilerplate_min_docs=3,
        num_hashes=4, url_col="url", observe_counts=True,
    )
    _, baseline_jobs = _jobs_in_group(
        spark, "kept-count", observed.kept.count)
    rep, report_jobs = _jobs_in_group(spark, "obs-report", observed.report)
    assert rep == legacy
    # +2 slack: whether a broadcast/shuffle from the baseline count is
    # still reusable when report() runs depends on executor memory
    # pressure (order-dependent in a full-suite run); the claim under
    # test is one materialization vs a per-stage recount, not exact
    # job parity
    assert report_jobs <= baseline_jobs + 2, (report_jobs, baseline_jobs)
    assert report_jobs < legacy_jobs, (report_jobs, legacy_jobs)
