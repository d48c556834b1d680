"""End-to-end training-data curation plan: the documents-side
counterpart of plans/pipeline.py's KG construction run.

Chains the curation operators in the order a web-corpus pipeline
actually runs them — each stage only shrinks the document set, so the
per-stage survivor counts form the drop-report dashboard:

1. boilerplate removal   (template lines shared across documents)
2. span dedup            (optional; cross-doc duplicated n-token
                          spans removed outside their keeper doc —
                          catches templated runs that flow across
                          line breaks; emptied docs fall to stage 3's
                          too_short verdict)
3. quality verdicts      (too_short > high_repetition > low_quality)
4. exact dedup           (md5(text) groups -> keep the min-id rep)
5. near-dup dedup        (MinHash-LSH candidate graph -> connected
                          components -> keep the min-id rep; LSH
                          buckets capped, so pathological boilerplate
                          blobs stay linear)
6. per-domain cap        (optional; PSL registrable domains)
7. stratified sample     (optional; deterministic per-language rates)

Every stage is deterministic (no RNG) — a re-run keeps exactly the
same documents, which is what makes the plan resumable and its output
citable as a dataset version.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..operators.curation import (
    cap_per_domain,
    filter_verdicts,
    remove_boilerplate,
    stratified_sample,
)
from ..operators.dedup import (
    dup_clusters,
    lsh_candidate_pairs,
    minhash_signatures,
    remove_duplicated_spans,
    shingles,
)


@dataclass
class CurationResult:
    """`kept` is the final curated corpus; `stages` maps stage name ->
    the corpus as of that stage (same schema as the input), in run
    order, for drop attribution."""

    kept: DataFrame
    stages: dict[str, DataFrame] = field(default_factory=dict)
    observations: dict[str, Observation] = field(default_factory=dict)

    def report(self) -> list[tuple[str, int]]:
        """[(stage, surviving_docs)] in run order — the tuning
        dashboard.

        With ``observe_counts=True`` (the scale path) the counts are
        ``df.observe`` metrics collected as rows flow through the
        chain's own materialization: the early stages are filled by
        the near-dup clustering's internal jobs, and the tail needs at
        most ONE ``kept`` count here — never a per-stage recompute of
        the whole chain.  (Named CollectMetrics nodes aggregate once
        per query even when the observed subtree appears in several
        downstream branches — verified empirically for the self-join
        and anti-join shapes this chain uses.)

        Without it, falls back to one count per stage DataFrame: each
        of those recomputes its full upstream lineage, so an S-stage
        report costs O(S^2) passes — fine for tuning runs at small sf,
        wrong at scale.
        """
        if self.observations:
            # one action over the final plan fills every observation
            # that the chain's construction-time jobs didn't already
            self.kept.count()
            return [(name, int(obs.get["rows"]))
                    for name, obs in self.observations.items()]
        return [(name, df.count()) for name, df in self.stages.items()]


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    boilerplate_min_docs: int | None = 2,
    span_ngram: int | None = None,
    span_min_df: int = 2,
    min_tokens: int = 20,
    max_repetition: float = 0.5,
    min_quality: float = 0.1,
    shingle_n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    max_bucket: int | None = 1000,
    url_col: str | None = None,
    max_docs_per_domain: int | None = None,
    lang_col: str | None = None,
    lang_fractions: dict[str, float] | None = None,
    default_fraction: float = 1.0,
    observe_counts: bool = False,
) -> CurationResult:
    """Run the full curation chain; pass None to skip an optional
    stage (boilerplate, span dedup, domain cap, sampling). Non-text
    columns (url, lang, ...) ride along unchanged; boilerplate removal
    and span dedup rewrite only the text column.

    ``observe_counts=True`` instruments every stage boundary with a
    ``df.observe`` row counter so ``CurationResult.report()`` costs at
    most one extra job instead of recomputing the chain per stage —
    use it whenever the drop report will actually be read at scale.
    """
    other_cols = [c for c in docs.columns if c not in (id_col, text_col)]
    stages: dict[str, DataFrame] = {}
    observations: dict[str, Observation] = {}

    def _stage(name: str, df: DataFrame) -> DataFrame:
        if observe_counts:
            obs = Observation()
            df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
            observations[name] = obs
        stages[name] = df
        return df

    cur = _stage("input", docs)

    if boilerplate_min_docs is not None:
        cleaned = remove_boilerplate(
            cur, min_docs=boilerplate_min_docs, id_col=id_col, text_col=text_col
        ).withColumnRenamed("doc_id", id_col)
        if other_cols:
            cleaned = cleaned.join(cur.drop(text_col), id_col)
        cur = _stage("boilerplate", cleaned.select(id_col, text_col, *other_cols))

    if span_ngram is not None:
        despanned = remove_duplicated_spans(
            cur, n=span_ngram, min_df=span_min_df,
            id_col=id_col, text_col=text_col,
        ).withColumnRenamed("doc_id", id_col).drop("n_removed")
        if other_cols:
            despanned = despanned.join(cur.drop(text_col), id_col)
        cur = _stage("span_dedup", despanned.select(id_col, text_col, *other_cols))

    verdicts = filter_verdicts(
        cur, id_col=id_col, text_col=text_col,
        min_tokens=min_tokens, max_repetition=max_repetition,
        min_quality=min_quality,
    )
    keep_ids = verdicts.where(F.col("keep")).select(
        F.col("doc_id").alias(id_col)
    )
    cur = _stage("quality", cur.join(keep_ids, id_col, "left_semi"))

    # exact dedup: one aggregate for the min-id representative per
    # content hash, then a semi-join — no per-group arrays anywhere
    reps = (
        cur.select(F.col(id_col), F.md5(F.col(text_col)).alias("__h"))
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    cur = _stage("exact_dedup", cur.join(reps, id_col, "left_semi"))

    sigs = minhash_signatures(
        shingles(cur, id_col=id_col, text_col=text_col, n=shingle_n),
        num_hashes=num_hashes,
    )
    pairs = lsh_candidate_pairs(
        sigs, num_hashes=num_hashes, band_size=band_size, max_bucket=max_bucket
    )
    clusters = dup_clusters(pairs)
    dupes = clusters.where(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    cur = _stage("near_dedup", cur.join(dupes, id_col, "left_anti"))

    if max_docs_per_domain is not None:
        if url_col is None:
            raise ValueError("max_docs_per_domain requires url_col")
        cur = _stage("domain_cap", cap_per_domain(
            cur, max_docs_per_domain, url_col=url_col, id_col=id_col
        ))

    if lang_fractions is not None:
        if lang_col is None:
            raise ValueError("lang_fractions requires lang_col")
        cur = _stage("sample", stratified_sample(
            cur, lang_col, lang_fractions, id_col=id_col,
            default_fraction=default_fraction,
        ))

    return CurationResult(kept=cur, stages=stages, observations=observations)
