"""Document deduplication operators for training-data pipelines:

- exact (hash groupBy) — one shuffle on a 32-char key, not the text;
- MinHash + LSH banding — shingle -> K minhashes -> B bands -> bucket
  join; candidate generation never compares all pairs: cost is
  O(sum of bucket sizes squared) with tiny buckets at scale;
- n-gram Jaccard (exact verification of candidate pairs);
- SimHash (vectorized Pandas UDF, Arrow-batched);
- embedding-cosine near-duplicates.

MinHash here is hash-function-portable: h_i(shingle) = md5(seed_i ||
shingle), minimum taken lexicographically over hex digests. That keeps
the operator exactly reproducible in any engine with md5 (the DuckDB
oracle in __spark_entry__ runs the identical computation).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (content_hash, n_docs, doc_ids)."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .where(F.col("n_docs") > 1)
    )


def shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             n: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct word n-gram shingles per document.
    Casefolded, whitespace-tokenized."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(F.when(F.size(toks) >= n, grams)
                              .otherwise(F.array())).alias("shingle"))
        .distinct()
    )


def minhash_signatures(sh: DataFrame, num_hashes: int = 8) -> DataFrame:
    """(doc_id, mh_0..mh_{K-1}): per-seed minimum of md5(seed|shingle).
    One aggregation; all hashing JVM-side."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"s{i}|"), F.col("shingle")))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(sigs: DataFrame, num_hashes: int = 8,
                        band_size: int = 2) -> DataFrame:
    """Band minhash signatures, bucket-join within bands -> candidate
    pairs (a < b). The self-join is per (band, bucket) — broadcast-free
    and skew-bounded because identical-signature buckets are tiny."""
    bands = []
    for b in range(0, num_hashes, band_size):
        key = F.md5(F.concat_ws("|", *[F.col(f"mh_{i}") for i in range(b, b + band_size)]))
        bands.append(
            sigs.select(F.col("doc_id"), F.lit(b).alias("band"), key.alias("bucket"))
        )
    all_bands = bands[0]
    for x in bands[1:]:
        all_bands = all_bands.unionByName(x)
    a = all_bands.alias("a")
    bdf = all_bands.alias("b")
    return (
        a.join(bdf, ["band", "bucket"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_pairs(sh: DataFrame, threshold: float = 0.8,
                  candidates: DataFrame | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing >=1 shingle
    (optionally restricted to LSH candidates): (doc_a, doc_b, jaccard)."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["doc_a", "doc_b"])
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter").cast("double")
                    / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 64) -> DataFrame:
    """64-bit SimHash over casefolded word tokens — vectorized Pandas
    UDF via mapInPandas (Arrow batches; python only because of per-bit
    majority voting, which SQL expresses poorly)."""
    import hashlib

    src = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mask = (1 << bits) - 1
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                votes = [0] * bits
                for tok in str(text).lower().split():
                    h = int.from_bytes(
                        hashlib.md5(tok.encode("utf-8")).digest()[:8], "big"
                    )
                    for j in range(bits):
                        votes[j] += 1 if (h >> j) & 1 else -1
                sig = 0
                for j in range(bits):
                    if votes[j] > 0:
                        sig |= 1 << j
                sig &= mask
                if bits == 64 and sig >= 1 << 63:
                    sig -= 1 << 64  # wrap to signed long for Arrow/Spark
                out.append((doc_id, sig))
            yield pd.DataFrame(out, columns=["doc_id", "simhash"])

    return src.mapInPandas(run, schema="doc_id long, simhash long")


def simhash_near_dups(sig: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance. Candidate
    generation by 16-bit band equality (4 bands over 64 bits): any pair
    within Hamming distance 3 shares at least one exact band."""
    bands = []
    for b in range(4):
        bands.append(
            sig.select(
                "doc_id", "simhash", F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * 16).bitwiseAND(F.lit(0xFFFF)).alias("bucket"),
            )
        )
    ab = bands[0]
    for x in bands[1:]:
        ab = ab.unionByName(x)
    a, b = ab.alias("a"), ab.alias("b")
    pairs = (
        a.join(b, ["band", "bucket"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"), F.col("b.simhash").alias("hb"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
    return pairs


def embedding_near_dups(emb: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (doc_a, doc_b, cos, 4dp).
    Brute-force within label partitions when a `label` column exists
    (IVF-style pruning), else full cross join — the scale path is the
    LSH/IVF variant in operators/ann.py."""
    from .ann import _dot, _norm

    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("v")]
    by_label = "label" in emb.columns
    if by_label:
        cols.append(F.col("label"))
    e = emb.select(*cols).withColumn("n", _norm(F.col("v")))
    a, b = e.alias("a"), e.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    join_on = ["label"] if by_label else []
    pairs = a.join(b, join_on) if join_on else a.crossJoin(b)
    return (
        pairs.where(cond)
        .withColumn(
            "cos",
            F.round(_dot(F.col("a.v"), F.col("b.v")) / (F.col("a.n") * F.col("b.n")), 4),
        )
        .where(F.col("cos") >= threshold)
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"), "cos")
    )
