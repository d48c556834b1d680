"""Approximate-nearest-neighbor search over an embedding column.

- brute-force cosine top-k: the correctness baseline. All math stays
  JVM-side (zip_with + aggregate on array<double>); the only shuffle is
  the final per-query top-k.
- IVF-style partitioned top-k: restrict the search to the query's
  coarse cluster (here the pre-assigned `label` column; in production
  a k-means assignment step). Cuts the candidate set by the number of
  partitions — the 100 TB scale path.
- LSH (random-hyperplane) bucketed top-k: deterministic hyperplanes
  derived from md5 of (plane, dim) so results are reproducible across
  engines and retries; candidates = same signature bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos, rank). Cosine is
    rounded to 4dp BEFORE ranking with a neighbor-id tie-break, so the
    result set is engine-reproducible."""
    from pyspark.sql.window import Window

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partition_col: str = "label",
) -> DataFrame:
    """IVF-style ANN: candidates restricted to the query's coarse
    partition (equi-join on the partition column replaces the cross
    join — shuffle on a low-cardinality key instead of |Q| x |C|)."""
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        F.col(partition_col).alias("part"),
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        F.col(partition_col).alias("part"),
    )
    scored = (
        q.join(c, "part")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _hyperplane_sign(vec: Column, plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane component weights:
    w[plane][j] = (md5_int(plane|j) mod 2001 - 1000) / 1000 in [-1, 1].
    Same construction is reproducible in any engine with md5."""
    weights = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.conv(F.substring(F.md5(F.concat_ws("|", F.lit(str(plane)), j.cast("string"))), 1, 8), 16, 10)
            .cast("long") % 2001 - 1000
        ).cast("double") / 1000.0,
    )
    return (_dot(vec, weights) >= 0).cast("int")


def lsh_signature(vec: Column, planes: int, dim: int) -> Column:
    parts = [_hyperplane_sign(vec, p, dim).cast("string") for p in range(planes)]
    return F.concat_ws("", *parts)


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    planes: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH ANN: equi-join on the signature bucket;
    recall trades off with `planes` (more planes -> smaller buckets)."""
    from pyspark.sql.window import Window

    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    sig = lambda c: lsh_signature(c, planes, dim)  # noqa: E731
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        sig(F.col(vec_col)).alias("bucket"),
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        sig(F.col(vec_col)).alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the nearest centroid (squared-euclidean argmin with
    index tie-break). Centroids inlined as literal arrays — k*dim
    constants stay in whole-stage codegen, no UDF, no join."""
    candidates = []
    for i, cvec in enumerate(centroids):
        lit_vec = F.array(*[F.lit(float(x)) for x in cvec])
        d = F.aggregate(
            F.zip_with(vec, lit_vec, lambda a, b: (a.cast("double") - b) ** 2),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        candidates.append(F.struct(F.round(d, 9).alias("d"), F.lit(i).alias("c")))
    return F.array_sort(F.array(*candidates))[0]["c"]


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic Lloyd k-means over an embedding column, pure
    DataFrame ops: init = the k vectors with the smallest ids (no RNG —
    reproducible across runs/engines), then `iters` rounds of
    assign (codegen argmin vs literal centroids) + recompute
    (posexplode -> per-(cluster,dim) mean). The driver only ever holds
    k*dim floats — O(1) in corpus size; assign/mean work is
    distributed. Returns the learned centroids."""
    init_rows = emb.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [[float(x) for x in r[0]] for r in init_rows]
    for _ in range(iters):
        assigned = emb.withColumn(
            "centroid", _nearest_centroid(F.col(vec_col), centroids)
        )
        means = (
            assigned.select("centroid",
                            F.posexplode(F.col(vec_col)).alias("dim", "val"))
            .groupBy("centroid", "dim")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        acc: dict[int, dict[int, float]] = {}
        for r in means:
            acc.setdefault(r["centroid"], {})[r["dim"]] = r["m"]
        centroids = [
            [acc[c][d] for d in sorted(acc[c])] if c in acc else centroids[c]
            for c in range(len(centroids))
        ]
    return centroids


def kmeans_transform(df: DataFrame, centroids: list[list[float]],
                     vec_col: str = "embedding") -> DataFrame:
    """Add a `centroid` column: nearest learned centroid per row."""
    return df.withColumn("centroid", _nearest_centroid(F.col(vec_col), centroids))


def ivf_kmeans_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    nlist: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Full IVF: learn coarse centroids with deterministic k-means,
    assign corpus AND queries with the same centroids, then search only
    the query's cluster (nprobe=1). The 100 TB path: the index build is
    one corpus pass per Lloyd round; the query join shuffles on a
    k-ary key instead of |Q| x |C|."""
    cents = kmeans_fit(emb, k=nlist, iters=iters, id_col=id_col, vec_col=vec_col)
    return ivf_topk(
        kmeans_transform(emb, cents, vec_col),
        kmeans_transform(queries, cents, vec_col),
        k=k, id_col=id_col, vec_col=vec_col, partition_col="centroid",
    )
