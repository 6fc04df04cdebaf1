"""Similarity search over embedding columns (array<float>).

Engine additions for training-data pipelines:

* ``cosine_topk`` — brute-force exact top-k: broadcast the (small) query
  set, compute cosine with JVM array expressions (zip_with + aggregate),
  rank per query. The correct baseline; one broadcast join, no shuffle
  of the corpus.
* ``lsh_buckets`` / ``ann_topk_lsh`` — random-hyperplane LSH scale path:
  hash every vector into sign-pattern buckets; candidates = bucket
  collisions; exact cosine re-rank on candidates only. Hyperplanes are
  derived deterministically from xxhash (no RNG state, reproducible on
  any cluster size).

All JVM-side; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k neighbors per query (self-matches excluded).

    ``queries`` must be small (it is broadcast); the corpus streams
    through one whole-stage-codegen projection — no corpus shuffle, and
    the final rank is a per-query window over k*|corpus| rows filtered
    down by the rank predicate.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), round_to).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _hyperplane(dim: int, h: int, seed: int) -> Column:
    """Deterministic pseudo-random hyperplane as an array expression:
    component j = centered hash of (seed, h, j)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.pmod(F.xxhash64(F.lit(seed), F.lit(h), j), F.lit(10_000)) - 4999.5
        )
        / 10_000.0,
    )


def lsh_buckets(
    df: DataFrame,
    dim: int,
    num_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """(id, bucket) — sign pattern of projections on ``num_planes``
    deterministic hyperplanes, packed into a long."""
    bucket = F.lit(0).cast("long")
    for h in range(num_planes):
        sign = F.when(_dot(F.col(vec_col), _hyperplane(dim, h, seed)) >= 0, 1).otherwise(0)
        bucket = bucket.bitwiseOR(F.shiftleft(sign.cast("long"), h))
    return df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), bucket.alias("bucket"))


def ivf_index(
    corpus: DataFrame,
    n_centroids: int = 16,
    lloyd_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Build an IVF (inverted-file) index: (assignments, centroids).

    Codebook = deterministic seed sample (lowest ``n_centroids`` ids)
    refined by ``lloyd_iters`` Lloyd iterations, all in DataFrame ops:
    assignment is a broadcast cross join + ``min_by`` over the (small)
    codebook; the centroid update explodes vector components and
    re-assembles per-centroid means with one shuffle on (centroid, dim).
    Returns assignments (id, vec, centroid_id) and centroids
    (centroid_id, c_vec). At 100 TB the corpus never self-joins — every
    pass is corpus x broadcast(codebook).
    """
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    w = Window.orderBy("id")
    centroids = (
        c.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_centroids)
        .select((F.col("_rn") - 1).alias("centroid_id"), F.col("vec").alias("c_vec"))
    )

    def assign(cent: DataFrame) -> DataFrame:
        scored = c.join(F.broadcast(cent)).select(
            "id",
            "vec",
            F.col("centroid_id"),
            cosine(F.col("vec"), F.col("c_vec")).alias("_cs"),
        )
        return scored.groupBy("id").agg(
            F.first("vec").alias("vec"),
            F.max_by("centroid_id", "_cs").alias("centroid_id"),
        )

    for _ in range(lloyd_iters):
        assigned = assign(centroids)
        comp = assigned.select(
            "centroid_id", F.posexplode("vec").alias("dim", "val")
        )
        means = comp.groupBy("centroid_id", "dim").agg(F.avg("val").alias("m"))
        centroids = (
            means.groupBy("centroid_id")
            .agg(
                F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("_s")
            )
            .select(
                "centroid_id",
                F.transform(F.col("_s"), lambda s: s["m"].cast("double")).alias(
                    "c_vec"
                ),
            )
        )
    return assign(centroids), centroids


def ivf_topk(
    assignments: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """IVF query: probe the ``nprobe`` nearest centroids per query, exact
    cosine re-rank inside the probed cells. One equi-join on centroid_id
    (the shuffle key); recall grows with nprobe."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    probes = (
        q.join(F.broadcast(centroids))
        .select(
            "query_id", "q_vec", "centroid_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("_cs"),
        )
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("_cs"), F.asc("centroid_id")
                )
            ),
        )
        .filter(F.col("_rk") <= nprobe)
        .select("query_id", "q_vec", "centroid_id")
    )
    scored = (
        assignments.join(probes, on="centroid_id")
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.round(cosine(F.col("q_vec"), F.col("vec")), round_to).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    method: str = "lsh",
    dim: int = 64,
    num_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= threshold).

    ``method='lsh'`` (scale path): pairs meet in hyperplane-LSH buckets
    (plus Hamming-1 probes) then exact-verify — the only shuffle key is
    the bucket, never an N^2 self-join. ``method='exact'``: full
    self-join verify, for small corpora and as the recall oracle.
    """
    if method == "exact":
        a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    elif method == "lsh":
        cb = lsh_buckets(emb, dim, num_planes, id_col, vec_col, seed)
        probes = cb.select(
            "id",
            "vec",
            F.explode(
                F.array(
                    F.col("bucket"),
                    *[
                        F.col("bucket").bitwiseXOR(
                            F.shiftleft(F.lit(1).cast("long"), i)
                        )
                        for i in range(num_planes)
                    ],
                )
            ).alias("bucket"),
        )
        base = cb.select(
            F.col("id").alias("id_a"), F.col("vec").alias("va"), "bucket"
        )
        pairs = (
            base.join(
                probes.select(
                    F.col("id").alias("id_b"), F.col("vec").alias("vb"), "bucket"
                ),
                on="bucket",
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), round_to).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket, then
    exact cosine re-rank. Recall < 1 by construction; bucket join keys
    the only shuffle. Multi-probe: queries also probe buckets at Hamming
    distance 1 (flip each bit) to recover near-boundary neighbors."""
    cb = lsh_buckets(corpus, dim, num_planes, id_col, vec_col, seed)
    qb = lsh_buckets(queries, dim, num_planes, id_col, vec_col, seed)
    probes = qb.select(
        F.col("id").alias("query_id"),
        F.col("vec").alias("q_vec"),
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.shiftleft(F.lit(1).cast("long"), i))
                    for i in range(num_planes)
                ],
            )
        ).alias("bucket"),
    )
    scored = (
        cb.join(probes, on="bucket")
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.round(cosine(F.col("q_vec"), F.col("vec")), round_to).alias("cos_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
