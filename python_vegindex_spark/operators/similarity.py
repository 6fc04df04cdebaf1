"""Similarity search over embedding columns (array<float>).

Engine additions for training-data pipelines:

* ``cosine_topk`` — brute-force exact top-k: broadcast the (small) query
  set, compute cosine with JVM array expressions (zip_with + aggregate),
  rank per query. The correct baseline; one broadcast join, no shuffle
  of the corpus.
* ``lsh_buckets`` / ``ann_topk_lsh`` — random-hyperplane LSH scale path:
  hash every vector into sign-pattern buckets; candidates = bucket
  collisions; exact cosine re-rank on candidates only. Hyperplanes are
  derived deterministically from md5 at plan time (no RNG state,
  reproducible by any SQL oracle engine — see hyperplane_components — and on
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


def _rank_topk(scored: DataFrame, k: int, presalt_shards: int = 16) -> DataFrame:
    """Shared top-k tail: rank (query_id, neighbor_id, cos_sim) candidates
    per query by (cos desc, id asc — deterministic ties) and keep k.

    Two-phase (the ``sampling.cap_per_group`` argument): a single
    ``Window.partitionBy(query_id)`` would put each query's ENTIRE
    scored candidate set into one task — for the brute-force path that
    is a single-partition sort of the whole corpus per query. Instead:

    1. shard-local rank within (query_id, shard) where shard =
       pmod(crc32(neighbor_id), ``presalt_shards``): each shard keeps
       its own smallest-``k`` by the ranking key — a window over
       1/shards of the candidates,
    2. final rank over the survivors (≤ shards × k rows per query —
       bounded, tiny) keeps the global top ``k``.

    Stage 1 can never evict a global top-``k`` row (its shard keeps its
    own top ``k``, and the global winners number ≤ k in any shard), so
    the two-phase result is EXACTLY the single-window result.
    """
    order = [F.desc("cos_sim"), F.asc("neighbor_id")]
    shard = F.pmod(F.crc32(F.col("neighbor_id").cast("string")), F.lit(presalt_shards))
    w1 = Window.partitionBy("query_id", "_shard").orderBy(*order)
    survivors = (
        scored.withColumn("_shard", shard)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_shard", "_r1")
    )
    w2 = Window.partitionBy("query_id").orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _hamming1_probes(
    bucketed: DataFrame, num_planes: int, id_alias: str, vec_alias: str
) -> DataFrame:
    """Explode each (id, vec, bucket) row into its own bucket plus every
    Hamming-1 probe bucket (each of ``num_planes`` bits flipped) — the
    multi-probe trick that recovers near-boundary neighbors without a
    second hash family."""
    return bucketed.select(
        F.col("id").alias(id_alias),
        F.col("vec").alias(vec_alias),
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
    the rank is the two-phase shard-local top-k of :func:`_rank_topk`,
    so no task ever sorts a query's full scored corpus.
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
    return _rank_topk(scored, k)


def hyperplane_components(dim: int, h: int, seed: int) -> list[float]:
    """Deterministic pseudo-random hyperplane components: component j =
    centered md5 hash of the string ``"hp:{seed}:{h}:{j}"``. Pure
    plan-time Python (hashlib), so the planes are (a) true Catalyst
    literals — constant-folded, no per-row hashing — and (b) exactly
    reproducible by any engine or test oracle from the same three ints,
    with no RNG state and no dependence on cluster size."""
    import hashlib

    return [
        (int(hashlib.md5(f"hp:{seed}:{h}:{j}".encode()).hexdigest()[:15], 16) % 10_000 - 4999.5)
        / 10_000.0
        for j in range(dim)
    ]


def _hyperplane(dim: int, h: int, seed: int) -> Column:
    """:func:`hyperplane_components` as a literal array expression."""
    return F.array(*[F.lit(c) for c in hyperplane_components(dim, h, seed)])


def lsh_buckets(
    df: DataFrame,
    dim: int,
    num_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """(id, bucket) — sign pattern of projections on ``num_planes``
    deterministic hyperplanes, packed into a long.

    ``dim`` must equal the actual embedding length — enforced per row
    (``zip_with`` null-pads a mismatched pair, the null dot product fails
    every sign test, and EVERY row would land in bucket 0, silently
    degenerating downstream bucket joins to a full cross join)."""
    vec = F.when(F.size(F.col(vec_col)) == dim, F.col(vec_col)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"lsh_buckets: dim={dim} but embedding length is "),
                F.size(F.col(vec_col)).cast("string"),
            )
        )
    )
    bucket = F.lit(0).cast("long")
    for h in range(num_planes):
        sign = F.when(_dot(vec, _hyperplane(dim, h, seed)) >= 0, 1).otherwise(0)
        bucket = bucket.bitwiseOR(F.shiftleft(sign.cast("long"), h))
    return df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), bucket.alias("bucket"))


def _codebook_assign_expr(cent_rows: list[tuple[int, list[float]]], vec_col: str) -> Column:
    """Shuffle-free cell assignment: the (tiny, driver-held) codebook is
    inlined as literal array expressions, so picking the nearest centroid
    is a pure per-row projection — argmax over ``array_max`` of
    (cosine, -centroid_id) structs (ties -> lowest id). Runs inside
    whole-stage codegen; the corpus is never shuffled or joined."""
    import math

    v = F.col(vec_col)
    vnorm = _norm(v)
    structs = []
    for cid, cvec in cent_rows:
        cn = math.sqrt(sum(x * x for x in cvec)) or 1.0
        lit_vec = F.array(*[F.lit(float(x)) for x in cvec])
        cs = _dot(v, lit_vec) / (vnorm * F.lit(cn))
        structs.append(
            F.struct(
                cs.alias("cs"),
                F.lit(-int(cid)).alias("ncid"),
                F.lit(int(cid)).alias("cid"),
            )
        )
    return F.array_max(F.array(*structs))["cid"]


def _codebook_assign_pandas(
    cent_rows: list[tuple[int, list[float]]], vec_col: str
) -> Column:
    """Large-codebook cell assignment: still zero-shuffle, but the
    codebook travels inside an Arrow-batched pandas UDF closure instead
    of as Catalyst literals (the literal argmax is O(n_centroids x dim)
    expression nodes — fine at 16, codegen-infeasible at a realistic
    4k x 768). One numpy matmul per Arrow batch; same argmax semantics
    as :func:`_codebook_assign_expr` (cosine, ties -> lowest centroid
    id; the per-row vector norm is a positive scalar common to all
    centroids, so dividing by the centroid norms alone preserves the
    argmax)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ordered = sorted(cent_rows)  # ascending cid -> argmax first-hit = lowest id
    cids = np.array([cid for cid, _ in ordered], dtype=np.int64)
    C = np.array([vec for _, vec in ordered], dtype=np.float64)
    norms = np.linalg.norm(C, axis=1)
    norms[norms == 0.0] = 1.0  # mirror the literal path's `or 1.0`
    Ct = (C / norms[:, None]).T  # dim x n_centroids

    def _assign(s):
        M = np.asarray(s.tolist(), dtype=np.float64)  # batch x dim
        return pd.Series(cids[np.argmax(M @ Ct, axis=1)])

    return pandas_udf(_assign, "int")(F.col(vec_col))


def codebook_assign(
    cent_rows: list[tuple[int, list[float]]],
    vec_col: str,
    literal_codebook_max: int = 64,
) -> Column:
    """Dispatch: literal whole-stage-codegen argmax for small codebooks,
    broadcast-closure vectorized pandas argmax beyond
    ``literal_codebook_max`` centroids. Both paths are Exchange-free."""
    if len(cent_rows) <= literal_codebook_max:
        return _codebook_assign_expr(cent_rows, vec_col)
    return _codebook_assign_pandas(cent_rows, vec_col)


def ivf_index(
    corpus: DataFrame,
    n_centroids: int = 16,
    lloyd_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    literal_codebook_max: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """Build an IVF (inverted-file) index: (assignments, centroids).

    Codebook = deterministic seed sample — ``orderBy(id).limit(n)``,
    which Spark plans as TakeOrderedAndProject (per-partition top-k, no
    global sort window) — refined by ``lloyd_iters`` Lloyd iterations.
    The codebook lives on the driver (n_centroids rows); assignment is a
    zero-shuffle argmax (:func:`codebook_assign`: Catalyst literals up
    to ``literal_codebook_max`` centroids, a broadcast-closure numpy
    matmul in a vectorized pandas UDF beyond that — both Exchange-free),
    and the only shuffle per iteration is the centroid-mean update: a
    posexplode to (centroid_id, dim) skinny rows whose ``avg`` partial-
    aggregates map-side, so shuffle bytes are O(partitions x centroids x
    dim), independent of corpus size. At 100 TB the corpus never
    self-joins and is never re-shuffled for assignment.
    Returns assignments (id, vec, centroid_id) and centroids
    (centroid_id, c_vec).
    """
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    seed_rows = sorted(
        c.orderBy("id").limit(n_centroids).collect(), key=lambda r: r["id"]
    )
    cent_rows = [(i, list(map(float, r["vec"]))) for i, r in enumerate(seed_rows)]

    for _ in range(lloyd_iters):
        assigned = c.withColumn(
            "centroid_id",
            codebook_assign(cent_rows, "vec", literal_codebook_max),
        )
        means = (
            assigned.select("centroid_id", F.posexplode("vec").alias("dim", "val"))
            .groupBy("centroid_id", "dim")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in means:
            by_cid.setdefault(r["centroid_id"], {})[r["dim"]] = r["m"]
        # a centroid with zero assignments this iteration keeps its
        # previous vector (never silently dropped from the codebook)
        cent_rows = [
            (cid, [by_cid[cid][d] for d in sorted(by_cid[cid])])
            if cid in by_cid
            else (cid, vec)
            for cid, vec in cent_rows
        ]

    assignments = c.withColumn(
        "centroid_id", codebook_assign(cent_rows, "vec", literal_codebook_max)
    )
    spark = corpus.sparkSession
    centroids = spark.createDataFrame(
        [(cid, vec) for cid, vec in cent_rows], "centroid_id int, c_vec array<double>"
    )
    return assignments, centroids


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
    return _rank_topk(scored, k)


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
        probes = _hamming1_probes(cb, num_planes, "id_b", "vb")
        base = cb.select(
            F.col("id").alias("id_a"), F.col("vec").alias("va"), "bucket"
        )
        pairs = (
            base.join(probes, on="bucket")
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
    probes = _hamming1_probes(qb, num_planes, "query_id", "q_vec")
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
    return _rank_topk(scored, k)
