"""IVF ANN, embedding near-dup dedup, and approx-percentile fast path.

Synthetic clustered vectors (deterministic numpy): planted clusters give
known near-dup pairs and high-recall ANN targets.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from python_vegindex_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_index,
    ivf_topk,
)

DIM = 16


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.RandomState(11)
    centers = rng.randn(6, DIM)
    rows = []
    vid = 0
    for ci in range(6):
        for _ in range(30):
            v = centers[ci] + 0.05 * rng.randn(DIM)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    # planted exact-ish duplicates: tiny perturbations of vector 0
    base = np.array(rows[0][1])
    for k in range(3):
        rows.append((vid, [float(x) for x in base + 1e-4 * rng.randn(DIM)]))
        vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_recall_vs_exact(spark, emb_df):
    queries = emb_df.filter(F.col("vec_id").isin(0, 31, 62, 93))
    exact = cosine_topk(emb_df, queries, k=5).toPandas()
    assignments, centroids = ivf_index(emb_df, n_centroids=6, lloyd_iters=2)
    approx = ivf_topk(assignments, centroids, queries, k=5, nprobe=2).toPandas()
    e = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
    a = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    # clustered data + 2 probes over 6 cells: near-total recall expected
    assert recall >= 0.9, f"IVF recall {recall}"


def test_ivf_centroid_count_and_assignment_total(spark, emb_df):
    assignments, centroids = ivf_index(emb_df, n_centroids=6, lloyd_iters=1)
    assert centroids.count() == 6
    assert assignments.count() == emb_df.count()
    assert assignments.select("centroid_id").distinct().count() <= 6


def test_embedding_near_dups_exact_finds_planted(spark, emb_df):
    n = emb_df.count()
    pairs = embedding_near_dup_pairs(
        emb_df, threshold=0.999999, method="exact", dim=DIM
    ).toPandas()
    planted = {(0, n - 3), (0, n - 2), (0, n - 1)}
    got = {(r.id_a, r.id_b) for r in pairs.itertuples()}
    assert planted <= got


def test_embedding_near_dups_lsh_subset_of_exact(spark, emb_df):
    exact = embedding_near_dup_pairs(
        emb_df, threshold=0.98, method="exact", dim=DIM
    ).toPandas()
    lsh = embedding_near_dup_pairs(
        emb_df, threshold=0.98, method="lsh", dim=DIM, num_planes=8
    ).toPandas()
    e = {(r.id_a, r.id_b) for r in exact.itertuples()}
    l = {(r.id_a, r.id_b) for r in lsh.itertuples()}
    assert l <= e  # LSH never invents pairs (exact verify)
    assert len(l) / max(1, len(e)) >= 0.5  # multi-probe recall floor


def test_approx_percentile_fast_path(spark):
    from python_vegindex_spark.config import RollupConfig
    from python_vegindex_spark.operators.features import turn_features
    from python_vegindex_spark.operators.rollup import rollup
    from python_vegindex_spark.sources.synth import synth_turns

    feats = turn_features(synth_turns(spark, n_convs=60, seed=5))
    exact = rollup(feats, RollupConfig(tier="daily", nmin=2)).toPandas()
    approx = rollup(
        feats, RollupConfig(tier="daily", nmin=2, approx_percentiles=True)
    ).toPandas()
    assert list(exact.columns) == list(approx.columns)
    both = exact.merge(
        approx, on=["conv_id", "bucket_start"], suffixes=("_e", "_a")
    )
    # approx_percentile returns an element of the group (no HF-7
    # interpolation), so tiny groups legitimately differ; on groups big
    # enough for the estimator the divergence must stay small
    mask = (
        both["fcc_90_e"].notna()
        & both["fcc_90_a"].notna()
        & (both["turn_count_e"] >= 10)
    )
    diff = (both.loc[mask, "fcc_90_e"] - both.loc[mask, "fcc_90_a"]).abs()
    assert mask.sum() > 0
    assert (diff < 0.1).all()
    assert diff.median() < 0.02


def test_ivf_empty_centroid_carried_forward(spark):
    """A centroid with zero assignments in a Lloyd iteration keeps its
    previous vector instead of shrinking the codebook: seed vectors 0
    and 1 are identical, so the argmax sends both to one of them and the
    other cell is empty every iteration."""
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [5.0, 5.0]), (3, [5.1, 5.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assignments, centroids = ivf_index(df, n_centroids=3, lloyd_iters=2)
    assert centroids.count() == 3
    assert sorted(r["centroid_id"] for r in centroids.collect()) == [0, 1, 2]
    assert assignments.count() == 4


def test_codebook_assign_pandas_matches_literal(spark, emb_df):
    """The large-codebook pandas path assigns every vector to the same
    centroid as the literal-expression path, and its plan is still
    Exchange-free (Arrow eval, no shuffle)."""
    from python_vegindex_spark.operators.similarity import (
        _codebook_assign_expr,
        _codebook_assign_pandas,
    )

    rows = emb_df.orderBy("vec_id").limit(20).collect()
    cent_rows = [(i, list(map(float, r["embedding"]))) for i, r in enumerate(rows)]
    lit = {
        r["vec_id"]: r["cid"]
        for r in emb_df.withColumn(
            "cid", _codebook_assign_expr(cent_rows, "embedding")
        ).select("vec_id", "cid").collect()
    }
    pnd_df = emb_df.withColumn(
        "cid", _codebook_assign_pandas(cent_rows, "embedding")
    ).select("vec_id", "cid")
    plan = pnd_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan
    pnd = {r["vec_id"]: r["cid"] for r in pnd_df.collect()}
    assert lit == pnd


def test_ivf_large_codebook_recall(spark):
    """n_centroids > literal_codebook_max exercises the pandas argmax
    end-to-end: codebook stays full-size, assignment plan shuffle-free,
    and nprobe recall against exact top-k stays high."""
    rng = np.random.RandomState(11)
    dim, rows = 16, []
    centers = rng.randn(25, dim) * 3
    vid = 0
    for ci in range(25):
        for _ in range(16):
            v = centers[ci] + 0.05 * rng.randn(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assignments, centroids = ivf_index(
        df, n_centroids=80, lloyd_iters=1, literal_codebook_max=64
    )
    assert centroids.count() == 80
    plan = assignments._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    queries = df.filter(F.col("vec_id").isin(0, 101, 202, 303))
    exact = cosine_topk(df, queries, k=5).toPandas()
    approx = ivf_topk(assignments, centroids, queries, k=5, nprobe=16).toPandas()
    e = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
    a = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    assert len(e & a) / len(e) >= 0.9


def test_lsh_buckets_rejects_dim_mismatch(spark, emb_df):
    """Regression: a wrong dim used to null-pad the dot product and send
    EVERY vector to bucket 0 (downstream bucket joins degenerate to a
    full cross join). Must raise instead."""
    from python_vegindex_spark.operators.similarity import lsh_buckets

    with pytest.raises(Exception, match="embedding length"):
        lsh_buckets(emb_df, dim=DIM + 1).collect()
    ok = lsh_buckets(emb_df, dim=DIM).select("bucket").distinct().count()
    assert ok > 1
