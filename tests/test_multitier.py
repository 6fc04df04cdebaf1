"""rollup_tiers / rollup_series_tiers: the single-scan multi-tier rollup.

Equivalence contract: for every tier, the ``tier = t`` slice of the
multi-tier output is row-identical to the single-tier operator with the
matching config (same QC gate, same aggregate expressions, same
gap-fill and count tiering). Plan contract: ONE scan of the raw input,
ONE wide Exchange (the agg; the gap-fill lag window re-partitions only
the tiny aggregate), no Python in the plan.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from python_vegindex_spark.config import RollupConfig
from python_vegindex_spark.operators.features import turn_features
from python_vegindex_spark.operators.generic_rollup import rollup_series
from python_vegindex_spark.operators.multitier import (
    rollup_series_tiers,
    rollup_tiers,
)
from python_vegindex_spark.operators.rollup import rollup
from python_vegindex_spark.sources.bronze import read_turns
from python_vegindex_spark.sources.synth import synth_turns, write_turns

TIERS = ("hourly", "daily", "weekly")


@pytest.fixture(scope="module")
def turns_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("multitier") / "turns")
    write_turns(synth_turns(spark, n_convs=30, seed=11), path)
    return path


@pytest.fixture(scope="module")
def feats(spark, turns_path):
    return turn_features(read_turns(spark, turns_path))


def _norm(rows, ndigits=8):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(round(v, ndigits))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=str)


def _cfgs():
    # nmin deliberately differs per tier (the operator's contract allows it)
    return [
        RollupConfig(tier="hourly", nmin=1),
        RollupConfig(tier="daily", nmin=2),
        RollupConfig(tier="weekly", nmin=3),
    ]


def test_slices_match_single_tier_rollup(spark, feats):
    multi = rollup_tiers(feats, _cfgs()).cache()
    try:
        for cfg in _cfgs():
            single = rollup(feats, cfg)
            cols = [c for c in single.columns]
            sliced = multi.filter(F.col("tier") == cfg.tier)
            if cfg.tier != "hourly":
                # single-tier day rollups carry DateType buckets and no hour col
                sliced = sliced.withColumn(
                    "bucket_start", F.to_date("bucket_start")
                ).withColumn("bucket_center", F.to_date("bucket_center"))
            got = _norm(sliced.select(*cols).collect())
            want = _norm(single.collect())
            assert got == want, f"tier {cfg.tier}: multi slice != single rollup"
    finally:
        multi.unpersist()


def test_empty_tier_counts_and_gapfill(spark, feats):
    """Gap rows exist per tier, turn_count coalesces to 0, stats null."""
    multi = rollup_tiers(feats, _cfgs())
    gaps = multi.filter(F.col("turn_count") == 0)
    assert gaps.count() > 0
    bad = gaps.filter(
        F.col("fcc_mean").isNotNull() | F.col("mid_ts").isNotNull()
    ).count()
    assert bad == 0


def test_single_scan_single_wide_exchange(spark, turns_path):
    feats = turn_features(read_turns(spark, turns_path))
    multi = rollup_tiers(feats, _cfgs())
    plan = multi._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, "multi-tier rollup must scan once"
    # ONE exchange end to end: turn_features' latency-lag window partitions
    # by conv_id, and both the (conv_id, tier, bucket) aggregate and the
    # (conv_id, tier) gap-fill window are ClusteredDistributions satisfied
    # by that subset partitioning — EnsureRequirements inserts nothing more.
    assert plan.count("Exchange hashpartitioning") == 1, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, f"Python in hot path: {marker}"


def test_validation_rejects_mismatched_configs(spark, feats):
    with pytest.raises(ValueError, match="must agree"):
        rollup_tiers(
            feats,
            [
                RollupConfig(tier="hourly"),
                RollupConfig(tier="daily", percentiles=(0.5,)),
            ],
        )
    with pytest.raises(ValueError, match="duplicate"):
        rollup_tiers(feats, [RollupConfig(tier="daily"), RollupConfig(tier="daily")])


def test_pipeline_fused_mode(spark, turns_path, tmp_path):
    """run_pipeline(fused=True): per-tier row counts equal the per-tier
    pipeline's, and the gold output lands partitioned by tier."""
    import os

    from python_vegindex_spark.plans.pipeline import run_pipeline

    turns = spark.read.parquet(turns_path)
    sep = run_pipeline(spark, turns, with_chunks=False)
    fused = run_pipeline(
        spark, turns, out_root=str(tmp_path / "gold"), with_chunks=False,
        fused=True,
    )
    per_tier = fused["stages"]["gold_tiers_fused"]["per_tier"]
    for tier in ("hourly", "daily", "weekly"):
        assert per_tier[tier] == sep["stages"][f"gold_{tier}"]["rows"]
    assert os.path.isdir(str(tmp_path / "gold" / "gold_tiers" / "tier=daily"))


def test_series_tiers_matches_rollup_series(spark, turns_path):
    ev = read_turns(spark, turns_path).select(
        F.col("conv_id").alias("series"),
        "ts",
        F.length("text").cast("double").alias("value"),
    )
    tiers = ("15min", *TIERS)  # minute lattice exercises the fixed-kind branch
    multi = rollup_series_tiers(
        ev, tiers, series_cols=["series"], nmin=2
    ).cache()
    try:
        for tier in tiers:
            single = rollup_series(
                ev, tier, series_cols=["series"], nmin=2
            ).withColumn("bucket_start", F.to_timestamp("bucket_start"))
            sliced = multi.filter(F.col("tier") == tier).drop("tier")
            got = _norm(sliced.select(*single.columns).collect())
            want = _norm(single.collect())
            assert got == want, f"tier {tier}: series multi != single"
    finally:
        multi.unpersist()
