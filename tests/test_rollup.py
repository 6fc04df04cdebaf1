"""End-to-end rollup vs the pure-pandas oracle, cell-by-cell.

The Spark engine (operators/rollup.py) and the oracle
(oracle/pandas_oracle.py) are independent implementations of the
reference semantics (generate_summary_timeseries.py:229-461); agreement
across all tiers on skewed, gappy synthetic data is the correctness gate.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from python_vegindex_spark.config import RollupConfig
from python_vegindex_spark.operators.features import turn_features
from python_vegindex_spark.operators.rollup import rollup
from python_vegindex_spark.oracle.pandas_oracle import oracle_features, oracle_rollup
from python_vegindex_spark.sources.synth import synth_turns


@pytest.fixture(scope="module")
def turns_pdf(spark):
    return synth_turns(spark, n_convs=40, seed=42, span_days=480).toPandas()


@pytest.fixture(scope="module")
def turns_sdf(spark, turns_pdf):
    return spark.createDataFrame(turns_pdf)


def _norm(df: pd.DataFrame, keys) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if c in ("bucket_start", "bucket_center", "mid_ts"):
            df[c] = pd.to_datetime(df[c])
    return df.sort_values(keys, kind="stable").reset_index(drop=True)


def _assert_frames_match(got: pd.DataFrame, exp: pd.DataFrame, keys):
    got = _norm(got, keys)
    exp = _norm(exp, keys)
    assert len(got) == len(exp), f"row count {len(got)} != {len(exp)}"
    assert set(exp.columns) <= set(got.columns), set(exp.columns) - set(got.columns)
    for c in exp.columns:
        g, e = got[c], exp[c]
        if e.dtype.kind == "f" or g.dtype.kind == "f":
            g = pd.to_numeric(g, errors="coerce").astype(float)
            e = pd.to_numeric(e, errors="coerce").astype(float)
            bad = ~(np.isclose(g, e, rtol=1e-9, atol=1e-9, equal_nan=True))
            assert not bad.any(), f"{c}: {got.loc[bad, keys + [c]].head()}\nvs\n{exp.loc[bad, keys + [c]].head()}"
        else:
            bad = ~((g == e) | (g.isna() & e.isna()))
            assert not bad.any(), f"{c}: {got.loc[bad].head()}\nvs\n{exp.loc[bad].head()}"


def test_features_match_oracle(spark, turns_sdf, turns_pdf):
    got = turn_features(turns_sdf).toPandas()
    exp = oracle_features(turns_pdf)
    keys = ["conv_id", "turn_idx"]
    _assert_frames_match(got, exp[[c for c in got.columns]], keys)


def test_features_lag_via_join_equivalent(spark, turns_sdf):
    a = turn_features(turns_sdf, lag_via_join=False).toPandas()
    b = turn_features(turns_sdf, lag_via_join=True).toPandas()
    _assert_frames_match(a, b, ["conv_id", "turn_idx"])


@pytest.mark.parametrize("tier", ["hourly", "daily", "weekly"])
def test_rollup_matches_oracle(spark, turns_sdf, turns_pdf, tier):
    cfg = RollupConfig(tier=tier, nmin=2)
    got = rollup(turn_features(turns_sdf), cfg).toPandas()
    exp = oracle_rollup(oracle_features(turns_pdf), cfg)
    keys = ["conv_id", "bucket_start"]
    _assert_frames_match(got, exp, keys)


def test_rollup_salted_equivalent(spark, turns_sdf):
    cfg = RollupConfig(tier="daily")
    a = rollup(turn_features(turns_sdf), cfg, salt=0).toPandas()
    b = rollup(turn_features(turns_sdf), cfg, salt=8).toPandas()
    _assert_frames_match(a, b, ["conv_id", "bucket_start"])


def test_tiering_thresholds(spark, turns_sdf):
    """count==0 -> all-null gap row; 0<count<nmin -> midpoint+max_gate only."""
    cfg = RollupConfig(tier="daily", nmin=5)
    out = rollup(turn_features(turns_sdf), cfg).toPandas()
    gaps = out[out.turn_count == 0]
    assert len(gaps) > 0, "synthetic data should contain gap buckets"
    assert gaps["fcc_mean"].isna().all() and gaps["mid_turn_idx"].isna().all()
    sub = out[(out.turn_count > 0) & (out.turn_count < 5)]
    assert len(sub) > 0
    assert sub["fcc_mean"].isna().all()
    assert sub["mid_turn_idx"].notna().all()
    assert sub["max_gate_value"].notna().all()
    full = out[out.turn_count >= 5]
    assert full["fcc_mean"].notna().all()


@pytest.mark.parametrize("qtype", [1, 6, 8])
def test_rollup_quantile_types(spark, turns_sdf, turns_pdf, qtype):
    """Non-default HF estimators flow through the rollup config and match
    numpy's independent implementation of the same type per bucket."""
    cfg = RollupConfig(tier="daily", nmin=2, quantile_type=qtype)
    got = rollup(turn_features(turns_sdf), cfg).toPandas()
    exp = oracle_rollup(oracle_features(turns_pdf), cfg)
    _assert_frames_match(got, exp, ["conv_id", "bucket_start"])


def test_rollup_config_rejects_bad_quantile_type():
    with pytest.raises(ValueError, match="1..9"):
        RollupConfig(quantile_type=0)
    with pytest.raises(ValueError, match="type-7"):
        RollupConfig(approx_percentiles=True, quantile_type=6)
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        RollupConfig(percentiles=(0.5, 1.5))


def test_rollup_empty_percentiles(spark, turns_sdf):
    """percentiles=() is a legal config: no percentile buffer is
    aggregated and no p-columns appear in the output."""
    cfg = RollupConfig(tier="daily", nmin=2, percentiles=())
    out = rollup(turn_features(turns_sdf), cfg)
    assert not [c for c in out.columns if c.startswith("_")]
    assert "fcc_50" not in out.columns and "fcc_mean" in out.columns
    assert out.count() > 0

@pytest.mark.parametrize("qtype", [7, 6])
def test_rollup_nan_measures_match_oracle(spark, turns_sdf, turns_pdf, qtype):
    """Regression: a NaN that slips past QC (fcc is not in the QC
    predicate) must be DROPPED by every measure aggregate — Spark's
    avg/percentile would otherwise propagate it / sort it greatest,
    while the reference's nanmean semantics and the pandas oracle's
    isnan filter drop it."""
    from pyspark.sql import functions as F

    feats = turn_features(turns_sdf).withColumn(
        "fcc",
        F.when(F.col("turn_idx") % 5 == 0, F.lit(float("nan"))).otherwise(
            F.col("fcc")
        ),
    )
    pf = oracle_features(turns_pdf)
    pf.loc[pf["turn_idx"] % 5 == 0, "fcc"] = np.nan
    cfg = RollupConfig(tier="daily", nmin=2, quantile_type=qtype)
    got = rollup(feats, cfg).toPandas()
    exp = oracle_rollup(pf, cfg)
    # sanity: the injection actually reached aggregated buckets
    assert (pf["turn_idx"] % 5 == 0).any()
    _assert_frames_match(got, exp, ["conv_id", "bucket_start"])
    full = got[got.turn_count >= 2]
    assert np.isfinite(pd.to_numeric(full["fcc_mean"], errors="coerce")).any()


def test_rollup_small_q_extrapolates_like_reference(spark, turns_sdf, turns_pdf):
    """Regression: for non-type-7 estimators at small q the plotting
    position h lands in (-1, 0) and the reference EXTRAPOLATES below
    y[0] (trunc-toward-zero quirk); numpy's named HF methods clamp, so
    the pandas oracle must implement the formula itself. Engine and
    oracle must agree bucket-for-bucket at q=0.05."""
    cfg = RollupConfig(
        tier="daily", nmin=2, quantile_type=8, percentiles=(0.05, 0.5)
    )
    got = rollup(turn_features(turns_sdf), cfg).toPandas()
    exp = oracle_rollup(oracle_features(turns_pdf), cfg)
    _assert_frames_match(got, exp, ["conv_id", "bucket_start"])
    # h = 1/3 + (n + 1/3)*0.05 - 1 < 0 for every bucket with n <= 12:
    # the extrapolation branch genuinely ran somewhere in this data
    assert ((exp.turn_count >= 2) & (exp.turn_count <= 12)).any()


def test_oracle_q7_matches_engine_numpy_hf_grid():
    """The oracle's independent HF formula agrees with the engine's
    hf_quantile_numpy (itself fuzz-pinned to the reference function)
    across every type and the quirk regions (small q, g=0, q=1)."""
    from python_vegindex_spark.functions.quantile import hf_quantile_numpy
    from python_vegindex_spark.oracle.pandas_oracle import _q7

    rng = np.random.default_rng(7)
    for n in (1, 2, 3, 5, 12, 40):
        x = np.round(rng.normal(size=n), 3)
        for qtype in range(1, 10):
            for q in (0.0, 0.01, 0.05, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0):
                got = _q7(x.copy(), q, qtype)
                exp = hf_quantile_numpy(x, q, qtype)
                assert got == pytest.approx(exp, rel=1e-12, abs=1e-12), (
                    n, qtype, q,
                )


def test_top_frequent_heavy_hitters(spark):
    from datetime import datetime, timedelta

    from python_vegindex_spark.operators.generic_rollup import top_frequent

    t0 = datetime(2024, 1, 1)
    rows = (
        [("s", t0 + timedelta(seconds=i), "x") for i in range(3)]
        + [("s", t0 + timedelta(seconds=10 + i), "y") for i in range(3)]
        + [("s", t0 + timedelta(seconds=20), "z")]
        + [("s", t0 + timedelta(seconds=3700), "z")]  # next hour
        + [("s", t0 + timedelta(seconds=30), None)]   # dropped
    )
    df = spark.createDataFrame(rows, ["s", "ts", "code"])
    out = [
        (r["bucket_start"].hour, r["rank"], r["key"], r["n"])
        for r in top_frequent(df, "hourly", ["s"], "code", k=2)
        .orderBy("bucket_start", "rank")
        .collect()
    ]
    # tie between x and y broken by key ASC
    assert out == [(0, 1, "x", 3), (0, 2, "y", 3), (1, 1, "z", 1)]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must"):
        top_frequent(df, "hourly", ["s"], "code", k=0)
