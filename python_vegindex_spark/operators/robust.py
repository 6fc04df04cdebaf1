"""Robust rank-based rollups: trimmed mean and Theil-Sen slope.

The third and fourth members of the robust-statistics family started by
:func:`rate.mad_rollup` (median/MAD/outlier count). Both are bucketed
rollups over integer-quantized measures so every reported float is the
result of ONE pinned division over exact integer intermediates —
bit-identical across engines, same discipline as the rest of the repo.

Reference parity: vegindex's QC pipeline trims by *rule* (brightness
gates, solar elevation — SURVEY §2.2 F1/F5) before aggregating; the
trimmed mean is the rank-based generalization of that idea (drop the
k most extreme values per bucket instead of rule-flagged ones), and
Theil-Sen is the robust twin of the per-bucket OLS slope
(`operators/rate.linear_trend`): the median of all pairwise slopes has
a 29.3 % breakdown point where OLS has 0.

Scale notes (100 TB):

* ``trimmed_mean_rollup`` — one shuffle on (series, bucket) for the
  rank window plus one hash aggregate reusing the SAME exchange
  (Catalyst reuses the partitioning); hot buckets are bounded by the
  bucket grain, the standard rollup-key property.
* ``theilsen_slopes`` — the pair self-join is O(n²) PER BUCKET by
  construction (that is the estimator), so it is meant for rolled-up
  grains where per-bucket row counts are bounded (daily buckets of
  per-hour points, per-series daily event counts, ...). The join is an
  equi-join on (series, bucket) — both sides shuffle once on the same
  key and pairs never leave their partition. ``max_bucket_rows`` makes
  the bound explicit: buckets larger than it raise at plan-build time
  (counted in one cheap aggregate) instead of silently exploding.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_vegindex_spark.functions.buckets import bucket_start
from python_vegindex_spark.functions.timeutil import epoch_us

__all__ = ["trimmed_mean_rollup", "theilsen_slopes"]


def _quantized(df: DataFrame, tier: str, series_cols: Sequence[str],
               ts_col: str, value_col: str, scale: int) -> DataFrame:
    """(series, bucket_start, _q BIGINT) rows; NaN ≡ NULL dropped."""
    ts = F.col(ts_col)
    v = F.col(value_col).cast("double")
    return df.where(ts.isNotNull() & v.isNotNull() & ~F.isnan(v)).select(
        *series_cols,
        bucket_start(ts, tier).alias("bucket_start"),
        ts.alias("_ts"),
        F.floor(v * scale).cast("long").alias("_q"),
    )


def trimmed_mean_rollup(
    df: DataFrame,
    tier: str,
    series_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    trim_frac: float = 0.1,
    scale: int = 100,
    round_to: int | None = 6,
) -> DataFrame:
    """Per-bucket trimmed mean: drop the ``floor(n * trim_frac)``
    smallest AND largest values, mean the rest.

    Exactness: values quantize to BIGINT (``floor(v * scale)``), the
    surviving multiset after trimming is deterministic even when ties
    straddle the cut (row_number breaks ties arbitrarily but always
    removes exactly k copies drawn from the tied *value*, so the
    surviving value-multiset — and therefore its BIGINT sum — is
    unique), and the mean is that exact sum over an exact count: one
    division per reported float.

    Output per (series, bucket_start): ``n`` (pre-trim), ``n_trim``
    (rows dropped per side), ``n_kept``, ``trimmed_mean`` (in ORIGINAL
    value units: the quantized mean divided back by ``scale`` inside
    the same single division).
    """
    if not (0.0 <= trim_frac < 0.5):
        raise ValueError(f"trim_frac must be in [0, 0.5), got {trim_frac}")
    d = _quantized(df, tier, series_cols, ts_col, value_col, scale)
    keys = [*series_cols, "bucket_start"]
    w = Window.partitionBy(*keys).orderBy(F.col("_q"))
    ranked = d.select(
        *keys,
        "_q",
        F.row_number().over(w).alias("_rk"),
        F.count(F.lit(1)).over(Window.partitionBy(*keys)).alias("_n"),
    )
    k = F.floor(F.col("_n") * F.lit(float(trim_frac))).cast("long")
    kept = ranked.where((F.col("_rk") > k) & (F.col("_rk") <= F.col("_n") - k))
    out = kept.groupBy(*keys).agg(
        F.first("_n").alias("n"),
        F.first(k).alias("n_trim"),
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("_q").alias("_s"),
    )
    # ONE division: exact BIGINT sum over (kept rows * scale).
    mean = F.col("_s").cast("double") / (
        F.col("n_kept") * F.lit(int(scale))
    ).cast("double")
    if round_to is not None:
        mean = F.round(mean, round_to)
    return out.select(*keys, "n", "n_trim", "n_kept", mean.alias("trimmed_mean"))


def theilsen_slopes(
    df: DataFrame,
    tier: str,
    series_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    scale: int = 100,
    slope_scale: int = 1_000_000,
    max_bucket_rows: int | None = 10_000,
    round_to: int | None = 6,
) -> DataFrame:
    """Per-bucket Theil-Sen estimator: the exact median of all pairwise
    slopes ``(v_j - v_i) / (t_j - t_i)`` over strictly-increasing
    timestamps (equal-``ts`` pairs are excluded — their slope is
    undefined; both engines exclude the identical pair set).

    Slope units: quantized value units per SECOND (``v`` scaled by
    ``scale``, ``t`` in epoch microseconds, the 1e6 µs→s factor folded
    into the single final division).

    Exactness: each pairwise slope is one IEEE division of two exact
    integers — deterministic but not a "nice" double, so the median's
    even-count interpolation could differ by an ulp across engines.
    The slopes therefore re-quantize (``floor(slope * slope_scale)``,
    product + floor both deterministic) and the median is taken over
    BIGINTs — exact halves on every engine — then divided back out.

    Output per (series, bucket_start): ``n`` (points), ``n_pairs``,
    ``slope`` (original-units/second, or NULL when fewer than 2
    distinct timestamps).
    """
    # pin the quantized frame: it feeds the guard, the per-bucket counts
    # AND both self-join sides — without the checkpoint each consumer
    # would re-run the raw-table lineage (the correlate/decompose
    # single-scan discipline, plan-asserted in test_plans.py)
    d = (
        _quantized(df, tier, series_cols, ts_col, value_col, scale)
        .select(
            *series_cols,
            "bucket_start",
            epoch_us(F.col("_ts")).alias("_t"),
            "_q",
        )
        .localCheckpoint(eager=True)
    )
    keys = [*series_cols, "bucket_start"]
    counts = d.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    if max_bucket_rows is not None:
        mx = counts.agg(F.max("n").alias("m")).collect()[0]["m"]
        if mx is not None and mx > max_bucket_rows:
            raise ValueError(
                f"theilsen_slopes: a bucket holds {mx} rows "
                f"(> max_bucket_rows={max_bucket_rows}); the pair join is "
                "O(n^2) per bucket — roll up to a coarser grain first or "
                "raise/disable the guard explicitly"
            )
    a = d.select(*keys, F.col("_t").alias("_t1"), F.col("_q").alias("_q1"))
    b = d.select(*keys, F.col("_t").alias("_t2"), F.col("_q").alias("_q2"))
    pairs = a.join(b, keys).where(F.col("_t1") < F.col("_t2"))
    # slope in value-units/sec = ((q2-q1)/scale) / ((t2-t1)/1e6)
    #  = (q2-q1) * (1e6/scale) / (t2-t1); quantize for the exact median.
    raw = (
        (F.col("_q2") - F.col("_q1")).cast("double")
        * F.lit(1_000_000.0 / float(scale))
        / (F.col("_t2") - F.col("_t1")).cast("double")
    )
    sl = pairs.select(*keys, F.floor(raw * F.lit(float(slope_scale))).cast("long").alias("_sq"))
    med = sl.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.percentile(F.col("_sq").cast("double"), F.lit(0.5)).alias("_m"),
    )
    slope = F.col("_m") / F.lit(float(slope_scale))
    if round_to is not None:
        slope = F.round(slope, round_to)
    return (
        counts.join(med, keys, "left")
        .select(
            *keys,
            "n",
            F.coalesce(F.col("n_pairs"), F.lit(0)).alias("n_pairs"),
            slope.alias("slope"),
        )
    )
