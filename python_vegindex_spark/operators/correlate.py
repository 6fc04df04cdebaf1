"""Series correlation analytics: cross-correlation matrix + ACF.

Monitoring staples the rollup family feeds ("which metrics move
together?", "is this series self-similar at a daily lag?") — the
InfluxDB ``pearsonr`` / Datadog metric-correlation analog, built the
engine's standard two-stage way:

* **Stage 1 (the only big scan)**: one hash aggregate collapses raw
  rows to per-(series, bucket) INTEGER sums of the quantized measure —
  ``sum(floor(value * scale))`` as BIGINT, order-free and engine-exact
  (the ``linear_trend`` discipline, operators/rate.py).
* **Stage 2 (small data)**: a self-join on the already-aggregated
  bucket table aligns series pairs (cross-correlation) or each series
  with its own lagged buckets (ACF), then a second hash aggregate
  accumulates the six Pearson moment sums as DECIMAL(38,0) — exact
  128-bit-ish integer arithmetic on Spark (DuckDB promotes BIGINT sums
  to HUGEINT), so the only floating-point step is the final pinned

      corr = (n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx*Sx) * sqrt(n*Syy - Sy*Sy))

  evaluated in doubles in exactly this op order — reproducible
  bit-for-bit across engines.

Scale: the raw table is touched ONCE; everything pairwise runs on
``series x buckets`` aggregate rows. Pairwise cross-correlation is
O(k^2) in the number of series — right for dashboard-scale series
counts (the intended use); a million-series all-pairs search is a
similarity-search problem (operators/similarity.py), not this.
Alignment: only buckets BOTH sides observed join (sample correlation
over common buckets; gap buckets don't fabricate zeros). ACF pairs
(t, t+lag) the same way — the standard sample ACF over observed pairs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.buckets import bucket_start, tier_step_seconds


def _bucket_sums(
    df: DataFrame,
    tier: str,
    series_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    scale: int,
) -> DataFrame:
    """Per-(series, bucket) BIGINT sum of the quantized measure — one
    hash aggregate over the raw table. NaN/NULL rows drop (NaN would
    poison the integer sums)."""
    ts = F.col(ts_col)
    v = F.col(value_col).cast("double")
    d = df.where(ts.isNotNull() & v.isNotNull() & ~F.isnan(v)).select(
        *series_cols,
        bucket_start(ts, tier).alias("bucket_start"),
        F.floor(v * scale).cast("long").alias("_q"),
    )
    return d.groupBy(*series_cols, "bucket_start").agg(
        F.sum("_q").alias("_v")
    )


def _pearson_from_pairs(pairs: DataFrame, keys: list[str], min_buckets: int,
                        round_to: int | None) -> DataFrame:
    """(keys, _a, _b) pair rows -> per-key n + pinned-order Pearson corr.
    Moment sums in DECIMAL(38,0): exact for |v| up to ~1e18-pair
    products, far past the BIGINT bucket sums feeding them."""
    dec = "decimal(38,0)"
    a = F.col("_a").cast(dec)
    b = F.col("_b").cast(dec)
    agg = pairs.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(a).alias("_sx"),
        F.sum(b).alias("_sy"),
        F.sum(a * a).alias("_sxx"),
        F.sum(a * b).alias("_sxy"),
        F.sum(b * b).alias("_syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    cov_n = n * F.col("_sxy").cast("double") - sx * sy
    varx_n = n * F.col("_sxx").cast("double") - sx * sx
    vary_n = n * F.col("_syy").cast("double") - sy * sy
    corr = F.when(
        (F.col("n") >= int(min_buckets)) & (varx_n > 0) & (vary_n > 0),
        cov_n / (F.sqrt(varx_n) * F.sqrt(vary_n)),
    )
    if round_to is not None:
        corr = F.round(corr, round_to)
    return agg.select(*keys, "n", corr.alias("corr"))


def series_correlation(
    df: DataFrame,
    tier: str,
    series_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    scale: int = 100,
    min_buckets: int = 2,
    round_to: int | None = 6,
) -> DataFrame:
    """Pairwise Pearson correlation between every two series' bucket
    sums, over the buckets both observed. Returns one row per unordered
    pair ``(series_a < series_b)``: n (common buckets) + corr."""
    # pin the small aggregate: without it the self-join's two branches
    # each re-run the whole stage-1 lineage — TWO raw-table scans
    # (plan-asserted in test_plans.py)
    sums = _bucket_sums(
        df, tier, [series_col], ts_col, value_col, scale
    ).localCheckpoint(eager=True)
    lhs = sums.select(
        F.col(series_col).alias("series_a"), "bucket_start", F.col("_v").alias("_a")
    )
    rhs = sums.select(
        F.col(series_col).alias("series_b"), "bucket_start", F.col("_v").alias("_b")
    )
    pairs = lhs.join(rhs, on="bucket_start").where(
        F.col("series_a") < F.col("series_b")
    )
    return _pearson_from_pairs(pairs, ["series_a", "series_b"], min_buckets, round_to)


def lagged_cross_correlation(
    df: DataFrame,
    tier: str,
    series_col: str,
    lags: Sequence[int] = (0, 1),
    ts_col: str = "ts",
    value_col: str = "value",
    scale: int = 100,
    min_buckets: int = 2,
    round_to: int | None = 6,
) -> DataFrame:
    """Lead-lag analysis: Pearson correlation of series_a at bucket t
    against series_b at bucket t+lag — "does A lead B by k buckets?".
    Directional, so ORDERED pairs (a != b) are emitted; lag 0 rows
    reproduce :func:`series_correlation` symmetrically. Fixed-step
    tiers only (same restriction and lag arithmetic as
    :func:`autocorrelation`)."""
    if not lags or any(int(k) < 0 for k in lags):
        raise ValueError(f"lags must be a non-empty list of ints >= 0, got {list(lags)!r}")
    step_s = tier_step_seconds(tier)
    if step_s is None and tier != "daily":
        raise ValueError(
            f"lagged cross-correlation needs a fixed-step tier "
            f"(hourly/Nmin/daily), got {tier!r}"
        )
    sums = _bucket_sums(
        df, tier, [series_col], ts_col, value_col, scale
    ).localCheckpoint(eager=True)

    out = None
    for k in sorted({int(k) for k in lags}):
        if tier == "daily":
            lead_bucket = F.date_add(F.col("bucket_start"), k)
        else:
            lead_bucket = F.col("bucket_start") + F.expr(
                f"INTERVAL {k * step_s} SECONDS"
            )
        lhs = sums.select(
            F.col(series_col).alias("series_a"),
            lead_bucket.alias("bucket_start"),
            F.col("_v").alias("_a"),
        )
        rhs = sums.select(
            F.col(series_col).alias("series_b"),
            "bucket_start",
            F.col("_v").alias("_b"),
        )
        pairs = (
            lhs.join(rhs, on="bucket_start")
            .where(F.col("series_a") != F.col("series_b"))
            .withColumn("lag", F.lit(k))
        )
        res = _pearson_from_pairs(
            pairs, ["series_a", "series_b", "lag"], min_buckets, round_to
        )
        out = res if out is None else out.unionByName(res)
    return out


def forecast_backtest_error(
    df: DataFrame,
    tier: str,
    series_cols: Sequence[str],
    season: int = 7,
    ts_col: str = "ts",
    value_col: str = "value",
    scale: int = 100,
    round_to: int | None = 6,
) -> DataFrame:
    """Forecast-accuracy backtest for the two standard baselines: the
    NAIVE forecast (v̂_t = v_{t-1}) and the SEASONAL-NAIVE forecast
    (v̂_t = v_{t-season}) — per series, MAE and RMSE over every observed
    (t-k, t) bucket pair. The naive MAE is MASE's denominator, so
    ``mae@lag=season / mae@lag=1`` reads as "does the seasonal model
    beat a random walk". Calendar-exact pairing (gap buckets form no
    pair, never a fabricated zero); errors are exact integers in
    quantized units, MAE/RMSE finish in one pinned double op order
    ``(sum/n)/scale`` / ``sqrt(sumsq/n)/scale``. Fixed-step tiers only.
    Output: one row per (series, lag in {1, season})."""
    if int(season) < 2:
        raise ValueError(f"season must be >= 2, got {season}")
    step_s = tier_step_seconds(tier)
    if step_s is None and tier != "daily":
        raise ValueError(
            f"forecast backtest needs a fixed-step tier (hourly/Nmin/daily), "
            f"got {tier!r}"
        )
    sums = _bucket_sums(
        df, tier, list(series_cols), ts_col, value_col, scale
    ).localCheckpoint(eager=True)

    out = None
    for k in (1, int(season)):
        if tier == "daily":
            lead_bucket = F.date_add(F.col("bucket_start"), k)
        else:
            lead_bucket = F.col("bucket_start") + F.expr(
                f"INTERVAL {k * step_s} SECONDS"
            )
        lhs = sums.select(
            *series_cols, lead_bucket.alias("bucket_start"), F.col("_v").alias("_a")
        )
        rhs = sums.select(*series_cols, "bucket_start", F.col("_v").alias("_b"))
        err = F.col("_b") - F.col("_a")  # actual - forecast, exact BIGINT
        agg = (
            lhs.join(rhs, on=[*series_cols, "bucket_start"])
            .groupBy(*series_cols)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.abs(err)).alias("_sabs"),
                F.sum(
                    (err.cast("decimal(38,0)")) * (err.cast("decimal(38,0)"))
                ).alias("_ssq"),
            )
            .withColumn("lag", F.lit(k))
        )
        n = F.col("n").cast("double")
        mae = (F.col("_sabs").cast("double") / n) / F.lit(float(scale))
        rmse = F.sqrt(F.col("_ssq").cast("double") / n) / F.lit(float(scale))
        if round_to is not None:
            mae, rmse = F.round(mae, round_to), F.round(rmse, round_to)
        res = agg.select(*series_cols, "lag", "n", mae.alias("mae"), rmse.alias("rmse"))
        out = res if out is None else out.unionByName(res)
    return out


def autocorrelation(
    df: DataFrame,
    tier: str,
    series_cols: Sequence[str],
    lags: Sequence[int] = (1,),
    ts_col: str = "ts",
    value_col: str = "value",
    scale: int = 100,
    min_buckets: int = 2,
    round_to: int | None = 6,
) -> DataFrame:
    """Sample autocorrelation of each series' bucket sums at the given
    bucket ``lags``: one row per (series, lag) with n (observed (t,
    t+lag) pairs) + corr. Lag arithmetic needs a FIXED bucket step, so
    the tier must be hourly / ``Nmin`` (seconds) or daily (whole days);
    the doy-anchored weekly/``Nday`` lattices restart at Jan 1 and have
    no uniform step — rejected."""
    if not lags or any(int(k) < 1 for k in lags):
        raise ValueError(f"lags must be a non-empty list of ints >= 1, got {list(lags)!r}")
    step_s = tier_step_seconds(tier)
    if step_s is None and tier != "daily":
        raise ValueError(
            f"autocorrelation needs a fixed-step tier (hourly/Nmin/daily), got {tier!r}"
        )
    sums = _bucket_sums(df, tier, list(series_cols), ts_col, value_col, scale)
    sums = sums.localCheckpoint(eager=True)  # tiny; reused once per lag

    out = None
    for k in sorted({int(k) for k in lags}):
        if tier == "daily":
            lagged_bucket = F.date_add(F.col("bucket_start"), k)
        else:
            lagged_bucket = F.col("bucket_start") + F.expr(
                f"INTERVAL {k * step_s} SECONDS"
            )
        lhs = sums.select(
            *series_cols,
            lagged_bucket.alias("bucket_start"),
            F.col("_v").alias("_a"),
        )
        rhs = sums.select(*series_cols, "bucket_start", F.col("_v").alias("_b"))
        pairs = lhs.join(rhs, on=[*series_cols, "bucket_start"]).withColumn(
            "lag", F.lit(k)
        )
        res = _pearson_from_pairs(
            pairs, [*series_cols, "lag"], min_buckets, round_to
        )
        out = res if out is None else out.unionByName(res)
    return out


def spearman_correlation(
    df: DataFrame,
    tier: str,
    series_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    scale: int = 100,
    min_buckets: int = 2,
    round_to: int | None = 6,
) -> DataFrame:
    """Pairwise SPEARMAN rank correlation between every two series'
    bucket sums — the robust twin of :func:`series_correlation`
    (monotone association instead of linear; one wild bucket moves a
    Pearson corr arbitrarily, but only shifts a rank by one).

    Ranks are the textbook tie-averaged ranks computed over the COMMON
    buckets of each pair (standard paired-sample Spearman), kept
    integer-exact by the doubling trick: ``2*avg_rank = 2*min_rank +
    ties - 1`` is always an integer, and Pearson over the doubled ranks
    equals Pearson over the ranks (correlation is shift/scale
    invariant). The moment sums then run through the same exact
    DECIMAL(38,0) machinery as :func:`series_correlation` — the final
    pinned-order double expression is the only floating-point step.

    Scale: stage 1 is the shared one-scan bucket aggregate; the rank
    windows partition by (pair) over bucket rows — k^2 x buckets
    aggregate-sized work, never raw rows.
    """
    from pyspark.sql import Window

    sums = _bucket_sums(
        df, tier, [series_col], ts_col, value_col, scale
    ).localCheckpoint(eager=True)
    lhs = sums.select(
        F.col(series_col).alias("series_a"), "bucket_start", F.col("_v").alias("_va")
    )
    rhs = sums.select(
        F.col(series_col).alias("series_b"), "bucket_start", F.col("_v").alias("_vb")
    )
    pairs = lhs.join(rhs, on="bucket_start").where(
        F.col("series_a") < F.col("series_b")
    )
    pk = ["series_a", "series_b"]

    def _r2(col: str) -> F.Column:
        # 2 * tie-averaged rank, always integral: 2*min_rank + ties - 1
        wr = Window.partitionBy(*pk).orderBy(F.col(col))
        wt = Window.partitionBy(*pk, col)
        return (
            F.lit(2) * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - F.lit(1)
        ).cast("long")

    ranked = pairs.select(
        *pk,
        _r2("_va").alias("_a"),
        _r2("_vb").alias("_b"),
    )
    return _pearson_from_pairs(ranked, pk, min_buckets, round_to)


def rolling_correlation(
    df: DataFrame,
    tier: str,
    series_col: str,
    window: int = 7,
    min_periods: int = 3,
    ts_col: str = "ts",
    value_col: str = "value",
    scale: int = 100,
    round_to: int | None = 6,
) -> DataFrame:
    """TRAILING-window Pearson correlation between every two series'
    bucket sums — "are these two metrics moving together *right now*?",
    the time-resolved member of the correlation family (the all-time
    matrix answers "in general"; this one emits a correlation PER
    BUCKET over the last ``window`` buckets).

    Exactness discipline: the six Pearson moments accumulate over a
    RANGE frame on the bucket's integer step index — window sums of
    DECIMAL(38,0) products of the BIGINT bucket sums, order-free and
    segment-tree-immune — and the only floating-point step is the
    final pinned corr expression per row. Gap buckets are simply
    absent (sample correlation over the observed buckets in the
    window); rows with fewer than ``min_periods`` observed buckets
    emit NULL.

    Fixed-step tiers only (hourly/Nmin/daily — the same restriction as
    :func:`autocorrelation`): the frame is "last ``window`` LATTICE
    steps", not "last ``window`` observed rows", so a gap shrinks the
    sample instead of silently stretching the window back in time.

    Scale: one raw scan (the shared stage-1 bucket aggregate), a
    self-join and windows over ``series x buckets`` aggregate rows.

    Output per (series_a < series_b, ``bucket_start``): ``n`` (observed
    common buckets in the window), ``corr``.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2 buckets, got {window}")
    if min_periods < 2:
        raise ValueError(f"min_periods must be >= 2, got {min_periods}")
    from pyspark.sql import Window

    from ..functions.timeutil import epoch_us

    step_s = tier_step_seconds(tier)
    if step_s is None:
        if tier != "daily":
            raise ValueError(
                f"rolling correlation needs a fixed-step tier "
                f"(hourly/Nmin/daily), got {tier!r}"
            )
        step_s = 86400
    sums = _bucket_sums(
        df, tier, [series_col], ts_col, value_col, scale
    ).localCheckpoint(eager=True)
    lhs = sums.select(
        F.col(series_col).alias("series_a"), "bucket_start", F.col("_v").alias("_va")
    )
    rhs = sums.select(
        F.col(series_col).alias("series_b"), "bucket_start", F.col("_v").alias("_vb")
    )
    pairs = lhs.join(rhs, on="bucket_start").where(
        F.col("series_a") < F.col("series_b")
    )
    dec = "decimal(38,0)"
    a = F.col("_va").cast(dec)
    b = F.col("_vb").cast(dec)
    step = (
        epoch_us(F.col("bucket_start").cast("timestamp"))
        / F.lit(int(step_s) * 1_000_000)
    ).cast("long")
    w = (
        Window.partitionBy("series_a", "series_b")
        .orderBy(F.col("_step"))
        .rangeBetween(-(int(window) - 1), 0)
    )
    framed = pairs.withColumn("_step", step).select(
        "series_a",
        "series_b",
        "bucket_start",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(a).over(w).alias("_sx"),
        F.sum(b).over(w).alias("_sy"),
        F.sum(a * a).over(w).alias("_sxx"),
        F.sum(a * b).over(w).alias("_sxy"),
        F.sum(b * b).over(w).alias("_syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    cov_n = n * F.col("_sxy").cast("double") - sx * sy
    varx_n = n * F.col("_sxx").cast("double") - sx * sx
    vary_n = n * F.col("_syy").cast("double") - sy * sy
    corr = F.when(
        (F.col("n") >= int(min_periods)) & (varx_n > 0) & (vary_n > 0),
        cov_n / (F.sqrt(varx_n) * F.sqrt(vary_n)),
    )
    if round_to is not None:
        corr = F.round(corr, round_to)
    return framed.select(
        "series_a", "series_b", "bucket_start", "n", corr.alias("corr")
    )
