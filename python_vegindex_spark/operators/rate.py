"""Monitoring-grade operators over the (series, ts, value) rollup shape.

* :func:`counter_increase` — PromQL-style ``increase()``/``rate()``
  over MONOTONE COUNTERS that occasionally reset to zero (process
  restart): per series ordered by ts the per-sample delta is
  ``v - lag(v)``, and a NEGATIVE delta means the counter restarted, so
  the sample contributes its own value ``v`` (everything accumulated
  since the reset). The first sample of a series has no baseline and
  contributes nothing. Deltas then roll into calendar buckets.
* :func:`time_weighted_avg` — per-bucket LOCF time-weighted average
  (TimescaleDB ``time_weight('locf')`` / Influx ``integral`` analog).
* :func:`anomaly_zscore` — per-row z-score flags against the row's own
  trailing time window, self and ts-peers excluded.
* :func:`sliding_time_stats` — per-row trailing-window aggregates over
  a TIME range (``RANGE BETWEEN <seconds> PRECEDING AND CURRENT
  ROW``), the moving-average / rolling-count primitive. Rows with
  equal ts are peers and all enter each other's window (SQL RANGE
  semantics), so the result is order-deterministic under ties.

Each is one window per series (lag / lead / RANGE frame) plus at most
one hash aggregate on the same or a coarser key — a single
(series)-keyed shuffle, pure column expressions, JVM window exec, no
UDFs. Hot series at 100 TB: counters at sample grain can be large per
series; pre-bucket the lag with the same two-level split the latency
feature uses (features.py lag_via_join) if a single series outgrows a
task — the delta definition only needs each sample's predecessor, so
the decomposition is exact.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.buckets import bucket_start, tier_step_seconds
from ..functions.timeutil import epoch_us

#: NOMINAL seconds per tier bucket, for rate_per_s. hourly/daily/Nmin
#: are exact; weekly uses the nominal 7 days even for the short final
#: doy-anchored bucket of a year (rate() normalizes by the stated
#: window, the PromQL convention).
_TIER_SECONDS = {"hourly": 3600, "daily": 86400, "weekly": 7 * 86400}


def _bucket_seconds(tier: str) -> int:
    sec = tier_step_seconds(tier) or _TIER_SECONDS.get(tier)
    if sec is None:
        raise ValueError(
            f"fixed-width tiers are {sorted(_TIER_SECONDS)} or 'Nmin', got {tier!r}"
        )
    return sec


def counter_increase(
    df: DataFrame,
    tier: str,
    series_cols: Sequence[str],
    ts_col: str = "ts",
    counter_col: str = "value",
    order_cols: Sequence[str] = (),
    round_to: int | None = 6,
) -> DataFrame:
    """Roll per-sample counter deltas into tier buckets.

    ``order_cols`` breaks ts ties deterministically (pass a unique id).
    Output per (series, bucket_start): ``n_samples``, ``n_resets``,
    ``increase`` (sum of reset-adjusted deltas) and ``rate_per_s``
    (increase / bucket seconds; calendar tiers only).
    """
    sec = _bucket_seconds(tier)  # validates: hourly/daily/weekly/Nmin
    ts = F.col(ts_col)
    v = F.col(counter_col)
    w = Window.partitionBy(*[F.col(c) for c in series_cols]).orderBy(
        ts_col, *order_cols
    )
    delta = v - F.lag(v).over(w)
    adj = F.when(delta < 0, v).otherwise(delta)  # NULL first sample stays NULL
    d = df.select(
        *series_cols,
        bucket_start(ts, tier).alias("bucket_start"),
        adj.alias("_adj"),
        (delta < 0).alias("_reset"),
    )

    def _r(c):
        return F.round(c, round_to) if round_to is not None else c

    return d.groupBy(*series_cols, "bucket_start").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.count(F.when(F.col("_reset"), 1)).alias("n_resets"),
        F.coalesce(F.sum("_adj"), F.lit(0)).alias("increase"),
    ).withColumn(
        "rate_per_s", _r(F.col("increase").cast("double") / F.lit(float(sec)))
    )


def time_weighted_avg(
    df: DataFrame,
    tier: str,
    series_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: Sequence[str] = (),
    round_to: int | None = 6,
) -> DataFrame:
    """Per-bucket time-weighted average under LOCF weighting (the
    TimescaleDB ``time_weight('locf')`` / Influx ``integral`` analog).

    Each sample's value holds from its own ts to the NEXT sample in the
    same bucket (the last sample holds to the bucket end), so irregular
    sampling is weighted by actual coverage instead of sample count.
    Output per (series, bucket_start): ``n_samples``, ``covered_us``
    (first sample -> bucket end), ``twa = sum(v * dt) / sum(dt)``.
    The span before a bucket's first sample is uncovered and excluded
    (covered-span normalization).

    Rows with equal ts are zero-width except the last of the tie —
    pass ``order_cols`` (a unique id) so WHICH peer carries the span is
    deterministic. NULL values are dropped (a NULL sample carries no
    coverage). One window + one hash aggregate, both on the same
    (series, bucket) key — a single shuffle, JVM-only.
    """
    step = tier_step_seconds(tier)
    if step is None and tier not in ("daily", "weekly"):
        raise ValueError(
            f"twa tiers are ['daily', 'hourly', 'weekly'] or 'Nmin', got {tier!r}"
        )
    ts = F.col(ts_col)
    v = F.col(value_col)
    # NaN ≡ NULL (engine-wide rule): neither carries coverage
    d = df.where(
        v.isNotNull() & ~F.isnan(v.cast("double")) & ts.isNotNull()
    ).withColumn("bucket_start", bucket_start(ts, tier))
    w = Window.partitionBy(
        *[F.col(c) for c in series_cols], F.col("bucket_start")
    ).orderBy(ts_col, *order_cols)
    if step is not None:
        bucket_end = F.col("bucket_start") + F.expr(f"INTERVAL {step} SECONDS")
    else:
        days = {"daily": 1, "weekly": 7}[tier]
        bucket_end = F.to_timestamp(F.date_add(F.col("bucket_start"), days))
    dt = epoch_us(F.coalesce(F.lead(ts).over(w), bucket_end)) - epoch_us(ts)
    d = d.withColumn("_dt", dt)

    def _r(c):
        return F.round(c, round_to) if round_to is not None else c

    return d.groupBy(*series_cols, "bucket_start").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum("_dt").alias("covered_us"),
        _r(
            F.sum(v * F.col("_dt").cast("double"))
            / F.sum(F.col("_dt").cast("double"))
        ).alias("twa"),
    )


def anomaly_zscore(
    df: DataFrame,
    window_s: int,
    series_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    threshold: float = 3.0,
    min_baseline: int = 10,
    round_to: int | None = 6,
) -> DataFrame:
    """Flag rows whose value deviates > ``threshold`` population z-scores
    from their own trailing time window (the streaming-monitor rule:
    baseline = ``[ts - window_s, ts)``, CURRENT ROW AND ITS ts-PEERS
    EXCLUDED so the anomaly can't contaminate its own baseline and ties
    are order-independent).

    Appends ``base_n`` / ``base_mean`` / ``base_std`` / ``z`` /
    ``is_anomaly`` (NULL z when the baseline has < ``min_baseline``
    rows or zero variance). The baseline moments are derived from the
    window's integer-safe sum/sum-of-squares when ``value_col`` is
    integral (engine-exact: ``sqrt(sq/n - (s/n)^2)`` in a pinned op
    order); float columns get the same formula on float sums. One
    (series)-keyed RANGE window, JVM-only.
    """
    if window_s <= 0:
        raise ValueError(f"window_s must be > 0, got {window_s}")
    if min_baseline < 2:
        raise ValueError(f"min_baseline must be >= 2, got {min_baseline}")
    tus = epoch_us(F.col(ts_col))
    d = df.withColumn("_tus", tus)
    w = (
        Window.partitionBy(*[F.col(c) for c in series_cols])
        .orderBy("_tus")
        .rangeBetween(-int(window_s) * 1_000_000, -1)
    )
    v = F.col(value_col)
    n = F.count(v).over(w)
    s = F.sum(v).over(w).cast("double")
    sq = F.sum(v * v).over(w).cast("double")
    nd = n.cast("double")
    mean = s / nd
    var = sq / nd - mean * mean
    std = F.sqrt(var)
    z = (v.cast("double") - mean) / std

    def _r(c):
        return F.round(c, round_to) if round_to is not None else c

    ok = (n >= min_baseline) & (std > 0)
    return (
        d.withColumn("base_n", n)
        .withColumn("base_mean", F.when(ok, _r(mean)))
        .withColumn("base_std", F.when(ok, _r(std)))
        .withColumn("z", F.when(ok, _r(z)))
        .withColumn(
            "is_anomaly",
            F.when(ok, F.abs(z) > F.lit(float(threshold))).otherwise(F.lit(False)),
        )
        .drop("_tus")
    )


def sliding_time_stats(
    df: DataFrame,
    window_s: int,
    series_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    round_to: int | None = 6,
) -> DataFrame:
    """Append trailing time-window stats to every row.

    ``w_n`` / ``w_sum`` / ``w_avg`` over ``[ts - window_s, ts]``
    (inclusive both ends, matching SQL ``RANGE ... PRECEDING``).
    The frame is a RANGE over epoch microseconds, so unevenly-sampled
    series window correctly; NULL values count toward nothing.
    """
    if window_s <= 0:
        raise ValueError(f"window_s must be > 0, got {window_s}")
    tus = epoch_us(F.col(ts_col))
    d = df.withColumn("_tus", tus)
    w = (
        Window.partitionBy(*[F.col(c) for c in series_cols])
        .orderBy("_tus")
        .rangeBetween(-int(window_s) * 1_000_000, 0)
    )
    v = F.col(value_col)

    def _r(c):
        return F.round(c, round_to) if round_to is not None else c

    return (
        d.withColumn("w_n", F.count(v).over(w))
        .withColumn("w_sum", _r(F.sum(v).over(w)))
        .withColumn("w_avg", _r(F.avg(v).over(w)))
        .drop("_tus")
    )
