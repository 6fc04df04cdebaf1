"""Bar (candlestick) aggregation: OHLC + VWAP per calendar bucket.

The classic finance downsample (TimescaleDB ``candlestick_agg``,
QuestDB ``SAMPLE BY`` with first/last/min/max, kdb ``xbar`` bars) —
per (series, bucket): the first value by time (open), the extremes
(high/low), the last value by time (close), and optionally a
weighted mean (VWAP when the weight is volume).

Shape: vegindex has no finance ops, but the *open/close* selection is
the same "representative row by time order" aggregate as the midday
image pick (reference ``generate_summary_timeseries.py:393-400``) —
and it is implemented the same way: a ``min``/``max`` over a struct
whose leading fields are the order key, one aggregate, no window over
raw rows. One shuffle on (series, bucket), map-side partial
aggregation, pure JVM expressions — the plan survives 100 TB because
the state per group is O(1). (Struct-typed aggregation buffers make
Spark pick SortAggregate over HashAggregate — the partial/final split
and the single Exchange are unchanged, plan-asserted in
tests/test_plans.py; the within-partition sort on the grouping key is
the only extra cost, same trade the rollup's min-struct midday pick
makes.)

Determinism: ties on ``ts`` are broken by ``order_cols`` (pass a
unique id); the struct comparison is lexicographic on
``(epoch_us, *order_cols, value)`` so open/close are reproducible and
cross-engine mirrorable (DuckDB compares structs the same way).
NaN/NULL values are dropped up front — Spark and DuckDB disagree on
NaN ordering inside comparisons, and the reference's nan-dropping
aggregate semantics (SURVEY §2.4 A3) apply here too.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.buckets import bucket_start
from ..functions.timeutil import epoch_us


def ohlc_bars(
    df: DataFrame,
    tier: str,
    series_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    weight_col: str | None = None,
    order_cols: Sequence[str] = (),
    round_to: int | None = 6,
) -> DataFrame:
    """Per (series, bucket_start): ``n``, ``open``, ``high``, ``low``,
    ``close`` and — when ``weight_col`` is given — ``w_sum`` and
    ``vwap = sum(value*weight) / sum(weight)``.

    ``tier`` is any tier :func:`..functions.buckets.bucket_start`
    accepts (hourly / daily / weekly / ``Nmin`` / ``Nday``).
    ``order_cols`` breaks ts ties deterministically. Rows with NULL or
    NaN ``value`` (or NULL ts) are dropped; with ``weight_col``, NULL /
    NaN weights are likewise dropped (a bar exists only where a valid
    (value, weight) pair does — the standard VWAP convention).

    VWAP is a plain double dot product: bit-exact cross-engine only
    when the inputs are integer-quantized (the driver query does);
    ``round_to`` rounds the reported double outputs.
    """
    v = F.col(value_col)
    keep = F.col(ts_col).isNotNull() & v.isNotNull() & ~F.isnan(v)
    if weight_col is not None:
        wt = F.col(weight_col)
        keep = keep & wt.isNotNull() & ~F.isnan(wt)
    t = epoch_us(F.col(ts_col))
    ordkey = [t.alias("_t")] + [F.col(c).alias(f"_o{i}") for i, c in enumerate(order_cols)]
    d = df.where(keep).select(
        *series_cols,
        bucket_start(F.col(ts_col), tier).alias("bucket_start"),
        F.struct(*ordkey, v.alias("_v")).alias("_key"),
        v.alias("_v"),
        *([F.col(weight_col).alias("_w")] if weight_col is not None else []),
    )

    def _r(c):
        return F.round(c, round_to) if round_to is not None else c

    aggs = [
        F.count(F.lit(1)).alias("n"),
        _r(F.min("_key").getField("_v")).alias("open"),
        _r(F.max("_v")).alias("high"),
        _r(F.min("_v")).alias("low"),
        _r(F.max("_key").getField("_v")).alias("close"),
    ]
    if weight_col is not None:
        aggs += [
            _r(F.sum("_w")).alias("w_sum"),
            # the raw dot-product sum rides along unrounded so coarse
            # tiers can compose VWAP exactly (cascade_bars) — dividing
            # first and multiplying back would lose ulps
            F.sum(F.col("_v") * F.col("_w")).alias("vw_sum"),
            _r(F.sum(F.col("_v") * F.col("_w")) / F.sum("_w")).alias("vwap"),
        ]
    return d.groupBy(*series_cols, "bucket_start").agg(*aggs)


def bollinger_bands(
    df: DataFrame,
    window_s: int,
    series_cols: Sequence[str],
    k: float = 2.0,
    ts_col: str = "ts",
    value_col: str = "value",
    round_to: int | None = 6,
) -> DataFrame:
    """Bollinger bands: trailing time-window mean ± ``k`` population
    stddevs appended to every row — the volatility envelope around
    :func:`..rate.sliding_time_stats`' rolling mean (run it on
    rolled-up bucket rows with ``window_s`` spanning N buckets for the
    classic N-period bands).

    Frame = ``RANGE BETWEEN window_s PRECEDING AND CURRENT ROW`` over
    epoch-µs (ts ties are peers — order-deterministic). With an
    integral ``value_col`` the window's count/sum/sum-of-squares are
    exact BIGINTs and the mean/std/bands derive in the engine-wide
    pinned order (``mean = s/n; std = sqrt(sq/n - mean*mean)``;
    ``band = mean ± k*std``) — engine-exact floats. NULL/NaN values
    join the frame as nothing (excluded from n/s/sq).

    Output adds ``w_n``, ``bb_mean``, ``bb_std``, ``bb_upper``,
    ``bb_lower``, and ``bb_pos`` — the %B position of the row's own
    value inside the band, ``(v - lower) / (upper - lower)`` (NULL when
    the band has zero width).
    """
    if window_s <= 0:
        raise ValueError(f"window_s must be > 0, got {window_s}")
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    v = F.col(value_col)
    d = df.withColumn("_tus", epoch_us(F.col(ts_col))).withColumn(
        "_v", F.when(v.isNotNull() & ~F.isnan(v.cast("double")), v)
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*[F.col(c) for c in series_cols])
        .orderBy("_tus")
        .rangeBetween(-int(window_s) * 1_000_000, 0)
    )
    n = F.count("_v").over(w)
    s = F.sum("_v").over(w)
    sq = F.sum(F.col("_v") * F.col("_v")).over(w)
    nd = n.cast("double")
    mean = s.cast("double") / nd
    std = F.sqrt(sq.cast("double") / nd - mean * mean)
    upper = mean + F.lit(float(k)) * std
    lower = mean - F.lit(float(k)) * std
    width = upper - lower
    pos = F.when(width > 0, (F.col("_v").cast("double") - lower) / width)

    def _r(c):
        return F.round(c, round_to) if round_to is not None else c

    return (
        d.withColumn("w_n", n)
        .withColumn("bb_mean", _r(mean))
        .withColumn("bb_std", _r(std))
        .withColumn("bb_upper", _r(upper))
        .withColumn("bb_lower", _r(lower))
        .withColumn("bb_pos", _r(pos))
        .drop("_tus", "_v")
    )
