"""Hierarchical continuous-aggregate cascade: coarse tiers from fine tiers.

The reference recomputes every summary tier from tier-1 — its
generate_summary_timeseries.py is simply re-run per aggregation period
(`/root/reference/src/vegindex/generate_summary_timeseries.py:229-248`)
— and the engine's ``rollup`` / ``multitier`` operators mirror those
semantics for the full reference column family. At the 100-TB design
point, however, the hourly continuous aggregate already exists and is
orders of magnitude smaller than the raw turns; the composable measure
family — count, sum, sum of squares, min, max, and everything derived
from them (mean, population std) — can be re-aggregated
hourly → daily → weekly without touching the raw table again.

Exact percentiles and the midpoint representative row are NOT
composable (they need raw rows or mergeable sketches), so the cascade
deliberately does not emit them; use ``rollup``/``rollup_tiers`` when a
tier needs the full reference column family.

Three small functions, one shuffle each, everything past
``rollup_moments`` operating on already-aggregated rows:

* :func:`rollup_moments` — raw rows → per-(series, bucket) ORDER-FREE
  BIGINT moment sums (the only pass over the big table).
* :func:`cascade_moments` — fine-tier moments → coarse-tier moments
  (sums of sums / min of mins / max of maxes), after validating that
  the fine bucket lattice NESTS in the coarse one.
* :func:`finish_moments` — moments → n / mean / std_pop / min / max in
  ONE pinned double op order, so the floats reproduce bit-for-bit on
  any engine that holds the same integer moments (the DuckDB oracle
  computes raw → weekly directly and matches the engine's
  raw → hourly → weekly cascade exactly).

Lattice-nesting rule (validated by :func:`_check_nesting`, not assumed):
every fine bucket must lie wholly inside one coarse bucket.

* fixed → fixed (minute grains, hourly): coarse step % fine step == 0 —
  both lattices are epoch-anchored so divisibility implies nesting.
* fixed → day-kind: fine step must divide 86400 s (every supported
  fixed tier does; day-tier buckets start at midnight and span whole
  days, including the short doy-anchored final bucket of a year).
* daily → day-kind: a 1-day bucket is one day — always nests, because
  the doy lattice is a partition of whole days.
* Nday (N > 1) → anything: REJECTED — e.g. a 3-day bucket at doy 6
  spans doy 6-8, straddling the weekly doy 1-7 / 8-14 boundary.
* anything → an equal or finer tier: REJECTED.

Measures must be integral (cast to BIGINT) so the moment sums commute —
quantize float columns first (``floor(value * 10^k)``), exactly as the
trend/anomaly operators require. int64 budget: ``sum(y^2)`` stays exact
for |y| up to ~3e6 at a billion rows per coarse bucket; down-scale
larger measures first (documented, not silently truncated).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.buckets import bucket_start, tier_nday, tier_step_seconds
from ..functions.timeutil import epoch_us

MOMENT_COLS = ("n", "v_sum", "v_sumsq", "v_min", "v_max")


def _tier_grain(tier: str) -> tuple[str, int]:
    """('fixed', step_seconds) or ('day', nday); raises on unknown tiers."""
    s = tier_step_seconds(tier)
    if s is not None:
        return "fixed", s
    return "day", tier_nday(tier)


def _check_nesting(from_tier: str, to_tier: str) -> None:
    fk, fv = _tier_grain(from_tier)
    tk, tv = _tier_grain(to_tier)
    if fk == "fixed" and tk == "fixed":
        if tv > fv and tv % fv == 0:
            return
    elif fk == "fixed" and tk == "day":
        if 86400 % fv == 0:
            return
    elif fk == "day" and tk == "day":
        if fv == 1 and tv > 1:
            return
    raise ValueError(
        f"cascade {from_tier!r} -> {to_tier!r}: fine buckets do not nest "
        "in the coarse lattice (fixed->coarser-multiple, fixed->day, or "
        "daily->Nday only)"
    )


def rollup_moments(
    df: DataFrame,
    tier: str,
    series_cols: Sequence[str],
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Raw rows → per-(series, bucket) BIGINT moment sums — the single
    pass over the big table; one hash aggregate on the rollup's own
    (series, bucket) key. ``value_col`` is cast to long (quantize floats
    upstream); NULL/NaN rows are dropped so a NaN can't cast to 0 and
    poison the sums. ``bucket_start`` is a timestamp for every tier so
    cascades across tier kinds need no type juggling.
    """
    ts = F.col(ts_col)
    v = F.col(value_col)
    d = df.where(
        ts.isNotNull() & v.isNotNull() & ~F.isnan(v.cast("double"))
    ).select(
        *series_cols,
        F.to_timestamp(bucket_start(ts, tier)).alias("bucket_start"),
        v.cast("long").alias("_y"),
    )
    y = F.col("_y")
    return d.groupBy(*series_cols, "bucket_start").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(y).alias("v_sum"),
        F.sum(y * y).alias("v_sumsq"),
        F.min(y).alias("v_min"),
        F.max(y).alias("v_max"),
    )


def cascade_moments(
    mom: DataFrame,
    from_tier: str,
    to_tier: str,
    series_cols: Sequence[str],
) -> DataFrame:
    """Fine-tier moments → coarse-tier moments. Input is the (small)
    aggregate, so this shuffle moves rolled-up rows only; the moment
    algebra is exact because every column is an order-free BIGINT sum,
    min, or max over a partition of the coarse bucket.
    """
    _check_nesting(from_tier, to_tier)
    b = F.to_timestamp(bucket_start(F.col("bucket_start"), to_tier))
    return (
        mom.withColumn("bucket_start", b)
        .groupBy(*series_cols, "bucket_start")
        .agg(
            F.sum("n").alias("n"),
            F.sum("v_sum").alias("v_sum"),
            F.sum("v_sumsq").alias("v_sumsq"),
            F.min("v_min").alias("v_min"),
            F.max("v_max").alias("v_max"),
        )
    )


def cascade_bins(
    heat: DataFrame,
    from_tier: str,
    to_tier: str,
    series_cols: Sequence[str],
    bucket_col: str = "bucket_start",
    bin_col: str = "v_bin",
    count_col: str = "n",
) -> DataFrame:
    """Coarse-tier binned counts from a fine-tier
    :func:`operators.downsample.value_heatmap` — the composable
    PERCENTILE path the moment cascade deliberately lacks.

    Binned counts are plain integer sums over a nesting partition, so
    they compose exactly like the moments; feeding the result to
    :func:`operators.downsample.histogram_quantile` yields a coarse-tier
    quantile whose error is bounded by the bin width and IDENTICAL to
    binning the raw data at the coarse tier directly (oracle-pinned by
    the ``cascade_histogram_p90`` driver query). Exact percentiles stay
    the rollup default; this is the fixed-memory cascade alternative.
    """
    _check_nesting(from_tier, to_tier)
    b = bucket_start(F.col(bucket_col), to_tier)
    return (
        heat.withColumn(bucket_col, b)
        .groupBy(*series_cols, bucket_col, bin_col)
        .agg(F.sum(count_col).alias(count_col))
    )


def rollup_hll(
    df: DataFrame,
    tier: str,
    series_cols: Sequence[str],
    key_col: str,
    ts_col: str = "ts",
    lg_config_k: int = 12,
) -> DataFrame:
    """Per-(series, bucket) HyperLogLog sketches of ``key_col`` — the
    composable DISTINCT-COUNT path (Apache DataSketches HLL via Spark's
    ``hll_sketch_agg``). One hash aggregate; the sketch is a fixed-size
    binary column (~2^lg_config_k bytes), so a year of hourly sketches
    is megabytes, not the raw key stream.

    The transparent sibling is ``operators/sketches.hll_registers``:
    plain integer register rows instead of an opaque binary — larger,
    but cross-engine value-checkable (DuckDB oracle, bit-exact) and
    storable anywhere. Use this one for compactness, that one for
    auditability.
    """
    d = df.where(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
    return d.groupBy(
        *series_cols,
        F.to_timestamp(bucket_start(F.col(ts_col), tier)).alias("bucket_start"),
    ).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lg_config_k)).alias("hll"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def cascade_hll(
    hll: DataFrame,
    from_tier: str,
    to_tier: str,
    series_cols: Sequence[str],
) -> DataFrame:
    """Coarse-tier sketches by REGISTER-MAX union of fine-tier sketches
    (``hll_union_agg``). HLL union is exact over the sketch state, so
    the unioned sketch — and therefore its estimate — is IDENTICAL to
    sketching the raw keys at the coarse tier directly (pinned by
    tests); unlike counts, distinct cardinalities never compose by
    summation, which is exactly why the sketch column earns its place
    next to the moment cascade.
    """
    _check_nesting(from_tier, to_tier)
    b = F.to_timestamp(bucket_start(F.col("bucket_start"), to_tier))
    return (
        hll.withColumn("bucket_start", b)
        .groupBy(*series_cols, "bucket_start")
        .agg(
            F.hll_union_agg("hll").alias("hll"),
            F.sum("n_rows").alias("n_rows"),
        )
    )


def finish_hll(hll: DataFrame) -> DataFrame:
    """Sketches → estimated distinct counts (drop the binary column)."""
    return hll.select(
        *[c for c in hll.columns if c != "hll"],
        F.hll_sketch_estimate("hll").alias("n_distinct_est"),
    )


def finish_moments(mom: DataFrame, round_to: int | None = 6) -> DataFrame:
    """Moments → reported stats in ONE pinned double op order:

        mean = Sy / n
        std  = sqrt(greatest(Syy / n - mean * mean, 0))   (population)

    Both engines hold identical integer moments, so evaluating exactly
    this sequence in doubles reproduces bit-for-bit (the ``greatest``
    clamp guards the tiny negative residue double rounding can leave
    when the variance is 0).
    """
    n = F.col("n").cast("double")
    mean = F.col("v_sum").cast("double") / n
    var = F.greatest(
        F.col("v_sumsq").cast("double") / n - mean * mean, F.lit(0.0)
    )

    def _r(c: Column) -> Column:
        return F.round(c, round_to) if round_to is not None else c

    keep = [c for c in mom.columns if c not in ("v_sum", "v_sumsq")]
    return mom.select(
        *[c for c in keep if c not in ("v_min", "v_max")],
        _r(mean).alias("v_mean"),
        _r(F.sqrt(var)).alias("v_std"),
        F.col("v_min"),
        F.col("v_max"),
    )


def cascade_bars(
    bars: DataFrame,
    from_tier: str,
    to_tier: str,
    series_cols: Sequence[str],
) -> DataFrame:
    """Fine-tier OHLC bars → coarse-tier bars without re-touching raw
    data — the candlestick member of the cascade family ("1-minute
    bars forever, roll daily/weekly bars off them", the TimescaleDB
    `rollup(candlestick_agg)` pattern).

    OHLC composes EXACTLY over a nesting partition of the coarse
    bucket: ``open`` = the open of the earliest fine bar (struct min on
    (fine bucket, open) — the operators/bars.py pick, one level up),
    ``close`` = close of the latest, ``high``/``low`` = max/min,
    ``n`` = sum. Fine buckets within one coarse bucket never tie, so
    no tie-break column is needed. Runs on the small aggregate; one
    shuffle of rolled-up rows. Same lattice-nesting validation as the
    moment cascade (3day→weekly correctly rejected). VWAP composes
    when the fine bars carry the UNROUNDED dot-product sum
    (``vw_sum``, emitted by ohlc_bars alongside ``w_sum``): both sums
    add exactly, and the coarse vwap is the same one pinned division —
    so cascaded vwap is IDENTICAL to computing the coarse bar from raw
    rows (dividing fine vwaps back out would lose ulps; that path is
    deliberately not offered).
    """
    _check_nesting(from_tier, to_tier)
    b = F.to_timestamp(bucket_start(F.col("bucket_start"), to_tier))
    fine_b = F.col("bucket_start").cast("timestamp")
    has_w = "w_sum" in bars.columns
    if has_w and "vw_sum" not in bars.columns:
        raise ValueError(
            "weighted bars must carry the unrounded dot-product sum "
            "'vw_sum' (ohlc_bars emits it next to w_sum) — vwap alone "
            "cannot be composed exactly"
        )
    d = bars.select(
        *series_cols,
        b.alias("_cb"),
        F.struct(epoch_us(fine_b).alias("_t"), F.col("open").alias("_v")).alias("_ko"),
        F.struct(epoch_us(fine_b).alias("_t"), F.col("close").alias("_v")).alias("_kc"),
        "n",
        "high",
        "low",
        *(["w_sum", "vw_sum"] if has_w else []),
    )
    aggs = [
        F.sum("n").alias("n"),
        F.min("_ko").getField("_v").alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max("_kc").getField("_v").alias("close"),
    ]
    if has_w:
        aggs += [
            F.sum("w_sum").alias("w_sum"),
            F.sum("vw_sum").alias("vw_sum"),
            (F.sum("vw_sum") / F.sum("w_sum")).alias("vwap"),
        ]
    return d.groupBy(*series_cols, F.col("_cb").alias("bucket_start")).agg(*aggs)
