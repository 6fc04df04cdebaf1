"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry runs an engine operator from SURVEY.md §2 over
the driver's parquet tables; ``oracle_sql()`` gives the DuckDB-runnable
equivalent. Float aggregates are rounded to fixed decimals on BOTH sides
so the driver's value hash is stable across engines.

Cross-engine float discipline (verified at sf0.01 AND 10x at sf0.1 via
``scripts/check_entry.py``): scalar expressions are spelled as the
IDENTICAL IEEE op sequence on both sides (see :func:`_fmod_naive` — the
engines' own mod builtins differ by an ulp, enough to flip a filter
boundary row). Aggregates (avg/percentile) can still differ in the last
ulp from summation order; at 6-decimal rounding that flips a printed
digit for ~1 in 10^7 values, which the sf0.01 gate's volume stays
safely below (observed only at sf0.1: 3 single-digit diffs across 43
queries, all n-hundred-row aggregate cells).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from python_vegindex_spark.functions.timeutil import epoch_us

from python_vegindex_spark.functions.buckets import bucket_start
from python_vegindex_spark.functions.text import token_count
from python_vegindex_spark.operators.asof import asof_join, asof_join_bucketed
from python_vegindex_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard,
    simhash64,
)
from python_vegindex_spark.operators.generic_rollup import (
    representative_rows,
    rollup_series,
)
from python_vegindex_spark.operators.interval_join import interval_join
from python_vegindex_spark.operators.similarity import cosine_topk
from python_vegindex_spark.operators.upsert import merge_upsert


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _mean_q(c, scale: int):
    """UNROUNDED exact mean of floor(c*scale)/scale as an aggregate.

    The cross-engine-tie-proof mean (SURVEY §8): DECIMAL integer sum,
    ONE pinned double division by (scale · n). round(avg(double), k)
    is a coin flip whenever the true mean lands exactly midway at the
    k-th decimal (hit at sf0.1, 2026-08-20); this never rounds.
    Mirror in DuckDB: CAST(sum(CAST(floor(c*scale) AS BIGINT)) AS
    DOUBLE) / (scale.0 * CAST(count(c) AS DOUBLE)).
    """
    q = F.floor(c * F.lit(int(scale))).cast("decimal(38,0)")
    n = F.count(F.when(c.isNotNull(), 1)).cast("double")
    return F.sum(q).cast("double") / (F.lit(float(scale)) * n)


# --------------------------------------------------------------------------
# queries (Spark side)
# --------------------------------------------------------------------------

def q_hourly_rollup_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A4+A2 over events: hourly continuous aggregate per event_type,
    gap-filled, exact HF-7 percentiles."""
    ev = _t(spark, sf_dir, "events")
    return rollup_series(
        ev, tier="hourly", series_cols=["event_type"], value_col="value",
        value_scale=100,
    ).orderBy("event_type", "bucket_start")


def q_daily_user_rollup_tiered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 count tiering (nmin=3) per user_id, daily buckets, gap-filled."""
    ev = _t(spark, sf_dir, "events")
    out = rollup_series(
        ev, tier="daily", series_cols=["user_id"], value_col="value", nmin=3,
        value_scale=100,
    )
    return out.select(
        "user_id", F.col("bucket_start").cast("timestamp").alias("bucket_start"),
        "n", "v_mean", "v_std", "v_min", "v_max", "v_50", "v_75", "v_90",
    ).orderBy("user_id", "bucket_start")


def q_weekly_anchored_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 doy-anchored weekly buckets (yearly restart) per event_type."""
    ev = _t(spark, sf_dir, "events")
    out = rollup_series(
        ev, tier="weekly", series_cols=["event_type"], value_col="value",
        gap_fill=False, value_scale=100,
    )
    return out.withColumn(
        "bucket_start", F.col("bucket_start").cast("timestamp")
    ).orderBy("event_type", "bucket_start")


def q_multitier_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three retention tiers (hourly/daily/weekly) from ONE scan and
    ONE wide shuffle (operators/multitier.rollup_series_tiers): the
    explicit grouping-sets lowering — per-row explode of per-tier
    (tier, bucket) structs, one shared aggregate, join-free gap-fill,
    nmin tiering. Per-tier slices are row-identical to the single-tier
    operators (tests/test_multitier.py)."""
    from python_vegindex_spark.operators.multitier import rollup_series_tiers

    ev = _t(spark, sf_dir, "events")
    out = rollup_series_tiers(
        ev,
        ("hourly", "daily", "weekly"),
        series_cols=["event_type"],
        value_col="value",
        nmin=2,
        value_scale=100,
    )
    return out.orderBy("event_type", "tier", "bucket_start")


def q_cascade_weekly_from_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical cascade (operators/cascade): weekly stats composed
    from the HOURLY aggregate's BIGINT moment sums — the raw table is
    scanned once at hourly grain, then the weekly tier re-aggregates
    the (tiny) hourly moments. The oracle computes raw -> weekly
    directly, so a green row proves raw->hourly->weekly ≡ raw->weekly:
    the cascade algebra itself, not just the bucket math."""
    from python_vegindex_spark.operators.cascade import (
        cascade_moments,
        finish_moments,
        rollup_moments,
    )

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100).cast("long").alias("y"),
    )
    hourly = rollup_moments(ev, "hourly", ["event_type"], value_col="y")
    weekly = cascade_moments(hourly, "hourly", "weekly", ["event_type"])
    return finish_moments(weekly, round_to=None).orderBy(
        "event_type", "bucket_start"
    )


def q_cascade_histogram_p90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composable-percentile cascade: hourly value_heatmap bins summed
    to weekly (operators/cascade.cascade_bins — integer counts compose
    exactly under the nesting lattice), finished by histogram_quantile.
    The oracle bins raw -> weekly directly, so a green row proves the
    binned-count cascade is lossless."""
    from python_vegindex_spark.operators.cascade import cascade_bins
    from python_vegindex_spark.operators.downsample import (
        histogram_quantile,
        value_heatmap,
    )

    hm_h = value_heatmap(
        _t(spark, sf_dir, "events"),
        tier="hourly",
        bin_width=50.0,
        series_cols=["event_type"],
    )
    hm_w = cascade_bins(hm_h, "hourly", "weekly", ["event_type"])
    out = histogram_quantile(hm_w, 0.9, 50.0, ["event_type"])
    return out.withColumn(
        "bucket_start", F.col("bucket_start").cast("timestamp")
    ).orderBy("event_type", "bucket_start")


def q_cusum_daily_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM changepoints (operators/rate.cusum_changepoints)
    over daily BIGINT bucket sums: the running max-reset recursion is
    not prefix-decomposable, so the engine walks it per series in
    applyInPandas over the (small) bucket rows, and the oracle is a
    DuckDB RECURSIVE CTE walking the identical pinned float sequence —
    alarm flags and episode numbers are engine-exact, not tolerant."""
    from python_vegindex_spark.operators.rate import cusum_changepoints

    ev = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & ~F.isnan("value") & F.col("ts").isNotNull()
    )
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("bucket_start")
    ).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("v")
    )
    out = cusum_changepoints(
        daily, ["event_type"], order_col="bucket_start", value_col="v",
        k=0.25, h=3.0,
    )
    return out.select(
        "event_type",
        "bucket_start",
        "x",
        F.round("s_pos", 6).alias("s_pos"),
        F.round("s_neg", 6).alias("s_neg"),
        "alarm",
        "episode",
    ).orderBy("event_type", "bucket_start")


def q_holt_daily_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (operators/rate.holt_smooth,
    Influx holt_winters' non-seasonal core) over daily BIGINT sums —
    level/trend recursion walked in applyInPandas, mirrored by a DuckDB
    RECURSIVE CTE in the identical pinned float order (the 1-alpha /
    1-beta literals are Python-computed and embedded verbatim)."""
    from python_vegindex_spark.operators.rate import holt_smooth

    ev = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & ~F.isnan("value") & F.col("ts").isNotNull()
    )
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("bucket_start")
    ).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("v")
    )
    out = holt_smooth(
        daily, ["event_type"], order_col="bucket_start", value_col="v",
        alpha=0.3, beta=0.1,
    )
    return out.select(
        "event_type",
        "bucket_start",
        "x",
        F.round("level", 6).alias("level"),
        F.round("trend", 6).alias("trend"),
        F.round("fitted", 6).alias("fitted"),
    ).orderBy("event_type", "bucket_start")


def q_validate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract validation (operators/validate, Deequ/dbt-tests
    analog): every row-level rule in ONE aggregate pass, uniqueness via
    count-distinct, referential integrity via broadcast anti-join,
    freshness against an explicit as-of (never wall-clock)."""
    from python_vegindex_spark.operators.validate import validate_table

    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer")
    return validate_table(
        ev,
        not_null=["event_id", "ts", "event_type"],
        unique=["event_id"],
        in_range={"value": (0.0, 500.0)},
        in_set={"event_type": ["click", "view", "purchase"]},
        matches={"event_type": "^[a-z_]+$"},
        refs=[("user_id", cust, "c_custkey")],
        freshness=("ts", 7 * 86400, "2024-07-01 00:00:00"),
    )


def q_midpoint_rep_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 argmin-to-anchor representative row per (event_type, day)."""
    ev = _t(spark, sf_dir, "events")
    out = representative_rows(
        ev, tier="daily", series_cols=["event_type"], ts_col="ts",
        tie_break_cols=["event_id"], payload_cols=["event_id", "value"],
    )
    return out.select(
        "event_type",
        F.col("bucket_start").cast("timestamp").alias("bucket_start"),
        F.col("event_id").alias("mid_event_id"),
        F.round("value", 6).alias("mid_value"),
    ).orderBy("event_type", "bucket_start")


def q_latency_lag_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 per-series latency deltas (lag window) + rollup per user."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # integer microsecond gaps; mean/p90 via ONE pinned division each,
    # UNROUNDED (round(avg(us/1e6), 6) ties exactly midway at the 6th
    # decimal whenever sum_us/n lands on the half-us grid — hit at
    # sf0.1; HF-7 interpolation over identical integers is bit-equal
    # across engines, proven by the hf_quantile_types oracle)
    gaps = ev.withColumn(
        "gap_us", epoch_us(F.col("ts")) - epoch_us(F.lag("ts").over(w))
    ).filter(F.col("gap_us").isNotNull())
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            (
                F.sum("gap_us").cast("double")
                / (F.lit(1e6) * F.count("*").cast("double"))
            ).alias("gap_mean"),
            (F.percentile("gap_us", F.lit(0.9)) / F.lit(1e6)).alias("gap_p90"),
        )
        .orderBy("user_id")
    )


def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 stateful sessionization, batch twin (operators/sessionize):
    gap>1h session windows per user over the events stream table — the
    same strict-gap rule as streaming/stateful.sessionize_stream, here
    oracle-checkable end to end (one shuffle, plan-asserted)."""
    from python_vegindex_spark.operators.sessionize import sessionize_batch

    ev = _t(spark, sf_dir, "events")
    out = sessionize_batch(
        ev, gap_s=3600.0, key_col="user_id", ts_col="ts",
        weight="value", tie_break_cols=("event_id",),
    )
    return out.select(
        "user_id",
        F.col("session_idx").cast("long").alias("session_idx"),
        F.col("session_start").cast("timestamp").alias("session_start"),
        F.col("session_end").cast("timestamp").alias("session_end"),
        F.col("n_turns").cast("long").alias("n_events"),
        F.round("weight_sum", 6).alias("value_sum"),
    ).orderBy("user_id", "session_idx")


def q_asof_backward_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 as-of join: each click paired with the latest view <= 30 min back."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    out = asof_join(
        clicks, views, on=["user_id"], direction="backward",
        tolerance_s=1800, payload_cols=["value"],
    )
    return out.select(
        "event_id", "user_id", F.col("r_ts").alias("view_ts"),
        F.round("r_value", 6).alias("view_value"),
    ).orderBy("event_id")


def q_asof_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 scale path: same click<-view backward as-of as
    q_asof_backward_join, but via the bucketed range-join variant
    (operators/asof.py asof_join_bucketed) — shuffles on (user_id,
    ts-bucket) so a hot user is split across time buckets instead of
    landing in one window task. Oracle-checked against the identical
    DuckDB ASOF JOIN."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    out = asof_join_bucketed(
        clicks, views, on=["user_id"], left_keys=["event_id"],
        direction="backward", tolerance_s=1800, payload_cols=["value"],
    )
    return out.select(
        "event_id", "user_id", F.col("r_ts").alias("view_ts"),
        F.round("r_value", 6).alias("view_value"),
    ).orderBy("event_id")


def q_asof_nearest_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 nearest direction (tie -> backward, tolerance both sides),
    oracle-checked via dual DuckDB ASOF joins (backward + forward) with
    the same pick rule."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    out = asof_join(
        clicks, views, on=["user_id"], direction="nearest",
        tolerance_s=1800, payload_cols=["value"],
    )
    return out.select(
        "event_id", "user_id", F.col("r_ts").alias("view_ts"),
        F.round("r_value", 6).alias("view_value"),
    ).orderBy("event_id")


def q_asof_forward_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 forward direction: each click paired with the earliest view
    <= 30 min ahead; DuckDB forward ASOF oracle."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    out = asof_join(
        clicks, views, on=["user_id"], direction="forward",
        tolerance_s=1800, payload_cols=["value"],
    )
    return out.select(
        "event_id", "user_id", F.col("r_ts").alias("view_ts"),
        F.round("r_value", 6).alias("view_value"),
    ).orderBy("event_id")


def _fmod_naive(x, m: float):
    """``x - floor(x/m) * m`` — the float mod spelled as an EXPLICIT op
    sequence that the DuckDB mirrors inline verbatim, so both engines run
    the identical IEEE operations and the result is bit-identical.

    Why not ``%``/``pmod``/``fmod``: Spark's ``%`` is exact IEEE fmod
    while DuckDB's ``fmod`` is this naive formula — they differ by an ulp
    for large x/m (observed at sf0.1: ``fmod(1900.6, 2.4)`` =
    2.1999999999999793 in Spark vs 2.2000000000000455 in DuckDB), which
    flips a row sitting on a downstream ``BETWEEN`` filter boundary and
    shifts a whole bucket's stats. Valid for x >= 0 (floor == trunc)."""
    return x - F.floor(x / m).cast("double") * m


def _synth_roistats(ev, ts=None, with_awb: bool = True, ndvi: bool = False):
    """Deterministic events -> tier-1 roistats projection shared by the
    four flagship-summary queries (ONE definition so the Spark-side
    copies cannot drift from each other; each query's DuckDB mirror
    inlines the identical arithmetic — moduli via :func:`_fmod_naive`'s
    explicit spelling on both sides)."""
    r = 50.0 + _fmod_naive(F.col("value"), 100.0)
    g = 60.0 + _fmod_naive(F.col("value") * 7.0, 100.0)
    b = 40.0 + _fmod_naive(F.col("value") * 13.0, 100.0)
    cols = [(ts if ts is not None else F.col("ts")).alias("ts")]
    if ndvi:
        cols += [
            F.concat(F.lit("e"), F.col("event_id").cast("string")).alias("filename_rgb"),
            F.concat(F.lit("i"), F.col("event_id").cast("string")).alias("filename_ir"),
        ]
    else:
        cols += [F.concat(F.lit("e"), F.col("event_id").cast("string")).alias("filename")]
    cols += [(F.col("event_id") % 80 - 5).cast("double").alias("solar_elev")]
    if with_awb:
        cols += [F.when(F.col("event_id") % 13 == 0, 1).otherwise(0).alias("awbflag")]
    cols += [
        r.alias("r_mean"), g.alias("g_mean"), b.alias("b_mean"),
        (g / (r + g + b)).alias("gcc"),
    ]
    if ndvi:
        cols += [(_fmod_naive(F.col("value") * 17.0, 2.4) - 1.2).alias("NDVI_c")]
    return ev.select(*cols)


def q_vegindex_summary_3day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FLAGSHIP reference job (generate_summary_timeseries ->
    operators/vegindex_summary.generate_gcc_summary) oracle-checked:
    events deterministically mapped into the roistats shape (sparse
    subset so the nmin tiering fires), then the full QC + awb skip +
    3-day anchored buckets + gap-fill + tiering + HF-7 stats pipeline;
    DuckDB implements the identical arithmetic."""
    from python_vegindex_spark.operators.vegindex_summary import generate_gcc_summary

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 139 == 0)
    roistats = _synth_roistats(ev)
    out = generate_gcc_summary(roistats, nday=3, nmin=6)
    return out.select(
        F.col("date").cast("timestamp").alias("date"),
        "year", "doy", "image_count", "midday_filename",
        F.round("midday_gcc", 6).alias("midday_gcc"),
        F.round("r_mean", 6).alias("r_mean"),
        F.round("gcc_mean", 6).alias("gcc_mean"),
        F.round("gcc_std", 6).alias("gcc_std"),
        F.round("gcc_50", 6).alias("gcc_50"),
        F.round("gcc_90", 6).alias("gcc_90"),
        F.round("rcc_mean", 6).alias("rcc_mean"),
        F.round("max_solar_elev", 6).alias("max_solar_elev"),
    ).orderBy("date")


def q_vegindex_summary_yearboundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship summary over a MULTI-YEAR series, oracle-checking the
    reference's sequential-cursor year-boundary spill-over
    (generate_summary_timeseries.py:295-305 + vegindex.py:50-63 via
    functions/buckets.bucket_start_cursor): events timestamps are fanned
    across 730 days spanning two Jan-1 boundaries (one after a leap
    year), nday=7, so Jan 1-5 2025 belongs to the Dec-30-2024 bucket and
    Jan 1-6 2026 to the Dec-31-2025 bucket, and the gap-fill spine
    restarts its doy lattice at each Jan 1. The DuckDB oracle implements
    the identical cursor rule (overflow = final-bucket offset + nday -
    days-in-previous-year) independently."""
    from python_vegindex_spark.operators.vegindex_summary import generate_gcc_summary

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 11 == 0)
    ts2 = F.col("ts") + F.make_dt_interval(days=(F.col("event_id") % 730).cast("int"))
    roistats = _synth_roistats(ev, ts=ts2)
    out = generate_gcc_summary(roistats, nday=7, nmin=4)
    return out.select(
        F.col("date").cast("timestamp").alias("date"),
        "year", "doy", "image_count", "midday_filename",
        F.round("midday_gcc", 6).alias("midday_gcc"),
        F.round("gcc_mean", 6).alias("gcc_mean"),
        F.round("gcc_std", 6).alias("gcc_std"),
        F.round("gcc_50", 6).alias("gcc_50"),
        F.round("gcc_75", 6).alias("gcc_75"),
        F.round("gcc_90", 6).alias("gcc_90"),
        F.round("rcc_mean", 6).alias("rcc_mean"),
        F.round("max_solar_elev", 6).alias("max_solar_elev"),
    ).orderBy("date")


def q_ndvi_summary_3day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SECOND flagship (generate_ndvi_summary_timeseries ->
    operators/vegindex_summary.generate_ndvi_summary_table) oracle-
    checked: events mapped into the NDVI tier-1 shape with NDVI_c
    values straddling [-1, 1], then the released reference semantics
    (qc_mode='reference': the NDVI range filter ONLY — the script's
    filter_rows call discards its select_rows result) + anchored
    buckets + gap-fill + nmin tiering + HF-7 stats. DuckDB mirrors the
    arithmetic independently."""
    from python_vegindex_spark.operators.vegindex_summary import (
        generate_ndvi_summary_table,
    )

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 53 == 0)
    ndvits = _synth_roistats(ev, with_awb=False, ndvi=True)
    out = generate_ndvi_summary_table(ndvits, nday=3, nmin=5)
    return out.select(
        F.col("date").cast("timestamp").alias("date"),
        "year", "doy", "image_count",
        "midday_rgb_filename", "midday_ir_filename",
        F.round("midday_ndvi", 6).alias("midday_ndvi"),
        F.round("gcc_90", 6).alias("gcc_90"),
        F.round("ndvi_mean", 6).alias("ndvi_mean"),
        F.round("ndvi_std", 6).alias("ndvi_std"),
        F.round("ndvi_50", 6).alias("ndvi_50"),
        F.round("ndvi_90", 6).alias("ndvi_90"),
        F.round("max_solar_elev", 6).alias("max_solar_elev"),
    ).orderBy("date")


def q_gcc_update_equals_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INCREMENTAL flow under the driver's oracle gate: build the
    v1 summary from the pre-Jan-20 prefix, then run update_gcc_summary
    (operators/vegindex_summary.py — re-open the provisional tail
    bucket, recompute forward, keep frozen rows) with the full tier-1
    set. The DuckDB oracle computes the FULL recompute directly, so a
    hash match certifies the engine's update == full-recompute
    invariant end-to-end on driver data."""
    from python_vegindex_spark.operators.vegindex_summary import (
        generate_gcc_summary,
        update_gcc_summary,
    )

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 97 == 0)
    roistats = _synth_roistats(ev)
    v1 = generate_gcc_summary(
        roistats.filter(F.col("ts") < F.lit("2024-01-20").cast("timestamp")),
        nday=3, nmin=6,
    )
    out = update_gcc_summary(v1, roistats, nday=3, nmin=6)
    return out.select(
        F.col("date").cast("timestamp").alias("date"),
        "year", "doy", "image_count", "midday_filename",
        F.round("midday_gcc", 6).alias("midday_gcc"),
        F.round("gcc_mean", 6).alias("gcc_mean"),
        F.round("gcc_std", 6).alias("gcc_std"),
        F.round("gcc_50", 6).alias("gcc_50"),
        F.round("gcc_90", 6).alias("gcc_90"),
        F.round("rcc_mean", 6).alias("rcc_mean"),
        F.round("max_solar_elev", 6).alias("max_solar_elev"),
    ).orderBy("date")


# (qtype, q) pairs exercising every non-default HF estimator family
_HF_COMBOS = [(1, 0.35), (3, 0.5), (4, 0.9), (5, 0.75), (6, 0.9), (8, 0.5), (9, 0.25)]


def q_hf_quantile_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 completeness: HF quantile types beyond the default 7
    (functions/quantile.hf_quantile_expr), oracle-checked against DuckDB
    implementing the same Hyndman-Fan plotting-position arithmetic over
    a sorted list aggregate."""
    from python_vegindex_spark.functions.quantile import hf_quantile_expr

    ev = _t(spark, sf_dir, "events")
    aggs = [F.count("value").cast("long").alias("n")]
    for t, q in _HF_COMBOS:
        aggs.append(
            F.round(hf_quantile_expr("value", q, qtype=t), 6).alias(
                f"t{t}_q{int(q * 100)}"
            )
        )
    return ev.groupBy("event_type").agg(*aggs).orderBy("event_type")


def _hf_oracle_sql() -> str:
    """DuckDB SQL computing the same HF types over list(value ORDER BY value).

    Mirrors hf_quantile_expr exactly: h = a + (n+b)q - 1, j = trunc(h)
    (toward zero), g = h - j; j<0 -> y[1]; j>=n -> y[n]; g=0 -> y[j+1];
    else y[j+1] + (y[least(j+2,n)] - y[j+1]) * (c + d*g).
    """
    abcd = {
        1: (0.0, 0.0, 1.0, 0.0), 3: (0.5, 0.0, 0.0, 0.0),
        4: (0.0, 0.0, 0.0, 1.0), 5: (0.5, 0.0, 0.0, 1.0),
        6: (0.0, 1.0, 0.0, 1.0), 8: (1.0 / 3, 1.0 / 3, 0.0, 1.0),
        9: (3.0 / 8, 0.25, 0.0, 1.0),
    }
    cols = []
    for t, q in _HF_COMBOS:
        a, b, c, d = abcd[t]
        h = f"({a!r} + (n + {b!r}) * {q!r} - 1.0)"
        j = f"trunc({h})"
        g = f"({h} - {j})"
        yj = f"y[CAST({j} AS BIGINT) + 1]"
        yj1 = f"y[least(CAST({j} AS BIGINT) + 2, n)]"
        expr = (
            f"CASE WHEN {j} < 0 THEN y[1] "
            f"WHEN {j} >= n THEN y[n] "
            f"WHEN {g} = 0 THEN {yj} "
            f"ELSE {yj} + ({yj1} - {yj}) * ({c!r} + {d!r} * {g}) END"
        )
        cols.append(f"round({expr}, 6) AS t{t}_q{int(q * 100)}")
    cols_sql = ",\n       ".join(cols)
    return f"""
WITH s AS (
  SELECT event_type, list(value ORDER BY value) AS y,
         CAST(count(value) AS BIGINT) AS n
  FROM events WHERE value IS NOT NULL GROUP BY event_type)
SELECT event_type, n, {cols_sql}
FROM s ORDER BY event_type
"""


def q_summary_threshold_nullout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 read-side threshold projection (gcctimeseries.py:186-393)
    oracle-checked over testdata: a daily per-user summary whose
    image_count counts only value>0.5 rows, then the gcc-reader's
    null-out — stats NULL at count<nmin (nmin=5), midday-family NULL at
    count==0."""
    from python_vegindex_spark.sources.vegindex_tables import threshold_nullout

    ev = _t(spark, sf_dir, "events")
    summ = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.when(F.col("value") > 0.5, 1)).cast("int").alias("image_count"),
        _mean_q(F.col("value"), 100).alias("v_mean"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("v_90"),
        F.round(F.max("value"), 6).alias("v_max"),
    )
    out = threshold_nullout(
        summ, nmin=5, lt_nmin_cols=["v_mean", "v_90"], zero_cols=["v_max"]
    )
    return out.select(
        "user_id",
        F.col("day").cast("timestamp").alias("day"),
        "image_count", "v_mean", "v_90", "v_max",
    ).orderBy("user_id", "day")


def q_interval_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 interval-predicate join: lineitems shipped within 30 days of
    their order's date, per priority."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") < F.date_add(F.col("o_orderdate"), 30))
    )
    return (
        j.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").cast("long").alias("n_items"),
            _mean_q(F.col("l_extendedprice"), 100).alias("avg_price"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("priority")
    )


def q_merge_upsert_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 keyed upsert: update every 7th event's value (+100), then checksum."""
    ev = _t(spark, sf_dir, "events")
    updates = ev.filter(F.col("event_id") % 7 == 0).withColumn(
        "value", F.col("value") + 100.0
    )
    merged = merge_upsert(ev, updates, keys=["event_id"])
    return (
        merged.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            _mean_q(F.col("value"), 100).alias("value_mean"),
        )
        .orderBy("event_type")
    )


def _prefix_fp(n: int = 16):
    """md5 of the lowercased, whitespace-collapsed first ``n`` chars — the
    shared candidate-blocking key used by q_dedup_exact_docs,
    q_ngram_jaccard_verify and q_dedup_cluster_sizes (one definition so
    the three derivations cannot drift apart; the DuckDB mirrors inline
    the identical expression)."""
    return F.md5(
        F.lower(F.substring(F.regexp_replace(F.trim("text"), r"\s+", " "), 1, n))
    )


def q_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a 16-char normalized prefix (forces collisions on
    this corpus; md5 keys so DuckDB can reproduce the fingerprint)."""
    docs = _t(spark, sf_dir, "documents")
    keyed = docs.withColumn("fp", _prefix_fp())
    return (
        keyed.groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").cast("long").alias("dup_count"))
        .orderBy("fp")
    )


def q_text_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + length stats per doc."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        token_count(F.col("text")).cast("long").alias("tokens"),
        F.length("text").cast("long").alias("chars"),
        (
            (token_count(F.col("text")) * F.lit(100)).cast("double")
            / F.greatest(F.length("text"), F.lit(1)).cast("double")
        ).alias("tokens_per_100_chars"),
    ).orderBy("doc_id")


def q_lang_quality_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-level quality rollup (length-band share, token stats)."""
    docs = _t(spark, sf_dir, "documents")
    toks = token_count(F.col("text"))
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            _mean_q(toks.cast("double"), 1).alias("tokens_mean"),
            F.round(F.percentile(toks.cast("double"), F.lit(0.9)), 6).alias("tokens_p90"),
            _mean_q((toks >= 50).cast("double"), 1).alias("share_long"),
        )
        .orderBy("lang")
    )


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5 for query vectors {0,1,2}."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2))
    return cosine_topk(emb, queries, k=5).orderBy("query_id", "rank")


def q_tpch_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic flag/status pricing rollup over lineitem (scan+agg shape)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            _mean_q(F.col("l_extendedprice"), 100).alias("avg_price"),
            _mean_q(F.col("l_discount"), 100).alias("avg_disc"),
            F.count("*").cast("long").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 top-k: 3 highest-value events per event_type."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    return (
        ev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("event_type", "rank", "event_id", F.round("value", 6).alias("value"))
        .orderBy("event_type", "rank")
    )


def q_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+U2: union of two filtered slices, dedup by key, aggregate."""
    ev = _t(spark, sf_dir, "events")
    hot = ev.filter(F.col("value") > 50)
    errs = ev.filter(F.col("event_type") == "error")
    u = hot.unionByName(errs).dropDuplicates(["event_id"])
    return (
        u.groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n"), _mean_q(F.col("value"), 100).alias("value_mean"))
        .orderBy("event_type")
    )


def q_paired_index_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 paired-stream Petach algebra over an as-of join (backward, so
    DuckDB's ASOF JOIN can oracle it): purchases paired to latest view."""
    ev = _t(spark, sf_dir, "events")
    primary = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts",
        F.col("value").alias("r"), (F.col("value") * 2).alias("g"),
        (F.col("value") / 2).alias("b"), F.lit(30.0).alias("exposure"),
    )
    secondary = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("ir"), F.lit(15.0).alias("exposure"),
    )
    paired = asof_join(
        primary, secondary, on=["user_id"], direction="backward",
        tolerance_s=3600, payload_cols=["ir", "exposure"], prefix="ir_",
    ).filter(F.col("ir_ts").isNotNull() & (F.col("ir_ir") != 0))
    y = 0.30 * F.col("r") + 0.59 * F.col("g") + 0.11 * F.col("b")
    zp = F.col("ir_ir") / F.sqrt(F.col("ir_exposure"))
    rp = F.col("r") / F.sqrt(F.col("exposure"))
    yp = y / F.sqrt(F.col("exposure"))
    xp = zp - yp
    ndvi = (xp - rp) / (xp + rp)
    return (
        # filter on the RAW ratio (filter_rows semantics, and how the
        # oracle's WHERE runs), then round for display — filtering the
        # rounded value would keep raw values just outside [-1, 1]
        paired.select("event_id", ndvi.alias("_raw"))
        .filter(F.col("_raw").between(-1.0, 1.0))
        .select("event_id", F.col("_raw").alias("ndvi_c"))
        .orderBy("event_id")
    )


def q_validity_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 validity-window join: events against a broadcast interval dim."""
    ev = _t(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [
            ("w1", "2024-01-01 00:00:00", "2024-01-08 00:00:00"),
            ("w2", "2024-01-08 00:00:00", "2024-01-20 00:00:00"),
            ("w3", "2024-01-20 00:00:00", "2024-02-01 00:00:00"),
        ],
        "segment string, start_ts string, end_ts string",
    ).select(
        "segment",
        F.to_timestamp("start_ts").alias("start_ts"),
        F.to_timestamp("end_ts").alias("end_ts"),
    )
    j = interval_join(ev, dim)
    return (
        j.groupBy("segment", "event_type")
        .agg(F.count("*").cast("long").alias("n"), _mean_q(F.col("value"), 100).alias("value_mean"))
        .orderBy("segment", "event_type")
    )


def q_tpch_multi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-join: lineitem x orders x customer x nation, revenue per nation."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    return (
        j.groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("long").alias("n_items"),
            # price*(1-disc) lives exactly on the 1e-4 grid: cents_p *
            # (100 - cents_d) is an EXACT integer — sum those, ONE divide
            (
                F.sum(
                    (
                        F.floor(F.col("l_extendedprice") * 100)
                        * (F.lit(100) - F.floor(F.col("l_discount") * 100))
                    ).cast("decimal(38,0)")
                ).cast("double")
                / (F.lit(10000.0) * F.count("*").cast("double"))
            ).alias("avg_revenue"),
        )
        .orderBy("nation")
    )


def q_lang_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: stopword-vote language ID + composite quality score
    (functions/text.py lang_id, quality_score) per document."""
    from python_vegindex_spark.functions.text import lang_id, quality_score

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        lang_id(F.col("text")).alias("lang_guess"),
        quality_score(F.col("text")).alias("quality"),
    ).orderBy("doc_id")


def q_fingerprint_dup_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: 64-bit normalized-text fingerprint, then a
    group-size histogram (hash-function-independent, so DuckDB's md5
    oracle is value-comparable)."""
    from python_vegindex_spark.functions.text import fingerprint64

    docs = _t(spark, sf_dir, "documents")
    groups = docs.groupBy(fingerprint64(F.col("text")).alias("fp")).agg(
        F.count("*").alias("dup_count")
    )
    return (
        groups.groupBy("dup_count")
        .agg(F.count("*").cast("long").alias("n_groups"))
        .select(F.col("dup_count").cast("long").alias("dup_count"), "n_groups")
        .orderBy("dup_count")
    )


def _hf7_from_sorted(arr, q: float):
    """Exact HF type-7 quantile over a sorted array column — delegates to
    the ENGINE implementation (functions/quantile.hf_quantile_from_sorted)
    so the driver exercises the same arithmetic it oracles, instead of a
    re-derivation that could silently drift."""
    from python_vegindex_spark.functions.quantile import hf_quantile_from_sorted

    return hf_quantile_from_sorted(arr.cast("array<double>"), q, 7)


def q_word_len_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 per-record percentile stats (roitimeseries.py:202-204 computes 7
    per-image percentiles over the pixel array): per-doc HF-7 p50/p90 of
    word lengths, pure array expressions."""
    docs = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    lens = F.array_sort(
        F.transform(F.split(F.trim("text"), r"\s+"), lambda w: F.length(w))
    )
    d = docs.select("doc_id", lens.alias("_l"))
    return d.select(
        "doc_id",
        F.size("_l").cast("long").alias("n_words"),
        F.round(_hf7_from_sorted(F.col("_l"), 0.5), 6).alias("wlen_p50"),
        F.round(_hf7_from_sorted(F.col("_l"), 0.9), 6).alias("wlen_p90"),
    ).orderBy("doc_id")


def q_deg_dms_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 deg<->DMS conversions (utils.py:258-282) as column arithmetic
    over event values treated as degrees."""
    ev = _t(spark, sf_dir, "events")
    a = F.abs(F.col("value"))
    d = F.floor(a)
    m = F.floor((a - d) * 60)
    s = (a - d - m / 60) * 3600
    back = F.signum(F.col("value")) * (d + m / 60 + s / 3600)
    return ev.select(
        "event_id",
        d.cast("long").alias("dms_deg"),
        m.cast("long").alias("dms_min"),
        s.alias("dms_sec"),
        back.alias("deg_back"),
    ).orderBy("event_id")


def q_csv_sentinel_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5+C6 CSV boundary semantics: -9999 sentinel -> NULL (coercion,
    roitimeseries.py:21-50) and fixed 5-decimal / 'NA' formatting
    (format_csvrow, roitimeseries.py:599-727)."""
    ev = _t(spark, sf_dir, "events")
    dirty = F.when(F.col("event_id") % 11 == 0, F.lit(-9999.0)).otherwise(
        F.col("value")
    )
    clean = F.when(dirty == -9999.0, F.lit(None)).otherwise(dirty)
    return ev.select(
        "event_id",
        F.when(clean.isNull(), F.lit("NA"))
        .otherwise(F.format_string("%.5f", clean))
        .alias("csv_value"),
    ).orderBy("event_id")


# ---- non-SQL-expressible (rows-only checks) ------------------------------

def q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs verified by exact n-gram Jaccard,
    oracle-checked end-to-end: the default portable hash (two 32-bit
    halves of one salted md5 digest, dedup._md5_half) and md5 band
    buckets are recomputed identically by DuckDB, so signatures ->
    banding -> candidate join -> Jaccard verify is independently
    verified as one pipeline."""
    docs = _t(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, num_hashes=64, shingle_n=3)
    pairs = minhash_lsh_pairs(sigs, bands=16, rows_per_band=4)
    return (
        ngram_jaccard(pairs, docs, n=3)
        .filter(F.col("jaccard") >= 0.5)
        .orderBy("id_a", "id_b")
    )


def q_ngram_jaccard_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH verification stage oracle-checked: candidate pairs =
    docs sharing the 16-char normalized prefix (SQL-expressible
    blocking), then exact word-3-gram Jaccard via
    operators/dedup.ngram_jaccard; DuckDB recomputes the identical
    shingle sets and set algebra."""
    docs = _t(spark, sf_dir, "documents")
    keyed = docs.select("doc_id", _prefix_fp().alias("fp"))
    pairs = (
        keyed.alias("a")
        .join(keyed.alias("b"), on="fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    return ngram_jaccard(pairs, docs, n=3).orderBy("id_a", "id_b")


def q_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup duplicate CLUSTERS, oracle-checked: SQL-expressible
    prefix-blocked candidate pairs (the same blocking as
    ngram_jaccard_verify) verified at jaccard >= 0.5, then connected
    components (pointer-doubling min-label CC,
    operators/dedup.dedup_clusters) -> cluster-size histogram. DuckDB
    mirrors the pair derivation and runs WITH RECURSIVE min-label
    propagation, independently verifying the CC operator. (The
    minhash-LSH pair source stays exercised by minhash_near_dups.)"""
    from python_vegindex_spark.operators.dedup import dedup_clusters

    docs = _t(spark, sf_dir, "documents")
    keyed = docs.select("doc_id", _prefix_fp().alias("fp"))
    cand = (
        keyed.alias("a")
        .join(keyed.alias("b"), on="fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    pairs = (
        ngram_jaccard(cand, docs, n=3)
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b")
    )
    clusters = dedup_clusters(pairs)
    return (
        clusters.groupBy("cluster_id")
        .agg(F.count("*").cast("long").alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count("*").cast("long").alias("n_clusters"))
        .orderBy("cluster_size")
    )


def q_simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash signatures (near-dup fingerprints), oracle-checked
    bit-exactly: the default portable hash takes the 64 vote bits from
    the two md5 halves, which DuckDB recomputes with the identical
    bit votes and signed-64 signature assembly."""
    docs = _t(spark, sf_dir, "documents")
    return simhash64(docs).orderBy("id")


def q_solar_gate_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 solar elevation (pure JVM NOAA expression) as a per-event
    feature + gate filter; oracle-checked against the identical
    arithmetic in DuckDB."""
    from python_vegindex_spark.functions.astro import solar_elevation

    ev = _t(spark, sf_dir, "events")
    out = ev.withColumn(
        "solar_elev",
        F.round(solar_elevation(F.col("ts"), F.lit(42.5378), F.lit(-72.1715)), 4),
    )
    return (
        out.filter(F.col("solar_elev") > 0)
        .select("event_id", "solar_elev")
        .orderBy("event_id")
    )


def q_codec_roundtrip_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gorilla/delta-of-delta chunks: encode events, decode, hourly rollup."""
    from python_vegindex_spark.codecs.chunks import decode_chunks, encode_chunks

    ev = _t(spark, sf_dir, "events").select("event_type", "ts", "value")
    chunks = encode_chunks(ev, tier="daily", series_cols=["event_type"])
    back = decode_chunks(chunks, series_cols=["event_type"])
    return rollup_series(
        back, tier="hourly", series_cols=["event_type"], gap_fill=False,
        value_scale=100,
    ).orderBy("event_type", "bucket_start")


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, exact method (the recall oracle;
    operators/similarity.py embedding_near_dup_pairs; the LSH variant is
    the scale path, exercised rows-only by q_ivf_topk/tests)."""
    from python_vegindex_spark.operators.similarity import embedding_near_dup_pairs

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return embedding_near_dup_pairs(emb, threshold=0.4, method="exact").orderBy(
        "id_a", "id_b"
    )


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN, oracle-checked via the full-probe invariant: with
    nprobe == n_centroids every inverted list is probed, so IVF must
    return EXACTLY the brute-force top-k — a strong end-to-end check of
    codebook build, zero-shuffle cell assignment, probe join and cosine
    re-rank against DuckDB's exact search. (Partial-probe recall at
    nprobe < n_centroids is covered by tests/test_similarity_ivf.py.)"""
    from python_vegindex_spark.operators.similarity import ivf_index, ivf_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    assignments, centroids = ivf_index(emb, n_centroids=8, lloyd_iters=1)
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2))
    return ivf_topk(assignments, centroids, queries, k=5, nprobe=8).orderBy(
        "query_id", "rank"
    )


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-5 neighbors (multi-probe),
    oracle-checked: the hyperplanes are pure plan-time md5 literals
    (similarity.hyperplane_components), so the oracle inlines the SAME
    plane constants and DuckDB recomputes buckets, Hamming-1 probes and
    the cosine re-rank independently."""
    from python_vegindex_spark.operators.similarity import ann_topk_lsh

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2))
    return ann_topk_lsh(emb, queries, dim=64, k=5, num_planes=10).orderBy(
        "query_id", "rank"
    )


def q_media_stub_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: synthetic media table -> stub decode
    features, oracle-checked: synth_media's (kind, payload) are
    reproducible in pure Python, so the oracle recomputes every row's
    expected decode feature single-node (hashlib + numpy, no Spark) and
    inlines them as literals — verifying the distributed mapInPandas
    stage delivers exactly the per-record decode results."""
    from python_vegindex_spark.operators.multimodal import (
        extract_media_features,
        synth_media,
    )

    media = synth_media(spark, n=300)
    return extract_media_features(media).select(
        "media_id", "kind", F.round("feat_mean", 6).alias("feat_mean")
    ).orderBy("media_id")


def q_sample_docs_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-keyed Bernoulli sample (operators/sampling):
    the md5-threshold filter is a pure expression, so DuckDB reproduces
    the EXACT row set — something rand()-based sampling can never do."""
    from python_vegindex_spark.operators.sampling import hash_sample

    docs = _t(spark, sf_dir, "documents")
    return hash_sample(docs, 0.2, ["doc_id"], salt="r3").select(
        "doc_id", "lang", "n_chars"
    ).orderBy("doc_id")


def q_train_eval_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free deterministic train/eval split, summarized per
    (split, lang)."""
    from python_vegindex_spark.operators.sampling import split_train_eval

    docs = _t(spark, sf_dir, "documents")
    return (
        split_train_eval(docs, 0.25, ["doc_id"])
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars"),
        )
        .orderBy("split", "lang")
    )


def q_pack_chunks_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (operators/packing.pack_chunks):
    per-doc stream coordinates in the per-source token stream, budget
    4096 (n_chars as the token proxy so both engines share the count)."""
    from python_vegindex_spark.operators.packing import pack_chunks

    docs = _t(spark, sf_dir, "documents")
    return pack_chunks(docs, 4096, ["source"], ["doc_id"], "n_chars").select(
        "source", "doc_id", "offset", "pack_first", "pack_last", "n_packs_spanned"
    ).orderBy("source", "doc_id")


def q_pack_greedy_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-split greedy packing (operators/packing.pack_greedy, an
    applyInPandas reset-cumsum): per-pack sizes; the DuckDB oracle walks
    the same first-fit rule with a recursive CTE."""
    from python_vegindex_spark.operators.packing import pack_greedy

    docs = _t(spark, sf_dir, "documents")
    return (
        pack_greedy(docs, 4096, ["source"], ["doc_id"], "n_chars")
        .groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("pack_tokens"),
        )
        .orderBy("source", "pack_id")
    )


def _eval_split(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Deterministic benchmark carve-out for the decontamination queries:
    every 50th doc plays the eval set, the rest are the training corpus."""
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    return corpus, bench


def q_decontam_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/decontam): per-doc count of
    word 4-grams shared with the eval split — the GPT-3/Pile overlap
    rule; keys are both md5 halves so DuckDB reproduces them exactly."""
    from python_vegindex_spark.operators.decontam import contamination_hits

    corpus, bench = _eval_split(_t(spark, sf_dir, "documents"))
    return contamination_hits(corpus, bench, n=4).orderBy("id")


def q_decontam_clean_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The surviving corpus after decontamination, summarized per source
    (anti-join on the narrow hit list — doc payload never shuffles)."""
    from python_vegindex_spark.operators.decontam import decontaminate

    corpus, bench = _eval_split(_t(spark, sf_dir, "documents"))
    return (
        decontaminate(corpus, bench, n=4)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars"),
        )
        .orderBy("source")
    )


def q_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher Table-A1 quality gates (operators/quality_filter): one
    shuffle-free projection computing every per-row measure + flag."""
    from python_vegindex_spark.operators.quality_filter import gopher_flags

    docs = _t(spark, sf_dir, "documents")
    return gopher_flags(docs, min_words=30).orderBy("id")


def q_repetition_topgram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition gate: per-doc modal word 2-gram dominance
    (top_ngram_fraction — two-stage hash aggregate, deterministic
    lexicographic tie-break)."""
    from python_vegindex_spark.operators.quality_filter import top_ngram_fraction

    docs = _t(spark, sf_dir, "documents")
    return top_ngram_fraction(docs, n=2).orderBy("id")


def q_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-corpus pipeline (plans/corpus.py) as a retention
    funnel: quality gate -> decontamination vs the eval split -> exact
    dedup, one (stage, n_docs, chars) row per stage."""
    from python_vegindex_spark.plans.corpus import corpus_funnel

    corpus, bench = _eval_split(_t(spark, sf_dir, "documents"))
    return corpus_funnel(corpus, bench, min_words=30, decontam_n=4)


def _eight_word_lines(docs: DataFrame) -> DataFrame:
    """Deterministically re-chunk each doc's words into 8-word 'lines'
    (the synthetic documents carry no newlines) — mirrored verbatim in
    the DuckDB oracle so the line-level operators see identical text."""
    words = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(words)
    lines = F.transform(
        F.sequence(F.lit(0), F.floor((n - 1) / 8).cast("int")),
        lambda i: F.array_join(F.slice(words, i * 8 + 1, 8), " "),
    )
    return docs.withColumn("text", F.array_join(lines, "\n"))


def q_boilerplate_strip_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/RefinedWeb-style global boilerplate-line removal
    (operators/text_clean.strip_boilerplate_lines): lines present in
    >= 3 distinct docs are stripped everywhere, order preserved. Footer
    and nav lines are planted deterministically so the boilerplate set
    is non-trivial; the md5 of each rebuilt doc pins the reassembly."""
    from python_vegindex_spark.operators.text_clean import strip_boilerplate_lines

    docs = _eight_word_lines(_t(spark, sf_dir, "documents"))
    aug = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.lit("\nall rights reserved - example corp"),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 10 == 0, F.lit("\nhome | about | contact")
            ).otherwise(F.lit("")),
        ),
    )
    out = strip_boilerplate_lines(aug, min_docs=3)
    return out.select(
        "doc_id",
        "n_lines",
        "n_kept",
        F.md5("text").alias("clean_md5"),
    ).orderBy("doc_id")


def q_pii_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (operators/text_clean.scrub_pii): email/IPv4/phone
    spans planted deterministically per doc_id, counted on the original
    text and redacted sequentially; the scrubbed text is md5-pinned.
    One shuffle-free projection (Java-regex ∩ RE2 patterns, so DuckDB
    reproduces every span)."""
    from python_vegindex_spark.operators.text_clean import scrub_pii

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                did % 5 == 0,
                F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(
                did % 7 == 0,
                F.concat(
                    F.lit(" from 10."),
                    (did % 200).cast("string"),
                    F.lit(".0."),
                    (did % 250).cast("string"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 11 == 0,
                F.concat(F.lit(" tel +"), F.lpad((did * 37).cast("string"), 10, "0")),
            ).otherwise(F.lit("")),
        ),
    )
    return scrub_pii(aug).select(
        "doc_id",
        "n_email",
        "n_ipv4",
        "n_phone",
        F.md5("text").alias("scrubbed_md5"),
    ).orderBy("doc_id")


def q_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture resampling (operators/mixture): thin the corpus to
    a 50/30/20 src0/src1/src2 target at the largest feasible size. The
    keep fractions derive from per-source counts through a pinned float
    op order, and row selection is the content-keyed hash filter — so
    the oracle reproduces the EXACT surviving row set."""
    from python_vegindex_spark.operators.mixture import mixture_resample

    docs = _t(spark, sf_dir, "documents")
    weights = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    return (
        mixture_resample(docs, weights)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def q_semantic_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: embedding-cosine near-dup pairs
    (exact method — the recall oracle; the LSH variant is the scale
    path) -> connected components -> keep each cluster's minimum-id
    member (operators/similarity.embedding_near_dup_pairs +
    operators/dedup.dedup_keep_canonical)."""
    from python_vegindex_spark.operators.dedup import dedup_keep_canonical
    from python_vegindex_spark.operators.similarity import embedding_near_dup_pairs

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    pairs = embedding_near_dup_pairs(emb, threshold=0.4, method="exact")
    return (
        dedup_keep_canonical(emb, pairs.select("id_a", "id_b"), id_col="vec_id")
        .select("vec_id")
        .orderBy("vec_id")
    )


def q_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 visual downsample (Jugel VLDB'14) of events to a 64-pixel
    chart per event_type: first/last/min/max REAL points per pixel,
    one hash aggregate (operators/downsample.m4_downsample)."""
    from python_vegindex_spark.operators.downsample import m4_downsample

    ev = _t(spark, sf_dir, "events")
    return m4_downsample(
        ev, width=64, series_cols=["event_type"]
    ).orderBy("event_type", "px")


def q_locf_interpolate_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill fillers over the hourly continuous aggregate: LOCF and
    time-weighted linear interpolation of v_mean across the spine's
    empty buckets (functions/fill.fill_series)."""
    from python_vegindex_spark.functions.fill import fill_series

    agg = rollup_series(
        _t(spark, sf_dir, "events"),
        tier="hourly",
        series_cols=["event_type"],
        value_col="value",
        percentiles=(),
        value_scale=100,
    ).select("event_type", "bucket_start", "n", "v_mean")
    # the spine marks gap buckets with n=0 / NULL stats
    filled = fill_series(
        agg, ["event_type"], "bucket_start", ["v_mean"]
    )
    return filled.select(
        "event_type",
        "bucket_start",
        "n",
        "v_mean",
        # unrounded: LOCF carries an exact cents-grid mean, and the
        # interpolation of two such means can land midway at the 6th
        # decimal — round would be a cross-engine coin flip there
        F.col("v_mean_locf").alias("v_locf"),
        F.col("v_mean_interp").alias("v_interp"),
    ).orderBy("event_type", "bucket_start")


def q_counter_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL-style increase()/rate() with counter-reset handling
    (operators/rate.counter_increase): a deterministic sawtooth counter
    is built per user (integer running sum mod 1000, so both engines
    agree bit-exactly), then daily increase / resets / rate."""
    from python_vegindex_spark.operators.rate import counter_increase

    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ctr = ev.select(
        "user_id",
        "ts",
        "event_id",
        (F.sum(F.pmod(F.col("event_id"), F.lit(7)) + 1).over(w) % 1000).alias(
            "counter"
        ),
    )
    out = counter_increase(
        ctr,
        tier="daily",
        series_cols=["user_id"],
        counter_col="counter",
        order_cols=["event_id"],
    )
    return out.withColumn(
        "bucket_start", F.col("bucket_start").cast("timestamp")
    ).orderBy("user_id", "bucket_start")


def q_sliding_window_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour RANGE window per event_type (the rolling-rate
    monitor, operators/rate.sliding_time_stats), reduced to the daily
    PEAK rolling count and its exact integer sum/avg at the peak."""
    from python_vegindex_spark.operators.rate import sliding_time_stats

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100).cast("long").alias("v_int"),
    )
    slid = sliding_time_stats(
        ev, window_s=3600, series_cols=["event_type"], value_col="v_int",
        round_to=None,
    )
    day = slid.select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.struct(
            F.col("w_n").alias("n"),
            F.col("w_sum").alias("s"),
        ).alias("_peak"),
    )
    return (
        day.groupBy("event_type", "day")
        .agg(F.max("_peak").alias("_m"))
        .select(
            "event_type",
            F.col("day").cast("timestamp").alias("day"),
            F.col("_m.n").alias("peak_n"),
            F.col("_m.s").alias("peak_sum"),
            (
                F.col("_m.s").cast("double") / F.col("_m.n").cast("double")
            ).alias("peak_avg"),
        )
        .orderBy("event_type", "day")
    )


def q_rollup_15min_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-hourly continuous aggregate: epoch-anchored 15-minute buckets
    (time_bucket semantics, functions/buckets.tier_minutes), gap-filled,
    exact percentiles — the minute-grain twin of hourly_rollup_gapfill."""
    ev = _t(spark, sf_dir, "events")
    return rollup_series(
        ev, tier="15min", series_cols=["event_type"], value_col="value",
        value_scale=100,
    ).orderBy("event_type", "bucket_start")


def q_value_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density heatmap (operators/downsample.value_heatmap): row counts
    per (event_type, day, value bin of width 50) — integer bin index
    via floor, engine-exact."""
    from python_vegindex_spark.operators.downsample import value_heatmap

    out = value_heatmap(
        _t(spark, sf_dir, "events"),
        tier="daily",
        bin_width=50.0,
        series_cols=["event_type"],
    )
    return out.select(
        "event_type",
        F.col("bucket_start").cast("timestamp").alias("bucket_start"),
        "v_bin",
        "n",
    ).orderBy("event_type", "bucket_start", "v_bin")


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 terms per source with smooth TF-IDF scores
    (operators/terms.tfidf_top_terms); rank key is integer-exact
    (tf DESC, df ASC, term ASC) so selection never rides a float."""
    from python_vegindex_spark.operators.terms import tfidf_top_terms

    return tfidf_top_terms(_t(spark, sf_dir, "documents"), k=5).orderBy(
        "source", "rank"
    )


def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomaly flags (operators/rate.
    anomaly_zscore): 6 h baseline per event_type, current row and its
    ts-peers excluded; integer measure so the window moments — and
    therefore the |z| > 2.5 flag itself — are engine-exact."""
    from python_vegindex_spark.operators.rate import anomaly_zscore

    ev = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & ~F.isnan("value")
    ).select(
        "event_type",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100).cast("long").alias("v_int"),
    )
    out = anomaly_zscore(
        ev,
        window_s=6 * 3600,
        series_cols=["event_type"],
        value_col="v_int",
        threshold=2.5,
        min_baseline=20,
    )
    return (
        out.where("is_anomaly")
        .select("event_type", "event_id", "ts", "v_int", "base_n", "z")
        .orderBy("event_type", "event_id")
    )


def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly time-weighted average under LOCF weighting (TimescaleDB
    time_weight analog, operators/rate.time_weighted_avg): irregular
    samples weighted by actual holding time, covered-span normalized."""
    from python_vegindex_spark.operators.rate import time_weighted_avg

    ev = _t(spark, sf_dir, "events")
    return time_weighted_avg(
        ev,
        tier="hourly",
        series_cols=["event_type"],
        order_cols=["event_id"],
        value_scale=100,
    ).orderBy("event_type", "bucket_start")



def q_ewma_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finite-window EWMA (operators/rate.ewma_smooth, alpha=0.3, K=8)
    over an hourly mean built from INTEGER sums (sum(v_int)/n — order-
    free, so the smoothed trail is reproducible bit-for-bit: the
    weights are Python-computed literals on both engines)."""
    from python_vegindex_spark.operators.rate import ewma_smooth

    ev = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & ~F.isnan("value") & F.col("ts").isNotNull()
    )
    hr = (
        ev.select(
            "event_type",
            bucket_start(F.col("ts"), "hourly").alias("bucket_start"),
            F.floor(F.col("value") * 100).cast("long").alias("v_int"),
        )
        .groupBy("event_type", "bucket_start")
        .agg(
            F.round(
                F.sum("v_int").cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("v_mean")
        )
    )
    return ewma_smooth(
        hr, ["event_type"], ["bucket_start"], "v_mean", alpha=0.3, span_k=8
    ).orderBy("event_type", "bucket_start")


def q_linear_trend_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket OLS trend (operators/rate.linear_trend): slope /
    intercept / Pearson corr of the quantized value against seconds-
    within-day, from order-free BIGINT moment sums — the floats are a
    pinned op order on exact integers, engine-exact."""
    from python_vegindex_spark.operators.rate import linear_trend

    ev = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & ~F.isnan("value")
    ).select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100).cast("long").alias("v_int"),
    )
    out = linear_trend(
        ev, "daily", ["event_type"], value_col="v_int", round_to=None
    )
    return out.withColumn(
        "bucket_start", F.col("bucket_start").cast("timestamp")
    ).orderBy("event_type", "bucket_start")


def q_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unique-key cardinality rollup (operators/rate.distinct_rollup):
    exact two-phase count(distinct user_id) per (event_type, day); the
    HyperLogLog++ opt-in path is pytest-verified, exact is the
    oracle-checked default."""
    from python_vegindex_spark.operators.rate import distinct_rollup

    out = distinct_rollup(
        _t(spark, sf_dir, "events"), "daily", ["event_type"], "user_id"
    )
    return out.withColumn(
        "bucket_start", F.col("bucket_start").cast("timestamp")
    ).orderBy("event_type", "bucket_start")


def q_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL-style histogram_quantile (operators/downsample) composed
    over value_heatmap binned counts: p90 per (event_type, day) with
    linear in-bin interpolation — integer counts + pinned float order,
    engine-exact."""
    from python_vegindex_spark.operators.downsample import (
        histogram_quantile,
        value_heatmap,
    )

    hm = value_heatmap(
        _t(spark, sf_dir, "events"),
        tier="daily",
        bin_width=50.0,
        series_cols=["event_type"],
    )
    out = histogram_quantile(hm, 0.9, 50.0, ["event_type"])
    return out.withColumn(
        "bucket_start", F.col("bucket_start").cast("timestamp")
    ).orderBy("event_type", "bucket_start")



def q_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heartbeat uptime per hour (operators/rate.interval_coverage,
    TimescaleDB heartbeat_agg analog): every event asserts liveness for
    300 s; gaps-and-islands merge -> bucket clipping, all integer-us
    arithmetic so coverage is engine-exact."""
    from python_vegindex_spark.operators.rate import interval_coverage

    out = interval_coverage(
        _t(spark, sf_dir, "events"),
        tier="hourly",
        series_cols=["event_type"],
        timeout_s=300,
    )
    return out.orderBy("event_type", "bucket_start")



def _events_vint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with the quantized integer measure the monitoring queries
    share (floor(value*100) after the NaN/NULL gate) — integer sums keep
    every downstream float derivation order-free and engine-exact."""
    return (
        _t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull() & ~F.isnan("value") & F.col("ts").isNotNull())
        .select(
            "event_type",
            "ts",
            F.floor(F.col("value") * 100).cast("long").alias("v_int"),
        )
    )


def q_seasonal_profile_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonal baseline (operators/rate.seasonal_profile):
    per (event_type, dow, hour) slot count + population mean/std from
    integer sums in the anomaly_zscore pinned op order."""
    from python_vegindex_spark.operators.rate import seasonal_profile

    return seasonal_profile(
        _events_vint(spark, sf_dir), ["event_type"], value_col="v_int",
        round_to=None,
    ).orderBy("event_type", "dow", "hour")


def q_seasonal_anomaly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-shuffle seasonal scoring (operators/rate.seasonal_deviation,
    broadcast profile join) reduced to flagged-row counts per
    (event_type, dow); the |z| > 2.5 flag is engine-exact because the
    slot moments come from integer sums."""
    from python_vegindex_spark.operators.rate import (
        seasonal_deviation,
        seasonal_profile,
    )

    ev = _events_vint(spark, sf_dir)
    prof = seasonal_profile(ev, ["event_type"], value_col="v_int", round_to=None)
    scored = seasonal_deviation(
        ev, prof, ["event_type"], value_col="v_int",
        threshold=2.5, min_baseline=20,
    )
    return (
        scored.groupBy("event_type", F.dayofweek("ts").alias("dow"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("is_anomaly"), 1)).alias("n_anom"),
        )
        .orderBy("event_type", "dow")
    )



def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix (operators/funnel.
    transition_counts): adjacent event_type pairs per user ordered by
    (ts, event_id) — integer counts, engine-exact."""
    from python_vegindex_spark.operators.funnel import transition_counts

    return transition_counts(
        _t(spark, sf_dir, "events"),
        ["user_id"],
        "event_type",
        order_cols=["event_id"],
    ).orderBy("from_state", "to_state")


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (operators/funnel.funnel_steps):
    signup -> click -> purchase within 7 days per step, earliest-
    qualifying semantics on integral epoch-us mins; reduced to per-step
    reach counts."""
    from python_vegindex_spark.operators.funnel import funnel_steps, funnel_summary

    f = funnel_steps(
        _t(spark, sf_dir, "events"),
        ["user_id"],
        "event_type",
        ["signup", "click", "purchase"],
        max_gap_s=7 * 86400,
    )
    return funnel_summary(f, 3).orderBy("step")



def q_cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix (operators/funnel.cohort_retention):
    users grouped by first-activity epoch-week, distinct-active counts
    per (cohort, week offset) — pure integer period arithmetic."""
    from python_vegindex_spark.operators.funnel import cohort_retention

    return cohort_retention(
        _t(spark, sf_dir, "events"), ["user_id"], period_s=7 * 86400
    ).orderBy("cohort_start", "offset")



def q_funnel_step_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert per funnel step (operators/funnel.funnel_timing):
    exact interpolated median / p90 of the inter-step µs deltas over
    the signup -> click -> purchase funnel."""
    from python_vegindex_spark.operators.funnel import funnel_steps, funnel_timing

    f = funnel_steps(
        _t(spark, sf_dir, "events"),
        ["user_id"],
        "event_type",
        ["signup", "click", "purchase"],
        max_gap_s=7 * 86400,
    )
    return funnel_timing(f, 3, round_to=None).orderBy("step")



def q_top_event_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters per bucket (operators/generic_rollup.top_frequent):
    the 3 most active users per (event_type, day); integer rank key
    (n DESC, user ASC), engine-exact."""
    from python_vegindex_spark.operators.generic_rollup import top_frequent

    out = top_frequent(
        _t(spark, sf_dir, "events"), "daily", ["event_type"], "user_id", k=3
    )
    return out.withColumn(
        "bucket_start", F.col("bucket_start").cast("timestamp")
    ).orderBy("event_type", "bucket_start", "rank")



def q_pop_wow_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week comparison (operators/rate.period_over_period):
    daily mean (from integer sums, order-free) vs the same series
    exactly 7 days earlier via an exact-offset RANGE frame — a missing
    baseline day yields NULL, never 'the previous row'."""
    from python_vegindex_spark.operators.rate import period_over_period

    ev = _events_vint(spark, sf_dir)
    daily = (
        ev.groupBy(
            "event_type",
            F.to_date("ts").cast("timestamp").alias("bucket_start"),
        )
        .agg(
            (
                F.sum("v_int").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("v_mean")
        )
    )
    return period_over_period(
        daily, ["event_type"], "bucket_start", "v_mean", period_s=7 * 86400,
        round_to=None,
    ).orderBy("event_type", "bucket_start")


def q_threshold_alert_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hysteresis alerting (operators/rate.threshold_alerts): alert on
    at v_int >= 30000, off at <= 5000; per event_type the episode count
    and rows-in-alert — the last-non-null-edge window algebra is
    integer-exact on both engines."""
    from python_vegindex_spark.operators.rate import threshold_alerts

    ev = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & ~F.isnan("value") & F.col("ts").isNotNull()
    ).select(
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("v_int"),
    )
    out = threshold_alerts(
        ev, ["event_type"], hi=30000, lo=5000,
        value_col="v_int", order_cols=["event_id"],
    )
    return (
        out.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("alert_state").cast("long").alias("alert_rows"),
            F.max("episode").cast("long").alias("n_episodes"),
        )
        .orderBy("event_type")
    )



def q_chunks_range_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map chunk read path (codecs/chunks.decode_chunks ts_min/
    ts_max): encode events into daily Gorilla chunks, decode ONLY a
    one-week window — whole chunks outside [first_ts, last_ts] overlap
    are dropped JVM-side before the Python decode — then aggregate
    exactly; the oracle reads the source rows directly through the
    identical window."""
    from python_vegindex_spark.codecs.chunks import decode_chunks, encode_chunks

    ev = _t(spark, sf_dir, "events").select("event_type", "ts", "value")
    chunks = encode_chunks(ev, tier="daily", series_cols=["event_type"])
    back = decode_chunks(
        chunks,
        ["event_type"],
        ts_min="2024-01-08 06:00:00",
        ts_max="2024-01-15 18:00:00",
    )
    # source NULL values roundtrip as NaN through the float codec:
    # drop both classes, mirroring the oracle's NULL/NaN filter
    back = back.where(F.col("value").isNotNull() & ~F.isnan("value"))
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("v_sum"),
            F.min("ts").alias("ts_first"),
            F.max("ts").alias("ts_last"),
        )
        .orderBy("event_type")
    )


def q_asof_interpolated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 interpolated variant (operators/asof.asof_join_interpolate):
    each click scored with the view-value series LINEARLY INTERPOLATED
    between its bracketing samples per user (boundary-held at the
    series edges), the QuestDB/kdb-style interpolated time join. The
    oracle mirrors the identical union + paired IGNORE NULLS windows +
    pinned IEEE interpolation op order."""
    from python_vegindex_spark.operators.asof import asof_join_interpolate

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    out = asof_join_interpolate(clicks, views, on=["user_id"], value_col="value")
    return out.select(
        "event_id", "user_id",
        F.round("value_interp", 6).alias("view_value_interp"),
    ).orderBy("event_id")


def q_series_correlation_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation between event-type series' daily
    integer bucket sums (operators/correlate.series_correlation) — the
    metric-correlation dashboard staple. Exact-integer moment sums, one
    pinned double op order (the linear_trend discipline)."""
    from python_vegindex_spark.operators.correlate import series_correlation

    ev = _t(spark, sf_dir, "events")
    return series_correlation(ev, "daily", "event_type").orderBy(
        "series_a", "series_b"
    )


def q_autocorrelation_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample ACF of each event-type series' daily bucket sums at lags
    1/2/7 (operators/correlate.autocorrelation)."""
    from python_vegindex_spark.operators.correlate import autocorrelation

    ev = _t(spark, sf_dir, "events")
    return autocorrelation(ev, "daily", ["event_type"], lags=[1, 2, 7]).orderBy(
        "event_type", "lag"
    )


def q_leadlag_correlation_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag analysis (operators/correlate.lagged_cross_correlation):
    corr(series_a at day t, series_b at day t+lag) for ordered pairs at
    lags 0 and 1 — 'does A lead B by a day?'."""
    from python_vegindex_spark.operators.correlate import lagged_cross_correlation

    ev = _t(spark, sf_dir, "events")
    return lagged_cross_correlation(ev, "daily", "event_type", lags=[0, 1]).orderBy(
        "series_a", "series_b", "lag"
    )


def q_forecast_backtest_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive vs seasonal-naive forecast backtest (MAE/RMSE per
    event-type series at lag 1 and lag 7 days) —
    operators/correlate.forecast_backtest_error; the lag-1 MAE is the
    MASE denominator."""
    from python_vegindex_spark.operators.correlate import forecast_backtest_error

    ev = _t(spark, sf_dir, "events")
    return forecast_backtest_error(
        ev, "daily", ["event_type"], season=7, round_to=None
    ).orderBy(
        "event_type", "lag"
    )


def q_value_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift per event-type series across a date split
    (operators/downsample.value_drift): triangular-discrimination
    statistic over shared integer value bins — the log-free χ²-family
    divergence, rational arithmetic end to end."""
    import datetime as dt

    from python_vegindex_spark.operators.downsample import value_drift

    ev = _t(spark, sf_dir, "events")
    return value_drift(
        ev, dt.datetime(2024, 2, 1), ["event_type"], bin_width=50.0
    ).orderBy("event_type")


def q_snapshot_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-level pruning end-to-end: a day-partitioned snapshot
    table (one commit per fortnight of events, so groups have disjoint
    partition sets) read back with BOTH partition pruning (3 chosen
    days) and a zone-map range (value in [100, 300]) must equal the
    plain SQL filter — 'pruning only shrinks the scan, never the
    answer'. Checksums integer-exact."""
    import shutil
    import tempfile

    from python_vegindex_spark.session import scratch_dir
    from python_vegindex_spark.sources.snapshots import SnapshotTable

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    days = ["2024-01-03", "2024-01-17", "2024-02-02"]
    root = tempfile.mkdtemp(prefix="snap_pr_", dir=scratch_dir())
    try:
        t = SnapshotTable(
            spark, root, partition_by=["day"], stats_cols=["value"]
        )
        t.append(ev.filter(F.dayofmonth("ts") <= 15))
        t.append(ev.filter(F.dayofmonth("ts") > 15))
        ok = F.col("value").isNotNull() & ~F.isnan("value")
        rows = (
            t.read(prune={"day": days}, prune_range={"value": (100.0, 300.0)})
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("event_id").cast("long").alias("id_sum"),
                F.sum(
                    F.when(ok, F.floor(F.col("value") * 100).cast("long"))
                ).cast("long").alias("v_sum"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    out = spark.createDataFrame(
        [(r["event_type"], r["n"], r["id_sum"], r["v_sum"]) for r in rows],
        "event_type string, n long, id_sum long, v_sum long",
    )
    return out.orderBy("event_type")


def q_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-style snapshot table (sources/snapshots.py): two appends
    then a copy-on-write MERGE, each version read back via time travel
    and checksummed. The oracle reconstructs all three versions from the
    source table directly, so manifest commits, the COW upsert and
    time-travel reads are all value-checked end to end. Checksums are
    integer-exact (floor(value*100) per row before the sum), immune to
    cross-engine float summation order."""
    import shutil
    import tempfile

    from python_vegindex_spark.session import scratch_dir
    from python_vegindex_spark.sources.snapshots import SnapshotTable

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    root = tempfile.mkdtemp(prefix="snap_tt_", dir=scratch_dir())
    try:
        t = SnapshotTable(spark, root, partition_by=["day"])
        t.append(ev.filter(F.col("event_id") % 2 == 0))
        t.append(ev.filter(F.col("event_id") % 2 == 1))
        t.upsert(
            ev.filter(F.col("event_id") % 5 == 0).withColumn(
                "value", F.col("value") + 1000.0
            ),
            keys=["event_id"],
        )
        ok = F.col("value").isNotNull() & ~F.isnan("value")
        rows = []
        for v in (1, 2, 3):
            rows.extend(
                t.read(version=v)
                .groupBy("event_type")
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n"),
                    F.sum("event_id").cast("long").alias("id_sum"),
                    F.sum(
                        F.when(ok, F.floor(F.col("value") * 100).cast("long"))
                    ).cast("long").alias("v_sum"),
                )
                .withColumn("version", F.lit(v).cast("int"))
                .collect()
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    out = spark.createDataFrame(
        [(r["version"], r["event_type"], r["n"], r["id_sum"], r["v_sum"]) for r in rows],
        "version int, event_type string, n long, id_sum long, v_sum long",
    )
    return out.orderBy("version", "event_type")


def q_ohlc_vwap_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candlestick bars (operators/bars.ohlc_bars): hourly OHLC + VWAP
    per event_type. Value and weight are integer-quantized so the
    open/close struct picks, extremes, and the VWAP dot product are all
    engine-exact (BIGINT sums, one pinned final division)."""
    from python_vegindex_spark.operators.bars import ohlc_bars

    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull() & ~F.isnan("value") & F.col("ts").isNotNull())
        .select(
            "event_type",
            "ts",
            "event_id",
            F.floor(F.col("value") * 100).cast("long").alias("v_int"),
            (F.pmod(F.col("event_id"), F.lit(97)) + 1).cast("long").alias("w_int"),
        )
    )
    out = ohlc_bars(
        ev,
        "hourly",
        ["event_type"],
        value_col="v_int",
        weight_col="w_int",
        order_cols=["event_id"],
        round_to=None,
    )
    return out.select(
        "event_type",
        "bucket_start",
        "n",
        F.col("open").cast("long").alias("open"),
        F.col("high").cast("long").alias("high"),
        F.col("low").cast("long").alias("low"),
        F.col("close").cast("long").alias("close"),
        F.col("w_sum").cast("long").alias("w_sum"),
        "vwap",
    ).orderBy("event_type", "bucket_start")


def q_state_durations_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-in-state per bucket (operators/funnel.state_durations,
    TimescaleDB state_agg/duration_in analog): per user (< 20) the
    LOCF event_type state, held to the fixed cut 2024-02-01, clipped to
    hourly buckets in exact integer µs."""
    from python_vegindex_spark.operators.funnel import state_durations

    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 20)
    out = state_durations(
        ev,
        "hourly",
        ["user_id"],
        "event_type",
        through="2024-02-01 00:00:00",
        order_cols=["event_id"],
    )
    return out.orderBy("user_id", "bucket_start", "state")


def q_rolling_median_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour rolling MEDIAN per event_type
    (operators/rate.sliding_time_quantile — the robust sibling of the
    rolling mean), reduced to the daily max/min of the per-row rolling
    median. Integer-quantized values make the q=0.5 interpolation
    midpoint (a+b)/2 exact in doubles on both engines."""
    from python_vegindex_spark.operators.rate import sliding_time_quantile

    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull() & ~F.isnan("value") & F.col("ts").isNotNull())
        .select(
            "event_type",
            "ts",
            F.floor(F.col("value") * 100).cast("long").alias("v_int"),
        )
    )
    slid = sliding_time_quantile(
        ev, window_s=3600, q=0.5, series_cols=["event_type"], value_col="v_int",
        round_to=None,
    )
    return (
        slid.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("w_quantile"), 6).alias("med_max"),
            F.round(F.min("w_quantile"), 6).alias("med_min"),
        )
        .select(
            "event_type", F.col("day").cast("timestamp").alias("day"),
            "n", "med_max", "med_min",
        )
        .orderBy("event_type", "day")
    )


def q_gap_report_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-data gaps (operators/rate.gap_report): per-user
    inter-event gaps of >= 36 h — deadman/outage detection as rows.
    Integer-µs exact; ts ties are zero gaps by construction."""
    from python_vegindex_spark.operators.rate import gap_report

    ev = _t(spark, sf_dir, "events")
    out = gap_report(
        ev, min_gap_s=36 * 3600, series_cols=["user_id"], order_cols=["event_id"]
    )
    return out.select(
        "user_id", "gap_start", "gap_end", "gap_us", F.round("gap_s", 6).alias("gap_s")
    ).orderBy("user_id", "gap_start")


def q_holt_winters_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE seasonal smoothing
    (operators/rate.holt_winters_smooth — the seasonal completion of
    ewma/holt) over daily BIGINT sums with a 7-bucket season. The
    level/trend/seasonal recursion is walked in applyInPandas and
    mirrored by a DuckDB RECURSIVE CTE that carries the 7 seasonal
    indices as a LIST column, identical pinned float order throughout."""
    from python_vegindex_spark.operators.rate import holt_winters_smooth

    ev = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & ~F.isnan("value") & F.col("ts").isNotNull()
    )
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("bucket_start")
    ).agg(F.sum(F.floor(F.col("value") * 100).cast("long")).alias("v"))
    out = holt_winters_smooth(
        daily, ["event_type"], season_len=7, order_col="bucket_start",
        value_col="v", alpha=0.3, beta=0.05, gamma=0.2,
    )
    return out.select(
        "event_type",
        "bucket_start",
        "x",
        F.round("level", 6).alias("level"),
        F.round("trend", 6).alias("trend"),
        F.round("seasonal", 6).alias("seasonal"),
        F.round("fitted", 6).alias("fitted"),
    ).orderBy("event_type", "bucket_start")


def q_sax_daily_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolic representation (operators/sax.sax_symbols, Lin &
    Keogh DMKD'03): daily PAA means per event_type z-scored against the
    series' population moments (order-free BIGINT sums, pinned float
    order) and discretized into a 4-letter Gaussian alphabet. Symbols
    come from comparisons against literal breakpoints, so they are
    bit-exact cross-engine."""
    from python_vegindex_spark.operators.sax import sax_symbols

    ev = _t(spark, sf_dir, "events").select(
        "event_type", "ts", F.floor(F.col("value") * 100).cast("long").alias("v_int")
    )
    out = sax_symbols(
        ev, "daily", ["event_type"], value_col="v_int", alphabet_size=4
    )
    return out.withColumn(
        "bucket_start", F.col("bucket_start").cast("timestamp")
    ).orderBy("event_type", "bucket_start")


def q_sax_motif_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX motif mining (operators/sax.sax_motifs): the 3 most frequent
    3-letter words per event_type over the daily symbol stream,
    deterministic (cnt DESC, word ASC) tie-break."""
    from python_vegindex_spark.operators.sax import sax_motifs, sax_symbols

    ev = _t(spark, sf_dir, "events").select(
        "event_type", "ts", F.floor(F.col("value") * 100).cast("long").alias("v_int")
    )
    syms = sax_symbols(
        ev, "daily", ["event_type"], value_col="v_int", alphabet_size=4
    )
    words = sax_motifs(syms, ["event_type"], word_len=3)
    w = Window.partitionBy("event_type").orderBy(
        F.col("cnt").desc(), F.col("word").asc()
    )
    return (
        words.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("event_type", "rank", "word", "cnt")
        .orderBy("event_type", "rank")
    )


def q_diversity_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical diversity rollup
    (operators/generic_rollup.category_diversity): per (event_type,
    day), how concentrated activity is across users — Gini-Simpson +
    Hurlbert PIE + modal share, all from exact BIGINT count sums with
    one pinned division each (log-free by design, the value_drift
    cross-engine discipline)."""
    from python_vegindex_spark.operators.generic_rollup import category_diversity

    ev = _t(spark, sf_dir, "events")
    out = category_diversity(
        ev, "daily", ["event_type"], "user_id", round_to=None
    )
    return out.withColumn(
        "bucket_start", F.col("bucket_start").cast("timestamp")
    ).orderBy("event_type", "bucket_start")


def q_bollinger_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands (operators/bars.bollinger_bands): trailing 7-day
    mean +- 2 population stddevs around the daily BIGINT sum series per
    event_type, plus the %B band position. Window sums are exact
    BIGINTs; mean/std/bands in the engine-wide pinned order."""
    from python_vegindex_spark.operators.bars import bollinger_bands

    ev = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & ~F.isnan("value") & F.col("ts").isNotNull()
    )
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.floor(F.col("value") * 100).cast("long")).alias("v"))
    out = bollinger_bands(
        daily, window_s=7 * 86400, series_cols=["event_type"],
        k=2.0, ts_col="day", value_col="v",
    )
    return out.select(
        "event_type", "day", "v", "w_n",
        "bb_mean", "bb_std", "bb_upper", "bb_lower", "bb_pos",
    ).orderBy("event_type", "day")


def q_domain_cap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap (operators/sampling.cap_per_group): keep at most
    40 documents per source, chosen by smallest content hash — the
    pretraining domain-frequency control. Content-keyed, so the
    surviving row SET is reproducible and the DuckDB oracle (a single
    md5 rank window) must produce the identical rows — which also
    value-checks the two-phase distributed top-k against the naive
    window."""
    from python_vegindex_spark.operators.sampling import cap_per_group

    docs = _t(spark, sf_dir, "documents")
    out = cap_per_group(docs, ["source"], cap=40, key_cols=["doc_id"])
    return out.select(
        "source", "grp_rank", "doc_id", "n_chars"
    ).orderBy("source", "grp_rank")


def q_dimensional_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP CUBE subtotals (operators/generic_rollup.dimensional_rollup):
    events cubed over (event_type, user cohort) in ONE scan + one
    Expand + one hash aggregate; grouping_id disambiguates subtotal
    NULLs. BIGINT sums throughout."""
    from python_vegindex_spark.operators.generic_rollup import dimensional_rollup

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.pmod(F.col("user_id"), F.lit(10)).cast("long").alias("cohort"),
        F.floor(F.col("value") * 100).cast("long").alias("v_int"),
    )
    out = dimensional_rollup(ev, ["event_type", "cohort"], "v_int", mode="cube")
    return out.orderBy("gid", "event_type", "cohort")


def q_bm25_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword search (operators/terms.bm25_search): top-25 docs
    for a 3-term query over the documents table — the lexical
    retriever next to the embedding ANN family. Counts/lengths are
    exact integers; the per-doc score composes per-term in a PINNED
    left-associative order (each term's sum holds <= 1 addend), and
    the rank key is (rounded score DESC, doc_id ASC), so ranking
    survives cross-engine libm ulp in ln."""
    from python_vegindex_spark.operators.terms import bm25_search

    docs = _t(spark, sf_dir, "documents")
    return bm25_search(
        docs, ["spark", "stream", "vector"], k=25
    ).orderBy("rank")


def q_blackout_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blackout-window exclusion (operators/interval_join
    .exclude_intervals): two fixed maintenance windows anti-joined out
    of events (broadcast, fact side never shuffles), then a daily
    count/sum rollup proves the excluded rows are gone."""
    from python_vegindex_spark.operators.interval_join import exclude_intervals

    ev = _t(spark, sf_dir, "events")
    bl = spark.createDataFrame(
        [
            ("2024-01-10 06:00:00", "2024-01-10 18:00:00"),
            ("2024-01-20 00:00:00", "2024-01-21 00:00:00"),
        ],
        "start_ts string, end_ts string",
    ).select(
        F.col("start_ts").cast("timestamp").alias("start_ts"),
        F.col("end_ts").cast("timestamp").alias("end_ts"),
    )
    kept = exclude_intervals(ev, bl)
    return (
        kept.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("v_sum"),
        )
        .orderBy("event_type", "day")
    )


def q_stride_decimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic decimation (operators/downsample.stride_downsample):
    every 97th event per event_type by (ts, event_id) order — exact
    per-series rate, deterministic survivor set."""
    from python_vegindex_spark.operators.downsample import stride_downsample

    ev = _t(spark, sf_dir, "events").select("event_type", "ts", "event_id")
    out = stride_downsample(
        ev, stride=97, series_cols=["event_type"], order_cols=["event_id"]
    )
    return out.select(
        "event_type", "sample_idx", "ts", "event_id"
    ).orderBy("event_type", "sample_idx")


def q_cascade_daily_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar cascade (operators/cascade.cascade_bars): hourly bars
    composed into daily bars — open/close picked by struct min/max over
    (fine bucket, value), VWAP from the composed exact dot-product
    sums. The oracle computes daily bars DIRECTLY from raw rows, so the
    cascade ≡ direct claim is value-checked end to end."""
    from python_vegindex_spark.operators.bars import ohlc_bars
    from python_vegindex_spark.operators.cascade import cascade_bars

    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull() & ~F.isnan("value") & F.col("ts").isNotNull())
        .select(
            "event_type",
            "ts",
            "event_id",
            F.floor(F.col("value") * 100).cast("long").alias("v_int"),
            (F.pmod(F.col("event_id"), F.lit(97)) + 1).cast("long").alias("w_int"),
        )
    )
    fine = ohlc_bars(
        ev, "hourly", ["event_type"], value_col="v_int", weight_col="w_int",
        order_cols=["event_id"], round_to=None,
    )
    daily = cascade_bars(fine, "hourly", "daily", ["event_type"])
    return daily.select(
        "event_type",
        "bucket_start",
        "n",
        F.col("open").cast("long").alias("open"),
        F.col("high").cast("long").alias("high"),
        F.col("low").cast("long").alias("low"),
        F.col("close").cast("long").alias("close"),
        F.col("w_sum").cast("long").alias("w_sum"),
        F.col("vw_sum").cast("long").alias("vw_sum"),
        F.col("vwap"),
    ).orderBy("event_type", "bucket_start")


def q_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-point query (operators/generic_rollup.last_point,
    TimescaleDB last()/SkipScan analog): every user's most recent
    event value — ONE struct-max aggregate, no window, no sort."""
    from python_vegindex_spark.operators.generic_rollup import last_point

    ev = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & ~F.isnan("value")
    )
    out = last_point(ev, ["user_id"], value_col="value", order_cols=["event_id"])
    return out.select(
        "user_id", "last_ts", F.round("last_value", 6).alias("last_value"), "n"
    ).orderBy("user_id")


def q_slo_burn_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO attainment + burn rate (operators/rate.slo_fraction): hourly
    fraction of events with value <= 250 per event_type against a 0.55
    objective — conditional BIGINT counts, pinned divisions, the
    1-objective budget literal Python-computed once and embedded
    verbatim in the oracle."""
    from python_vegindex_spark.operators.rate import slo_fraction

    ev = _t(spark, sf_dir, "events")
    out = slo_fraction(
        ev, "hourly", ["event_type"], threshold=250.0, objective=0.55,
        round_to=None,
    )
    return out.select(
        "event_type", "bucket_start", "n", "n_good",
        "good_frac", "breached", "burn_rate",
    ).orderBy("event_type", "bucket_start")


def q_normalize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group feature scaling (operators/mlprep.normalize_per_group):
    z-score AND min-max of the quantized value within each event_type —
    stats fit on the FULL table (order-free BIGINT sums, pinned
    mean/std), applied to the user_id < 5 slice through the broadcast
    join (the train-fit / row-apply split)."""
    from python_vegindex_spark.operators.mlprep import group_stats, normalize_per_group

    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull() & ~F.isnan("value"))
        .select(
            "event_id", "user_id", "event_type",
            F.floor(F.col("value") * 100).cast("long").alias("v_int"),
        )
    )
    st = group_stats(ev, ["event_type"], "v_int")
    sl = ev.where(F.col("user_id") < 5)
    z = normalize_per_group(sl, ["event_type"], "v_int", stats=st)
    zm = normalize_per_group(z, ["event_type"], "v_int", method="minmax", stats=st)
    return zm.select(
        "event_id", "event_type", "v_int", "v_int_zscore", "v_int_minmax"
    ).orderBy("event_id")


def q_doc_len_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency discretization (operators/mlprep.quantile_bins):
    documents binned into per-source n_chars quartiles; bin edges are
    exact HF-7 percentiles over integers at q = i/4 (binary-exact
    fractions, so the edge doubles are bit-identical cross-engine and
    assignment comparisons cannot flip). Output: per-(source, bin)
    count and char range."""
    from python_vegindex_spark.operators.mlprep import quantile_bins

    docs = _t(spark, sf_dir, "documents")
    binned = quantile_bins(docs, ["source"], "n_chars", n_bins=4)
    return (
        binned.groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("source", "bin")
    )


def q_wau_trailing_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day active users per event_type
    (operators/rate.trailing_distinct — the WAU generator): distinct
    (series, day, user) triples replicate to the <= 7 daily buckets
    they influence, clipped to the observed range, exact
    count-distinct per target bucket."""
    from python_vegindex_spark.operators.rate import trailing_distinct

    ev = _t(spark, sf_dir, "events")
    out = trailing_distinct(ev, "daily", 7, ["event_type"], "user_id")
    return out.orderBy("event_type", "bucket_start")


def q_mad_robust_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily rollup (operators/rate.mad_rollup): exact median +
    MAD + robust outlier count per event_type — median/MAD over
    integer-quantized values are exact halves on both engines; the
    outlier threshold literal (k * 1.4826) is Python-computed once and
    embedded verbatim in the oracle."""
    from python_vegindex_spark.operators.rate import mad_rollup

    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull() & ~F.isnan("value"))
        .select(
            "event_type", "ts",
            F.floor(F.col("value") * 100).cast("long").alias("v_int"),
        )
    )
    out = mad_rollup(ev, "daily", ["event_type"], value_col="v_int")
    return out.withColumn(
        "bucket_start", F.col("bucket_start").cast("timestamp")
    ).orderBy("event_type", "bucket_start")


def q_trimmed_mean_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily 10 %-trimmed mean per event_type
    (operators/robust.trimmed_mean_rollup): drop the floor(n*0.1)
    smallest and largest quantized values per bucket, mean the exact
    BIGINT sum of the survivors — the surviving value-multiset is
    deterministic even when ties straddle the cut, and the mean is one
    division."""
    from python_vegindex_spark.operators.robust import trimmed_mean_rollup

    ev = _t(spark, sf_dir, "events")
    out = trimmed_mean_rollup(
        ev, "daily", ["event_type"], trim_frac=0.1, round_to=None
    )
    return out.withColumn(
        "bucket_start", F.col("bucket_start").cast("timestamp")
    ).orderBy("event_type", "bucket_start")


def q_theilsen_daily_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily Theil-Sen robust slope per event_type
    (operators/robust.theilsen_slopes): exact median of all pairwise
    slopes over strictly-increasing timestamps; each slope is one
    IEEE division of exact integers, re-quantized before the median so
    the even-count interpolation is over BIGINTs (exact halves on both
    engines)."""
    from python_vegindex_spark.operators.robust import theilsen_slopes

    ev = _t(spark, sf_dir, "events")
    out = theilsen_slopes(ev, "daily", ["event_type"], round_to=None)
    # UNROUNDED on purpose: the median of quantized slopes is an exact
    # integer-or-half, so slope = m / 1e6 is ONE deterministic IEEE
    # division (bit-identical across engines) — but rounding it to 6 dp
    # hits a decimal TIE whenever m is a half (x.xxxxxx5), and engines
    # disagree on tie direction. The raw double is the safer contract.
    return out.withColumn(
        "bucket_start", F.col("bucket_start").cast("timestamp")
    ).orderBy("event_type", "bucket_start")


def q_spearman_daily_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise SPEARMAN rank correlation between event-type series'
    daily integer bucket sums (operators/correlate.spearman_correlation)
    — the robust twin of series_correlation_daily. Tie-averaged ranks
    stay integral via the doubling trick (2*avg_rank = 2*min_rank +
    ties - 1); the moment sums run the exact-integer Pearson
    machinery."""
    from python_vegindex_spark.operators.correlate import spearman_correlation

    ev = _t(spark, sf_dir, "events")
    return spearman_correlation(ev, "daily", "event_type").orderBy(
        "series_a", "series_b"
    )


def q_seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of each event-type's daily mean
    series (operators/decompose.seasonal_decompose): centered pooled
    7-day trend from order-free BIGINT window sums (one division),
    per-weekday seasonal index as the exact median of quantized
    detrended values, residual = detrended - seasonal."""
    from python_vegindex_spark.operators.decompose import seasonal_decompose

    ev = _t(spark, sf_dir, "events")
    # round_to=None for the same decimal-tie reason as theilsen: the
    # seasonal index is an exact half / 1e6 — rounding that to 6 dp is
    # a coin-flip tie across engines; the unrounded doubles are
    # bit-identical (every op pinned).
    out = seasonal_decompose(ev, ["event_type"], season=7, round_to=None)
    return out.withColumn("day", F.col("day").cast("timestamp")).orderBy(
        "event_type", "day"
    )


def q_savgol_daily_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Savitzky-Golay quadratic smoothing of each event-type's daily
    mean (operators/decompose.savgol_smooth, window 5) — the
    phenology-standard peak-preserving smoother, as a pinned
    left-associative integer-coefficient convolution with ONE final
    division; gap/edge windows emit NULL via the lattice-contiguity
    check. Unrounded doubles (bit-identical: every op pinned)."""
    from python_vegindex_spark.operators.decompose import savgol_smooth

    ev = _t(spark, sf_dir, "events")
    out = savgol_smooth(ev, ["event_type"], window=5)
    return out.withColumn("day", F.col("day").cast("timestamp")).orderBy(
        "event_type", "day"
    )


def q_transition_dates_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-crossing transition dates per (event_type, year)
    (operators/decompose.transition_dates): the phenology greenup/season
    extraction — first/last day the SG-smoothed daily series reaches
    50 % of its seasonal amplitude. Dates are exact (comparisons over
    bit-identical smoothed doubles); lo/hi/thr unrounded."""
    from python_vegindex_spark.operators.decompose import transition_dates

    ev = _t(spark, sf_dir, "events")
    out = transition_dates(ev, ["event_type"], frac=0.5, window=5)
    return (
        out.withColumn("sos_day", F.col("sos_day").cast("timestamp"))
        .withColumn("eos_day", F.col("eos_day").cast("timestamp"))
        .orderBy("event_type", "year")
    )


def q_vocab_growth_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth curve over ingestion order
    (operators/vocab.vocab_growth, batch = 50 docs): per batch the
    never-seen-before term count, cumulative vocabulary, token volume
    and cumulative tokens. All-integer outputs (counts and cumulative
    sums of counts) so the oracle comparison is trivially bit-exact."""
    from python_vegindex_spark.operators.vocab import vocab_growth

    docs = _t(spark, sf_dir, "documents")
    return vocab_growth(docs, batch_size=50).orderBy("batch")


def q_postings_index_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (operators/vocab.postings_index, top-50 by
    the integer rank key df DESC, tf DESC, term ASC): per term the
    document frequency, collection term frequency and an order-free
    BIGINT occurrence checksum sum(doc_id*100003 + pos) standing in
    for the serialized postings list — any dropped/duplicated/moved
    occurrence changes it. No floats anywhere."""
    from python_vegindex_spark.operators.vocab import postings_index

    docs = _t(spark, sf_dir, "documents")
    return postings_index(docs, k=50).orderBy("rank")


def q_pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact PageRank (operators/graph.pagerank_integer, 3
    iterations) over the supplier->customer fulfillment graph built
    from lineitem JOIN orders — link-graph centrality as the
    crawl-quality-prior shape. Every rank is BIGINT micro-mass on a
    10^12 scale; the oracle is the same fixpoint UNROLLED into plain
    SQL, so the whole iterative loop is value-checked bit-for-bit.
    Top-50 by the integer key (rank_q DESC, node ASC)."""
    from python_vegindex_spark.operators.graph import pagerank_integer

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    ranks = pagerank_integer(edges, iters=3)
    return ranks.orderBy(F.col("rank_q").desc(), F.col("node").asc()).limit(50)


def q_triangle_counts_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node exact triangle counts (operators/graph.triangle_counts)
    over the user co-occurrence graph — users active in the same
    (event_type, minute) bucket (operators/graph.cooccurrence_edges,
    hot buckets > 50 users dropped pre-join: the projection blowup
    guard). Counting uses the degree-ordered orientation so the wedge
    join's fan-out is O(sqrt(m))-bounded even at celebrity nodes.
    All-integer."""
    from python_vegindex_spark.operators.graph import (
        cooccurrence_edges,
        triangle_counts,
    )

    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .select(
            "user_id",
            "event_type",
            F.date_trunc("minute", F.col("ts")).alias("bucket"),
        )
    )
    edges = cooccurrence_edges(
        ev, "user_id", ("event_type", "bucket"), max_bucket_nodes=50
    )
    return triangle_counts(edges).orderBy("node")


def q_bfs_blast_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS blast radius (operators/graph.bfs_distances,
    depth 3) over the user co-occurrence graph (same guarded
    projection as triangle_counts_users): exact hop distance from the
    deterministic seed set user_id % 13 == 0 — the contamination-
    spread / influence-radius query. All-integer; the oracle unrolls
    the same min-plus rounds in SQL."""
    from python_vegindex_spark.operators.graph import (
        bfs_distances,
        cooccurrence_edges,
    )

    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .select(
            "user_id",
            "event_type",
            F.date_trunc("minute", F.col("ts")).alias("bucket"),
        )
    )
    edges = cooccurrence_edges(
        ev, "user_id", ("event_type", "bucket"), max_bucket_nodes=50
    )
    seeds = (
        _t(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull() & (F.col("user_id") % 13 == 0))
        .select(F.col("user_id").cast("string").alias("node"))
        .distinct()
    )
    return bfs_distances(edges, seeds, max_depth=3).orderBy("node")


def q_assemble_conversations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation assembly (operators/assemble.assemble_conversations):
    the transcripts->corpus bridge — one role-tagged document per
    sequence in stable (ts, event_id) order, the driver contract's
    per-turn-text-equality invariant expressed as an oracle query.
    Mapped onto events: user_id = conversation, event_type = role,
    props = turn text. String equality is the whole point: any
    dropped/reordered/mutated turn changes the assembled text."""
    from python_vegindex_spark.operators.assemble import assemble_conversations

    ev = _t(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    return assemble_conversations(
        ev,
        conv_col="user_id",
        order_cols=("ts", "event_id"),
        role_col="event_type",
        text_col="props",
    ).orderBy("user_id")


def q_weighted_percentiles_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact type-1 weighted percentiles per (event_type, day)
    (operators/weighted.weighted_percentiles): value quantized to
    BIGINT cents, weight = the props JSON's integer k — the
    token-weighted-latency shape. Selection is the all-integer
    cross-multiplication cum*100 >= q100*W over a distinct-value
    pre-aggregate; the only float is the final pinned v/100."""
    from python_vegindex_spark.operators.weighted import weighted_percentiles

    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .select(
            "event_type",
            F.date_trunc("day", F.col("ts")).alias("bucket_start"),
            "value",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
    )
    return weighted_percentiles(
        ev, ["event_type", "bucket_start"], "value", "k", qs=(0.5, 0.9)
    ).orderBy("event_type", "bucket_start")


def q_sequence_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event-type trigram mining per user (operators/funnel.
    sequence_ngrams, n=3): the k-th-order generalization of the
    transition matrix — per-gram total occurrences and distinct-user
    support, both exact integers; order pinned by (ts, event_id)."""
    from python_vegindex_spark.operators.funnel import sequence_ngrams

    return sequence_ngrams(
        _t(spark, sf_dir, "events"),
        ["user_id"],
        "event_type",
        n=3,
        order_cols=["event_id"],
        min_support=2,
    ).orderBy("gram")


def q_cosine_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs document cosine via the term-partitioned
    postings self-join (operators/terms.cosine_pairs, min_cos=0.92):
    the exact complement of the MinHash/containment screens. Integer
    dot + squared norms, one IEEE sqrt·sqrt multiply and ONE division
    — bit-identical doubles, so the threshold decides identically
    cross-engine. (max_df pruning is left off here only because the
    synthetic corpus has a 31-term dense vocabulary — pruning it
    empties every vector; the unit tests exercise the guard.)"""
    from python_vegindex_spark.operators.terms import cosine_pairs

    docs = _t(spark, sf_dir, "documents")
    return cosine_pairs(docs, min_cos=0.92).orderBy("id_a", "id_b")


def q_chunk_containment_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment detection via shared aligned chunk hashes
    (operators/packing.chunk_containment): docs that share exact
    128-char lattice chunks pair through an equi-join on the chunk md5
    (never all-pairs); containment = shared / min(chunk counts) — the
    asymmetric-duplication screen MinHash's symmetric Jaccard misses."""
    from python_vegindex_spark.operators.packing import chunk_containment

    docs = _t(spark, sf_dir, "documents")
    out = chunk_containment(docs, chunk_chars=128, min_shared=1)
    return out.orderBy("id_a", "id_b")


def q_rolling_corr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day Pearson correlation per event-type pair per day
    (operators/correlate.rolling_correlation): the time-resolved member
    of the correlation family — six exact integer moment sums over a
    RANGE frame on the day index, one pinned double expression per
    row."""
    from python_vegindex_spark.operators.correlate import rolling_correlation

    ev = _t(spark, sf_dir, "events")
    out = rolling_correlation(
        ev, "daily", "event_type", window=7, min_periods=3
    )
    return out.withColumn(
        "bucket_start", F.col("bucket_start").cast("timestamp")
    ).orderBy("series_a", "series_b", "bucket_start")


def q_snapshot_zorder_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZORDER BY compaction end-to-end (sources/snapshots.compact):
    arrival-order appends span the full (user_id, value) space, the
    Morton rewrite re-clusters them, and a 2-D box read must BOTH
    prune file groups at the manifest level (asserted in-query — a
    layout regression fails the gate) and equal the plain SQL filter.
    Checksums integer-exact."""
    import shutil
    import tempfile

    from python_vegindex_spark.session import scratch_dir
    from python_vegindex_spark.sources.snapshots import SnapshotTable

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    root = tempfile.mkdtemp(prefix="snap_z_", dir=scratch_dir())
    try:
        t = SnapshotTable(spark, root, stats_cols=["user_id", "value"])
        for i in range(3):  # arrival order: every group spans both dims
            t.append(ev.filter(F.pmod(F.col("event_id"), F.lit(3)) == i))
        total = sum(
            g["rows"] for g in t._manifest(t.current_version())["files"]
        )
        v = t.compact(
            target_rows_per_file=max(1, total // 8),
            zorder_by=["user_id", "value"],
        )
        m = t._manifest(v)
        box = {"user_id": (100, 300), "value": (100.0, 300.0)}
        picked = t._select_range(m["files"], box)
        if len(m["files"]) > 1 and not len(picked) < len(m["files"]):
            raise AssertionError(
                "z-order layout failed to prune the 2-D box query"
            )
        ok = F.col("value").isNotNull() & ~F.isnan("value")
        rows = (
            t.read(version=v, prune_range=box)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("event_id").cast("long").alias("id_sum"),
                F.sum(
                    F.when(ok, F.floor(F.col("value") * 100).cast("long"))
                ).cast("long").alias("v_sum"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    out = spark.createDataFrame(
        [(r["event_type"], r["n"], r["id_sum"], r["v_sum"]) for r in rows],
        "event_type string, n long, id_sum long, v_sum long",
    )
    return out.orderBy("event_type")


def q_chunk_overlap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window RAG chunking with overlap
    (operators/packing.chunk_overlap): 512-char chunks at stride 384;
    exact integer lattice + substring + md5, all JVM."""
    from python_vegindex_spark.operators.packing import chunk_overlap

    docs = _t(spark, sf_dir, "documents")
    return chunk_overlap(docs, chunk_chars=512, stride=384).orderBy(
        "doc_id", "chunk_idx"
    )


def q_snapshot_bloom_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-indexed point lookup end-to-end (sources/snapshots
    bloom_cols): three disjoint-population appends, then a read pruned
    by the per-group bloom on user_id — the manifest-level skip that
    min/max zone maps cannot give on a uniform high-cardinality key.
    Pruning effectiveness is asserted IN-QUERY (an index regression
    fails the gate); the result must equal the plain filter, checked
    against the SQL oracle. Integer-exact output."""
    import shutil
    import tempfile

    from python_vegindex_spark.session import scratch_dir
    from python_vegindex_spark.sources.snapshots import SnapshotTable

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    )
    keys = [5, 17, 29, 41, 53]
    root = tempfile.mkdtemp(prefix="snap_b_", dir=scratch_dir())
    try:
        t = SnapshotTable(spark, root, bloom_cols=["user_id"])
        # disjoint user populations per group (mod-3 of user_id)
        for i in range(3):
            t.append(ev.filter(F.pmod(F.col("user_id"), F.lit(3)) == i))
        m = t._manifest(t.current_version())
        picked = t._select_bloom(m["files"], {"user_id": keys})
        # all 5 keys are ~ 2 (mod 3): they live in ONE group, so the
        # bloom must prune BOTH other groups (false-positive odds at
        # the 8192-bit default are ~1e-10 per lookup); a partial index
        # regression that stops pruning even one group fails here
        if len(m["files"]) == 3 and len(picked) != 1:
            raise AssertionError(
                f"bloom index failed to prune the lookup (kept {len(picked)}/3)"
            )
        rows = (
            t.read(prune_bloom={"user_id": keys})
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("event_id").cast("long").alias("id_sum"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    out = spark.createDataFrame(
        [(r["user_id"], r["n"], r["id_sum"]) for r in rows],
        "user_id long, n long, id_sum long",
    )
    return out.orderBy("user_id")


def q_weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPS sampling (operators/sampling.weighted_bottomk_sample,
    Ohlsson sequential Poisson '98): 30 documents sampled proportional
    to n_chars — the deterministic weighted pick a data-mixture
    pipeline uses for size-biased corpus draws. Priority = one IEEE
    product + one division of exactly-representable inputs, so the
    ranking reproduces bit-for-bit; nested in k; ties on key."""
    from python_vegindex_spark.operators.sampling import (
        weighted_bottomk_sample,
    )

    docs = _t(spark, sf_dir, "documents")
    return weighted_bottomk_sample(
        docs, "doc_id", "n_chars", k=30
    ).orderBy("rank")


def q_cms_merge_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS cascade mergeability as a checked result (the sum-merge
    sibling of hll_merge_weekly): weekly Count-Min counters derived by
    SUM-merging daily sketches must equal counters built from raw rows
    — the property that lets per-bucket heavy-hitter sketches ride the
    tier chain. Emits per-week matrix checksums from both paths plus
    the equality flag; all integer."""
    from python_vegindex_spark.operators.sketches import cms_build

    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.date_trunc("week", F.col("ts")).alias("week"),
            "user_id",
        )
    )
    daily = cms_build(ev, "user_id", ["day", "week"], depth=3, width=256)
    merged = (
        daily.groupBy("week", "row_idx", "col_idx")
        .agg(F.sum("counter").alias("counter"))
        .groupBy("week")
        .agg(
            F.sum(
                F.col("counter")
                * (F.col("row_idx") * 256 + F.col("col_idx") + 1)
            ).cast("long").alias("merged_checksum"),
            F.sum("counter").cast("long").alias("merged_total"),
        )
    )
    direct = (
        cms_build(ev, "user_id", ["week"], depth=3, width=256)
        .groupBy("week")
        .agg(
            F.sum(
                F.col("counter")
                * (F.col("row_idx") * 256 + F.col("col_idx") + 1)
            ).cast("long").alias("direct_checksum"),
            F.sum("counter").cast("long").alias("direct_total"),
        )
    )
    return (
        merged.join(direct, "week")
        .withColumn(
            "merged_eq_direct",
            (F.col("merged_checksum") == F.col("direct_checksum"))
            & (F.col("merged_total") == F.col("direct_total")),
        )
        .orderBy("week")
    )


def q_edit1_typo_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy vocabulary join (operators/fuzzy.edit1_pairs, SymSpell
    deletion-variant trick): term pairs at Levenshtein distance
    exactly 1 — the typo/OCR-noise miner. The synthetic corpus has a
    deliberately clean vocabulary (zero natural edit-1 pairs), so the
    query PLANTS deterministic typos first: each real term of length
    >= 5 contributes its first-character deletion as a freq-1
    pseudo-term (anti-joined against the real vocab) — then the miner
    must recover exactly those pairs. Candidates from the deletion-key
    equi-join (exact recall), verified by the built-in levenshtein
    (identical integer DP on both engines); vocabulary-sized
    throughout."""
    from python_vegindex_spark.operators.fuzzy import edit1_pairs

    words = (
        _t(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("term")
        )
        .where(F.col("term").rlike("^[a-z0-9]{1,24}$"))
    )
    vocab = words.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    typos = (
        vocab.where(F.length("term") >= 5)
        .select(F.expr("substring(term, 2)").alias("term"))
        .join(vocab.select("term"), "term", "left_anti")
        .distinct()
        .withColumn("freq", F.lit(1).cast("long"))
    )
    pairs = edit1_pairs(
        vocab.unionByName(typos), min_len=4, max_len=24
    )
    w = Window.orderBy(
        F.col("freq_hi").desc(),
        F.col("freq_lo").desc(),
        F.col("term_hi").asc(),
        F.col("term_lo").asc(),
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 40)
        .select("rank", "term_hi", "freq_hi", "term_lo", "freq_lo")
        .orderBy("rank")
    )


def q_ranking_agreement_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranker-agreement evaluation (the retrieval-eval companion of
    hybrid_search_rrf): overlap@k and Jaccard@k between the BM25 leg
    and the cosine leg at k in {5, 10, 25} — the standard "are my two
    retrievers seeing the same documents" monitor. Counts are exact
    integers; each reported fraction is ONE division (overlap/k,
    inter/union), so rows are bit-reproducible."""
    from python_vegindex_spark.operators.fusion import hybrid_search_rrf  # noqa: F401
    from python_vegindex_spark.operators.similarity import cosine_topk
    from python_vegindex_spark.operators.terms import bm25_search

    docs = _t(spark, sf_dir, "documents")
    embs = _t(spark, sf_dir, "embeddings")
    lex = bm25_search(docs, ["spark", "stream", "vector"], k=25).select(
        F.col("doc_id"), F.col("rank").alias("rank_lex")
    )
    q = embs.where(F.col("vec_id") == 0)
    sem = cosine_topk(embs, q, k=25).select(
        F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("rank_sem")
    )
    joined = lex.join(sem, "doc_id", "full_outer")
    # ONE aggregation computes all six counters (three jobs over the
    # same frame would triple the legs' work inside the timed sweep)
    ks = (5, 10, 25)
    r = joined.agg(
        *[
            F.count(
                F.when(
                    (F.col("rank_lex") <= k) & (F.col("rank_sem") <= k), 1
                )
            ).cast("long").alias(f"i{k}")
            for k in ks
        ],
        *[
            F.count(
                F.when(
                    (F.col("rank_lex") <= k) | (F.col("rank_sem") <= k), 1
                )
            ).cast("long").alias(f"u{k}")
            for k in ks
        ],
    ).collect()[0]
    out = spark.createDataFrame(
        [(k, r[f"i{k}"], r[f"u{k}"]) for k in ks],
        "k int, inter long, union_n long",
    )
    return out.select(
        "k",
        "inter",
        "union_n",
        (F.col("inter").cast("double") / F.col("k").cast("double")).alias(
            "overlap_at_k"
        ),
        (
            F.col("inter").cast("double") / F.col("union_n").cast("double")
        ).alias("jaccard_at_k"),
    ).orderBy("k")


def q_hll_distinct_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog approximate distinct users per day
    (operators/sketches): the mergeable-cardinality rollup — at 10^12
    turns exact per-bucket distincts re-scan raw data per tier, a
    register sketch cascades like any other gold aggregate. Everything
    checked here is integer-exact (md5-prefix hash, CASE-chain rank,
    2^K-scaled harmonic denominator as BIGINT) except the one pinned
    division producing est_raw; exact_distinct rides along so the
    sketch's error is visible in the result."""
    from python_vegindex_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select(F.date_trunc("day", F.col("ts")).alias("day"), "user_id")
    )
    est = hll_estimate(hll_registers(ev, "user_id", ["day"], b=5), ["day"], b=5)
    exact = ev.groupBy("day").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "day").orderBy("day")


def q_hll_merge_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch mergeability as a checked result: weekly HLL registers
    derived by max-merging DAILY register tables must be bit-identical
    to registers built from raw rows (the property that lets the
    hourly->daily->weekly cascade roll distinct counts without
    re-scanning raw turns). Emits both scaled denominators plus the
    equality flag; merged_eq_direct is the mergeability proof."""
    from python_vegindex_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.date_trunc("week", F.col("ts")).alias("week"),
            "user_id",
        )
    )
    daily = hll_registers(ev, "user_id", ["day"], b=5)
    merged = hll_estimate(
        hll_merge(daily, {"week": F.date_trunc("week", F.col("day"))}),
        ["week"],
        b=5,
    ).select(
        "week",
        F.col("s_scaled").alias("s_merged"),
        F.col("est_raw").alias("est_merged"),
    )
    direct = hll_estimate(
        hll_registers(ev, "user_id", ["week"], b=5), ["week"], b=5
    ).select("week", F.col("s_scaled").alias("s_direct"))
    return (
        merged.join(direct, "week")
        .withColumn(
            "merged_eq_direct", F.col("s_merged") == F.col("s_direct")
        )
        .orderBy("week")
    )


def q_unigram_freq_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram corpus-frequency quality score per document
    (operators/terms.unigram_freq_score): the log-free unigram-LM
    signal — mean corpus frequency of a doc's tokens. Counts are exact
    BIGINTs; the score is one product + one division of exactly-rounded
    doubles (no sum(ln p): libm AND summation order both wobble
    cross-engine)."""
    from python_vegindex_spark.operators.terms import unigram_freq_score

    docs = _t(spark, sf_dir, "documents")
    return unigram_freq_score(docs).orderBy("doc_id")


def q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (operators/fusion.hybrid_search_rrf): BM25
    lexical leg (same 3-term query as bm25_search_docs) fused with the
    cosine leg against embedding 0 by Reciprocal Rank Fusion. Ranks
    are exact integers from each leg's pinned ordering; the fused
    score is ONE division of small exact integers
    ((2k0+r1+r2)/((k0+r1)(k0+r2))), so the output is bit-reproducible;
    ties break on doc_id."""
    from python_vegindex_spark.operators.fusion import hybrid_search_rrf

    docs = _t(spark, sf_dir, "documents")
    embs = _t(spark, sf_dir, "embeddings")
    return hybrid_search_rrf(
        docs,
        embs,
        ["spark", "stream", "vector"],
        query_vec_id=0,
        k=25,
        pool=50,
    ).orderBy("rank")


def q_cms_heavy_hitters_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch heavy hitters (operators/sketches.cms_build /
    cms_estimate): a 4x1024 sum-mergeable counter sketch over the
    corpus token stream, point-queried for the top-20 exact terms.
    Everything is integer (md5-prefix column hashing, min-of-counters
    estimate), so the one-sided guarantee est >= true is CHECKED in the
    result (one_sided_ok), along with the overestimate each hot term
    picks up from collisions."""
    from python_vegindex_spark.operators.sketches import cms_build, cms_estimate

    words = (
        _t(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("term")
        )
        .where(F.length("term") >= 1)
    )
    sketch = cms_build(words, "term", [], depth=4, width=1024)
    top = (
        words.groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact_tf"))
        .orderBy(F.col("exact_tf").desc(), F.col("term").asc())
        .limit(20)
    )
    est = cms_estimate(sketch, top, "term", depth=4, width=1024)
    return est.select(
        "term",
        "exact_tf",
        "cms_est",
        (F.col("cms_est") - F.col("exact_tf")).alias("overestimate"),
        (F.col("cms_est") >= F.col("exact_tf")).alias("one_sided_ok"),
    ).orderBy(F.col("exact_tf").desc(), F.col("term").asc())


def q_bottomk_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k sampling (operators/sketches.bottomk_sample): per
    event_type, the 64 users with smallest md5-prefix hash — the
    deterministic, mergeable, RNG-free distributed sample — and its
    distinct-count estimator (k-1)*2^60/h_(k) (ONE pinned division;
    underfull groups report the exact count). exact_distinct rides
    along to expose the estimator's error."""
    from python_vegindex_spark.operators.sketches import (
        bottomk_distinct_estimate,
        bottomk_sample,
    )

    ev = _t(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    sample = bottomk_sample(ev, "user_id", k=64, group_cols=["event_type"])
    est = bottomk_distinct_estimate(sample, k=64, group_cols=["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").orderBy("event_type")


def q_bpe_merges_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (operators/bpe.bpe_train,
    Sennrich et al. ACL'16): the first 12 merges learned from the
    documents corpus — ONE corpus pass collapses to the word-frequency
    vocab, every merge step then works on the vocab only (the
    production-trainer shape). Integer counts + string surgery, no
    floats; the oracle re-runs the identical data-dependent loop
    (argmax included) as generated unrolled CTE stages."""
    from python_vegindex_spark.operators.bpe import bpe_train

    docs = _t(spark, sf_dir, "documents")
    return bpe_train(spark, docs, n_merges=12).orderBy("step")


def q_bpe_token_counts_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-apply BPE (operators/bpe.bpe_segment): the 12 merges
    from bpe_merges_docs replayed onto every document — per-doc BPE
    token count, distinct-token count, and an order-free token
    checksum (sum of xxhash-free md5-prefix hashes), so any wrong
    segmentation anywhere flips the row. The merge list is a 12-row
    driver collect (the tokenizer artifact); the apply pass is pure
    JVM string surgery per word."""
    from python_vegindex_spark.operators.bpe import bpe_segment, bpe_train
    from python_vegindex_spark.operators.sketches import hash60

    docs = _t(spark, sf_dir, "documents")
    merges = [
        (r["left"], r["right"])
        for r in bpe_train(spark, docs, n_merges=12).orderBy("step").collect()
    ]
    seg = bpe_segment(docs, merges)
    tok = seg.select(
        "doc_id", F.explode("bpe_tokens").alias("tok")
    )
    return (
        tok.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bpe_tokens"),
            F.count_distinct("tok").alias("n_distinct_tokens"),
            # mod keeps the per-doc sum far below BIGINT overflow
            F.sum(F.pmod(hash60(F.col("tok")), F.lit(1 << 40)))
            .cast("bigint")
            .alias("token_checksum"),
        )
        .orderBy("doc_id")
    )


def q_dtw_event_type_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic Time Warping shape-similarity (operators/dtw.dtw_pairs)
    between event types: each series is its first 30 daily sums of
    floor(value*100) — integer points, so every DP cell is exact
    BIGINT and the distance is bit-reproducible. The oracle walks the
    identical recurrence as a generated anti-diagonal wave-CTE chain
    (no floats anywhere). The 30-point clamp is the deterministic
    bound that also fixes the oracle's unroll depth."""
    from python_vegindex_spark.operators.dtw import dtw_pairs

    daily = (
        _t(spark, sf_dir, "events")
        .where(
            F.col("ts").isNotNull()
            & F.col("value").isNotNull()
            & ~F.isnan("value")
        )
        .groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("v")
        )
    )
    return dtw_pairs(
        daily, "event_type", "day", "v", max_points=30
    ).orderBy("series_a", "series_b")


def q_plot_partitions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """plot_roistats twin partition split (operators/plot_export.
    roistats_plot_partitions — the reference script's boolean masks,
    plot_roistats.py:88-101) over a roistats-shaped frame derived
    deterministically from events: solar_elev = value - 200 (spans the
    10-degree gate), band means r=value / g=0.8v / b=0.6v (brt = 2.4v
    spans the [100, 665] brightness window). Reports per-partition
    exact counts plus order-free extremes — no float summation order
    anywhere."""
    from python_vegindex_spark.operators.plot_export import (
        roistats_plot_partitions,
    )

    ev = _t(spark, sf_dir, "events")
    stats = ev.select(
        "event_id",
        "ts",
        (F.col("value") - F.lit(200.0)).alias("solar_elev"),
        F.col("value").alias("r_mean"),
        (F.col("value") * F.lit(0.8)).alias("g_mean"),
        (F.col("value") * F.lit(0.6)).alias("b_mean"),
    )
    parts = roistats_plot_partitions(stats)
    return (
        parts.groupBy("series")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("brt"), 6).alias("brt_min"),
            F.round(F.max("brt"), 6).alias("brt_max"),
            F.round(F.min("solar_elev"), 6).alias("solar_min"),
            F.round(F.max("solar_elev"), 6).alias("solar_max"),
        )
        .orderBy("series")
    )


def q_plot_export_points_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full plot_roistats export composition (operators/plot_export.
    plot_roistats_table): partition split -> per-series M4 pre-reduction
    -> 4-corner unpivot + distinct scatter, plus the summary line layer
    — over the same events-derived roistats frame as
    plot_partitions_events, with gcc = value/500 (one IEEE division)
    and a daily-MAX gcc line (order-free exact double, no percentile
    float hazards). The DuckDB oracle replays the identical M4
    bucketing/tie-break rules (the m4_downsample oracle conventions)."""
    from python_vegindex_spark.operators.plot_export import plot_roistats_table

    ev = _t(spark, sf_dir, "events")
    stats = ev.select(
        "ts",
        (F.col("value") - F.lit(200.0)).alias("solar_elev"),
        F.col("value").alias("r_mean"),
        (F.col("value") * F.lit(0.8)).alias("g_mean"),
        (F.col("value") * F.lit(0.6)).alias("b_mean"),
        (F.col("value") / F.lit(500.0)).alias("gcc"),
    )
    summary = ev.groupBy(F.to_date("ts").alias("date")).agg(
        F.max(F.col("value") / F.lit(500.0)).alias("gcc_90")
    )
    return plot_roistats_table(stats, summary, width=16).orderBy(
        "layer", "series", "ts", "gcc"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "hourly_rollup_gapfill": q_hourly_rollup_gapfill,
        "multitier_rollup": q_multitier_rollup,
        "cascade_weekly_from_hourly": q_cascade_weekly_from_hourly,
        "cascade_histogram_p90": q_cascade_histogram_p90,
        "cusum_daily_changepoints": q_cusum_daily_changepoints,
        "holt_daily_smooth": q_holt_daily_smooth,
        "validate_events": q_validate_events,
        "daily_user_rollup_tiered": q_daily_user_rollup_tiered,
        "weekly_anchored_rollup": q_weekly_anchored_rollup,
        "midpoint_rep_rows": q_midpoint_rep_rows,
        "latency_lag_stats": q_latency_lag_stats,
        "session_stats": q_session_stats,
        "asof_backward_join": q_asof_backward_join,
        "asof_bucketed_join": q_asof_bucketed_join,
        "asof_nearest_join": q_asof_nearest_join,
        "asof_forward_join": q_asof_forward_join,
        "summary_threshold_nullout": q_summary_threshold_nullout,
        "hf_quantile_types": q_hf_quantile_types,
        "vegindex_summary_3day": q_vegindex_summary_3day,
        "vegindex_summary_yearboundary": q_vegindex_summary_yearboundary,
        "ndvi_summary_3day": q_ndvi_summary_3day,
        "gcc_update_equals_full": q_gcc_update_equals_full,
        "interval_join_agg": q_interval_join_agg,
        "merge_upsert_checksum": q_merge_upsert_checksum,
        "dedup_exact_docs": q_dedup_exact_docs,
        "text_stats_docs": q_text_stats_docs,
        "lang_quality_summary": q_lang_quality_summary,
        "ann_cosine_topk": q_ann_cosine_topk,
        "tpch_pricing_summary": q_tpch_pricing_summary,
        "topk_per_group": q_topk_per_group,
        "union_dedup": q_union_dedup,
        "paired_index_backward": q_paired_index_backward,
        "validity_interval_join": q_validity_interval_join,
        "tpch_multi_join": q_tpch_multi_join,
        "lang_quality_docs": q_lang_quality_docs,
        "fingerprint_dup_histogram": q_fingerprint_dup_histogram,
        "word_len_percentiles": q_word_len_percentiles,
        "deg_dms_roundtrip": q_deg_dms_roundtrip,
        "csv_sentinel_format": q_csv_sentinel_format,
        "minhash_near_dups": q_minhash_near_dups,
        "dedup_cluster_sizes": q_dedup_cluster_sizes,
        "ngram_jaccard_verify": q_ngram_jaccard_verify,
        "simhash_docs": q_simhash_docs,
        "solar_gate_features": q_solar_gate_features,
        "plot_partitions_events": q_plot_partitions_events,
        "plot_export_points_events": q_plot_export_points_events,
        "codec_roundtrip_rollup": q_codec_roundtrip_rollup,
        "ann_lsh_topk": q_ann_lsh_topk,
        "media_stub_features": q_media_stub_features,
        "embedding_near_dups": q_embedding_near_dups,
        "ivf_topk": q_ivf_topk,
        "sample_docs_hash": q_sample_docs_hash,
        "train_eval_split_stats": q_train_eval_split_stats,
        "pack_chunks_docs": q_pack_chunks_docs,
        "pack_greedy_sizes": q_pack_greedy_sizes,
        "decontam_hits": q_decontam_hits,
        "decontam_clean_by_source": q_decontam_clean_by_source,
        "gopher_quality_flags": q_gopher_quality_flags,
        "repetition_topgram": q_repetition_topgram,
        "corpus_funnel": q_corpus_funnel,
        "boilerplate_strip_docs": q_boilerplate_strip_docs,
        "pii_scrub_docs": q_pii_scrub_docs,
        "mixture_resample": q_mixture_resample,
        "semantic_dedup_survivors": q_semantic_dedup_survivors,
        "m4_downsample": q_m4_downsample,
        "locf_interpolate_fill": q_locf_interpolate_fill,
        "counter_rate_daily": q_counter_rate_daily,
        "sliding_window_peak": q_sliding_window_peak,
        "time_weighted_avg": q_time_weighted_avg,
        "rollup_15min_gapfill": q_rollup_15min_gapfill,
        "anomaly_zscore": q_anomaly_zscore,
        "tfidf_top_terms": q_tfidf_top_terms,
        "value_heatmap": q_value_heatmap,
        "ewma_hourly": q_ewma_hourly,
        "linear_trend_daily": q_linear_trend_daily,
        "distinct_users_daily": q_distinct_users_daily,
        "histogram_quantile": q_histogram_quantile,
        "interval_coverage": q_interval_coverage,
        "seasonal_profile_hourly": q_seasonal_profile_hourly,
        "seasonal_anomaly_counts": q_seasonal_anomaly_counts,
        "event_transition_matrix": q_event_transition_matrix,
        "funnel_conversion": q_funnel_conversion,
        "cohort_retention_weekly": q_cohort_retention_weekly,
        "funnel_step_timing": q_funnel_step_timing,
        "top_event_users_daily": q_top_event_users_daily,
        "pop_wow_daily": q_pop_wow_daily,
        "threshold_alert_episodes": q_threshold_alert_episodes,
        "chunks_range_decode": q_chunks_range_decode,
        "snapshot_time_travel": q_snapshot_time_travel,
        "snapshot_pruned_read": q_snapshot_pruned_read,
        "forecast_backtest_daily": q_forecast_backtest_daily,
        "value_drift_events": q_value_drift_events,
        "asof_interpolated_join": q_asof_interpolated_join,
        "series_correlation_daily": q_series_correlation_daily,
        "autocorrelation_daily": q_autocorrelation_daily,
        "leadlag_correlation_daily": q_leadlag_correlation_daily,
        "ohlc_vwap_hourly": q_ohlc_vwap_hourly,
        "state_durations_hourly": q_state_durations_hourly,
        "rolling_median_daily": q_rolling_median_daily,
        "gap_report_users": q_gap_report_users,
        "holt_winters_weekly": q_holt_winters_weekly,
        "sax_daily_symbols": q_sax_daily_symbols,
        "sax_motif_top": q_sax_motif_top,
        "diversity_daily": q_diversity_daily,
        "bollinger_daily": q_bollinger_daily,
        "domain_cap_docs": q_domain_cap_docs,
        "dimensional_cube": q_dimensional_cube,
        "bm25_search_docs": q_bm25_search_docs,
        "blackout_rollup": q_blackout_rollup,
        "stride_decimate": q_stride_decimate,
        "cascade_daily_bars": q_cascade_daily_bars,
        "latest_per_user": q_latest_per_user,
        "slo_burn_hourly": q_slo_burn_hourly,
        "normalize_events": q_normalize_events,
        "doc_len_quartiles": q_doc_len_quartiles,
        "wau_trailing_7d": q_wau_trailing_7d,
        "mad_robust_daily": q_mad_robust_daily,
        "trimmed_mean_daily": q_trimmed_mean_daily,
        "theilsen_daily_slope": q_theilsen_daily_slope,
        "spearman_daily_corr": q_spearman_daily_corr,
        "seasonal_decompose_daily": q_seasonal_decompose_daily,
        "chunk_overlap_docs": q_chunk_overlap_docs,
        "snapshot_zorder_read": q_snapshot_zorder_read,
        "snapshot_bloom_read": q_snapshot_bloom_read,
        "weighted_sample_docs": q_weighted_sample_docs,
        "cms_merge_weekly": q_cms_merge_weekly,
        "edit1_typo_pairs_docs": q_edit1_typo_pairs_docs,
        "ranking_agreement_metrics": q_ranking_agreement_metrics,
        "rolling_corr_daily": q_rolling_corr_daily,
        "chunk_containment_docs": q_chunk_containment_docs,
        "savgol_daily_smooth": q_savgol_daily_smooth,
        "transition_dates_yearly": q_transition_dates_yearly,
        "vocab_growth_docs": q_vocab_growth_docs,
        "postings_index_docs": q_postings_index_docs,
        "cosine_pairs_docs": q_cosine_pairs_docs,
        "sequence_trigrams": q_sequence_trigrams,
        "weighted_percentiles_daily": q_weighted_percentiles_daily,
        "assemble_conversations": q_assemble_conversations,
        "pagerank_suppliers": q_pagerank_suppliers,
        "triangle_counts_users": q_triangle_counts_users,
        "bfs_blast_radius": q_bfs_blast_radius,
        "hll_distinct_daily": q_hll_distinct_daily,
        "hll_merge_weekly": q_hll_merge_weekly,
        "unigram_freq_score_docs": q_unigram_freq_score_docs,
        "hybrid_search_rrf": q_hybrid_search_rrf,
        "cms_heavy_hitters_docs": q_cms_heavy_hitters_docs,
        "bottomk_distinct_users": q_bottomk_distinct_users,
        "dtw_event_type_daily": q_dtw_event_type_daily,
        "bpe_merges_docs": q_bpe_merges_docs,
        "bpe_token_counts_docs": q_bpe_token_counts_docs,
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: gap-filled hourly continuous aggregate at sf0.001."""
    return q_hourly_rollup_gapfill(spark, "/root/testdata/sf0.001")


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

# v_mean/v_std from EXACT integer cent moments, UNROUNDED (pinned: one
# divide per stat, sqrt of an exact integer) — round(avg(double), 6) is
# a cross-engine coin flip whenever the group mean lands on the
# cents/n grid exactly midway at the 6th decimal (hit at sf0.1:
# signup@2024-01-18T22 mean 43.4728125, n=32). Percentile/min/max
# decimal expansions terminate far above the 6th digit -> still safe
# to round. Spark twin: rollup_series(value_scale=100).
_ROLLUP_STATS = """
        count(value) AS n,
        CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS DOUBLE)
          / (100.0 * CAST(count(value) AS DOUBLE)) AS v_mean,
        sqrt(CAST(count(value) * sum(CAST(floor(value * 100) AS BIGINT)
                                     * CAST(floor(value * 100) AS BIGINT))
                  - sum(CAST(floor(value * 100) AS BIGINT))
                    * sum(CAST(floor(value * 100) AS BIGINT)) AS DOUBLE))
          / (100.0 * CAST(count(value) AS DOUBLE)) AS v_std,
        round(min(value), 6) AS v_min,
        round(max(value), 6) AS v_max,
        round(quantile_cont(value, 0.5), 6) AS v_50,
        round(quantile_cont(value, 0.75), 6) AS v_75,
        round(quantile_cont(value, 0.9), 6) AS v_90
"""


# exact cosine top-k oracle, shared by ann_cosine_topk and ivf_topk (the
# IVF query probes every centroid, so its contract is exact-search parity)
def _bm25_scored_ctes(terms: tuple[str, ...] = ("spark", "stream", "vector")) -> str:
    """The ONE BM25 oracle CTE block (tokenize -> doclen/stats -> hits ->
    df -> per-term scores -> order-pinned per-doc score), shared by the
    bm25_search_docs and hybrid_search_rrf oracles so the conventions
    (k1/b, idf, rounding, tokenization) can never diverge between them."""
    in_list = ", ".join(f"'{t}'" for t in terms)
    per_term = "\n        + ".join(
        f"coalesce(sum(CASE WHEN term = '{t}' THEN sc END), 0.0)" for t in terms
    )
    return f"""words AS (
  SELECT doc_id AS id,
    unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
  FROM documents
), w2 AS (
  SELECT * FROM words WHERE length(term) >= 1
), doclen AS (
  SELECT id, count(*) AS dl FROM w2 GROUP BY 1
), stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avglen
  FROM doclen
), hits AS (
  SELECT id, term, count(*) AS tf FROM w2
  WHERE term IN ({in_list}) GROUP BY 1, 2
), dfv AS (
  SELECT term, count(*) AS df FROM hits GROUP BY 1
), ts AS (
  SELECT h.id, d.dl, h.term, h.tf,
    ln(1.0 + (s.n - CAST(f.df AS DOUBLE) + 0.5) / (CAST(f.df AS DOUBLE) + 0.5))
      * (CAST(h.tf AS DOUBLE) * 2.2)
      / (CAST(h.tf AS DOUBLE)
         + 1.2 * (0.25 + 0.75 * CAST(d.dl AS DOUBLE) / s.avglen)) AS sc
  FROM hits h
  JOIN dfv f USING (term)
  JOIN doclen d ON d.id = h.id
  CROSS JOIN stats s
), per_doc AS (
  SELECT id, dl,
    round({per_term}, 6) AS score,
    count(*) AS n_terms_hit,
    CAST(sum(tf) AS BIGINT) AS tf_total
  FROM ts GROUP BY 1, 2
)"""


def _cosine_to_query_cte(query_vec_id: int = 0) -> str:
    """The exact-cosine-leg oracle CTEs (query vector -> rounded
    fold-ordered similarity, self excluded) — the _EXACT_TOPK_ORACLE
    formula, shared with the hybrid fusion oracle."""
    return f"""qv AS (
  SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = {query_vec_id}
), cos AS (
  SELECT e.vec_id AS doc_id,
    round(list_dot_product(q.v, CAST(e.embedding AS DOUBLE[]))
      / (sqrt(list_dot_product(q.v, q.v))
         * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                 CAST(e.embedding AS DOUBLE[])))), 6) AS cs
  FROM embeddings e CROSS JOIN qv q WHERE e.vec_id <> {query_vec_id}
)"""


_EXACT_TOPK_ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id IN (0, 1, 2)
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_dot_product(q.qv, CAST(e.embedding AS DOUBLE[]))
           / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS cs
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, round(cs, 6) AS cos_sim,
         -- rank by the ROUNDED similarity, like the engine: ranking the raw
         -- value would order rounding-tie pairs differently
         row_number() OVER (PARTITION BY query_id ORDER BY round(cs, 6) DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""


def _ann_lsh_oracle_sql(dim: int = 64, num_planes: int = 10, seed: int = 7, k: int = 5) -> str:
    """Oracle for q_ann_lsh_topk: inlines the identical plan-time md5
    hyperplane constants (similarity.hyperplane_components) and
    recomputes sign-pattern buckets, Hamming-1 multi-probe, candidate
    join and cosine re-rank entirely in DuckDB."""
    from python_vegindex_spark.operators.similarity import hyperplane_components

    plane_rows = ",\n    ".join(
        "({}, {}::DOUBLE[])".format(
            h, "[" + ", ".join(repr(c) for c in hyperplane_components(dim, h, seed)) + "]"
        )
        for h in range(num_planes)
    )
    return f"""
WITH planes(h, p) AS (VALUES
    {plane_rows}
),
vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
buckets AS (
  SELECT vec_id, v,
         sum(CASE WHEN list_dot_product(v, p) >= 0 THEN 1::BIGINT << h ELSE 0 END)::BIGINT AS bucket
  FROM vecs CROSS JOIN planes GROUP BY vec_id, v
),
probes AS (
  SELECT b.vec_id AS query_id, b.v AS qv,
         CASE WHEN t.i < 0 THEN b.bucket
              ELSE xor(b.bucket, 1::BIGINT << t.i) END AS bucket
  FROM buckets b CROSS JOIN (SELECT unnest(generate_series(-1, {num_planes - 1})) AS i) t
  WHERE b.vec_id IN (0, 1, 2)
),
cand AS (
  SELECT DISTINCT p.query_id, p.qv, c.vec_id AS neighbor_id, c.v AS cv
  FROM probes p JOIN buckets c ON c.bucket = p.bucket
  WHERE c.vec_id <> p.query_id
),
scored AS (
  SELECT query_id, neighbor_id,
         round(list_dot_product(qv, cv)
           / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cos_sim
  FROM cand
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
"""


def _media_oracle_sql(n: int = 300) -> str:
    """Oracle for q_media_stub_features: an independent single-node
    recomputation (hashlib + numpy, zero Spark) of every expected decode
    feature from synth_media's reproducible (kind, payload), inlined as
    literals. Verifies the distributed mapInPandas decode stage
    row-for-row; DuckDB only applies the final rounding."""
    import hashlib

    import numpy as np

    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = hashlib.sha256(f"payload{i}".encode()).hexdigest().encode()
        digest = hashlib.sha256(payload).digest()
        rng = np.random.default_rng(int.from_bytes(digest[:8], "big") % (2**32))
        arr = rng.random({"image": 64, "audio": 128, "video": 96}[kind], dtype=np.float64)
        rows.append(f"({i}, '{kind}', {float(arr.mean())!r})")
    values = ",\n    ".join(rows)
    return f"""
WITH expected(media_id, kind, feat_mean_raw) AS (VALUES
    {values}
)
SELECT CAST(media_id AS BIGINT) AS media_id, kind,
       round(feat_mean_raw, 6) AS feat_mean
FROM expected ORDER BY media_id
"""


# shared CTE for the decontamination oracles: word 4-grams of the
# doc_id%50==0 eval split (bg, keyed by both md5 halves) and the
# distinct per-doc 8-grams of the remaining corpus (dgc, with doc_grams)
_DECONTAM_GRAMS_CTE = r"""
WITH corpus AS (SELECT * FROM documents WHERE doc_id % 50 <> 0),
bench AS (SELECT * FROM documents WHERE doc_id % 50 = 0),
bg AS (
  SELECT DISTINCT
    cast(concat('0x', substr(md5(g), 1, 8)) AS BIGINT) AS gk1,
    cast(concat('0x', substr(md5(g), 9, 8)) AS BIGINT) AS gk2
  FROM (
    SELECT unnest(list_transform(range(1, len(w) - 2),
                  i -> array_to_string(w[i:i+3], ' '))) AS g
    FROM (SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS w
          FROM bench)
    WHERE len(w) >= 4
  )
),
dg AS (
  SELECT DISTINCT doc_id, g
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - 2),
                  i -> array_to_string(w[i:i+3], ' '))) AS g
    FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
          FROM corpus)
    WHERE len(w) >= 4
  )
),
dgc AS (
  SELECT doc_id, count(*) OVER (PARTITION BY doc_id) AS doc_grams,
         cast(concat('0x', substr(md5(g), 1, 8)) AS BIGINT) AS gk1,
         cast(concat('0x', substr(md5(g), 9, 8)) AS BIGINT) AS gk2
  FROM dg
)
"""


def _hll_base_ctes(b: int) -> str:
    """Shared HLL oracle CTEs: day-keyed register table built from the
    identical md5-prefix hash and the SAME generated rho CASE chain the
    engine uses (operators/sketches.rho_sql — one definition, two
    engines)."""
    from python_vegindex_spark.operators.sketches import HASH_BITS, rho_sql

    wbits = HASH_BITS - b
    return f"""
keyed AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), rw AS (
  SELECT day, week, h >> {wbits} AS bucket,
         h & ((1::BIGINT << {wbits}) - 1) AS w
  FROM keyed
), rhos AS (
  SELECT day, week, bucket, {rho_sql('w', wbits)} AS rho FROM rw
)"""


def _hll_est_select(group: str, b: int, from_cte: str | None = None) -> str:
    """Per-group (n_zero, s_scaled, est_raw) projection over the
    register CTE ``from_cte`` (default ``regs_{group}``) — numerator
    literal shared with the engine via hll_estimate_numerator."""
    from python_vegindex_spark.operators.sketches import (
        HASH_BITS,
        hll_estimate_numerator,
    )

    m = 1 << b
    K = HASH_BITS - b + 1
    num = hll_estimate_numerator(b)
    src = from_cte or f"regs_{group}"
    return f"""
  SELECT {group}, CAST({m} - count(*) AS INT) AS n_zero,
    CAST(sum(1::BIGINT << ({K} - reg)) + ({m} - count(*)) * (1::BIGINT << {K}) AS BIGINT) AS s_scaled,
    {num} / CAST(sum(1::BIGINT << ({K} - reg)) + ({m} - count(*)) * (1::BIGINT << {K}) AS DOUBLE) AS est_raw
  FROM {src} GROUP BY 1"""


def _hll_distinct_daily_oracle(b: int = 5) -> str:
    m = 1 << b
    return f"""
WITH {_hll_base_ctes(b)},
regs_day AS (
  SELECT day, bucket, max(rho) AS reg FROM rhos GROUP BY 1, 2
), est AS ({_hll_est_select('day', b)}
), ex AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL GROUP BY 1
)
SELECT est.day, {m} AS m, n_zero, s_scaled, est_raw, exact_distinct
FROM est JOIN ex USING (day) ORDER BY day
"""


def _hll_merge_weekly_oracle(b: int = 5) -> str:
    return f"""
WITH {_hll_base_ctes(b)},
regs_daily AS (
  SELECT day, week, bucket, max(rho) AS reg FROM rhos GROUP BY 1, 2, 3
), regs_merged AS (
  SELECT week, bucket, max(reg) AS reg FROM regs_daily GROUP BY 1, 2
), regs_week AS (
  SELECT week, bucket, max(rho) AS reg FROM rhos GROUP BY 1, 2
), est_m AS (
  SELECT week, s_scaled AS s_merged, est_raw AS est_merged FROM (
  {_hll_est_select('week', b, from_cte='regs_merged')}
  ) t
), est_d AS (
  SELECT week, s_scaled AS s_direct FROM ({_hll_est_select('week', b)}) t
)
SELECT est_m.week, s_merged, est_merged, s_direct,
       s_merged = s_direct AS merged_eq_direct
FROM est_m JOIN est_d USING (week) ORDER BY week
"""


def _bpe_oracle_sql(n_merges: int = 12) -> str:
    """BPE-trainer oracle: the identical data-dependent loop unrolled —
    per step, pair counts over the vocab state, the argmax under
    (count DESC, left, right), and the greedy single-pass replace —
    all generated from one Python loop so engine and oracle share the
    conventions (overlap counting, tie-break, sentinel spacing)."""
    steps = []
    for k in range(1, n_merges + 1):
        prev = f"s{k - 1}"
        steps.append(
            f"""p{k} AS MATERIALIZED (
  SELECT p[1] AS l, p[2] AS r, CAST(sum(freq) AS BIGINT) AS pair_count
  FROM (
    SELECT unnest(list_zip(syms, syms[2:])) AS p, freq FROM (
      SELECT list_filter(string_split(seq, ' '), x -> x != '') AS syms, freq
      FROM {prev}
    )
  ) WHERE p[2] IS NOT NULL
  GROUP BY 1, 2
), b{k} AS MATERIALIZED (
  SELECT l, r, pair_count FROM p{k}
  ORDER BY pair_count DESC, l ASC, r ASC LIMIT 1
), s{k} AS MATERIALIZED (
  -- greedy merge via the space-doubling replace (operators/bpe docstring)
  SELECT replace(
           replace(replace(seq, ' ', '  '),
                   ' ' || b.l || '  ' || b.r || ' ',
                   ' ' || b.l || b.r || ' '),
           '  ', ' ') AS seq,
         freq
  FROM {prev} CROSS JOIN b{k} b
)"""
        )
    finals = " UNION ALL ".join(
        f'SELECT {k} AS step, l AS "left", r AS "right", l || r AS merged, pair_count FROM b{k}'
        for k in range(1, n_merges + 1)
    )
    return f"""
WITH wf AS MATERIALIZED (
  SELECT word, count(*) AS freq FROM (
    SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
    FROM documents
  ) WHERE regexp_matches(word, '^[a-z0-9]+$')
  GROUP BY 1
), s0 AS MATERIALIZED (
  SELECT concat(' ', regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq, freq
  FROM wf
), {", ".join(steps)}
SELECT CAST(step AS INT) AS step, "left", "right", merged, pair_count
FROM ({finals}) ORDER BY step
"""


def _bpe_apply_oracle_sql(n_merges: int = 12) -> str:
    """Train-then-apply oracle: the _bpe_oracle_sql training CTEs, then
    every document word replayed through the learned merges (scalar
    subqueries into the b_k stages — the same data-dependent values),
    split to tokens and aggregated per doc with the modded md5-prefix
    checksum."""
    train = _bpe_oracle_sql(n_merges)
    # reuse the WITH ... prefix of the training oracle, drop its final SELECT
    prefix = train[: train.rindex("SELECT CAST(step AS INT)")]
    seq = ("CASE WHEN regexp_matches(word, '^[a-z0-9]+$') "
           "THEN concat(' ', regexp_replace(word, '(.)', '\\1 ', 'g')) "
           "ELSE concat(' ', word, ' ') END")
    for k in range(1, n_merges + 1):
        # coalesce to an impossible needle (uppercase never occurs in
        # [a-z0-9] symbols) so an early-exhausted training run leaves
        # later steps as no-ops instead of NULL-poisoning the chain;
        # greedy merge via the space-doubling replace
        l_k = f"coalesce((SELECT l FROM b{k}), 'Z')"
        r_k = f"coalesce((SELECT r FROM b{k}), 'Z')"
        seq = (f"replace(replace(replace({seq}, ' ', '  '), "
               f"' ' || {l_k} || '  ' || {r_k} || ' ', "
               f"' ' || {l_k} || {r_k} || ' '), '  ', ' ')")
    return f"""{prefix.rstrip()}, docwords AS (
  SELECT doc_id, word FROM (
    SELECT doc_id,
      unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
    FROM documents
  ) WHERE word != ''
), toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split({seq}, ' ')) AS tok FROM docwords
  ) WHERE tok != ''
)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_bpe_tokens,
  CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct_tokens,
  CAST(sum(CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) % {1 << 40}) AS BIGINT) AS token_checksum
FROM toks GROUP BY 1 ORDER BY doc_id
"""


def _dtw_oracle_sql(max_len: int = 30) -> str:
    """DTW oracle: the exact integer DP unrolled as an anti-diagonal
    wave-CTE chain — wave k computes cells with i+j = k from waves k-1
    ((i-1,j), (i,j-1)) and k-2 ((i-1,j-1)); all-BIGINT. The unroll
    depth 2*max_len matches the query's deterministic 30-point clamp,
    so the chain covers every reachable cell at any scale factor."""
    waves = []
    for k in range(3, 2 * max_len + 1):
        prev2 = f"SELECT * FROM w{k - 2}" if k > 3 else "SELECT * FROM w2 WHERE FALSE"
        waves.append(
            f"""w{k} AS MATERIALIZED (
  SELECT c.sa, c.sb, c.i, c.j, CAST(c.cost + min(p.c) AS BIGINT) AS c
  FROM cells c JOIN (SELECT * FROM w{k - 1} UNION ALL {prev2}) p
    ON p.sa = c.sa AND p.sb = c.sb
    AND ((p.i = c.i - 1 AND p.j = c.j) OR (p.i = c.i AND p.j = c.j - 1)
         OR (p.i = c.i - 1 AND p.j = c.j - 1))
  WHERE c.i + c.j = {k}
  GROUP BY c.sa, c.sb, c.i, c.j, c.cost
)"""
        )
    all_waves = " UNION ALL ".join(
        f"SELECT * FROM w{k}" for k in range(2, 2 * max_len + 1)
    )
    return f"""
WITH daily AS MATERIALIZED (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1, 2
), idxed AS (
  SELECT event_type,
    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS INT) AS idx,
    v
  FROM daily QUALIFY idx <= {max_len}
), pr AS (
  SELECT a.event_type AS sa, b.event_type AS sb
  FROM (SELECT DISTINCT event_type FROM idxed) a
  JOIN (SELECT DISTINCT event_type FROM idxed) b ON a.event_type < b.event_type
), cells AS MATERIALIZED (
  SELECT p.sa, p.sb, ia.idx AS i, ib.idx AS j, abs(ia.v - ib.v) AS cost
  FROM pr p
  JOIN idxed ia ON ia.event_type = p.sa
  JOIN idxed ib ON ib.event_type = p.sb
), dims AS (
  SELECT sa, sb, max(i) AS n, max(j) AS m FROM cells GROUP BY 1, 2
), w2 AS (
  SELECT sa, sb, i, j, CAST(cost AS BIGINT) AS c FROM cells WHERE i = 1 AND j = 1
), {", ".join(waves)}
SELECT d.sa AS series_a, d.sb AS series_b,
  CAST(d.n AS INT) AS n_a, CAST(d.m AS INT) AS n_b, f.c AS dtw_dist
FROM dims d JOIN ({all_waves}) f
  ON f.sa = d.sa AND f.sb = d.sb AND f.i = d.n AND f.j = d.m
ORDER BY 1, 2
"""


def _cms_heavy_hitters_oracle(depth: int = 4, width: int = 1024) -> str:
    """CMS oracle: identical md5-prefix salted hashing (row index ':'
    key), counter build, and min-of-counters probe — all integer."""
    return f"""
WITH words AS (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
  FROM documents
), w2 AS (
  SELECT term FROM words WHERE length(term) >= 1
), counters AS (
  SELECT t.i AS row_idx,
    CAST(concat('0x', substr(md5(concat(CAST(t.i AS VARCHAR), ':', term)), 1, 15)) AS BIGINT) % {width} AS col_idx,
    count(*) AS counter
  FROM w2 CROSS JOIN (SELECT unnest(range({depth})) AS i) t
  GROUP BY 1, 2
), top AS (
  SELECT term, count(*) AS exact_tf FROM w2 GROUP BY 1
  ORDER BY exact_tf DESC, term ASC LIMIT 20
), probes AS (
  SELECT top.term, top.exact_tf, t.i AS row_idx,
    CAST(concat('0x', substr(md5(concat(CAST(t.i AS VARCHAR), ':', top.term)), 1, 15)) AS BIGINT) % {width} AS col_idx
  FROM top CROSS JOIN (SELECT unnest(range({depth})) AS i) t
), est AS (
  SELECT p.term, p.exact_tf,
    CAST(min(coalesce(c.counter, 0)) AS BIGINT) AS cms_est
  FROM probes p LEFT JOIN counters c USING (row_idx, col_idx)
  GROUP BY 1, 2
)
SELECT term, CAST(exact_tf AS BIGINT) AS exact_tf, cms_est,
  cms_est - exact_tf AS overestimate,
  cms_est >= exact_tf AS one_sided_ok
FROM est ORDER BY exact_tf DESC, term ASC
"""


def _bottomk_distinct_oracle(k: int = 64) -> str:
    from python_vegindex_spark.operators.sketches import HASH_BITS

    num = repr(float((k - 1) * (2**HASH_BITS)))
    return f"""
WITH keyed AS (
  SELECT DISTINCT event_type, user_id AS key FROM events
  WHERE user_id IS NOT NULL
), hashed AS (
  SELECT event_type, key,
    CAST(concat('0x', substr(md5(CAST(key AS VARCHAR)), 1, 15)) AS BIGINT) AS h60
  FROM keyed
), ranked AS (
  SELECT event_type, h60,
    row_number() OVER (PARTITION BY event_type ORDER BY h60 ASC, key ASC) AS rank
  FROM hashed
), sample AS (
  SELECT * FROM ranked WHERE rank <= {k}
), est AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_sampled,
    max(CASE WHEN rank = {k} THEN h60 END) AS hk
  FROM sample GROUP BY 1
), ex AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
)
SELECT est.event_type, n_sampled,
  CASE WHEN hk IS NOT NULL THEN {num} / CAST(hk AS DOUBLE)
       ELSE CAST(n_sampled AS DOUBLE) END AS est_distinct,
  exact_distinct
FROM est JOIN ex USING (event_type) ORDER BY event_type
"""


def _bfs_oracle_sql(depth: int = 3) -> str:
    """Oracle for q_bfs_blast_radius: the co-occurrence projection
    (same CTEs as triangle_counts_users) + `depth` unrolled min-plus
    relaxation rounds — exact distances <= depth, all-integer."""
    parts = [
        """
WITH m AS (
  SELECT DISTINCT CAST(user_id AS VARCHAR) AS node, event_type,
         date_trunc('minute', ts) AS b
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), sz AS (
  SELECT event_type, b FROM m GROUP BY 1, 2 HAVING count(*) <= 50
), cool AS (
  SELECT m.* FROM m JOIN sz USING (event_type, b)
), e AS (
  SELECT DISTINCT least(a.node, c.node) AS a, greatest(a.node, c.node) AS b
  FROM cool a JOIN cool c
    ON a.event_type = c.event_type AND a.b = c.b AND a.node < c.node
), sym AS (
  SELECT a AS src, b AS dst FROM e UNION SELECT b, a FROM e
), d0 AS (
  SELECT DISTINCT CAST(user_id AS VARCHAR) AS node, CAST(0 AS BIGINT) AS dist
  FROM events WHERE user_id IS NOT NULL AND user_id % 13 = 0
)"""
    ]
    for i in range(1, depth + 1):
        parts.append(
            f""", d{i} AS (
  SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
    SELECT s.dst AS node, d.dist + 1 AS dist
    FROM sym s JOIN d{i - 1} d ON s.src = d.node
    UNION ALL SELECT node, dist FROM d{i - 1}
  ) GROUP BY 1
)"""
        )
    parts.append(f"\nSELECT node, dist FROM d{depth} ORDER BY node\n")
    return "".join(parts)


def _pagerank_oracle_sql(
    iters: int = 3,
    d_num: int = 85,
    d_den: int = 100,
    scale: int = 10**12,
    k: int = 50,
) -> str:
    """Oracle for q_pagerank_suppliers: the SAME integer fixpoint
    UNROLLED into chained CTEs (DuckDB disallows aggregates in a
    recursive term, and unrolling keeps every iteration a plain
    join + GROUP BY). All operands non-negative, so `//` (floor)
    matches Spark's `div` (truncate) exactly."""
    base = f"(({d_den - d_num}) * ({scale} // p.n)) // {d_den}"
    parts = [
        """
WITH e AS (
  SELECT 'S' || CAST(l_suppkey AS VARCHAR) AS src,
         'C' || CAST(o_custkey AS VARCHAR) AS dst,
         CAST(count(*) AS BIGINT) AS w
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
), outw AS (
  SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM e GROUP BY 1
), ew AS (
  SELECT e.src, e.dst, e.w, o.outw FROM e JOIN outw o USING (src)
), nodes AS (
  SELECT DISTINCT src AS node FROM e
  UNION
  SELECT DISTINCT dst FROM e
), params AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM nodes
), r0 AS (
  SELECT node, CAST(%d // p.n AS BIGINT) AS rank_q FROM nodes, params p
)""" % scale
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""", c{i} AS (
  SELECT ew.dst AS node,
         CAST(sum((r.rank_q * ew.w) // ew.outw) AS BIGINT) AS inflow
  FROM ew JOIN r{i - 1} r ON ew.src = r.node GROUP BY 1
), r{i} AS (
  SELECT nodes.node,
         CAST({base} + ({d_num} * coalesce(c{i}.inflow, 0)) // {d_den}
              AS BIGINT) AS rank_q
  FROM nodes LEFT JOIN c{i} USING (node), params p
)"""
        )
    parts.append(
        f"""
SELECT node, rank_q FROM r{iters}
ORDER BY rank_q DESC, node ASC LIMIT {k}
"""
    )
    return "".join(parts)


def oracle_sql() -> dict[str, str]:
    return {
        "hourly_rollup_gapfill": f"""
WITH base AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_start, value FROM events
), agg AS (
  SELECT event_type, bucket_start, {_ROLLUP_STATS}
  FROM base GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(bucket_start) AS mn, max(bucket_start) AS mx FROM base GROUP BY 1
), spine AS (
  SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket_start FROM bounds
)
SELECT s.event_type, s.bucket_start,
       coalesce(a.n, 0) AS n, a.v_mean, a.v_std, a.v_min, a.v_max, a.v_50, a.v_75, a.v_90
FROM spine s LEFT JOIN agg a USING (event_type, bucket_start)
ORDER BY 1, 2
""",
        "multitier_rollup": f"""
WITH tiers AS (
  SELECT event_type, 'hourly' AS tier, date_trunc('hour', ts) AS bucket_start, value FROM events
  UNION ALL
  SELECT event_type, 'daily', date_trunc('day', ts), value FROM events
  UNION ALL
  SELECT event_type, 'weekly',
         date_trunc('year', ts) + CAST(floor((dayofyear(ts) - 1) / 7) * 7 AS INT) * INTERVAL 1 DAY,
         value
  FROM events
), agg AS (
  SELECT event_type, tier, bucket_start, {_ROLLUP_STATS}
  FROM tiers GROUP BY 1, 2, 3
), bounds AS (
  SELECT event_type, tier, min(bucket_start) AS mn, max(bucket_start) AS mx
  FROM tiers GROUP BY 1, 2
), spine AS (
  SELECT event_type, tier, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket_start
  FROM bounds WHERE tier = 'hourly'
  UNION ALL
  SELECT event_type, tier, unnest(generate_series(mn, mx, INTERVAL 1 DAY))
  FROM bounds WHERE tier = 'daily'
  UNION ALL
  SELECT event_type, tier, d FROM (
    SELECT event_type, tier, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS d
    FROM bounds WHERE tier = 'weekly'
  ) WHERE (dayofyear(d) - 1) % 7 = 0
)
SELECT s.event_type, s.tier, s.bucket_start, coalesce(a.n, 0) AS n,
       CASE WHEN a.n >= 2 THEN a.v_mean END AS v_mean,
       CASE WHEN a.n >= 2 THEN a.v_std END AS v_std,
       CASE WHEN a.n >= 2 THEN a.v_min END AS v_min,
       CASE WHEN a.n >= 2 THEN a.v_max END AS v_max,
       CASE WHEN a.n >= 2 THEN a.v_50 END AS v_50,
       CASE WHEN a.n >= 2 THEN a.v_75 END AS v_75,
       CASE WHEN a.n >= 2 THEN a.v_90 END AS v_90
FROM spine s LEFT JOIN agg a USING (event_type, tier, bucket_start)
ORDER BY 1, 2, 3
""",
        # raw -> weekly computed DIRECTLY (the engine goes raw -> hourly
        # -> weekly), same integer moments, same pinned double finish
        "cascade_weekly_from_hourly": """
WITH base AS (
  SELECT event_type,
         date_trunc('year', ts)
           + CAST(floor((dayofyear(ts) - 1) / 7) * 7 AS INT) * INTERVAL 1 DAY
           AS bucket_start,
         CAST(floor(value * 100) AS BIGINT) AS y
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
), mom AS (
  SELECT event_type, bucket_start,
         count(*) AS n,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(min(y) AS BIGINT) AS v_min,
         CAST(max(y) AS BIGINT) AS v_max
  FROM base GROUP BY 1, 2
)
SELECT event_type, CAST(bucket_start AS TIMESTAMP) AS bucket_start, n,
  CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS v_mean,
  sqrt(greatest(
    CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
      - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)),
    0.0)) AS v_std,
  v_min, v_max
FROM mom ORDER BY 1, 2
""",
        # raw binned DIRECTLY at weekly grain (the engine sums hourly
        # bins into weekly), same integer counts, same interpolation
        "cascade_histogram_p90": """
WITH hm AS (
  SELECT event_type,
    date_trunc('year', ts)
      + CAST(floor((dayofyear(ts) - 1) / 7) * 7 AS INT) * INTERVAL 1 DAY
      AS bucket_start,
    CAST(floor(value / 50.0) AS BIGINT) AS v_bin, count(*) AS n
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value) AND ts IS NOT NULL
  GROUP BY 1, 2, 3
), c AS (
  SELECT event_type, bucket_start, v_bin,
    CAST(n AS DOUBLE) AS nd,
    CAST(sum(n) OVER (PARTITION BY event_type, bucket_start
                      ORDER BY v_bin) AS DOUBLE) AS cum,
    CAST(sum(n) OVER (PARTITION BY event_type, bucket_start) AS DOUBLE) AS total
  FROM hm
)
SELECT event_type, CAST(bucket_start AS TIMESTAMP) AS bucket_start,
  CAST(total AS BIGINT) AS total_n, CAST(0.9 AS DOUBLE) AS q,
  round(CAST(v_bin AS DOUBLE) * 50.0
        + 50.0 * (CAST(0.9 AS DOUBLE) * total - (cum - nd)) / nd, 6) AS est
FROM c
WHERE (cum - nd) < CAST(0.9 AS DOUBLE) * total
  AND CAST(0.9 AS DOUBLE) * total <= cum
ORDER BY 1, 2
""",
        # the CUSUM recursion walked row-by-row in a RECURSIVE CTE; z,
        # S+, S- evaluated in the engine's exact pinned float order
        # (integer daily sums -> mu/sd from BIGINT moments -> IEEE ops)
        "cusum_daily_changepoints": """
WITH RECURSIVE base AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value) AND ts IS NOT NULL
  GROUP BY 1, 2
), rnk AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY bucket_start) AS rn
  FROM base
), mom AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sy, CAST(sum(x * x) AS BIGINT) AS syy
  FROM rnk GROUP BY 1
), prep AS (
  SELECT r.event_type, r.rn, r.bucket_start, r.x,
         CAST(m.sy AS DOUBLE) / m.n AS mu,
         sqrt(greatest(CAST(m.syy AS DOUBLE) / m.n
              - (CAST(m.sy AS DOUBLE) / m.n) * (CAST(m.sy AS DOUBLE) / m.n),
              0.0)) AS sd
  FROM rnk r JOIN mom m USING (event_type)
), walk AS (
  SELECT event_type, rn, bucket_start, x,
    greatest(0.0, (CASE WHEN sd = 0 THEN 0.0
                        ELSE (CAST(x AS DOUBLE) - mu) / sd END) - 0.25) AS s_pos,
    greatest(0.0, -(CASE WHEN sd = 0 THEN 0.0
                         ELSE (CAST(x AS DOUBLE) - mu) / sd END) - 0.25) AS s_neg,
    0 AS ep_prev
  FROM prep WHERE rn = 1
  UNION ALL
  SELECT p.event_type, p.rn, p.bucket_start, p.x,
    greatest(0.0,
      (CASE WHEN w.s_pos > 3.0 OR w.s_neg > 3.0 THEN 0.0 ELSE w.s_pos END)
      + (CASE WHEN p.sd = 0 THEN 0.0
              ELSE (CAST(p.x AS DOUBLE) - p.mu) / p.sd END) - 0.25),
    greatest(0.0,
      (CASE WHEN w.s_pos > 3.0 OR w.s_neg > 3.0 THEN 0.0 ELSE w.s_neg END)
      - (CASE WHEN p.sd = 0 THEN 0.0
              ELSE (CAST(p.x AS DOUBLE) - p.mu) / p.sd END) - 0.25),
    w.ep_prev + CASE WHEN w.s_pos > 3.0 OR w.s_neg > 3.0 THEN 1 ELSE 0 END
  FROM walk w
  JOIN prep p ON p.event_type = w.event_type AND p.rn = w.rn + 1
)
SELECT event_type, bucket_start, x,
       round(s_pos, 6) AS s_pos, round(s_neg, 6) AS s_neg,
       (s_pos > 3.0 OR s_neg > 3.0) AS alarm,
       ep_prev + CASE WHEN s_pos > 3.0 OR s_neg > 3.0 THEN 1 ELSE 0 END AS episode
FROM walk ORDER BY 1, 2
""",
        # Holt level/trend recursion in a RECURSIVE CTE; the 1-alpha /
        # 1-beta literals below are repr() of the Python-computed
        # values holt_smooth uses, so both engines multiply by the
        # bit-identical double
        "holt_daily_smooth": f"""
WITH RECURSIVE base AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value) AND ts IS NOT NULL
  GROUP BY 1, 2
), rnk AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY bucket_start) AS rn,
         lead(x) OVER (PARTITION BY event_type ORDER BY bucket_start) AS x_next
  FROM base
), walk AS (
  SELECT event_type, rn, bucket_start, x,
         CAST(x AS DOUBLE) AS level,
         CASE WHEN x_next IS NULL THEN 0.0
              ELSE CAST(x_next - x AS DOUBLE) END AS trend,
         CAST(NULL AS DOUBLE) AS fitted
  FROM rnk WHERE rn = 1
  UNION ALL
  SELECT p.event_type, p.rn, p.bucket_start, p.x,
    {0.3!r} * CAST(p.x AS DOUBLE) + {1.0 - 0.3!r} * (w.level + w.trend),
    {0.1!r} * (({0.3!r} * CAST(p.x AS DOUBLE)
                + {1.0 - 0.3!r} * (w.level + w.trend)) - w.level)
      + {1.0 - 0.1!r} * w.trend,
    w.level + w.trend
  FROM walk w
  JOIN rnk p ON p.event_type = w.event_type AND p.rn = w.rn + 1
)
SELECT event_type, bucket_start, x,
       round(level, 6) AS level, round(trend, 6) AS trend,
       round(fitted, 6) AS fitted
FROM walk ORDER BY 1, 2
""",
        # one row per contract rule; same null/violation semantics
        "validate_events": """
WITH t AS (SELECT count(*) AS total FROM events)
SELECT rule, "column", violations, total, violations = 0 AS passed FROM (
  SELECT 'not_null' AS rule, 'event_id' AS "column",
         (SELECT count(*) FROM events WHERE event_id IS NULL) AS violations, total FROM t
  UNION ALL
  SELECT 'not_null', 'ts',
         (SELECT count(*) FROM events WHERE ts IS NULL), total FROM t
  UNION ALL
  SELECT 'not_null', 'event_type',
         (SELECT count(*) FROM events WHERE event_type IS NULL), total FROM t
  UNION ALL
  SELECT 'unique', 'event_id',
         (SELECT count(event_id) - count(DISTINCT event_id) FROM events), total FROM t
  UNION ALL
  SELECT 'in_range', 'value',
         (SELECT count(*) FROM events
          WHERE value IS NOT NULL AND (isnan(value) OR value < 0.0 OR value > 500.0)),
         total FROM t
  UNION ALL
  SELECT 'in_set', 'event_type',
         (SELECT count(*) FROM events WHERE event_type IS NOT NULL
          AND event_type NOT IN ('click', 'view', 'purchase')), total FROM t
  UNION ALL
  SELECT 'matches', 'event_type',
         (SELECT count(*) FROM events WHERE event_type IS NOT NULL
          AND NOT regexp_matches(event_type, '^[a-z_]+$')), total FROM t
  UNION ALL
  SELECT 'freshness', 'ts',
         (SELECT CASE WHEN max(ts) IS NULL
                      OR max(ts) < TIMESTAMP '2024-07-01 00:00:00' - INTERVAL 604800 SECONDS
                 THEN 1 ELSE 0 END FROM events), total FROM t
  UNION ALL
  SELECT 'ref_integrity', 'user_id',
         (SELECT count(*) FROM events e
          WHERE e.user_id IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)),
         total FROM t
)
ORDER BY rule, "column"
""",
        "daily_user_rollup_tiered": f"""
WITH base AS (
  SELECT user_id, date_trunc('day', ts) AS bucket_start, value FROM events
), agg AS (
  SELECT user_id, bucket_start, {_ROLLUP_STATS}
  FROM base GROUP BY 1, 2
), bounds AS (
  SELECT user_id, min(bucket_start) AS mn, max(bucket_start) AS mx FROM base GROUP BY 1
), spine AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS bucket_start FROM bounds
)
SELECT s.user_id, s.bucket_start, coalesce(a.n, 0) AS n,
       CASE WHEN a.n >= 3 THEN a.v_mean END AS v_mean,
       CASE WHEN a.n >= 3 THEN a.v_std END AS v_std,
       CASE WHEN a.n >= 3 THEN a.v_min END AS v_min,
       CASE WHEN a.n >= 3 THEN a.v_max END AS v_max,
       CASE WHEN a.n >= 3 THEN a.v_50 END AS v_50,
       CASE WHEN a.n >= 3 THEN a.v_75 END AS v_75,
       CASE WHEN a.n >= 3 THEN a.v_90 END AS v_90
FROM spine s LEFT JOIN agg a USING (user_id, bucket_start)
ORDER BY 1, 2
""",
        "weekly_anchored_rollup": f"""
WITH base AS (
  SELECT event_type,
         date_trunc('year', ts) + CAST(floor((dayofyear(ts) - 1) / 7) * 7 AS INT) * INTERVAL 1 DAY AS bucket_start,
         value
  FROM events
)
SELECT event_type, bucket_start, {_ROLLUP_STATS}
FROM base GROUP BY 1, 2 ORDER BY 1, 2
""",
        "midpoint_rep_rows": """
WITH base AS (
  SELECT event_type, date_trunc('day', ts) AS bucket_start, event_id, value, ts,
         abs(epoch_us(ts) - epoch_us(date_trunc('day', ts) + INTERVAL 12 HOUR)) AS d
  FROM events
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type, bucket_start ORDER BY d, ts, event_id) AS rn
  FROM base
)
SELECT event_type, bucket_start, event_id AS mid_event_id, round(value, 6) AS mid_value
FROM ranked WHERE rn = 1 ORDER BY 1, 2
""",
        # integer-us gaps, one pinned division per stat, unrounded
        # (see q_latency_lag_stats — the round(.,6) midway-tie fix)
        "latency_lag_stats": """
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events
)
SELECT user_id, count(*) AS n_gaps,
       CAST(sum(gap_us) AS DOUBLE) / (1e6 * CAST(count(*) AS DOUBLE)) AS gap_mean,
       quantile_cont(gap_us, 0.9) / 1e6 AS gap_p90
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY 1 ORDER BY 1
""",
        "session_stats": """
WITH g AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 3600000000
              THEN 1 ELSE 0 END AS brk,
         event_id
  FROM events
), s AS (
  SELECT user_id, ts, value,
         CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM g
)
SELECT user_id, session_idx,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events, ROUND(SUM(value), 6) AS value_sum
FROM s GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
""",
        "vegindex_summary_3day": """
WITH r AS (
  SELECT ts,
         'e' || CAST(event_id AS VARCHAR) AS filename,
         CAST(event_id % 80 - 5 AS DOUBLE) AS solar_elev,
         CASE WHEN event_id % 13 = 0 THEN 1 ELSE 0 END AS awbflag,
         50.0 + (value - floor(value / 100.0) * 100.0) AS r_mean,
         60.0 + (value * 7.0 - floor(value * 7.0 / 100.0) * 100.0) AS g_mean,
         40.0 + (value * 13.0 - floor(value * 13.0 / 100.0) * 100.0) AS b_mean
  FROM events WHERE event_id % 139 = 0
),
-- select_rows (pre-awb) defines spine bounds and the series-start year,
-- exactly like the engine (vegindex_summary.py: qc_sel drives bounds)
sel AS (
  SELECT *, g_mean / (r_mean + g_mean + b_mean) AS gcc,
         r_mean / (r_mean + g_mean + b_mean) AS rcc,
         make_date(year(ts), 1, 1) + CAST((dayofyear(ts) - 1) // 3 * 3 AS INT) AS naive_b,
         make_date(year(ts), 1, 1) - make_date(year(ts) - 1, 1, 1) AS prev_days
  FROM r
  WHERE strftime(ts, '%H:%M:%S') >= '00:00:00'
    AND strftime(ts, '%H:%M:%S') <= '23:59:59'
    AND (r_mean + g_mean + b_mean) BETWEEN 100.0 AND 665.0
    AND solar_elev >= 10.0
    AND r_mean IS NOT NULL
),
bounds AS (SELECT min(naive_b) AS lo, max(naive_b) AS hi, year(min(ts)) AS y0 FROM sel),
-- awb skip + the sequential-cursor year-boundary spill rule
qc AS (
  SELECT s.*,
         CASE WHEN year(s.ts) > b.y0
                   AND dayofyear(s.ts) <= (s.prev_days - 1) // 3 * 3 + 3 - s.prev_days
              THEN make_date(year(s.ts) - 1, 1, 1) + CAST((s.prev_days - 1) // 3 * 3 AS INT)
              ELSE s.naive_b END AS bucket_start
  FROM sel s, bounds b
  WHERE s.awbflag <> 1
),
-- midday row picked ATOMICALLY with the engine's tie-break (d, ts, filename)
mid AS (
  SELECT bucket_start, filename AS midday_filename, gcc AS midday_gcc
  FROM (
    SELECT bucket_start, filename, gcc,
           row_number() OVER (
             PARTITION BY bucket_start
             ORDER BY abs(epoch_us(ts) - epoch_us(CAST(bucket_start + 1 AS TIMESTAMP) + INTERVAL 12 HOUR)), ts, filename
           ) AS rn
    FROM qc
  ) WHERE rn = 1
),
agg AS (
  SELECT bucket_start,
         CAST(count(*) AS INT) AS image_count,
         avg(r_mean) AS r_mean,
         avg(gcc) AS gcc_mean,
         stddev_pop(gcc) AS gcc_std,
         quantile_cont(gcc, 0.5) AS gcc_50,
         quantile_cont(gcc, 0.9) AS gcc_90,
         avg(rcc) AS rcc_mean,
         max(solar_elev) AS max_solar_elev
  FROM qc GROUP BY bucket_start
),
-- gap-fill spine on the naive doy lattice (restarts at Jan 1 each year)
spine AS (
  SELECT d AS bucket_start FROM (
    SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
    FROM bounds
  ) WHERE (dayofyear(d) - 1) % 3 = 0
)
SELECT CAST(s.bucket_start + 1 AS TIMESTAMP) AS date,
       year(s.bucket_start + 1) AS year,
       dayofyear(s.bucket_start + 1) AS doy,
       COALESCE(a.image_count, 0) AS image_count,
       CASE WHEN COALESCE(a.image_count, 0) > 0 THEN m.midday_filename END AS midday_filename,
       CASE WHEN COALESCE(a.image_count, 0) > 0 THEN round(m.midday_gcc, 6) END AS midday_gcc,
       CASE WHEN COALESCE(a.image_count, 0) >= 6 THEN round(a.r_mean, 6) END AS r_mean,
       CASE WHEN COALESCE(a.image_count, 0) >= 6 THEN round(a.gcc_mean, 6) END AS gcc_mean,
       CASE WHEN COALESCE(a.image_count, 0) >= 6 THEN round(a.gcc_std, 6) END AS gcc_std,
       CASE WHEN COALESCE(a.image_count, 0) >= 6 THEN round(a.gcc_50, 6) END AS gcc_50,
       CASE WHEN COALESCE(a.image_count, 0) >= 6 THEN round(a.gcc_90, 6) END AS gcc_90,
       CASE WHEN COALESCE(a.image_count, 0) >= 6 THEN round(a.rcc_mean, 6) END AS rcc_mean,
       CASE WHEN COALESCE(a.image_count, 0) > 0 THEN round(a.max_solar_elev, 6) END AS max_solar_elev
FROM spine s
LEFT JOIN agg a ON s.bucket_start = a.bucket_start
LEFT JOIN mid m ON s.bucket_start = m.bucket_start
ORDER BY date
""",
        "vegindex_summary_yearboundary": """
WITH r AS (
  SELECT ts + (event_id % 730) * INTERVAL 1 DAY AS ts,
         'e' || CAST(event_id AS VARCHAR) AS filename,
         CAST(event_id % 80 - 5 AS DOUBLE) AS solar_elev,
         CASE WHEN event_id % 13 = 0 THEN 1 ELSE 0 END AS awbflag,
         50.0 + (value - floor(value / 100.0) * 100.0) AS r_mean,
         60.0 + (value * 7.0 - floor(value * 7.0 / 100.0) * 100.0) AS g_mean,
         40.0 + (value * 13.0 - floor(value * 13.0 / 100.0) * 100.0) AS b_mean
  FROM events WHERE event_id % 11 = 0
),
-- select_rows (pre-awb) defines spine bounds and the series-start year
sel AS (
  SELECT *, g_mean / (r_mean + g_mean + b_mean) AS gcc,
         r_mean / (r_mean + g_mean + b_mean) AS rcc,
         make_date(year(ts), 1, 1) + CAST((dayofyear(ts) - 1) // 7 * 7 AS INT) AS naive_b,
         make_date(year(ts), 1, 1) - make_date(year(ts) - 1, 1, 1) AS prev_days
  FROM r
  WHERE (r_mean + g_mean + b_mean) BETWEEN 100.0 AND 665.0
    AND solar_elev >= 10.0
    AND r_mean IS NOT NULL
),
bounds AS (SELECT min(naive_b) AS lo, max(naive_b) AS hi, year(min(ts)) AS y0 FROM sel),
-- awb skip + the sequential-cursor year-boundary rule: each year's final
-- bucket spans the full 7-day window past Dec 31, so rows with
-- doy <= overflow(prev year) fall into the PREVIOUS year's final bucket
-- (except in the series' first year)
qc AS (
  SELECT s.*,
         CASE WHEN year(s.ts) > b.y0
                   AND dayofyear(s.ts) <= (s.prev_days - 1) // 7 * 7 + 7 - s.prev_days
              THEN make_date(year(s.ts) - 1, 1, 1) + CAST((s.prev_days - 1) // 7 * 7 AS INT)
              ELSE s.naive_b END AS bucket_start
  FROM sel s, bounds b
  WHERE s.awbflag <> 1
),
mid AS (
  SELECT bucket_start, filename AS midday_filename, gcc AS midday_gcc
  FROM (
    SELECT bucket_start, filename, gcc,
           row_number() OVER (
             PARTITION BY bucket_start
             ORDER BY abs(epoch_us(ts) - epoch_us(CAST(bucket_start + 3 AS TIMESTAMP) + INTERVAL 12 HOUR)), ts, filename
           ) AS rn
    FROM qc
  ) WHERE rn = 1
),
agg AS (
  SELECT bucket_start,
         CAST(count(*) AS INT) AS image_count,
         avg(gcc) AS gcc_mean,
         stddev_pop(gcc) AS gcc_std,
         quantile_cont(gcc, 0.5) AS gcc_50,
         quantile_cont(gcc, 0.75) AS gcc_75,
         quantile_cont(gcc, 0.9) AS gcc_90,
         avg(rcc) AS rcc_mean,
         max(solar_elev) AS max_solar_elev
  FROM qc GROUP BY bucket_start
),
-- gap-fill spine on the naive doy lattice (restarts at Jan 1 each year)
spine AS (
  SELECT d AS bucket_start FROM (
    SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
    FROM bounds
  ) WHERE (dayofyear(d) - 1) % 7 = 0
)
SELECT CAST(s.bucket_start + 3 AS TIMESTAMP) AS date,
       year(s.bucket_start + 3) AS year,
       dayofyear(s.bucket_start + 3) AS doy,
       COALESCE(a.image_count, 0) AS image_count,
       CASE WHEN COALESCE(a.image_count, 0) > 0 THEN m.midday_filename END AS midday_filename,
       CASE WHEN COALESCE(a.image_count, 0) > 0 THEN round(m.midday_gcc, 6) END AS midday_gcc,
       CASE WHEN COALESCE(a.image_count, 0) >= 4 THEN round(a.gcc_mean, 6) END AS gcc_mean,
       CASE WHEN COALESCE(a.image_count, 0) >= 4 THEN round(a.gcc_std, 6) END AS gcc_std,
       CASE WHEN COALESCE(a.image_count, 0) >= 4 THEN round(a.gcc_50, 6) END AS gcc_50,
       CASE WHEN COALESCE(a.image_count, 0) >= 4 THEN round(a.gcc_75, 6) END AS gcc_75,
       CASE WHEN COALESCE(a.image_count, 0) >= 4 THEN round(a.gcc_90, 6) END AS gcc_90,
       CASE WHEN COALESCE(a.image_count, 0) >= 4 THEN round(a.rcc_mean, 6) END AS rcc_mean,
       CASE WHEN COALESCE(a.image_count, 0) > 0 THEN round(a.max_solar_elev, 6) END AS max_solar_elev
FROM spine s
LEFT JOIN agg a ON s.bucket_start = a.bucket_start
LEFT JOIN mid m ON s.bucket_start = m.bucket_start
ORDER BY date
""",
        "ndvi_summary_3day": """
WITH r AS (
  SELECT ts,
         'e' || CAST(event_id AS VARCHAR) AS filename_rgb,
         'i' || CAST(event_id AS VARCHAR) AS filename_ir,
         CAST(event_id % 80 - 5 AS DOUBLE) AS solar_elev,
         50.0 + (value - floor(value / 100.0) * 100.0) AS r_mean,
         60.0 + (value * 7.0 - floor(value * 7.0 / 100.0) * 100.0) AS g_mean,
         40.0 + (value * 13.0 - floor(value * 13.0 / 100.0) * 100.0) AS b_mean,
         (value * 17.0 - floor(value * 17.0 / 2.4) * 2.4) - 1.2 AS ndvi
  FROM events WHERE event_id % 53 = 0
),
-- released reference semantics: the NDVI range filter ONLY; bounds come
-- from this same set (the engine's qc drives bounds in reference mode)
sel AS (
  SELECT *, g_mean / (r_mean + g_mean + b_mean) AS gcc,
         make_date(year(ts), 1, 1) + CAST((dayofyear(ts) - 1) // 3 * 3 AS INT) AS naive_b,
         make_date(year(ts), 1, 1) - make_date(year(ts) - 1, 1, 1) AS prev_days
  FROM r WHERE ndvi BETWEEN -1.0 AND 1.0
),
bounds AS (SELECT min(naive_b) AS lo, max(naive_b) AS hi, year(min(ts)) AS y0 FROM sel),
-- sequential-cursor year-boundary spill rule, like the engine
qc AS (
  SELECT s.*,
         CASE WHEN year(s.ts) > b.y0
                   AND dayofyear(s.ts) <= (s.prev_days - 1) // 3 * 3 + 3 - s.prev_days
              THEN make_date(year(s.ts) - 1, 1, 1) + CAST((s.prev_days - 1) // 3 * 3 AS INT)
              ELSE s.naive_b END AS bucket_start
  FROM sel s, bounds b
),
mid AS (
  SELECT bucket_start, filename_rgb AS m_rgb, filename_ir AS m_ir, ndvi AS m_ndvi
  FROM (
    SELECT bucket_start, filename_rgb, filename_ir, ndvi,
           row_number() OVER (
             PARTITION BY bucket_start
             ORDER BY abs(epoch_us(ts) - epoch_us(CAST(bucket_start + 1 AS TIMESTAMP) + INTERVAL 12 HOUR)), ts, filename_rgb
           ) AS rn
    FROM qc
  ) WHERE rn = 1
),
agg AS (
  SELECT bucket_start,
         CAST(count(*) AS INT) AS image_count,
         quantile_cont(gcc, 0.9) AS gcc_90,
         avg(ndvi) AS ndvi_mean,
         stddev_pop(ndvi) AS ndvi_std,
         quantile_cont(ndvi, 0.5) AS ndvi_50,
         quantile_cont(ndvi, 0.9) AS ndvi_90,
         max(solar_elev) AS max_solar_elev
  FROM qc GROUP BY bucket_start
),
spine AS (
  SELECT d AS bucket_start FROM (
    SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
    FROM bounds
  ) WHERE (dayofyear(d) - 1) % 3 = 0
)
SELECT CAST(s.bucket_start + 1 AS TIMESTAMP) AS date,
       year(s.bucket_start + 1) AS year,
       dayofyear(s.bucket_start + 1) AS doy,
       COALESCE(a.image_count, 0) AS image_count,
       CASE WHEN COALESCE(a.image_count, 0) > 0 THEN m.m_rgb END AS midday_rgb_filename,
       CASE WHEN COALESCE(a.image_count, 0) > 0 THEN m.m_ir END AS midday_ir_filename,
       CASE WHEN COALESCE(a.image_count, 0) > 0 THEN round(m.m_ndvi, 6) END AS midday_ndvi,
       CASE WHEN COALESCE(a.image_count, 0) >= 5 THEN round(a.gcc_90, 6) END AS gcc_90,
       CASE WHEN COALESCE(a.image_count, 0) >= 5 THEN round(a.ndvi_mean, 6) END AS ndvi_mean,
       CASE WHEN COALESCE(a.image_count, 0) >= 5 THEN round(a.ndvi_std, 6) END AS ndvi_std,
       CASE WHEN COALESCE(a.image_count, 0) >= 5 THEN round(a.ndvi_50, 6) END AS ndvi_50,
       CASE WHEN COALESCE(a.image_count, 0) >= 5 THEN round(a.ndvi_90, 6) END AS ndvi_90,
       CASE WHEN COALESCE(a.image_count, 0) > 0 THEN round(a.max_solar_elev, 6) END AS max_solar_elev
FROM spine s
LEFT JOIN agg a ON s.bucket_start = a.bucket_start
LEFT JOIN mid m ON s.bucket_start = m.bucket_start
ORDER BY date
""",
        "gcc_update_equals_full": """
WITH r AS (
  SELECT ts,
         'e' || CAST(event_id AS VARCHAR) AS filename,
         CAST(event_id % 80 - 5 AS DOUBLE) AS solar_elev,
         CASE WHEN event_id % 13 = 0 THEN 1 ELSE 0 END AS awbflag,
         50.0 + (value - floor(value / 100.0) * 100.0) AS r_mean,
         60.0 + (value * 7.0 - floor(value * 7.0 / 100.0) * 100.0) AS g_mean,
         40.0 + (value * 13.0 - floor(value * 13.0 / 100.0) * 100.0) AS b_mean
  FROM events WHERE event_id % 97 = 0
),
-- the oracle is the FULL recompute; a hash match against the engine's
-- two-step generate-then-update output certifies the invariant.
-- Pre-awb bounds + cursor spill + atomic midday, like the engine.
sel AS (
  SELECT *, g_mean / (r_mean + g_mean + b_mean) AS gcc,
         r_mean / (r_mean + g_mean + b_mean) AS rcc,
         make_date(year(ts), 1, 1) + CAST((dayofyear(ts) - 1) // 3 * 3 AS INT) AS naive_b,
         make_date(year(ts), 1, 1) - make_date(year(ts) - 1, 1, 1) AS prev_days
  FROM r
  WHERE (r_mean + g_mean + b_mean) BETWEEN 100.0 AND 665.0
    AND solar_elev >= 10.0
    AND r_mean IS NOT NULL
),
bounds AS (SELECT min(naive_b) AS lo, max(naive_b) AS hi, year(min(ts)) AS y0 FROM sel),
qc AS (
  SELECT s.*,
         CASE WHEN year(s.ts) > b.y0
                   AND dayofyear(s.ts) <= (s.prev_days - 1) // 3 * 3 + 3 - s.prev_days
              THEN make_date(year(s.ts) - 1, 1, 1) + CAST((s.prev_days - 1) // 3 * 3 AS INT)
              ELSE s.naive_b END AS bucket_start
  FROM sel s, bounds b
  WHERE s.awbflag <> 1
),
mid AS (
  SELECT bucket_start, filename AS midday_filename, gcc AS midday_gcc
  FROM (
    SELECT bucket_start, filename, gcc,
           row_number() OVER (
             PARTITION BY bucket_start
             ORDER BY abs(epoch_us(ts) - epoch_us(CAST(bucket_start + 1 AS TIMESTAMP) + INTERVAL 12 HOUR)), ts, filename
           ) AS rn
    FROM qc
  ) WHERE rn = 1
),
agg AS (
  SELECT bucket_start,
         CAST(count(*) AS INT) AS image_count,
         avg(gcc) AS gcc_mean,
         stddev_pop(gcc) AS gcc_std,
         quantile_cont(gcc, 0.5) AS gcc_50,
         quantile_cont(gcc, 0.9) AS gcc_90,
         avg(rcc) AS rcc_mean,
         max(solar_elev) AS max_solar_elev
  FROM qc GROUP BY bucket_start
),
spine AS (
  SELECT d AS bucket_start FROM (
    SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
    FROM bounds
  ) WHERE (dayofyear(d) - 1) % 3 = 0
)
SELECT CAST(s.bucket_start + 1 AS TIMESTAMP) AS date,
       year(s.bucket_start + 1) AS year,
       dayofyear(s.bucket_start + 1) AS doy,
       COALESCE(a.image_count, 0) AS image_count,
       CASE WHEN COALESCE(a.image_count, 0) > 0 THEN m.midday_filename END AS midday_filename,
       CASE WHEN COALESCE(a.image_count, 0) > 0 THEN round(m.midday_gcc, 6) END AS midday_gcc,
       CASE WHEN COALESCE(a.image_count, 0) >= 6 THEN round(a.gcc_mean, 6) END AS gcc_mean,
       CASE WHEN COALESCE(a.image_count, 0) >= 6 THEN round(a.gcc_std, 6) END AS gcc_std,
       CASE WHEN COALESCE(a.image_count, 0) >= 6 THEN round(a.gcc_50, 6) END AS gcc_50,
       CASE WHEN COALESCE(a.image_count, 0) >= 6 THEN round(a.gcc_90, 6) END AS gcc_90,
       CASE WHEN COALESCE(a.image_count, 0) >= 6 THEN round(a.rcc_mean, 6) END AS rcc_mean,
       CASE WHEN COALESCE(a.image_count, 0) > 0 THEN round(a.max_solar_elev, 6) END AS max_solar_elev
FROM spine s
LEFT JOIN agg a ON s.bucket_start = a.bucket_start
LEFT JOIN mid m ON s.bucket_start = m.bucket_start
ORDER BY date
""",
        "hf_quantile_types": _hf_oracle_sql(),
        "summary_threshold_nullout": """
WITH s AS (
  SELECT user_id, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
         CAST(count(*) FILTER (WHERE value > 0.5) AS INT) AS image_count,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS DOUBLE)
           / (100.0 * CAST(count(value) AS DOUBLE)) AS v_mean,
         round(quantile_cont(value, 0.9), 6) AS v_90,
         round(max(value), 6) AS v_max
  FROM events GROUP BY 1, 2)
SELECT user_id, day, image_count,
       CASE WHEN image_count = 0 OR image_count < 5 THEN NULL ELSE v_mean END AS v_mean,
       CASE WHEN image_count = 0 OR image_count < 5 THEN NULL ELSE v_90 END AS v_90,
       CASE WHEN image_count = 0 THEN NULL ELSE v_max END AS v_max
FROM s ORDER BY user_id, day
""",
        "asof_forward_join": """
SELECT c.event_id, c.user_id,
       CASE WHEN v.ts IS NOT NULL AND epoch_us(v.ts) - epoch_us(c.ts) <= 1800 * 1000000
            THEN v.ts END AS view_ts,
       CASE WHEN v.ts IS NOT NULL AND epoch_us(v.ts) - epoch_us(c.ts) <= 1800 * 1000000
            THEN round(v.value, 6) END AS view_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND c.ts <= v.ts
ORDER BY c.event_id
""",
        "asof_nearest_join": """
WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view'),
bwd AS (
  SELECT c.event_id, c.user_id, c.ts, v.ts AS bts, v.value AS bval
  FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts
),
fwd AS (
  SELECT c.event_id, v.ts AS fts, v.value AS fval
  FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts <= v.ts
),
j AS (
  SELECT b.event_id, b.user_id, b.ts, b.bts, b.bval, f.fts, f.fval,
         (b.bts IS NOT NULL AND epoch_us(b.ts) - epoch_us(b.bts) <= 1800 * 1000000) AS prev_ok,
         (f.fts IS NOT NULL AND epoch_us(f.fts) - epoch_us(b.ts) <= 1800 * 1000000) AS next_ok
  FROM bwd b JOIN fwd f USING (event_id)
)
SELECT event_id, user_id,
       CASE WHEN prev_ok AND next_ok THEN
              CASE WHEN epoch_us(fts) - epoch_us(ts) < epoch_us(ts) - epoch_us(bts)
                   THEN fts ELSE bts END
            WHEN prev_ok THEN bts
            WHEN next_ok THEN fts END AS view_ts,
       round(CASE WHEN prev_ok AND next_ok THEN
              CASE WHEN epoch_us(fts) - epoch_us(ts) < epoch_us(ts) - epoch_us(bts)
                   THEN fval ELSE bval END
            WHEN prev_ok THEN bval
            WHEN next_ok THEN fval END, 6) AS view_value
FROM j ORDER BY event_id
""",
        "asof_bucketed_join": """
SELECT c.event_id, c.user_id,
       CASE WHEN v.ts IS NOT NULL AND epoch_us(c.ts) - epoch_us(v.ts) <= 1800 * 1000000
            THEN v.ts END AS view_ts,
       CASE WHEN v.ts IS NOT NULL AND epoch_us(c.ts) - epoch_us(v.ts) <= 1800 * 1000000
            THEN round(v.value, 6) END AS view_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND c.ts >= v.ts
ORDER BY c.event_id
""",
        "asof_backward_join": """
SELECT c.event_id, c.user_id,
       CASE WHEN v.ts IS NOT NULL AND epoch_us(c.ts) - epoch_us(v.ts) <= 1800 * 1000000
            THEN v.ts END AS view_ts,
       CASE WHEN v.ts IS NOT NULL AND epoch_us(c.ts) - epoch_us(v.ts) <= 1800 * 1000000
            THEN round(v.value, 6) END AS view_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND c.ts >= v.ts
ORDER BY c.event_id
""",
        "interval_join_agg": """
SELECT o.o_orderpriority AS priority,
       count(*) AS n_items,
       CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
         / (100.0 * CAST(count(l.l_extendedprice) AS DOUBLE)) AS avg_price,
       round(sum(l.l_quantity), 2) AS sum_qty
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= o.o_orderdate
  AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
GROUP BY 1 ORDER BY 1
""",
        "merge_upsert_checksum": """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(floor((CASE WHEN event_id % 7 = 0 THEN value + 100.0
                                  ELSE value END) * 100) AS BIGINT)) AS DOUBLE)
         / (100.0 * CAST(count(*) AS DOUBLE)) AS value_mean
FROM events GROUP BY 1 ORDER BY 1
""",
        "ngram_jaccard_verify": """
WITH keyed AS (
  SELECT doc_id,
         md5(lower(substr(regexp_replace(trim(text), '\\s+', ' ', 'g'), 1, 16))) AS fp
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM keyed a JOIN keyed b ON a.fp = b.fp AND a.doc_id < b.doc_id
),
tok AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
  FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(words) >= 3
              THEN list_transform(range(1, len(words) - 1), i -> array_to_string(list_slice(words, i, i + 2), ' '))
              ELSE [array_to_string(words, ' ')] END AS gs
  FROM tok
),
sh AS (SELECT DISTINCT doc_id, unnest(gs) AS s FROM grams),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT p.id_a, p.id_b, count(*) AS c
  FROM pairs p
  JOIN sh x ON x.doc_id = p.id_a
  JOIN sh y ON y.doc_id = p.id_b AND y.s = x.s
  GROUP BY 1, 2
)
SELECT p.id_a, p.id_b,
       (CAST(COALESCE(i.c, 0) AS DOUBLE) / CAST(sa.n + sb.n - COALESCE(i.c, 0) AS DOUBLE)) AS jaccard
FROM pairs p
LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
JOIN sizes sa ON sa.doc_id = p.id_a
JOIN sizes sb ON sb.doc_id = p.id_b
ORDER BY p.id_a, p.id_b
""",
        "dedup_exact_docs": """
SELECT md5(lower(substr(regexp_replace(trim(text), '\\s+', ' ', 'g'), 1, 16))) AS fp,
       min(doc_id) AS keep_id, count(*) AS dup_count
FROM documents GROUP BY 1 ORDER BY 1
""",
        "text_stats_docs": """
SELECT doc_id, lang,
       CASE WHEN coalesce(length(trim(text)), 0) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS tokens,
       length(text) AS chars,
       CAST(CASE WHEN coalesce(length(trim(text)), 0) = 0 THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
            * 100 AS DOUBLE)
         / CAST(greatest(length(text), 1) AS DOUBLE) AS tokens_per_100_chars
FROM documents ORDER BY doc_id
""",
        "lang_quality_summary": """
WITH t AS (
  SELECT lang,
         CASE WHEN coalesce(length(trim(text)), 0) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS tokens
  FROM documents
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(tokens) AS DOUBLE) / (1.0 * CAST(count(tokens) AS DOUBLE)) AS tokens_mean,
       round(quantile_cont(CAST(tokens AS DOUBLE), 0.9), 6) AS tokens_p90,
       CAST(sum(CASE WHEN tokens >= 50 THEN 1 ELSE 0 END) AS DOUBLE)
         / (1.0 * CAST(count(tokens) AS DOUBLE)) AS share_long
FROM t GROUP BY 1 ORDER BY 1
""",
        "ann_cosine_topk": _EXACT_TOPK_ORACLE,
        "tpch_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
           / (100.0 * CAST(count(l_extendedprice) AS DOUBLE)) AS avg_price,
       CAST(sum(CAST(floor(l_discount * 100) AS BIGINT)) AS DOUBLE)
           / (100.0 * CAST(count(l_discount) AS DOUBLE)) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-09-01'
GROUP BY 1, 2 ORDER BY 1, 2
""",
        "topk_per_group": """
WITH ranked AS (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rank
  FROM events
)
SELECT event_type, CAST(rank AS INT) AS rank, event_id, round(value, 6) AS value
FROM ranked WHERE rank <= 3 ORDER BY event_type, rank
""",
        "union_dedup": """
WITH u AS (
  SELECT DISTINCT event_id FROM (
    SELECT event_id FROM events WHERE value > 50
    UNION ALL
    SELECT event_id FROM events WHERE event_type = 'error'
  )
)
SELECT e.event_type, count(*) AS n,
       CAST(sum(CAST(floor(e.value * 100) AS BIGINT)) AS DOUBLE)
           / (100.0 * CAST(count(e.value) AS DOUBLE)) AS value_mean
FROM events e JOIN u USING (event_id)
GROUP BY 1 ORDER BY 1
""",
        "paired_index_backward": """
WITH p AS (
  SELECT event_id, user_id, ts, value AS r, value * 2 AS g, value / 2 AS b,
         30.0 AS exposure
  FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT user_id, ts, value AS ir, 15.0 AS exposure
  FROM events WHERE event_type = 'view'
), paired AS (
  SELECT p.event_id, p.r, p.g, p.b, p.exposure AS exp_p,
         CASE WHEN v.ts IS NOT NULL AND epoch_us(p.ts) - epoch_us(v.ts) <= 3600000000::BIGINT
              THEN v.ir END AS ir,
         15.0 AS exp_s
  FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
), calc AS (
  SELECT event_id,
         ((ir / sqrt(exp_s)) - ((0.30*r + 0.59*g + 0.11*b) / sqrt(exp_p))) AS xp,
         (r / sqrt(exp_p)) AS rp
  FROM paired WHERE ir IS NOT NULL AND ir <> 0
)
SELECT event_id, (xp - rp) / (xp + rp) AS ndvi_c
FROM calc
WHERE (xp - rp) / (xp + rp) BETWEEN -1.0 AND 1.0
ORDER BY event_id
""",
        "validity_interval_join": """
WITH dim(segment, start_ts, end_ts) AS (
  VALUES ('w1', TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-08'),
         ('w2', TIMESTAMP '2024-01-08', TIMESTAMP '2024-01-20'),
         ('w3', TIMESTAMP '2024-01-20', TIMESTAMP '2024-02-01')
)
SELECT d.segment, e.event_type, count(*) AS n,
       CAST(sum(CAST(floor(e.value * 100) AS BIGINT)) AS DOUBLE)
           / (100.0 * CAST(count(e.value) AS DOUBLE)) AS value_mean
FROM events e JOIN dim d ON e.ts >= d.start_ts AND e.ts < d.end_ts
GROUP BY 1, 2 ORDER BY 1, 2
""",
        "tpch_multi_join": """
SELECT n.n_name AS nation,
       count(*) AS n_items,
       CAST(sum(CAST(floor(l.l_extendedprice * 100)
                     * (100 - floor(l.l_discount * 100)) AS BIGINT)) AS DOUBLE)
         / (10000.0 * CAST(count(*) AS DOUBLE)) AS avg_revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1 ORDER BY 1
""",
        "lang_quality_docs": """
WITH t AS (
  SELECT doc_id, text,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS words,
         CASE WHEN coalesce(length(trim(text)), 0) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS toks
  FROM documents
), votes AS (
  SELECT doc_id, text, toks, words,
    len(list_filter(words, w -> list_contains(['the','and','of','to','is','in','that','it','for','was'], w))) AS v_en,
    len(list_filter(words, w -> list_contains(['el','la','de','que','y','en','los','se','del','las'], w))) AS v_es,
    len(list_filter(words, w -> list_contains(['le','la','de','et','les','des','en','un','du','une'], w))) AS v_fr,
    len(list_filter(words, w -> list_contains(['der','die','und','das','von','zu','mit','den','ist','im'], w))) AS v_de
  FROM t
), scored AS (
  SELECT doc_id, toks, words, v_en, v_es, v_fr, v_de,
         greatest(v_en, v_es, v_fr, v_de) AS vbest,
         CASE WHEN length(text) > 0
              THEN length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) * 1.0 / length(text)
              ELSE 0.0 END AS p,
         CASE WHEN len(words) > 0 THEN v_en * 1.0 / len(words) ELSE 0.0 END AS swr
  FROM votes
)
SELECT doc_id,
       CASE WHEN vbest = 0 THEN 'und'
            WHEN v_en = vbest THEN 'en'
            WHEN v_es = vbest THEN 'es'
            WHEN v_fr = vbest THEN 'fr'
            ELSE 'de' END AS lang_guess,
       round(
         0.5 * (CASE WHEN toks >= 10 AND toks <= 10000 THEN 1.0
                     WHEN toks > 0 THEN 0.3 ELSE 0.0 END)
       + 0.3 * (CASE WHEN p <= 0.2 THEN 1.0
                     ELSE greatest(0.0, 1.0 - (p - 0.2) * 4) END)
       + 0.2 * least(1.0, swr * 10.0), 6) AS quality
FROM scored ORDER BY doc_id
""",
        "fingerprint_dup_histogram": """
WITH fp AS (
  SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS f,
         count(*) AS dup_count
  FROM documents GROUP BY 1
)
SELECT dup_count, count(*) AS n_groups
FROM fp GROUP BY 1 ORDER BY 1
""",
        "word_len_percentiles": """
WITH t AS (
  SELECT doc_id,
         list_sort([length(x) FOR x IN regexp_split_to_array(trim(text), '\\s+')]) AS ls
  FROM documents WHERE length(trim(text)) > 0
), h AS (
  SELECT doc_id, ls, len(ls) AS n,
         (len(ls) - 1) * 0.5 + 1 AS h50,
         (len(ls) - 1) * 0.9 + 1 AS h90
  FROM t
)
SELECT doc_id, n AS n_words,
       round(ls[CAST(floor(h50) AS INT)]
             + (h50 - floor(h50)) * (ls[least(CAST(floor(h50) AS INT) + 1, n)] - ls[CAST(floor(h50) AS INT)]), 6) AS wlen_p50,
       round(ls[CAST(floor(h90) AS INT)]
             + (h90 - floor(h90)) * (ls[least(CAST(floor(h90) AS INT) + 1, n)] - ls[CAST(floor(h90) AS INT)]), 6) AS wlen_p90
FROM h ORDER BY doc_id
""",
        "deg_dms_roundtrip": """
WITH t AS (
  SELECT event_id, value, abs(value) AS a, floor(abs(value)) AS d
  FROM events
), m AS (
  SELECT event_id, value, a, d, floor((a - d) * 60) AS mm FROM t
)
SELECT event_id,
       CAST(d AS BIGINT) AS dms_deg,
       CAST(mm AS BIGINT) AS dms_min,
       (a - d - mm / 60) * 3600 AS dms_sec,
       sign(value) * (d + mm / 60 + (a - d - mm / 60) * 3600 / 3600) AS deg_back
FROM m ORDER BY event_id
""",
        "embedding_near_dups": """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
  FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, cos_sim FROM p WHERE cos_sim >= 0.4 ORDER BY id_a, id_b
""",
        "csv_sentinel_format": """
WITH t AS (
  SELECT event_id,
         CASE WHEN event_id % 11 = 0 THEN -9999.0 ELSE value END AS dirty
  FROM events
)
SELECT event_id,
       coalesce(printf('%.5f', nullif(dirty, -9999.0)), 'NA') AS csv_value
FROM t ORDER BY event_id
""",
        # 1:1 mirror of functions/astro.solar_elevation (NOAA closed
        # form, identical term order; pmod spelled ((x%m)+m)%m)
        "solar_gate_features": """
WITH t1 AS (
  SELECT event_id, CAST(epoch_us(ts) AS DOUBLE) AS us FROM events
), t2 AS (
  SELECT event_id, us,
         (us/86400e6 + 2440587.5 - 2451545.0)/36525.0 AS jc
  FROM t1
), t3 AS (
  SELECT *,
         ((280.46646 + jc*(36000.76983 + jc*0.0003032)) % 360.0 + 360.0) % 360.0 AS gmls,
         357.52911 + jc*(35999.05029 - 0.0001537*jc) AS gmas,
         0.016708634 - jc*(0.000042037 + 0.0000001267*jc) AS eeo,
         23.0 + (26.0 + (21.448 - jc*(46.815 + jc*(0.00059 - jc*0.001813)))/60.0)/60.0
           + 0.00256*cos(radians(125.04 - 1934.136*jc)) AS oc
  FROM t2
), t3b AS (
  SELECT *,
         sin(radians(gmas))*(1.914602 - jc*(0.004817 + 0.000014*jc))
           + sin(radians(2*gmas))*(0.019993 - 0.000101*jc)
           + sin(radians(3*gmas))*0.000289 AS seqc
  FROM t3
), t4 AS (
  SELECT *,
         (gmls + seqc) - 0.00569 - 0.00478*sin(radians(125.04 - 1934.136*jc)) AS sal,
         tan(radians(oc/2.0))*tan(radians(oc/2.0)) AS vary
  FROM t3b
), t5 AS (
  SELECT *,
         degrees(asin(sin(radians(oc))*sin(radians(sal)))) AS decl,
         4.0*degrees(vary*sin(2.0*radians(gmls))
                     - 2.0*eeo*sin(radians(gmas))
                     + 4.0*eeo*vary*sin(radians(gmas))*cos(2.0*radians(gmls))
                     - 0.5*vary*vary*sin(4.0*radians(gmls))
                     - 1.25*eeo*eeo*sin(2.0*radians(gmas))) AS eot
  FROM t4
), t6 AS (
  SELECT *,
         ((us % 86400e6 + 86400e6) % 86400e6)/6e7 AS mins
  FROM t5
), t7 AS (
  SELECT *,
         (((mins + eot + 4.0*(-72.1715)) % 1440.0 + 1440.0) % 1440.0)/4.0 - 180.0 AS ha
  FROM t6
), t8 AS (
  SELECT event_id,
         round(90.0 - degrees(acos(greatest(-1.0, least(1.0,
             sin(radians(42.5378))*sin(radians(decl))
             + cos(radians(42.5378))*cos(radians(decl))*cos(radians(ha)))))), 4) AS solar_elev
  FROM t7
)
SELECT event_id, solar_elev FROM t8 WHERE solar_elev > 0 ORDER BY event_id
""",
        # identity oracle: the Gorilla/delta-of-delta chunk roundtrip is
        # lossless, so the hourly rollup of the decoded rows must equal
        # the hourly rollup of the raw events table
        "codec_roundtrip_rollup": f"""
WITH base AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_start, value FROM events
)
SELECT event_type, bucket_start, {_ROLLUP_STATS}
FROM base GROUP BY 1, 2 ORDER BY 1, 2
""",
        # same pair derivation as ngram_jaccard_verify, then min-label
        # connected components via WITH RECURSIVE (the label of every
        # node converges to the smallest doc_id in its component — the
        # same labeling dedup_clusters' pointer doubling converges to)
        "dedup_cluster_sizes": """
WITH RECURSIVE keyed AS (
  SELECT doc_id,
         md5(lower(substr(regexp_replace(trim(text), '\\s+', ' ', 'g'), 1, 16))) AS fp
  FROM documents
),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM keyed a JOIN keyed b ON a.fp = b.fp AND a.doc_id < b.doc_id
),
tok AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
  FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(words) >= 3
              THEN list_transform(range(1, len(words) - 1), i -> array_to_string(list_slice(words, i, i + 2), ' '))
              ELSE [array_to_string(words, ' ')] END AS gs
  FROM tok
),
sh AS (SELECT DISTINCT doc_id, unnest(gs) AS s FROM grams),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT p.id_a, p.id_b, count(*) AS c
  FROM cand p
  JOIN sh x ON x.doc_id = p.id_a
  JOIN sh y ON y.doc_id = p.id_b AND y.s = x.s
  GROUP BY 1, 2
),
verified AS (
  SELECT p.id_a, p.id_b
  FROM cand p
  LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
  JOIN sizes sa ON sa.doc_id = p.id_a
  JOIN sizes sb ON sb.doc_id = p.id_b
  WHERE (CAST(COALESCE(i.c, 0) AS DOUBLE) / CAST(sa.n + sb.n - COALESCE(i.c, 0) AS DOUBLE)) >= 0.5
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM verified
  UNION ALL
  SELECT id_b, id_a FROM verified
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
cc(id, label) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.dst, c.label
  FROM cc c JOIN edges e ON c.id = e.src
  WHERE c.label < e.dst
),
final AS (SELECT id, min(label) AS cluster_id FROM cc GROUP BY id),
csize AS (SELECT cluster_id, count(*) AS cluster_size FROM final GROUP BY 1)
SELECT cluster_size, count(*) AS n_clusters
FROM csize GROUP BY 1 ORDER BY 1
""",
        # full MinHash-LSH pipeline mirrored: the portable base hash
        # (two 32-bit halves of one salted md5, mod 2^31-1), the 64
        # affine minima, md5 band buckets over the comma-joined slices,
        # the band-bucket candidate join, and the exact word-3-gram
        # Jaccard verify — every stage recomputed independently
        "minhash_near_dups": """
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
  FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(words) >= 3
              THEN list_transform(range(1, len(words) - 1), i -> array_to_string(list_slice(words, i, i + 2), ' '))
              ELSE [array_to_string(words, ' ')] END AS gs
  FROM tok
),
sh AS (SELECT DISTINCT doc_id, unnest(gs) AS s FROM grams),
hs AS (
  SELECT doc_id,
         cast(concat('0x', substr(md5('42:' || s), 1, 8)) AS BIGINT) % 2147483647 AS h1,
         cast(concat('0x', substr(md5('42:' || s), 9, 8)) AS BIGINT) % 2147483647 AS h2
  FROM sh
),
mins AS (
  SELECT doc_id, t.k, min((h1 + t.k * h2) % 2147483647) AS m
  FROM hs CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS k) t
  GROUP BY doc_id, t.k
),
buckets AS (
  SELECT doc_id, (k // 4) AS band,
         md5(string_agg(m::VARCHAR, ',' ORDER BY k)) AS bucket
  FROM mins GROUP BY doc_id, (k // 4)
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a
  JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT p.id_a, p.id_b, count(*) AS c
  FROM pairs p
  JOIN sh x ON x.doc_id = p.id_a
  JOIN sh y ON y.doc_id = p.id_b AND y.s = x.s
  GROUP BY 1, 2
),
j AS (
  SELECT p.id_a, p.id_b,
         (CAST(COALESCE(i.c, 0) AS DOUBLE) / CAST(sa.n + sb.n - COALESCE(i.c, 0) AS DOUBLE)) AS jaccard
  FROM pairs p
  LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
  JOIN sizes sa ON sa.doc_id = p.id_a
  JOIN sizes sb ON sb.doc_id = p.id_b
)
SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.5 ORDER BY id_a, id_b
""",
        # bit-exact SimHash: vote bits 0-31 from the first md5 half,
        # 32-63 from the second; signed-64 assembly adds -2^63 for the
        # top bit (DuckDB's << 63 would overflow-check)
        "simhash_docs": """
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
  FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(words) >= 3
              THEN list_transform(range(1, len(words) - 1), i -> array_to_string(list_slice(words, i, i + 2), ' '))
              ELSE [array_to_string(words, ' ')] END AS gs
  FROM tok
),
sh AS (SELECT DISTINCT doc_id, unnest(gs) AS s FROM grams),
hs AS (
  SELECT doc_id,
         cast(concat('0x', substr(md5(s), 1, 8)) AS BIGINT) AS h_lo,
         cast(concat('0x', substr(md5(s), 9, 8)) AS BIGINT) AS h_hi
  FROM sh
),
votes AS (
  SELECT doc_id, t.i,
         sum(CASE WHEN (CASE WHEN t.i < 32 THEN h_lo >> t.i
                             ELSE h_hi >> (t.i - 32) END) & 1 = 1
                  THEN 1 ELSE -1 END) AS v
  FROM hs CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) t
  GROUP BY doc_id, t.i
)
SELECT doc_id AS id,
       sum(CASE WHEN v > 0
                THEN CASE WHEN i = 63 THEN -9223372036854775808 ELSE 1::BIGINT << i END
                ELSE 0 END)::BIGINT AS simhash
FROM votes GROUP BY doc_id ORDER BY id
""",
        # full-probe IVF must equal exact brute-force search — the
        # oracle is simply DuckDB's exact cosine top-k
        # the IVF invariant at full probe IS exact search: shared oracle
        "ivf_topk": _EXACT_TOPK_ORACLE,
        "ann_lsh_topk": _ann_lsh_oracle_sql(),
        "media_stub_features": _media_oracle_sql(),
        # hex_threshold(0.2) == '33333333': lowercase-hex string compare
        # is numeric order, identical in both engines
        "sample_docs_hash": """
SELECT doc_id, lang, n_chars
FROM documents
WHERE substr(md5(concat_ws('|', 'r3', CAST(doc_id AS VARCHAR))), 1, 8) < '33333333'
ORDER BY doc_id
""",
        # hex_threshold(0.25) == '40000000'
        "train_eval_split_stats": """
SELECT CASE WHEN substr(md5(concat_ws('|', 'split', CAST(doc_id AS VARCHAR))), 1, 8)
            < '40000000' THEN 'eval' ELSE 'train' END AS split,
       lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents GROUP BY 1, 2 ORDER BY 1, 2
""",
        "pack_chunks_docs": """
WITH d AS (
  SELECT source, doc_id, n_chars,
         sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id) - n_chars AS "offset"
  FROM documents
)
SELECT source, doc_id, "offset",
       "offset" // 4096 AS pack_first,
       greatest(("offset" + n_chars - 1) // 4096, "offset" // 4096) AS pack_last,
       greatest(("offset" + n_chars - 1) // 4096, "offset" // 4096)
         - "offset" // 4096 + 1 AS n_packs_spanned
FROM d ORDER BY source, doc_id
""",
        # the same first-fit walk as packing._greedy_pack_ids: new pack
        # when the open pack would overflow; oversize doc sits alone
        "pack_greedy_sizes": """
WITH RECURSIVE d AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
), walk AS (
  SELECT source, rn, n_chars, CAST(0 AS BIGINT) AS pack_id, n_chars AS fill
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.source, d.rn, d.n_chars,
         CASE WHEN w.fill + d.n_chars > 4096 THEN w.pack_id + 1 ELSE w.pack_id END,
         CASE WHEN w.fill + d.n_chars > 4096 THEN d.n_chars ELSE w.fill + d.n_chars END
  FROM walk w JOIN d ON d.source = w.source AND d.rn = w.rn + 1
)
SELECT source, pack_id, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS pack_tokens
FROM walk GROUP BY 1, 2 ORDER BY 1, 2
""",
        # word-8-gram overlap vs the doc_id%50==0 eval split; join keys
        # are the same two md5 halves the Spark side computes
        "decontam_hits": _DECONTAM_GRAMS_CTE
        + """
SELECT dgc.doc_id AS id, dgc.doc_grams, count(*) AS hit_grams,
       count(*) / dgc.doc_grams AS hit_frac
FROM dgc JOIN bg USING (gk1, gk2)
GROUP BY 1, 2 ORDER BY id
""",
        "decontam_clean_by_source": _DECONTAM_GRAMS_CTE
        + """
, bad AS (
  SELECT DISTINCT dgc.doc_id FROM dgc JOIN bg USING (gk1, gk2)
)
SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
FROM corpus
WHERE doc_id NOT IN (SELECT doc_id FROM bad)
GROUP BY source ORDER BY source
""",
        "gopher_quality_flags": r"""
WITH d AS (
  SELECT doc_id AS id, text,
         CASE WHEN coalesce(length(trim(text)), 0) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_words,
         regexp_split_to_array(trim(text), '\s+') AS w,
         string_split(text, chr(10)) AS l
  FROM documents
), m AS (
  SELECT id, n_words,
    CASE WHEN n_words > 0
         THEN length(array_to_string(w, '')) / n_words END AS mean_word_len,
    CASE WHEN n_words > 0 THEN
      ((length(text) - length(replace(text, '#', ''))) / 1
       + (length(text) - length(replace(text, '...', ''))) / 3) / n_words
      END AS symbol_ratio,
    CASE WHEN n_words > 0
         THEN len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) / n_words
         END AS alpha_word_frac,
    len(list_filter(w, x -> list_contains(
      ['the','and','of','to','is','in','that','it','for','was'], lower(x)
    ))) AS n_stopwords,
    CASE WHEN len(l) > 0
         THEN (len(l) - len(list_distinct(l))) / len(l) END AS dup_line_frac
  FROM d
)
SELECT id, n_words, mean_word_len, symbol_ratio, alpha_word_frac,
       n_stopwords, dup_line_frac,
  n_words BETWEEN 30 AND 100000 AS ok_words,
  mean_word_len BETWEEN 3.0 AND 10.0 AS ok_word_len,
  symbol_ratio <= 0.1 AS ok_symbols,
  alpha_word_frac >= 0.8 AS ok_alpha,
  n_stopwords >= 2 AS ok_stopwords,
  dup_line_frac <= 0.3 AS ok_dup_lines,
  coalesce(n_words BETWEEN 30 AND 100000
           AND mean_word_len BETWEEN 3.0 AND 10.0
           AND symbol_ratio <= 0.1 AND alpha_word_frac >= 0.8
           AND n_stopwords >= 2 AND dup_line_frac <= 0.3, false) AS keep
FROM m ORDER BY id
""",
        # modal word 2-gram per doc; ties -> lexicographically smallest
        # gram, exactly the Spark min-struct order
        "repetition_topgram": r"""
WITH d AS (
  SELECT doc_id AS id,
         lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS t
  FROM documents
), g AS (
  SELECT id, length(t) AS _len,
         unnest(list_transform(range(1, len(string_split(t, ' '))),
                i -> array_to_string((string_split(t, ' '))[i:i+1], ' '))) AS g
  FROM d WHERE len(string_split(t, ' ')) >= 2
), pg AS (
  SELECT id, _len, g, count(*) AS cnt FROM g GROUP BY 1, 2, 3
), ranked AS (
  SELECT id, _len, g, cnt,
         CAST(sum(cnt) OVER (PARTITION BY id) AS BIGINT) AS n_grams,
         row_number() OVER (PARTITION BY id ORDER BY cnt DESC, g ASC) AS rn
  FROM pg
)
SELECT id, n_grams, cnt AS top_cnt, g AS top_gram,
       cnt * length(g) / _len AS top_char_frac,
       cnt * length(g) / _len <= 0.2 AS ok_top_ngram
FROM ranked WHERE rn = 1 ORDER BY id
""",
        # the whole pipeline mirrored stage by stage: gopher keep
        # (min_words=30) -> 4-gram decontam vs the eval split -> exact
        # dedup on md5 of normalized text (lowest doc_id survives)
        "corpus_funnel": r"""
WITH all_docs AS (SELECT * FROM documents WHERE doc_id % 50 <> 0),
bench AS (SELECT * FROM documents WHERE doc_id % 50 = 0),
q AS (
  SELECT * FROM (
    SELECT d.*,
      CASE WHEN coalesce(length(trim(text)), 0) = 0 THEN 0
           ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS nw,
      regexp_split_to_array(trim(text), '\s+') AS w,
      string_split(text, chr(10)) AS l
    FROM all_docs d
  )
  WHERE coalesce(
    nw BETWEEN 30 AND 100000
    AND (length(array_to_string(w, '')) / nw) BETWEEN 3.0 AND 10.0
    AND ((length(text) - length(replace(text, '#', ''))) / 1
         + (length(text) - length(replace(text, '...', ''))) / 3) / nw <= 0.1
    AND len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) / nw >= 0.8
    AND len(list_filter(w, x -> list_contains(
      ['the','and','of','to','is','in','that','it','for','was'], lower(x)
    ))) >= 2
    AND (len(l) - len(list_distinct(l))) / len(l) <= 0.3, false)
),
bgr AS (
  SELECT DISTINCT g FROM (
    SELECT unnest(list_transform(range(1, len(bw) - 2),
                  i -> array_to_string(bw[i:i+3], ' '))) AS g
    FROM (SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS bw
          FROM bench)
    WHERE len(bw) >= 4
  )
),
hits AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(qw) - 2),
                  i -> array_to_string(qw[i:i+3], ' '))) AS g
    FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS qw
          FROM q)
    WHERE len(qw) >= 4
  ) JOIN bgr USING (g)
),
dec AS (SELECT * FROM q WHERE doc_id NOT IN (SELECT doc_id FROM hits)),
ded AS (
  SELECT * FROM dec WHERE doc_id IN (
    SELECT min(doc_id) FROM dec
    GROUP BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
  )
)
SELECT '1_input' AS stage, count(*) AS n_docs,
       coalesce(CAST(sum(n_chars) AS BIGINT), 0) AS chars FROM all_docs
UNION ALL SELECT '2_quality', count(*),
       coalesce(CAST(sum(n_chars) AS BIGINT), 0) FROM q
UNION ALL SELECT '3_decontam', count(*),
       coalesce(CAST(sum(n_chars) AS BIGINT), 0) FROM dec
UNION ALL SELECT '4_dedup', count(*),
       coalesce(CAST(sum(n_chars) AS BIGINT), 0) FROM ded
ORDER BY stage
""",
        # global boilerplate-line removal: identical 8-word line synthesis,
        # planted footer/nav lines, >=3-distinct-doc boilerplate rule, and
        # ordered reassembly (string_agg ORDER BY pos == Spark's
        # array_sort(collect_list(struct(pos,line)))); md5 pins the text
        "boilerplate_strip_docs": r"""
WITH chunked AS (
  SELECT doc_id,
         array_to_string(
           list_transform(
             range(0, CAST(ceil(len(regexp_split_to_array(trim(text), '\s+')) / 8.0) AS BIGINT)),
             i -> array_to_string(
                    list_slice(regexp_split_to_array(trim(text), '\s+'), i * 8 + 1, i * 8 + 8), ' ')),
           chr(10)) AS text
  FROM documents
),
aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'all rights reserved - example corp' ELSE '' END
         || CASE WHEN doc_id % 10 = 0 THEN chr(10) || 'home | about | contact' ELSE '' END AS text
  FROM chunked
),
lines AS (
  SELECT doc_id, u['pos'] AS pos, u['line'] AS line
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(len(ls)), i -> {'pos': i, 'line': ls[i + 1]})) AS u
    FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM aug)
  )
),
keyed AS (
  SELECT doc_id, pos, line,
         CASE WHEN length(lower(regexp_replace(trim(line), '\s+', ' ', 'g'))) > 0
              THEN md5(lower(regexp_replace(trim(line), '\s+', ' ', 'g'))) END AS line_key
  FROM lines
),
boiler AS (
  SELECT line_key FROM (
    SELECT line_key, count(DISTINCT doc_id) AS n_docs
    FROM keyed WHERE line_key IS NOT NULL GROUP BY line_key
  ) WHERE n_docs >= 3
),
kept AS (
  SELECT * FROM keyed
  WHERE line_key IS NULL OR line_key NOT IN (SELECT line_key FROM boiler)
),
rebuilt AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(line, chr(10) ORDER BY pos) AS text
  FROM kept GROUP BY doc_id
)
SELECT a.doc_id,
       CAST(len(string_split(a.text, chr(10))) AS INT) AS n_lines,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
       md5(coalesce(r.text, '')) AS clean_md5
FROM aug a LEFT JOIN rebuilt r USING (doc_id)
ORDER BY a.doc_id
""",
        # PII scrub: identical planted spans, Java∩RE2 patterns, counts on
        # the original text, sequential email->ipv4->phone redaction
        "pii_scrub_docs": r"""
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 5 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.' || CAST(doc_id % 250 AS VARCHAR)
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' tel +' || lpad(CAST(doc_id * 37 AS VARCHAR), 10, '0') ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
  CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ipv4,
  CAST(len(regexp_extract_all(text, '\+\d{9,15}\b')) AS INT) AS n_phone,
  md5(
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<email>', 'g'),
        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<ipv4>', 'g'),
      '\+\d{9,15}\b', '<phone>', 'g')
  ) AS scrubbed_md5
FROM aug ORDER BY doc_id
""",
        # mixture resampling: the keep-fraction float op order (n/w -> min
        # -> w*t/n) and the 2^-32 hex-threshold quantization mirror
        # operators/mixture + operators/sampling term for term, so the
        # surviving row SET is bit-equal
        "mixture_resample": """
WITH counts AS (
  SELECT source, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY source
),
weighted AS (
  SELECT source, n,
         CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.3
                     WHEN 'src2' THEN 0.2 ELSE 0.0 END AS w
  FROM counts
),
t AS (SELECT min(n / w) AS t FROM weighted WHERE w > 0 AND n > 0),
fr AS (
  SELECT source,
         CASE WHEN w > 0 AND n > 0 THEN w * (SELECT t FROM t) / n ELSE 0.0 END AS frac
  FROM weighted
),
th AS (
  SELECT source,
         CASE WHEN frac <= 0 THEN '0'
              WHEN frac >= 1 THEN 'g'
              ELSE printf('%08x', greatest(1, CAST(trunc(frac * 4294967296.0) AS BIGINT)))
         END AS th
  FROM fr
)
SELECT d.doc_id, d.source
FROM documents d JOIN th ON th.source = d.source
WHERE substr(md5(concat_ws('|', 'mix', CAST(d.doc_id AS VARCHAR))), 1, 8) < th.th
ORDER BY d.doc_id
""",
        # SemDeDup survivors: exact cosine pair list (same rounded-compare
        # as the embedding_near_dups oracle) -> recursive min-label
        # connected components -> drop non-minimum cluster members
        "semantic_dedup_survivors": """
WITH RECURSIVE e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE round(list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.4
),
edges AS (SELECT id_a AS src, id_b AS dst FROM p UNION ALL SELECT id_b, id_a FROM p),
nodes AS (SELECT DISTINCT src AS id FROM edges),
cc(id, label) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e2.dst, c.label FROM cc c JOIN edges e2 ON c.id = e2.src WHERE c.label < e2.dst
),
final AS (SELECT id, min(label) AS cluster_id FROM cc GROUP BY id),
losers AS (SELECT id FROM final WHERE id <> cluster_id)
SELECT vec_id FROM embeddings
WHERE vec_id NOT IN (SELECT id FROM losers)
ORDER BY vec_id
""",
        # M4 (VLDB'14): integer-us pixel assignment, struct-extreme tie
        # rules mirrored as two-level filtered aggregates.
        "m4_downsample": """
WITH base AS (
  SELECT event_type, epoch_us(ts) AS tus, value AS v
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value) AND ts IS NOT NULL
), bounds AS (
  SELECT min(tus) AS t0, max(tus) AS t1 FROM base
), bk AS (
  SELECT event_type, tus, v,
    CASE WHEN t1 > t0
         THEN least(((tus - t0) * 64) // (t1 - t0), 63)
         ELSE 0 END AS px
  FROM base, bounds
), a1 AS (
  SELECT event_type, px,
    min(tus) AS tf, max(tus) AS tl, min(v) AS vmin, max(v) AS vmax
  FROM bk GROUP BY 1, 2
), pts AS (
  SELECT b.event_type, b.px,
    min(CASE WHEN b.tus = a.tf THEN b.v END) AS vf,
    max(CASE WHEN b.tus = a.tl THEN b.v END) AS vl,
    min(CASE WHEN b.v = a.vmin THEN b.tus END) AS t_min_us,
    min(CASE WHEN b.v = a.vmax THEN b.tus END) AS t_max_us,
    any_value(a.tf) AS tf, any_value(a.tl) AS tl,
    any_value(a.vmin) AS vmin, any_value(a.vmax) AS vmax
  FROM bk b JOIN a1 a USING (event_type, px)
  GROUP BY 1, 2
)
SELECT event_type, px,
  make_timestamp(tf) AS t_first, round(vf, 6) AS v_first,
  make_timestamp(tl) AS t_last, round(vl, 6) AS v_last,
  make_timestamp(t_min_us) AS t_min, round(vmin, 6) AS v_min,
  make_timestamp(t_max_us) AS t_max, round(vmax, 6) AS v_max
FROM pts ORDER BY 1, 2
""",
        # LOCF + time-weighted linear interpolation over the gap-filled
        # hourly spine; interpolation spelled as the identical IEEE
        # sequence prev + (next - prev) * (dt / span).
        "locf_interpolate_fill": """
WITH base AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_start, value FROM events
), agg AS (
  SELECT event_type, bucket_start,
         count(value) AS n,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS DOUBLE)
           / (100.0 * CAST(count(value) AS DOUBLE)) AS v_mean
  FROM base GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(bucket_start) AS mn, max(bucket_start) AS mx
  FROM base GROUP BY 1
), spine AS (
  SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket_start
  FROM bounds
), g AS (
  SELECT s.event_type, s.bucket_start, coalesce(a.n, 0) AS n, a.v_mean,
         epoch_us(s.bucket_start) AS tus,
         CASE WHEN a.v_mean IS NOT NULL THEN epoch_us(s.bucket_start) END AS t_of
  FROM spine s LEFT JOIN agg a USING (event_type, bucket_start)
), f AS (
  SELECT event_type, bucket_start, n, v_mean, tus,
    last_value(v_mean IGNORE NULLS) OVER w_back AS prev_v,
    last_value(t_of IGNORE NULLS) OVER w_back AS prev_t,
    first_value(v_mean IGNORE NULLS) OVER w_fwd AS next_v,
    first_value(t_of IGNORE NULLS) OVER w_fwd AS next_t
  FROM g
  WINDOW
    w_back AS (PARTITION BY event_type ORDER BY bucket_start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_fwd AS (PARTITION BY event_type ORDER BY bucket_start
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, bucket_start, n, v_mean,
  prev_v AS v_locf,
  CASE WHEN v_mean IS NOT NULL THEN v_mean
       ELSE prev_v + (next_v - prev_v)
            * (CAST(tus - prev_t AS DOUBLE) / CAST(next_t - prev_t AS DOUBLE))
       END AS v_interp
FROM f ORDER BY 1, 2
""",
        # PromQL increase()/rate() with reset handling over a
        # deterministic integer sawtooth counter.
        "counter_rate_daily": """
WITH ev AS (
  SELECT user_id, ts, event_id FROM events WHERE user_id < 50
), ctr AS (
  SELECT user_id, ts, event_id,
    (sum((event_id % 7) + 1) OVER
       (PARTITION BY user_id ORDER BY ts, event_id)) % 1000 AS counter
  FROM ev
), d AS (
  SELECT user_id, date_trunc('day', ts) AS bucket_start, counter,
    counter - lag(counter) OVER
      (PARTITION BY user_id ORDER BY ts, event_id) AS delta
  FROM ctr
)
SELECT user_id, bucket_start,
  count(*) AS n_samples,
  count(CASE WHEN delta < 0 THEN 1 END) AS n_resets,
  CAST(coalesce(sum(CASE WHEN delta < 0 THEN counter ELSE delta END), 0)
       AS BIGINT) AS increase,
  round(CAST(coalesce(sum(CASE WHEN delta < 0 THEN counter ELSE delta END), 0)
        AS DOUBLE) / 86400.0, 6) AS rate_per_s
FROM d GROUP BY 1, 2 ORDER BY 1, 2
""",
        # trailing 1h RANGE window -> daily peak; integer measure so the
        # window sum is engine-exact, peak tie-broken by (n, sum).
        "sliding_window_peak": """
WITH base AS (
  SELECT event_type, ts, CAST(floor(value * 100) AS BIGINT) AS v_int
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
), slid AS (
  SELECT event_type, ts,
    count(v_int) OVER w AS w_n,
    sum(v_int) OVER w AS w_sum
  FROM base
  WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
), d AS (
  SELECT event_type, CAST(ts AS DATE) AS day, w_n, w_sum FROM slid
), mx AS (
  SELECT event_type, day, max(w_n) AS peak_n FROM d GROUP BY 1, 2
)
SELECT m.event_type, m.day, m.peak_n,
  CAST(max(d.w_sum) AS BIGINT) AS peak_sum,
  CAST(max(d.w_sum) AS DOUBLE) / CAST(m.peak_n AS DOUBLE) AS peak_avg
FROM mx m JOIN d
  ON d.event_type = m.event_type AND d.day = m.day AND d.w_n = m.peak_n
GROUP BY 1, 2, 3
ORDER BY 1, 2
""",
        # LOCF time-weighted average: each sample holds to the next (or
        # the bucket end); covered-span normalization.
        "time_weighted_avg": """
WITH base AS (
  SELECT event_type, ts, value, event_id, date_trunc('hour', ts) AS bucket_start
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value) AND ts IS NOT NULL
), d AS (
  SELECT event_type, bucket_start, value,
    epoch_us(coalesce(
      lead(ts) OVER (PARTITION BY event_type, bucket_start
                     ORDER BY ts, event_id),
      bucket_start + INTERVAL 1 HOUR)) - epoch_us(ts) AS dt
  FROM base
)
SELECT event_type, bucket_start,
  count(*) AS n_samples,
  CAST(sum(dt) AS BIGINT) AS covered_us,
  CAST(sum(CAST(floor(value * 100) AS BIGINT) * dt) AS DOUBLE)
    / (100.0 * CAST(sum(dt) AS DOUBLE)) AS twa
FROM d GROUP BY 1, 2 ORDER BY 1, 2
""",
        # epoch-anchored 15-minute buckets: integer-us modulo, the same
        # arithmetic the Spark side uses (never float bucket math)
        "rollup_15min_gapfill": f"""
WITH base AS (
  SELECT event_type,
         make_timestamp(epoch_us(ts) - epoch_us(ts) % 900000000) AS bucket_start,
         value
  FROM events
), agg AS (
  SELECT event_type, bucket_start, {_ROLLUP_STATS}
  FROM base GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(bucket_start) AS mn, max(bucket_start) AS mx FROM base GROUP BY 1
), spine AS (
  SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 15 MINUTE)) AS bucket_start FROM bounds
)
SELECT s.event_type, s.bucket_start,
       coalesce(a.n, 0) AS n, a.v_mean, a.v_std, a.v_min, a.v_max, a.v_50, a.v_75, a.v_90
FROM spine s LEFT JOIN agg a USING (event_type, bucket_start)
ORDER BY 1, 2
""",
        # trailing-window z-score anomalies: integer sums + pinned op
        # order make the moments AND the |z|>2.5 flag engine-exact
        "anomaly_zscore": """
WITH base AS (
  SELECT event_type, event_id, ts, CAST(floor(value * 100) AS BIGINT) AS v_int
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
), wnd AS (
  SELECT event_type, event_id, ts, v_int,
    count(v_int) OVER w AS n,
    CAST(sum(v_int) OVER w AS DOUBLE) AS s,
    CAST(sum(v_int * v_int) OVER w AS DOUBLE) AS sq
  FROM base
  WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
               RANGE BETWEEN 21600000000 PRECEDING AND 1 PRECEDING)
), zed AS (
  SELECT event_type, event_id, ts, v_int, n,
    sqrt(sq / CAST(n AS DOUBLE)
         - (s / CAST(n AS DOUBLE)) * (s / CAST(n AS DOUBLE))) AS std,
    (CAST(v_int AS DOUBLE) - s / CAST(n AS DOUBLE))
      / sqrt(sq / CAST(n AS DOUBLE)
             - (s / CAST(n AS DOUBLE)) * (s / CAST(n AS DOUBLE))) AS z
  FROM wnd
)
SELECT event_type, event_id, ts, v_int, n AS base_n, round(z, 6) AS z
FROM zed
WHERE n >= 20 AND std > 0 AND abs(z) > 2.5
ORDER BY event_type, event_id
""",
        # top-5 terms per source: integer-exact rank key, smooth-idf
        # score as a reported value only
        "tfidf_top_terms": """
WITH words AS (
  SELECT doc_id AS id, source,
         unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
  FROM documents
), w AS (
  SELECT * FROM words WHERE length(term) >= 3
), tf AS (
  SELECT source, term, count(*) AS tf FROM w GROUP BY 1, 2
), df AS (
  SELECT term, count(*) AS df
  FROM (SELECT DISTINCT id, term FROM w) GROUP BY 1
), n AS (
  SELECT count(*) AS n_docs FROM documents
), ranked AS (
  SELECT tf.source, tf.term, tf.tf, df.df,
    round(tf.tf * (ln(CAST(n.n_docs + 1 AS DOUBLE) / CAST(df.df + 1 AS DOUBLE)) + 1.0), 6) AS tfidf,
    row_number() OVER (PARTITION BY tf.source
                       ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rank
  FROM tf JOIN df USING (term), n
)
SELECT source, rank, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, tfidf
FROM ranked WHERE rank <= 5
ORDER BY source, rank
""",
        # density heatmap: integer floor-div value bins, engine-exact
        "value_heatmap": """
SELECT event_type, date_trunc('day', ts) AS bucket_start,
       CAST(floor(value / 50.0) AS BIGINT) AS v_bin,
       count(*) AS n
FROM events
WHERE value IS NOT NULL AND NOT isnan(value) AND ts IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""",
        # finite-window EWMA: weights are the operator's own Python
        # literals; numerator/denominator accumulate in identical j order
        "ewma_hourly": """
WITH hr AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_start,
    round(CAST(CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS DOUBLE)
          / CAST(count(*) AS DOUBLE), 6) AS v_mean
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value) AND ts IS NOT NULL
  GROUP BY 1, 2
)
SELECT event_type, bucket_start, v_mean,
  round((0.0
      + (CASE WHEN v_mean IS NOT NULL THEN CAST(0.3 AS DOUBLE) * (v_mean) ELSE 0.0 END)
      + (CASE WHEN lag(v_mean, 1) OVER w IS NOT NULL THEN CAST(0.21 AS DOUBLE) * (lag(v_mean, 1) OVER w) ELSE 0.0 END)
      + (CASE WHEN lag(v_mean, 2) OVER w IS NOT NULL THEN CAST(0.14699999999999996 AS DOUBLE) * (lag(v_mean, 2) OVER w) ELSE 0.0 END)
      + (CASE WHEN lag(v_mean, 3) OVER w IS NOT NULL THEN CAST(0.10289999999999998 AS DOUBLE) * (lag(v_mean, 3) OVER w) ELSE 0.0 END)
      + (CASE WHEN lag(v_mean, 4) OVER w IS NOT NULL THEN CAST(0.07202999999999998 AS DOUBLE) * (lag(v_mean, 4) OVER w) ELSE 0.0 END)
      + (CASE WHEN lag(v_mean, 5) OVER w IS NOT NULL THEN CAST(0.05042099999999998 AS DOUBLE) * (lag(v_mean, 5) OVER w) ELSE 0.0 END)
      + (CASE WHEN lag(v_mean, 6) OVER w IS NOT NULL THEN CAST(0.035294699999999984 AS DOUBLE) * (lag(v_mean, 6) OVER w) ELSE 0.0 END)
      + (CASE WHEN lag(v_mean, 7) OVER w IS NOT NULL THEN CAST(0.02470628999999999 AS DOUBLE) * (lag(v_mean, 7) OVER w) ELSE 0.0 END)) / (0.0
      + (CASE WHEN v_mean IS NOT NULL THEN CAST(0.3 AS DOUBLE) ELSE 0.0 END)
      + (CASE WHEN lag(v_mean, 1) OVER w IS NOT NULL THEN CAST(0.21 AS DOUBLE) ELSE 0.0 END)
      + (CASE WHEN lag(v_mean, 2) OVER w IS NOT NULL THEN CAST(0.14699999999999996 AS DOUBLE) ELSE 0.0 END)
      + (CASE WHEN lag(v_mean, 3) OVER w IS NOT NULL THEN CAST(0.10289999999999998 AS DOUBLE) ELSE 0.0 END)
      + (CASE WHEN lag(v_mean, 4) OVER w IS NOT NULL THEN CAST(0.07202999999999998 AS DOUBLE) ELSE 0.0 END)
      + (CASE WHEN lag(v_mean, 5) OVER w IS NOT NULL THEN CAST(0.05042099999999998 AS DOUBLE) ELSE 0.0 END)
      + (CASE WHEN lag(v_mean, 6) OVER w IS NOT NULL THEN CAST(0.035294699999999984 AS DOUBLE) ELSE 0.0 END)
      + (CASE WHEN lag(v_mean, 7) OVER w IS NOT NULL THEN CAST(0.02470628999999999 AS DOUBLE) ELSE 0.0 END)), 6) AS ewma
FROM hr
WINDOW w AS (PARTITION BY event_type ORDER BY bucket_start)
ORDER BY 1, 2
""",
        # per-bucket OLS fit: BIGINT moment sums (order-free), then the
        # identical pinned double op order as operators/rate.linear_trend
        "linear_trend_daily": """
WITH base AS (
  SELECT event_type, date_trunc('day', ts) AS bucket_start,
    CAST(floor((epoch_us(ts) - epoch_us(CAST(date_trunc('day', ts) AS TIMESTAMP)))
               / 1000000.0) AS BIGINT) AS x,
    CAST(floor(value * 100) AS BIGINT) AS y
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value) AND ts IS NOT NULL
), sums AS (
  SELECT event_type, bucket_start,
    count(*) AS n,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy,
    CAST(sum(y * y) AS BIGINT) AS syy
  FROM base GROUP BY 1, 2
), d AS (
  SELECT event_type, bucket_start, n,
    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov_n,
    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx_n,
    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary_n,
    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
  FROM sums
)
SELECT event_type, CAST(bucket_start AS TIMESTAMP) AS bucket_start, n,
  CASE WHEN n >= 2 AND varx_n > 0 THEN cov_n / varx_n END AS slope,
  CASE WHEN n >= 2 AND varx_n > 0
       THEN (syd - (cov_n / varx_n) * sxd) / CAST(n AS DOUBLE) END AS intercept,
  CASE WHEN n >= 2 AND varx_n > 0 AND vary_n > 0
       THEN cov_n / (sqrt(varx_n) * sqrt(vary_n)) END AS corr
FROM d ORDER BY 1, 2
""",
        # exact distinct cardinality per bucket
        "distinct_users_daily": """
SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
  count(*) AS n_rows,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events WHERE ts IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
""",
        # histogram_quantile over the value_heatmap bins: integer
        # cumulative counts, pinned interpolation order
        "histogram_quantile": """
WITH hm AS (
  SELECT event_type, date_trunc('day', ts) AS bucket_start,
    CAST(floor(value / 50.0) AS BIGINT) AS v_bin, count(*) AS n
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value) AND ts IS NOT NULL
  GROUP BY 1, 2, 3
), c AS (
  SELECT event_type, bucket_start, v_bin,
    CAST(n AS DOUBLE) AS nd,
    CAST(sum(n) OVER (PARTITION BY event_type, bucket_start
                      ORDER BY v_bin) AS DOUBLE) AS cum,
    CAST(sum(n) OVER (PARTITION BY event_type, bucket_start) AS DOUBLE) AS total
  FROM hm
)
SELECT event_type, CAST(bucket_start AS TIMESTAMP) AS bucket_start,
  CAST(total AS BIGINT) AS total_n, CAST(0.9 AS DOUBLE) AS q,
  round(CAST(v_bin AS DOUBLE) * 50.0
        + 50.0 * (CAST(0.9 AS DOUBLE) * total - (cum - nd)) / nd, 6) AS est
FROM c
WHERE (cum - nd) < CAST(0.9 AS DOUBLE) * total
  AND CAST(0.9 AS DOUBLE) * total <= cum
ORDER BY 1, 2
""",
        # heartbeat uptime: gaps-and-islands merge, integer-us clipping
        "interval_coverage": """
WITH t AS (
  SELECT event_type, epoch_us(ts) AS t FROM events WHERE ts IS NOT NULL
), m AS (
  SELECT event_type, t,
    CASE WHEN lag(t) OVER w IS NULL OR t > lag(t) OVER w + 300000000
         THEN 1 ELSE 0 END AS brk
  FROM t WINDOW w AS (PARTITION BY event_type ORDER BY t)
), isl0 AS (
  SELECT event_type, t,
    sum(brk) OVER (PARTITION BY event_type ORDER BY t
                   ROWS UNBOUNDED PRECEDING) AS iid
  FROM m
), isl AS (
  SELECT event_type, iid, min(t) AS s, max(t) + 300000000 AS e
  FROM isl0 GROUP BY 1, 2
), ex AS (
  SELECT event_type, s, e,
    unnest(generate_series(s // 3600000000, (e - 1) // 3600000000)) AS bidx
  FROM isl
), ov AS (
  SELECT event_type, bidx,
    least(e, (bidx + 1) * 3600000000) - greatest(s, bidx * 3600000000) AS ovl
  FROM ex
)
SELECT event_type, make_timestamp(bidx * 3600000000) AS bucket_start,
  count(*) AS n_islands,
  CAST(sum(ovl) AS BIGINT) AS uptime_us,
  round(CAST(CAST(sum(ovl) AS BIGINT) AS DOUBLE)
        / CAST(3600000000 AS DOUBLE), 6) AS uptime_frac
FROM ov GROUP BY 1, 2 ORDER BY 1, 2
""",
        # weekly seasonal slots: integer sums -> pinned mean/std
        "seasonal_profile_hourly": """
WITH base AS (
  SELECT event_type, dayofweek(ts) + 1 AS dow, hour(ts) AS hour,
    CAST(floor(value * 100) AS BIGINT) AS v
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value) AND ts IS NOT NULL
), s AS (
  SELECT event_type, dow, hour, count(*) AS n,
    CAST(sum(v) AS BIGINT) AS sv, CAST(sum(v * v) AS BIGINT) AS sq
  FROM base GROUP BY 1, 2, 3
)
SELECT event_type, dow, hour, n,
  CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
  sqrt(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)
       - (CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
         * (CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))) AS std
FROM s ORDER BY 1, 2, 3
""",
        # broadcast seasonal scoring -> flagged counts; identical z
        # algebra on both engines (slot moments from integer sums)
        "seasonal_anomaly_counts": """
WITH base AS (
  SELECT event_type, dayofweek(ts) + 1 AS dow, hour(ts) AS hour,
    CAST(floor(value * 100) AS BIGINT) AS v
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value) AND ts IS NOT NULL
), s AS (
  SELECT event_type, dow, hour, count(*) AS n,
    CAST(sum(v) AS BIGINT) AS sv, CAST(sum(v * v) AS BIGINT) AS sq
  FROM base GROUP BY 1, 2, 3
), p AS (
  SELECT event_type, dow, hour, n,
    CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
    sqrt(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)
         - (CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))) AS std
  FROM s
), j AS (
  SELECT b.event_type, b.dow, b.v, p.n, p.mean, p.std
  FROM base b JOIN p USING (event_type, dow, hour)
)
SELECT event_type, dow, count(*) AS n_rows,
  count(CASE WHEN n >= 20 AND std > 0
             AND abs((CAST(v AS DOUBLE) - mean) / std) > CAST(2.5 AS DOUBLE)
        THEN 1 END) AS n_anom
FROM j GROUP BY 1, 2 ORDER BY 1, 2
""",
        # adjacent-pair transition counts per user sequence
        "event_transition_matrix": """
WITH d AS (
  SELECT user_id, event_type,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
)
SELECT prev AS from_state, event_type AS to_state, count(*) AS n
FROM d WHERE prev IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
""",
        # ordered funnel: chained min-after-previous-step aggregates,
        # 7-day max gap per step, identical earliest-completion algebra
        "funnel_conversion": """
WITH base AS (
  SELECT user_id, event_type AS s, epoch_us(ts) AS t
  FROM events
  WHERE ts IS NOT NULL AND event_type IN ('signup', 'click', 'purchase')
), s1 AS (
  SELECT user_id, min(t) AS t1 FROM base WHERE s = 'signup' GROUP BY 1
), s2 AS (
  SELECT b.user_id, min(b.t) AS t2
  FROM base b JOIN s1 USING (user_id)
  WHERE b.s = 'click' AND b.t > s1.t1 AND b.t <= s1.t1 + 604800000000
  GROUP BY 1
), s3 AS (
  SELECT b.user_id, min(b.t) AS t3
  FROM base b JOIN s2 USING (user_id)
  WHERE b.s = 'purchase' AND b.t > s2.t2 AND b.t <= s2.t2 + 604800000000
  GROUP BY 1
)
SELECT 1 AS step, count(*) AS n_reached FROM s1
UNION ALL SELECT 2 AS step, count(*) AS n_reached FROM s2
UNION ALL SELECT 3 AS step, count(*) AS n_reached FROM s3
ORDER BY step
""",
        # cohort retention: epoch-anchored weeks, integer offsets
        "cohort_retention_weekly": """
WITH p AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS p
  FROM events WHERE ts IS NOT NULL
), f AS (
  SELECT user_id, min(p) AS p0 FROM p GROUP BY 1
)
SELECT make_timestamp(f.p0 * 604800000000) AS cohort_start,
  p.p - f.p0 AS offset, count(*) AS n_active
FROM p JOIN f USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
""",
        # inter-step conversion timing over the same funnel algebra
        "funnel_step_timing": """
WITH base AS (
  SELECT user_id, event_type AS s, epoch_us(ts) AS t
  FROM events
  WHERE ts IS NOT NULL AND event_type IN ('signup', 'click', 'purchase')
), s1 AS (
  SELECT user_id, min(t) AS t1 FROM base WHERE s = 'signup' GROUP BY 1
), s2 AS (
  SELECT b.user_id, min(b.t) AS t2
  FROM base b JOIN s1 USING (user_id)
  WHERE b.s = 'click' AND b.t > s1.t1 AND b.t <= s1.t1 + 604800000000
  GROUP BY 1
), s3 AS (
  SELECT b.user_id, min(b.t) AS t3
  FROM base b JOIN s2 USING (user_id)
  WHERE b.s = 'purchase' AND b.t > s2.t2 AND b.t <= s2.t2 + 604800000000
  GROUP BY 1
), u AS (
  SELECT s1.user_id, s1.t1, s2.t2, s3.t3
  FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
)
SELECT 2 AS step, count(t2 - t1) AS n_converted,
  quantile_cont(t2 - t1, 0.5) / CAST(1000000 AS DOUBLE) AS median_s,
  quantile_cont(t2 - t1, 0.9) / CAST(1000000 AS DOUBLE) AS p90_s
FROM u
UNION ALL
SELECT 3 AS step, count(t3 - t2) AS n_converted,
  quantile_cont(t3 - t2, 0.5) / CAST(1000000 AS DOUBLE) AS median_s,
  quantile_cont(t3 - t2, 0.9) / CAST(1000000 AS DOUBLE) AS p90_s
FROM u
ORDER BY step
""",
        # heavy hitters per bucket: counts first, rank over aggregates
        "top_event_users_daily": """
WITH c AS (
  SELECT event_type, date_trunc('day', ts) AS bucket_start,
    user_id AS key, count(*) AS n
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
  GROUP BY 1, 2, 3
), r AS (
  SELECT event_type, bucket_start, key, n,
    row_number() OVER (PARTITION BY event_type, bucket_start
                       ORDER BY n DESC, key ASC) AS rank
  FROM c
)
SELECT event_type, CAST(bucket_start AS TIMESTAMP) AS bucket_start,
  CAST(rank AS INTEGER) AS rank, key, n
FROM r WHERE rank <= 3
ORDER BY event_type, bucket_start, rank
""",
        # week-over-week via the exact-offset RANGE frame
        "pop_wow_daily": """
WITH daily AS (
  SELECT event_type,
    CAST(CAST(ts AS DATE) AS TIMESTAMP) AS bucket_start,
    CAST(CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS DOUBLE)
      / CAST(count(*) AS DOUBLE) AS v_mean
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value) AND ts IS NOT NULL
  GROUP BY 1, 2
), w AS (
  SELECT event_type, bucket_start, v_mean,
    max(v_mean) OVER (PARTITION BY event_type ORDER BY epoch_us(bucket_start)
                      RANGE BETWEEN 604800000000 PRECEDING
                                AND 604800000000 PRECEDING) AS prev_raw
  FROM daily
)
SELECT event_type, bucket_start, v_mean,
  prev_raw AS prev_value,
  v_mean - prev_raw AS delta,
  CASE WHEN prev_raw <> 0 THEN (v_mean - prev_raw) / prev_raw END AS pct_change
FROM w ORDER BY 1, 2
""",
        # hysteresis: last-non-null-edge window, identical on both engines
        "threshold_alert_episodes": """
WITH base AS (
  SELECT event_type, ts, event_id, CAST(floor(value * 100) AS BIGINT) AS v
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value) AND ts IS NOT NULL
), e AS (
  SELECT event_type, ts, event_id,
    CASE WHEN CAST(v AS DOUBLE) >= CAST(30000 AS DOUBLE) THEN 1
         WHEN CAST(v AS DOUBLE) <= CAST(5000 AS DOUBLE) THEN 0 END AS edge
  FROM base
), s AS (
  SELECT event_type,
    coalesce(last_value(edge IGNORE NULLS) OVER w, 0) AS alert_state,
    CASE WHEN edge = 1 AND coalesce(last_value(edge IGNORE NULLS) OVER
      (PARTITION BY event_type ORDER BY ts, event_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) = 0
      THEN 1 ELSE 0 END AS rising
  FROM e
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, count(*) AS n_rows,
  CAST(sum(alert_state) AS BIGINT) AS alert_rows,
  CAST(sum(rising) AS BIGINT) AS n_episodes
FROM s GROUP BY 1 ORDER BY 1
""",
        # zone-map chunk reads: source rows through the identical window
        "chunks_range_decode": """
SELECT event_type, count(*) AS n,
  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v_sum,
  min(ts) AS ts_first, max(ts) AS ts_last
FROM events
WHERE ts >= TIMESTAMP '2024-01-08 06:00:00'
  AND ts <= TIMESTAMP '2024-01-15 18:00:00'
  AND value IS NOT NULL AND NOT isnan(value)
GROUP BY 1 ORDER BY 1
""",
        # snapshot table versions rebuilt straight from the source rows:
        # v1 = even ids, v2 = all, v3 = MERGE of (+1000 on every 5th id)
        "snapshot_time_travel": """
WITH v3 AS (
  SELECT event_id, event_type,
    CASE WHEN event_id % 5 = 0 THEN value + 1000 ELSE value END AS value
  FROM events),
all_v AS (
  SELECT 1 AS version, event_id, event_type, value FROM events WHERE event_id % 2 = 0
  UNION ALL SELECT 2, event_id, event_type, value FROM events
  UNION ALL SELECT 3, event_id, event_type, value FROM v3)
SELECT version, event_type, count(*) AS n,
  CAST(sum(event_id) AS BIGINT) AS id_sum,
  CAST(sum(CASE WHEN value IS NOT NULL AND NOT isnan(value)
       THEN CAST(floor(value * 100) AS BIGINT) END) AS BIGINT) AS v_sum
FROM all_v GROUP BY 1, 2 ORDER BY 1, 2
""",
        # total-variation drift: exact integer numerator, one pinned division
        "value_drift_events": """
WITH binned AS (
  SELECT event_type, CAST(floor(value / 50.0) AS BIGINT) AS v_bin,
    sum(CASE WHEN ts >= TIMESTAMP '2024-02-01 00:00:00' THEN 0 ELSE 1 END) AS nb,
    sum(CASE WHEN ts >= TIMESTAMP '2024-02-01 00:00:00' THEN 1 ELSE 0 END) AS na
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1, 2
), tot AS (
  SELECT event_type, sum(nb) AS tb, sum(na) AS ta FROM binned GROUP BY 1
), m AS (
  SELECT b.event_type, max(t.tb) AS tb, max(t.ta) AS ta,
    sum(abs(b.nb * t.ta - b.na * t.tb)) AS num
  FROM binned b JOIN tot t USING (event_type)
  GROUP BY 1
)
SELECT event_type, CAST(tb AS BIGINT) AS n_before, CAST(ta AS BIGINT) AS n_after,
  round(CASE WHEN tb > 0 AND ta > 0 THEN
    CAST(num AS DOUBLE) / (CAST(tb AS DOUBLE) * CAST(ta AS DOUBLE)) / 2.0
  END, 6) AS drift
FROM m GROUP BY 1, 2, 3, 4 ORDER BY 1
""",
        # naive / seasonal-naive backtest over daily integer bucket sums
        "forecast_backtest_daily": """
WITH s AS (
  SELECT event_type, CAST(ts AS DATE) AS b,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1, 2
), p AS (
  SELECT x.event_type, k.lag, y.v - x.v AS err
  FROM (VALUES (1), (7)) k(lag)
  CROSS JOIN s x
  JOIN s y ON y.event_type = x.event_type AND y.b = x.b + k.lag
), m AS (
  SELECT event_type, lag, count(*) AS cnt,
    sum(abs(err)) AS sabs, sum(err * err) AS ssq
  FROM p GROUP BY 1, 2
)
SELECT event_type, lag, CAST(cnt AS BIGINT) AS n,
  (CAST(sabs AS DOUBLE) / CAST(cnt AS DOUBLE)) / 100.0 AS mae,
  sqrt(CAST(ssq AS DOUBLE) / CAST(cnt AS DOUBLE)) / 100.0 AS rmse
FROM m ORDER BY 1, 2
""",
        # pruned snapshot read == the plain filter over the source rows
        "snapshot_pruned_read": """
SELECT event_type, count(*) AS n,
  CAST(sum(event_id) AS BIGINT) AS id_sum,
  CAST(sum(CASE WHEN value IS NOT NULL AND NOT isnan(value)
       THEN CAST(floor(value * 100) AS BIGINT) END) AS BIGINT) AS v_sum
FROM events
WHERE strftime(ts, '%Y-%m-%d') IN ('2024-01-03', '2024-01-17', '2024-02-02')
  AND value >= 100.0 AND value <= 300.0
GROUP BY 1 ORDER BY 1
""",
        # interpolated time join: identical union + paired IGNORE NULLS
        # windows + the fill_series pinned interpolation op order
        "asof_interpolated_join": """
WITH l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), r0 AS (
  SELECT user_id, ts, min(value) AS rv FROM events
  WHERE event_type = 'view' AND value IS NOT NULL GROUP BY 1, 2
), u AS (
  SELECT event_id, user_id, ts, CAST(NULL AS DOUBLE) AS rv, 1 AS is_left FROM l
  UNION ALL SELECT NULL, user_id, ts, rv, 0 FROM r0
), w AS (
  SELECT *,
    last_value(CASE WHEN is_left = 0 THEN epoch_us(ts) END IGNORE NULLS) OVER w_back AS pt,
    last_value(CASE WHEN is_left = 0 THEN rv END IGNORE NULLS) OVER w_back AS pv,
    first_value(CASE WHEN is_left = 0 THEN epoch_us(ts) END IGNORE NULLS) OVER w_fwd AS nt,
    first_value(CASE WHEN is_left = 0 THEN rv END IGNORE NULLS) OVER w_fwd AS nv
  FROM u
  WINDOW
    w_back AS (PARTITION BY user_id ORDER BY ts, is_left
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_fwd AS (PARTITION BY user_id ORDER BY ts, is_left
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_id, user_id,
  round(CASE
    WHEN pt IS NOT NULL AND nt IS NOT NULL THEN
      CASE WHEN nt = pt THEN pv
           ELSE pv + (nv - pv)
                * (CAST(epoch_us(ts) - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE)) END
    WHEN pt IS NOT NULL THEN pv
    ELSE nv END, 6) AS view_value_interp
FROM w WHERE is_left = 1 ORDER BY event_id
""",
        # cross-series Pearson over daily integer bucket sums — HUGEINT
        # moment sums (exact), one pinned double op order at the end
        "series_correlation_daily": """
WITH s AS (
  SELECT event_type, CAST(ts AS DATE) AS b,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1, 2
), p AS (
  SELECT x.event_type AS series_a, y.event_type AS series_b,
         x.v AS va, y.v AS vb
  FROM s x JOIN s y USING (b) WHERE x.event_type < y.event_type
), m AS (
  SELECT series_a, series_b, count(*) AS cnt,
    sum(va) AS sx, sum(vb) AS sy,
    sum(va * va) AS sxx, sum(va * vb) AS sxy, sum(vb * vb) AS syy
  FROM p GROUP BY 1, 2
)
SELECT series_a, series_b, CAST(cnt AS BIGINT) AS n,
  round(CASE WHEN cnt >= 2
          AND (CAST(cnt AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
          AND (CAST(cnt AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
        THEN (CAST(cnt AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(cnt AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(CAST(cnt AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        END, 6) AS corr
FROM m ORDER BY 1, 2
""",
        # sample ACF at daily lags 1/2/7 over the same integer bucket sums
        "autocorrelation_daily": """
WITH s AS (
  SELECT event_type, CAST(ts AS DATE) AS b,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1, 2
), p AS (
  SELECT x.event_type, k.lag, x.v AS va, y.v AS vb
  FROM (VALUES (1), (2), (7)) k(lag)
  CROSS JOIN s x
  JOIN s y ON y.event_type = x.event_type AND y.b = x.b + k.lag
), m AS (
  SELECT event_type, lag, count(*) AS cnt,
    sum(va) AS sx, sum(vb) AS sy,
    sum(va * va) AS sxx, sum(va * vb) AS sxy, sum(vb * vb) AS syy
  FROM p GROUP BY 1, 2
)
SELECT event_type, lag, CAST(cnt AS BIGINT) AS n,
  round(CASE WHEN cnt >= 2
          AND (CAST(cnt AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
          AND (CAST(cnt AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
        THEN (CAST(cnt AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(cnt AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(CAST(cnt AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        END, 6) AS corr
FROM m ORDER BY 1, 2
""",
        # directional lead-lag: ordered series pairs, b shifted by lag days
        "leadlag_correlation_daily": """
WITH s AS (
  SELECT event_type, CAST(ts AS DATE) AS b,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1, 2
), p AS (
  SELECT x.event_type AS series_a, y.event_type AS series_b, k.lag,
         x.v AS va, y.v AS vb
  FROM (VALUES (0), (1)) k(lag)
  CROSS JOIN s x
  JOIN s y ON y.event_type <> x.event_type AND y.b = x.b + k.lag
), m AS (
  SELECT series_a, series_b, lag, count(*) AS cnt,
    sum(va) AS sx, sum(vb) AS sy,
    sum(va * va) AS sxx, sum(va * vb) AS sxy, sum(vb * vb) AS syy
  FROM p GROUP BY 1, 2, 3
)
SELECT series_a, series_b, lag, CAST(cnt AS BIGINT) AS n,
  round(CASE WHEN cnt >= 2
          AND (CAST(cnt AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
          AND (CAST(cnt AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
        THEN (CAST(cnt AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(cnt AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(CAST(cnt AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        END, 6) AS corr
FROM m ORDER BY 1, 2, 3
""",
        # hourly candlestick bars: open/close via lexicographic struct
        # min/max on (epoch-us, event_id, v) — the identical comparison
        # Spark's struct aggregate performs; BIGINT VWAP sums, one
        # pinned final division.
        "ohlc_vwap_hourly": """
WITH base AS (
  SELECT event_type, ts, event_id,
    CAST(floor(value * 100) AS BIGINT) AS v,
    CAST((event_id % 97) + 1 AS BIGINT) AS w,
    date_trunc('hour', ts) AS bucket_start
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
)
SELECT event_type, bucket_start,
  count(*) AS n,
  CAST((min({'t': epoch_us(ts), 'e': event_id, 'v': v})).v AS BIGINT) AS open,
  CAST(max(v) AS BIGINT) AS high,
  CAST(min(v) AS BIGINT) AS low,
  CAST((max({'t': epoch_us(ts), 'e': event_id, 'v': v})).v AS BIGINT) AS close,
  CAST(sum(w) AS BIGINT) AS w_sum,
  CAST(sum(v * w) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS vwap
FROM base GROUP BY 1, 2 ORDER BY 1, 2
""",
        # LOCF time-in-state: each sample holds to the next (or the
        # fixed 2024-02-01 cut), intervals clipped onto hourly buckets
        # with the interval_coverage integer-us div/clip arithmetic.
        "state_durations_hourly": """
WITH base AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS t,
    epoch_us(TIMESTAMP '2024-02-01 00:00:00') AS cut
  FROM events
  WHERE user_id < 20 AND ts IS NOT NULL AND event_type IS NOT NULL
), led AS (
  SELECT user_id, event_type, t,
    least(coalesce(lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id),
                   cut), cut) AS e
  FROM base
), ex AS (
  SELECT user_id, event_type, t, e,
    unnest(generate_series(t // 3600000000, (e - 1) // 3600000000)) AS bidx
  FROM led WHERE e > t
)
SELECT user_id, make_timestamp(bidx * 3600000000) AS bucket_start,
  event_type AS state,
  count(CASE WHEN t // 3600000000 = bidx THEN 1 END) AS n_samples,
  CAST(sum(least(e, (bidx + 1) * 3600000000) - greatest(t, bidx * 3600000000))
       AS BIGINT) AS dur_us,
  round(CAST(sum(least(e, (bidx + 1) * 3600000000) - greatest(t, bidx * 3600000000))
        AS DOUBLE) / 3600000000.0, 6) AS dur_frac
FROM ex GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
""",
        # trailing 1h rolling MEDIAN (RANGE frame, exact linear
        # interpolation at q=0.5 over BIGINTs -> (a+b)/2 exact) reduced
        # to daily extremes.
        "rolling_median_daily": """
WITH base AS (
  SELECT event_type, ts, CAST(floor(value * 100) AS BIGINT) AS v
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
), slid AS (
  SELECT event_type, ts,
    CAST(quantile_cont(v, 0.5) OVER w AS DOUBLE) AS med
  FROM base
  WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
)
SELECT event_type, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
  count(*) AS n,
  round(max(med), 6) AS med_max,
  round(min(med), 6) AS med_min
FROM slid GROUP BY 1, 2 ORDER BY 1, 2
""",
        # per-user inter-event gaps >= 36h; first sample opens no gap,
        # ts ties are zero gaps. Integer-us exact, one pinned division.
        "gap_report_users": """
WITH d AS (
  SELECT user_id, epoch_us(ts) AS t,
    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      AS prev
  FROM events WHERE ts IS NOT NULL
)
SELECT user_id,
  make_timestamp(prev) AS gap_start,
  make_timestamp(t) AS gap_end,
  CAST(t - prev AS BIGINT) AS gap_us,
  round(CAST(t - prev AS DOUBLE) / 1000000.0, 6) AS gap_s
FROM d
WHERE prev IS NOT NULL AND t - prev >= 129600000000
ORDER BY user_id, gap_start
""",
        # Holt-Winters additive: the RECURSIVE CTE carries the 7
        # seasonal indices as a LIST column (head = s_{t-m}, rotated
        # each step); every float literal is the Python-computed repr
        # (1-alpha etc.) and the op order matches rate.py verbatim.
        "holt_winters_weekly": f"""
WITH RECURSIVE base AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value) AND ts IS NOT NULL
  GROUP BY 1, 2
), rnk AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY bucket_start) AS rn
  FROM base
), init AS (
  SELECT event_type,
    CAST(sum(CASE WHEN rn <= 7 THEN x END) AS DOUBLE) / 7.0 AS l0,
    (CAST(sum(CASE WHEN rn > 7 AND rn <= 14 THEN x END) AS DOUBLE) / 7.0
       - CAST(sum(CASE WHEN rn <= 7 THEN x END) AS DOUBLE) / 7.0) / 7.0 AS b0
  FROM rnk GROUP BY 1
), seas0 AS (
  SELECT r.event_type, list(CAST(r.x AS DOUBLE) - i.l0 ORDER BY r.rn) AS seas
  FROM rnk r JOIN init i USING (event_type) WHERE r.rn <= 7 GROUP BY 1
), walk AS (
  SELECT i.event_type, CAST(7 AS BIGINT) AS rn, i.l0 AS level, i.b0 AS trend,
         s.seas AS seas, CAST(NULL AS DOUBLE) AS fitted, CAST(NULL AS DOUBLE) AS snew
  FROM init i JOIN seas0 s USING (event_type)
  UNION ALL
  SELECT w.event_type, w.rn + 1,
    {0.3!r} * (CAST(p.x AS DOUBLE) - w.seas[1]) + {1.0 - 0.3!r} * (w.level + w.trend),
    {0.05!r} * (({0.3!r} * (CAST(p.x AS DOUBLE) - w.seas[1])
                 + {1.0 - 0.3!r} * (w.level + w.trend)) - w.level)
      + {1.0 - 0.05!r} * w.trend,
    w.seas[2:] || [{0.2!r} * (CAST(p.x AS DOUBLE) - (w.level + w.trend))
                   + {1.0 - 0.2!r} * w.seas[1]],
    w.level + w.trend + w.seas[1],
    {0.2!r} * (CAST(p.x AS DOUBLE) - (w.level + w.trend)) + {1.0 - 0.2!r} * w.seas[1]
  FROM walk w
  JOIN rnk p ON p.event_type = w.event_type AND p.rn = w.rn + 1
)
SELECT r.event_type, r.bucket_start, r.x,
  round(CASE WHEN r.rn >= 7 THEN w.level END, 6) AS level,
  round(CASE WHEN r.rn >= 7 THEN w.trend END, 6) AS trend,
  round(CASE WHEN r.rn < 7 THEN CAST(r.x AS DOUBLE) - i.l0
             WHEN r.rn = 7 THEN w.seas[7]
             ELSE w.snew END, 6) AS seasonal,
  round(w.fitted, 6) AS fitted
FROM rnk r
JOIN init i USING (event_type)
LEFT JOIN walk w ON w.event_type = r.event_type AND w.rn = r.rn
ORDER BY 1, 2
""",
        # SAX: daily PAA means z-scored against per-series moments
        # (exact re-aggregation of BIGINT bucket sums), symbol = count
        # of Gaussian breakpoints <= z (comparisons only).
        "sax_daily_symbols": """
WITH base AS (
  SELECT event_type, date_trunc('day', ts) AS bucket_start,
    CAST(floor(value * 100) AS BIGINT) AS v
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
), pb AS (
  SELECT event_type, bucket_start, count(*) AS n,
    CAST(sum(v) AS BIGINT) AS s, CAST(sum(v * v) AS BIGINT) AS sq
  FROM base GROUP BY 1, 2
), mo AS (
  SELECT event_type,
    CAST(sum(s) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS mu,
    sqrt(CAST(sum(sq) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
         - (CAST(sum(s) AS DOUBLE) / CAST(sum(n) AS DOUBLE))
           * (CAST(sum(s) AS DOUBLE) / CAST(sum(n) AS DOUBLE))) AS sigma
  FROM pb GROUP BY 1
), z AS (
  SELECT p.event_type, p.bucket_start, p.n,
    CAST(p.s AS DOUBLE) / CAST(p.n AS DOUBLE) AS paa,
    (CAST(p.s AS DOUBLE) / CAST(p.n AS DOUBLE) - m.mu) / m.sigma AS zv,
    m.sigma AS sigma
  FROM pb p JOIN mo m USING (event_type)
)
SELECT event_type, bucket_start, n,
  round(paa, 6) AS paa_mean,
  round(CASE WHEN sigma > 0 THEN zv END, 6) AS z,
  CASE WHEN sigma > 0 THEN substring('abcd',
    1 + CAST(zv >= -0.6744898 AS INT) + CAST(zv >= 0.0 AS INT)
      + CAST(zv >= 0.6744898 AS INT), 1) END AS symbol
FROM z ORDER BY 1, 2
""",
        # top-3 SAX 3-letter words per series; a NULL symbol anywhere
        # in the window forms no word (concat-NULL semantics).
        "sax_motif_top": """
WITH base AS (
  SELECT event_type, date_trunc('day', ts) AS bucket_start,
    CAST(floor(value * 100) AS BIGINT) AS v
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
), pb AS (
  SELECT event_type, bucket_start, count(*) AS n,
    CAST(sum(v) AS BIGINT) AS s, CAST(sum(v * v) AS BIGINT) AS sq
  FROM base GROUP BY 1, 2
), mo AS (
  SELECT event_type,
    CAST(sum(s) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS mu,
    sqrt(CAST(sum(sq) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
         - (CAST(sum(s) AS DOUBLE) / CAST(sum(n) AS DOUBLE))
           * (CAST(sum(s) AS DOUBLE) / CAST(sum(n) AS DOUBLE))) AS sigma
  FROM pb GROUP BY 1
), sym AS (
  SELECT p.event_type, p.bucket_start,
    CASE WHEN m.sigma > 0 THEN substring('abcd',
      1 + CAST((CAST(p.s AS DOUBLE) / CAST(p.n AS DOUBLE) - m.mu) / m.sigma >= -0.6744898 AS INT)
        + CAST((CAST(p.s AS DOUBLE) / CAST(p.n AS DOUBLE) - m.mu) / m.sigma >= 0.0 AS INT)
        + CAST((CAST(p.s AS DOUBLE) / CAST(p.n AS DOUBLE) - m.mu) / m.sigma >= 0.6744898 AS INT),
      1) END AS symbol
  FROM pb p JOIN mo m USING (event_type)
), words AS (
  SELECT event_type,
    symbol
      || lead(symbol, 1) OVER (PARTITION BY event_type ORDER BY bucket_start)
      || lead(symbol, 2) OVER (PARTITION BY event_type ORDER BY bucket_start)
      AS word
  FROM sym
), cnts AS (
  SELECT event_type, word, count(*) AS cnt
  FROM words WHERE word IS NOT NULL GROUP BY 1, 2
), rk AS (
  SELECT event_type, word, cnt,
    row_number() OVER (PARTITION BY event_type ORDER BY cnt DESC, word ASC) AS rank
  FROM cnts
)
SELECT event_type, CAST(rank AS INT) AS rank, word, cnt
FROM rk WHERE rank <= 3 ORDER BY event_type, rank
""",
        # Gini-Simpson / Hurlbert PIE diversity from exact BIGINT count
        # sums, one pinned division per reported float (log-free).
        "diversity_daily": """
WITH c AS (
  SELECT event_type, date_trunc('day', ts) AS bucket_start, user_id,
    count(*) AS cnt
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
  GROUP BY 1, 2, 3
), a AS (
  SELECT event_type, bucket_start,
    CAST(sum(cnt) AS BIGINT) AS n,
    count(*) AS k_distinct,
    CAST(max(cnt) AS BIGINT) AS cmax,
    CAST(sum(cnt * cnt) AS BIGINT) AS c2,
    CAST(sum(cnt * (cnt - 1)) AS BIGINT) AS cc1
  FROM c GROUP BY 1, 2
)
SELECT event_type, bucket_start, n, k_distinct,
  CAST(cmax AS DOUBLE) / CAST(n AS DOUBLE) AS top_share,
  1.0 - CAST(c2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS simpson,
  CASE WHEN n >= 2 THEN
    1.0 - CAST(cc1 AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
  END AS pie
FROM a ORDER BY 1, 2
""",
        # trailing 7-day RANGE window over daily BIGINT sums: exact
        # window count/sum/sumsq, pinned mean/std/band op order.
        "bollinger_daily": """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value) AND ts IS NOT NULL
  GROUP BY 1, 2
), w AS (
  SELECT event_type, day, v,
    count(v) OVER fr AS w_n,
    CAST(sum(v) OVER fr AS BIGINT) AS s,
    CAST(sum(v * v) OVER fr AS BIGINT) AS sq
  FROM daily
  WINDOW fr AS (PARTITION BY event_type ORDER BY epoch_us(day)
                RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
), f AS (
  SELECT event_type, day, v, w_n,
    CAST(s AS DOUBLE) / CAST(w_n AS DOUBLE) AS mean,
    sqrt(CAST(sq AS DOUBLE) / CAST(w_n AS DOUBLE)
         - (CAST(s AS DOUBLE) / CAST(w_n AS DOUBLE))
           * (CAST(s AS DOUBLE) / CAST(w_n AS DOUBLE))) AS std
  FROM w
)
SELECT event_type, day, v, w_n,
  round(mean, 6) AS bb_mean,
  round(std, 6) AS bb_std,
  round(mean + 2.0 * std, 6) AS bb_upper,
  round(mean - 2.0 * std, 6) AS bb_lower,
  round(CASE WHEN (mean + 2.0 * std) - (mean - 2.0 * std) > 0 THEN
    (CAST(v AS DOUBLE) - (mean - 2.0 * std))
      / ((mean + 2.0 * std) - (mean - 2.0 * std))
  END, 6) AS bb_pos
FROM f ORDER BY 1, 2
""",
        # single-window reference for the two-phase cap: smallest 8-hex
        # md5 draw (string order == numeric order over lowercase hex).
        "domain_cap_docs": """
WITH d AS (
  SELECT source, doc_id, n_chars,
    row_number() OVER (
      PARTITION BY source
      ORDER BY substr(md5(concat_ws('|', '', CAST(doc_id AS VARCHAR))), 1, 8) ASC,
               doc_id ASC
    ) AS grp_rank
  FROM documents
)
SELECT source, CAST(grp_rank AS INT) AS grp_rank, doc_id, n_chars
FROM d WHERE grp_rank <= 40 ORDER BY source, grp_rank
""",
        # CUBE subtotals; GROUPING(a, b) bitmask = Spark grouping_id
        # (first dim most significant).
        "dimensional_cube": """
WITH base AS (
  SELECT event_type, CAST(user_id % 10 AS BIGINT) AS cohort,
    CAST(floor(value * 100) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
)
SELECT event_type, cohort,
  CAST(GROUPING(event_type, cohort) AS BIGINT) AS gid,
  count(*) AS n,
  CAST(sum(v) AS BIGINT) AS v_sum
FROM base GROUP BY CUBE (event_type, cohort)
ORDER BY gid, event_type, cohort
""",
        # BM25: Lucene non-negative idf, k1=1.2 b=0.75; the per-doc
        # score adds its three term scores in sorted-term order (each
        # conditional sum holds <= 1 addend), matching the engine's
        # pinned composition; rank on (rounded score, id).
        "bm25_search_docs": f"""
WITH {_bm25_scored_ctes()}
SELECT CAST(row_number() OVER (ORDER BY score DESC, id ASC) AS INT) AS rank,
  id AS doc_id, score, n_terms_hit, tf_total, dl
FROM per_doc
ORDER BY rank LIMIT 25
""",
        # anti range join: rows inside either blackout never reach the
        # rollup; start inclusive, end exclusive.
        "blackout_rollup": """
SELECT event_type, date_trunc('day', ts) AS day,
  count(*) AS n,
  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v_sum
FROM events
WHERE NOT (ts >= TIMESTAMP '2024-01-10 06:00:00' AND ts < TIMESTAMP '2024-01-10 18:00:00')
  AND NOT (ts >= TIMESTAMP '2024-01-20 00:00:00' AND ts < TIMESTAMP '2024-01-21 00:00:00')
GROUP BY 1, 2 ORDER BY 1, 2
""",
        # every 97th row per series by (ts, event_id); survivor set is a
        # pure function of the data.
        "stride_decimate": """
WITH d AS (
  SELECT event_type, ts, event_id,
    row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) - 1 AS ord
  FROM events WHERE ts IS NOT NULL
)
SELECT event_type, CAST(ord // 97 AS BIGINT) AS sample_idx, ts, event_id
FROM d WHERE ord % 97 = 0
ORDER BY event_type, sample_idx
""",
        # the oracle computes DAILY bars straight from raw rows — the
        # hourly->daily cascade must reproduce them bit-for-bit.
        "cascade_daily_bars": """
WITH base AS (
  SELECT event_type, ts, event_id,
    CAST(floor(value * 100) AS BIGINT) AS v,
    CAST((event_id % 97) + 1 AS BIGINT) AS w,
    CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
)
SELECT event_type, bucket_start,
  count(*) AS n,
  CAST((min({'t': epoch_us(ts), 'e': event_id, 'v': v})).v AS BIGINT) AS open,
  CAST(max(v) AS BIGINT) AS high,
  CAST(min(v) AS BIGINT) AS low,
  CAST((max({'t': epoch_us(ts), 'e': event_id, 'v': v})).v AS BIGINT) AS close,
  CAST(sum(w) AS BIGINT) AS w_sum,
  CAST(sum(v * w) AS BIGINT) AS vw_sum,
  CAST(sum(v * w) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS vwap
FROM base GROUP BY 1, 2 ORDER BY 1, 2
""",
        # last point per series: one struct max, ties broken by event_id.
        "latest_per_user": """
WITH base AS (
  SELECT user_id, ts, event_id, value FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
)
SELECT user_id,
  make_timestamp((max({'t': epoch_us(ts), 'o': event_id, 'v': value})).t) AS last_ts,
  round((max({'t': epoch_us(ts), 'o': event_id, 'v': value})).v, 6) AS last_value,
  count(*) AS n
FROM base GROUP BY 1 ORDER BY 1
""",
        # SLO: conditional counts + pinned divisions; budget literal =
        # python repr(1.0 - 0.55).
        "slo_burn_hourly": f"""
WITH base AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_start, value
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
), a AS (
  SELECT event_type, bucket_start,
    count(*) AS n,
    count(CASE WHEN value <= 250.0 THEN 1 END) AS n_good
  FROM base GROUP BY 1, 2
)
SELECT event_type, bucket_start, n, n_good,
  CAST(n_good AS DOUBLE) / CAST(n AS DOUBLE) AS good_frac,
  (CAST(n_good AS DOUBLE) / CAST(n AS DOUBLE)) < 0.55 AS breached,
  (1.0 - CAST(n_good AS DOUBLE) / CAST(n AS DOUBLE)) / {1.0 - 0.55!r}
    AS burn_rate
FROM a ORDER BY 1, 2
""",
        # fit on ALL rows, apply to the slice; pinned mean/std order.
        "normalize_events": """
WITH base AS (
  SELECT event_id, user_id, event_type,
    CAST(floor(value * 100) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
), st AS (
  SELECT event_type,
    CAST(sum(v) AS DOUBLE) / CAST(count(v) AS DOUBLE) AS mean,
    sqrt(CAST(sum(v * v) AS DOUBLE) / CAST(count(v) AS DOUBLE)
         - (CAST(sum(v) AS DOUBLE) / CAST(count(v) AS DOUBLE))
           * (CAST(sum(v) AS DOUBLE) / CAST(count(v) AS DOUBLE))) AS std,
    min(v) AS vmin, max(v) AS vmax
  FROM base GROUP BY 1
)
SELECT b.event_id, b.event_type, b.v AS v_int,
  round(CASE WHEN s.std > 0
        THEN (CAST(b.v AS DOUBLE) - s.mean) / s.std END, 6) AS v_int_zscore,
  round(CASE WHEN CAST(s.vmax AS DOUBLE) - CAST(s.vmin AS DOUBLE) > 0
        THEN (CAST(b.v AS DOUBLE) - CAST(s.vmin AS DOUBLE))
             / (CAST(s.vmax AS DOUBLE) - CAST(s.vmin AS DOUBLE)) END, 6)
    AS v_int_minmax
FROM base b JOIN st s USING (event_type)
WHERE b.user_id < 5
ORDER BY b.event_id
""",
        # quartile edges: linear-interpolated exact percentiles over
        # integers at q=i/4 — binary-exact, so bins cannot flip.
        "doc_len_quartiles": """
WITH st AS (
  SELECT source,
    quantile_cont(n_chars, 0.25) AS e1,
    quantile_cont(n_chars, 0.5) AS e2,
    quantile_cont(n_chars, 0.75) AS e3
  FROM documents GROUP BY 1
), b AS (
  SELECT d.source,
    CASE WHEN d.n_chars IS NULL THEN NULL
         ELSE CAST(d.n_chars > s.e1 AS INT) + CAST(d.n_chars > s.e2 AS INT)
            + CAST(d.n_chars > s.e3 AS INT) END AS bin,
    d.n_chars
  FROM documents d JOIN st s USING (source)
)
SELECT source, bin, count(*) AS n,
  min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM b GROUP BY 1, 2 ORDER BY 1, 2
""",
        # trailing 7-day distinct: distinct triples replicated to the
        # target buckets they influence (clipped to observed range),
        # exact count-distinct per target.
        "wau_trailing_7d": """
WITH pairs AS (
  SELECT DISTINCT event_type,
    epoch_us(ts) // 86400000000 AS b, user_id
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), rng AS (
  SELECT event_type, min(b) AS lo, max(b) AS hi FROM pairs GROUP BY 1
), t AS (
  SELECT p.event_type, p.user_id,
    unnest(generate_series(p.b, least(p.b + 6, r.hi))) AS tb
  FROM pairs p JOIN rng r USING (event_type)
)
SELECT event_type,
  make_timestamp(tb * 86400000000) AS bucket_start,
  count(DISTINCT user_id) AS n_distinct
FROM t GROUP BY 1, 2 ORDER BY 1, 2
""",
        # median/MAD exact halves over quantized ints; threshold literal
        # = python repr(3.0 * 1.4826).
        "mad_robust_daily": f"""
WITH base AS (
  SELECT event_type, date_trunc('day', ts) AS bucket_start,
    CAST(CAST(floor(value * 100) AS BIGINT) AS DOUBLE) AS v
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
), med AS (
  SELECT event_type, bucket_start, count(*) AS n,
    CAST(quantile_cont(v, 0.5) AS DOUBLE) AS med
  FROM base GROUP BY 1, 2
), mad AS (
  SELECT b.event_type, b.bucket_start,
    CAST(quantile_cont(abs(b.v - m.med), 0.5) AS DOUBLE) AS mad
  FROM base b JOIN med m USING (event_type, bucket_start)
  GROUP BY 1, 2
)
SELECT b.event_type, b.bucket_start,
  any_value(m.n) AS n,
  round(any_value(m.med), 6) AS median,
  round(any_value(d.mad), 6) AS mad,
  count(CASE WHEN abs(b.v - m.med) > {3.0 * 1.4826!r} * d.mad THEN 1 END)
    AS n_outliers
FROM base b
JOIN med m USING (event_type, bucket_start)
JOIN mad d USING (event_type, bucket_start)
GROUP BY 1, 2 ORDER BY 1, 2
""",
        # trimmed mean: the surviving value-multiset after dropping
        # floor(n*0.1) per side is deterministic (row_number tie-breaks
        # arbitrarily but removes exactly k copies of the tied VALUE),
        # so the BIGINT survivor sum and its one division are exact.
        "trimmed_mean_daily": """
WITH base AS (
  SELECT event_type, date_trunc('day', ts) AS bucket_start,
    CAST(floor(value * 100) AS BIGINT) AS q
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
), ranked AS (
  SELECT event_type, bucket_start, q,
    row_number() OVER (PARTITION BY event_type, bucket_start ORDER BY q) AS rk,
    count(*) OVER (PARTITION BY event_type, bucket_start) AS n
  FROM base
), k AS (
  SELECT *, CAST(floor(n * 0.1) AS BIGINT) AS n_trim FROM ranked
)
SELECT event_type, bucket_start,
  any_value(n) AS n, any_value(n_trim) AS n_trim,
  count(*) AS n_kept,
  CAST(sum(q) AS DOUBLE) / CAST(count(*) * 100 AS DOUBLE) AS trimmed_mean
FROM k WHERE rk > n_trim AND rk <= n - n_trim
GROUP BY 1, 2 ORDER BY 1, 2
""",
        # Theil-Sen: each pairwise slope is one IEEE division of exact
        # ints in the pinned order (dq * 10000.0) / dt_us, re-quantized
        # (floor * 1e6) so the median interpolates BIGINTs (exact halves).
        "theilsen_daily_slope": """
WITH base AS (
  SELECT event_type, date_trunc('day', ts) AS bucket_start,
    epoch_us(ts) AS t, CAST(floor(value * 100) AS BIGINT) AS q
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
), counts AS (
  SELECT event_type, bucket_start, count(*) AS n FROM base GROUP BY 1, 2
), sl AS (
  SELECT a.event_type, a.bucket_start,
    CAST(floor(
      CAST(b.q - a.q AS DOUBLE) * 10000.0 / CAST(b.t - a.t AS DOUBLE)
      * 1000000.0) AS BIGINT) AS sq
  FROM base a JOIN base b USING (event_type, bucket_start)
  WHERE a.t < b.t
), med AS (
  SELECT event_type, bucket_start, count(*) AS n_pairs,
    quantile_cont(CAST(sq AS DOUBLE), 0.5) AS m
  FROM sl GROUP BY 1, 2
)
SELECT c.event_type, c.bucket_start, c.n,
  coalesce(m.n_pairs, 0) AS n_pairs,
  m.m / 1000000.0 AS slope
FROM counts c LEFT JOIN med m USING (event_type, bucket_start)
ORDER BY 1, 2
""",
        # Spearman: tie-averaged ranks kept integral by the doubling
        # trick (2*min_rank + ties - 1), then the shared exact-integer
        # Pearson moment machinery (corr is shift/scale invariant).
        "spearman_daily_corr": """
WITH s AS (
  SELECT event_type, CAST(ts AS DATE) AS b,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1, 2
), p AS (
  SELECT x.event_type AS series_a, y.event_type AS series_b,
         x.v AS va, y.v AS vb
  FROM s x JOIN s y USING (b) WHERE x.event_type < y.event_type
), r AS (
  SELECT series_a, series_b,
    2 * rank() OVER (PARTITION BY series_a, series_b ORDER BY va)
      + count(*) OVER (PARTITION BY series_a, series_b, va) - 1 AS ra,
    2 * rank() OVER (PARTITION BY series_a, series_b ORDER BY vb)
      + count(*) OVER (PARTITION BY series_a, series_b, vb) - 1 AS rb
  FROM p
), m AS (
  SELECT series_a, series_b, count(*) AS cnt,
    sum(ra) AS sx, sum(rb) AS sy,
    sum(ra * ra) AS sxx, sum(ra * rb) AS sxy, sum(rb * rb) AS syy
  FROM r GROUP BY 1, 2
)
SELECT series_a, series_b, CAST(cnt AS BIGINT) AS n,
  round(CASE WHEN cnt >= 2
          AND (CAST(cnt AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
          AND (CAST(cnt AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
        THEN (CAST(cnt AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(cnt AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(CAST(cnt AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        END, 6) AS corr
FROM m ORDER BY 1, 2
""",
        # classical additive decomposition: pooled centered 7-day trend
        # from order-free BIGINT RANGE-window sums (one division),
        # per-position median of quantized detrended (exact halves),
        # residual one subtraction + one division.
        "seasonal_decompose_daily": """
WITH base AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
    CAST(floor(value * 100) AS BIGINT) AS q
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
), daily AS (
  SELECT event_type, d, count(*) AS n, sum(q) AS s FROM base GROUP BY 1, 2
), t AS (
  SELECT event_type, d, n, s,
    count(*) OVER w AS days_in,
    sum(s) OVER w AS ts_sum,
    sum(n) OVER w AS tn
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY d
               RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), t2 AS (
  SELECT event_type, d, n,
    CAST(s AS DOUBLE) / CAST(n * 100 AS DOUBLE) AS v,
    CASE WHEN days_in = 7
         THEN CAST(ts_sum AS DOUBLE) / CAST(tn * 100 AS DOUBLE) END AS trend,
    d % 7 AS season_pos
  FROM t
), t3 AS (
  SELECT *, CAST(floor((v - trend) * 1000000.0) AS BIGINT) AS dq FROM t2
), seas AS (
  SELECT event_type, season_pos,
    quantile_cont(CAST(dq AS DOUBLE), 0.5) AS sm
  FROM t3 WHERE dq IS NOT NULL GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT t3.event_type,
  make_timestamp(d * 86400000000) AS day,
  n, v, season_pos,
  trend,
  sm / 1000000.0 AS seasonal,
  (CAST(dq AS DOUBLE) - sm) / 1000000.0 AS residual
FROM t3 LEFT JOIN seas USING (event_type, season_pos)
ORDER BY 1, 2
""",
        # sliding-window chunking: exact integer lattice + substr + md5
        # (character indexing and UTF-8 md5 agree across engines).
        "chunk_overlap_docs": """
WITH d AS (
  SELECT doc_id, coalesce(text, '') AS txt,
    greatest((length(coalesce(text, '')) - 512 + 383) // 384, 0) AS n_extra
  FROM documents
), e AS (
  SELECT doc_id, txt,
    unnest(generate_series(0, n_extra)) AS chunk_idx
  FROM d
)
SELECT doc_id, chunk_idx,
  chunk_idx * 384 + 1 AS chunk_start,
  length(substr(txt, CAST(chunk_idx * 384 + 1 AS INT), 512)) AS chunk_len,
  md5(substr(txt, CAST(chunk_idx * 384 + 1 AS INT), 512)) AS chunk_md5
FROM e ORDER BY 1, 2
""",
        # z-order read ≡ plain filter: pruning is layout-only, the box
        # semantics are a 2-D BETWEEN (NaN value fails <= hi on both
        # engines; NULLs fail both bounds).
        "snapshot_zorder_read": """
SELECT event_type,
  count(*) AS n,
  CAST(sum(event_id) AS BIGINT) AS id_sum,
  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v_sum
FROM events
WHERE user_id >= 100 AND user_id <= 300
  AND value >= 100.0 AND value <= 300.0
GROUP BY 1 ORDER BY 1
""",
        # trailing-window Pearson: six HUGEINT moment sums over a RANGE
        # frame on the day index (order-free), one pinned double
        # expression per row — mirrors the Spark DECIMAL(38,0) frame.
        "rolling_corr_daily": """
WITH s AS (
  SELECT event_type, CAST(ts AS DATE) AS b,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1, 2
), p AS (
  SELECT x.event_type AS series_a, y.event_type AS series_b, b,
         epoch_us(CAST(b AS TIMESTAMP)) // 86400000000 AS d,
         x.v AS va, y.v AS vb
  FROM s x JOIN s y USING (b) WHERE x.event_type < y.event_type
), f AS (
  SELECT series_a, series_b, b,
    count(*) OVER w AS n,
    sum(CAST(va AS HUGEINT)) OVER w AS sx,
    sum(CAST(vb AS HUGEINT)) OVER w AS sy,
    sum(CAST(va AS HUGEINT) * va) OVER w AS sxx,
    sum(CAST(va AS HUGEINT) * vb) OVER w AS sxy,
    sum(CAST(vb AS HUGEINT) * vb) OVER w AS syy
  FROM p
  WINDOW w AS (PARTITION BY series_a, series_b ORDER BY d
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT series_a, series_b, CAST(b AS TIMESTAMP) AS bucket_start,
  CAST(n AS BIGINT) AS n,
  round(CASE WHEN n >= 3
          AND (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
          AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
        THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        END, 6) AS corr
FROM f ORDER BY 1, 2, 3
""",
        # containment via shared aligned chunk hashes: exact integer
        # counts from an equi-join on md5, ONE pinned UNROUNDED
        # division (odd/128 lands exactly midway at the 6th decimal —
        # rounding there is a cross-engine coin flip).
        "chunk_containment_docs": """
WITH d AS (
  SELECT doc_id, coalesce(text, '') AS txt,
    greatest((length(coalesce(text, '')) - 128 + 127) // 128, 0) AS n_extra
  FROM documents
), ch AS (
  SELECT DISTINCT doc_id,
    md5(substr(txt, CAST(ci * 128 + 1 AS INT), 128)) AS h
  FROM (
    SELECT doc_id, txt, unnest(generate_series(0, n_extra)) AS ci FROM d
  )
  WHERE length(substr(txt, CAST(ci * 128 + 1 AS INT), 128)) > 0
), sz AS (
  SELECT doc_id, count(*) AS nc FROM ch GROUP BY 1
), p AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS n_shared
  FROM ch x JOIN ch y USING (h) WHERE x.doc_id < y.doc_id
  GROUP BY 1, 2 HAVING count(*) >= 1
)
SELECT id_a, id_b, n_shared, sa.nc AS chunks_a, sb.nc AS chunks_b,
  CAST(n_shared AS DOUBLE) / CAST(least(sa.nc, sb.nc) AS DOUBLE)
    AS containment
FROM p
JOIN sz sa ON sa.doc_id = p.id_a
JOIN sz sb ON sb.doc_id = p.id_b
ORDER BY 1, 2
""",
        # Savitzky-Golay window-5 quadratic: pinned left-assoc integer-
        # coefficient convolution over one-division daily means, ONE
        # final division; lattice-contiguity check NULLs gap/edge rows.
        "savgol_daily_smooth": """
WITH base AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
    count(*) AS n, sum(CAST(floor(value * 100) AS BIGINT)) AS s
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1, 2
), m AS (
  SELECT event_type, d, n,
    CAST(s AS DOUBLE) / CAST(n * 100 AS DOUBLE) AS v
  FROM base
), wnd AS (
  SELECT event_type, d, n, v,
    lag(v, 2) OVER w AS vm2, lag(v, 1) OVER w AS vm1,
    lead(v, 1) OVER w AS vp1, lead(v, 2) OVER w AS vp2,
    lag(d, 2) OVER w AS dm2, lag(d, 1) OVER w AS dm1,
    lead(d, 1) OVER w AS dp1, lead(d, 2) OVER w AS dp2
  FROM m WINDOW w AS (PARTITION BY event_type ORDER BY d)
)
SELECT event_type, make_timestamp(d * 86400000000) AS day, n, v,
  CASE WHEN dm2 = d - 2 AND dm1 = d - 1 AND dp1 = d + 1 AND dp2 = d + 2
    THEN ((((vm2 * (-3) + vm1 * 12) + v * 17) + vp1 * 12) + vp2 * (-3))
         / 35.0
  END AS sg
FROM wnd ORDER BY 1, 2
""",
        # transition dates: thr = lo + 0.5*(hi-lo) over the bit-exact
        # smoothed doubles; sos/eos = first/last day with sg >= thr —
        # comparisons over identical doubles make the DATES exact.
        "transition_dates_yearly": """
WITH base AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
    count(*) AS n, sum(CAST(floor(value * 100) AS BIGINT)) AS s
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1, 2
), m AS (
  SELECT event_type, d,
    CAST(s AS DOUBLE) / CAST(n * 100 AS DOUBLE) AS v
  FROM base
), wnd AS (
  SELECT event_type, d, v,
    lag(v, 2) OVER w AS vm2, lag(v, 1) OVER w AS vm1,
    lead(v, 1) OVER w AS vp1, lead(v, 2) OVER w AS vp2,
    lag(d, 2) OVER w AS dm2, lag(d, 1) OVER w AS dm1,
    lead(d, 1) OVER w AS dp1, lead(d, 2) OVER w AS dp2
  FROM m WINDOW w AS (PARTITION BY event_type ORDER BY d)
), sm AS (
  SELECT event_type, make_timestamp(d * 86400000000) AS day,
    ((((vm2 * (-3) + vm1 * 12) + v * 17) + vp1 * 12) + vp2 * (-3))
      / 35.0 AS sg
  FROM wnd
  WHERE dm2 = d - 2 AND dm1 = d - 1 AND dp1 = d + 1 AND dp2 = d + 2
), amp AS (
  SELECT event_type, CAST(year(day) AS INT) AS year,
    count(*) AS n_days, min(sg) AS lo, max(sg) AS hi
  FROM sm GROUP BY 1, 2
), amp2 AS (
  SELECT *, lo + 0.5 * (hi - lo) AS thr FROM amp
), crossed AS (
  SELECT s.event_type, CAST(year(s.day) AS INT) AS year,
    min(s.day) AS sos_day, max(s.day) AS eos_day
  FROM sm s JOIN amp2 a
    ON a.event_type = s.event_type AND a.year = year(s.day)
  WHERE s.sg >= a.thr
  GROUP BY 1, 2
)
SELECT a.event_type, a.year, a.n_days, a.lo, a.hi, a.thr,
  c.sos_day, c.eos_day
FROM amp2 a LEFT JOIN crossed c USING (event_type, year)
ORDER BY 1, 2
""",
        # Heaps-law growth: all-integer (counts + cumulative integer
        # sums); batch index via `//` — floors == Spark's `div`
        # truncation for the non-negative doc ids here (SURVEY §8).
        "vocab_growth_docs": """
WITH toks AS (
  SELECT doc_id, generate_subscripts(w, 1) AS pos, unnest(w) AS term
  FROM (SELECT doc_id,
               regexp_split_to_array(lower(trim(text)), '\\s+') AS w
        FROM documents)
), t AS (
  SELECT * FROM toks WHERE length(term) >= 1
), first_seen AS (
  SELECT term, min(doc_id) AS f FROM t GROUP BY 1
), npb AS (
  SELECT f // 50 AS batch, CAST(count(*) AS BIGINT) AS new_terms
  FROM first_seen GROUP BY 1
), tpb AS (
  SELECT doc_id // 50 AS batch, CAST(count(*) AS BIGINT) AS tokens
  FROM t GROUP BY 1
)
SELECT tpb.batch,
       CAST(tpb.batch * 50 AS BIGINT) AS first_doc,
       coalesce(npb.new_terms, 0) AS new_terms,
       CAST(sum(coalesce(npb.new_terms, 0))
            OVER (ORDER BY tpb.batch) AS BIGINT) AS cum_vocab,
       tpb.tokens,
       CAST(sum(tpb.tokens) OVER (ORDER BY tpb.batch) AS BIGINT)
         AS cum_tokens
FROM tpb LEFT JOIN npb USING (batch)
ORDER BY batch
""",
        # inverted index: df/tf/occurrence-checksum are BIGINTs; the
        # top-k rank key (df DESC, tf DESC, term ASC) is integer-exact
        "postings_index_docs": """
WITH toks AS (
  SELECT doc_id, generate_subscripts(w, 1) AS pos, unnest(w) AS term
  FROM (SELECT doc_id,
               regexp_split_to_array(lower(trim(text)), '\\s+') AS w
        FROM documents)
), t AS (
  SELECT * FROM toks WHERE length(term) >= 1
), idx AS (
  SELECT term,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
         CAST(count(*) AS BIGINT) AS tf,
         CAST(sum(doc_id * 100003 + pos) AS BIGINT) AS postings_checksum
  FROM t GROUP BY 1
), ranked AS (
  SELECT CAST(row_number() OVER (
           ORDER BY df DESC, tf DESC, term ASC) AS BIGINT) AS rank,
         term, df, tf, postings_checksum
  FROM idx
)
SELECT rank, term, df, tf, postings_checksum
FROM ranked WHERE rank <= 50 ORDER BY rank
""",
        # exact all-pairs cosine: integer dot/norms; cos is ONE pinned
        # division of a sqrt*sqrt product over exact ints -> the 0.92
        # threshold decides identically in both engines
        "cosine_pairs_docs": """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
  FROM documents
), t AS (
  SELECT * FROM toks WHERE length(term) >= 1
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2
), norms AS (
  SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS norm2 FROM tf GROUP BY 1
), dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
  FROM tf a JOIN tf b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, dot, na.norm2 AS norm2_a, nb.norm2 AS norm2_b,
       dot / (sqrt(na.norm2) * sqrt(nb.norm2)) AS cos
FROM dots
JOIN norms na ON na.doc_id = id_a
JOIN norms nb ON nb.doc_id = id_b
WHERE dot / (sqrt(na.norm2) * sqrt(nb.norm2)) >= 0.92
ORDER BY id_a, id_b
""",
        # ordered event-type trigrams per user: lead twice over the
        # (ts, event_id)-pinned sequence order, all-integer support
        "sequence_trigrams": """
WITH d AS (
  SELECT user_id, event_type AS s0,
    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s1,
    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s2
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
), g AS (
  SELECT user_id, s0 || '>' || s1 || '>' || s2 AS gram
  FROM d WHERE s1 IS NOT NULL AND s2 IS NOT NULL
)
SELECT gram,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_seqs
FROM g GROUP BY 1 HAVING count(*) >= 2
ORDER BY gram
""",
        # type-1 weighted percentiles: distinct-value pre-aggregate +
        # integer cross-multiplied selection; only float = pinned v/100
        "weighted_percentiles_daily": """
WITH b AS (
  SELECT event_type, date_trunc('day', ts) AS bucket_start,
         CAST(floor(value * 100) AS BIGINT) AS v,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS w
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
    AND json_extract_string(props, '$.k') IS NOT NULL
    AND CAST(json_extract_string(props, '$.k') AS BIGINT) > 0
), g AS (
  SELECT event_type, bucket_start, v,
         CAST(sum(w) AS BIGINT) AS wv, CAST(count(*) AS BIGINT) AS nn
  FROM b GROUP BY 1, 2, 3
), c AS (
  SELECT event_type, bucket_start, v, wv, nn,
         CAST(sum(wv) OVER (PARTITION BY event_type, bucket_start
                            ORDER BY v) AS BIGINT) AS cum,
         CAST(sum(wv) OVER (PARTITION BY event_type, bucket_start)
              AS BIGINT) AS tw,
         CAST(sum(nn) OVER (PARTITION BY event_type, bucket_start)
              AS BIGINT) AS n
  FROM g
)
SELECT event_type, bucket_start, n, tw AS total_w,
       min(CASE WHEN cum * 100 >= 50 * tw THEN v END) / 100.0 AS wp50,
       min(CASE WHEN cum * 100 >= 90 * tw THEN v END) / 100.0 AS wp90
FROM c GROUP BY 1, 2, 3, 4
ORDER BY 1, 2
""",
        # conversation assembly: role-tagged ordered concat — string
        # equality IS the per-turn-text-equality invariant. The order
        # key (ts, event_id) is total per user; the trailing r,t in the
        # ORDER BY mirror Spark's struct sort and never fire
        "assemble_conversations": """
WITH b AS (
  SELECT user_id, ts, event_id,
         coalesce(event_type, '') AS r, coalesce(props, '') AS t
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), a AS (
  SELECT user_id,
         string_agg(r || ': ' || t, chr(10)
                    ORDER BY ts, event_id, r, t) AS text,
         CAST(count(*) AS BIGINT) AS n_turns
  FROM b GROUP BY 1
)
SELECT user_id, text, n_turns, CAST(length(text) AS BIGINT) AS n_chars
FROM a ORDER BY user_id
""",
        "pagerank_suppliers": _pagerank_oracle_sql(),
        # exact triangle counting: same degree-ordered orientation,
        # wedge join, canonical-edge closure; per-node via 3-way unnest
        "triangle_counts_users": """
WITH m AS (
  SELECT DISTINCT CAST(user_id AS VARCHAR) AS node, event_type,
         date_trunc('minute', ts) AS b
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), sz AS (
  SELECT event_type, b FROM m GROUP BY 1, 2 HAVING count(*) <= 50
), cool AS (
  SELECT m.* FROM m JOIN sz USING (event_type, b)
), e AS (
  SELECT DISTINCT least(a.node, c.node) AS a, greatest(a.node, c.node) AS b
  FROM cool a JOIN cool c
    ON a.event_type = c.event_type AND a.b = c.b AND a.node < c.node
), deg AS (
  SELECT node, count(*) AS deg
  FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1
), ed AS (
  SELECT e.a, e.b, da.deg AS dda, db.deg AS ddb
  FROM e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b
), o AS (
  SELECT CASE WHEN dda < ddb OR (dda = ddb AND a < b) THEN a ELSE b END AS src,
         CASE WHEN dda < ddb OR (dda = ddb AND a < b) THEN b ELSE a END AS dst
  FROM ed
), wed AS (
  SELECT w1.src AS u, w1.dst AS v, w2.dst AS w
  FROM o w1 JOIN o w2 ON w1.src = w2.src AND w1.dst < w2.dst
), tri AS (
  SELECT u, v, w FROM wed JOIN e ON wed.v = e.a AND wed.w = e.b
), per AS (
  SELECT node, CAST(count(*) AS BIGINT) AS triangles
  FROM (SELECT u AS node FROM tri UNION ALL SELECT v FROM tri
        UNION ALL SELECT w FROM tri)
  GROUP BY 1
)
SELECT deg.node, coalesce(per.triangles, 0) AS triangles
FROM deg LEFT JOIN per USING (node)
ORDER BY node
""",
        "bfs_blast_radius": _bfs_oracle_sql(),
        # the bloom-pruned read must equal the plain filter
        "snapshot_bloom_read": """
SELECT user_id, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(event_id) AS BIGINT) AS id_sum
FROM events WHERE user_id IN (5, 17, 29, 41, 53)
GROUP BY 1 ORDER BY user_id
""",
        # priority = double(h60) / (2^60 * double(w)) — one product,
        # one division, both IEEE-deterministic; 2^60 is a power of two
        "weighted_sample_docs": """
WITH keyed AS (
  SELECT DISTINCT doc_id AS key, CAST(n_chars AS BIGINT) AS weight
  FROM documents
  WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0
), pri AS (
  SELECT key, weight,
    CAST(CAST(concat('0x', substr(md5(CAST(key AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE)
      / (1152921504606846976.0 * CAST(weight AS DOUBLE)) AS priority
  FROM keyed
)
SELECT CAST(row_number() OVER (ORDER BY priority ASC, key ASC) AS INT) AS rank,
  key, weight, priority
FROM pri QUALIFY rank <= 30 ORDER BY rank
""",
        # daily-sum-merged == direct weekly is an algebraic identity
        # (counters are sums); the oracle computes BOTH from raw rows
        # with the identical salted md5 hashing
        "cms_merge_weekly": """
WITH keyed AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(date_trunc('week', ts) AS TIMESTAMP) AS week, user_id
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), c AS (
  SELECT day, week, t.i AS row_idx,
    CAST(concat('0x', substr(md5(concat(CAST(t.i AS VARCHAR), ':', CAST(user_id AS VARCHAR))), 1, 15)) AS BIGINT) % 256 AS col_idx,
    count(*) AS counter
  FROM keyed CROSS JOIN (SELECT unnest(range(3)) AS i) t
  GROUP BY 1, 2, 3, 4
), m AS (
  SELECT week, row_idx, col_idx, sum(counter) AS counter
  FROM c GROUP BY 1, 2, 3
), mm AS (
  SELECT week,
    CAST(sum(counter * (row_idx * 256 + col_idx + 1)) AS BIGINT) AS merged_checksum,
    CAST(sum(counter) AS BIGINT) AS merged_total
  FROM m GROUP BY 1
), d AS (
  SELECT week, t.i AS row_idx,
    CAST(concat('0x', substr(md5(concat(CAST(t.i AS VARCHAR), ':', CAST(user_id AS VARCHAR))), 1, 15)) AS BIGINT) % 256 AS col_idx,
    count(*) AS counter
  FROM keyed CROSS JOIN (SELECT unnest(range(3)) AS i) t
  GROUP BY 1, 2, 3
), dd AS (
  SELECT week,
    CAST(sum(counter * (row_idx * 256 + col_idx + 1)) AS BIGINT) AS direct_checksum,
    CAST(sum(counter) AS BIGINT) AS direct_total
  FROM d GROUP BY 1
)
SELECT mm.week, merged_checksum, merged_total, direct_checksum, direct_total,
  merged_checksum = direct_checksum AND merged_total = direct_total AS merged_eq_direct
FROM mm JOIN dd ON mm.week = dd.week ORDER BY mm.week
""",
        # SymSpell deletion join + exact levenshtein verify, both
        # engines' built-in integer DP
        "plot_partitions_events": r"""
WITH stats AS (
  SELECT event_id, ts,
    value - 200.0 AS solar_elev,
    value AS r_mean, value * 0.8 AS g_mean, value * 0.6 AS b_mean,
    value + value * 0.8 + value * 0.6 AS brt
  FROM events
), tagged AS (
  SELECT *,
    CASE
      WHEN solar_elev < 10.0 THEN 'low_sun'
      WHEN solar_elev >= 10.0 AND (brt < 100.0 OR brt > 665.0) THEN 'brt_filtered'
      WHEN solar_elev >= 10.0 AND brt >= 100.0 AND brt <= 665.0 THEN 'good'
    END AS series
  FROM stats
)
SELECT series, CAST(count(*) AS BIGINT) AS n,
  round(min(brt), 6) AS brt_min, round(max(brt), 6) AS brt_max,
  round(min(solar_elev), 6) AS solar_min,
  round(max(solar_elev), 6) AS solar_max
FROM tagged WHERE series IS NOT NULL
GROUP BY series ORDER BY series
""",
        "plot_export_points_events": r"""
WITH stats AS (
  SELECT ts, value - 200.0 AS solar_elev,
    value + value * 0.8 + value * 0.6 AS brt,
    value / 500.0 AS gcc
  FROM events
), tagged AS (
  SELECT ts, gcc,
    CASE
      WHEN solar_elev < 10.0 THEN 'low_sun'
      WHEN solar_elev >= 10.0 AND (brt < 100.0 OR brt > 665.0) THEN 'brt_filtered'
      WHEN solar_elev >= 10.0 AND brt >= 100.0 AND brt <= 665.0 THEN 'good'
    END AS series
  FROM stats
), pts0 AS (
  SELECT series, epoch_us(ts) AS tus, gcc AS v
  FROM tagged WHERE series IS NOT NULL AND gcc IS NOT NULL AND ts IS NOT NULL
), bounds AS (
  SELECT min(tus) AS t0, max(tus) AS t1 FROM pts0
), bk AS (
  SELECT series, tus, v,
    CASE WHEN t1 > t0
         THEN least(((tus - t0) * 16) // (t1 - t0), 15)
         ELSE 0 END AS px
  FROM pts0, bounds
), a1 AS (
  SELECT series, px,
    min(tus) AS tf, max(tus) AS tl, min(v) AS vmin, max(v) AS vmax
  FROM bk GROUP BY 1, 2
), m4 AS (
  SELECT b.series, b.px,
    min(CASE WHEN b.tus = a.tf THEN b.v END) AS vf,
    max(CASE WHEN b.tus = a.tl THEN b.v END) AS vl,
    min(CASE WHEN b.v = a.vmin THEN b.tus END) AS t_min_us,
    min(CASE WHEN b.v = a.vmax THEN b.tus END) AS t_max_us,
    any_value(a.tf) AS tf, any_value(a.tl) AS tl,
    any_value(a.vmin) AS vmin, any_value(a.vmax) AS vmax
  FROM bk b JOIN a1 a USING (series, px)
  GROUP BY 1, 2
), scatter AS (
  SELECT DISTINCT 'points' AS layer, series, ts, gcc FROM (
    SELECT series, make_timestamp(tf) AS ts, round(vf, 6) AS gcc FROM m4
    UNION ALL
    SELECT series, make_timestamp(tl), round(vl, 6) FROM m4
    UNION ALL
    SELECT series, make_timestamp(t_min_us), round(vmin, 6) FROM m4
    UNION ALL
    SELECT series, make_timestamp(t_max_us), round(vmax, 6) FROM m4
  )
), line AS (
  SELECT 'line' AS layer, 'gcc_90' AS series,
    CAST(CAST(d AS VARCHAR) || ' 12:00:00' AS TIMESTAMP) AS ts,
    g90 AS gcc
  FROM (
    SELECT CAST(ts AS DATE) AS d, max(value / 500.0) AS g90
    FROM events GROUP BY 1
  ) WHERE g90 IS NOT NULL
)
SELECT * FROM scatter
UNION ALL
SELECT * FROM line
ORDER BY layer, series, ts, gcc
""",
        "edit1_typo_pairs_docs": r"""
WITH words AS (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
  FROM documents
), vocab AS (
  SELECT term, CAST(count(*) AS BIGINT) AS freq FROM words
  WHERE regexp_matches(term, '^[a-z0-9]{1,24}$') GROUP BY 1
), typos AS (
  SELECT DISTINCT substr(term, 2) AS term, CAST(1 AS BIGINT) AS freq
  FROM vocab WHERE length(term) >= 5
    AND substr(term, 2) NOT IN (SELECT term FROM vocab)
), v2 AS (
  SELECT * FROM vocab UNION ALL SELECT * FROM typos
), keyed AS (
  SELECT term, freq,
    unnest(list_prepend(term,
      list_transform(range(1, length(term) + 1),
        i -> concat(substr(term, 1, i - 1),
                    substr(term, i + 1, length(term) - i))))) AS key
  FROM v2 WHERE length(term) BETWEEN 3 AND 25
), cand AS (
  SELECT DISTINCT a.term AS term_a, a.freq AS freq_a,
                  b.term AS term_b, b.freq AS freq_b
  FROM keyed a JOIN keyed b USING (key)
  WHERE a.term < b.term
), ver AS (
  SELECT * FROM cand WHERE levenshtein(term_a, term_b) = 1
    AND (length(term_a) BETWEEN 4 AND 24 OR length(term_b) BETWEEN 4 AND 24)
), folded AS (
  SELECT
    CASE WHEN freq_a > freq_b OR (freq_a = freq_b AND term_a < term_b)
         THEN term_a ELSE term_b END AS term_hi,
    CASE WHEN freq_a > freq_b OR (freq_a = freq_b AND term_a < term_b)
         THEN freq_a ELSE freq_b END AS freq_hi,
    CASE WHEN freq_a > freq_b OR (freq_a = freq_b AND term_a < term_b)
         THEN term_b ELSE term_a END AS term_lo,
    CASE WHEN freq_a > freq_b OR (freq_a = freq_b AND term_a < term_b)
         THEN freq_b ELSE freq_a END AS freq_lo
  FROM ver
)
SELECT CAST(row_number() OVER (
    ORDER BY freq_hi DESC, freq_lo DESC, term_hi ASC, term_lo ASC) AS INT) AS rank,
  term_hi, freq_hi, term_lo, freq_lo
FROM folded
QUALIFY rank <= 40 ORDER BY rank
""",
        # exact integer intersections over the two legs' top-25,
        # one division per reported fraction; legs share the canonical
        # CTE builders with bm25_search_docs / hybrid_search_rrf
        "ranking_agreement_metrics": f"""
WITH {_bm25_scored_ctes()}, lex AS (
  SELECT id AS doc_id,
    CAST(row_number() OVER (ORDER BY score DESC, id ASC) AS INT) AS rank_lex
  FROM per_doc
), {_cosine_to_query_cte(0)}, sem AS (
  SELECT doc_id,
    CAST(row_number() OVER (ORDER BY cs DESC, doc_id ASC) AS INT) AS rank_sem
  FROM cos
), j AS (
  SELECT coalesce(l.doc_id, s2.doc_id) AS doc_id, l.rank_lex, s2.rank_sem
  FROM (SELECT * FROM lex WHERE rank_lex <= 25) l
  FULL OUTER JOIN (SELECT * FROM sem WHERE rank_sem <= 25) s2
    ON l.doc_id = s2.doc_id
), ks AS (SELECT unnest([5, 10, 25]) AS k)
SELECT CAST(k AS INT) AS k,
  CAST(count(CASE WHEN rank_lex <= k AND rank_sem <= k THEN 1 END) AS BIGINT) AS inter,
  CAST(count(CASE WHEN rank_lex <= k OR rank_sem <= k THEN 1 END) AS BIGINT) AS union_n,
  CAST(count(CASE WHEN rank_lex <= k AND rank_sem <= k THEN 1 END) AS DOUBLE)
    / CAST(k AS DOUBLE) AS overlap_at_k,
  CAST(count(CASE WHEN rank_lex <= k AND rank_sem <= k THEN 1 END) AS DOUBLE)
    / CAST(count(CASE WHEN rank_lex <= k OR rank_sem <= k THEN 1 END) AS DOUBLE) AS jaccard_at_k
FROM ks CROSS JOIN j
GROUP BY k ORDER BY k
""",
        "hll_distinct_daily": _hll_distinct_daily_oracle(),
        "hll_merge_weekly": _hll_merge_weekly_oracle(),
        # integer-exact counts; score = one product + one division of
        # exactly-rounded doubles (mirrors terms.unigram_freq_score)
        "unigram_freq_score_docs": r"""
WITH words AS (
  SELECT doc_id AS id,
    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
  FROM documents
), w2 AS (
  SELECT * FROM words WHERE length(term) >= 1
), doc_tf AS (
  SELECT id, term, count(*) AS tf FROM w2 GROUP BY 1, 2
), vocab AS (
  SELECT term, sum(tf) AS ctf FROM doc_tf GROUP BY 1
), tot AS (
  SELECT CAST(sum(ctf) AS BIGINT) AS c FROM vocab
), per AS (
  SELECT id, CAST(sum(tf) AS BIGINT) AS n_tokens,
         CAST(sum(tf * ctf) AS BIGINT) AS weighted
  FROM doc_tf JOIN vocab USING (term) GROUP BY 1
)
SELECT id AS doc_id, n_tokens, weighted,
  CAST(weighted AS DOUBLE)
    / (CAST(n_tokens AS DOUBLE) * CAST(c AS DOUBLE)) AS mean_tok_freq
FROM per CROSS JOIN tot ORDER BY doc_id
""",
        # both legs rank on pinned keys (bm25: order-pinned rounded
        # score; cosine: rounded fold-ordered similarity); fused score
        # is ONE division of exact small integers
        "hybrid_search_rrf": f"""
WITH {_bm25_scored_ctes()}, lex AS (
  SELECT id AS doc_id,
    CAST(row_number() OVER (ORDER BY score DESC, id ASC) AS INT) AS rank_lex
  FROM per_doc
), {_cosine_to_query_cte(0)}, sem AS (
  SELECT doc_id,
    CAST(row_number() OVER (ORDER BY cs DESC, doc_id ASC) AS INT) AS rank_sem
  FROM cos
), fused AS (
  SELECT coalesce(l.doc_id, s2.doc_id) AS doc_id, l.rank_lex, s2.rank_sem
  FROM (SELECT * FROM lex WHERE rank_lex <= 50) l
  FULL OUTER JOIN (SELECT * FROM sem WHERE rank_sem <= 50) s2
    ON l.doc_id = s2.doc_id
), scored AS (
  SELECT doc_id, rank_lex, rank_sem,
    CASE WHEN rank_lex IS NOT NULL AND rank_sem IS NOT NULL
      THEN CAST(120 + rank_lex + rank_sem AS DOUBLE)
           / CAST((60 + rank_lex) * (60 + rank_sem) AS DOUBLE)
      ELSE 1.0 / CAST(60 + coalesce(rank_lex, rank_sem) AS DOUBLE)
    END AS rrf_score
  FROM fused
)
SELECT CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC) AS INT) AS rank,
  doc_id, rank_lex, rank_sem, rrf_score
FROM scored
QUALIFY rank <= 25
ORDER BY rank
""",
        "cms_heavy_hitters_docs": _cms_heavy_hitters_oracle(),
        "bottomk_distinct_users": _bottomk_distinct_oracle(),
        "dtw_event_type_daily": _dtw_oracle_sql(),
        "bpe_merges_docs": _bpe_oracle_sql(),
        "bpe_token_counts_docs": _bpe_apply_oracle_sql(),
    }
