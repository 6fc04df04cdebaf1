"""Tier-1 -> tier-2: the continuous-aggregate rollup (the engine core).

Re-expresses the reference's generate_summary_timeseries pipeline
(generate_summary_timeseries.py:229-461) as one declarative Spark plan::

    QC filter -> bucket assignment -> groupBy(series, bucket).agg(...)
      -> right-join gap-fill spine -> count-threshold tier projection

Semantics preserved exactly:
* QC gate = select_rows (roitimeseries.py:809-841): time-of-day window,
  brightness (dnsum) bounds, gate >= min, primary measure not null.
* awbflag skip (generate_summary_timeseries.py:309-315): quality_flag==1
  rows never enter a bucket.
* dnsum<=0 guard (generate_summary_timeseries.py:324-336): such rows do
  NOT increment turn_count and contribute NULL fcc/rcc, but their raw DN
  values still feed the DN means.
* rcc recomputed from raw measures, not reused
  (generate_summary_timeseries.py:326-336).
* mean = nanmean; std = POPULATION std, ddof=0
  (generate_summary_timeseries.py:438-457) -> stddev_pop, never Spark's
  default sample stddev.
* exact HF type-7 percentiles p50/p75/p90; fcc_90 is the gcc90 estimator
  (quantile.py:42-76, generate_summary_timeseries.py:448-455).
* representative "midday" row = argmin |ts - bucket anchor|, first-in-time
  tie-break (generate_summary_timeseries.py:393-400) -> min(struct(...)).
* gap-fill: every bucket between a series' first and last datum is
  emitted, zero-row buckets as all-null rows with turn_count=0
  (generate_summary_timeseries.py:295-301,355-385).
* 3-way count tiering vs nmin (generate_summary_timeseries.py:354-461):
  0 -> all null; (0, nmin) -> midpoint cols + max_gate only; >= nmin -> full.

Scale notes (100 TB design point):
* One shuffle: the groupBy on (series, bucket). Because the key includes
  the time bucket, a hot conv_id is automatically split across buckets —
  per-group size is bounded by bucket length, which is the skew story for
  the aggregate stage (plus AQE skew handling). ``salt`` optionally
  spreads the *input* of giant (series,bucket) groups before the agg.
* Gap-fill is join-free and O(output): empty buckets are synthesized
  from the aggregate output itself (lag window + sequence/explode +
  union, ``_gap_fill_from_agg``) instead of a min/max spine scan over
  the input — the input is scanned exactly ONCE per rollup.
* Aggregations are all JVM-side (hash aggregate + percentile), fully
  inside whole-stage codegen; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from ..functions.timeutil import epoch_us

from ..config import RollupConfig
from ..functions.buckets import bucket_center, bucket_start, midpoint_anchor

# measure families rolled up with mean/std (reference A3)
MEAN_STD_MEASURES = ["text_len", "latency_delta_s", "fcc", "rcc_like", "r_dn", "g_dn", "b_dn"]
# measure families with exact percentiles (reference A4)
PCT_MEASURES = ["fcc", "rcc_like"]


def qc_filter(features: DataFrame, cfg: RollupConfig) -> DataFrame:
    """select_rows-equivalent conjunctive predicate (roitimeseries.py:809-841).

    Pure filter -> Catalyst pushes it into the parquet scan.
    """
    qc = cfg.qc
    tod = F.date_format("ts", "HH:mm:ss")
    return features.filter(
        (tod >= qc.tod_min)
        & (tod <= qc.tod_max)
        & F.col("dnsum").between(qc.brt_min, qc.brt_max)
        & (F.col("gate_value") >= qc.gate_min)
        & F.col("r_dn").isNotNull()
    )


def _agg_exprs(cfg: RollupConfig) -> list[Column]:
    from ..functions.quantile import nan_to_null

    ok = F.col("dnsum") > 0  # the image-count guard
    exprs: list[Column] = [
        F.count(F.when(ok, 1)).alias("turn_count"),
        F.max("gate_value").alias("max_gate_value"),
    ]
    # recomputed composites (A10): derive from raw DN columns in the agg
    # input. Every measure aggregate maps NaN -> NULL first (the engine-wide
    # rule, functions/quantile module docstring): Spark's avg/percentile
    # would otherwise propagate/sort a stray NaN while the reference's
    # nanmean and the pandas oracle's isnan filter drop it.
    for m in MEAN_STD_MEASURES:
        mc = nan_to_null(F.col(m))
        exprs.append(F.avg(mc).alias(f"{m}_mean"))
        exprs.append(F.stddev_pop(mc).alias(f"{m}_std"))
    # ONE aggregate buffer per percentile measure, shared by all the
    # requested quantiles (p50/p75/p90 and any others): percentile /
    # percentile_approx take an ARRAY of fractions, and the non-type-7
    # HF estimators share a single array_sort(collect_list(...)).
    # Separate per-quantile aggregates each buffer EVERY value of the
    # group through partial aggregation and the shuffle — merging them
    # divides the rollup's aggregate-state bytes by len(percentiles),
    # the dominant shuffle traffic at scale (the scalar states are tiny
    # next to the value buffers). ``_pct_finish_cols`` unwraps the
    # shared buffers back into the public per-quantile columns.
    qarr = F.array(*[F.lit(float(q)) for q in cfg.percentiles])
    for m in PCT_MEASURES if cfg.percentiles else []:
        mc = nan_to_null(F.col(m))
        if cfg.approx_percentiles:
            exprs.append(
                F.percentile_approx(
                    mc, qarr, F.lit(cfg.approx_accuracy)
                ).alias(f"_{m}_pq")
            )
        elif cfg.quantile_type == 7:
            # Spark's exact percentile IS HF-7 (hot path)
            exprs.append(F.percentile(mc, qarr).alias(f"_{m}_pq"))
        else:
            # hf_quantile_from_sorted's contract: null- AND NaN-free array
            exprs.append(
                F.array_sort(F.collect_list(mc)).alias(f"_{m}_sorted")
            )
    # representative row: lexicographic min over (|delta|, ts, payload)
    payload = F.struct(
        F.abs(epoch_us(F.col("ts")) - epoch_us(F.col("_anchor"))).alias("d"),
        F.col("ts").alias("mid_ts"),
        F.col("turn_idx").alias("mid_turn_idx"),
        F.col("text_len").alias("mid_text_len"),
        F.col("fcc").alias("mid_fcc"),
        # full midday family for reference-schema export (the reference's
        # midday_r/g/b/gcc/rcc, generate_summary_timeseries.py:393-418)
        F.col("rcc_like").alias("mid_rcc_like"),
        F.col("r_dn").alias("mid_r_dn"),
        F.col("g_dn").alias("mid_g_dn"),
        F.col("b_dn").alias("mid_b_dn"),
    )
    exprs.append(F.min(payload).alias("_mid"))
    return exprs


def _pct_finish_cols(cfg: RollupConfig) -> tuple[list[Column], list[str]]:
    """Per-quantile output columns computed from the shared aggregate
    buffers of :func:`_agg_exprs`, plus the buffer columns to drop."""
    from ..functions.quantile import hf_quantile_from_sorted

    cols: list[Column] = []
    drop: list[str] = []
    for m in PCT_MEASURES if cfg.percentiles else []:
        for i, q in enumerate(cfg.percentiles):
            name = f"{m}_{int(round(q * 100))}"
            if cfg.approx_percentiles or cfg.quantile_type == 7:
                c = F.element_at(F.col(f"_{m}_pq"), i + 1).cast("double")
            else:
                c = hf_quantile_from_sorted(
                    F.col(f"_{m}_sorted"), q, cfg.quantile_type
                )
            cols.append(c.alias(name))
        drop.append(
            f"_{m}_pq"
            if (cfg.approx_percentiles or cfg.quantile_type == 7)
            else f"_{m}_sorted"
        )
    return cols, drop


def _stat_cols(cfg: RollupConfig) -> list[str]:
    cols = []
    for m in MEAN_STD_MEASURES:
        cols += [f"{m}_mean", f"{m}_std"]
    for m in PCT_MEASURES:
        cols += [f"{m}_{int(round(q * 100))}" for q in cfg.percentiles]
    return cols


MID_COLS = [
    "mid_ts", "mid_turn_idx", "mid_text_len", "mid_fcc",
    "mid_rcc_like", "mid_r_dn", "mid_g_dn", "mid_b_dn",
]


def _gap_fill_from_agg(
    agg: DataFrame, tier: str, series_cols: list[str]
) -> DataFrame:
    """Join-free gap-fill: synthesize the empty buckets FROM THE AGGREGATE
    OUTPUT instead of rescanning the input for per-series bounds.

    The classic spine (``bucket_spine``: min/max over the input, explode,
    left join) costs a second full input scan per rollup — at 100 TB that
    is the single most expensive line in the plan. But the aggregate
    output already contains every non-empty (series, bucket); the spine
    range [bucket(first datum), bucket(last datum)] is exactly
    [min, max] of those buckets. So: one lag window over the (tiny,
    O(buckets)) aggregate finds each gap between consecutive non-empty
    buckets, ``sequence``+``explode`` emits the missing bucket starts as
    all-null rows (turn_count coalesces to 0 in the tier projection,
    reproducing the nodata branch of generate_summary_timeseries.py:
    355-385). Net: the input is scanned ONCE per rollup, the extra
    shuffle+window touches only rolled-up rows, and no join — the
    gap-fill stage is now O(output), not O(input).

    The shape is deliberately SINGLE-BRANCH (each aggregate row explodes
    into itself plus the missing buckets since its predecessor) rather
    than a union of agg + gaps: a second consumer of the aggregate gets
    column-pruned by Catalyst into a *different* aggregate, which defeats
    exchange reuse and would re-scan the input.
    """
    from pyspark.sql.window import Window

    from ..functions.buckets import tier_nday

    payload = [c for c in agg.columns if c not in (*series_cols, "bucket_start")]
    w = Window.partitionBy(*series_cols).orderBy("bucket_start")
    withprev = agg.withColumn("_prev_b", F.lag("bucket_start").over(w))
    # Buckets in (prev, current]. The hot path — a series' first row, or
    # consecutive non-empty buckets (no gap) — emits just the row's own
    # bucket with NO array/sequence work; the sequence construction runs
    # only on actual gap rows. (The previous form ran an ArrayFilter
    # lambda — a CodegenFallback, interpreted per row — on EVERY
    # aggregate row; keeping it off the no-gap path measured ~7-12 %
    # off the gold-tier stage walls at 47.8 M turns. Consecutive
    # doy-anchored starts are <= nday days apart, including the
    # year-boundary restart, so datediff <= nday detects "no bucket in
    # between" exactly.)
    prev_b = F.col("_prev_b")
    cur_b = F.col("bucket_start")
    if tier == "hourly":
        step = F.expr("INTERVAL 1 HOUR")
        no_gap = prev_b.isNull() | (cur_b == prev_b + step)
        gap_arr = F.sequence(prev_b + step, cur_b, step)
    else:
        n = tier_nday(tier)
        no_gap = prev_b.isNull() | (F.datediff(cur_b, prev_b) <= n)
        days = F.sequence(
            F.date_add(prev_b, 1), cur_b, F.expr("INTERVAL 1 DAY")
        )
        gap_arr = (
            days
            if n == 1
            # keep only doy-lattice days: restarts at Jan 1 for free
            else F.filter(days, lambda d: (F.dayofyear(d) - 1) % n == 0)
        )
    arr = F.when(no_gap, F.array(cur_b)).otherwise(gap_arr)
    exploded = withprev.select(
        *series_cols,
        F.col("bucket_start").alias("_data_b"),
        F.explode(arr).alias("_b"),
        *payload,
    )
    is_data = F.col("_b") == F.col("_data_b")
    return exploded.select(
        *series_cols,
        F.col("_b").alias("bucket_start"),
        *[F.when(is_data, F.col(c)).alias(c) for c in payload],
    )


def rollup(
    features: DataFrame,
    cfg: RollupConfig,
    series_cols: list[str] | None = None,
    salt: int = 0,
    gap_fill: bool = True,
) -> DataFrame:
    """Roll tier-1 features into the tier-2 continuous aggregate for ``cfg.tier``.

    ``salt > 0`` pre-spreads rows of the same (series, bucket) across
    ``salt`` input partitions before the aggregate (two-phase for the
    algebraic part happens automatically via Spark's partial aggregation;
    exact percentiles still need the full group, so salting here is a
    repartition of the *scan* side to even out task input sizes).
    """
    series_cols = series_cols or ["conv_id"]
    tier = cfg.tier

    df = qc_filter(features, cfg).filter(F.col("quality_flag") != 1)
    df = df.withColumn("bucket_start", bucket_start(F.col("ts"), tier))
    df = df.withColumn("_anchor", midpoint_anchor(F.col("bucket_start"), tier))

    if salt > 0:
        df = df.repartition(
            *[F.col(c) for c in series_cols],
            F.col("bucket_start"),
            F.pmod(F.xxhash64("ts"), F.lit(salt)),
        )

    agg = df.groupBy(*series_cols, "bucket_start").agg(*_agg_exprs(cfg))
    # unwrap the shared percentile buffers into the public per-quantile
    # columns BEFORE gap-fill, so the gap-fill payload carries scalars
    pct_cols, pct_drop = _pct_finish_cols(cfg)
    agg = agg.select("*", *pct_cols).drop(*pct_drop)

    if gap_fill:
        agg = _gap_fill_from_agg(agg, tier, series_cols)

    # ---- count tiering + labels -----------------------------------------
    cnt = F.coalesce(F.col("turn_count"), F.lit(0))
    full = cnt >= cfg.nmin
    some = cnt > 0

    out_cols: list[Column] = [F.col(c) for c in series_cols]
    out_cols.append(F.col("bucket_start"))
    center = bucket_center(F.col("bucket_start"), tier)
    out_cols.append(center.alias("bucket_center"))
    out_cols.append(F.year(center).alias("year"))
    if tier == "hourly":
        out_cols.append(F.dayofyear(center).alias("doy"))
        out_cols.append(F.hour("bucket_start").alias("hour"))
    else:
        out_cols.append(F.dayofyear(center).alias("doy"))
    out_cols.append(cnt.cast("int").alias("turn_count"))
    for c in MID_COLS:
        out_cols.append(F.when(some, F.col("_mid")[c]).alias(c))
    # max_gate_value survives the sub-threshold tier
    # (generate_summary_timeseries.py:419,456)
    out_cols.append(F.when(some, F.col("max_gate_value")).alias("max_gate_value"))
    for c in _stat_cols(cfg):
        out_cols.append(F.when(full, F.col(c)).alias(c))

    return agg.select(*out_cols)
