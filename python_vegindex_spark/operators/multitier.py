"""All retention tiers from ONE scan and ONE wide shuffle.

The tiered pipeline (hourly/daily/weekly continuous aggregates, the
engine's reference-mirroring retention ladder — generate_summary_
timeseries.py is run once per aggregation period in the reference) is
normally three independent :func:`operators.rollup.rollup` calls. Each
is already one-scan/one-shuffle, but three tiers means the raw tier-1
input — the 100-TB side of the plan — is scanned and shuffled three
times.

This module computes every tier in a SINGLE linear plan:

    scan -> explode(array of per-tier (tier, bucket, anchor) structs)
         -> groupBy(series, tier, bucket).agg(...)        [the one shuffle]
         -> lag window over the tiny aggregate (gap-fill) [O(output)]
         -> tier projection (when-chains on the tier column)

which is exactly what SQL ``GROUPING SETS`` lowers to (an Expand node
replicating each input row once per grouping set), built explicitly so
each replica carries its own tier's bucket AND midpoint anchor — the
anchor is tier-dependent, which plain grouping sets cannot express.

Scale accounting vs three separate rollups at T input rows:
* scans:    3 -> 1   (the dominant cost at the 100-TB design point)
* shuffle:  3 shuffles of T rows -> 1 shuffle of 3T rows, but partial
  (map-side) aggregation collapses each replica stream to its tier's
  bucket grain before the wire, so the actual shuffle bytes are the
  SUM of the three per-tier aggregate states — the same bytes the three
  separate shuffles moved, now in one exchange.
* everything downstream of the aggregate runs on rolled-up rows.

The plan stays strictly linear (no self-union, no per-tier filter
branches): a per-tier ``filter`` above the aggregate would be pushed
below it by Catalyst, splitting the shared Exchange into three distinct
subplans and silently re-introducing the triple scan. Gap-fill and the
count-tier projection therefore branch on the ``tier`` COLUMN inside
one pass (``CASE WHEN`` evaluates only the taken branch per row).

Equivalence to the single-tier operator is pinned by
``tests/test_multitier.py``: for each tier, the ``tier = t`` slice of
:func:`rollup_tiers` is row-identical to ``rollup(features, cfg_t)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import RollupConfig
from ..functions.buckets import (
    bucket_center,
    bucket_start,
    midpoint_anchor,
    tier_minutes,
    tier_nday,
)
from .rollup import (
    MID_COLS,
    _agg_exprs,
    _pct_finish_cols,
    _stat_cols,
    qc_filter,
)


def _tier_kind(tier: str) -> str:
    """'fixed' (hourly / minute grains, constant-width timestamp lattice)
    or 'day' (doy-anchored date lattice with yearly restart)."""
    if tier == "hourly" or tier_minutes(tier) is not None:
        return "fixed"
    tier_nday(tier)  # raises on unknown spellings
    return "day"


def _tier_step_expr(tier: str) -> Column:
    """Lattice step for a fixed-width tier, as an INTERVAL literal."""
    if tier == "hourly":
        return F.expr("INTERVAL 1 HOUR")
    m = tier_minutes(tier)
    return F.expr(f"INTERVAL {m} MINUTES")


def _when_chain(tier_col: Column, per_tier: dict[str, Column]) -> Column:
    """CASE tier WHEN t1 ... chain; tiers are validated upstream so the
    final branch is ``otherwise`` (no stray NULL arm)."""
    items = list(per_tier.items())
    out = None
    for t, c in items[:-1]:
        out = F.when(tier_col == t, c) if out is None else out.when(tier_col == t, c)
    last = items[-1][1]
    return last if out is None else out.otherwise(last)


def explode_tiers(
    df: DataFrame, tiers: tuple[str, ...], ts_col: str = "ts"
) -> DataFrame:
    """Replicate each row once per tier with that tier's bucket + anchor.

    Adds columns ``tier`` (string), ``bucket_start`` (timestamp — day
    tiers surface as midnight; one union column needs one type) and
    ``_anchor`` (timestamp). This is the explicit Expand of the
    grouping-sets lowering; the generator is a pure column expression
    (array of structs), fully codegen'd — no Python, no extra shuffle.
    """
    ts = F.col(ts_col)
    structs = []
    for t in tiers:
        b = bucket_start(ts, t)
        structs.append(
            F.struct(
                F.lit(t).alias("tier"),
                F.to_timestamp(b).alias("bucket_start"),
                midpoint_anchor(b, t).alias("anchor"),
            )
        )
    exploded = df.withColumn("_t", F.explode(F.array(*structs)))
    return (
        exploded.withColumn("tier", F.col("_t.tier"))
        .withColumn("bucket_start", F.col("_t.bucket_start"))
        .withColumn("_anchor", F.col("_t.anchor"))
        .drop("_t")
    )


def _gap_fill_multi(
    agg: DataFrame, tiers: tuple[str, ...], series_cols: list[str]
) -> DataFrame:
    """Join-free gap-fill over the multi-tier aggregate — the when-branch
    twin of ``rollup._gap_fill_from_agg`` (same single-branch shape, same
    no-gap fast path; see that docstring for why it is O(output) and why
    the plan must not fork).
    """
    from pyspark.sql.window import Window

    payload = [
        c for c in agg.columns if c not in (*series_cols, "tier", "bucket_start")
    ]
    w = Window.partitionBy(*series_cols, "tier").orderBy("bucket_start")
    withprev = agg.withColumn("_prev_b", F.lag("bucket_start").over(w))
    prev_b, cur_b = F.col("_prev_b"), F.col("bucket_start")
    tier_col = F.col("tier")

    no_gap_by, arr_by = {}, {}
    day_step = F.expr("INTERVAL 1 DAY")
    for t in tiers:
        if _tier_kind(t) == "fixed":
            step = _tier_step_expr(t)
            no_gap_by[t] = cur_b == prev_b + step
            arr_by[t] = F.sequence(prev_b + step, cur_b, step)
        else:
            n = tier_nday(t)
            # consecutive doy-lattice starts are <= n days apart
            # (including the Jan-1 restart after a short final bucket)
            no_gap_by[t] = F.datediff(cur_b, prev_b) <= n
            days = F.sequence(prev_b + day_step, cur_b, day_step)
            arr_by[t] = (
                days
                if n == 1
                else F.filter(
                    days, lambda d: (F.dayofyear(d) - 1) % n == 0
                )
            )
    no_gap = prev_b.isNull() | _when_chain(tier_col, no_gap_by)
    arr = F.when(no_gap, F.array(cur_b)).otherwise(_when_chain(tier_col, arr_by))

    exploded = withprev.select(
        *series_cols,
        "tier",
        F.col("bucket_start").alias("_data_b"),
        F.explode(arr).alias("_b"),
        *payload,
    )
    is_data = F.col("_b") == F.col("_data_b")
    return exploded.select(
        *series_cols,
        "tier",
        F.col("_b").alias("bucket_start"),
        *[F.when(is_data, F.col(c)).alias(c) for c in payload],
    )


def _validate_cfgs(cfgs: list[RollupConfig]) -> RollupConfig:
    if not cfgs:
        raise ValueError("rollup_tiers needs at least one RollupConfig")
    tiers = [c.tier for c in cfgs]
    if len(set(tiers)) != len(tiers):
        raise ValueError(f"duplicate tiers: {tiers}")
    head = cfgs[0]
    for c in cfgs[1:]:
        shared = (
            c.qc,
            c.percentiles,
            c.approx_percentiles,
            c.approx_accuracy,
            c.quantile_type,
        )
        if shared != (
            head.qc,
            head.percentiles,
            head.approx_percentiles,
            head.approx_accuracy,
            head.quantile_type,
        ):
            raise ValueError(
                "rollup_tiers shares one aggregate across tiers: all "
                "configs must agree on qc/percentiles/quantile settings "
                f"(differ: {head} vs {c}); nmin may vary per tier"
            )
    return head


def rollup_tiers(
    features: DataFrame,
    cfgs: list[RollupConfig],
    series_cols: list[str] | None = None,
    salt: int = 0,
    gap_fill: bool = True,
) -> DataFrame:
    """Every retention tier's continuous aggregate from one scan.

    Returns the union of the per-tier rollup outputs with a leading
    ``tier`` column; ``bucket_start``/``bucket_center`` are timestamps
    for every tier (day tiers at midnight — cast to date to recover the
    single-tier operator's types), and ``hour`` is NULL for non-hourly
    tiers. ``nmin`` may differ per tier; qc/percentile settings must
    match (one shared aggregate).

    Per-tier slices are row-identical to :func:`rollup.rollup` with the
    matching config (``tests/test_multitier.py``).
    """
    series_cols = series_cols or ["conv_id"]
    head = _validate_cfgs(cfgs)
    tiers = tuple(c.tier for c in cfgs)
    nmin_by = {c.tier: c.nmin for c in cfgs}
    tier_col = F.col("tier")

    df = qc_filter(features, head).filter(F.col("quality_flag") != 1)
    df = explode_tiers(df, tiers)

    if salt > 0:
        df = df.repartition(
            *[F.col(c) for c in series_cols],
            tier_col,
            F.col("bucket_start"),
            F.pmod(F.xxhash64("ts"), F.lit(salt)),
        )

    agg = df.groupBy(*series_cols, "tier", "bucket_start").agg(*_agg_exprs(head))
    pct_cols, pct_drop = _pct_finish_cols(head)
    agg = agg.select("*", *pct_cols).drop(*pct_drop)

    if gap_fill:
        agg = _gap_fill_multi(agg, tiers, series_cols)

    # ---- count tiering + labels (when-chains on the tier column) --------
    cnt = F.coalesce(F.col("turn_count"), F.lit(0))
    nmin_expr = _when_chain(tier_col, {t: F.lit(nmin_by[t]) for t in tiers})
    full = cnt >= nmin_expr
    some = cnt > 0

    center = _when_chain(
        tier_col,
        {
            t: (
                F.col("bucket_start")
                if _tier_kind(t) == "fixed"
                else F.to_timestamp(
                    bucket_center(F.to_date("bucket_start"), t)
                )
            )
            for t in tiers
        },
    )

    out_cols: list[Column] = [F.col(c) for c in series_cols]
    out_cols.append(tier_col)
    out_cols.append(F.col("bucket_start"))
    out_cols.append(center.alias("bucket_center"))
    out_cols.append(F.year(center).alias("year"))
    out_cols.append(F.dayofyear(center).alias("doy"))
    hour_by = {
        t: (
            F.hour("bucket_start")
            if t == "hourly"
            else F.lit(None).cast("int")
        )
        for t in tiers
    }
    out_cols.append(_when_chain(tier_col, hour_by).alias("hour"))
    out_cols.append(cnt.cast("int").alias("turn_count"))
    for c in MID_COLS:
        out_cols.append(F.when(some, F.col("_mid")[c]).alias(c))
    out_cols.append(F.when(some, F.col("max_gate_value")).alias("max_gate_value"))
    for c in _stat_cols(head):
        out_cols.append(F.when(full, F.col(c)).alias(c))

    return agg.select(*out_cols)


def rollup_series_tiers(
    df: DataFrame,
    tiers: tuple[str, ...],
    series_cols: list[str],
    value_col: str = "value",
    ts_col: str = "ts",
    percentiles: tuple[float, ...] = (0.5, 0.75, 0.9),
    nmin: int = 1,
    gap_fill: bool = True,
    round_to: int | None = 6,
    value_scale: int | None = None,
) -> DataFrame:
    """Generic multi-tier twin of ``generic_rollup.rollup_series``: one
    value column, every tier, one scan + one shuffle. Output adds a
    ``tier`` column; ``bucket_start`` is a timestamp for every tier.

    ``value_scale``: exact-integer-moment v_mean/v_std (unrounded,
    cross-engine-tie-proof) — same contract as ``rollup_series``.

    Unlike ``rollup_series`` (bucket_spine join), gap-fill here is the
    join-free O(output) form — the generic single-tier operator keeps
    its spine join because its oracle SQL mirrors that shape, but at
    scale this is the plan you want.
    """
    from ..functions.quantile import nan_to_null

    if len(set(tiers)) != len(tiers):
        raise ValueError(f"duplicate tiers: {tiers}")
    v = nan_to_null(F.col(value_col))
    d = explode_tiers(df, tiers, ts_col=ts_col).drop("_anchor")

    def _r(c: Column) -> Column:
        return F.round(c, round_to) if round_to is not None else c

    aggs = [
        F.count(F.when(v.isNotNull(), 1)).alias("n"),
        _r(F.min(v)).alias("v_min"),
        _r(F.max(v)).alias("v_max"),
    ]
    if value_scale is None:
        aggs[1:1] = [
            _r(F.avg(v)).alias("v_mean"),
            _r(F.stddev_pop(v)).alias("v_std"),
        ]
    else:
        qv = F.floor(v * F.lit(int(value_scale))).cast("decimal(19,0)")
        aggs += [
            F.sum(qv).cast("decimal(38,0)").alias("_s1"),
            F.sum(qv * qv).cast("decimal(38,0)").alias("_s2"),
        ]
    qarr = F.array(*[F.lit(float(q)) for q in percentiles])
    if percentiles:
        aggs.append(F.percentile(v, qarr).alias("_pq"))
    agg = d.groupBy(*series_cols, "tier", "bucket_start").agg(*aggs)
    if value_scale is not None:
        # pinned exact-moment finish — see rollup_series
        den = F.lit(float(value_scale)) * F.col("n").cast("double")
        var_num = (
            F.col("n").cast("decimal(38,0)") * F.col("_s2")
            - F.col("_s1") * F.col("_s1")
        )
        agg = agg.withColumn(
            "v_mean", F.col("_s1").cast("double") / den
        ).withColumn(
            "v_std", F.sqrt(var_num.cast("double")) / den
        ).drop("_s1", "_s2")
    pnames = [f"v_{int(round(q * 100))}" for q in percentiles]
    agg = agg.select(
        "*",
        *[
            _r(F.element_at(F.col("_pq"), i + 1).cast("double")).alias(nm)
            for i, nm in enumerate(pnames)
        ],
    ).drop(*(["_pq"] if percentiles else []))

    if gap_fill:
        agg = _gap_fill_multi(agg, tiers, series_cols)

    cnt = F.coalesce(F.col("n"), F.lit(0))
    full = cnt >= nmin
    stat_cols = ["v_mean", "v_std", "v_min", "v_max", *pnames]
    return agg.select(
        *series_cols,
        "tier",
        "bucket_start",
        cnt.cast("long").alias("n"),
        *[F.when(full, F.col(c)).alias(c) for c in stat_cols],
    )
