"""Generic continuous-aggregate rollup over any (series, ts, value) table.

The transcript rollup (operators/rollup.py) is the full-fidelity port of
the reference summary pipeline over the tier-1 feature schema; this
module is the same operator family generalized to arbitrary tables —
what a user points at any time-series DataFrame (here: the driver's
``events`` table). Shares the bucket/spine/percentile machinery and the
same plan shape: one shuffle, JVM-only aggregates, gap-fill via a tiny
spine join.

Semantics per the reference:
* buckets/gap-fill: vegindex.py:22-64 + generate_summary_timeseries.py:295-301
* mean/stddev_pop/exact HF-7 percentiles: generate_summary_timeseries.py:438-457
* count tiering vs nmin: generate_summary_timeseries.py:354-461
* argmin-to-anchor representative row: generate_summary_timeseries.py:393-400
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from ..functions.timeutil import epoch_us

from ..functions.buckets import bucket_center, bucket_spine, bucket_start, midpoint_anchor


def rollup_series(
    df: DataFrame,
    tier: str,
    series_cols: list[str],
    value_col: str = "value",
    ts_col: str = "ts",
    percentiles: tuple[float, ...] = (0.5, 0.75, 0.9),
    nmin: int = 1,
    gap_fill: bool = True,
    round_to: int | None = 6,
    value_scale: int | None = None,
) -> DataFrame:
    """Roll one value column into tier buckets per series.

    Output: series..., bucket_start, n (rows with non-null value),
    v_mean, v_std (population), v_{q} exact percentiles, v_min, v_max —
    nulled below ``nmin`` per the reference tiering. ``round_to`` rounds
    float aggregates for stable cross-engine comparison.

    ``value_scale`` (e.g. 100 for 2-decimal measures): compute v_mean
    and v_std from EXACT integer moments of ``floor(v * scale)`` —
    DECIMAL(38,0) sums, then one pinned double expression, UNROUNDED.
    This is the cross-engine-tie-proof path (SURVEY §8): ``round(avg)``
    lands EXACTLY midway at the 6th decimal whenever the group mean
    hits the scale/n grid (e.g. 2-decimal values, n=32 -> ...8125),
    and engines disagree on the coin flip. Quantization is lossless
    when the data carries <= log10(scale) decimals; precision-critical
    measures (NDVI) should leave it None. round_to still applies to
    min/max/percentiles, whose decimal expansions terminate far above
    the 6th digit (safe to round).

    NaN ≡ NULL (dropped before every aggregate, n included) — the
    engine-wide rule (functions/quantile module docstring); Spark's
    avg/percentile would otherwise propagate a stray NaN that the
    reference's nanmean semantics and the oracles drop.
    """
    from ..functions.quantile import nan_to_null

    ts = F.col(ts_col)
    v = nan_to_null(F.col(value_col))
    d = df.withColumn("bucket_start", bucket_start(ts, tier))

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
    for q in percentiles:
        aggs.append(
            _r(F.percentile(v, F.lit(q))).alias(f"v_{int(round(q * 100))}")
        )
    agg = d.groupBy(*series_cols, "bucket_start").agg(*aggs)
    if value_scale is not None:
        # pinned: ONE divide per stat; sqrt argument is an EXACT
        # integer (n*Σq² − (Σq)² as DECIMAL(38,0) → double, identical
        # rounding in both engines), so every bit matches DuckDB
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

    if gap_fill:
        spine = bucket_spine(d, tier, series_cols)
        agg = spine.join(agg, on=[*series_cols, "bucket_start"], how="left")

    cnt = F.coalesce(F.col("n"), F.lit(0))
    full = cnt >= nmin
    stat_cols = ["v_mean", "v_std", "v_min", "v_max"] + [
        f"v_{int(round(q * 100))}" for q in percentiles
    ]
    out = agg.select(
        *series_cols,
        "bucket_start",
        cnt.cast("long").alias("n"),
        *[F.when(full, F.col(c)).alias(c) for c in stat_cols],
    )
    return out


def representative_rows(
    df: DataFrame,
    tier: str,
    series_cols: list[str],
    ts_col: str = "ts",
    tie_break_cols: list[str] | None = None,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """The "midday image" operator: per (series, bucket), the row nearest
    the bucket anchor; ties broken by earliest ts then ``tie_break_cols``
    (generate_summary_timeseries.py:393-400). Single hash aggregate via
    lexicographic min(struct) — no window shuffle-sort needed.
    """
    tie_break_cols = tie_break_cols or []
    payload_cols = payload_cols or [
        c for c in df.columns if c not in series_cols
    ]
    ts = F.col(ts_col)
    d = df.withColumn("bucket_start", bucket_start(ts, tier)).withColumn(
        "_anchor", midpoint_anchor(F.col("bucket_start"), tier)
    )
    payload = F.struct(
        F.abs(epoch_us(ts) - epoch_us(F.col("_anchor"))).alias("_d"),
        ts.alias("_ts"),
        *[F.col(c).alias(f"_tb_{c}") for c in tie_break_cols],
        *[F.col(c).alias(c) for c in payload_cols],
    )
    agg = d.groupBy(*series_cols, "bucket_start").agg(F.min(payload).alias("_m"))
    return agg.select(
        *series_cols,
        "bucket_start",
        *[F.col("_m")[c].alias(c) for c in payload_cols],
    )


def top_frequent(
    df: DataFrame,
    tier: str,
    series_cols: list[str],
    key_col: str,
    k: int = 5,
    ts_col: str = "ts",
) -> DataFrame:
    """Heavy hitters per bucket: the ``k`` most frequent values of
    ``key_col`` per (series, time bucket) — "top error codes per hour",
    the dashboard companion of the numeric rollup.

    Two hash aggregates: raw rows collapse to (series, bucket, key)
    counts map-side first (the heavy lift — the shuffle carries counts,
    not rows), then a rank window runs over those SMALL aggregated
    rows. Rank key is (n DESC, key ASC): integer-exact, deterministic
    under count ties. NULL keys are dropped.

    Output: series, ``bucket_start``, ``rank`` (1-based), ``key``, ``n``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    counts = (
        df.where(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .groupBy(
            *series_cols,
            bucket_start(F.col(ts_col), tier).alias("bucket_start"),
            F.col(key_col).alias("key"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy(
        *[F.col(c) for c in series_cols], F.col("bucket_start")
    ).orderBy(F.col("n").desc(), F.col("key").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(*series_cols, "bucket_start", "rank", "key", "n")
    )


def category_diversity(
    df: DataFrame,
    tier: str,
    series_cols: list[str],
    key_col: str,
    ts_col: str = "ts",
    round_to: int | None = 6,
) -> DataFrame:
    """Categorical diversity per (series, bucket): how concentrated is
    a key column's distribution — "is one tool/error code/user eating
    the hour?" — the distribution-health companion of
    :func:`top_frequent`'s top-k.

    Reports the Gini-Simpson index and its unbiased small-sample form
    (Hurlbert's PIE — the probability two rows drawn WITHOUT
    replacement differ)::

        simpson  = 1 - sum(c_i^2) / n^2
        pie      = 1 - sum(c_i*(c_i-1)) / (n*(n-1))      (NULL at n < 2)

    Simpson is chosen over Shannon entropy deliberately: no logarithms
    (the cross-engine libm-ulp class the drift operator also avoids,
    operators/downsample.value_drift) — both numerators and
    denominators are exact BIGINT sums/products, finished by ONE pinned
    double division each, so the floats are engine-exact.

    Same two-aggregate shape as :func:`top_frequent`: raw rows collapse
    to (series, bucket, key) counts map-side (the shuffle carries
    counts, not rows), then one tiny aggregate per (series, bucket).
    NULL keys are dropped. Output: series, ``bucket_start``, ``n``,
    ``k_distinct``, ``top_share`` (modal count / n — the dominance
    ratio, exact division), ``simpson``, ``pie``.
    """
    counts = (
        df.where(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .groupBy(
            *series_cols,
            bucket_start(F.col(ts_col), tier).alias("bucket_start"),
            F.col(key_col).alias("_key"),
        )
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    agg = counts.groupBy(*series_cols, "bucket_start").agg(
        F.sum("_c").alias("n"),
        F.count(F.lit(1)).alias("k_distinct"),
        F.max("_c").alias("_cmax"),
        F.sum(F.col("_c") * F.col("_c")).alias("_c2"),
        F.sum(F.col("_c") * (F.col("_c") - 1)).alias("_cc1"),
    )
    nd = F.col("n").cast("double")
    simpson = F.lit(1.0) - F.col("_c2").cast("double") / (nd * nd)
    pie = F.when(
        F.col("n") >= 2,
        F.lit(1.0)
        - F.col("_cc1").cast("double") / (nd * (nd - F.lit(1.0))),
    )
    top_share = F.col("_cmax").cast("double") / nd

    def _r(c):
        return F.round(c, round_to) if round_to is not None else c

    return agg.select(
        *series_cols,
        "bucket_start",
        "n",
        "k_distinct",
        _r(top_share).alias("top_share"),
        _r(simpson).alias("simpson"),
        _r(pie).alias("pie"),
    )


def dimensional_rollup(
    df: DataFrame,
    dim_cols: list[str],
    value_col: str,
    mode: str = "cube",
    ts_col: str | None = None,
    tier: str | None = None,
) -> DataFrame:
    """OLAP subtotals over dimension columns: ``GROUP BY CUBE`` /
    ``ROLLUP`` with a grouping id — the drill-down/summary lattice the
    reference has nowhere (SURVEY §2.4: "no grouping sets / cube /
    rollup") and a dashboard engine needs everywhere ("by source, by
    (source, lang), and the grand total, in one pass").

    Catalyst's Expand does the heavy lifting: ONE scan, one Expand that
    replicates each row once per grouping set, one hash aggregate —
    the same physical shape the fused multi-tier rollup
    (operators/multitier.py) exploits, with combinatorial sets instead
    of tiers. Cost scales with the number of sets (2^d for cube,
    d+1 for rollup) — keep ``dim_cols`` short at 100 TB, or use
    ``mode="rollup"`` for the hierarchy-only lattice.

    ``value_col`` must be integral (sums stay BIGINT-exact). Optional
    (``ts_col``, ``tier``) adds a calendar bucket as the INNERMOST
    grouping (always present, never subtotaled — per-bucket cubes).
    ``gid`` is ``grouping_id()`` over ``dim_cols`` in order (first dim
    = most significant bit; bit set = that dim is rolled up), which
    disambiguates subtotal NULLs from NULL dimension VALUES.

    Output: dims..., [bucket_start,] ``gid``, ``n``, ``v_sum``.
    """
    if mode not in ("cube", "rollup"):
        raise ValueError(f"mode must be 'cube' or 'rollup', got {mode!r}")
    if (ts_col is None) != (tier is None):
        raise ValueError("pass ts_col and tier together or neither")
    v = F.col(value_col)
    d = df.where(v.isNotNull())
    cols: list[Column] = [F.col(c) for c in dim_cols]
    if ts_col is not None:
        d = d.where(F.col(ts_col).isNotNull())
        d = d.withColumn("bucket_start", bucket_start(F.col(ts_col), tier))
    if ts_col is None:
        grouped = d.cube(*cols) if mode == "cube" else d.rollup(*cols)
        gid_expr, keep = F.grouping_id(), None
    elif mode == "cube":
        # bucket listed LAST: its grouping bit is the least significant,
        # so bucket-concrete sets are the even gids and gid//2 recovers
        # the pure-dims bitmask
        grouped = d.cube(*cols, F.col("bucket_start"))
        gid_expr, keep = F.grouping_id(), F.col("_gid_all") % 2 == 0
    else:
        # ROLLUP strips from the RIGHT, so the bucket must lead or the
        # very first subtotal level would erase it (leaving the
        # bucket-concrete filter nothing but the finest set); with the
        # bucket first, sets are (bucket, d1..dk), (bucket, d1..dk-1),
        # ..., (bucket), () — every subtotal level keeps the bucket.
        # gid = the dims bitmask directly (bucket bit is the HIGH bit
        # and 0 on every kept set)
        grouped = d.rollup(F.col("bucket_start"), *cols)
        gid_expr, keep = F.grouping_id(), F.col("_gid_all") < 2 ** len(dim_cols)
    out = grouped.agg(
        gid_expr.alias("_gid_all"),
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("v_sum"),
    )
    if ts_col is not None:
        out = out.where(keep).withColumn(
            "gid",
            (F.col("_gid_all") / 2).cast("long")
            if mode == "cube"
            else F.col("_gid_all").cast("long"),
        )
        sel = [*dim_cols, "bucket_start", "gid", "n", "v_sum"]
    else:
        out = out.withColumn("gid", F.col("_gid_all").cast("long"))
        sel = [*dim_cols, "gid", "n", "v_sum"]
    return out.select(*sel)


def last_point(
    df: DataFrame,
    series_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Current state of every series — the dashboard "last point" query
    (TimescaleDB `last(value, time)` / SkipScan, PromQL instant
    vector): per series, the most recent sample's (ts, value).

    One aggregate, no window, no sort of raw rows: ``max`` over a
    ``(epoch-µs, order..., value)`` struct — the operators/bars.py
    open/close pick reduced to its essence. O(1) state per series,
    map-side partials, one shuffle on the series key.

    Output: series..., ``last_ts``, ``last_value``, ``n`` (sample
    count). Rows with NULL or NaN ts/value are ignored (NaN ≡ NULL,
    the engine-wide rule); ts ties break on ``order_cols`` then value
    (deterministic).
    """
    v = F.col(value_col)
    # NaN ≡ NULL (engine-wide rule): a NaN sample is not a state
    d = df.where(
        F.col(ts_col).isNotNull() & v.isNotNull() & ~F.isnan(v.cast("double"))
    ).select(
        *series_cols,
        F.struct(
            epoch_us(F.col(ts_col)).alias("_t"),
            *[F.col(c).alias(f"_o{i}") for i, c in enumerate(order_cols or [])],
            v.alias("_v"),
        ).alias("_k"),
    )
    agg = d.groupBy(*series_cols).agg(
        F.max("_k").alias("_m"), F.count(F.lit(1)).alias("n")
    )
    return agg.select(
        *series_cols,
        F.timestamp_micros(F.col("_m._t")).alias("last_ts"),
        F.col("_m._v").alias("last_value"),
        "n",
    )
