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
* :func:`ewma_smooth` — finite-window exponential moving average over
  already-rolled-up bucket rows (Influx ``exponential_moving_average``
  analog), literal Python-computed weights for cross-engine bit parity.
* :func:`linear_trend` — per-bucket OLS slope/intercept + Pearson corr
  of an integral measure vs seconds-within-bucket, from order-free
  BIGINT moment sums (TimescaleDB ``stats_agg`` analog).
* :func:`distinct_rollup` — unique-key cardinality per bucket, exact
  two-phase ``count(distinct)`` by default with a HyperLogLog++ opt-in.
* :func:`interval_coverage` — heartbeat uptime / SLA coverage per
  bucket (TimescaleDB ``heartbeat_agg`` analog): gaps-and-islands
  merge, islands clipped to epoch-anchored buckets, integer-µs exact.
* :func:`seasonal_profile` / :func:`seasonal_deviation` — weekly
  (dow x hour) seasonal baselines and zero-shuffle broadcast scoring
  of live rows against them (the seasonal counterpart of
  :func:`anomaly_zscore`'s trailing window).
* :func:`period_over_period` — WoW/DoD comparison column on bucket
  rows via an exact-offset RANGE frame (never "previous row").
* :func:`threshold_alerts` — two-threshold hysteresis alerting,
  expressed exactly as a last-non-null-edge window (no recursion).

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
    value_scale: int | None = None,
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

    if value_scale is None:
        twa = _r(
            F.sum(v * F.col("_dt").cast("double"))
            / F.sum(F.col("_dt").cast("double"))
        )
    else:
        # EXACT integer numerator: floor(v*scale) * dt_us summed as
        # DECIMAL(38,0), ONE pinned double division, UNROUNDED — the
        # float sum-of-products is order-dependent AND round(., 6)
        # coin-flips when the true twa lands midway (SURVEY §8)
        num = F.sum(
            (F.floor(v * F.lit(int(value_scale))) * F.col("_dt")).cast(
                "decimal(38,0)"
            )
        ).cast("double")
        twa = num / (
            F.lit(float(value_scale)) * F.sum("_dt").cast("double")
        )
    return d.groupBy(*series_cols, "bucket_start").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum("_dt").alias("covered_us"),
        twa.alias("twa"),
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


def ewma_weights(alpha: float, span_k: int) -> list[float]:
    """The finite-window EWMA weight vector ``alpha * (1-alpha)^j`` for
    ``j = 0..span_k-1``, computed ONCE in Python floats so both the
    Spark plan and any cross-engine oracle consume the IDENTICAL
    literals (no in-plan ``pow`` whose libm could differ by an ulp)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not 1 <= span_k <= 128:
        # each weight becomes one lag expression in the plan; past ~128
        # the codegen blowup costs more than the tail weights (~(1-a)^128)
        # could ever contribute
        raise ValueError(f"span_k must be in [1, 128], got {span_k}")
    return [alpha * (1.0 - alpha) ** j for j in range(span_k)]


def ewma_smooth(
    df: DataFrame,
    series_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alpha: float = 0.3,
    span_k: int = 8,
    out_col: str = "ewma",
    round_to: int | None = 6,
) -> DataFrame:
    """Finite-window exponential moving average over ALREADY-AGGREGATED
    rows (Influx ``exponential_moving_average`` / Grafana smoothing
    analog): per series ordered by ``order_cols``,

        ewma_t = sum_j w_j * x_{t-j} / sum_j w_j,   w_j = a*(1-a)^j,

    summed over the trailing ``span_k`` rows whose value is non-NULL
    (missing buckets — e.g. gap-filled empty rollup rows — drop out and
    the remaining weights renormalize, the standard ignore-missing
    mode; a row with a NULL value of its own still gets the smoothed
    trail of its predecessors).

    Shape: this runs AFTER a rollup, on bucket-grain rows — one
    (series)-keyed window with a ``span_k``-deep lag chain, pure
    codegen expressions, no extra shuffle beyond the window's. Both
    accumulations are pinned left-to-right in ``j`` order and the
    weights are Python-computed literals (:func:`ewma_weights`), so the
    result is reproducible bit-for-bit across engines given equal
    inputs.
    """
    weights = ewma_weights(alpha, span_k)
    w = Window.partitionBy(*[F.col(c) for c in series_cols]).orderBy(
        *[F.col(c) for c in order_cols]
    )
    vc = F.col(value_col).cast("double")
    v = F.when(~F.isnan(vc), vc)  # NaN ≡ NULL (engine-wide rule)
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j, wj in enumerate(weights):
        xj = F.lag(v, j).over(w) if j else v
        num = num + F.when(xj.isNotNull(), F.lit(wj) * xj).otherwise(F.lit(0.0))
        den = den + F.when(xj.isNotNull(), F.lit(wj)).otherwise(F.lit(0.0))
    ewma = F.when(den > 0, num / den)
    if round_to is not None:
        ewma = F.round(ewma, round_to)
    return df.withColumn(out_col, ewma)


def linear_trend(
    df: DataFrame,
    tier: str,
    series_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    round_to: int | None = 6,
) -> DataFrame:
    """Per-bucket OLS line fit + Pearson correlation of an INTEGRAL
    measure against time (TimescaleDB ``stats_agg``→``slope()``/
    ``corr()`` analog — "is this metric trending up within the hour?").

    ``x`` = whole seconds since the row's bucket start (sub-second
    position truncated — the trend is fitted at second resolution so
    every moment sum stays integer-exact); ``y`` = ``value_col`` cast
    to long (raise on float columns upstream: quantize first, as the
    anomaly/heatmap queries do). Per (series, bucket) the six moment
    sums n/Sx/Sy/Sxx/Sxy/Syy accumulate as BIGINTs — ORDER-FREE and
    engine-exact — and the derived

        slope     = (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx)
        intercept = (Sy - slope*Sx) / n          (value at bucket start)
        corr      = (n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx*Sx) * sqrt(n*Syy - Sy*Sy))

    are evaluated in doubles in exactly this op order, so the floats are
    reproducible bit-for-bit across engines. NULL slope/intercept when
    n < 2 or all x equal; NULL corr when either variance is zero.

    Scale: ONE hash aggregate on the (series, bucket) key — the rollup's
    own shuffle shape; the moment products stay within int64 for |y| up
    to ~3e4 at a billion rows per bucket (x <= 86399; document larger
    measures down-scale first). 100-TB safe.
    """
    _bucket_seconds(tier)  # validates tier
    ts = F.col(ts_col)
    b = bucket_start(ts, tier)
    x = ((epoch_us(ts) - epoch_us(b)) / F.lit(1_000_000)).cast("long")
    y = F.col(value_col).cast("long")
    # NaN ≡ NULL: a NaN would silently cast to 0L and poison the sums
    d = df.where(
        ts.isNotNull()
        & F.col(value_col).isNotNull()
        & ~F.isnan(F.col(value_col).cast("double"))
    ).select(
        *series_cols,
        b.alias("bucket_start"),
        x.alias("_x"),
        y.alias("_y"),
    )
    agg = d.groupBy(*series_cols, "bucket_start").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    sxy = F.col("_sxy").cast("double")
    syy = F.col("_syy").cast("double")
    cov_n = n * sxy - sx * sy
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    slope = F.when((F.col("n") >= 2) & (varx_n > 0), cov_n / varx_n)
    intercept = F.when(slope.isNotNull(), (sy - slope * sx) / n)
    corr = F.when(
        slope.isNotNull() & (vary_n > 0), cov_n / (F.sqrt(varx_n) * F.sqrt(vary_n))
    )

    def _r(c):
        return F.round(c, round_to) if round_to is not None else c

    return agg.select(
        *series_cols,
        "bucket_start",
        "n",
        _r(slope).alias("slope"),
        _r(intercept).alias("intercept"),
        _r(corr).alias("corr"),
    )


def distinct_rollup(
    df: DataFrame,
    tier: str,
    series_cols: Sequence[str],
    key_col: str,
    ts_col: str = "ts",
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Unique-key cardinality per (series, bucket) — the "distinct
    active users per hour/day" continuous aggregate.

    Default is EXACT ``count(distinct key)``: Spark plans it as two
    hash aggregates — partial dedup on (series, bucket, key), then the
    count on (series, bucket) — both on uniform keys, no all-rows
    collect anywhere, so it holds at 100 TB (the key set per bucket,
    not the row count, is what must fit a partition's aggregate map,
    and the FIRST agg dedups map-side before the shuffle).
    ``approx=True`` switches to HyperLogLog++
    (``approx_count_distinct``, relative error ``rsd``) — constant
    sketch memory per bucket, the knob for billion-cardinality keys;
    off by default for the same reason percentiles default exact
    (config.RollupConfig.approx_percentiles).

    Output: series, bucket_start, ``n_rows`` and ``n_distinct``.
    """
    _bucket_seconds(tier)  # validates tier
    ts = F.col(ts_col)
    d = df.where(ts.isNotNull()).select(
        *series_cols,
        bucket_start(ts, tier).alias("bucket_start"),
        F.col(key_col).alias("_k"),
    )
    cnt = (
        F.approx_count_distinct("_k", rsd=rsd)
        if approx
        else F.count_distinct(F.col("_k"))
    )
    return d.groupBy(*series_cols, "bucket_start").agg(
        F.count(F.lit(1)).alias("n_rows"),
        cnt.cast("long").alias("n_distinct"),
    )


def interval_coverage(
    df: DataFrame,
    tier: str,
    series_cols: Sequence[str],
    timeout_s: float,
    ts_col: str = "ts",
    round_to: int | None = 6,
) -> DataFrame:
    """Heartbeat uptime per calendar bucket (TimescaleDB
    ``heartbeat_agg`` analog — the SLA/uptime aggregate): every
    heartbeat at ``ts`` asserts liveness over ``[ts, ts + timeout)``;
    per (series, bucket) report the length of the UNION of those
    intervals clipped to the bucket.

    Classic gaps-and-islands, kept integer-exact end to end:

    1. per series ordered by epoch-µs, a row starts a new island when
       its ts exceeds the previous heartbeat's expiry (equal-length
       intervals ⇒ expiries are monotone in starts, so ``lag`` IS the
       running max); island id = running sum of start flags,
    2. one hash aggregate collapses each island to ``[min, max+T)``,
    3. each island explodes to the epoch-anchored buckets it spans
       (``sequence(s div step, (e-1) div step)``) with per-bucket
       overlap ``min(e, hi) - max(s, lo)`` — pure integer µs,
    4. one final aggregate sums overlaps per (series, bucket).

    Scale: the window shuffles raw heartbeats ONCE on the series key;
    everything after runs on collapsed islands (tiny — one row per
    outage-free run), so the explode is outage-count × span, not
    row-count, bound. Duplicate-ts heartbeats are tie-safe: a tied row
    can never open an island, so island boundaries are order-invariant.
    Fixed-width tiers only (hourly / daily / ``Nmin``) — a coverage
    fraction needs exact bucket edges, which the doy-anchored weekly
    tier doesn't have.

    Output: series, ``bucket_start``, ``n_islands``, ``uptime_us``
    (exact BIGINT), ``uptime_frac`` (uptime_us / bucket_us, pinned
    division, rounded).
    """
    if timeout_s <= 0:
        raise ValueError(f"timeout_s must be > 0, got {timeout_s}")
    step_s = tier_step_seconds(tier) or {"hourly": 3600, "daily": 86400}.get(tier)
    if step_s is None:
        raise ValueError(
            f"interval_coverage needs a fixed-width tier (hourly/daily/Nmin), got {tier!r}"
        )
    step = int(step_s) * 1_000_000
    tmo = int(round(float(timeout_s) * 1_000_000))
    t = epoch_us(F.col(ts_col))
    d = df.where(F.col(ts_col).isNotNull()).select(
        *series_cols, t.alias("_t")
    )
    w = Window.partitionBy(*[F.col(c) for c in series_cols]).orderBy("_t")
    prev_end = F.lag("_t").over(w) + F.lit(tmo)
    brk = F.when(prev_end.isNull() | (F.col("_t") > prev_end), 1).otherwise(0)
    wc = (
        Window.partitionBy(*[F.col(c) for c in series_cols])
        .orderBy("_t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    isl = (
        d.withColumn("_iid", F.sum(brk).over(wc))
        .groupBy(*series_cols, "_iid")
        .agg(
            F.min("_t").alias("_s"),
            (F.max("_t") + F.lit(tmo)).alias("_e"),
        )
    )
    lo = F.col("_bidx") * F.lit(step)
    hi = lo + F.lit(step)
    overlap = F.least(F.col("_e"), hi) - F.greatest(F.col("_s"), lo)
    per_bucket = isl.select(
        *series_cols,
        "_s",
        "_e",
        # integer div, never float: at minute grain the bucket index
        # (~3e10) outgrows the double spacing of 1/step, so a float
        # quotient 1 µs below a boundary would ROUND UP to it
        F.explode(
            F.sequence(
                F.expr(f"_s div {step}"),
                F.expr(f"(_e - 1) div {step}"),
            )
        ).alias("_bidx"),
    ).select(*series_cols, "_bidx", overlap.alias("_ov"))
    out = per_bucket.groupBy(*series_cols, "_bidx").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("_ov").alias("uptime_us"),
    )
    frac = F.col("uptime_us").cast("double") / F.lit(float(step))
    if round_to is not None:
        frac = F.round(frac, round_to)
    return out.select(
        *series_cols,
        F.timestamp_micros(F.col("_bidx") * F.lit(step)).alias("bucket_start"),
        "n_islands",
        "uptime_us",
        frac.alias("uptime_frac"),
    )


def seasonal_profile(
    df: DataFrame,
    series_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    round_to: int | None = 6,
) -> DataFrame:
    """Day-of-week x hour-of-day seasonal baseline per series (the
    Datadog "seasonal/agile baseline" / Prometheus recording-rule
    pattern: compare now against the same weekly slot, not the trailing
    window — :func:`anomaly_zscore` covers the trailing kind).

    Output per (series, ``dow`` 1=Sun..7=Sat, ``hour`` 0..23): ``n``,
    population ``mean``/``std`` derived from sum / sum-of-squares in
    the same pinned op order as :func:`anomaly_zscore` (integral value
    columns make the sums order-free and the floats engine-exact).

    ONE hash aggregate; the result is tiny (series x 168 slots) and is
    meant to be broadcast back against live data
    (:func:`seasonal_deviation`).
    """
    ts = F.col(ts_col)
    v = F.col(value_col)
    d = df.where(
        ts.isNotNull() & v.isNotNull() & ~F.isnan(v.cast("double"))
    ).select(
        *series_cols,
        F.dayofweek(ts).alias("dow"),
        F.hour(ts).alias("hour"),
        v.alias("_v"),
    )
    agg = d.groupBy(*series_cols, "dow", "hour").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_v").alias("_s"),
        F.sum(F.col("_v") * F.col("_v")).alias("_sq"),
    )
    nd = F.col("n").cast("double")
    s = F.col("_s").cast("double")
    sq = F.col("_sq").cast("double")
    mean = s / nd
    std = F.sqrt(sq / nd - mean * mean)

    def _r(c):
        return F.round(c, round_to) if round_to is not None else c

    return agg.select(
        *series_cols, "dow", "hour", "n", _r(mean).alias("mean"), _r(std).alias("std")
    )


def seasonal_deviation(
    df: DataFrame,
    profile: DataFrame,
    series_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    threshold: float = 3.0,
    min_baseline: int = 10,
    round_to: int | None = 6,
) -> DataFrame:
    """Score every row against its weekly seasonal slot: join
    ``profile`` (the UNROUNDED-enough output of
    :func:`seasonal_profile`; pass ``round_to=None`` there for strict
    reproducibility) on (series, dow, hour) and append ``base_n`` /
    ``base_mean`` / ``z`` / ``is_anomaly`` (NULL z when the slot has
    < ``min_baseline`` rows or zero variance — same gating as
    :func:`anomaly_zscore`).

    Scale shape: the profile is series x 168 rows — broadcast by
    construction (``F.broadcast``), so the raw stream is scored with
    ZERO shuffle: scan -> broadcast hash join -> projection.
    """
    ts = F.col(ts_col)
    v = F.col(value_col)
    prof = F.broadcast(
        profile.select(
            *[F.col(c).alias(f"_p_{c}") for c in series_cols],
            F.col("dow").alias("_p_dow"),
            F.col("hour").alias("_p_hour"),
            F.col("n").alias("base_n"),
            F.col("mean").alias("base_mean"),
            F.col("std").alias("_p_std"),
        )
    )
    cond = (
        (F.dayofweek(ts) == F.col("_p_dow"))
        & (F.hour(ts) == F.col("_p_hour"))
    )
    for c in series_cols:
        cond = cond & (F.col(c) == F.col(f"_p_{c}"))
    z = (v.cast("double") - F.col("base_mean")) / F.col("_p_std")

    def _r(c):
        return F.round(c, round_to) if round_to is not None else c

    # NaN value ≡ NULL: without the guard Spark's NaN-is-greatest
    # comparison would FLAG every NaN row (abs(NaN) > t is true)
    ok = (
        (F.col("base_n") >= min_baseline)
        & (F.col("_p_std") > 0)
        & v.isNotNull()
        & ~F.isnan(v.cast("double"))
    )
    return (
        df.join(prof, cond, "left")
        .withColumn("z", F.when(ok, _r(z)))
        .withColumn(
            "is_anomaly",
            F.when(ok, F.abs(z) > F.lit(float(threshold))).otherwise(F.lit(False)),
        )
        .drop(*[f"_p_{c}" for c in series_cols], "_p_dow", "_p_hour", "_p_std")
    )


def period_over_period(
    df: DataFrame,
    series_cols: Sequence[str],
    bucket_col: str,
    value_col: str,
    period_s: int,
    round_to: int | None = 6,
) -> DataFrame:
    """Period-over-period comparison on bucket-grain rows (the WoW/DoD
    dashboard column): append ``prev_value`` (the same series' value
    exactly ``period_s`` earlier), ``delta`` and ``pct_change``.

    Implemented as an exact-offset RANGE window over epoch-µs — frame
    ``[-period, -period]`` picks precisely the row one period back (or
    NULL if that bucket is missing/gap-filled-empty), never "the
    previous row". One (series)-keyed window over ALREADY-AGGREGATED
    rows, JVM-only. ``pct_change`` is NULL when the baseline is 0 or
    missing; the division is one pinned float op.
    """
    if period_s <= 0:
        raise ValueError(f"period_s must be > 0, got {period_s}")
    off = int(period_s) * 1_000_000
    d = df.withColumn("_bus", epoch_us(F.col(bucket_col)))
    w = (
        Window.partitionBy(*[F.col(c) for c in series_cols])
        .orderBy("_bus")
        .rangeBetween(-off, -off)
    )
    v = F.col(value_col).cast("double")
    prev = F.max(F.col(value_col)).over(w).cast("double")  # frame holds <= 1 row
    delta = v - prev
    pct = F.when(prev != 0, delta / prev)

    def _r(c):
        return F.round(c, round_to) if round_to is not None else c

    return (
        d.withColumn("prev_value", _r(prev))
        .withColumn("delta", _r(delta))
        .withColumn("pct_change", _r(pct))
        .drop("_bus")
    )


def threshold_alerts(
    df: DataFrame,
    series_cols: Sequence[str],
    hi: float,
    lo: float,
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Hysteresis threshold alerting (the Grafana/Nagios two-threshold
    rule): the alert turns ON when the value reaches ``hi`` and stays
    on until it falls to ``lo`` (crossings in between don't flap).

    Despite looking like a per-row recursion, hysteresis is
    window-expressible exactly: each row's state is the LAST edge seen
    — ``1`` where ``v >= hi``, ``0`` where ``v <= lo``, NULL between —
    via ``last_value(edge) IGNORE NULLS`` over the preceding frame
    (initial state 0). ``episode`` numbers the alert spells per series
    (running count of rising edges), 0 before the first alert. One
    (series)-keyed window, JVM-only; NaN values are edge-less (treated
    like in-band rows).

    Output: input columns + ``alert_state`` (0/1), ``episode``.
    """
    if not hi > lo:
        raise ValueError(f"need hi > lo, got hi={hi}, lo={lo}")
    vc = F.col(value_col).cast("double")
    v = F.when(~F.isnan(vc), vc)  # NaN ≡ NULL: no edge
    edge = F.when(v >= F.lit(float(hi)), F.lit(1)).when(
        v <= F.lit(float(lo)), F.lit(0)
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in series_cols])
        .orderBy(ts_col, *order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = df.withColumn("_edge", edge)
    state = F.coalesce(F.last("_edge", ignorenulls=True).over(w), F.lit(0))
    rising = F.when(
        (F.col("_edge") == 1)
        & (
            F.coalesce(
                F.last("_edge", ignorenulls=True).over(
                    Window.partitionBy(*[F.col(c) for c in series_cols])
                    .orderBy(ts_col, *order_cols)
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            == 0
        ),
        1,
    ).otherwise(0)
    return (
        d.withColumn("alert_state", state)
        .withColumn("episode", F.sum(rising).over(w))
        .drop("_edge")
    )


def cusum_changepoints(
    df: DataFrame,
    series_cols: Sequence[str],
    order_col: str = "bucket_start",
    value_col: str = "v",
    k: float = 0.5,
    h: float = 5.0,
) -> DataFrame:
    """Two-sided CUSUM changepoint detection (Page 1954) over
    ALREADY-AGGREGATED bucket rows — "did this series' level shift?".

    Per series, with baseline moments from the series' own rows::

        z_t  = (x_t - mean) / std          (population std; z=0 if std=0)
        S+_t = max(0, S+_{t-1} + z_t - k)
        S-_t = max(0, S-_{t-1} - z_t - k)
        alarm when S+ > h or S- > h; both sides reset to 0 after an
        alarm (restart detection); ``episode`` counts alarms so far.

    The recursion is a running max-reset — NOT prefix-decomposable, so
    no window expression exists for it (unlike
    :func:`threshold_alerts`' last-non-null-edge trick). It therefore
    runs as grouped ``applyInPandas`` — the same pre-reduction contract
    as LTTB: the input is the rollup's OUTPUT (buckets), never raw
    rows, so per-series state is O(buckets) and the heavy lift already
    happened in one hash aggregate upstream.

    Cross-engine exactness: ``value_col`` must be integral (quantize
    upstream, as the trend/anomaly operators require) so the baseline
    mean/std come from order-free BIGINT sums; every float op then
    happens in one pinned order per row, and the alarm FLAGS — not
    just printed values — reproduce bit-for-bit on any engine walking
    the same recursion (the DuckDB oracle is a recursive CTE).
    """
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    keys = list(series_cols)
    slim = df.where(
        F.col(value_col).isNotNull() & F.col(order_col).isNotNull()
    ).select(*keys, order_col, F.col(value_col).cast("long").alias("_x"))
    schema = StructType(
        [slim.schema[c] for c in (*keys, order_col)]
        + [
            StructField("x", slim.schema["_x"].dataType, True),
            StructField("s_pos", DoubleType(), True),
            StructField("s_neg", DoubleType(), True),
            StructField("alarm", BooleanType(), True),
            StructField("episode", IntegerType(), True),
        ]
    )

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        x = pdf["_x"].to_numpy(dtype="int64")
        n = float(len(x))
        sy = float(int(x.sum()))
        syy = float(int((x * x).sum()))
        mean = sy / n
        var = max(syy / n - mean * mean, 0.0)
        sd = math.sqrt(var)  # IEEE sqrt, not pow(x, 0.5) — oracle parity
        sp = sn = 0.0
        ep = 0
        out_sp = np.empty(len(x)); out_sn = np.empty(len(x))
        out_al = np.empty(len(x), dtype=bool); out_ep = np.empty(len(x), dtype="int32")
        for i, xi in enumerate(x):
            z = 0.0 if sd == 0.0 else (float(xi) - mean) / sd
            sp = max(0.0, sp + z - k)
            sn = max(0.0, sn - z - k)
            al = sp > h or sn > h
            out_sp[i] = sp; out_sn[i] = sn; out_al[i] = al
            if al:
                ep += 1
                sp = sn = 0.0
            out_ep[i] = ep
        res = pdf[[*keys, order_col]].copy()
        res["x"] = pdf["_x"]
        res["s_pos"] = out_sp
        res["s_neg"] = out_sn
        res["alarm"] = out_al
        res["episode"] = out_ep
        return res

    return slim.groupBy(*keys).applyInPandas(_one, schema=schema)


def holt_smooth(
    df: DataFrame,
    series_cols: Sequence[str],
    order_col: str = "bucket_start",
    value_col: str = "v",
    alpha: float = 0.3,
    beta: float = 0.1,
) -> DataFrame:
    """Holt double-exponential smoothing (level + linear trend; the
    non-seasonal core of Influx's ``holt_winters()``) over
    ALREADY-AGGREGATED bucket rows::

        l_1 = x_1                b_1 = x_2 - x_1   (0 if the series has 1 row)
        l_t = a*x_t + (1-a)*(l_{t-1} + b_{t-1})
        b_t = g*(l_t - l_{t-1}) + (1-g)*b_{t-1}
        fitted_t = l_{t-1} + b_{t-1}   (one-step-ahead; NULL at t=1)

    Like :func:`cusum_changepoints`, the recursion is not
    prefix-decomposable → grouped ``applyInPandas`` over the (small)
    bucket rows. ``value_col`` must be integral; ``1-a`` / ``1-g`` are
    computed ONCE here and must be embedded verbatim in any oracle
    (repr round-trip), the EWMA literal-weights discipline — with that,
    level/trend/fitted reproduce bit-for-bit cross-engine.
    """
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    one_m_a = 1.0 - alpha
    one_m_b = 1.0 - beta
    keys = list(series_cols)
    slim = df.where(
        F.col(value_col).isNotNull() & F.col(order_col).isNotNull()
    ).select(*keys, order_col, F.col(value_col).cast("long").alias("_x"))
    schema = StructType(
        [slim.schema[c] for c in (*keys, order_col)]
        + [
            StructField("x", slim.schema["_x"].dataType, True),
            StructField("level", DoubleType(), True),
            StructField("trend", DoubleType(), True),
            StructField("fitted", DoubleType(), True),
        ]
    )

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        x = pdf["_x"].to_list()
        n = len(x)
        levels, trends, fits = [], [], []
        l_prev = float(x[0])
        b_prev = float(x[1] - x[0]) if n > 1 else 0.0
        levels.append(l_prev); trends.append(b_prev); fits.append(None)
        for t in range(1, n):
            fit = l_prev + b_prev
            lvl = alpha * float(x[t]) + one_m_a * (l_prev + b_prev)
            b = beta * (lvl - l_prev) + one_m_b * b_prev
            levels.append(lvl); trends.append(b); fits.append(fit)
            l_prev, b_prev = lvl, b
        res = pdf[[*keys, order_col]].copy()
        res["x"] = pdf["_x"]
        res["level"] = levels
        res["trend"] = trends
        res["fitted"] = fits
        return res

    return slim.groupBy(*keys).applyInPandas(_one, schema=schema)


def sliding_time_quantile(
    df: DataFrame,
    window_s: int,
    q: float,
    series_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    out_col: str = "w_quantile",
    round_to: int | None = 6,
) -> DataFrame:
    """Append a trailing time-window EXACT quantile to every row — the
    rolling-median monitor (Grafana "moving median", pandas
    ``rolling(...).median()`` with a time offset). The robust sibling
    of :func:`sliding_time_stats`' rolling mean: one spike moves the
    mean but not the median.

    Frame = SQL ``RANGE BETWEEN window_s PRECEDING AND CURRENT ROW``
    over epoch-µs, so unevenly-sampled series window correctly and ts
    ties are peers (each tied row sees all its peers — the result is
    order-deterministic under ties, the :func:`sliding_time_stats`
    guarantee). The quantile is Spark's exact ``percentile`` (linear
    interpolation ≡ HF-7, SURVEY §2.4 A4) evaluated per frame; NULL /
    NaN values are excluded from the frame's population (NaN would
    otherwise sort greatest and poison high quantiles).

    Scale: per-frame exact quantiles buffer the frame's values — cost
    is O(rows x window occupancy) per series, the inherent price of an
    exact rolling median (the streaming-sketch alternative is not
    exact). Use on rolled-up bucket rows (the LTTB/CUSUM pre-reduction
    contract) or bounded windows at raw grain; series are independent
    tasks, so the shuffle is the usual single (series)-keyed exchange.

    At q=0.5 over integer-quantized values the interpolation midpoint
    ``(a+b)/2`` is exact in doubles — the driver oracle relies on that.
    """
    if window_s <= 0:
        raise ValueError(f"window_s must be > 0, got {window_s}")
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    tus = epoch_us(F.col(ts_col))
    v = F.col(value_col)
    d = df.withColumn("_tus", tus).withColumn(
        "_v", F.when(v.isNotNull() & ~F.isnan(v.cast("double")), v)
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in series_cols])
        .orderBy("_tus")
        .rangeBetween(-int(window_s) * 1_000_000, 0)
    )
    out = F.percentile(F.col("_v"), F.lit(float(q))).over(w)
    if round_to is not None:
        out = F.round(out, round_to)
    return d.withColumn(out_col, out).drop("_tus", "_v")


def gap_report(
    df: DataFrame,
    min_gap_s: float,
    series_cols: Sequence[str],
    ts_col: str = "ts",
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Missing-data detection: every inter-sample gap of at least
    ``min_gap_s`` seconds per series (the inverse of
    :func:`interval_coverage` — outages as ROWS rather than per-bucket
    uptime, the "show me the holes" ops query; Influx ``monitor.deadman``
    / TimescaleDB ``heartbeat_agg -> dead_ranges`` analog).

    One (series)-keyed lag window, a filter, integer-µs exact:
    ``gap_us = ts - lag(ts)``; a series' first sample opens no gap
    (no baseline — the deadman convention; lead/trail edges belong to
    :func:`interval_coverage`, which has the explicit horizon). Ts ties
    are zero gaps and can never be reported, so the result is
    order-deterministic without a tie-break id.

    Output: series, ``gap_start`` (last sample before the hole),
    ``gap_end`` (first sample after), ``gap_us`` (BIGINT), ``gap_s``
    (pinned single division, exact — µs/1e6 is one double op).
    """
    if min_gap_s <= 0:
        raise ValueError(f"min_gap_s must be > 0, got {min_gap_s}")
    min_us = int(round(float(min_gap_s) * 1_000_000))
    t = epoch_us(F.col(ts_col))
    d = df.where(F.col(ts_col).isNotNull()).select(
        *series_cols, t.alias("_t"), *[F.col(c) for c in order_cols]
    )
    w = Window.partitionBy(*[F.col(c) for c in series_cols]).orderBy(
        "_t", *order_cols
    )
    d = d.withColumn("_prev", F.lag("_t").over(w))
    gap = F.col("_t") - F.col("_prev")
    return (
        d.where(F.col("_prev").isNotNull() & (gap >= F.lit(min_us)))
        .select(
            *series_cols,
            F.timestamp_micros(F.col("_prev")).alias("gap_start"),
            F.timestamp_micros(F.col("_t")).alias("gap_end"),
            gap.alias("gap_us"),
            (gap.cast("double") / F.lit(1_000_000.0)).alias("gap_s"),
        )
    )


def holt_winters_smooth(
    df: DataFrame,
    series_cols: Sequence[str],
    season_len: int,
    order_col: str = "bucket_start",
    value_col: str = "v",
    alpha: float = 0.3,
    beta: float = 0.05,
    gamma: float = 0.2,
) -> DataFrame:
    """Holt-Winters ADDITIVE seasonal smoothing (level + trend +
    season; the full Influx ``holt_winters()`` / statsmodels
    ``ExponentialSmoothing(trend='add', seasonal='add')`` recursion)
    over ALREADY-AGGREGATED bucket rows — the seasonal completion of
    :func:`ewma_smooth` (no memory) and :func:`holt_smooth` (level +
    trend). ``season_len`` m is the season period in BUCKETS (7 for
    daily rows with weekly seasonality; 24 for hourly rows with daily
    seasonality).

    Textbook init (Hyndman & Athanasopoulos convention, simple
    averages — deterministic, no optimizer)::

        l_m = mean(x_1..x_m)
        b_m = (mean(x_{m+1}..x_{2m}) - mean(x_1..x_m)) / m   (0 if n < 2m)
        s_i = x_i - l_m                     for i = 1..m
        for t > m:
          fitted_t = l_{t-1} + b_{t-1} + s_{t-m}   (one-step-ahead)
          l_t = a*(x_t - s_{t-m}) + (1-a)*(l_{t-1} + b_{t-1})
          b_t = B*(l_t - l_{t-1}) + (1-B)*b_{t-1}
          s_t = g*(x_t - (l_{t-1} + b_{t-1})) + (1-g)*s_{t-m}

    Output per input row: ``x``; ``level``/``trend`` (NULL on warm-up
    rows 1..m-1, the INITIAL l_m/b_m on row m, recursion values after);
    ``fitted`` (NULL through row m — the first one-step-ahead forecast
    needs a full season behind it); ``seasonal`` (the initial index
    ``x_i - l_m`` on rows 1..m, the updated ``s_t`` after). Series
    shorter than m rows get all-NULL smoothing columns (not enough
    data for one season); m <= n < 2m series start with zero trend,
    the :func:`holt_smooth` single-row convention.

    Like CUSUM/Holt the recursion is not prefix-decomposable →
    grouped ``applyInPandas`` over bucket rows (LTTB's pre-reduction
    contract: run it on the small rollup, never raw turns).
    ``value_col`` must be integral; ``1-a``/``1-B``/``1-g`` are
    computed ONCE here, every composite expression is parenthesized
    exactly as written above, and any oracle must embed the identical
    literals and op order (the EWMA literal discipline) — with that,
    level/trend/seasonal/fitted reproduce bit-for-bit cross-engine
    (a DuckDB RECURSIVE CTE carrying the m seasonal indices as a LIST
    walks it identically — see the driver's ``holt_winters_weekly``).
    """
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    if season_len < 2:
        raise ValueError(f"season_len must be >= 2, got {season_len}")
    for nm, p in (("alpha", alpha), ("beta", beta), ("gamma", gamma)):
        if not 0.0 < p < 1.0:
            raise ValueError(f"{nm} must be in (0, 1), got {p}")
    m = int(season_len)
    one_m_a = 1.0 - alpha
    one_m_b = 1.0 - beta
    one_m_g = 1.0 - gamma
    keys = list(series_cols)
    slim = df.where(
        F.col(value_col).isNotNull() & F.col(order_col).isNotNull()
    ).select(*keys, order_col, F.col(value_col).cast("long").alias("_x"))
    schema = StructType(
        [slim.schema[c] for c in (*keys, order_col)]
        + [
            StructField("x", slim.schema["_x"].dataType, True),
            StructField("level", DoubleType(), True),
            StructField("trend", DoubleType(), True),
            StructField("seasonal", DoubleType(), True),
            StructField("fitted", DoubleType(), True),
        ]
    )

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        x = pdf["_x"].to_list()
        n = len(x)
        res = pdf[[*keys, order_col]].copy()
        res["x"] = pdf["_x"]
        if n < m:
            res["level"] = None
            res["trend"] = None
            res["seasonal"] = None
            res["fitted"] = None
            return res
        # init from the first season (and second, for the trend)
        sum1 = sum(x[:m])  # int-exact
        l_prev = float(sum1) / float(m)
        if n >= 2 * m:
            sum2 = sum(x[m : 2 * m])
            b_prev = (float(sum2) / float(m) - float(sum1) / float(m)) / float(m)
        else:
            b_prev = 0.0
        seas = [float(x[i]) - l_prev for i in range(m)]
        levels: list[float | None] = [None] * m
        trends: list[float | None] = [None] * m
        fits: list[float | None] = [None] * m
        snew: list[float | None] = list(seas)
        levels[m - 1] = l_prev
        trends[m - 1] = b_prev
        for t in range(m, n):
            s_tm = seas[0]
            xt = float(x[t])
            fit = l_prev + b_prev + s_tm
            lvl = alpha * (xt - s_tm) + one_m_a * (l_prev + b_prev)
            b = beta * (lvl - l_prev) + one_m_b * b_prev
            s = gamma * (xt - (l_prev + b_prev)) + one_m_g * s_tm
            levels.append(lvl)
            trends.append(b)
            fits.append(fit)
            snew.append(s)
            seas = seas[1:] + [s]
            l_prev, b_prev = lvl, b
        res["level"] = levels
        res["trend"] = trends
        res["seasonal"] = snew
        res["fitted"] = fits
        return res

    return slim.groupBy(*keys).applyInPandas(_one, schema=schema)


def slo_fraction(
    df: DataFrame,
    tier: str,
    series_cols: Sequence[str],
    threshold: float,
    ts_col: str = "ts",
    value_col: str = "value",
    objective: float | None = None,
    round_to: int | None = 6,
) -> DataFrame:
    """SLI/SLO attainment per bucket: the fraction of samples at or
    under ``threshold`` ("% of requests under 200 ms") — conditional
    counts and ONE pinned division, so the fraction is engine-exact.
    With ``objective`` (e.g. 0.99) the output adds the breach flag and
    the error-budget consumption ``bad_frac / (1 - objective)`` (> 1
    means the bucket burned more than its budget — the
    Google-SRE burn-rate number for that window).

    One hash aggregate on (series, bucket); NULL/NaN samples count
    toward nothing. Same shape as every rollup — composable upward by
    summing n/n_good (they are plain BIGINTs).
    """
    if objective is not None and not 0.0 < objective < 1.0:
        raise ValueError(f"objective must be in (0, 1), got {objective}")
    v = F.col(value_col)
    ok = v.isNotNull() & ~F.isnan(v.cast("double"))
    d = df.where(F.col(ts_col).isNotNull() & ok).select(
        *series_cols,
        bucket_start(F.col(ts_col), tier).alias("bucket_start"),
        v.alias("_v"),
    )
    agg = d.groupBy(*series_cols, "bucket_start").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("_v") <= F.lit(float(threshold)), 1)).alias("n_good"),
    )
    good = F.col("n_good").cast("double") / F.col("n").cast("double")
    bad = F.lit(1.0) - good

    def _r(c):
        return F.round(c, round_to) if round_to is not None else c

    out = agg.withColumn("good_frac", _r(good))
    if objective is not None:
        budget = 1.0 - float(objective)
        out = out.withColumn("breached", good < F.lit(float(objective)))
        out = out.withColumn("burn_rate", _r(bad / F.lit(budget)))
    return out


def trailing_distinct(
    df: DataFrame,
    tier: str,
    window_buckets: int,
    series_cols: Sequence[str],
    key_col: str,
    ts_col: str = "ts",
    approx: bool = False,
    approx_lgk: int = 12,
) -> DataFrame:
    """Trailing-window distinct cardinality per bucket — the "7-day
    active users" metric (a DAU/WAU/MAU generator): for every bucket
    in the series' gap-filled spine, the number of DISTINCT keys seen
    in the last ``window_buckets`` buckets ending at it (inclusive).

    Distinct-over-sliding-windows cannot reuse adjacent windows'
    counts (distinct is not subtractable), so the exact path collapses
    raw rows to DISTINCT (series, bucket, key) triples map-side (the
    only raw-grain shuffle — the heavy lift), replicates each triple
    to the ≤ ``window_buckets`` target buckets it influences (integer
    epoch division, the interval_coverage explode), and counts
    distinct per target. Cost: pairs × window copies of NARROW rows —
    the standard exact formulation; raw payload never replicates.

    ``approx=True`` switches the per-target count to a mergeable
    DataSketches HLL union over the SAME replicated triples
    (fixed ~2^lgk bytes per group instead of a dedup map) — the
    billion-cardinality path, same default-exact policy as the
    percentile family. Exact stays the default.

    Fixed-width tiers only (hourly/daily/``Nmin``). Targets are
    clipped to the series' observed [min, max] bucket range, so the
    output matches the gap-filled spine exactly: a bucket with no
    activity still reports the distinct count carried by its trailing
    window.
    """
    if window_buckets < 1:
        raise ValueError(f"window_buckets must be >= 1, got {window_buckets}")
    step_s = tier_step_seconds(tier) or {"hourly": 3600, "daily": 86400}.get(tier)
    if step_s is None:
        raise ValueError(
            f"trailing_distinct needs a fixed-width tier (hourly/daily/Nmin), got {tier!r}"
        )
    step = int(step_s) * 1_000_000
    t = epoch_us(F.col(ts_col))
    pairs = (
        df.where(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .select(
            *series_cols,
            F.expr(f"unix_micros(cast({ts_col} as timestamp)) div {step}").alias("_b"),
            F.col(key_col).alias("_k"),
        )
        .distinct()
    )
    rng = pairs.groupBy(*series_cols).agg(
        F.min("_b").alias("_lo"), F.max("_b").alias("_hi")
    )
    targets = (
        pairs.join(F.broadcast(rng), list(series_cols))
        .select(
            *series_cols,
            "_k",
            F.explode(
                F.sequence(
                    F.col("_b"),
                    F.least(F.col("_b") + F.lit(window_buckets - 1), F.col("_hi")),
                )
            ).alias("_tb"),
        )
    )
    if approx:
        agg = targets.groupBy(*series_cols, "_tb").agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("_k").cast("string"), F.lit(approx_lgk))
            ).alias("n_distinct")
        )
    else:
        agg = targets.groupBy(*series_cols, "_tb").agg(
            F.count_distinct(F.col("_k")).alias("n_distinct")
        )
    return agg.select(
        *series_cols,
        F.timestamp_micros(F.col("_tb") * F.lit(step)).alias("bucket_start"),
        "n_distinct",
    )


def mad_rollup(
    df: DataFrame,
    tier: str,
    series_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    outlier_k: float = 3.0,
    round_to: int | None = 6,
) -> DataFrame:
    """Robust per-bucket statistics: exact MEDIAN and MAD (median
    absolute deviation from the bucket median) plus a robust outlier
    count — the robust twin of the mean/stddev rollup (one contaminated
    sample moves a mean and explodes a stddev; median/MAD barely
    notice, which is why robust monitoring baselines use them).

    Three aggregates on the same (series, bucket) key, each consuming
    the previous pass's SMALL result through a broadcast join (the raw
    table re-groups, but Catalyst reuses the identical exchange):

    1. exact median (HF-7 ``percentile``),
    2. ``mad = median(|v - med|)``,
    3. ``n_outliers = count(|v - med| > k * 1.4826 * mad)`` —
       1.4826 ≈ the MAD→sigma consistency constant for normal data;
       the literal is Python-computed once here, so any oracle
       inherits it verbatim. A zero-MAD bucket flags nothing (every
       deviation compares against 0 strictly — ties at the median are
       not outliers, and the > keeps the guard).

    Exactness: over integer-quantized values the median is an exact
    half, deviations ``|v - med|`` are exact halves, and their median
    is again exact — median/MAD are engine-exact; the outlier
    comparison multiplies exact doubles by the shared literal,
    deterministic on both engines. NaN ≡ NULL dropped.

    Output per (series, ``bucket_start``): ``n``, ``median``, ``mad``,
    ``n_outliers``.
    """
    if outlier_k <= 0:
        raise ValueError(f"outlier_k must be > 0, got {outlier_k}")
    thresh_lit = float(outlier_k) * 1.4826  # pinned: one python product
    v = F.col(value_col)
    d = df.where(
        F.col(ts_col).isNotNull() & v.isNotNull() & ~F.isnan(v.cast("double"))
    ).select(
        *series_cols,
        bucket_start(F.col(ts_col), tier).alias("bucket_start"),
        v.cast("double").alias("_v"),
    )
    keys = [*series_cols, "bucket_start"]
    med = d.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile(F.col("_v"), F.lit(0.5)).alias("_med"),
    )
    dev = F.abs(F.col("_v") - F.col("_med"))
    mad = (
        d.join(F.broadcast(med), keys)
        .groupBy(*keys)
        .agg(F.percentile(dev, F.lit(0.5)).alias("_mad"))
    )
    stats = med.join(mad, keys)
    out = (
        d.join(F.broadcast(stats), keys)
        .groupBy(*keys)
        .agg(
            F.first("n").alias("n"),
            F.first("_med").alias("_med"),
            F.first("_mad").alias("_mad"),
            F.count(
                F.when(dev > F.lit(thresh_lit) * F.col("_mad"), 1)
            ).alias("n_outliers"),
        )
    )

    def _r(c):
        return F.round(c, round_to) if round_to is not None else c

    return out.select(
        *keys,
        "n",
        _r(F.col("_med")).alias("median"),
        _r(F.col("_mad")).alias("mad"),
        "n_outliers",
    )
