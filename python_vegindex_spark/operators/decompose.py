"""Classical seasonal decomposition (additive, robust): value = trend
+ seasonal + residual over a daily series.

The decomposition twin of the smoothing family (`rate.holt_smooth`,
`rate.holt_winters`): where Holt-Winters *forecasts* by recursively
updating level/trend/season state, classical decomposition *explains*
an observed series by splitting every point into three additive parts —
the moving-average trend, a per-season-position index, and what's left.
vegindex's multi-year gcc series are exactly this shape (annual cycle +
slow trend + weather residual); the engine's transcript series have the
weekly cycle instead.

Definitions (pinned for cross-engine bit-exactness):

* ``v`` — the daily mean of the quantized measure, one division of two
  exact BIGINTs (sum, count).
* ``trend`` — the CENTERED POOLED mean over the ±half-season day
  window: BIGINT sums of (sum, count) over a RANGE frame on the day
  integer (order-free integer adds, immune to segment-tree
  accumulation order), then ONE division. Emitted only when all
  ``season`` lattice days are present in the window (gap days leave
  trend NULL rather than a biased partial window). Pooling (sum of
  sums / sum of counts) rather than mean-of-means keeps it exact.
* ``seasonal`` — per season position (``pmod(day_int, season)``,
  anchored at the 1970-01-01 epoch, locale-free; note pre-epoch days
  need ``pmod`` semantics — a C-style ``%`` oracle only matches for
  timestamps >= 1970), the exact MEDIAN of the
  quantized detrended values ``floor((v - trend) * qscale)`` — floor
  products are deterministic and BIGINT medians are exact halves.
  Robust by construction (median, not mean), so no recentering pass
  is applied; the indexes inherit the trend's centering. Positions
  seen fewer than ``min_cycles`` times emit NULL.
* ``residual`` — ``detrended_q / qscale - seasonal`` (one division,
  one subtraction).

Scale: two hash aggregates on (series, day) and (series, position) —
both tiny relative to the raw table — plus one RANGE window per series
over DAY rows (thousands of rows per series, never raw rows). The raw
table is touched once.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_vegindex_spark.functions.timeutil import epoch_us

__all__ = ["seasonal_decompose", "savgol_smooth", "transition_dates"]

_US_PER_DAY = 86_400_000_000


def _daily_mean(
    df: DataFrame,
    series_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    scale: int,
) -> DataFrame:
    """Shared stage 1 of the daily decomposition/smoothing family:
    (series, ``_day`` epoch-day BIGINT, ``n``, ``_s`` BIGINT sum of the
    quantized measure, ``_v`` one-division daily mean). NaN ≡ NULL
    dropped; the pinned-exactness rules live HERE once."""
    ts = F.col(ts_col)
    v = F.col(value_col).cast("double")
    d = df.where(ts.isNotNull() & v.isNotNull() & ~F.isnan(v)).select(
        *series_cols,
        # pure-integer day index: exact for any epoch, no double round-trip
        ((epoch_us(ts) - F.pmod(epoch_us(ts), F.lit(_US_PER_DAY))) / F.lit(_US_PER_DAY))
        .cast("long")
        .alias("_day"),
        F.floor(v * scale).cast("long").alias("_q"),
    )
    daily = d.groupBy(*series_cols, "_day").agg(
        F.count(F.lit(1)).alias("n"), F.sum("_q").alias("_s")
    )
    return daily.withColumn(
        "_v",
        F.col("_s").cast("double") / (F.col("n") * F.lit(int(scale))).cast("double"),
    )


def seasonal_decompose(
    df: DataFrame,
    series_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    season: int = 7,
    scale: int = 100,
    qscale: int = 1_000_000,
    min_cycles: int = 2,
    round_to: int | None = 6,
) -> DataFrame:
    """Daily additive decomposition; see module docstring for the
    pinned definitions. ``season`` must be odd (the centered window is
    ±(season//2) days around each day).

    Output per (series, ``day`` date): ``n`` (raw rows), ``v`` (daily
    mean), ``season_pos``, ``trend``, ``seasonal``, ``residual``
    (trend/seasonal/residual NULL when the window is incomplete or the
    position under-observed).
    """
    if season < 3 or season % 2 == 0:
        raise ValueError(f"season must be odd and >= 3, got {season}")
    if min_cycles < 1:
        raise ValueError(f"min_cycles must be >= 1, got {min_cycles}")
    half = season // 2
    daily = _daily_mean(df, series_cols, ts_col, value_col, scale)
    w = (
        Window.partitionBy(*series_cols)
        .orderBy(F.col("_day"))
        .rangeBetween(-half, half)
    )
    t = daily.select(
        *series_cols,
        "_day",
        "n",
        "_v",
        F.count(F.lit(1)).over(w).alias("_days_in"),
        F.sum("_s").over(w).alias("_ts_sum"),
        F.sum("n").over(w).alias("_tn"),
    )
    # trend: one division over exact integer window sums.
    t = t.select(
        *series_cols,
        "_day",
        "n",
        "_v",
        F.when(
            F.col("_days_in") == season,
            F.col("_ts_sum").cast("double")
            / (F.col("_tn") * F.lit(int(scale))).cast("double"),
        ).alias("_trend"),
        F.pmod(F.col("_day"), F.lit(season)).alias("season_pos"),
    )
    # pin the small day-level frame: it feeds BOTH the seasonal-median
    # aggregate and the final join — without the checkpoint each branch
    # re-runs the whole lineage back to the raw scan (the correlate
    # family's triple-scan lesson, test_plans.py)
    t = t.withColumn(
        "_dq",
        F.floor((F.col("_v") - F.col("_trend")) * F.lit(float(qscale))).cast("long"),
    ).localCheckpoint(eager=True)
    seas = (
        t.where(F.col("_dq").isNotNull())
        .groupBy(*series_cols, "season_pos")
        .agg(
            F.count(F.lit(1)).alias("_cyc"),
            F.percentile(F.col("_dq").cast("double"), F.lit(0.5)).alias("_sm"),
        )
        .where(F.col("_cyc") >= int(min_cycles))
        .select(*series_cols, "season_pos", "_sm")
    )
    out = t.join(F.broadcast(seas), [*series_cols, "season_pos"], "left")
    qs = F.lit(float(qscale))
    seasonal = F.col("_sm") / qs
    residual = (F.col("_dq").cast("double") - F.col("_sm")) / qs
    vv, tr = F.col("_v"), F.col("_trend")
    if round_to is not None:
        vv, tr = F.round(vv, round_to), F.round(tr, round_to)
        seasonal, residual = F.round(seasonal, round_to), F.round(residual, round_to)
    return out.select(
        *series_cols,
        F.to_date(F.timestamp_micros((F.col("_day") * _US_PER_DAY).cast("long"))).alias("day"),
        "n",
        vv.alias("v"),
        "season_pos",
        tr.alias("trend"),
        seasonal.alias("seasonal"),
        residual.alias("residual"),
    )


_SG_COEFFS = {
    # (window, derivative) -> (integer numerators, integer denominator)
    # standard quadratic/cubic least-squares coefficients (Savitzky &
    # Golay 1964, corrected tables) — exactly representable integers
    (5, 0): ((-3, 12, 17, 12, -3), 35),
    (7, 0): ((-2, 3, 6, 7, 6, 3, -2), 21),
    (9, 0): ((-21, 14, 39, 54, 59, 54, 39, 14, -21), 231),
    (5, 1): ((-2, -1, 0, 1, 2), 10),
    (7, 1): ((-3, -2, -1, 0, 1, 2, 3), 28),
    (9, 1): ((-4, -3, -2, -1, 0, 1, 2, 3, 4), 60),
}


def savgol_smooth(
    df: DataFrame,
    series_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    window: int = 5,
    derivative: int = 0,
    scale: int = 100,
    round_to: int | None = None,
) -> DataFrame:
    """Savitzky-Golay smoothing (or first derivative) of each series'
    DAILY mean — THE standard smoother of the reference's own domain
    (phenology pipelines run exactly this quadratic least-squares
    filter over gcc/NDVI daily series before extracting transition
    dates; the engine runs it over transcript dailies the same way).

    A centered window of ``window`` consecutive LATTICE days is
    convolved with the classic integer coefficient rows (e.g.
    ``(-3, 12, 17, 12, -3)/35`` for window 5): the fit of a quadratic
    at the center point, so peaks are preserved where a moving average
    flattens them. ``derivative=1`` returns the fitted slope per DAY.

    Exactness: daily means are one-division doubles from BIGINT sums;
    the convolution is evaluated in PINNED left-associative order with
    integer literal coefficients and ONE final division by the integer
    denominator — every op identical on both engines, so results are
    bit-identical (report unrounded by default; the 6-dp round is a
    tie hazard for dyadic-rational inputs).

    Gaps: lag/lead are row-based, so each output row additionally
    checks that its neighbors sit at EXACTLY the right day offsets —
    a window crossing a gap (or the series edge) emits NULL rather
    than silently convolving misaligned days.

    Scale: one raw-scan hash aggregate to daily rows, then one window
    (single shuffle on series) over day rows.

    Output per (series, ``day``): ``n`` (raw rows), ``v`` (daily
    mean), ``sg``.
    """
    key = (int(window), int(derivative))
    if key not in _SG_COEFFS:
        raise ValueError(
            f"unsupported (window, derivative) {key}; supported: "
            f"{sorted(_SG_COEFFS)}"
        )
    coeffs, denom = _SG_COEFFS[key]
    half = window // 2
    daily = _daily_mean(df, series_cols, ts_col, value_col, scale)
    w = Window.partitionBy(*series_cols).orderBy(F.col("_day"))
    # neighbor columns at offsets -half..half (0 = self), plus their day
    # indexes for the lattice-contiguity check
    terms = []
    aligned = F.lit(True)
    for k, c in zip(range(-half, half + 1), coeffs):
        if k == 0:
            nv = F.col("_v")
        elif k < 0:
            nv = F.lag("_v", -k).over(w)
            aligned = aligned & (F.lag("_day", -k).over(w) == F.col("_day") + k)
        else:
            nv = F.lead("_v", k).over(w)
            aligned = aligned & (F.lead("_day", k).over(w) == F.col("_day") + k)
        if c != 0:
            terms.append(nv * F.lit(int(c)))
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t  # pinned left-assoc order
    sg = F.when(aligned, acc / F.lit(float(denom)))
    if round_to is not None:
        sg = F.round(sg, round_to)
    vv = F.round(F.col("_v"), round_to) if round_to is not None else F.col("_v")
    return daily.select(
        *series_cols,
        F.to_date(F.timestamp_micros((F.col("_day") * _US_PER_DAY).cast("long"))).alias("day"),
        "n",
        vv.alias("v"),
        sg.alias("sg"),
    )


def transition_dates(
    df: DataFrame,
    series_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    frac: float = 0.5,
    window: int = 5,
    scale: int = 100,
    round_to: int | None = None,
) -> DataFrame:
    """Threshold-crossing transition dates per (series, year) — the
    downstream step Savitzky-Golay smoothing exists FOR in the
    reference's domain: phenology pipelines smooth the gcc/NDVI daily
    series, then report the greenup date as the first day the smoothed
    curve reaches ``frac`` of its seasonal amplitude (and the season
    end as the last such day). The engine runs the same extraction
    over transcript dailies ("when did this metric's season start?").

    Per (series, year) over the non-NULL smoothed days: ``thr = lo +
    frac * (hi - lo)`` (one pinned expression over the exact smoothed
    doubles), ``sos_day`` = first day with ``sg >= thr``, ``eos_day``
    = last such day. Comparisons over bit-identical doubles are
    engine-exact, so the reported DATES are exact, not approximate.

    Scale: the smoothed frame is pinned once (localCheckpoint) and
    feeds both the per-year amplitude aggregate (tiny) and the
    crossing filter — day-level rows throughout, one raw scan.

    Output per (series, ``year``): ``n_days``, ``lo``, ``hi``,
    ``thr``, ``sos_day``, ``eos_day``.
    """
    if not (0.0 <= frac <= 1.0):
        raise ValueError(f"frac must be in [0, 1], got {frac}")
    sm = (
        savgol_smooth(
            df, series_cols, ts_col=ts_col, value_col=value_col,
            window=window, scale=scale, round_to=None,
        )
        .where(F.col("sg").isNotNull())
        .localCheckpoint(eager=True)
    )
    keys = [*series_cols, "year"]
    sm = sm.withColumn("year", F.year("day"))
    amp = sm.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.min("sg").alias("lo"),
        F.max("sg").alias("hi"),
    )
    thr = F.col("lo") + F.lit(float(frac)) * (F.col("hi") - F.col("lo"))
    amp = amp.withColumn("thr", thr)
    crossed = (
        sm.join(F.broadcast(amp), keys)
        .where(F.col("sg") >= F.col("thr"))
        .groupBy(*keys)
        .agg(F.min("day").alias("sos_day"), F.max("day").alias("eos_day"))
    )
    out = amp.join(crossed, keys, "left")
    cols = [F.col("lo"), F.col("hi"), F.col("thr")]
    if round_to is not None:
        cols = [F.round(c, round_to) for c in cols]
    return out.select(
        *keys,
        "n_days",
        cols[0].alias("lo"),
        cols[1].alias("hi"),
        cols[2].alias("thr"),
        "sos_day",
        "eos_day",
    )
