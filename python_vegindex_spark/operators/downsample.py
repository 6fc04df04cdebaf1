"""Visual downsampling: M4 pixel-exact and LTTB perceptual.

The reference pipeline downsamples by *aggregation* (nday summaries,
generate_summary_timeseries.py); plotting-grade engines additionally
ship *shape-preserving* downsamples that pick REAL data points. Two
published algorithms, both standard in time-series stores:

* :func:`m4_downsample` — M4 (Jugel et al., VLDB 2014): per pixel
  column keep the first/last/min/max points. Error-free for line
  rendering at the target width. Pure DataFrame ops: ONE hash
  aggregate after an integer bucket assignment — one shuffle on
  (series, pixel), uniform by construction, JVM-only (min/max over
  structs give the deterministic earliest-ts tie-breaks).
* :func:`lttb_downsample` — Largest-Triangle-Three-Buckets
  (Steinarsson 2013): sequential per series (each bucket's pick
  depends on the previous pick), so it runs as one Arrow-batched
  ``applyInPandas`` per series — the per-series state is inherent to
  the algorithm, not an implementation shortcut. Series are spread
  across executors; within a series the numpy kernel is vectorized
  per bucket.

Scale shape: M4 is the 100-TB path (shuffle reduces the stream to
4 points x width x series). LTTB is for series that fit one task
after M4/rollup pre-reduction — the documented two-stage practice
(M4 to ~10k points, LTTB to chart width).

The distribution members of the family: :func:`value_heatmap` (counts
per time-bucket x value-bin) and :func:`histogram_quantile` (PromQL-
style quantile estimation over those binned counts — the fixed-memory
quantile sketch, error bounded by the bin width).

Cross-engine notes for the M4 oracle: the pixel index is INTEGER
arithmetic end-to-end (epoch microseconds, ``div``) — float bucket
math would disagree in the last ulp at 1e17 magnitudes. NaN values
are dropped like NULL (engine-wide rule, functions/quantile).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.quantile import nan_to_null
from ..functions.timeutil import epoch_us


def m4_downsample(
    df: DataFrame,
    width: int,
    series_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    round_to: int | None = 6,
) -> DataFrame:
    """M4: per (series, pixel) the first/last/lowest/highest points.

    The time axis [min ts, max ts] over the WHOLE frame (all series
    share the chart's x-range, per the paper's rendering model) is cut
    into ``width`` equal pixels; rows land in pixel
    ``(t - t0) * width div span`` (integer div, last edge clamped).
    Emits one row per non-empty (series, pixel):

    ``px, t_first, v_first, t_last, v_last, t_min, v_min, t_max, v_max``

    Ties: first/last break on value (min/max among ts ties); the
    min/max points take the EARLIEST ts among equal values — all four
    are lexicographic struct extremes, so one hash aggregate computes
    them with no window. NULL/NaN values are dropped first.
    """
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    v = nan_to_null(F.col(value_col))
    base = (
        df.where(v.isNotNull() & F.col(ts_col).isNotNull())
        .select(*series_cols, epoch_us(F.col(ts_col)).alias("_tus"), v.alias("_v"))
    )
    bounds = base.agg(
        F.min("_tus").alias("_t0"), F.max("_tus").alias("_t1")
    )
    # one-row bound: broadcast cross join, never a shuffle of `base`
    px = F.when(
        F.col("_t1") > F.col("_t0"),
        F.least(
            F.expr(f"((_tus - _t0) * {int(width)}) div (_t1 - _t0)"),
            F.lit(int(width) - 1),
        ),
    ).otherwise(F.lit(0))
    bucketed = base.crossJoin(F.broadcast(bounds)).select(
        *series_cols, F.col("_tus"), F.col("_v"), px.cast("long").alias("px")
    )

    def _r(c):
        return F.round(c, round_to) if round_to is not None else c

    first = F.min(F.struct(F.col("_tus").alias("t"), F.col("_v").alias("v")))
    last = F.max(F.struct(F.col("_tus").alias("t"), F.col("_v").alias("v")))
    # earliest ts among the min / max values: order by (+-value, ts)
    lo = F.min(F.struct(F.col("_v").alias("v"), F.col("_tus").alias("t")))
    hi = F.min(F.struct((-F.col("_v")).alias("nv"), F.col("_tus").alias("t")))
    agg = bucketed.groupBy(*series_cols, "px").agg(
        first.alias("_f"), last.alias("_l"), lo.alias("_lo"), hi.alias("_hi")
    )
    return agg.select(
        *series_cols,
        "px",
        F.timestamp_micros(F.col("_f.t")).alias("t_first"),
        _r(F.col("_f.v")).alias("v_first"),
        F.timestamp_micros(F.col("_l.t")).alias("t_last"),
        _r(F.col("_l.v")).alias("v_last"),
        F.timestamp_micros(F.col("_lo.t")).alias("t_min"),
        _r(F.col("_lo.v")).alias("v_min"),
        F.timestamp_micros(F.col("_hi.t")).alias("t_max"),
        _r(-F.col("_hi.nv")).alias("v_max"),
    )


def value_heatmap(
    df: DataFrame,
    tier: str,
    bin_width: float,
    series_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Density heatmap: row counts per (series, time bucket, value bin).

    The third member of the viz-downsample family (M4 draws lines, LTTB
    perceptual shapes, heatmaps draw DISTRIBUTIONS — what Grafana/
    Timescale render when a series has too many points per pixel to
    line-plot). ``v_bin`` is ``floor(value / bin_width)`` so the bin
    covers ``[v_bin * bin_width, (v_bin+1) * bin_width)``; NULL/NaN
    values are dropped. One hash aggregate on a uniform key — the same
    scale shape as the rollup.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be > 0, got {bin_width}")
    from ..functions.buckets import bucket_start

    v = nan_to_null(F.col(value_col))
    d = df.where(v.isNotNull() & F.col(ts_col).isNotNull()).select(
        *series_cols,
        bucket_start(F.col(ts_col), tier).alias("bucket_start"),
        F.floor(v / F.lit(float(bin_width))).cast("long").alias("v_bin"),
    )
    return d.groupBy(*series_cols, "bucket_start", "v_bin").agg(
        F.count(F.lit(1)).alias("n")
    )


def value_drift(
    df: DataFrame,
    split_ts,
    series_cols: Sequence[str],
    bin_width: float,
    ts_col: str = "ts",
    value_col: str = "value",
    round_to: int | None = 6,
) -> DataFrame:
    """Distribution-drift statistic between the rows BEFORE and AFTER
    ``split_ts`` — the ML-monitoring staple ("did this feature's
    distribution move between training week and serving week?").

    The statistic is TOTAL-VARIATION DISTANCE over the shared value
    binning:

        drift = ½ Σ_bins |p_b - q_b|
              = Σ_bins |nb·ta - na·tb| / (2·tb·ta)     ∈ [0, 1]

    chosen over PSI/KL deliberately: no logarithms (whose last ulp
    differs across engines' libm), no empty-bin epsilons, and — unlike
    any per-bin fraction sum — the numerator Σ|nb·ta - na·tb| is an
    EXACT integer (DECIMAL sums of BIGINT cross-products; the per-series
    denominator is constant), so the only floating-point step is one
    pinned final division, reproducible bit-for-bit against the SQL
    oracle. 0 = identical binned distributions, 1 = disjoint supports.

    Scale: one hash aggregate over the raw table (series × side × bin),
    then the per-series finish runs on bins only. Output: one row per
    series with n_before/n_after and drift (NULL when either side is
    empty)."""
    if bin_width <= 0:
        raise ValueError(f"bin_width must be > 0, got {bin_width}")
    v = nan_to_null(F.col(value_col))
    side = (F.col(ts_col) >= F.lit(split_ts).cast("timestamp")).cast("int")
    binned = (
        df.where(v.isNotNull() & F.col(ts_col).isNotNull())
        .select(
            *series_cols,
            side.alias("_after"),
            F.floor(v / F.lit(float(bin_width))).cast("long").alias("v_bin"),
        )
        .groupBy(*series_cols, "v_bin")
        .agg(
            F.sum(F.when(F.col("_after") == 0, 1).otherwise(0)).alias("_nb"),
            F.sum(F.col("_after")).alias("_na"),
        )
    )
    tot = binned.groupBy(*series_cols).agg(
        F.sum("_nb").alias("_tb"), F.sum("_na").alias("_ta")
    )
    j = binned.join(tot, on=list(series_cols))
    dec = "decimal(38,0)"
    cross = F.abs(
        F.col("_nb").cast(dec) * F.col("_ta").cast(dec)
        - F.col("_na").cast(dec) * F.col("_tb").cast(dec)
    )
    agg = j.groupBy(*series_cols).agg(
        F.max("_tb").alias("n_before"),
        F.max("_ta").alias("n_after"),
        F.sum(cross).alias("_num"),  # exact integer sum, order-free
    )
    drift = F.when(
        (F.col("n_before") > 0) & (F.col("n_after") > 0),
        F.col("_num").cast("double")
        / (F.col("n_before").cast("double") * F.col("n_after").cast("double"))
        / F.lit(2.0),
    )
    if round_to is not None:
        drift = F.round(drift, round_to)
    return agg.select(*series_cols, "n_before", "n_after", drift.alias("drift"))


def _lttb_numpy(ts, vs, n_out):
    """LTTB over one series (numpy arrays sorted by ts) -> index array.

    Steinarsson 2013 §4.2: endpoints fixed; interior points fall in
    n_out-2 equal buckets; each bucket keeps the point with the largest
    triangle area against the PREVIOUS selected point and the NEXT
    bucket's centroid. Ties keep the earliest point (argmax picks the
    first maximum).
    """
    import numpy as np

    n = len(ts)
    if n_out >= n:
        return np.arange(n)
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3, got {n_out}")
    # bucket edges over the interior points [1, n-1)
    edges = 1 + np.round(
        np.arange(n_out - 1) * (n - 2) / (n_out - 2)
    ).astype(np.int64)
    t = ts.astype(np.float64)
    sel = np.empty(n_out, dtype=np.int64)
    sel[0] = 0
    sel[-1] = n - 1
    a = 0
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        nlo, nhi = (edges[i + 1], n - 1) if i == n_out - 3 else (
            edges[i + 1], edges[i + 2]
        )
        if i == n_out - 3:
            cx, cy = t[n - 1], vs[n - 1]
        else:
            cx, cy = t[nlo:nhi].mean(), vs[nlo:nhi].mean()
        ax, ay = t[a], vs[a]
        # 2x triangle area for every candidate in the bucket at once
        area = np.abs(
            (ax - cx) * (vs[lo:hi] - ay) - (ax - t[lo:hi]) * (cy - ay)
        )
        a = lo + int(np.argmax(area))
        sel[i + 1] = a
    return sel


def lttb_downsample(
    df: DataFrame,
    n_out: int,
    series_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """LTTB to ``n_out`` points per series; output rows are REAL input
    rows (``ts_col``/``value_col`` only), in ts order per series.

    Grouped ``applyInPandas`` — the algorithm is sequential per series
    (see module docstring); NULL/NaN rows are dropped before selection.
    """
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3, got {n_out}")
    import numpy as np  # noqa: F401  (worker-side dependency, checked here)

    keys = list(series_cols)
    slim = df.where(
        nan_to_null(F.col(value_col)).isNotNull() & F.col(ts_col).isNotNull()
    ).select(*keys, ts_col, value_col)
    schema = slim.schema

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, value_col], kind="mergesort")
        idx = _lttb_numpy(
            pdf[ts_col].astype("int64").to_numpy(),
            pdf[value_col].to_numpy(dtype="float64"),
            n_out,
        )
        return pdf.iloc[idx]

    return slim.groupBy(*keys).applyInPandas(_one, schema=schema)


def histogram_quantile(
    heatmap: DataFrame,
    q: float,
    bin_width: float,
    series_cols: Sequence[str] = (),
    bucket_col: str = "bucket_start",
    bin_col: str = "v_bin",
    count_col: str = "n",
) -> DataFrame:
    """PromQL ``histogram_quantile`` over :func:`value_heatmap` output:
    estimate the q-quantile per (series, time bucket) from binned
    counts, linearly interpolating inside the target bin (the uniform-
    within-bin assumption Prometheus documents)::

        target = q * total_n
        pick the first bin (ascending) with cum_prev < target <= cum
        est    = bin*W + W * (target - cum_prev) / bin_n

    This composes the heatmap into a sketch-backed quantile: at 100 TB
    the raw rows were already reduced to (bucket, bin) integer counts
    by ONE hash aggregate, and this pass adds one window over those
    SMALL aggregated rows — the window's cumulative sum shuffles counts,
    never raw data, on the same (series, bucket) key. Exact percentiles
    stay the rollup default; this is the fixed-memory alternative whose
    error is bounded by ``bin_width``.

    All counts are integers and the interpolation is a pinned float op
    order on a literal ``q``, so results reproduce bit-for-bit across
    engines. Requires ``0 < q <= 1``.

    Output: series, bucket, ``total_n``, ``q`` and ``est``.
    """
    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0, 1], got {q}")
    if bin_width <= 0:
        raise ValueError(f"bin_width must be > 0, got {bin_width}")
    keys = [*series_cols, bucket_col]
    w = Window.partitionBy(*[F.col(c) for c in keys]).orderBy(bin_col)
    wall = (
        Window.partitionBy(*[F.col(c) for c in keys])
        .orderBy(bin_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    n = F.col(count_col).cast("double")
    cum = F.sum(count_col).over(w).cast("double")
    total = F.sum(count_col).over(wall).cast("double")
    d = (
        heatmap.withColumn("_cum", cum)
        .withColumn("total_n", total.cast("long"))
        .withColumn("_target", F.lit(float(q)) * total)
        .withColumn("_prev", F.col("_cum") - n)
    )
    width = F.lit(float(bin_width))
    est = F.col(bin_col).cast("double") * width + width * (
        F.col("_target") - F.col("_prev")
    ) / n
    return (
        d.where((F.col("_prev") < F.col("_target")) & (F.col("_target") <= F.col("_cum")))
        .select(
            *keys,
            "total_n",
            F.lit(float(q)).alias("q"),
            F.round(est, 6).alias("est"),
        )
    )


def stride_downsample(
    df: DataFrame,
    stride: int,
    series_cols: Sequence[str],
    ts_col: str = "ts",
    order_cols: Sequence[str] = (),
    offset: int = 0,
) -> DataFrame:
    """Systematic (every-``stride``-th sample) decimation per series —
    the third member of the visual-reduction family: M4 is pixel-exact,
    LTTB is perceptual, stride is the dumb-but-predictable one (every
    k-th point by time order, deterministic and joinable across runs).

    One (series)-keyed window for the ordinal, one filter:
    ``(row_number - 1) % stride == offset`` — a series' FIRST sample
    survives at offset 0, and the survivor set is a function of the
    data alone (ties broken by ``order_cols``; pass a unique id for
    full determinism). Unlike hash sampling (operators/sampling.py)
    the rate is exact per series, not Bernoulli; unlike M4/LTTB it
    preserves spacing, not features — use it for "plot 1-in-100"
    pre-reduction where uniform time coverage matters.
    """
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    if not 0 <= offset < stride:
        raise ValueError(f"offset must be in [0, stride), got {offset}")
    w = Window.partitionBy(*[F.col(c) for c in series_cols]).orderBy(
        F.col(ts_col), *[F.col(c) for c in order_cols]
    )
    return (
        df.where(F.col(ts_col).isNotNull())
        .withColumn("_ord", F.row_number().over(w) - 1)
        .where(F.col("_ord") % stride == offset)
        .withColumn("sample_idx", (F.col("_ord") / stride).cast("long"))
        .drop("_ord")
    )
