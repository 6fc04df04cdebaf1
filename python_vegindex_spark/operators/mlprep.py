"""Feature-preparation operators for training pipelines: per-group
normalization and quantile discretization.

The tabular-ML companions of the text/dedup/packing family — what a
feature pipeline runs between the rollup and the trainer:

* :func:`normalize_per_group` — z-score or min-max scale a column
  WITHIN each group (per conv, per source, per event_type), the
  standard leakage-safe "fit on the group, apply to the row" scaler.
* :func:`quantile_bins` — equal-frequency discretization: bin edges
  from the engine's exact HF-7 percentiles per group, assignment by
  comparisons only.

Exactness discipline (the SAX/seasonal-profile pattern): group moments
come from order-free sums over an INTEGRAL value column — BIGINT
count/sum/sum-of-squares — finished in the engine's one pinned op
order (``mean = s/n; std = sqrt(sq/n - mean*mean)``), so the scaled
floats are engine-exact. Bin edges are exact percentiles (floats),
but ASSIGNMENT is pure comparison against them, so bin ids are
engine-exact even where edge floats carry rounding.

Scale shape: one hash aggregate collapses the raw table to per-group
stats (tiny — one row per group), broadcast back, scan-level
projection applies the scaling. The raw table shuffles ZERO times for
the apply; only the stats pass aggregates (map-side partials). This is
also the train/serve split point: persist the stats table from the
training set and join it onto serving data — never re-fit on serve.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.quantile import nan_to_null


def group_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    percentiles: Sequence[float] = (),
) -> DataFrame:
    """The fit half: per group — ``n``, ``mean``, ``std`` (population,
    pinned order), ``vmin``/``vmax``, and optional exact percentiles
    (``p_<q*100>``). ``value_col`` must be integral for engine-exact
    mean/std (the module discipline); percentiles are exact HF-7 on
    any numeric. NaN ≡ NULL dropped.
    """
    v = nan_to_null(F.col(value_col))
    agg = df.groupBy(*group_cols).agg(
        F.count(F.when(v.isNotNull(), 1)).alias("n"),
        F.sum(v).alias("_s"),
        F.sum(v * v).alias("_sq"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
        *[
            F.percentile(v, F.lit(float(q))).alias(f"p_{int(round(q * 100))}")
            for q in percentiles
        ],
    )
    nd = F.col("n").cast("double")
    mean = F.col("_s").cast("double") / nd
    std = F.sqrt(F.col("_sq").cast("double") / nd - mean * mean)
    return agg.select(
        *group_cols,
        "n",
        mean.alias("mean"),
        std.alias("std"),
        "vmin",
        "vmax",
        *[f"p_{int(round(q * 100))}" for q in percentiles],
    )


def normalize_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    method: str = "zscore",
    out_col: str | None = None,
    stats: DataFrame | None = None,
    round_to: int | None = 6,
) -> DataFrame:
    """Append the scaled column: ``zscore`` → ``(v - mean) / std``
    (NULL for zero-variance groups), ``minmax`` → ``(v - min) /
    (max - min)`` (NULL for constant groups). Pass a persisted
    ``stats`` table (from :func:`group_stats` on the TRAINING set) to
    apply train-time scaling to new data; omitted, stats are fit on
    ``df`` itself. Broadcast join + projection — the big side never
    shuffles.
    """
    if method not in ("zscore", "minmax"):
        raise ValueError(f"method must be 'zscore' or 'minmax', got {method!r}")
    out_col = out_col or f"{value_col}_{method}"
    st = stats if stats is not None else group_stats(df, group_cols, value_col)
    j = df.join(F.broadcast(st), list(group_cols), "left")
    v = nan_to_null(F.col(value_col)).cast("double")
    if method == "zscore":
        scaled = F.when(F.col("std") > 0, (v - F.col("mean")) / F.col("std"))
    else:
        width = F.col("vmax").cast("double") - F.col("vmin").cast("double")
        scaled = F.when(width > 0, (v - F.col("vmin").cast("double")) / width)
    if round_to is not None:
        scaled = F.round(scaled, round_to)
    drop = [c for c in st.columns if c not in group_cols]
    return j.withColumn(out_col, scaled).drop(*drop)


def quantile_bins(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    n_bins: int = 4,
    out_col: str = "bin",
) -> DataFrame:
    """Equal-frequency discretization per group: bin ``i`` collects
    values in ``(edge_{i-1}, edge_i]`` where the edges are the exact
    HF-7 ``i/n_bins`` percentiles of the group (the pandas ``qcut``
    convention; bin 0 is everything up to the first edge). Assignment
    is a sum of comparisons against the group's edge row — bin ids are
    engine-exact regardless of edge-float rounding. NULL/NaN values
    get a NULL bin. One stats aggregate + broadcast join; the big side
    never shuffles.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    qs = [i / n_bins for i in range(1, n_bins)]
    st = group_stats(df, group_cols, value_col, percentiles=qs)
    j = df.join(F.broadcast(st), list(group_cols), "left")
    v = nan_to_null(F.col(value_col))
    edges = [F.col(f"p_{int(round(q * 100))}") for q in qs]
    bin_id = sum(((v > e).cast("int") for e in edges), F.lit(0))
    drop = [c for c in st.columns if c not in group_cols]
    return j.withColumn(
        out_col, F.when(v.isNotNull(), bin_id.cast("int"))
    ).drop(*drop)
