"""Gap-fill value filling: LOCF and linear interpolation.

The bucket spine (functions/buckets.bucket_spine) emits EVERY bucket
with NULL aggregates in the gaps — the reference writes those rows as
sentinel NA (gcctimeseries.py nodata handling). Continuous-aggregate
stores additionally fill them: ``locf()`` (last observation carried
forward) and ``interpolate()`` (linear between the bracketing known
points) are the two standard fillers.

Both are ONE window per series ordered by the bucket/ts column — the
same (series)-keyed shuffle the rollup already performed, and at
rollup grain the partition is buckets-not-rows sized (hourly over a
decade < 100k rows per series), so the sort-window is safe at the
100-TB design point. Pure column expressions, no UDFs.

Cross-engine discipline: the interpolation is spelled as the exact
IEEE sequence ``prev + (next - prev) * (dt / span)`` with integer
microsecond deltas cast to double, and the oracle mirrors it term for
term (see __spark_entry__'s locf_interpolate_fill).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .timeutil import epoch_us


def _order_us(order_col: str, df: DataFrame) -> F.Column:
    """Microsecond position of the order column (date -> midnight)."""
    typ = dict(df.dtypes)[order_col]
    c = F.col(order_col)
    if typ == "date":
        c = F.to_timestamp(c)
    return epoch_us(c)


def fill_series(
    df: DataFrame,
    series_cols: Sequence[str],
    order_col: str,
    value_cols: Sequence[str],
    methods: Sequence[str] = ("locf", "interp"),
) -> DataFrame:
    """Append ``<c>_locf`` / ``<c>_interp`` fills for each value column.

    * ``locf``: the latest non-NULL value at or before the row (leading
      gaps stay NULL — nothing to carry).
    * ``interp``: the row's own value when present; otherwise linear
      between the nearest non-NULL neighbours, weighted by the actual
      time distance (uneven spines interpolate correctly). Leading and
      trailing gaps stay NULL (no extrapolation).

    NaN counts as a value (it was observed); only NULL is a gap —
    gap-filled spine rows are NULL by construction.
    """
    bad = set(methods) - {"locf", "interp"}
    if bad:
        raise ValueError(f"unknown fill methods: {sorted(bad)}")
    keys = [F.col(c) for c in series_cols]
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    t = _order_us(order_col, df)
    out = df
    for c in value_cols:
        v = F.col(c)
        t_of = F.when(v.isNotNull(), t)
        prev_v = F.last(v, ignorenulls=True).over(w_back)
        if "locf" in methods:
            out = out.withColumn(f"{c}_locf", prev_v)
        if "interp" in methods:
            prev_t = F.last(t_of, ignorenulls=True).over(w_back)
            next_v = F.first(v, ignorenulls=True).over(w_fwd)
            next_t = F.first(t_of, ignorenulls=True).over(w_fwd)
            frac = (t - prev_t).cast("double") / (
                (next_t - prev_t).cast("double")
            )
            out = out.withColumn(
                f"{c}_interp",
                F.when(v.isNotNull(), v).otherwise(
                    prev_v + (next_v - prev_v) * frac
                ),
            )
    return out
