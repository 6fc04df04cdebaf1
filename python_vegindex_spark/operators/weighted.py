"""Exact weighted percentiles: token-weighted latency/quality
quantiles per bucket.

The unweighted rollups answer "what is the p90 turn latency?"; a
training-data owner usually wants "what is the p90 weighted by how
many TOKENS each turn carries?" — heavy turns should move the
percentile. This is the exact type-1 weighted quantile: the smallest
value v whose cumulative weight reaches q of the total weight.

Scale shape (three stages, each shrinking):

1. quantize the measure to BIGINT cents and pre-aggregate weight per
   (group, value) — the shuffle key includes the value, so even a
   degenerate single-group input spreads over the cluster; array
   sizes downstream are DISTINCT-VALUE counts, not row counts.
2. one hash aggregate per group: ``array_sort(collect_list(struct(v,
   wv)))`` + total weight — bounded by the value cardinality (cents
   of a bounded measure), the same boundedness argument as the exact
   HF-quantile rollups (functions/quantile.py).
3. per-quantile selection by a JVM higher-order ``aggregate`` scan
   over the sorted array — no Python, no second shuffle.

Exactness discipline (SURVEY §8): selection is the INTEGER
cross-multiplication ``cum * 100 >= q100 * total_w`` (q restricted to
whole hundredths), so the chosen value never rides a float; the only
float in the output is the final pinned ``v / scale`` division.

Ties need no tie-break: weights are pre-summed per distinct value, so
the cumulative profile is a function of v alone.

Not in the reference (its percentiles are unweighted,
``vegindex.py``'s gcc90 family); part of the training-data operator
set. DuckDB oracle: same distinct-value pre-aggregate + window
cumulative sum (``weighted_percentiles_daily`` in __spark_entry__).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _q100(q: float) -> int:
    q100 = int(round(q * 100))
    if not 0 < q100 <= 100 or abs(q * 100 - q100) > 1e-9:
        raise ValueError(
            f"q must be a whole hundredth in (0, 1], got {q}"
        )
    return q100


def _select_expr(arr: Column, total_w: Column, q100: int) -> Column:
    """Smallest v in the sorted (v, wv) array with cum*100 >= q100*W."""
    zero = F.struct(
        F.lit(0).cast("long").alias("cum"),
        F.lit(None).cast("long").alias("ans"),
    )
    return F.aggregate(
        arr,
        zero,
        lambda acc, x: F.struct(
            (acc["cum"] + x["wv"]).alias("cum"),
            F.coalesce(
                acc["ans"],
                F.when(
                    (acc["cum"] + x["wv"]) * F.lit(100)
                    >= F.lit(q100) * total_w,
                    x["v"],
                ),
            ).alias("ans"),
        ),
        lambda acc: acc["ans"],
    )


def weighted_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    weight_col: str,
    qs: Sequence[float] = (0.5, 0.9),
    scale: int = 100,
) -> DataFrame:
    """Exact type-1 weighted percentiles per group.

    Rows with NULL/NaN value or non-positive/NULL weight are dropped
    (a zero-weight observation cannot move a weighted quantile).
    Output: group cols, ``n`` (surviving rows), ``total_w``, and one
    ``wp{q100}`` column per requested quantile — the unrounded
    ``v / scale`` double (ONE pinned division of exact integers).
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    q100s = [_q100(q) for q in qs]
    if len(set(q100s)) != len(q100s):
        raise ValueError(f"duplicate quantiles in {qs!r}")
    v = F.col(value_col)
    w = F.col(weight_col).cast("long")
    base = df.where(
        v.isNotNull() & ~F.isnan(v.cast("double")) & w.isNotNull() & (w > 0)
    ).select(
        *[F.col(c) for c in group_cols],
        F.floor(v * F.lit(int(scale))).cast("long").alias("_v"),
        w.alias("_w"),
    )
    per_value = base.groupBy(*group_cols, "_v").agg(
        F.sum("_w").cast("long").alias("_wv"),
        F.count(F.lit(1)).cast("long").alias("_n"),
    )
    grouped = per_value.groupBy(*group_cols).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_v").alias("v"), F.col("_wv").alias("wv")))
        ).alias("_arr"),
        F.sum("_wv").cast("long").alias("total_w"),
        F.sum("_n").cast("long").alias("n"),
    )
    sels = [
        (_select_expr(F.col("_arr"), F.col("total_w"), q100) / F.lit(float(scale))).alias(
            f"wp{q100}"
        )
        for q100 in q100s
    ]
    return grouped.select(*group_cols, "n", "total_w", *sels)
