"""Dynamic Time Warping distance between rolled-up integer series.

The classic elastic-alignment similarity for time series (Sakoe &
Chiba, IEEE TASSP 1978; Berndt & Clifford, KDD 1994): two series that
trace the same shape at different speeds score close even when a
pointwise (Euclidean / Pearson) comparison says they are unrelated.
This is the shape-similarity member of the correlation family
(operators/correlate.py gives the pointwise members).

Exactness: DTW here runs over INTEGER series (quantized rolled-up
points, e.g. daily sums of ``floor(value*100)``), so every DP cell —
``cost(i,j) + min(dp[i-1,j], dp[i,j-1], dp[i-1,j-1])`` with
``cost = |a_i - b_j|`` — is exact BIGINT arithmetic: the distance is
bit-reproducible on any engine that walks the same recurrence, and the
DuckDB oracle does exactly that via a generated anti-diagonal wave-CTE
chain (``__spark_entry__._dtw_oracle_sql``).

Scale shape: the CUSUM/LTTB pre-reduction contract — the quadratic DP
runs over per-bucket ROLLED-UP points (a year of dailies is 365
points), never raw rows; the raw table is touched once by the rollup
aggregate that feeds this. Pair enumeration is a self-join of the
per-series array table (one row per series), broadcast-sized by
construction; the DP itself is the algorithm, so it lives in an
Arrow-batched pandas UDF (the codec exception to the JVM-only rule —
row-at-a-time Python never touches the corpus). The optional
Sakoe-Chiba ``band`` bounds each pair at O(n*band) cells for long
series.

No reference counterpart (vegindex compares series by eye via its
matplotlib plotter); public-knowledge algorithm.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dtw_numpy(a: np.ndarray, b: np.ndarray, band: int | None = None) -> int:
    """Exact integer DTW distance (|.| cost, unit steps). ``band`` is
    the Sakoe-Chiba half-width on |i-j|; it must admit a path
    (band >= |n-m|)."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        raise ValueError("DTW needs two non-empty series")
    if band is not None and band < abs(n - m):
        raise ValueError(
            f"band ({band}) < |n-m| ({abs(n - m)}): no warping path exists"
        )
    BIG = np.iinfo(np.int64).max // 4
    prev = np.full(m + 1, BIG, dtype=np.int64)
    cur = np.empty(m + 1, dtype=np.int64)
    prev[0] = 0
    for i in range(1, n + 1):
        cur[:] = BIG
        lo = 1 if band is None else max(1, i - band)
        hi = m if band is None else min(m, i + band)
        costs = np.abs(a[i - 1] - b[lo - 1 : hi])
        for j in range(lo, hi + 1):
            best = min(prev[j], cur[j - 1], prev[j - 1])
            cur[j] = costs[j - lo] + best
        prev, cur = cur, prev
    return int(prev[m])


def dtw_pairs(
    df: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
    max_points: int | None = None,
    band: int | None = None,
) -> DataFrame:
    """All-pairs DTW over per-(series, point) integer rows.

    ``df`` holds one row per (series, order, value) — already
    rolled-up points with an integral ``value_col``. Each series'
    points are gathered in ``order_col`` order (``max_points`` keeps
    the sorted prefix — the deterministic clamp that also bounds the
    oracle's unrolled DP); every unordered pair (series_a < series_b)
    gets one output row (series_a, series_b, n_a, n_b, dtw_dist).
    """
    if max_points is not None and max_points < 1:
        raise ValueError(f"max_points must be >= 1, got {max_points}")
    pts = F.array_sort(
        F.collect_list(
            F.struct(F.col(order_col).alias("o"), F.col(value_col).alias("v"))
        )
    )
    if max_points is not None:
        pts = F.slice(pts, 1, max_points)
    arrs = (
        df.where(F.col(value_col).isNotNull() & F.col(order_col).isNotNull())
        .groupBy(F.col(series_col).alias("sid"))
        .agg(
            F.transform(pts, lambda s: s["v"].cast("long")).alias("vals")
        )
        # pin: the pair self-join consumes this twice — without the
        # checkpoint the upstream rollup lineage executes once per side
        # (the cosine_pairs multi-consumer discipline, SURVEY §8)
        .localCheckpoint(eager=True)
    )
    pairs = (
        arrs.alias("a")
        .join(arrs.alias("b"), F.col("a.sid") < F.col("b.sid"))
        .select(
            F.col("a.sid").alias("series_a"),
            F.col("b.sid").alias("series_b"),
            F.col("a.vals").alias("_va"),
            F.col("b.vals").alias("_vb"),
        )
    )

    @F.pandas_udf("long")
    def _dtw(va: pd.Series, vb: pd.Series) -> pd.Series:
        return pd.Series(
            [
                dtw_numpy(
                    np.asarray(x, dtype=np.int64),
                    np.asarray(y, dtype=np.int64),
                    band,
                )
                for x, y in zip(va, vb)
            ],
            dtype="int64",
        )

    return pairs.select(
        "series_a",
        "series_b",
        F.size("_va").alias("n_a"),
        F.size("_vb").alias("n_b"),
        _dtw("_va", "_vb").alias("dtw_dist"),
    )
