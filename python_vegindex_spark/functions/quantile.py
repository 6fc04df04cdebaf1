"""Hyndman–Fan type-7 quantiles (the reference's default estimator).

The reference implements all nine HF types (quantile.py:14-76) but every
call site uses qtype=7 — R/S/numpy default, linear interpolation with
plotting positions h = (n-1)q + 1 (quantile.py:42-63). The "gcc90"
estimator is simply the type-7 p90 within a bucket
(generate_summary_timeseries.py:448-455).

Spark mapping:
* ``F.percentile(col, q)`` — Spark's exact percentile — already computes
  HF type-7 (sort + linear interpolation) JVM-side inside a single
  hash-aggregate. This is the default, whole-stage-codegen path.
* ``hf7_numpy`` — the numpy oracle used by tests and by the
  applyInPandas bit-exact path (codecs / golden comparisons).

NaN handling: the reference's quantile() counts NaNs in n (quantile.py:64)
but its callers guarantee NaN-free input via select_rows' brightness
floor (roitimeseries.py:826-834 with MIN_BRT=100 > 0, config.py:47) and
the dnsum>0 guard (generate_summary_timeseries.py:328-336). We make the
same guarantee explicit: nulls/NaNs are filtered before aggregation, so
both paths see clean vectors.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def hf7_numpy(values, q: float) -> float:
    """Exact HF-7 quantile of a 1-D array, NaNs excluded.

    Matches reference quantile.py:65-76 with qtype=7 on NaN-free input:
    h = (n-1)q + 1; j = floor(h); result = y[j-1] + (h-j)*(y[j] - y[j-1]).
    """
    x = np.asarray(values, dtype=np.float64)
    x = x[~np.isnan(x)]
    if x.size == 0:
        return float("nan")
    return float(np.quantile(x, q, method="linear"))


def percentile_expr(col: str | Column, q: float, alias: str | None = None) -> Column:
    """Exact type-7 percentile as a JVM aggregate expression."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.percentile(c, F.lit(q))
    return out.alias(alias) if alias else out


def percentiles_exprs(col: str, qs: tuple[float, ...], prefix: str) -> list[Column]:
    """One aggregate column per requested quantile, named ``{prefix}_{q*100}``.

    e.g. prefix='fcc', qs=(0.5, 0.75, 0.9) -> fcc_50, fcc_75, fcc_90 —
    the gcc_50/75/90 naming of the reference summary schema
    (gcctimeseries.py:636-669).
    """
    return [
        percentile_expr(col, q, alias=f"{prefix}_{int(round(q * 100))}") for q in qs
    ]
