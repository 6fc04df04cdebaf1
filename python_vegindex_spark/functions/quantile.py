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
same guarantee explicit AT THE EXPRESSION LEVEL: the aggregate paths map
NaN -> NULL (:func:`nan_to_null`) before aggregating — Spark's
``percentile``/``collect_list`` drop nulls but sort NaN greatest — so
the Spark expressions and the numpy oracle (which np.isnan-filters) see
identical clean vectors even when a NaN slips past upstream QC.
:func:`hf_quantile_from_sorted` is the exception: it takes a pre-built
array and trusts the CALLER to have NaN-filtered it.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def nan_to_null(c: Column) -> Column:
    """NaN -> NULL (as double) so aggregates drop NaN exactly like the
    numpy oracle's isnan filter. Pure codegen'd CASE WHEN; nulls pass
    through unchanged."""
    d = c.cast("double")
    return F.when(~F.isnan(d), d)


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


# Hyndman–Fan plotting-position parameters (a, b, c, d) for types 1-9,
# as tabulated in the reference (quantile.py:42-63) after HF (1996).
_HF_ABCD = [
    (0.0, 0.0, 1.0, 0.0),      # 1: inverse empirical CDF
    (0.5, 0.0, 1.0, 0.0),      # 2: type 1 averaged
    (0.5, 0.0, 0.0, 0.0),      # 3: nearest order statistic (SAS)
    (0.0, 0.0, 0.0, 1.0),      # 4: California linear interpolation
    (0.5, 0.0, 0.0, 1.0),      # 5: hydrologists (Hazen)
    (0.0, 1.0, 0.0, 1.0),      # 6: Weibull (SPSS/Minitab)
    (1.0, -1.0, 0.0, 1.0),     # 7: S/R default (linear)
    (1 / 3, 1 / 3, 0.0, 1.0),  # 8: median-unbiased
    (3 / 8, 0.25, 0.0, 1.0),   # 9: normal-unbiased
]


def hf_quantile_numpy(values, q: float, qtype: int = 7) -> float:
    """All nine HF sample quantiles on a 1-D array, NaNs excluded —
    the numpy oracle mirroring reference quantile.py:15-76 (including its
    modf/trunc handling of the h < 0 edge).

    Faithful-quirk notes (fuzz-verified against the reference function
    itself, tests/test_quantile.py::test_hf_reference_differential_fuzz):

    * When h = a + (n+b)q - 1 lands in (-1, 0) the reference
      EXTRAPOLATES below y[0]: modf() yields j == -0.0, which passes its
      ``j < 0`` guard, leaving a negative g in the interpolation term.
      numpy's named HF methods clamp to y[0] there — so small-q results
      deliberately differ from numpy and match the reference.
    * The one deliberate divergence: for types whose h reaches (n-1, n)
      (e.g. type 6, n=5, q=0.95) the reference crashes with IndexError
      on y[j+1]; this oracle (and the Spark expression) clamps to
      y[n-1] — defined exactly where the reference dies, never
      different where it returns."""
    if not 1 <= qtype <= 9:
        raise ValueError(f"qtype must be 1..9, got {qtype}")
    x = np.asarray(values, dtype=np.float64)
    x = x[~np.isnan(x)]
    n = x.size
    if n == 0:
        return float("nan")
    y = np.sort(x)
    a, b, c, d = _HF_ABCD[qtype - 1]
    h = a + (n + b) * q - 1
    j = float(np.trunc(h))  # modf-style trunc toward zero
    g = h - j
    if j < 0:
        return float(y[0])
    if j >= n:
        return float(y[n - 1])
    j = int(j)
    if g == 0:
        return float(y[j])
    return float(y[j] + (y[min(j + 1, n - 1)] - y[j]) * (c + d * g))


def hf_quantile_expr(
    col: str | Column, q: float, qtype: int = 7, alias: str | None = None
) -> Column:
    """HF type-1..9 quantile as a pure JVM aggregate expression.

    Type 7 is a plain ``F.percentile`` (Spark's exact percentile IS
    HF-7, sort + linear interpolation inside one hash aggregate) — the
    hot-path form. Other types build ``array_sort(collect_list(...))``
    and index it with the HF plotting-position arithmetic; intended for
    per-group bucket sizes (thousands of rows), not whole-table
    aggregates — exactly the reference's usage envelope, where every
    shipped call site is qtype=7 anyway (quantile.py callers)."""
    c_ = nan_to_null(F.col(col) if isinstance(col, str) else col)
    if not 1 <= qtype <= 9:
        raise ValueError(f"qtype must be 1..9, got {qtype}")
    if qtype == 7:
        out = F.percentile(c_, F.lit(q))
        return out.alias(alias) if alias else out
    arr = F.array_sort(F.collect_list(c_))  # collect_list drops nulls
    out = hf_quantile_from_sorted(arr, q, qtype)
    return out.alias(alias) if alias else out


def hf_quantile_from_sorted(arr: Column, q: float, qtype: int) -> Column:
    """HF quantile arithmetic over a pre-sorted, null- and NaN-free array
    column (callers building the array from raw measures should wrap them
    in :func:`nan_to_null` first) —
    the finish step of the two-phase form. Letting several quantiles of
    the same measure share ONE ``array_sort(collect_list(...))`` aggregate
    buffer (instead of one buffer per quantile) divides the aggregate
    state that crosses the shuffle by the number of quantiles."""
    if not 1 <= qtype <= 9:
        raise ValueError(f"qtype must be 1..9, got {qtype}")
    a, b, cc, d = _HF_ABCD[qtype - 1]
    n = F.size(arr)
    h = F.lit(a) + (n + F.lit(b)) * F.lit(q) - F.lit(1.0)
    j = h.cast("long")  # trunc toward zero, matching python modf
    g = h - j.cast("double")
    yj = F.element_at(arr, (j + 1).cast("int"))
    yj1 = F.element_at(arr, F.least(j + 2, n.cast("long")).cast("int"))
    interp = yj + (yj1 - yj) * (F.lit(cc) + F.lit(d) * g)
    return (
        F.when(n == 0, F.lit(None).cast("double"))
        .when(j < 0, F.element_at(arr, 1))
        .when(j >= n.cast("long"), F.element_at(arr, n.cast("int")))
        .when(g == 0, yj)
        .otherwise(interp)
    )


def percentile_expr(col: str | Column, q: float, alias: str | None = None) -> Column:
    """Exact type-7 percentile as a JVM aggregate expression (NaN-safe)."""
    c = nan_to_null(F.col(col) if isinstance(col, str) else col)
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
