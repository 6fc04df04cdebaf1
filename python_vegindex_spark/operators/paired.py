"""Paired-stream derived index — the NDVI pipeline (E3) re-expressed.

Reference flow (generate_ndvi_timeseries.py:109-303): pair each RGB row
with the nearest-in-time IR row within +/-10 min (merge_asof nearest),
drop unmatched/zero-exposure rows, apply the Petach column algebra::

    Y  = 0.30 r + 0.59 g + 0.11 b          (luminance composite)
    Z' = ir / sqrt(exp_ir)
    R' = r  / sqrt(exp_rgb)
    Y' = Y  / sqrt(exp_rgb)
    X' = Z' - Y'
    ndvi_c = (X' - R') / (X' + R')         (clamped filter to [-1, 1])

(generate_ndvi_timeseries.py:171-189; filters 148-169; range filter
ndvitimeseries.py:621-642.) Downstream, the summary tier repeats the E2
rollup shape over ndvi_c plus a gcc_90 estimator
(generate_ndvi_summary_timeseries.py:279-463).

Here the same operator over two transcript measure streams: the engine
takes any primary stream carrying (r, g, b, exposure) measures and any
secondary stream carrying (ir, exposure), pairs them as-of, and derives
the index. All column algebra is JVM expressions; the as-of join is the
distributed operator from operators/asof.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..operators.generic_rollup import rollup_series


def paired_index(
    primary: DataFrame,
    secondary: DataFrame,
    on: list[str],
    tolerance_s: float = 600.0,
    r_col: str = "r",
    g_col: str = "g",
    b_col: str = "b",
    exp_p_col: str = "exposure",
    ir_col: str = "ir",
    exp_s_col: str = "exposure",
    ts_col: str = "ts",
) -> DataFrame:
    """As-of pair + Petach algebra -> one row per matched primary row with
    ``ndvi_c`` in [-1, 1]. Unmatched / null / zero-exposure rows drop
    (generate_ndvi_timeseries.py:148-169)."""
    paired = asof_join(
        primary,
        secondary,
        on=on,
        left_ts=ts_col,
        right_ts=ts_col,
        direction="nearest",
        tolerance_s=tolerance_s,
        payload_cols=[ir_col, exp_s_col],
        prefix="ir_",
    )
    ir = F.col(f"ir_{ir_col}")
    exp_s = F.col(f"ir_{exp_s_col}")
    exp_p = F.col(exp_p_col)
    d = paired.filter(
        F.col(f"ir_ts").isNotNull()
        & ir.isNotNull()
        & exp_s.isNotNull()
        & (exp_s != 0)
        & exp_p.isNotNull()
        & (exp_p != 0)
    )
    y = 0.30 * F.col(r_col) + 0.59 * F.col(g_col) + 0.11 * F.col(b_col)
    zp = ir / F.sqrt(exp_s)
    rp = F.col(r_col) / F.sqrt(exp_p)
    yp = y / F.sqrt(exp_p)
    xp = zp - yp
    ndvi = (xp - rp) / (xp + rp)
    out = d.select(
        *on,
        F.col(ts_col),
        F.col(r_col),
        F.col(g_col),
        F.col(b_col),
        exp_p.alias("exp_primary"),
        ir.alias("ir"),
        exp_s.alias("exp_secondary"),
        F.round(y, 10).alias("y_lum"),
        ndvi.alias("ndvi_c"),
    )
    # F3 value-range filter (ndvitimeseries.py:621-642)
    return out.filter(F.col("ndvi_c").between(-1.0, 1.0))


def paired_summary(
    index_df: DataFrame,
    tier: str,
    series_cols: list[str],
    nmin: int = 1,
) -> DataFrame:
    """NDVI summary tier: the E2 rollup shape over ndvi_c
    (generate_ndvi_summary_timeseries.py:279-463)."""
    return rollup_series(
        index_df,
        tier=tier,
        series_cols=series_cols,
        value_col="ndvi_c",
        nmin=nmin,
    )
