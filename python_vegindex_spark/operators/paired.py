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


# ---------------------------------------------------------------------------
# Reference-schema NDVI tier-1.5 generation (generate_ndvi_timeseries.py twin)

# output column order, generate_ndvi_timeseries.py:207-248
NDVI_TS_FIELDS = (
    ["date", "local_std_time", "doy", "filename_rgb", "filename_ir",
     "solar_elev", "exposure_rgb", "exposure_ir", "mask_index",
     "r_mean", "g_mean", "b_mean", "ir_mean", "ir_std"]
    + [f"ir_{q}_qtl" for q in (5, 10, 25, 50, 75, 90, 95)]
    + ["gcc", "Y", "Z_prime", "R_prime", "Y_prime", "X_prime", "NDVI_c"]
)

def generate_ndvi_table(
    rgb: DataFrame,
    ir: DataFrame,
    tolerance_s: float = 600.0,
    on: list[str] | None = None,
) -> DataFrame:
    """RGB roistats + IR roistats -> the reference's NDVI timeseries
    table, column for column (generate_ndvi_timeseries.py:100-248):

    * nearest-in-time pairing within +/-10 min (pd.merge_asof ->
      the distributed union+window as-of join), RGB side is the left;
    * drop unmatched rows and rows where either exposure is null/0 or
      any of r/g/b/ir mean is null (lines 148-170);
    * Petach algebra on the FLOAT means/exposures (lines 173-190) —
      NO [-1, 1] clamp here: the range filter lives in the summary
      reader (ndvitimeseries.py:621-642), not the generator;
    * int32 truncation of the display copies of doy/exposures/means
      (lines 199-210).

    ``rgb``/``ir`` are reader-shaped DataFrames
    (sources.vegindex_tables.read_roistats / read_ir_roistats: a ``ts``
    timestamp plus the CSV columns). ``on`` (default none — a site's
    tier-1 table is one series, exactly the reference's scope) adds
    equi-keys for pairing many sites in one plan, which is also the
    100-TB scale path: per-(site) partitions instead of one global
    window.
    """
    on = on or []
    ir_payload = ir.select(
        *on,
        "ts",
        F.col("filename").alias("filename_ir"),
        F.col("exposure").alias("exposure_ir"),
        F.col("ir_mean").alias("mean"),
        F.col("ir_std").alias("std"),
        *[F.col(f"ir_{q}_qtl").alias(f"{q}_qtl") for q in (5, 10, 25, 50, 75, 90, 95)],
    )
    paired = asof_join(
        rgb,
        ir_payload,
        on=on,
        left_ts="ts",
        right_ts="ts",
        direction="nearest",
        tolerance_s=tolerance_s,
        prefix="ir_",
    )
    # ir_ prefix + renamed payload restores the reference names:
    # ir_filename_ir -> filename_ir etc. handled below; ir_mean/ir_std/
    # ir_{q}_qtl land directly on their reference names.
    d = paired.filter(
        F.col("ir_filename_ir").isNotNull()
        & F.col("ir_exposure_ir").isNotNull()
        & F.col("exposure").isNotNull()
        & (F.col("ir_exposure_ir") != 0)
        & (F.col("exposure") != 0)
        & F.col("r_mean").isNotNull()
        & F.col("g_mean").isNotNull()
        & F.col("b_mean").isNotNull()
        & F.col("ir_mean").isNotNull()
    )
    y = 0.30 * F.col("r_mean") + 0.59 * F.col("g_mean") + 0.11 * F.col("b_mean")
    zp = F.col("ir_mean") / F.sqrt(F.col("ir_exposure_ir"))
    rp = F.col("r_mean") / F.sqrt(F.col("exposure"))
    yp = y / F.sqrt(F.col("exposure"))
    xp = zp - yp
    ndvi = (xp - rp) / (xp + rp)
    out = d.select(
        *on,
        "date",
        "local_std_time",
        F.col("doy").cast("int").alias("doy"),
        F.col("filename").alias("filename_rgb"),
        F.col("ir_filename_ir").alias("filename_ir"),
        "solar_elev",
        F.col("exposure").cast("int").alias("exposure_rgb"),
        F.col("ir_exposure_ir").cast("int").alias("exposure_ir"),
        F.col("mask_index").cast("int").alias("mask_index"),
        *[F.col(f"{b}_mean").cast("int").alias(f"{b}_mean") for b in ("r", "g", "b")],
        F.col("ir_mean").cast("int").alias("ir_mean"),
        "ir_std",
        *[F.col(f"ir_{q}_qtl") for q in (5, 10, 25, 50, 75, 90, 95)],
        "gcc",
        y.alias("Y"),
        zp.alias("Z_prime"),
        rp.alias("R_prime"),
        yp.alias("Y_prime"),
        xp.alias("X_prime"),
        ndvi.alias("NDVI_c"),
        F.col("ts"),
    )
    assert [c for c in out.columns if c != "ts" and c not in on] == NDVI_TS_FIELDS
    return out


def paired_summary(
    index_df: DataFrame,
    tier: str,
    series_cols: list[str],
    nmin: int = 1,
) -> DataFrame:
    """NDVI summary tier: the E2 rollup SHAPE over ndvi_c
    (generate_ndvi_summary_timeseries.py:279-463), with calendar-anchored
    buckets (doy restarts each year). For the reference's sequential-
    cursor year-boundary spill-over (daterange2's final bucket of a year
    consuming early next-year rows) use
    ``operators.vegindex_summary.generate_ndvi_summary``, which is
    differential-tested against the reference script; this helper and the
    two diverge only in the buckets flanking year boundaries when nday
    does not divide the year length."""
    return rollup_series(
        index_df,
        tier=tier,
        series_cols=series_cols,
        value_col="ndvi_c",
        nmin=nmin,
    )
