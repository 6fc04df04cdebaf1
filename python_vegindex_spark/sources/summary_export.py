"""Export gold rollups in the reference's summary-CSV schema.

Maps the engine's transcript-domain tier-2 rollup (operators/rollup.py)
onto the reference gcc summary table's exact 32-column layout
(gcctimeseries.py:636-669 field list) so ``write_headered_csv`` emits a
file a vegindex consumer (or ``read_gcc_summary``) parses unchanged:

  measure mapping: fcc->gcc, rcc_like->rcc, {r,g,b}_dn->{r,g,b},
  gate_value->solar_elev, turn_count->image_count,
  bucket_center->date, representative row -> midday_*.

``snow_flag`` and the four ``outlierflag_gcc_*`` columns are emitted
always-ND exactly like the reference's generate path
(generate_summary_timeseries.py:381-385 writes ND for all five; they are
only ever populated by an out-of-band outlier pass the reference does
not ship).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the reference's field order, gcctimeseries.py:636-669
GCC_SUMMARY_FIELDS = [
    "date", "year", "doy", "image_count",
    "midday_filename", "midday_r", "midday_g", "midday_b",
    "midday_gcc", "midday_rcc",
    "r_mean", "r_std", "g_mean", "g_std", "b_mean", "b_std",
    "gcc_mean", "gcc_std", "gcc_50", "gcc_75", "gcc_90",
    "rcc_mean", "rcc_std", "rcc_50", "rcc_75", "rcc_90",
    "max_solar_elev", "snow_flag",
    "outlierflag_gcc_mean", "outlierflag_gcc_50",
    "outlierflag_gcc_75", "outlierflag_gcc_90",
]


def to_gcc_summary_schema(gold: DataFrame) -> DataFrame:
    """Project a transcript rollup (one series) onto GCC_SUMMARY_FIELDS.

    The representative row's synthetic "filename" is
    ``<conv_id>_<mid_turn_idx>`` (the transcript analogue of the image
    filename — unique and sortable like the reference's).
    """
    nd_int = F.lit(None).cast("int")
    return gold.select(
        F.col("bucket_center").alias("date"),
        F.col("year"),
        F.col("doy"),
        F.col("turn_count").alias("image_count"),
        F.when(
            F.col("mid_turn_idx").isNotNull(),
            F.concat_ws("_", F.col("conv_id"), F.col("mid_turn_idx").cast("string")),
        ).alias("midday_filename"),
        F.col("mid_r_dn").alias("midday_r"),
        F.col("mid_g_dn").alias("midday_g"),
        F.col("mid_b_dn").alias("midday_b"),
        F.col("mid_fcc").alias("midday_gcc"),
        F.col("mid_rcc_like").alias("midday_rcc"),
        F.col("r_dn_mean").alias("r_mean"),
        F.col("r_dn_std").alias("r_std"),
        F.col("g_dn_mean").alias("g_mean"),
        F.col("g_dn_std").alias("g_std"),
        F.col("b_dn_mean").alias("b_mean"),
        F.col("b_dn_std").alias("b_std"),
        F.col("fcc_mean").alias("gcc_mean"),
        F.col("fcc_std").alias("gcc_std"),
        F.col("fcc_50").alias("gcc_50"),
        F.col("fcc_75").alias("gcc_75"),
        F.col("fcc_90").alias("gcc_90"),
        F.col("rcc_like_mean").alias("rcc_mean"),
        F.col("rcc_like_std").alias("rcc_std"),
        F.col("rcc_like_50").alias("rcc_50"),
        F.col("rcc_like_75").alias("rcc_75"),
        F.col("rcc_like_90").alias("rcc_90"),
        F.col("max_gate_value").alias("max_solar_elev"),
        nd_int.alias("snow_flag"),
        nd_int.alias("outlierflag_gcc_mean"),
        nd_int.alias("outlierflag_gcc_50"),
        nd_int.alias("outlierflag_gcc_75"),
        nd_int.alias("outlierflag_gcc_90"),
    )


# the reference's NDVI summary field order, ndvi_summary_timeseries.py:100-137
NDVI_SUMMARY_FIELDS = [
    "date", "year", "doy", "image_count",
    "midday_rgb_filename", "midday_ir_filename", "midday_ndvi",
    "gcc_90", "ndvi_mean", "ndvi_std", "ndvi_50", "ndvi_75", "ndvi_90",
    "max_solar_elev", "snow_flag",
    "outlierflag_ndvi_mean", "outlierflag_ndvi_50",
    "outlierflag_ndvi_75", "outlierflag_ndvi_90",
]


def to_ndvi_summary_schema(summary: DataFrame, tier: str = "3day") -> DataFrame:
    """Project a paired-index rollup (operators/paired.paired_summary /
    generic rollup_series over ``ndvi_c``) onto NDVI_SUMMARY_FIELDS
    (ndvi_summary_timeseries.py:100-137 field order).

    Required input columns: bucket_start, n, v_mean, v_std, v_50, v_75,
    v_90. Optional (passed through when present, typed-ND otherwise):
    midday_rgb_filename, midday_ir_filename, midday_ndvi, gcc_90,
    max_solar_elev. Flag columns are always-ND like the reference
    generate path (generate_ndvi_summary_timeseries.py writes ND)."""
    from ..functions.buckets import bucket_center

    nd_int = F.lit(None).cast("int")
    nd_dbl = F.lit(None).cast("double")
    nd_str = F.lit(None).cast("string")

    def opt(name: str, nd) -> "F.Column":
        return F.col(name) if name in summary.columns else nd.alias(name)

    center = bucket_center(F.col("bucket_start"), tier)
    return summary.select(
        center.alias("date"),
        F.year(center).alias("year"),
        F.dayofyear(center).alias("doy"),
        F.col("n").cast("int").alias("image_count"),
        opt("midday_rgb_filename", nd_str).alias("midday_rgb_filename"),
        opt("midday_ir_filename", nd_str).alias("midday_ir_filename"),
        opt("midday_ndvi", nd_dbl).alias("midday_ndvi"),
        opt("gcc_90", nd_dbl).alias("gcc_90"),
        F.col("v_mean").alias("ndvi_mean"),
        F.col("v_std").alias("ndvi_std"),
        F.col("v_50").alias("ndvi_50"),
        F.col("v_75").alias("ndvi_75"),
        F.col("v_90").alias("ndvi_90"),
        opt("max_solar_elev", nd_dbl).alias("max_solar_elev"),
        nd_int.alias("snow_flag"),
        nd_int.alias("outlierflag_ndvi_mean"),
        nd_int.alias("outlierflag_ndvi_50"),
        nd_int.alias("outlierflag_ndvi_75"),
        nd_int.alias("outlierflag_ndvi_90"),
    )
