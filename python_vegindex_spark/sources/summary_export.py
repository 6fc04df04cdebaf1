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
