"""plot_roistats twin: the chart-ready export of gcc vs time.

The reference's last remaining console script
(``/root/reference/src/vegindex/plot_roistats.py:1-128``) reads the
tier-1 roistats CSV plus the 3-day summary and draws three layers with
matplotlib: the QC-passing gcc points (black), the QC-failing points
(red — the concat of the low-sun rows and the out-of-brightness-range
day rows), and the 3-day ``gcc_90`` line (green). This module is the
engine twin, split the Spark-first way:

* :func:`roistats_plot_partitions` — the exact boolean-mask split
  (plot_roistats.py:95-101): ``low_sun`` (solar_elev < MIN_SUN_ANGLE),
  ``brt_filtered`` (day rows with brt outside [MIN_BRT, MAX_BRT]),
  ``good`` (day rows in range). Pandas NaN semantics are mirrored: a
  row whose solar_elev is ND appears in NO partition (every comparison
  is False), and a day row with ND brightness is dropped from both the
  filtered and good sets — NULL falls through the when-chain here the
  same way.
* :func:`plot_roistats_table` — the chart-ready long table
  ``(layer, series, ts, gcc)``: the scatter layers are M4-pre-reduced
  (:func:`.downsample.m4_downsample`, pixel-exact per the VLDB'14
  result) so a 10^9-point archive exports ≤ 4·width points per layer
  instead of shipping every row to a plotting frontend; the
  ``gcc_90`` line layer carries the 3-day summary rows verbatim (one
  per summary date — already tiny by construction).

A PDF is deliberately NOT produced here: matplotlib does not ship in
this container (the reference hard-requires it); the CLI job
(``scripts/vegindex_job.py plot-roistats``) writes the table as a
headered CSV any plotting frontend renders in one pass, and draws the
PNG itself only when matplotlib is importable.

Scale shape: the partition tag is a scan-level projection (no
shuffle); M4 is one hash aggregate per (layer, pixel); the summary
line is O(days/3) rows. Nothing corpus-sized ever sorts or collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .downsample import m4_downsample

# config.py:44-48 defaults (MIN_SUN_ANGLE / MIN_BRT / MAX_BRT)
MIN_SUN_ANGLE = 10.0
MIN_BRT = 100.0
MAX_BRT = 665.0


def roistats_plot_partitions(
    roistats: DataFrame,
    sunelev_min: float = MIN_SUN_ANGLE,
    brt_min: float = MIN_BRT,
    brt_max: float = MAX_BRT,
) -> DataFrame:
    """Tag each roistats row with its plot partition
    (plot_roistats.py:95-101): adds ``brt`` (r+g+b means, :88) and
    ``series`` in {'low_sun', 'brt_filtered', 'good'}; rows matching no
    partition (ND solar_elev; day rows with ND brightness) are dropped,
    matching the pandas boolean-mask behavior on NaN.

    Float NaN is normalized to NULL first: Spark orders NaN GREATER
    than every number (so ``NaN >= 10`` is true and a NaN-solar row
    would land in 'good', ``NaN > 665`` true and a NaN-brt day row in
    'brt_filtered'), whereas the reference's pandas masks evaluate
    every NaN comparison as False and drop the row — NULL falls through
    the when-chain here exactly like that."""
    from ..functions.quantile import nan_to_null

    solar = nan_to_null(F.col("solar_elev"))
    brt = (
        nan_to_null(F.col("r_mean"))
        + nan_to_null(F.col("g_mean"))
        + nan_to_null(F.col("b_mean"))
    )
    day = solar >= F.lit(float(sunelev_min))
    series = (
        F.when(solar < F.lit(float(sunelev_min)), "low_sun")
        .when(day & ((brt < F.lit(float(brt_min))) | (brt > F.lit(float(brt_max)))), "brt_filtered")
        .when(day & (brt >= F.lit(float(brt_min))) & (brt <= F.lit(float(brt_max))), "good")
    )
    return (
        roistats.withColumn("brt", brt)
        .withColumn("series", series)
        .where(F.col("series").isNotNull())
    )


def plot_roistats_table(
    roistats: DataFrame,
    summary: DataFrame,
    width: int = 1600,
    sunelev_min: float = MIN_SUN_ANGLE,
    brt_min: float = MIN_BRT,
    brt_max: float = MAX_BRT,
) -> DataFrame:
    """The chart-ready long table: ``(layer, series, ts, gcc)``.

    * layer='points': M4-pre-reduced gcc scatter per partition series
      (≤ 4·``width`` rows per series, pixel-exact for line/point
      rendering at ``width`` device pixels);
    * layer='line', series='gcc_90': the 3-day summary's 90th-percentile
      gcc, one row per summary date at local noon — the reference plots
      ``df2.gcc_90`` indexed by date (plot_roistats.py:103-110).

    ``roistats`` needs (ts, solar_elev, r_mean, g_mean, b_mean, gcc);
    ``summary`` needs (date, gcc_90). Rows with ND gcc are dropped (a
    point without a y-coordinate cannot render; pandas .plot drops NaN
    the same way).
    """
    pts = roistats_plot_partitions(
        roistats, sunelev_min=sunelev_min, brt_min=brt_min, brt_max=brt_max
    ).where(F.col("gcc").isNotNull())
    m4 = m4_downsample(
        pts, width=width, series_cols=["series"], ts_col="ts", value_col="gcc"
    )
    # unpivot the 4 extreme points; distinct because first/last/min/max
    # coincide in sparse pixels
    corners = F.array(
        *[
            F.struct(F.col(f"t_{k}").alias("ts"), F.col(f"v_{k}").alias("gcc"))
            for k in ("first", "last", "min", "max")
        ]
    )
    scatter = (
        m4.select("series", F.explode(corners).alias("p"))
        .select(
            F.lit("points").alias("layer"),
            "series",
            F.col("p.ts").alias("ts"),
            F.col("p.gcc").alias("gcc"),
        )
        .distinct()
    )
    from ..functions.quantile import nan_to_null

    g90 = nan_to_null(F.col("gcc_90").cast("double"))
    line = summary.where(g90.isNotNull()).select(
        F.lit("line").alias("layer"),
        F.lit("gcc_90").alias("series"),
        F.to_timestamp(F.concat(F.col("date").cast("string"), F.lit(" 12:00:00"))).alias("ts"),
        g90.alias("gcc"),
    )
    return scatter.unionByName(line)
