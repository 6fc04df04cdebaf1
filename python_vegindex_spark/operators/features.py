"""Tier-0 -> tier-1: per-turn feature extraction.

The Spark analog of the reference's per-image ROI statistics
(get_roi_stats, roitimeseries.py:97-227; row assembly
roitimeseries.py:394-553). One row per (conv_id, turn_idx), pure column
expressions + one window (lag) — no Python UDFs.

Measure mapping (FIXTURES.md §2):
* r_dn / g_dn / b_dn — raw "digital number" measures: text length,
  scaled word count, latency delta. ``fcc = g_dn / dnsum`` is the gcc
  analog (gcc = g/(r+g+b), roitimeseries.py:486-491); ``rcc_like =
  r_dn / dnsum`` is the rcc analog, which the rollup RECOMPUTES from the
  raw measures rather than trusting the stored column
  (generate_summary_timeseries.py:326-336).
* gate_value — solar-elevation analog: peaks at 12:00 UTC, so the
  select_rows-style QC gate (roitimeseries.py:809-841) has real
  time-of-day semantics.
* quality_flag — awbflag analog: rows with flag == 1 are skipped during
  aggregation (generate_summary_timeseries.py:309-315).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from ..functions.timeutil import epoch_us

# columns produced on top of the carried keys
FEATURE_COLS = [
    "latency_delta_s",
    "text_len",
    "word_count",
    "tool_call",
    "r_dn",
    "g_dn",
    "b_dn",
    "dnsum",
    "fcc",
    "rcc_like",
    "gate_value",
    "quality_flag",
]

# the minimal column set worth materializing: everything else in
# FEATURE_COLS is a pure projection of these (see derive_features)
PHYSICAL_COLS = [
    "conv_id", "turn_idx", "role", "tool", "ts",
    "text_len", "word_count", "tool_call", "latency_delta_s",
]


def turn_features_physical(
    turns: DataFrame, lag_via_join: bool = False
) -> DataFrame:
    """The expensive part of feature extraction: text folded to scalars
    plus the per-conv lag window — 9 physical columns, nothing derivable.

    This is what the pipeline MATERIALIZES as the silver table: the
    derived measures (r/g/b_dn, dnsum, fcc, rcc_like, gate_value,
    quality_flag) are cheap whole-stage-codegen projections recomputed
    on read by :func:`derive_features`, so persisting them would spend
    ~45% more write bandwidth — and the silver table is read once per
    gold tier plus the chunk encoder, multiplying the saving. (This
    sandbox is memory-bandwidth bound; bytes written/read are the
    scaling currency.)

    ``lag_via_join=True`` computes the latency delta with an equi-join on
    (conv_id, turn_idx-1) instead of a window. The window is faster for
    typical conversations, but it forces each conv into a single task; at
    10^12-turn scale a pathological multi-billion-turn conv would bottleneck
    one executor, and the join variant hash-distributes by (conv, idx).
    PRECONDITION for the join variant: turn_idx is dense per conv (the
    bronze ingest contract). On gappy turn_idx the window takes the
    previous EXISTING turn while the join yields null at a gap — run the
    window variant on pre-filtered/gappy inputs.
    """
    # Project text -> scalars BEFORE any shuffle: the window (or join)
    # must never move the text payload. At 100 TB the text column is
    # ~90% of the bytes; folding it to two doubles first cuts shuffle
    # traffic by that factor (and this sandbox is memory-bandwidth
    # bound, so shuffle bytes are the scaling currency).
    df = turns.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        "ts",
        F.length("text").cast("double").alias("text_len"),
        F.when(F.length(F.trim("text")) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim("text"), r"\s+")))
        .cast("double")
        .alias("word_count"),
        # null-safe: external bronze parquet may carry NULL tool (synth
        # writes ''); a null flag would silently drop rows from avg/sum
        (F.coalesce(F.col("tool"), F.lit("")) != "").cast("int").alias("tool_call"),
    )

    if lag_via_join:
        prev = df.select(
            F.col("conv_id").alias("_pc"),
            (F.col("turn_idx") + 1).alias("_pi"),
            F.col("ts").alias("_prev_ts"),
        )
        df = df.join(
            prev,
            on=[df.conv_id == F.col("_pc"), df.turn_idx == F.col("_pi")],
            how="left",
        ).drop("_pc", "_pi")
        df = df.withColumn(
            "latency_delta_s",
            (epoch_us(F.col("ts")) - epoch_us(F.col("_prev_ts"))) / 1e6,
        ).drop("_prev_ts")
    else:
        w = Window.partitionBy("conv_id").orderBy("turn_idx")
        df = df.withColumn(
            "latency_delta_s",
            (epoch_us(F.col("ts")) - epoch_us(F.lag("ts").over(w))) / 1e6,
        )

    return df.select(*PHYSICAL_COLS)


def derive_features(df: DataFrame) -> DataFrame:
    """Derived measures on top of the physical silver columns — pure
    projections, safe to recompute on every read (A10
    recompute-don't-trust, generate_summary_timeseries.py:326-336)."""
    # raw DN-style measures -> composite features
    df = (
        df.withColumn("r_dn", F.col("text_len"))
        .withColumn("g_dn", F.col("word_count") * 8.0)
        .withColumn("b_dn", F.coalesce(F.col("latency_delta_s"), F.lit(0.0)))
        .withColumn("dnsum", F.col("r_dn") + F.col("g_dn") + F.col("b_dn"))
    )
    safe = F.col("dnsum") > 0
    df = df.withColumn(
        "fcc", F.when(safe, F.col("g_dn") / F.col("dnsum"))
    ).withColumn("rcc_like", F.when(safe, F.col("r_dn") / F.col("dnsum")))

    # solar-elevation analog: 90 deg at 12:00 UTC, -90 at midnight
    secs = (
        F.hour("ts") * 3600 + F.minute("ts") * 60 + F.second("ts")
    ).cast("double")
    df = df.withColumn(
        "gate_value", 90.0 - F.abs(secs - 43200.0) / 43200.0 * 180.0
    )
    # awbflag analog: degenerate ultra-short turns are flagged
    df = df.withColumn("quality_flag", (F.col("text_len") < 10).cast("int"))

    return df.select(
        "conv_id", "turn_idx", "role", "tool", "ts", *FEATURE_COLS
    )


def turn_features(turns: DataFrame, lag_via_join: bool = False) -> DataFrame:
    """Compute tier-1 features for every turn (physical + derived)."""
    return derive_features(turn_features_physical(turns, lag_via_join))
