"""Structured Streaming continuous aggregate (the streaming-native path).

The reference is batch-only; its ``update_*`` scripts emulate micro-batch
incremental maintenance (SURVEY.md §2.9), which streaming/incremental.py
reproduces faithfully. This module additionally offers the
Spark-streaming-native expression of the same hourly rollup for users
who ingest turns as a stream:

* file-source ``readStream`` over the bronze directory
* event-time watermark for late turns (the analog of the reference's
  "re-open the last bucket" rule — late data within the watermark still
  lands in its true bucket)
* tumbling 1-hour window aggregate; approx_percentile instead of the
  exact HF-7 sort (exact percentiles are not incrementally maintainable;
  the batch tiers remain the golden path, streaming is the low-latency
  approximation — documented divergence)
* append output mode: a bucket emits once its watermark passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TURNS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def streaming_hourly_rollup(
    spark: SparkSession,
    input_path: str,
    watermark: str = "2 hours",
    value_expr: str = "CAST(length(text) AS DOUBLE)",
) -> DataFrame:
    """Build the streaming DataFrame (caller attaches the sink)."""
    stream = (
        spark.readStream.schema(TURNS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_path)
    )
    v = F.expr(value_expr).alias("v")
    return (
        stream.select("conv_id", "ts", v)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("conv_id"))
        .agg(
            F.count("v").alias("n"),
            F.avg("v").alias("v_mean"),
            F.stddev_pop("v").alias("v_std"),
            F.max("v").alias("v_max"),
            F.expr("approx_percentile(v, 0.9, 10000)").alias("v_90_approx"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "conv_id",
            "n",
            "v_mean",
            "v_std",
            "v_max",
            "v_90_approx",
        )
    )


def run_available_now(
    df: DataFrame, checkpoint: str, output_path: str
) -> None:
    """Drain everything currently available to a parquet sink and stop —
    the micro-batch-equivalent trigger used by tests and backfills."""
    q = (
        df.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
