"""Interval-validity join (J2/J3) + Structured Streaming rollup parity."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from python_vegindex_spark.operators.interval_join import (
    dim_lookup,
    interval_join,
    validate_intervals,
)


def test_interval_join_and_validation(spark):
    facts = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["a", "a", "a", "b"],
                "ts": pd.to_datetime(
                    ["2024-01-05", "2024-02-10", "2024-03-20", "2024-02-01"]
                ),
            }
        )
    )
    dim = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["a", "a", "b"],
                "segment": ["s1", "s2", "s9"],
                "start_ts": pd.to_datetime(["2024-01-01", "2024-02-01", "2024-01-01"]),
                "end_ts": pd.to_datetime(["2024-02-01", "2024-03-01", "2024-12-31"]),
            }
        )
    )
    validate_intervals(dim, ["conv_id"])  # should pass
    out = (
        interval_join(facts, dim, key_cols=["conv_id"])
        .orderBy("ts")
        .select("conv_id", "ts", "segment")
        .collect()
    )
    assert [(r["conv_id"], r["segment"]) for r in out] == [
        ("a", "s1"), ("b", "s9"), ("a", "s2"),
    ]  # 2024-03-20 matches nothing (window ended)

    bad = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["a", "a"],
                "segment": ["x", "y"],
                "start_ts": pd.to_datetime(["2024-01-01", "2024-01-15"]),
                "end_ts": pd.to_datetime(["2024-02-01", "2024-03-01"]),
            }
        )
    )
    with pytest.raises(ValueError, match="overlapping"):
        validate_intervals(bad, ["conv_id"])


def test_dim_lookup_broadcast_plan(spark):
    facts = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("v")
    )
    dim = spark.createDataFrame(pd.DataFrame({"k": range(5), "name": list("abcde")}))
    out = dim_lookup(facts, dim, on=["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert out.count() == 100


def test_streaming_rollup_matches_batch(spark, tmp_path):
    from python_vegindex_spark.sources.synth import synth_turns
    from python_vegindex_spark.streaming.structured import (
        run_available_now,
        streaming_hourly_rollup,
    )

    turns = synth_turns(spark, n_convs=30, seed=5, span_days=30)
    in_dir = str(tmp_path / "stream_in")
    out_dir = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")

    # two arrival batches (files appearing over time)
    first = turns.filter(F.col("ts") < "2023-12-10")
    rest = turns.filter(F.col("ts") >= "2023-12-10")
    first.write.mode("overwrite").parquet(in_dir)
    run_available_now(streaming_hourly_rollup(spark, in_dir), ckpt, out_dir)
    rest.write.mode("append").parquet(in_dir)
    run_available_now(streaming_hourly_rollup(spark, in_dir), ckpt, out_dir)

    # append mode emits a window only once the watermark passes its end;
    # windows within <watermark> of the final max event time stay in
    # state (would emit on the next arrival) — exclude them on both sides
    max_ts = turns.agg(F.max("ts")).collect()[0][0]
    cutoff = max_ts - dt.timedelta(hours=2)
    got = (
        spark.read.parquet(out_dir)
        .filter(F.col("bucket_start") + F.expr("INTERVAL 1 HOUR") <= F.lit(cutoff))
        .groupBy("conv_id", "bucket_start")
        .agg(F.sum("n").alias("n"))
        .toPandas()
    )
    exp = (
        turns.withColumn("bucket_start", F.date_trunc("hour", "ts"))
        .filter(F.col("bucket_start") + F.expr("INTERVAL 1 HOUR") <= F.lit(cutoff))
        .groupBy("conv_id", "bucket_start")
        .agg(F.count("*").alias("n"))
        .toPandas()
    )
    g = got.sort_values(["conv_id", "bucket_start"]).reset_index(drop=True)
    e = exp.sort_values(["conv_id", "bucket_start"]).reset_index(drop=True)
    assert len(g) == len(e)
    pd.testing.assert_frame_equal(g, e[g.columns.tolist()])


def test_streaming_dedup_drops_retries_across_restart(spark, tmp_path):
    """streaming_dedup_turns: at-least-once duplicates are dropped within
    the watermark, INCLUDING repeats arriving in a later micro-batch
    after a query restart (state restored from the checkpoint)."""
    from python_vegindex_spark.sources.synth import synth_turns
    from python_vegindex_spark.streaming.structured import (
        run_available_now,
        streaming_dedup_turns,
    )

    turns = synth_turns(spark, n_convs=8, seed=3, span_days=2)
    in_dir = str(tmp_path / "dd_in")
    out_dir = str(tmp_path / "dd_out")
    ckpt = str(tmp_path / "dd_ckpt")

    # batch 1: every turn written twice (the producer retried everything)
    turns.write.mode("overwrite").parquet(in_dir)
    turns.write.mode("append").parquet(in_dir)
    run_available_now(streaming_dedup_turns(spark, in_dir), ckpt, out_dir)

    # batch 2 (fresh run over the same checkpoint): re-deliver the 5
    # latest turns a third time — all are within the watermark of the
    # stream's max event time, so state must still know them
    late_keys = turns.orderBy(F.col("ts").desc()).limit(5)
    late_keys.write.mode("append").parquet(in_dir)
    run_available_now(streaming_dedup_turns(spark, in_dir), ckpt, out_dir)

    got = spark.read.parquet(out_dir)
    n_unique = turns.select("conv_id", "turn_idx").distinct().count()
    assert got.count() == n_unique
    assert (
        got.groupBy("conv_id", "turn_idx").count().filter("count > 1").count() == 0
    )


def test_streaming_seasonal_scorer_matches_batch(spark, tmp_path):
    """streaming_seasonal_scorer: stream-static scoring against the
    batch profile is exactly the batch scorer's output (the operator is
    stateless, so streaming adds no divergence)."""
    from python_vegindex_spark.operators.rate import (
        seasonal_deviation,
        seasonal_profile,
    )
    from python_vegindex_spark.sources.synth import synth_turns
    from python_vegindex_spark.streaming.structured import (
        run_available_now,
        streaming_seasonal_scorer,
    )

    in_dir = str(tmp_path / "turns_in")
    out_dir = str(tmp_path / "scored_out")
    ckpt = str(tmp_path / "ckpt")
    turns = synth_turns(spark, n_convs=60, seed=3)
    turns.write.parquet(in_dir)

    live = turns.select(
        "role", "conv_id", "turn_idx", "ts",
        F.expr("CAST(length(text) AS DOUBLE)").alias("v"),
    )
    prof = seasonal_profile(live, ["role"], value_col="v", round_to=None)
    expected = {
        (r["conv_id"], r["turn_idx"]): (r["z"], r["is_anomaly"])
        for r in seasonal_deviation(
            live, prof, ["role"], value_col="v",
            threshold=1.5, min_baseline=5,
        ).collect()
    }

    run_available_now(
        streaming_seasonal_scorer(
            spark, in_dir, prof, threshold=1.5, min_baseline=5
        ),
        ckpt,
        out_dir,
    )
    got = {
        (r["conv_id"], r["turn_idx"]): (r["z"], r["is_anomaly"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == expected
    assert any(flag for _, flag in got.values())  # the threshold bites
