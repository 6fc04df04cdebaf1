"""Streaming chunk encoder: closed buckets stream out as Gorilla chunks
byte-compatible with the batch codec (codecs/chunks.py)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from python_vegindex_spark.codecs.chunks import decode_chunks, encode_chunks
from python_vegindex_spark.sources.synth import synth_turns
from python_vegindex_spark.streaming.structured import (
    run_available_now,
    streaming_chunk_encoder,
)


def test_streaming_chunks_match_batch_encoder(spark, tmp_path):
    turns = synth_turns(spark, n_convs=30, seed=5, span_days=30)
    in_dir = str(tmp_path / "stream_in")
    out_dir = str(tmp_path / "chunks_out")
    ckpt = str(tmp_path / "ckpt")

    first = turns.filter(F.col("ts") < "2023-12-10")
    rest = turns.filter(F.col("ts") >= "2023-12-10")
    first.write.mode("overwrite").parquet(in_dir)
    run_available_now(streaming_chunk_encoder(spark, in_dir), ckpt, out_dir)
    rest.write.mode("append").parquet(in_dir)
    run_available_now(streaming_chunk_encoder(spark, in_dir), ckpt, out_dir)

    chunks = spark.read.parquet(out_dir)
    # a bucket emits exactly once, when the watermark passes its end
    assert chunks.groupBy("conv_id", "bucket_start").count().filter(
        F.col("count") > 1
    ).count() == 0

    max_ts = turns.agg(F.max("ts")).collect()[0][0]
    cutoff = max_ts - dt.timedelta(hours=2)
    closed = chunks.filter(
        F.col("bucket_start") + F.expr("INTERVAL 1 HOUR") <= F.lit(cutoff)
    )

    # 1) decoded streaming chunks == the raw input points of those buckets
    got_pts = (
        decode_chunks(closed, ["conv_id"])
        .groupBy("conv_id", F.date_trunc("hour", "ts").alias("b"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sv"),
            F.min("ts").alias("t0"),
            F.max("ts").alias("t1"),
        )
        .toPandas()
    )
    exp_pts = (
        turns.select(
            "conv_id", "ts", F.length("text").cast("double").alias("value")
        )
        .withColumn("b", F.date_trunc("hour", "ts"))
        .filter(F.col("b") + F.expr("INTERVAL 1 HOUR") <= F.lit(cutoff))
        .groupBy("conv_id", "b")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sv"),
            F.min("ts").alias("t0"),
            F.max("ts").alias("t1"),
        )
        .toPandas()
    )
    g = got_pts.sort_values(["conv_id", "b"]).reset_index(drop=True)
    e = exp_pts.sort_values(["conv_id", "b"]).reset_index(drop=True)
    assert len(g) == len(e) > 0
    pd.testing.assert_frame_equal(g, e[g.columns.tolist()])

    # 2) byte parity with the batch encoder on the same closed buckets
    batch = encode_chunks(
        turns.select(
            "conv_id", "ts", F.length("text").cast("double").alias("value")
        ),
        tier="hourly",
        series_cols=["conv_id"],
    ).filter(F.col("bucket_start") + F.expr("INTERVAL 1 HOUR") <= F.lit(cutoff))
    sb = (
        closed.select("conv_id", "bucket_start", "n_points", "ts_chunk", "val_chunk")
        .toPandas()
        .sort_values(["conv_id", "bucket_start"])
        .reset_index(drop=True)
    )
    bb = (
        batch.select("conv_id", "bucket_start", "n_points", "ts_chunk", "val_chunk")
        .toPandas()
        .sort_values(["conv_id", "bucket_start"])
        .reset_index(drop=True)
    )
    assert len(sb) == len(bb)
    assert (sb["n_points"] == bb["n_points"]).all()
    assert all(
        bytes(a) == bytes(b) for a, b in zip(sb["ts_chunk"], bb["ts_chunk"])
    )
    assert all(
        bytes(a) == bytes(b) for a, b in zip(sb["val_chunk"], bb["val_chunk"])
    )


def test_streaming_chunk_encoder_rejects_doy_tiers(spark):
    import pytest

    with pytest.raises(ValueError, match="batch-only"):
        streaming_chunk_encoder(spark, "/nonexistent", tier="3day")


def test_streaming_daily_bucket_is_date_like_batch(spark, tmp_path):
    """Daily-tier streaming chunks must carry DateType bucket_start like
    the batch encoder (buckets.bucket_start: nday==1 -> to_date), so the
    two outputs union/append onto one table."""
    import pandas as pd
    from pyspark.sql import types as T

    in_dir = str(tmp_path / "turns_in")
    pdf = pd.DataFrame(
        {
            "conv_id": ["c"],
            "turn_idx": [0],
            "role": ["user"],
            "text": ["x"],
            "tool": [""],
            "ts": pd.to_datetime(["2026-01-01 10:00:00"]),
        }
    )
    spark.createDataFrame(pdf).write.parquet(in_dir)
    enc = streaming_chunk_encoder(spark, in_dir, tier="daily")
    assert isinstance(enc.schema["bucket_start"].dataType, T.DateType)
    enc_h = streaming_chunk_encoder(spark, in_dir, tier="hourly")
    assert isinstance(enc_h.schema["bucket_start"].dataType, T.TimestampType)


def test_streaming_minute_tier_byte_parity_with_batch(spark, tmp_path):
    """15min streaming windows sit on the same epoch-anchored lattice as
    batch buckets.tier_minutes — closed chunks are byte-identical."""
    turns = synth_turns(spark, n_convs=8, seed=9, span_days=2)
    in_dir = str(tmp_path / "m_in")
    out_dir = str(tmp_path / "m_out")
    ckpt = str(tmp_path / "m_ckpt")
    turns.write.mode("overwrite").parquet(in_dir)
    run_available_now(
        streaming_chunk_encoder(spark, in_dir, tier="15min"), ckpt, out_dir
    )
    chunks = spark.read.parquet(out_dir)
    max_ts = turns.agg(F.max("ts")).collect()[0][0]
    cutoff = max_ts - dt.timedelta(hours=2)
    closed = chunks.filter(
        F.col("bucket_start") + F.expr("INTERVAL 15 MINUTES") <= F.lit(cutoff)
    )
    batch = encode_chunks(
        turns.select(
            "conv_id", "ts", F.length("text").cast("double").alias("value")
        ),
        tier="15min",
        series_cols=["conv_id"],
    ).filter(
        F.col("bucket_start") + F.expr("INTERVAL 15 MINUTES") <= F.lit(cutoff)
    )
    sb = (
        closed.select("conv_id", "bucket_start", "n_points", "ts_chunk", "val_chunk")
        .toPandas()
        .sort_values(["conv_id", "bucket_start"])
        .reset_index(drop=True)
    )
    bb = (
        batch.select("conv_id", "bucket_start", "n_points", "ts_chunk", "val_chunk")
        .toPandas()
        .sort_values(["conv_id", "bucket_start"])
        .reset_index(drop=True)
    )
    assert len(sb) == len(bb) > 0
    assert (sb["n_points"] == bb["n_points"]).all()
    assert all(bytes(a) == bytes(b) for a, b in zip(sb["ts_chunk"], bb["ts_chunk"]))
    assert all(bytes(a) == bytes(b) for a, b in zip(sb["val_chunk"], bb["val_chunk"]))


def test_streaming_ohlc_matches_batch_bars(spark, tmp_path):
    """Every bucket the stream closes must be row-identical to the batch
    ohlc_bars over the same input (same struct-min/max expressions)."""
    from python_vegindex_spark.operators.bars import ohlc_bars
    from python_vegindex_spark.streaming.structured import streaming_ohlc_bars

    turns = synth_turns(spark, n_convs=20, seed=9, span_days=20)
    in_dir = str(tmp_path / "ohlc_in")
    out_dir = str(tmp_path / "ohlc_out")
    ckpt = str(tmp_path / "ohlc_ckpt")

    first = turns.filter(F.col("ts") < "2023-12-08")
    rest = turns.filter(F.col("ts") >= "2023-12-08")
    first.write.mode("overwrite").parquet(in_dir)
    run_available_now(streaming_ohlc_bars(spark, in_dir), ckpt, out_dir)
    rest.write.mode("append").parquet(in_dir)
    run_available_now(streaming_ohlc_bars(spark, in_dir), ckpt, out_dir)

    got = spark.read.parquet(out_dir)
    # exactly-once per bucket
    assert got.groupBy("conv_id", "bucket_start").count().filter(
        F.col("count") > 1
    ).count() == 0
    assert got.count() > 0

    batch = ohlc_bars(
        turns.select(
            "conv_id", "ts", "turn_idx",
            F.length("text").cast("long").alias("v"),
        ),
        "hourly",
        ["conv_id"],
        value_col="v",
        order_cols=["turn_idx"],
        round_to=None,
    ).select("conv_id", "bucket_start", "n", "open", "high", "low", "close")

    cols = ["conv_id", "bucket_start", "n", "open", "high", "low", "close"]
    g = got.select(*cols).toPandas().sort_values(cols[:2]).reset_index(drop=True)
    # streaming emits only watermark-closed buckets: compare that subset
    b = (
        batch.toPandas()
        .merge(g[["conv_id", "bucket_start"]], on=["conv_id", "bucket_start"])
        .sort_values(cols[:2])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(g, b[cols], check_dtype=False)


def test_streaming_hll_registers_match_batch(spark, tmp_path):
    """Every bucket the stream closes must hold registers row-identical
    to batch hll_registers over the same input — the distinct sketch is
    EXACT under streaming (max state), not an approximation."""
    from python_vegindex_spark.operators.sketches import hll_registers
    from python_vegindex_spark.streaming.structured import (
        run_available_now,
        streaming_hll_registers,
    )

    turns = synth_turns(spark, n_convs=40, seed=11, span_days=14)
    in_dir = str(tmp_path / "hll_in")
    out_dir = str(tmp_path / "hll_out")
    ckpt = str(tmp_path / "hll_ckpt")

    first = turns.filter(F.col("ts") < "2023-12-05")
    rest = turns.filter(F.col("ts") >= "2023-12-05")
    first.write.mode("overwrite").parquet(in_dir)
    run_available_now(
        streaming_hll_registers(spark, in_dir, tier="hourly", b=5),
        ckpt,
        out_dir,
    )
    rest.write.mode("append").parquet(in_dir)
    run_available_now(
        streaming_hll_registers(spark, in_dir, tier="hourly", b=5),
        ckpt,
        out_dir,
    )

    got = spark.read.parquet(out_dir)
    assert got.count() > 0
    # exactly-once per (bucket_start, bucket)
    assert (
        got.groupBy("bucket_start", "bucket")
        .count()
        .filter(F.col("count") > 1)
        .count()
        == 0
    )
    batch = hll_registers(
        turns.select(
            F.date_trunc("hour", "ts").alias("bucket_start"), "conv_id"
        ),
        "conv_id",
        ["bucket_start"],
        b=5,
    )
    cols = ["bucket_start", "bucket", "reg"]
    g = got.select(*cols).toPandas().sort_values(cols).reset_index(drop=True)
    closed = [r["bucket_start"] for r in got.select("bucket_start").distinct().collect()]
    b_ = (
        batch.filter(F.col("bucket_start").isin(closed))
        .select(*cols)
        .toPandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(g, b_)


def test_streaming_cms_counters_match_batch(spark, tmp_path):
    """Closed-bucket CMS counters from the stream must be row-identical
    to batch cms_build over the same input (sum state is exact)."""
    from python_vegindex_spark.operators.sketches import cms_build
    from python_vegindex_spark.streaming.structured import (
        run_available_now,
        streaming_cms_counters,
    )

    turns = synth_turns(spark, n_convs=30, seed=3, span_days=10)
    in_dir = str(tmp_path / "cms_in")
    out_dir = str(tmp_path / "cms_out")
    ckpt = str(tmp_path / "cms_ckpt")

    first = turns.filter(F.col("ts") < "2023-12-04")
    rest = turns.filter(F.col("ts") >= "2023-12-04")
    first.write.mode("overwrite").parquet(in_dir)
    run_available_now(
        streaming_cms_counters(spark, in_dir, depth=3, width=64),
        ckpt,
        out_dir,
    )
    rest.write.mode("append").parquet(in_dir)
    run_available_now(
        streaming_cms_counters(spark, in_dir, depth=3, width=64),
        ckpt,
        out_dir,
    )

    got = spark.read.parquet(out_dir)
    assert got.count() > 0
    assert (
        got.groupBy("bucket_start", "row_idx", "col_idx")
        .count()
        .filter(F.col("count") > 1)
        .count()
        == 0
    )
    batch = cms_build(
        turns.select(
            F.date_trunc("hour", "ts").alias("bucket_start"), "conv_id"
        ),
        "conv_id",
        ["bucket_start"],
        depth=3,
        width=64,
    )
    cols = ["bucket_start", "row_idx", "col_idx", "counter"]
    g = got.select(*cols).toPandas().sort_values(cols).reset_index(drop=True)
    closed = [
        r["bucket_start"]
        for r in got.select("bucket_start").distinct().collect()
    ]
    b = (
        batch.filter(F.col("bucket_start").isin(closed))
        .select(*cols)
        .toPandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(g, b)
