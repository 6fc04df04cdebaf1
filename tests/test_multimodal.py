"""Multimodal plumbing: schema, batching, stub decode, frame sampling."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from python_vegindex_spark.operators.multimodal import (
    extract_media_features,
    media_decode_stub,
    repartition_by_bytes,
    sample_video_frames,
    synth_media,
)


def test_stub_decoder_deterministic():
    a = media_decode_stub(b"abc", "image")
    b = media_decode_stub(b"abc", "image")
    np.testing.assert_array_equal(a, b)
    assert len(media_decode_stub(b"abc", "audio")) == 128
    with pytest.raises(NotImplementedError):
        media_decode_stub(b"abc", "pdf")


def test_feature_extraction(spark):
    media = synth_media(spark, n=120)
    feats = extract_media_features(media).toPandas()
    assert len(feats) == 120
    assert feats["feat"].map(len).eq(16).all()
    assert feats["feat_mean"].between(0, 1).all()
    # deterministic across runs
    feats2 = extract_media_features(synth_media(spark, n=120)).toPandas()
    a = feats.sort_values("media_id").reset_index(drop=True)
    b = feats2.sort_values("media_id").reset_index(drop=True)
    assert (a["feat_mean"] == b["feat_mean"]).all()


def test_repartition_by_bytes(spark):
    media = synth_media(spark, n=200)
    out = repartition_by_bytes(media, target_bytes=2048)
    assert out.rdd.getNumPartitions() > 1
    assert out.count() == 200


def test_frame_sampling(spark):
    media = synth_media(spark, n=100)
    frames = sample_video_frames(media, every_ms=5000)
    pdf = frames.toPandas()
    vids = media.filter(F.col("kind") == "video").toPandas()
    assert set(pdf["media_id"]) == set(vids["media_id"])
    per = pdf.groupby("media_id")["frame_ms"].agg(["min", "max", "count"])
    assert (per["min"] == 0).all()
    dur = vids.set_index("media_id")["duration_ms"]
    expected_counts = (np.maximum(dur - 1, 0) // 5000) + 1
    assert (per["count"] == expected_counts.loc[per.index]).all()


def test_null_payload_yields_null_features(spark):
    """Regression: a NULL payload (or an empty decode) must produce a
    null feature row, not fail the whole Spark task."""
    media = synth_media(spark, n=6).withColumn(
        "payload",
        F.when(F.col("media_id") % 3 == 0, F.lit(None).cast("binary")).otherwise(
            F.col("payload")
        ),
    )
    empty_for_audio = lambda p, k: (
        np.array([]) if k == "audio" else media_decode_stub(p, k)
    )
    feats = (
        extract_media_features(media, decoder=empty_for_audio)
        .toPandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert len(feats) == 6
    nulled = feats["media_id"].mod(3).eq(0) | feats["kind"].eq("audio")
    assert feats.loc[nulled, "feat_mean"].isna().all()
    assert feats.loc[nulled, "feat"].isna().all()
    assert feats.loc[~nulled, "feat_mean"].notna().all()
