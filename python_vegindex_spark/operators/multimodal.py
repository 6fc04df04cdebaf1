"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Training-data pipelines carry media as ``binary`` columns with metadata
structs; the Spark-side plumbing (schemas, batching, partition sizing,
UDF signatures) is what matters at 100 TB — the actual pixel/sample
decoding is library work (PIL/ffmpeg are NOT in this container and are
STUBBED behind ``media_decode_stub``; swap in a real decoder by passing
``decoder=`` to the stage builders). For uncompressed formats the stub
is not needed: ``codecs/images.decode_image`` (zero-dependency P6
PPM / 24-bit BMP, pure numpy) runs this stage for real —
tests/test_images.py drives it end to end.

The reference's analogous tier-0 step is exactly this shape: load JPEG,
apply mask, reduce to per-image stats (roitimeseries.py:97-227,394-553)
— a per-record decode + feature-extract we re-express as Arrow-batched
``mapInPandas`` stages.

Scale notes: media rows are fat — stages repartition by byte budget, not
row count; feature outputs are skinny and follow normal rollup paths.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def media_decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic fake decoder: derives a small feature-ready array
    from the payload bytes (sha256-seeded), so pipelines are testable
    end-to-end without PIL/ffmpeg. Raises for unknown kinds like a real
    decoder would."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for kind={kind!r}")
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    n = {"image": 64, "audio": 128, "video": 96}[kind]
    return rng.random(n, dtype=np.float64)


def synth_media(spark, n: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic fake media table with realistic fat-row shape.

    ``kind`` and ``payload`` (the only inputs to the decode stage) are
    reproducible in pure Python — ``["image","audio","video"][id % 3]``
    and the UTF-8 bytes of ``sha256(f"payload{id}").hexdigest()`` — so a
    test oracle can recompute the expected decode features independently
    of Spark."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(1920)) + 16).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(1080)) + 16).cast("int").alias("height"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 3)), F.lit(60000))).cast("int").alias("duration_ms"),
        F.sha2(F.concat(F.lit("payload"), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("payload"),
    )


def repartition_by_bytes(
    df: DataFrame,
    size_col_expr=None,
    target_bytes: int = 128 * 1024 * 1024,
    total_bytes: int | None = None,
) -> DataFrame:
    """Partition fat-row tables by a byte budget instead of row count:
    repartitions so each task holds ~target_bytes of media.

    Pass ``total_bytes`` when known (e.g. from table/file metadata) to
    skip the sizing scan — otherwise this runs ONE eager pass over the
    size column and the repartition recomputes the lineage, so for
    file-backed tables prefer metadata or tune
    ``spark.sql.files.maxPartitionBytes`` at the scan instead. Round-robin
    balances rows, not bytes: with wildly mixed payload sizes (KB images
    next to GB videos) split oversized payloads upstream or sort-by-size
    first; the budget here bounds the AVERAGE task, not the max.
    """
    if total_bytes is None:
        size_col = size_col_expr if size_col_expr is not None else F.length("payload")
        total_bytes = df.agg(F.sum(size_col)).collect()[0][0] or 0
    parts = max(1, int(total_bytes // target_bytes) + 1)
    return df.repartition(parts)


def extract_media_features(
    df: DataFrame,
    decoder: Callable[[bytes, str], np.ndarray] = media_decode_stub,
    out_dim: int = 16,
) -> DataFrame:
    """mapInPandas stage: decode -> fixed-dim feature vector + stats.

    Output is skinny: (media_id, kind, feat: array<double>, feat_mean,
    feat_std) — ready for the rollup/similarity operators.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("feat", T.ArrayType(T.DoubleType())),
            T.StructField("feat_mean", T.DoubleType()),
            T.StructField("feat_std", T.DoubleType()),
        ]
    )

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, means, stds = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                # null payload / empty decode -> null feature row, not a
                # task failure (one corrupt record must not kill the job)
                arr = None
                if payload is not None:
                    arr = decoder(bytes(payload), kind)
                if arr is None or arr.size == 0:
                    feats.append(None)
                    means.append(None)
                    stds.append(None)
                    continue
                # resize/pool to fixed dim (the real resize happens in the
                # decoder for images; this is the shape contract)
                pooled = np.interp(
                    np.linspace(0, len(arr) - 1, out_dim), np.arange(len(arr)), arr
                )
                feats.append(pooled.tolist())
                means.append(float(arr.mean()))
                stds.append(float(arr.std()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "feat": feats,
                    "feat_mean": means,
                    "feat_std": stds,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(stage, out_schema)


def sample_video_frames(
    df: DataFrame,
    every_ms: int = 1000,
) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    frame offset (JVM-side explode of the offset lattice; the frame
    decode itself is the stubbed decoder's job downstream)."""
    return (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ms",
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
                )
            ),
        )
        .select("media_id", "frame_ms", "payload")
    )
