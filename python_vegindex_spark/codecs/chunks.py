"""Chunked columnar compression: turns <-> binary chunk tables.

The north_rule storage layer: per (series, ts-bucket) chunk rows holding
delta-of-delta-compressed timestamps and Gorilla-XOR-compressed values
as binary columns, with chunk stats (n_points, first/last ts) for
pruning. FIXTURES.md §4 schema.

Execution shape:
* encode — one shuffle on (series, bucket) into grouped applyInPandas;
  each Arrow batch is encoded with vectorized numpy (codecs/gorilla.py).
  Group size is bounded by the bucket length, so executor memory is
  bounded regardless of how hot a series is.
* decode — mapInPandas: each chunk row explodes independently; no
  shuffle at all. Decoded rows feed the rollup operators unchanged.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.buckets import bucket_start
from .gorilla import (
    decode_floats,
    decode_timestamps,
    encode_floats,
    encode_timestamps,
)

TS_CODEC = "delta-of-delta"
VAL_CODEC = "gorilla-xor"


def _chunk_schema(series_fields: list[T.StructField], bucket_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            *series_fields,
            T.StructField("bucket_start", bucket_type),
            T.StructField("n_points", T.IntegerType()),
            T.StructField("first_ts", T.TimestampType()),
            T.StructField("last_ts", T.TimestampType()),
            T.StructField("ts_codec", T.StringType()),
            T.StructField("val_codec", T.StringType()),
            T.StructField("ts_chunk", T.BinaryType()),
            T.StructField("val_chunk", T.BinaryType()),
        ]
    )


def encode_chunks(
    df: DataFrame,
    tier: str,
    series_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Compress (series, ts, value) rows into per-bucket chunks."""
    d = df.select(
        *series_cols,
        F.col(ts_col).cast("timestamp").alias("_ts"),
        F.col(value_col).cast("double").alias("_v"),
    ).withColumn("bucket_start", bucket_start(F.col("_ts"), tier))

    series_fields = [d.schema[c] for c in series_cols]
    bucket_type = d.schema["bucket_start"].dataType
    schema = _chunk_schema(series_fields, bucket_type)
    keys = [*series_cols, "bucket_start"]

    def encode_group(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ts", kind="stable")
        ts_us = pdf["_ts"].astype("datetime64[us]").astype("int64").to_numpy()
        vals = pdf["_v"].to_numpy(dtype=np.float64)
        row = {
            **{c: [key[i]] for i, c in enumerate(series_cols)},
            "bucket_start": [key[len(series_cols)]],
            "n_points": [len(pdf)],
            "first_ts": [pdf["_ts"].iloc[0]],
            "last_ts": [pdf["_ts"].iloc[-1]],
            "ts_codec": [TS_CODEC],
            "val_codec": [VAL_CODEC],
            "ts_chunk": [encode_timestamps(ts_us)],
            "val_chunk": [encode_floats(vals)],
        }
        return pd.DataFrame(row)

    return d.groupBy(*keys).applyInPandas(encode_group, schema)


def decode_chunks(
    chunks: DataFrame,
    series_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Explode chunk rows back into (series, ts, value) rows. No shuffle."""
    series_fields = [chunks.schema[c] for c in series_cols]
    out_schema = T.StructType(
        [
            *series_fields,
            T.StructField(ts_col, T.TimestampType()),
            T.StructField(value_col, T.DoubleType()),
        ]
    )
    cols = [*series_cols, "n_points", "ts_chunk", "val_chunk"]

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            outs = []
            for _, r in pdf.iterrows():
                n = int(r["n_points"])
                ts = decode_timestamps(bytes(r["ts_chunk"]), n)
                vs = decode_floats(bytes(r["val_chunk"]), n)
                part = pd.DataFrame(
                    {
                        **{c: np.repeat([r[c]], n) for c in series_cols},
                        ts_col: pd.to_datetime(ts, unit="us"),
                        value_col: vs,
                    }
                )
                outs.append(part)
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return chunks.select(*cols).mapInPandas(decode_batches, out_schema)
