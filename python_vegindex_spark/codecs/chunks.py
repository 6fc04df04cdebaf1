"""Chunked columnar compression: turns <-> binary chunk tables.

The north_rule storage layer: per (series, ts-bucket) chunk rows holding
delta-of-delta-compressed timestamps and Gorilla-XOR-compressed values
as binary columns, with chunk stats (n_points, first/last ts) for
pruning. FIXTURES.md §4 schema.

Execution shape — chosen after measuring the naive grouped
applyInPandas at ~10 ms/group of fixed overhead (arrow roundtrip +
per-group pandas frame), catastrophic for small chunks:

* encode — ``repartition(series, bucket)`` + ``sortWithinPartitions`` +
  ``mapInPandas``. Each Arrow batch carries MANY groups; groups are
  contiguous after the sort, so the encoder slices them with one
  factorize pass and stitches the (possibly split) trailing group into
  the next batch. Hash partitioning guarantees a group never spans
  partitions. One shuffle; per-group cost is just the two numpy encodes.
* decode — ``mapInPandas``: each chunk row explodes independently; no
  shuffle. Decoded rows feed the rollup operators unchanged.
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
    encode_floats_grouped,
    encode_timestamps_grouped,
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

    keys = [*series_cols, "bucket_start"]
    series_fields = [d.schema[c] for c in series_cols]
    bucket_type = d.schema["bucket_start"].dataType
    schema = _chunk_schema(series_fields, bucket_type)

    d = d.repartition(*[F.col(k) for k in keys]).sortWithinPartitions(
        *[F.col(k) for k in keys], F.col("_ts")
    )

    def _encode_block(pdf: pd.DataFrame) -> pd.DataFrame:
        """Encode a frame of WHOLE groups (already key-sorted)."""
        codes, _ = pd.factorize(
            pd.MultiIndex.from_frame(pdf[keys]) if len(keys) > 1 else pdf[keys[0]]
        )
        # groups are contiguous: boundaries where code changes
        starts = np.flatnonzero(np.diff(codes, prepend=codes[0] - 1))
        ends = np.append(starts[1:], len(pdf))
        ts_us = pdf["_ts"].astype("datetime64[us]").astype("int64").to_numpy()
        vals = pdf["_v"].to_numpy(dtype=np.float64)
        ts_dt = pdf["_ts"].to_numpy()
        out = {
            **{c: pdf[c].to_numpy()[starts] for c in keys},
            "n_points": (ends - starts).astype("int32"),
            "first_ts": ts_dt[starts],
            "last_ts": ts_dt[ends - 1],
            "ts_codec": np.repeat(TS_CODEC, len(starts)),
            "val_codec": np.repeat(VAL_CODEC, len(starts)),
            # one vectorized numpy pass + one packbits for ALL groups in
            # the block (per-group python calls were the dominant cost)
            "ts_chunk": encode_timestamps_grouped(ts_us, starts, ends),
            "val_chunk": encode_floats_grouped(vals, starts, ends),
        }
        return pd.DataFrame(out)

    def encode_stream(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pending: pd.DataFrame | None = None
        for pdf in batches:
            if pending is not None and len(pending):
                pdf = pd.concat([pending, pdf], ignore_index=True)
                pending = None
            if len(pdf) == 0:
                continue
            # hold back the trailing (possibly incomplete) group
            # (null-safe: `col == None` is all-False, which would flush a
            # group whose key contains a NULL while its rows are still
            # arriving — emitting duplicate (series, bucket) chunk rows)
            last_mask = np.ones(len(pdf), dtype=bool)
            tail_key = tuple(pdf.iloc[-1][k] for k in keys)
            for k, kv in zip(keys, tail_key):
                col = pdf[k]
                eq = col.isna() if pd.isna(kv) else (col == kv)
                last_mask &= eq.to_numpy(dtype=bool)
            if last_mask.all():
                pending = pdf
                continue
            # trailing group rows are contiguous at the end (sorted input):
            # tail size = count of leading Trues in the reversed mask
            n_tail = int(last_mask[::-1].argmin())
            first_tail = len(pdf) - n_tail
            pending = pdf.iloc[first_tail:]
            head = pdf.iloc[:first_tail]
            if len(head):
                yield _encode_block(head)
        if pending is not None and len(pending):
            yield _encode_block(pending)

    return d.mapInPandas(encode_stream, schema)


def decode_chunks(
    chunks: DataFrame,
    series_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    ts_min=None,
    ts_max=None,
) -> DataFrame:
    """Explode chunk rows back into (series, ts, value) rows. No shuffle.

    ``ts_min``/``ts_max`` (inclusive bounds, timestamp-castable) turn
    the chunk stats into ZONE MAPS: chunks whose ``[first_ts, last_ts]``
    span misses the range are dropped by a JVM filter BEFORE the Python
    decode stage — and, when the chunk table comes off parquet, the
    predicate pushes into the scan (PushedFilters on first_ts/last_ts),
    so pruned chunks are never even read. The 100-TB read path: a
    narrow time-range query over a year of chunks decodes only the
    touched buckets. Rows are then exact-filtered on the decoded ts
    (chunk edges overlap the bounds).
    """
    if ts_min is not None:
        chunks = chunks.where(F.col("last_ts") >= F.lit(ts_min).cast("timestamp"))
    if ts_max is not None:
        chunks = chunks.where(F.col("first_ts") <= F.lit(ts_max).cast("timestamp"))
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
            ns = pdf["n_points"].to_numpy()
            ts_parts, v_parts = [], []
            for n, tb, vb in zip(ns, pdf["ts_chunk"], pdf["val_chunk"]):
                n = int(n)
                ts_parts.append(decode_timestamps(bytes(tb), n))
                v_parts.append(decode_floats(bytes(vb), n))
            out = pd.DataFrame(
                {
                    **{
                        c: np.repeat(pdf[c].to_numpy(), ns)
                        for c in series_cols
                    },
                    ts_col: pd.to_datetime(np.concatenate(ts_parts), unit="us"),
                    value_col: np.concatenate(v_parts),
                }
            )
            yield out

    out = chunks.select(*cols).mapInPandas(decode_batches, out_schema)
    if ts_min is not None:
        out = out.where(F.col(ts_col) >= F.lit(ts_min).cast("timestamp"))
    if ts_max is not None:
        out = out.where(F.col(ts_col) <= F.lit(ts_max).cast("timestamp"))
    return out
