"""Gorilla XOR + delta-of-delta codec properties and chunk round-trips."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from python_vegindex_spark.codecs.gorilla import (
    decode_floats,
    decode_timestamps,
    encode_floats,
    encode_timestamps,
)


@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        min_size=0,
        max_size=300,
    )
)
@settings(max_examples=200, deadline=None)
def test_float_roundtrip(xs):
    arr = np.array(xs, dtype=np.float64)
    out = decode_floats(encode_floats(arr), len(arr))
    # bit-exact, including NaN payloads and infinities
    np.testing.assert_array_equal(arr.view(np.uint64), out.view(np.uint64))


@given(
    st.lists(
        st.integers(min_value=0, max_value=10**15), min_size=0, max_size=300
    )
)
@settings(max_examples=200, deadline=None)
def test_timestamp_roundtrip(us):
    arr = np.sort(np.array(us, dtype=np.int64))
    out = decode_timestamps(encode_timestamps(arr), len(arr))
    np.testing.assert_array_equal(arr, out)


def test_timestamp_unsorted_and_negative_dod():
    # strictly valid inputs are sorted, but the codec is delta-based and
    # handles any sequence, including negative deltas
    arr = np.array([10**12, 10**12 + 5, 10**12 + 5, 10**12 - 3], dtype=np.int64)
    out = decode_timestamps(encode_timestamps(arr), len(arr))
    np.testing.assert_array_equal(arr, out)


def test_compression_ratio_regular_series():
    """Hourly-regular timestamps must compress to ~1 bit/point; smooth
    values compress well below 64 bits/point."""
    n = 10_000
    ts = np.arange(n, dtype=np.int64) * 3_600_000_000 + 1_700_000_000_000_000
    enc = encode_timestamps(ts)
    assert len(enc) * 8 < 64 + 64 + n * 1.1  # first + d0 + ~1 bit each
    # gauge-like series with long runs of repeats -> mostly '0' control bits
    vals = np.repeat(np.sin(np.arange(n // 20) / 5.0).round(2), 20)
    encv = encode_floats(vals)
    assert len(encv) * 8 < n * 8
    # arbitrary doubles stay near 64 bits/pt + small header overhead
    noisy = np.random.default_rng(0).normal(size=n)
    assert len(encode_floats(noisy)) * 8 < n * 78


def test_chunks_spark_roundtrip(spark):
    """encode_chunks -> decode_chunks == identity on (series, ts, value);
    rollups over decoded rows equal rollups over the original."""
    from pyspark.sql import functions as F

    from python_vegindex_spark.codecs.chunks import decode_chunks, encode_chunks
    from python_vegindex_spark.operators.generic_rollup import rollup_series

    rng = np.random.default_rng(3)
    n = 5000
    pdf = pd.DataFrame(
        {
            "series": np.repeat([f"s{i}" for i in range(10)], n // 10),
            "ts": pd.to_datetime(
                np.sort(rng.integers(1_700_000_000_000_000, 1_700_400_000_000_000, n)),
                unit="us",
            ),
            "value": np.round(rng.normal(size=n), 4),
        }
    )
    df = spark.createDataFrame(pdf)
    chunks = encode_chunks(df, tier="hourly", series_cols=["series"])
    back = decode_chunks(chunks, series_cols=["series"]).toPandas()

    a = pdf.sort_values(["series", "ts", "value"]).reset_index(drop=True)
    b = back.sort_values(["series", "ts", "value"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns.tolist()], check_exact=True)

    # chunk stats are prunable metadata
    c = chunks.toPandas()
    assert (c["n_points"] >= 1).all()
    assert (c["first_ts"] <= c["last_ts"]).all()
    total_chunk_bytes = (c["ts_chunk"].str.len() + c["val_chunk"].str.len()).sum()
    # random 4dp normals are near-incompressible for XOR floats; the ts
    # stream still wins big, keeping total near raw (ts,value)=16 B/point.
    # Realistic repeating gauges are covered in the ratio test above.
    assert total_chunk_bytes < n * 18

    r1 = (
        rollup_series(df, "hourly", ["series"])
        .toPandas().sort_values(["series", "bucket_start"]).reset_index(drop=True)
    )
    r2 = (
        rollup_series(
            decode_chunks(chunks, series_cols=["series"]), "hourly", ["series"]
        )
        .toPandas().sort_values(["series", "bucket_start"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(r1, r2)


def test_chunks_null_series_key_spans_arrow_batches(spark):
    """A group whose series key contains NULL must still emit exactly ONE
    chunk row when its rows span Arrow batch boundaries (the tail
    holdback comparison has to be null-safe: `col == None` is all-False
    and would flush the group early, duplicating its (series, bucket)
    key)."""
    from python_vegindex_spark.codecs.chunks import decode_chunks, encode_chunks

    n = 40  # one bucket, one (null) series -> must become one chunk row
    pdf = pd.DataFrame(
        {
            "series": ["s0"] * n,
            "tool": [None] * n,
            "ts": pd.to_datetime(
                1_700_000_000_000_000 + np.arange(n) * 1_000_000, unit="us"
            ),
            "value": np.round(np.linspace(0.0, 1.0, n), 4),
        }
    )
    df = spark.createDataFrame(pdf).repartition(1)
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        chunks = encode_chunks(
            df, tier="hourly", series_cols=["series", "tool"]
        ).toPandas()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    assert len(chunks) == 1, chunks[["series", "tool", "n_points"]]
    assert int(chunks["n_points"].iloc[0]) == n


def test_decode_chunks_range_prunes_before_python(spark, tmp_path):
    """Zone-map read path: a time-range decode drops whole chunks with a
    JVM filter before mapInPandas (pushed into the parquet scan), and
    the result is exactly the full decode filtered by ts."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from python_vegindex_spark.codecs.chunks import decode_chunks, encode_chunks

    t0 = datetime(2024, 1, 1)
    rows = [
        ("s", t0 + timedelta(hours=h, minutes=m), float(h * 100 + m))
        for h in range(6)
        for m in range(0, 60, 15)
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "value"])
    path = str(tmp_path / "chunks")
    encode_chunks(df, tier="hourly", series_cols=["k"]).write.parquet(path)
    chunks = spark.read.parquet(path)

    lo, hi = t0 + timedelta(hours=2, minutes=10), t0 + timedelta(hours=3, minutes=50)
    pruned = decode_chunks(chunks, ["k"], ts_min=lo, ts_max=hi)
    got = sorted((r["ts"], r["value"]) for r in pruned.collect())
    want = sorted((t, v) for _, t, v in rows if lo <= t <= hi)
    assert got == want and len(got) == 7

    # chunk-level pruning really happened: only 2 of 6 hourly chunks
    # survive the stats filter
    survivors = chunks.where(
        (F.col("last_ts") >= F.lit(lo)) & (F.col("first_ts") <= F.lit(hi))
    )
    assert chunks.count() == 6 and survivors.count() == 2

    # and the predicate reached the parquet scan
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "last_ts" in plan, plan
