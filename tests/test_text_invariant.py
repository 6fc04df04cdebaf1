"""The driver contract's per-row invariant: per-turn TEXT equality
under stable (conv_id, turn_idx) ordering.

The reference engine never mutates its raw inputs (the image archive is
read-only; tiers 1+ are derived tables — utils.py:103-213 scans, never
rewrites). The Spark engine's analogous promise is that every layer that
touches raw turns — bronze write/read (partitioned parquet), TableIO
upsert — preserves the ``text`` payload byte-for-byte, and that
(conv_id, turn_idx) is a stable unique ordering key throughout.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from python_vegindex_spark.sources import tableio
from python_vegindex_spark.sources.bronze import read_turns
from python_vegindex_spark.sources.synth import synth_turns, write_turns

EDGE_ROWS = [
    # (conv_id, turn_idx, role, text, tool, ts) — adversarial payloads:
    # unicode, embedded newline/tab/CR, quotes, empty string, long run.
    ("edge_000001", 0, "user", "café — naïve 日本語 \U0001f600", None, "2024-03-01 10:00:00"),
    ("edge_000001", 1, "assistant", "line one\nline two\ttabbed\rcarriage", "search", "2024-03-01 10:00:30"),
    ("edge_000001", 2, "user", 'quotes "double" \'single\' `back` ,comma', None, "2024-03-01 10:01:00"),
    ("edge_000001", 3, "assistant", "", None, "2024-03-01 10:01:30"),
    ("edge_000001", 4, "user", "x" * 10_000, None, "2024-03-01 10:02:00"),
]


def _edge_df(spark):
    return spark.createDataFrame(
        EDGE_ROWS,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))


def _ordered_rows(df):
    return [
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in df.select("conv_id", "turn_idx", "text")
        .orderBy("conv_id", "turn_idx")
        .collect()
    ]


def test_bronze_text_roundtrip(spark, tmp_path):
    """write_turns -> read_turns preserves every text payload exactly,
    including unicode / control-char / empty / 10k-char edge rows, and
    (conv_id, turn_idx) stays a unique stable key."""
    src = synth_turns(spark, n_convs=40, seed=11).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    ).unionByName(_edge_df(spark))
    path = str(tmp_path / "turns")
    write_turns(src, path)

    got = read_turns(spark, path)
    expected = _ordered_rows(src)
    actual = _ordered_rows(got)
    assert len(actual) == len(expected)
    assert actual == expected  # text equality under stable ordering

    # (conv_id, turn_idx) is unique — ordering is total and stable
    n = got.count()
    assert got.select("conv_id", "turn_idx").distinct().count() == n


def test_bronze_pruned_read_is_order_stable_subset(spark, tmp_path):
    """A time-bounded read (partition-pruned) returns exactly the
    source rows in-bounds, with identical text, in the same stable
    order — pruning never clips or reorders payloads."""
    src = synth_turns(spark, n_convs=40, seed=11).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    path = str(tmp_path / "turns")
    write_turns(src, path)

    lo, hi = "2024-02-01 00:00:00", "2024-06-01 00:00:00"
    got = read_turns(spark, path, lo, hi)
    expected = _ordered_rows(
        src.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
    )
    assert _ordered_rows(got) == expected
    assert len(expected) > 0  # the window actually selects rows


def test_upsert_preserves_untouched_text(spark, tmp_path):
    """TableIO upsert keyed on (conv_id, turn_idx): rows NOT in the
    update batch keep byte-identical text; updated rows carry the new
    text — the MERGE surface never rewrites payloads it didn't match."""
    src = _edge_df(spark)
    path = str(tmp_path / "tbl")
    tableio.overwrite(src, path)

    updates = spark.createDataFrame(
        [("edge_000001", 1, "assistant", "REPLACED", "search",
          "2024-03-01 10:00:30")],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    tableio.upsert(spark, updates, path, keys=["conv_id", "turn_idx"])

    got = {
        (c, i): t for c, i, t in _ordered_rows(tableio.read(spark, path))
    }
    for conv_id, turn_idx, _role, text, _tool, _ts in EDGE_ROWS:
        want = "REPLACED" if turn_idx == 1 else text
        assert got[(conv_id, turn_idx)] == want
