"""Checkpoint-resume equivalence + retention compaction.

The engine invariant from the reference update scripts: an initial load
followed by any number of incremental runs must equal one full recompute
(update_summary_timeseries.py re-opens the last bucket and upserts —
here per conv, per tier).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from python_vegindex_spark.config import RollupConfig
from python_vegindex_spark.operators.features import turn_features
from python_vegindex_spark.operators.rollup import rollup
from python_vegindex_spark.sources import tableio
from python_vegindex_spark.sources.synth import synth_turns
from python_vegindex_spark.streaming.incremental import (
    RollupStore,
    compact_retention,
    incremental_rollup,
)


@pytest.fixture(scope="module")
def turns(spark):
    return synth_turns(spark, n_convs=60, seed=13, span_days=200).cache()


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    return (
        pdf.sort_values(["conv_id", "bucket_start"], kind="stable")
        .reset_index(drop=True)
        .sort_index(axis=1)
    )


@pytest.mark.parametrize("tier", ["daily", "weekly"])
def test_resume_equivalence(spark, turns, tier, tmp_path):
    from pyspark.sql import functions as F

    cfg = RollupConfig(tier=tier, nmin=2)
    store = RollupStore(str(tmp_path / f"store_{tier}"))

    cut1, cut2 = "2024-01-15", "2024-03-15"
    m1 = incremental_rollup(spark, turns.filter(F.col("ts") < cut1), store, cfg)
    m2 = incremental_rollup(spark, turns.filter(F.col("ts") < cut2), store, cfg)
    m3 = incremental_rollup(spark, turns, store, cfg)
    assert m1["rows_in"] > 0 and m2["rows_in"] > 0 and m3["rows_in"] > 0

    got = tableio.read(spark, store.gold(tier)).toPandas()
    exp = rollup(turn_features(turns), cfg).toPandas()
    g, e = _norm(got), _norm(exp)
    assert len(g) == len(e)
    pd.testing.assert_frame_equal(g, e[g.columns.tolist()], check_exact=False, rtol=1e-12)

    # idempotency: running again with no new data is a no-op
    m4 = incremental_rollup(spark, turns, store, cfg)
    assert m4["rows_in"] == 0

    # lineage recorded one row per run
    lin = tableio.read(spark, store.lineage).toPandas()
    assert len(lin) == 4
    assert set(lin["tier"]) == {tier}


def test_retention_compaction(spark, turns, tmp_path):
    from pyspark.sql import functions as F

    from python_vegindex_spark.codecs.chunks import encode_chunks
    from python_vegindex_spark.sources.synth import write_turns

    raw_path = str(tmp_path / "bronze")
    write_turns(turns, raw_path, partition_by_day=True)
    bronze = spark.read.parquet(raw_path)
    n0 = bronze.count()

    horizon = "2024-03-01"  # inside the data span: some days drop, some stay
    chunks = encode_chunks(
        bronze.withColumn("value", F.length("text").cast("double")),
        tier="hourly",
        series_cols=["conv_id"],
    ).cache()
    report = compact_retention(spark, raw_path, chunks, older_than=horizon)
    assert report["dropped_days"], "should drop verified old partitions"
    assert not report["kept_unverified"], report

    after = spark.read.parquet(raw_path)
    assert after.filter(F.col("ts_date") < horizon).count() == 0
    kept = after.count()
    dropped = n0 - kept
    assert dropped > 0 and kept > 0
    # every dropped row is still represented in chunk points
    total_points = chunks.agg(F.sum("n_points")).collect()[0][0]
    assert total_points == n0


def test_tableio_exists_ignores_stray_files(tmp_path):
    """A _temporary leftover from an interrupted write is NOT a table;
    read() must keep its missing-table -> None contract."""
    from python_vegindex_spark.sources import tableio

    p = tmp_path / "tbl"
    (p / "_temporary").mkdir(parents=True)
    assert not tableio.exists(str(p))
    (p / "part-000.parquet").write_bytes(b"")
    assert tableio.exists(str(p))


def test_tableio_upsert_does_not_leak_overwrite_mode(spark, tmp_path):
    """upsert's dynamic partition overwrite must be per-write: the
    session conf stays untouched, so later partitioned overwrites keep
    full-replace semantics."""
    import pandas as pd

    from python_vegindex_spark.sources import tableio

    key = "spark.sql.sources.partitionOverwriteMode"
    before = spark.conf.get(key, None)
    df = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2], "d": ["a", "b"], "v": [1.0, 2.0]})
    )
    path = str(tmp_path / "t")
    tableio.upsert(spark, df, path, keys=["k"], partition_by=["d"])
    upd = spark.createDataFrame(pd.DataFrame({"k": [2], "d": ["b"], "v": [9.0]}))
    tableio.upsert(spark, upd, path, keys=["k"], partition_by=["d"])
    assert spark.conf.get(key, None) == before
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: 1.0, 2: 9.0}
    # a later full overwrite really replaces: partition 'a' disappears
    repl = spark.createDataFrame(pd.DataFrame({"k": [3], "d": ["b"], "v": [7.0]}))
    tableio.overwrite(repl, path, partition_by=["d"])
    assert {r["k"] for r in spark.read.parquet(path).collect()} == {3}


def test_resume_equivalence_with_clock_skew(spark, tmp_path):
    """The lag-helper row must be the conv's max-TURN_IDX row (the lag
    window's ordering key), not its max-ts row: with clock-skewed turns
    (ts not monotonic in turn_idx) the two differ and the recomputed
    region's first latency delta would diverge from a full recompute."""
    import datetime as dt

    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # old region (before the watermark): turn 4's ts is EARLIER than
        # turn 3's (clock skew), so max-ts picks turn 3, max-turn_idx
        # picks turn 4 — only the latter matches turn_features' lag
        ("c", 0, "user", "a", "", t0),
        ("c", 1, "assistant", "bb", "", t0 + dt.timedelta(minutes=1)),
        ("c", 2, "user", "ccc", "", t0 + dt.timedelta(minutes=2)),
        ("c", 3, "assistant", "dddd", "", t0 + dt.timedelta(minutes=4)),
        ("c", 4, "user", "eeeee", "", t0 + dt.timedelta(minutes=3)),
        # new region: next day (so the daily bucket boundary separates it)
        ("c", 5, "assistant", "ffffff", "", t0 + dt.timedelta(days=1)),
        ("c", 6, "user", "ggggggg", "", t0 + dt.timedelta(days=1, minutes=2)),
    ]
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    turns = spark.createDataFrame(rows, schema)
    cfg = RollupConfig(tier="daily", nmin=1)
    store = RollupStore(str(tmp_path / "skew_store"))

    cut = t0 + dt.timedelta(hours=12)
    m1 = incremental_rollup(spark, turns.filter(F.col("ts") < F.lit(cut)), store, cfg)
    m2 = incremental_rollup(spark, turns, store, cfg)
    assert m1["rows_in"] == 5 and m2["rows_in"] == 2  # helpers never counted

    got = tableio.read(spark, store.gold("daily")).toPandas()
    exp = rollup(turn_features(turns), cfg).toPandas()
    g, e = _norm(got), _norm(exp)
    assert len(g) == len(e)
    pd.testing.assert_frame_equal(
        g, e[g.columns.tolist()], check_exact=False, rtol=1e-12
    )


def test_read_tiered_spans_retention_boundary(spark, turns, tmp_path):
    """read_tiered: after compaction a range query straddling the
    retention boundary reads old days from chunks + new days from raw
    and is value-identical to the ORIGINAL raw table over the range."""
    from pyspark.sql import functions as F

    from python_vegindex_spark.codecs.chunks import encode_chunks
    from python_vegindex_spark.sources.synth import write_turns
    from python_vegindex_spark.streaming.incremental import read_tiered

    raw_path = str(tmp_path / "bronze")
    write_turns(turns, raw_path, partition_by_day=True)
    original = (
        spark.read.parquet(raw_path)
        .select("conv_id", "ts", F.length("text").cast("double").alias("value"))
        .cache()
    )
    original.count()

    horizon = "2024-03-01"
    chunks = encode_chunks(
        spark.read.parquet(raw_path).withColumn(
            "value", F.length("text").cast("double")
        ),
        tier="hourly",
        series_cols=["conv_id"],
    ).cache()
    report = compact_retention(spark, raw_path, chunks, older_than=horizon)
    assert report["dropped_days"]

    lo, hi = "2024-02-10", "2024-04-10"  # straddles the boundary
    got = read_tiered(
        spark, raw_path, chunks, boundary=horizon, ts_min=lo, ts_max=hi
    )
    want = original.where((F.col("ts") >= lo) & (F.col("ts") < hi))
    a = sorted((r["conv_id"], r["ts"], r["value"]) for r in got.collect())
    b = sorted((r["conv_id"], r["ts"], r["value"]) for r in want.collect())
    assert a == b and len(a) > 0
    # both tiers actually contributed
    n_old = sum(1 for cid, t, v in a if str(t) < horizon)
    assert 0 < n_old < len(a)

    # range entirely on one side still works
    only_raw = read_tiered(
        spark, raw_path, chunks, boundary=horizon, ts_min="2024-03-05",
        ts_max="2024-03-20",
    )
    assert only_raw.count() == original.where(
        (F.col("ts") >= "2024-03-05") & (F.col("ts") < "2024-03-20")
    ).count()
    only_chunks = read_tiered(
        spark, raw_path, chunks, boundary=horizon, ts_min="2024-01-10",
        ts_max="2024-02-01",
    )
    assert only_chunks.count() == original.where(
        (F.col("ts") >= "2024-01-10") & (F.col("ts") < "2024-02-01")
    ).count()


def test_extend_chunks_incremental(spark, turns, tmp_path):
    """Two incremental chunk extensions ≡ one-shot encode (decoded rows
    identical); re-run is a no-op; the in-flight day is never encoded."""
    from pyspark.sql import functions as F

    from python_vegindex_spark.codecs.chunks import decode_chunks, encode_chunks
    from python_vegindex_spark.streaming.incremental import extend_chunks

    turns_path = str(tmp_path / "bronze")
    from python_vegindex_spark.sources.synth import write_turns

    write_turns(turns, turns_path)
    chunks_path = str(tmp_path / "chunks")
    cut1, cut2 = "2024-02-01 00:00:00", "2024-04-01 00:00:00"

    m1 = extend_chunks(spark, turns_path, chunks_path, through=cut1)
    m2 = extend_chunks(spark, turns_path, chunks_path, through=cut2)
    assert m1["chunks_added"] > 0 and m2["chunks_added"] > 0
    assert m1["hw_old"] is None and m2["hw_old"] is not None

    got = decode_chunks(
        tableio.read(spark, chunks_path), ["conv_id"]
    )
    src = turns.filter(F.to_date("ts") < F.to_date(F.lit(cut2))).select(
        "conv_id", "ts", F.expr("CAST(length(text) AS DOUBLE)").alias("value")
    )
    exp = decode_chunks(encode_chunks(src, "daily", ["conv_id"]), ["conv_id"])
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0

    # no duplicate (conv, day) chunks across the two extensions
    dup = (
        tableio.read(spark, chunks_path)
        .groupBy("conv_id", "bucket_start")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dup == 0

    # idempotent; in-flight day excluded
    m3 = extend_chunks(spark, turns_path, chunks_path, through=cut2)
    assert m3["chunks_added"] == 0
    assert (
        tableio.read(spark, chunks_path)
        .filter(F.col("bucket_start") >= F.to_date(F.lit(cut2)))
        .count()
        == 0
    )


def test_tableio_compact_small_files(spark, tmp_path):
    """compact(): many small files -> few, rows byte-identical."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "frag")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)

    before = tableio.read(spark, path)
    rows_before = sorted(r["id"] for r in before.collect())
    m = tableio.compact(spark, path, target_rows_per_file=5_000)
    assert m["files_before"] >= 64
    assert m["files_after"] <= 2
    assert m["rows"] == 10_000
    after = tableio.read(spark, path)
    assert sorted(r["id"] for r in after.collect()) == rows_before

    # partitioned table keeps its directory layout
    ppath = str(tmp_path / "fragp")
    df.withColumn("p", (F.col("id") % 3).cast("int")).repartition(48).write.partitionBy(
        "p"
    ).parquet(ppath)
    m2 = tableio.compact(spark, ppath, 5_000, partition_by=["p"])
    assert m2["files_after"] < m2["files_before"]
    import os

    assert os.path.isdir(ppath + "/p=2")
    assert tableio.read(spark, ppath).count() == 10_000


def test_incremental_hll_equals_full(spark, turns, tmp_path):
    """Sketch-tier maintenance: three chronological ingests must leave
    the register table identical to one full build; re-running is a
    no-op; watermark/lineage rows land under the hll_<tier> name."""
    from pyspark.sql import functions as F

    from python_vegindex_spark.operators.sketches import hll_registers
    from python_vegindex_spark.streaming.incremental import incremental_hll

    store = RollupStore(str(tmp_path / "hll_store"))
    cut1, cut2 = "2024-01-15", "2024-03-15"
    m1 = incremental_hll(spark, turns.filter(F.col("ts") < cut1), store)
    m2 = incremental_hll(spark, turns.filter(F.col("ts") < cut2), store)
    m3 = incremental_hll(spark, turns, store)
    assert m1["rows_in"] > 0 and m2["rows_in"] > 0 and m3["rows_in"] > 0
    assert m1["hw_old"] is None and m2["hw_old"] == m1["hw_new"]

    got = {
        (r["bucket_start"], r["bucket"]): r["reg"]
        for r in tableio.read(spark, store.gold("hll_hourly")).collect()
    }
    full = hll_registers(
        turns.select(
            F.to_timestamp(F.date_trunc("hour", "ts")).alias("bucket_start"),
            "conv_id",
        ),
        "conv_id",
        ["bucket_start"],
        b=5,
    )
    exp = {
        (r["bucket_start"], r["bucket"]): r["reg"] for r in full.collect()
    }
    assert got == exp

    m4 = incremental_hll(spark, turns, store)
    assert m4["rows_in"] == 0 and m4["hw_new"] == m3["hw_new"]
    lin = tableio.read(spark, store.lineage).toPandas()
    assert len(lin) == 4 and set(lin["tier"]) == {"hll_hourly"}


def test_incremental_hll_geometry_guard(spark, turns, tmp_path):
    """A run with different sketch geometry must refuse to merge."""
    from python_vegindex_spark.streaming.incremental import incremental_hll

    store = RollupStore(str(tmp_path / "hll_geom"))
    incremental_hll(spark, turns.limit(500), store, b=5)
    with pytest.raises(ValueError, match="refusing to merge"):
        incremental_hll(spark, turns, store, b=6)
    with pytest.raises(ValueError, match="refusing to merge"):
        incremental_hll(spark, turns, store, key_col="role")
