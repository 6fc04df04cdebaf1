"""backfill_rollup: delta-driven late-data ingestion.

Invariants: (a) any mix of watermark increments and backfills equals one
full recompute, cell for cell; (b) a small late delta invalidates only
the buckets it touches (its own + lag-successor + lattice extension),
never the tail range after it.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from python_vegindex_spark.config import RollupConfig
from python_vegindex_spark.operators.features import turn_features
from python_vegindex_spark.operators.rollup import rollup
from python_vegindex_spark.sources import tableio
from python_vegindex_spark.sources.synth import synth_turns
from python_vegindex_spark.streaming.incremental import (
    RollupStore,
    backfill_rollup,
    incremental_rollup,
)


@pytest.fixture(scope="module")
def turns(spark):
    return synth_turns(spark, n_convs=40, seed=29, span_days=150).cache()


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    return (
        pdf.sort_values(["conv_id", "bucket_start"], kind="stable")
        .reset_index(drop=True)
        .sort_index(axis=1)
    )


def _assert_gold_equals_full(spark, store, cfg, turns):
    got = tableio.read(spark, store.gold(cfg.tier)).toPandas()
    exp = rollup(turn_features(turns), cfg).toPandas()
    g, e = _norm(got), _norm(exp)
    assert len(g) == len(e), (len(g), len(e))
    pd.testing.assert_frame_equal(
        g, e[g.columns.tolist()], check_exact=False, rtol=1e-12
    )


@pytest.mark.parametrize("tier", ["daily", "weekly"])
def test_backfill_mid_history_equals_full(spark, turns, tier, tmp_path):
    """Hold out a mid-history slice, load the rest via the watermark
    path, backfill the held-out rows (event times BELOW the watermark —
    invisible to incremental_rollup), compare to a full recompute."""
    cfg = RollupConfig(tier=tier, nmin=2)
    store = RollupStore(str(tmp_path / f"bf_{tier}"))

    held = turns.filter(
        (F.col("ts") >= "2024-02-10") & (F.col("ts") < "2024-02-20")
    )
    rest = turns.subtract(held)
    m0 = incremental_rollup(spark, rest, store, cfg)
    assert m0["rows_in"] > 0

    # sanity: the watermark path alone cannot see the held-out rows
    m_blind = incremental_rollup(spark, turns, store, cfg)
    assert m_blind["rows_in"] == 0

    m1 = backfill_rollup(spark, turns, held, store, cfg)
    assert m1["rows_in"] == held.count()
    _assert_gold_equals_full(spark, store, cfg, turns)


def test_backfill_invalidates_minimal_buckets(spark, turns, tmp_path):
    """A 1-row late repair recomputes O(1) buckets, not the tail range."""
    cfg = RollupConfig(tier="daily", nmin=2)
    store = RollupStore(str(tmp_path / "bf_min"))

    one = turns.orderBy("conv_id", "turn_idx").limit(500).orderBy(
        "conv_id", "ts"
    ).limit(1)
    delta = one.collect()
    rest = turns.subtract(one)
    incremental_rollup(spark, rest, store, cfg)

    m = backfill_rollup(spark, turns, spark.createDataFrame(delta, turns.schema),
                        store, cfg)
    assert m["rows_in"] == 1
    # own bucket + successor's bucket (+ possible low-side lattice
    # extension if the row was the conv's first) — never the whole tail
    assert m["buckets_invalidated"] <= 3, m
    _assert_gold_equals_full(spark, store, cfg, turns)


def test_backfill_new_conv_and_tail_extension(spark, turns, tmp_path):
    """Deltas beyond the gold range (a brand-new conv; a tail append)
    emit the same count-0 spine rows a full recompute would."""
    cfg = RollupConfig(tier="daily", nmin=2)
    store = RollupStore(str(tmp_path / "bf_ext"))

    convs = [r["conv_id"] for r in turns.select("conv_id").distinct().limit(2).collect()]
    newconv, tailconv = convs[0], convs[1]
    held = turns.filter(
        (F.col("conv_id") == newconv)
        | ((F.col("conv_id") == tailconv) & (F.col("ts") >= "2024-04-01"))
    )
    rest = turns.subtract(held)
    incremental_rollup(spark, rest, store, cfg)

    m = backfill_rollup(spark, turns, held, store, cfg)
    assert m["rows_in"] == held.count() and m["rows_out"] > 0
    _assert_gold_equals_full(spark, store, cfg, turns)


def test_fused_incremental_tiers_equals_full(spark, turns, tmp_path):
    """incremental_rollup_tiers: one shared bronze slice maintaining
    hourly+daily+weekly — per tier identical to a full recompute after
    an initial load plus two increments."""
    from python_vegindex_spark.streaming.incremental import (
        incremental_rollup_tiers,
    )

    cfgs = [RollupConfig(tier=t, nmin=2) for t in ("hourly", "daily", "weekly")]
    store = RollupStore(str(tmp_path / "fusedinc"))

    cut1, cut2 = "2024-01-20", "2024-03-01"
    m1 = incremental_rollup_tiers(
        spark, turns.filter(F.col("ts") < cut1), store, cfgs
    )
    m2 = incremental_rollup_tiers(
        spark, turns.filter(F.col("ts") < cut2), store, cfgs
    )
    m3 = incremental_rollup_tiers(spark, turns, store, cfgs)
    assert m1["rows_in"] > 0 and m2["rows_in"] > 0 and m3["rows_in"] > 0

    for cfg in cfgs:
        got = tableio.read(spark, store.gold(cfg.tier)).toPandas()
        exp = rollup(turn_features(turns), cfg).toPandas()
        g, e = _norm(got), _norm(exp)
        assert len(g) == len(e), (cfg.tier, len(g), len(e))
        pd.testing.assert_frame_equal(
            g, e[g.columns.tolist()], check_exact=False, rtol=1e-12
        )

    # idempotent re-run
    m4 = incremental_rollup_tiers(spark, turns, store, cfgs)
    assert m4["rows_in"] == 0
    # lineage: one row per tier per run
    lin = tableio.read(spark, store.lineage).toPandas()
    assert len(lin) == 4 * 3


def test_incremental_job_cli(spark, turns, tmp_path):
    """scripts/incremental_job.py end-to-end: incremental run then a
    backfill run, gold equals full recompute afterwards."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    turns_path = str(tmp_path / "turns")
    held = turns.filter(
        (F.col("ts") >= "2024-02-10") & (F.col("ts") < "2024-02-14")
    )
    turns.write.parquet(turns_path)
    held_path = str(tmp_path / "delta")
    held.write.parquet(held_path)
    rest_path = str(tmp_path / "rest")
    turns.subtract(held).write.parquet(rest_path)
    store_dir = str(tmp_path / "store")

    def run(extra):
        out = subprocess.run(
            [sys.executable, os.path.join(repo, "scripts", "incremental_job.py"),
             "--store", store_dir, "--tiers", "daily", *extra],
            capture_output=True, text=True, timeout=420,
        )
        lines = [
            l for l in out.stdout.splitlines()
            if l.startswith("INCREMENTAL_METRICS ")
        ]
        assert lines, out.stdout[-1500:] + out.stderr[-2500:]
        return json.loads(lines[0][len("INCREMENTAL_METRICS "):])

    m1 = run(["--turns", rest_path])
    assert m1["mode"] == "incremental" and m1["rows_in"] > 0
    m2 = run(["--turns", turns_path, "--backfill", held_path])
    assert m2["mode"] == "backfill"
    assert m2["tiers"]["daily"]["rows_in"] == held.count()

    store = RollupStore(store_dir)
    cfg = RollupConfig(tier="daily", nmin=2)
    _assert_gold_equals_full(spark, store, cfg, turns)


def test_backfill_empty_delta_noop(spark, turns, tmp_path):
    cfg = RollupConfig(tier="daily", nmin=2)
    store = RollupStore(str(tmp_path / "bf_empty"))
    incremental_rollup(spark, turns, store, cfg)
    m = backfill_rollup(spark, turns, turns.limit(0), store, cfg)
    assert m["rows_in"] == 0 and m["rows_out"] == 0
    _assert_gold_equals_full(spark, store, cfg, turns)


def test_backfill_qc_failing_tail_delta_equals_full(spark, turns, tmp_path):
    """Review regression: a backfilled delta row BEYOND the conv's gold
    range that fails QC (empty text at midnight -> dnsum/gate below
    minimums) must NOT stretch the gap-fill lattice with count-0 rows a
    full recompute never emits; a QC-passing companion in the same delta
    must still extend it."""
    import datetime as dt

    cfg = RollupConfig(tier="daily", nmin=2)
    store = RollupStore(str(tmp_path / "bf_qc"))

    conv = turns.select("conv_id").distinct().orderBy("conv_id").limit(1)
    cid = conv.collect()[0]["conv_id"]
    base = turns.filter(F.col("conv_id") == cid)
    incremental_rollup(spark, base, store, cfg)
    max_idx = base.agg(F.max("turn_idx")).collect()[0][0]

    # far-future QC-FAILING row: empty text AND a ~1.5-year latency
    # delta push dnsum outside [brt_min, brt_max]
    bad = spark.createDataFrame(
        [(cid, max_idx + 1, "user", "", "", dt.datetime(2025, 6, 1, 12, 0))],
        base.schema,
    )
    all_rows = base.unionByName(bad)
    m = backfill_rollup(spark, all_rows, bad, store, cfg)
    assert m["rows_in"] == 1
    _assert_gold_equals_full(spark, store, cfg, all_rows)

    # QC-passing far-future row (noon -> gate passes; 24 h after its
    # predecessor -> latency measure keeps dnsum inside the brightness
    # window): the lattice MUST extend for this one
    good = spark.createDataFrame(
        [(cid, max_idx + 2, "user",
          "a perfectly reasonable turn with plenty of text in it",
          "", dt.datetime(2025, 6, 2, 12, 0))],
        base.schema,
    )
    all_rows2 = all_rows.unionByName(good)
    backfill_rollup(spark, all_rows2, good, store, cfg)
    _assert_gold_equals_full(spark, store, cfg, all_rows2)


def test_incremental_job_cli_hll(spark, turns, tmp_path):
    """--hll maintains the sketch tier alongside the moment tiers: two
    chronological CLI runs leave gold hll_hourly register-identical to
    a full build."""
    import json
    import os
    import subprocess
    import sys

    from python_vegindex_spark.operators.sketches import hll_registers

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    first = turns.filter(F.col("ts") < "2024-02-01")
    p_first, p_all = str(tmp_path / "t1"), str(tmp_path / "t2")
    first.write.parquet(p_first)
    turns.write.parquet(p_all)
    store_dir = str(tmp_path / "hstore")

    def run(turns_path):
        out = subprocess.run(
            [sys.executable, os.path.join(repo, "scripts", "incremental_job.py"),
             "--store", store_dir, "--tiers", "daily", "--hll", "hourly",
             "--turns", turns_path],
            capture_output=True, text=True, timeout=420,
        )
        lines = [
            l for l in out.stdout.splitlines()
            if l.startswith("INCREMENTAL_METRICS ")
        ]
        assert lines, out.stdout[-1500:] + out.stderr[-2500:]
        return json.loads(lines[0][len("INCREMENTAL_METRICS "):])

    m1 = run(p_first)
    assert m1["hll"]["rows_in"] > 0 and m1["hll"]["tier"] == "hll_hourly"
    m2 = run(p_all)
    assert m2["hll"]["rows_in"] > 0

    store = RollupStore(store_dir)
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
    exp = {(r["bucket_start"], r["bucket"]): r["reg"] for r in full.collect()}
    assert got == exp
