"""compact_gold_retention: the hourly→daily→weekly gold retention ladder.

Fine buckets drop only when (a) their coarse bucket's window closes
before the horizon AND (b) the coarse row's count equals the fine sum —
a tier disagreement keeps the fine rows and is reported.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_vegindex_spark.config import RollupConfig
from python_vegindex_spark.operators.features import turn_features
from python_vegindex_spark.operators.rollup import rollup
from python_vegindex_spark.sources import tableio
from python_vegindex_spark.sources.synth import synth_turns
from python_vegindex_spark.streaming.incremental import (
    RollupStore,
    compact_gold_retention,
)

HORIZON = "2024-03-01"


@pytest.fixture()
def store(spark, tmp_path):
    turns = synth_turns(spark, n_convs=25, seed=31, span_days=120)
    feats = turn_features(turns)
    st = RollupStore(str(tmp_path / "ladder"))
    for tier in ("hourly", "daily"):
        tableio.overwrite(
            rollup(feats, RollupConfig(tier=tier, nmin=2)), st.gold(tier)
        )
    return st


def test_ladder_drops_covered_fine_buckets(spark, store):
    hourly_before = tableio.read(spark, store.gold("hourly")).cache()
    n_before = hourly_before.count()
    old_rows = hourly_before.filter(F.col("bucket_start") < HORIZON).count()
    assert old_rows > 0

    m = compact_gold_retention(spark, store, "hourly", "daily", HORIZON)
    assert m["kept_unverified"] == 0
    assert m["dropped_rows"] == old_rows  # every old day is daily-covered

    after = tableio.read(spark, store.gold("hourly"))
    assert after.count() == n_before - old_rows
    # nothing at/after the horizon was touched, cell for cell
    keep = hourly_before.filter(F.col("bucket_start") >= HORIZON)
    assert after.exceptAll(keep).count() == 0
    assert keep.exceptAll(after).count() == 0
    hourly_before.unpersist()


def test_ladder_keeps_mismatched_coarse_buckets(spark, store):
    # corrupt one covered daily bucket's count: its hours must survive
    daily = tableio.read(spark, store.gold("daily"))
    victim = (
        daily.filter(
            (F.col("bucket_start") < "2024-02-01") & (F.col("turn_count") > 0)
        )
        .select("conv_id", "bucket_start")
        .limit(1)
        .collect()[0]
    )
    tampered = daily.withColumn(
        "turn_count",
        F.when(
            (F.col("conv_id") == victim["conv_id"])
            & (F.col("bucket_start") == F.lit(victim["bucket_start"])),
            F.col("turn_count") + 1,
        ).otherwise(F.col("turn_count")),
    ).localCheckpoint(eager=True)
    tableio.overwrite(tampered, store.gold("daily"))

    m = compact_gold_retention(spark, store, "hourly", "daily", HORIZON)
    assert m["kept_unverified"] == 1
    after = tableio.read(spark, store.gold("hourly"))
    survivors = after.filter(
        (F.col("conv_id") == victim["conv_id"])
        & (F.to_date("bucket_start") == F.lit(victim["bucket_start"]))
    ).count()
    assert survivors > 0


def test_ladder_horizon_straddle_kept(spark, store):
    # a horizon inside a daily bucket's window: that day's hours survive
    hourly = tableio.read(spark, store.gold("hourly"))
    # a data-bearing day somewhere in the middle of the hourly gold
    day = (
        hourly.select(F.to_date("bucket_start").alias("d"))
        .distinct()
        .orderBy("d")
        .collect()
    )
    straddle = day[len(day) // 2]["d"]
    m = compact_gold_retention(
        spark, store, "hourly", "daily", f"{straddle} 12:00:00"
    )
    after = tableio.read(spark, store.gold("hourly"))
    # the straddle day's hourly buckets were NOT dropped (their daily
    # window closes at the NEXT midnight, after the horizon) ...
    assert after.filter(F.to_date("bucket_start") == F.lit(straddle)).count() > 0
    # ... and every earlier (closed, daily-covered) day is gone
    assert (
        after.filter(F.to_date("bucket_start") < F.lit(straddle)).count() == 0
    )
    assert m["dropped_rows"] > 0


def test_ladder_rejects_non_nesting_pair(spark, store):
    with pytest.raises(ValueError, match="nest"):
        compact_gold_retention(spark, store, "daily", "hourly", HORIZON)
