"""Bucket anchoring — ports the reference's test_daterange2 cases
(/root/reference/tests/test_daterange2.py:17-45) onto the Spark bucket
expressions, plus year-boundary / short-final-bucket cases
(vegindex.py:50-58).

The reference tests use nday=3; our tiers are nday=1 (daily) and nday=7
(weekly), so the nday=3 cases run through a parameterized tier entry.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from python_vegindex_spark.config import TIER_NDAY
from python_vegindex_spark.functions.buckets import (
    bucket_center,
    bucket_spine,
    bucket_start,
    midpoint_anchor,
)

# register a 3-day tier for the ported reference cases
TIER_NDAY.setdefault("3day", 3)


def _starts(spark, tss, tier):
    df = spark.createDataFrame(pd.DataFrame({"ts": pd.to_datetime(tss)}))
    return [
        r[0]
        for r in df.select(bucket_start(F.col("ts"), tier)).orderBy("ts").collect()
    ]


def test_daterange2_anchoring_nday3(spark):
    # start offsets Jan 1..7 of 2008 -> bucket starts 1/1,1/1,1/1,1/4,1/4,1/4,1/7
    tss = [f"2008-01-0{d} 10:00:00" for d in range(1, 8)]
    got = _starts(spark, tss, "3day")
    expect = [
        dt.date(2008, 1, 1),
        dt.date(2008, 1, 1),
        dt.date(2008, 1, 1),
        dt.date(2008, 1, 4),
        dt.date(2008, 1, 4),
        dt.date(2008, 1, 4),
        dt.date(2008, 1, 7),
    ]
    assert got == expect


def test_weekly_yearly_restart(spark):
    # 2008 is a leap year: weekly lattice doy 1,8,...,358,365 (short, 2 days);
    # 2009 restarts at Jan 1.
    got = _starts(
        spark, ["2008-12-30 06:00:00", "2008-12-31 06:00:00", "2009-01-01 06:00:00"], "weekly"
    )
    assert got == [dt.date(2008, 12, 30), dt.date(2008, 12, 30), dt.date(2009, 1, 1)]
    # doy of 2008-12-30 is 365 -> on the 7-day lattice (365-1) % 7 == 0
    assert (365 - 1) % 7 == 0


def test_center_truncation(spark):
    # center = start + floor(n/2) days: the date+timedelta(1.5) truncation
    # (generate_summary_timeseries.py:276-277)
    df = spark.createDataFrame(pd.DataFrame({"ts": pd.to_datetime(["2008-01-04 09:00:00"])}))
    row = df.select(
        bucket_start(F.col("ts"), "3day").alias("b")
    ).select(bucket_center(F.col("b"), "3day").alias("c")).collect()[0]
    assert row["c"] == dt.date(2008, 1, 5)  # start 1/4 + floor(1.5)=1 day


def test_hourly_anchor(spark):
    df = spark.createDataFrame(pd.DataFrame({"ts": pd.to_datetime(["2024-03-05 13:47:11"])}))
    row = df.select(bucket_start(F.col("ts"), "hourly").alias("b")).select(
        "b", midpoint_anchor(F.col("b"), "hourly").alias("a")
    ).collect()[0]
    assert row["b"] == dt.datetime(2024, 3, 5, 13, 0)
    assert row["a"] == dt.datetime(2024, 3, 5, 13, 30)


def test_spine_gap_fill_and_restart(spark):
    # one series, data on 2008-12-20 and 2009-01-10, weekly tier:
    # spine must include the short final 2008 bucket and restart at 2009-01-01
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c", "c"],
                "ts": pd.to_datetime(["2008-12-20 06:00:00", "2009-01-10 06:00:00"]),
            }
        )
    ).withColumn("bucket_start", bucket_start(F.col("ts"), "weekly"))
    spine = bucket_spine(df, "weekly", ["conv_id"]).orderBy("bucket_start").collect()
    got = [r["bucket_start"] for r in spine]
    assert got == [
        dt.date(2008, 12, 16),  # doy 351
        dt.date(2008, 12, 23),  # doy 358
        dt.date(2008, 12, 30),  # doy 365, short bucket (2 days, leap year)
        dt.date(2009, 1, 1),  # restart
        dt.date(2009, 1, 8),
    ]
