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


# ---------------------------------------------------------------------------
# differential fuzz: bucket_start_cursor vs the reference's own daterange2
# consumed by a faithful sequential-cursor walk
# (generate_summary_timeseries.py:295-307: each bucket [start, start+nday)
# consumes rows in order; the final bucket of a year thereby swallows
# early-January rows before the Jan-1 bucket sees them)

_REF_VEGINDEX = "/root/reference/src/vegindex/vegindex.py"


def _load_ref_daterange2():
    """Execute ONLY the reference's daterange2 function, read from its
    source at runtime (the module itself needs `ephem`, absent here; we
    run the function as an oracle the same way golden tests read the
    reference's fixture CSVs — nothing is vendored into this repo)."""
    import ast

    src = open(_REF_VEGINDEX).read()
    tree = ast.parse(src)
    fn = next(
        (
            n
            for n in tree.body
            if isinstance(n, ast.FunctionDef) and n.name == "daterange2"
        ),
        None,
    )
    if fn is None:
        return None
    ns = {"date": dt.date, "timedelta": dt.timedelta}
    exec(  # noqa: S102 - trusted-for-testing reference source, read-only
        compile(ast.Module(body=[fn], type_ignores=[]), _REF_VEGINDEX, "exec"),
        ns,
    )
    return ns["daterange2"]


def _ref_cursor_assign(dates, nday):
    """Bucket-start per row index, exactly as the reference's row loop
    assigns them: iterate daterange2 buckets in order, consume every
    not-yet-consumed row whose date falls in [start, start + nday)."""
    dr = list(_DR2(dates[0], dates[-1], nday))
    out = {}
    idx = 0
    for start in dr:
        end = start + dt.timedelta(days=nday)
        while idx < len(dates) and start <= dates[idx] < end:
            out[idx] = start
            idx += 1
    return out


_DR2 = None


def test_bucket_cursor_matches_reference_daterange2_fuzz(spark):
    global _DR2
    import os

    import numpy as np
    import pytest

    if not os.path.exists(_REF_VEGINDEX):
        pytest.skip("reference repo not present")
    _DR2 = _load_ref_daterange2()
    if _DR2 is None:
        pytest.skip("reference module not importable here")

    from python_vegindex_spark.functions.buckets import bucket_start_cursor

    rng = np.random.default_rng(23)
    scenarios = []  # (sid, nday, [timestamps])
    sid = 0
    for nday in (2, 3, 5, 7, 14):
        for _ in range(8):
            # spans that cross year boundaries and the 2020 leap year
            y0 = int(rng.integers(2018, 2022))
            start = dt.datetime(y0, 1, 1) + dt.timedelta(
                days=int(rng.integers(0, 365)),
                seconds=int(rng.integers(0, 86400)),
            )
            span_days = int(rng.integers(30, 800))
            n_rows = int(rng.integers(2, 120))
            offs = np.sort(rng.uniform(0, span_days * 86400.0, size=n_rows))
            tss = [start + dt.timedelta(seconds=float(s)) for s in offs]
            scenarios.append((sid, nday, tss))
            sid += 1

    TIER_NDAY.setdefault("2day", 2)
    TIER_NDAY.setdefault("5day", 5)
    TIER_NDAY.setdefault("14day", 14)

    by_nday = {}
    for s in scenarios:
        by_nday.setdefault(s[1], []).append(s)

    mismatches = []
    for nday, group in by_nday.items():
        rows = []
        for sid_, _, tss in group:
            ssy = tss[0].year
            for i, ts in enumerate(tss):
                rows.append({"sid": sid_, "i": i, "ts": ts, "ssy": ssy})
        df = spark.createDataFrame(pd.DataFrame(rows))
        got = {
            (r["sid"], r["i"]): r["b"]
            for r in df.select(
                "sid",
                "i",
                bucket_start_cursor(
                    F.col("ts"), f"{nday}day", F.col("ssy")
                ).alias("b"),
            ).collect()
        }
        for sid_, _, tss in group:
            exp = _ref_cursor_assign([t.date() for t in tss], nday)
            assert len(exp) == len(tss), (sid_, nday, "reference left rows unassigned")
            for i in range(len(tss)):
                if got[(sid_, i)] != exp[i]:
                    mismatches.append((sid_, nday, i, tss[i], got[(sid_, i)], exp[i]))
    assert not mismatches, mismatches[:10]


def test_tier_nday_rejects_zero():
    """'0day' would divide by zero -> NULL buckets collapsing every row
    into one group; must raise instead."""
    import pytest

    from python_vegindex_spark.functions.buckets import tier_nday

    assert tier_nday("3day") == 3
    with pytest.raises(ValueError, match="nday"):
        tier_nday("0day")


def test_minute_tier_epoch_anchoring(spark):
    # 15min buckets align to UTC midnight (900 s divides 86400 s)
    got = _starts(
        spark,
        ["2024-03-05 13:00:00", "2024-03-05 13:14:59", "2024-03-05 13:15:00"],
        "15min",
    )
    assert got == [
        dt.datetime(2024, 3, 5, 13, 0),
        dt.datetime(2024, 3, 5, 13, 0),
        dt.datetime(2024, 3, 5, 13, 15),
    ]
    # 60min reproduces the hourly truncation exactly
    assert _starts(spark, ["2024-03-05 13:47:11"], "60min") == [
        dt.datetime(2024, 3, 5, 13, 0)
    ]


def test_minute_tier_spine_and_anchor(spark):
    from python_vegindex_spark.functions.buckets import midpoint_anchor as mpa

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "s": ["a", "a"],
                "ts": pd.to_datetime(["2024-03-05 13:02:00", "2024-03-05 14:04:00"]),
            }
        )
    ).withColumn("bucket_start", bucket_start(F.col("ts"), "15min"))
    spine = (
        bucket_spine(df, "15min", ["s"]).orderBy("bucket_start").collect()
    )
    starts = [r["bucket_start"] for r in spine]
    assert starts[0] == dt.datetime(2024, 3, 5, 13, 0)
    assert starts[-1] == dt.datetime(2024, 3, 5, 14, 0)
    assert len(starts) == 5  # 13:00 13:15 13:30 13:45 14:00
    anchor = (
        df.limit(1)
        .select(mpa(F.col("bucket_start"), "15min").alias("a"))
        .collect()[0]["a"]
    )
    assert anchor == dt.datetime(2024, 3, 5, 13, 7, 30)


def test_minute_tier_rollup_series_gapfill(spark):
    from python_vegindex_spark.operators.generic_rollup import rollup_series

    rows = [
        ("a", dt.datetime(2024, 1, 1, 0, 1), 2.0),
        ("a", dt.datetime(2024, 1, 1, 0, 4), 4.0),
        ("a", dt.datetime(2024, 1, 1, 0, 11), 6.0),  # 0:05 and 0:10 gap-filled
    ]
    df = spark.createDataFrame(rows, ["s", "ts", "value"])
    out = (
        rollup_series(df, tier="5min", series_cols=["s"], percentiles=())
        .orderBy("bucket_start")
        .collect()
    )
    assert [r["bucket_start"].minute for r in out] == [0, 5, 10]
    assert [r["n"] for r in out] == [2, 0, 1]
    assert out[0]["v_mean"] == 3.0 and out[1]["v_mean"] is None
