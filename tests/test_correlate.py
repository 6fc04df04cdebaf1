"""Cross-series correlation + autocorrelation: hand values and edges."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from python_vegindex_spark.operators.correlate import (
    autocorrelation,
    series_correlation,
)


def _rows(series, vals, start_h=0):
    t0 = dt.datetime(2024, 1, 1)
    return [
        (series, t0 + dt.timedelta(hours=start_h + i), float(v))
        for i, v in enumerate(vals)
    ]


SCHEMA = "series string, ts timestamp, value double"


def test_cross_correlation_hand_values(spark):
    # b = 2a + 3 (corr 1), c = -a (corr -1), d constant (NULL corr)
    a = [1, 2, 3, 4, 5]
    df = spark.createDataFrame(
        _rows("a", a) + _rows("b", [2 * v + 3 for v in a])
        + _rows("c", [-v for v in a]) + _rows("d", [7] * 5),
        SCHEMA,
    )
    got = {
        (r["series_a"], r["series_b"]): (r["n"], r["corr"])
        for r in series_correlation(df, "hourly", "series").collect()
    }
    assert got[("a", "b")] == (5, 1.0)
    assert got[("a", "c")] == (5, -1.0)
    assert got[("a", "d")][1] is None  # zero variance
    assert got[("b", "c")] == (5, -1.0)
    assert len(got) == 6  # unordered pairs of 4 series


def test_cross_correlation_common_buckets_only(spark):
    # b overlaps a on 3 of 5 buckets; n counts only the common ones
    df = spark.createDataFrame(
        _rows("a", [1, 2, 3, 4, 5]) + _rows("b", [2, 4, 6], start_h=2), SCHEMA
    )
    r = series_correlation(df, "hourly", "series").collect()[0]
    assert (r["series_a"], r["series_b"], r["n"]) == ("a", "b", 3)
    assert r["corr"] == 1.0


def test_cross_correlation_in_bucket_sum_and_nan(spark):
    # two rows in one bucket sum before correlating; NaN rows drop
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            ("a", t0, 1.0), ("a", t0 + dt.timedelta(minutes=5), 2.0),  # bucket sum 3
            ("a", t0 + dt.timedelta(hours=1), 6.0),
            ("a", t0 + dt.timedelta(hours=1, minutes=1), float("nan")),
            ("b", t0, 3.0), ("b", t0 + dt.timedelta(hours=1), 6.0),
        ],
        SCHEMA,
    )
    r = series_correlation(df, "hourly", "series").collect()[0]
    assert (r["n"], r["corr"]) == (2, 1.0)


def test_autocorrelation_periodic_and_lags(spark):
    # period-2 alternation: ACF(1) = -1 on the exact +/- pattern, ACF(2) = 1
    vals = [1, -1, 1, -1, 1, -1, 1, -1]
    df = spark.createDataFrame(_rows("s", vals), SCHEMA)
    got = {
        r["lag"]: (r["n"], r["corr"])
        for r in autocorrelation(df, "hourly", ["series"], lags=[1, 2]).collect()
    }
    assert got[1] == (7, -1.0)
    assert got[2] == (6, 1.0)


def test_autocorrelation_daily_and_validation(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [("s", t0 + dt.timedelta(days=i), float(i)) for i in range(6)]
    df = spark.createDataFrame(rows, SCHEMA)
    r = autocorrelation(df, "daily", ["series"], lags=[1]).collect()[0]
    assert (r["lag"], r["n"], r["corr"]) == (1, 5, 1.0)
    with pytest.raises(ValueError):
        autocorrelation(df, "weekly", ["series"], lags=[1])
    with pytest.raises(ValueError):
        autocorrelation(df, "daily", ["series"], lags=[0])


def test_lagged_cross_correlation_lead_detection(spark):
    """b follows a one bucket later (b_t = a_{t-1}): corr(a_t, b_{t+1})
    = 1 at lag 1, and the reverse direction is weaker; lag-0 rows match
    series_correlation symmetrically."""
    from python_vegindex_spark.operators.correlate import (
        lagged_cross_correlation,
    )

    a = [1, 5, 2, 8, 3, 9, 4]
    b = [0] + a[:-1]  # shifted copy: a leads b by exactly one bucket
    df = spark.createDataFrame(_rows("a", a) + _rows("b", b), SCHEMA)
    got = {
        (r["series_a"], r["series_b"], r["lag"]): r["corr"]
        for r in lagged_cross_correlation(df, "hourly", "series", lags=[0, 1]).collect()
    }
    assert got[("a", "b", 1)] == 1.0          # a at t vs b at t+1: identical
    assert got[("b", "a", 1)] != 1.0          # wrong direction
    assert got[("a", "b", 0)] == got[("b", "a", 0)]  # lag 0 is symmetric

    import pytest as _pytest
    with _pytest.raises(ValueError):
        lagged_cross_correlation(df, "weekly", "series")
    with _pytest.raises(ValueError):
        lagged_cross_correlation(df, "hourly", "series", lags=[-1])


def test_forecast_backtest_error_hand_values(spark):
    """Constant series -> zero error; linear ramp -> naive MAE == step,
    seasonal MAE == season*step; exact period-2 repeat -> seasonal error
    0 while naive error is the full swing."""
    from python_vegindex_spark.operators.correlate import forecast_backtest_error

    const = _rows("c", [5.0] * 8)
    ramp = _rows("r", [float(i) for i in range(8)])
    period2 = _rows("p", [1.0, 9.0] * 4)
    df = spark.createDataFrame(const + ramp + period2, SCHEMA)
    got = {
        (r["series"], r["lag"]): (r["n"], r["mae"], r["rmse"])
        for r in forecast_backtest_error(
            df, "hourly", ["series"], season=2
        ).collect()
    }
    assert got[("c", 1)] == (7, 0.0, 0.0)
    assert got[("c", 2)] == (6, 0.0, 0.0)
    assert got[("r", 1)] == (7, 1.0, 1.0)
    assert got[("r", 2)] == (6, 2.0, 2.0)
    assert got[("p", 2)] == (6, 0.0, 0.0)   # seasonal model is perfect
    assert got[("p", 1)] == (7, 8.0, 8.0)   # naive eats the full swing

    import pytest as _pytest
    with _pytest.raises(ValueError):
        forecast_backtest_error(df, "weekly", ["series"])
    with _pytest.raises(ValueError):
        forecast_backtest_error(df, "hourly", ["series"], season=1)
