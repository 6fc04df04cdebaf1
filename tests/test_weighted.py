"""Exact type-1 weighted percentiles (operators/weighted)."""

from __future__ import annotations

import math

import pytest

from python_vegindex_spark.operators.weighted import weighted_percentiles


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, value double, w long")


def test_weighted_percentiles_hand_case(spark):
    df = _df(
        spark,
        [("a", 1.0, 3), ("a", 2.0, 1), ("a", 3.0, 6)],
    )
    r = weighted_percentiles(
        df, ["g"], "value", "w", qs=(0.3, 0.5, 0.9)
    ).collect()[0]
    # W=10; cum(1.0)=3, cum(2.0)=4, cum(3.0)=10
    # q30 -> 3*100 >= 30*10 at v=1.0; q50 -> first cum*100 >= 500 is 3.0
    assert (r.n, r.total_w) == (3, 10)
    assert (r.wp30, r.wp50, r.wp90) == (1.0, 3.0, 3.0)


def test_weighted_equal_weights_is_type1_quantile(spark):
    df = _df(spark, [("a", float(v), 1) for v in (1, 2, 3, 4)])
    r = weighted_percentiles(df, ["g"], "value", "w", qs=(0.5,)).collect()[0]
    # type-1 lower median: smallest v with cum >= 2 of 4
    assert r.wp50 == 2.0


def test_weighted_merges_duplicate_values_and_drops_bad_rows(spark):
    rows = [
        ("a", 1.5, 2),
        ("a", 1.5, 2),        # same cent bucket: weights merge
        ("a", 9.0, 0),        # zero weight dropped
        ("a", None, 5),       # NULL value dropped
        ("a", float("nan"), 5),  # NaN dropped
        ("a", 2.0, None),     # NULL weight dropped
    ]
    r = weighted_percentiles(_df(spark, rows), ["g"], "value", "w").collect()[0]
    assert (r.n, r.total_w) == (2, 4)
    assert r.wp50 == 1.5 and r.wp90 == 1.5


def test_weighted_heavy_row_moves_percentile(spark):
    light = [("a", float(v), 1) for v in range(1, 10)]
    heavy = [("a", 9.0, 1000)]
    r_light = weighted_percentiles(
        _df(spark, light), ["g"], "value", "w", qs=(0.5,)
    ).collect()[0]
    r_heavy = weighted_percentiles(
        _df(spark, light + heavy), ["g"], "value", "w", qs=(0.5,)
    ).collect()[0]
    assert r_light.wp50 == 5.0 and r_heavy.wp50 == 9.0


def test_weighted_validation(spark):
    df = _df(spark, [("a", 1.0, 1)])
    with pytest.raises(ValueError, match="whole hundredth"):
        weighted_percentiles(df, ["g"], "value", "w", qs=(0.505,))
    with pytest.raises(ValueError, match="whole hundredth"):
        weighted_percentiles(df, ["g"], "value", "w", qs=(0.0,))
    with pytest.raises(ValueError, match="duplicate"):
        weighted_percentiles(df, ["g"], "value", "w", qs=(0.5, 0.5))
    with pytest.raises(ValueError, match="group_cols"):
        weighted_percentiles(df, [], "value", "w")


def test_weighted_plan_python_free(spark):
    df = _df(spark, [("a", 1.0, 1), ("b", 2.0, 3)])
    out = weighted_percentiles(df, ["g"], "value", "w")
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF", "mapInPandas"):
        assert marker not in plan, f"{marker} in weighted-percentile plan"
    assert math.isclose(
        {r.g: r.wp50 for r in out.collect()}["b"], 2.0
    )
