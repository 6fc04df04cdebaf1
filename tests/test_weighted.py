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


def test_weighted_percentile_property_vs_expansion(spark):
    """Random (value, weight) multisets vs the brute-force definition:
    repeat each value `weight` times, then the type-1 quantile of the
    expanded multiset (smallest v at cumulative count >= ceil(q*N))
    must equal the operator's weighted answer."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        pairs=st.lists(
            st.tuples(
                st.integers(min_value=-300, max_value=300),
                st.integers(min_value=1, max_value=9),
            ),
            min_size=1, max_size=30,
        ),
        q100=st.sampled_from([10, 25, 50, 75, 90, 100]),
    )
    def check(pairs, q100):
        # whole-number values: floor(v * 100) is exact, so the brute
        # force below shares the operator's quantization (a cent-level
        # fraction like 0.29 would floor to 28 cents — 0.29*100 is
        # 28.999... in doubles — which is the operator's DEFINED
        # semantics, shared bit-for-bit by the DuckDB oracle)
        rows = [("g", float(v), w) for v, w in pairs]
        r = weighted_percentiles(
            _df(spark, rows), ["g"], "value", "w", qs=(q100 / 100.0,)
        ).collect()[0]
        expanded = sorted(v for v, w in pairs for _ in range(w))
        n = len(expanded)
        # smallest index i (1-based) with i*100 >= q100*n
        i = (q100 * n + 99) // 100
        want = float(expanded[i - 1])
        got = r[f"wp{q100}"]
        assert got == want, (pairs, q100, got, want)

    check()


def test_weighted_bottomk_conflicting_duplicate_weights_raise(spark):
    """Round-4 (ADVICE): duplicate (group, key) rows with CONFLICTING
    weights must raise (fail-loud, like fractional weights) instead of
    occupying multiple sample slots; agreeing duplicates dedup."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from python_vegindex_spark.operators.sampling import (
        weighted_bottomk_sample,
    )

    ok = spark.createDataFrame(
        [("a", 5), ("a", 5), ("b", 1)], "key string, wt long"
    )
    out = weighted_bottomk_sample(ok, "key", "wt", k=10).collect()
    assert sorted((r["key"], r["weight"]) for r in out) == [("a", 5), ("b", 1)]

    bad = spark.createDataFrame(
        [("a", 5), ("a", 7), ("b", 1)], "key string, wt long"
    )
    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception)) as ei:
        weighted_bottomk_sample(bad, "key", "wt", k=10).collect()
    assert "conflicting weights" in str(ei.value)


def test_cap_per_group_rejects_column_collisions(spark):
    """Round-4 (ADVICE): inputs named like cap_per_group's output or
    scratch columns must raise, not be silently corrupted."""
    import pytest

    from python_vegindex_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        [("d", "k1", 3)], "grp string, key string, grp_rank int"
    )
    with pytest.raises(ValueError, match="grp_rank"):
        cap_per_group(df, ["grp"], 1, ["key"])

    df2 = spark.createDataFrame(
        [("d", "k1", 3)], "grp string, key string, __cap_draw__ int"
    )
    with pytest.raises(ValueError, match="collides"):
        cap_per_group(df2, ["grp"], 1, ["key"])

    # a column literally named _draw (the OLD scratch name) passes
    # through untouched now
    df3 = spark.createDataFrame(
        [("d", "k1", 3), ("d", "k2", 4)], "grp string, key string, _draw int"
    )
    out = cap_per_group(df3, ["grp"], 2, ["key"]).collect()
    assert sorted(r["_draw"] for r in out) == [3, 4]
