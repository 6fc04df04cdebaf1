"""plans/lint: the plan-discipline checks as a public API."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_vegindex_spark.plans.lint import (
    assert_exchange_free,
    assert_jvm_only,
    assert_no_global_sort,
    plan_report,
)


def test_plan_report_shapes(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    agg = df.groupBy("s").agg(F.count(F.lit(1)).alias("n"))
    rep = plan_report(agg)
    assert rep["python_markers"] == []
    assert rep["exchanges"] >= 1 and not rep["has_window"]
    topk = df.orderBy("id").limit(1)
    assert plan_report(topk)["has_take_ordered"]


def test_assert_jvm_only_catches_python_udf(spark):
    from pyspark.sql.types import LongType

    df = spark.createDataFrame([(1,), (2,)], "id long")
    udf = F.udf(lambda x: x + 1, LongType())
    bad = df.select(udf("id").alias("y"))
    with pytest.raises(AssertionError, match="Python evaluation"):
        assert_jvm_only(bad)
    assert_jvm_only(df.select((F.col("id") + 1).alias("y")))  # clean


def test_assert_exchange_free(spark):
    df = spark.createDataFrame([(1,)], "id long")
    assert_exchange_free(df.select(F.col("id") * 2))
    with pytest.raises(AssertionError, match="Exchange"):
        assert_exchange_free(df.groupBy("id").count())


def test_assert_no_global_sort(spark):
    df = spark.createDataFrame([(i,) for i in range(5)], "id long")
    assert_no_global_sort(df.orderBy("id").limit(2))  # TakeOrdered ok
    assert_no_global_sort(df.groupBy("id").count())   # no sort at all
    with pytest.raises(AssertionError, match="global sort"):
        assert_no_global_sort(df.orderBy("id"))


def test_lint_accepts_engine_operators(spark):
    """The linter passes on representative engine hot paths."""
    from python_vegindex_spark.operators.graph import triangle_counts
    from python_vegindex_spark.operators.weighted import weighted_percentiles

    wp = weighted_percentiles(
        spark.createDataFrame([("g", 1.0, 2)], "g string, value double, w long"),
        ["g"], "value", "w",
    )
    assert_jvm_only(wp)
    tri = triangle_counts(
        spark.createDataFrame([("a", "b"), ("b", "c"), ("a", "c")],
                              "src string, dst string")
    )
    assert_jvm_only(tri)
    assert_no_global_sort(tri)
