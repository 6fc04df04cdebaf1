"""Cascade re-aggregation: coarse-tier moments composed from fine tiers.

Core invariant: raw → fine → coarse equals raw → coarse exactly (the
moments are order-free BIGINT sums over a nesting partition), for every
legal (fine, coarse) pair; illegal pairs are rejected up front.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from python_vegindex_spark.operators.cascade import (
    cascade_moments,
    finish_moments,
    rollup_moments,
)

LEGAL = [
    ("15min", "hourly"),
    ("15min", "daily"),
    ("hourly", "daily"),
    ("hourly", "weekly"),
    ("hourly", "3day"),
    ("daily", "weekly"),
    ("daily", "3day"),
]
ILLEGAL = [
    ("3day", "weekly"),   # doy 6-8 straddles the weekly doy 1-7/8-14 edge
    ("weekly", "daily"),  # coarse -> fine
    ("daily", "hourly"),
    ("hourly", "hourly"),  # equal tier
    ("hourly", "90min"),   # 5400 % 3600 != 0
]


@pytest.fixture(scope="module")
def ev(spark):
    # multi-year span so the weekly doy lattice restart is exercised;
    # integer values so moments are exact by construction
    rows = []
    t = dt.datetime(2023, 12, 20, 5, 7)
    for i in range(800):
        rows.append((f"s{i % 3}", t, (i * 37) % 5000 - 2500))
        t += dt.timedelta(minutes=47)
    return spark.createDataFrame(rows, "series string, ts timestamp, v long")


@pytest.mark.parametrize("fine,coarse", LEGAL)
def test_cascade_equals_direct(spark, ev, fine, coarse):
    direct = finish_moments(
        rollup_moments(ev, coarse, ["series"], value_col="v")
    )
    cascaded = finish_moments(
        cascade_moments(
            rollup_moments(ev, fine, ["series"], value_col="v"),
            fine,
            coarse,
            ["series"],
        )
    )
    got = sorted(map(tuple, cascaded.collect()))
    want = sorted(map(tuple, direct.collect()))
    assert got == want, f"{fine}->{coarse}: cascade != direct"


@pytest.mark.parametrize("fine,coarse", ILLEGAL)
def test_non_nesting_pairs_rejected(spark, ev, fine, coarse):
    mom = rollup_moments(ev, fine if fine != "weekly" else "daily",
                         ["series"], value_col="v")
    with pytest.raises(ValueError, match="nest|unknown|tier"):
        cascade_moments(mom, fine, coarse, ["series"])


@pytest.mark.parametrize("fine,coarse", [("hourly", "weekly"), ("15min", "daily")])
def test_cascade_bins_equals_direct(spark, ev, fine, coarse):
    """Binned counts compose losslessly; the histogram quantile over
    the cascaded bins equals the directly-binned coarse quantile."""
    from python_vegindex_spark.operators.cascade import cascade_bins
    from python_vegindex_spark.operators.downsample import (
        histogram_quantile,
        value_heatmap,
    )

    fine_hm = value_heatmap(ev, fine, 100.0, ["series"], value_col="v")
    direct = value_heatmap(ev, coarse, 100.0, ["series"], value_col="v")
    casc = cascade_bins(fine_hm, fine, coarse, ["series"])
    assert sorted(map(tuple, casc.collect())) == sorted(
        map(tuple, direct.collect())
    )
    qd = histogram_quantile(direct, 0.9, 100.0, ["series"]).collect()
    qc = histogram_quantile(casc, 0.9, 100.0, ["series"]).collect()
    assert sorted(map(tuple, qc)) == sorted(map(tuple, qd))


def test_cascade_hll_equals_direct_and_accurate(spark, ev):
    """Union of hourly HLL sketches ≡ direct weekly sketch (register-max
    union is exact over sketch state), and the estimate tracks the
    exact distinct count within HLL's documented error at lgK=12."""
    from python_vegindex_spark.operators.cascade import (
        cascade_hll,
        finish_hll,
        rollup_hll,
    )

    keyed = ev.withColumn("user", (F.col("v") % 97).cast("string"))
    direct = finish_hll(
        rollup_hll(keyed, "weekly", ["series"], "user")
    ).collect()
    casc = finish_hll(
        cascade_hll(
            rollup_hll(keyed, "hourly", ["series"], "user"),
            "hourly",
            "weekly",
            ["series"],
        )
    ).collect()
    assert sorted(map(tuple, casc)) == sorted(map(tuple, direct))

    exact = {
        (r["series"], r["bucket_start"]): r["nd"]
        for r in keyed.groupBy(
            "series",
            F.to_timestamp(
                F.date_add(
                    F.trunc("ts", "year"),
                    (F.floor((F.dayofyear("ts") - 1) / 7) * 7).cast("int"),
                )
            ).alias("bucket_start"),
        )
        .agg(F.countDistinct("user").alias("nd"))
        .collect()
    }
    for r in casc:
        e = exact[(r["series"], r["bucket_start"])]
        assert abs(r["n_distinct_est"] - e) <= max(2.0, 0.05 * e), (r, e)


def test_finish_hand_values(spark):
    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1, 0, 5), 1),
         ("a", dt.datetime(2024, 1, 1, 0, 15), 2),
         ("a", dt.datetime(2024, 1, 1, 0, 25), 6)],
        "series string, ts timestamp, v long",
    )
    out = finish_moments(
        rollup_moments(df, "hourly", ["series"], value_col="v")
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 3 and r["v_min"] == 1 and r["v_max"] == 6
    assert r["v_mean"] == 3.0
    # population std of {1,2,6}: mean 3, var (4+1+9)/3
    assert r["v_std"] == round((14 / 3) ** 0.5, 6)


def test_null_nan_rows_dropped(spark):
    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1, 0, 5), 4.0),
         ("a", dt.datetime(2024, 1, 1, 0, 6), float("nan")),
         ("a", dt.datetime(2024, 1, 1, 0, 7), None),
         ("a", None, 9.0)],
        "series string, ts timestamp, v double",
    )
    out = finish_moments(
        rollup_moments(df, "hourly", ["series"], value_col="v")
    ).collect()
    assert len(out) == 1 and out[0]["n"] == 1 and out[0]["v_mean"] == 4.0


def test_cascade_plan_jvm_only(spark, ev):
    out = finish_moments(
        cascade_moments(
            rollup_moments(ev, "hourly", ["series"], value_col="v"),
            "hourly",
            "weekly",
            ["series"],
        )
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, f"Python in cascade plan: {marker}"


def test_cascade_bars_equals_direct(spark):
    """hourly bars -> daily bars must equal daily bars computed from raw
    rows, including the composed VWAP (exact dot-product sums)."""
    from datetime import datetime

    from python_vegindex_spark.operators.bars import ohlc_bars
    from python_vegindex_spark.operators.cascade import cascade_bars

    rows = []
    for d_ in (1, 2):
        for h in (0, 5, 13, 22):
            for m, v, w, i in ((0, 7, 2, 1), (20, 3, 5, 2), (40, 11, 1, 3)):
                rows.append(
                    ("s", datetime(2024, 3, d_, h, m), v * d_ + h, w, i + h * 10 + d_ * 1000)
                )
    df = spark.createDataFrame(rows, "k string, ts timestamp, v long, w long, id long")
    fine = ohlc_bars(
        df, "hourly", ["k"], value_col="v", weight_col="w",
        order_cols=["id"], round_to=None,
    )
    cascaded = cascade_bars(fine, "hourly", "daily", ["k"])
    direct = ohlc_bars(
        df, "daily", ["k"], value_col="v", weight_col="w",
        order_cols=["id"], round_to=None,
    ).withColumn("bucket_start", F.col("bucket_start").cast("timestamp"))
    cols = ["k", "bucket_start", "n", "open", "high", "low", "close", "w_sum", "vw_sum", "vwap"]
    got = sorted(tuple(r) for r in cascaded.select(*cols).collect())
    exp = sorted(tuple(r) for r in direct.select(*cols).collect())
    assert got == exp  # bit-identical, vwap included


def test_cascade_bars_rejects_non_nesting_and_missing_dot(spark):
    from datetime import datetime

    import pytest as _pytest

    from python_vegindex_spark.operators.bars import ohlc_bars
    from python_vegindex_spark.operators.cascade import cascade_bars

    df = spark.createDataFrame(
        [("s", datetime(2024, 3, 1), 1, 1, 1)],
        "k string, ts timestamp, v long, w long, id long",
    )
    fine = ohlc_bars(df, "3day", ["k"], value_col="v", round_to=None)
    with _pytest.raises(ValueError):
        cascade_bars(fine, "3day", "weekly", ["k"])
    bad = ohlc_bars(
        df, "hourly", ["k"], value_col="v", weight_col="w", round_to=None
    ).drop("vw_sum")
    with _pytest.raises(ValueError, match="vw_sum"):
        cascade_bars(bad, "hourly", "daily", ["k"])
