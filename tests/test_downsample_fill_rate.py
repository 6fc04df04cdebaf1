"""Unit tests: M4/LTTB downsampling, LOCF/interp fill, counter rate,
sliding time windows (operators/downsample, functions/fill,
operators/rate). Driver-query parity for the same operators lives in
__spark_entry__ (m4_downsample / locf_interpolate_fill /
counter_rate_daily / sliding_window_peak oracles)."""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pytest
from pyspark.sql import functions as F

from python_vegindex_spark.functions.fill import fill_series
from python_vegindex_spark.operators.downsample import (
    _lttb_numpy,
    lttb_downsample,
    m4_downsample,
)
from python_vegindex_spark.operators.rate import (
    counter_increase,
    sliding_time_stats,
)

T0 = datetime(2024, 1, 1)


def _ts(seconds: float) -> datetime:
    return T0 + timedelta(seconds=seconds)


# ---------------------------------------------------------------- M4


def test_m4_picks_first_last_min_max_per_pixel(spark):
    # one series, 8 points over [0, 80) s, width=2 -> pixel 0 = [0,40) us-span
    rows = [
        ("a", _ts(0), 5.0),     # px0 first
        ("a", _ts(10), 1.0),    # px0 min
        ("a", _ts(20), 9.0),    # px0 max
        ("a", _ts(30), 4.0),    # px0 last
        ("a", _ts(50), 2.0),
        ("a", _ts(60), 7.0),
        ("a", _ts(70), 3.0),
        ("a", _ts(80), 6.0),    # global max ts -> clamped into px1
    ]
    df = spark.createDataFrame(rows, ["s", "ts", "value"])
    out = {
        r["px"]: r
        for r in m4_downsample(df, width=2, series_cols=["s"]).collect()
    }
    assert set(out) == {0, 1}
    p0 = out[0]
    assert (p0["t_first"], p0["v_first"]) == (_ts(0), 5.0)
    assert (p0["t_last"], p0["v_last"]) == (_ts(30), 4.0)
    assert (p0["t_min"], p0["v_min"]) == (_ts(10), 1.0)
    assert (p0["t_max"], p0["v_max"]) == (_ts(20), 9.0)
    p1 = out[1]
    assert (p1["v_first"], p1["v_last"]) == (2.0, 6.0)
    assert (p1["v_min"], p1["v_max"]) == (2.0, 7.0)


def test_m4_tie_breaks_earliest_ts_and_drops_nulls(spark):
    rows = [
        ("a", _ts(0), 3.0),
        ("a", _ts(1), 3.0),   # same min AND max value: earliest ts wins
        ("a", _ts(2), None),  # dropped
        ("a", _ts(3), float("nan")),  # dropped
    ]
    df = spark.createDataFrame(rows, ["s", "ts", "value"])
    [r] = m4_downsample(df, width=1, series_cols=["s"]).collect()
    assert r["t_min"] == _ts(0) and r["t_max"] == _ts(0)
    assert r["t_last"] == _ts(1)  # null/nan rows never become endpoints


def test_m4_single_timestamp_and_width_validation(spark):
    df = spark.createDataFrame([("a", _ts(0), 1.0)], ["s", "ts", "value"])
    [r] = m4_downsample(df, width=4, series_cols=["s"]).collect()
    assert r["px"] == 0  # degenerate span lands in pixel 0, no div-by-zero
    with pytest.raises(ValueError, match="width"):
        m4_downsample(df, width=0, series_cols=["s"])


def test_m4_plan_is_jvm_only(spark):
    df = spark.createDataFrame(
        [("a", _ts(i), float(i % 7)) for i in range(100)], ["s", "ts", "value"]
    )
    out = m4_downsample(df, width=8, series_cols=["s"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan
    assert "HashAggregate" in plan


# -------------------------------------------------------------- LTTB


def test_lttb_numpy_keeps_endpoints_and_spike():
    ts = np.arange(5, dtype=np.int64)
    vs = np.array([0.0, 0.0, 10.0, 0.0, 0.0])
    sel = _lttb_numpy(ts, vs, 3)
    assert list(sel) == [0, 2, 4]


def test_lttb_numpy_passthrough_and_validation():
    ts = np.arange(3, dtype=np.int64)
    vs = np.zeros(3)
    assert list(_lttb_numpy(ts, vs, 10)) == [0, 1, 2]
    with pytest.raises(ValueError, match="n_out"):
        _lttb_numpy(np.arange(9, dtype=np.int64), np.zeros(9), 2)


def test_lttb_downsample_selects_real_rows_per_series(spark):
    rng = np.random.RandomState(11)
    rows = [
        (s, _ts(i * 60), float(v))
        for s in ("a", "b")
        for i, v in enumerate(rng.randn(200))
    ]
    df = spark.createDataFrame(rows, ["s", "ts", "value"])
    out = lttb_downsample(df, 20, series_cols=["s"]).collect()
    by_s = {}
    for r in out:
        by_s.setdefault(r["s"], []).append((r["ts"], r["value"]))
    src = {(r[0], r[1], r[2]) for r in rows}
    for s, pts in by_s.items():
        assert len(pts) == 20
        assert pts[0][0] == _ts(0) and pts[-1][0] == _ts(199 * 60)
        ts_list = [p[0] for p in pts]
        assert ts_list == sorted(ts_list)
        for t, v in pts:
            assert (s, t, v) in src  # every output point is a real row


# -------------------------------------------------------------- fill


def test_fill_locf_and_even_interp(spark):
    rows = [
        ("a", _ts(-3600), None),  # leading gap: nothing to carry
        ("a", _ts(0), 1.0),
        ("a", _ts(3600), None),
        ("a", _ts(7200), None),
        ("a", _ts(10800), 4.0),
        ("a", _ts(14400), None),  # trailing gap
    ]
    df = spark.createDataFrame(rows, ["s", "bucket_start", "v"])
    out = (
        fill_series(df, ["s"], "bucket_start", ["v"])
        .orderBy("bucket_start")
        .collect()
    )
    assert [r["v_locf"] for r in out] == [None, 1.0, 1.0, 1.0, 4.0, 4.0]
    interp = [r["v_interp"] for r in out]
    assert interp[0] is None and interp[-1] is None  # no extrapolation
    assert interp[1:5] == pytest.approx([1.0, 2.0, 3.0, 4.0])


def test_fill_interp_weights_by_time_distance(spark):
    rows = [
        ("a", _ts(0), 0.0),
        ("a", _ts(7 * 3600), None),  # 7/10 of the way
        ("a", _ts(10 * 3600), 10.0),
    ]
    df = spark.createDataFrame(rows, ["s", "bucket_start", "v"])
    out = (
        fill_series(df, ["s"], "bucket_start", ["v"], methods=("interp",))
        .orderBy("bucket_start")
        .collect()
    )
    assert out[1]["v_interp"] == pytest.approx(7.0)
    assert "v_locf" not in out[0].asDict()
    with pytest.raises(ValueError, match="methods"):
        fill_series(df, ["s"], "bucket_start", ["v"], methods=("cubic",))


def test_fill_date_order_column_and_series_isolation(spark):
    rows = [
        ("a", datetime(2024, 1, 1).date(), 2.0),
        ("a", datetime(2024, 1, 2).date(), None),
        ("a", datetime(2024, 1, 3).date(), 6.0),
        ("b", datetime(2024, 1, 2).date(), None),  # other series: no bleed
    ]
    df = spark.createDataFrame(rows, ["s", "bucket_start", "v"])
    out = {
        (r["s"], r["bucket_start"]): r
        for r in fill_series(df, ["s"], "bucket_start", ["v"]).collect()
    }
    assert out[("a", datetime(2024, 1, 2).date())]["v_interp"] == pytest.approx(4.0)
    b = out[("b", datetime(2024, 1, 2).date())]
    assert b["v_locf"] is None and b["v_interp"] is None


# -------------------------------------------------------------- rate


def test_counter_increase_handles_resets(spark):
    rows = [
        ("a", _ts(0), 1, 5),
        ("a", _ts(60), 2, 7),    # +2
        ("a", _ts(120), 3, 2),   # reset: contributes its own value 2
        ("a", _ts(180), 4, 10),  # +8
    ]
    df = spark.createDataFrame(rows, ["s", "ts", "eid", "counter"])
    [r] = counter_increase(
        df, tier="daily", series_cols=["s"], counter_col="counter",
        order_cols=["eid"],
    ).collect()
    assert r["n_samples"] == 4 and r["n_resets"] == 1
    assert r["increase"] == 12  # first sample has no baseline
    assert r["rate_per_s"] == pytest.approx(12 / 86400, abs=1e-6)
    with pytest.raises(ValueError, match="tiers"):
        counter_increase(df, tier="monthly", series_cols=["s"])


def test_time_weighted_avg_locf_weighting(spark):
    from python_vegindex_spark.operators.rate import time_weighted_avg

    rows = [
        # bucket 00: regular — :00 holds 30 min at 2, :30 holds 30 min at 4
        ("a", _ts(0), 1, 2.0),
        ("a", _ts(1800), 2, 4.0),
        # bucket 01: first sample at :15 -> 45 min covered, twa weighted
        ("a", _ts(3600 + 900), 3, 2.0),   # holds 15 min
        ("a", _ts(3600 + 1800), 4, 4.0),  # holds 30 min to bucket end
        # NULL/NaN samples carry no coverage
        ("a", _ts(3600 + 2700), 5, None),
        ("a", _ts(3600 + 2701), 6, float("nan")),
    ]
    df = spark.createDataFrame(rows, ["s", "ts", "eid", "value"])
    out = {
        r["bucket_start"]: r
        for r in time_weighted_avg(
            df, tier="hourly", series_cols=["s"], order_cols=["eid"]
        ).collect()
    }
    b0 = out[_ts(0)]
    assert b0["n_samples"] == 2
    assert b0["covered_us"] == 3_600_000_000
    assert b0["twa"] == pytest.approx(3.0)
    b1 = out[_ts(3600)]
    assert b1["covered_us"] == 2700 * 1_000_000
    assert b1["twa"] == pytest.approx((2.0 * 900 + 4.0 * 1800) / 2700)


def test_time_weighted_avg_ts_tie_is_zero_width(spark):
    from python_vegindex_spark.operators.rate import time_weighted_avg

    rows = [
        ("a", _ts(0), 1, 100.0),  # tie, earlier eid: zero width
        ("a", _ts(0), 2, 2.0),    # tie winner holds the whole hour
    ]
    df = spark.createDataFrame(rows, ["s", "ts", "eid", "value"])
    [r] = time_weighted_avg(
        df, tier="hourly", series_cols=["s"], order_cols=["eid"]
    ).collect()
    assert r["covered_us"] == 3_600_000_000
    assert r["twa"] == pytest.approx(2.0)
    with pytest.raises(ValueError, match="twa tiers"):
        time_weighted_avg(df, tier="5day", series_cols=["s"])


def test_anomaly_zscore_flags_spike_not_baseline(spark):
    from python_vegindex_spark.operators.rate import anomaly_zscore

    # alternating 9/11 baseline (mean 10, pop-std 1), then a spike of 20
    rows = [("a", _ts(i * 60), 9 + 2 * (i % 2)) for i in range(10)]
    rows.append(("a", _ts(600), 20))
    df = spark.createDataFrame(rows, ["s", "ts", "value"])
    out = {
        r["ts"]: r
        for r in anomaly_zscore(
            df, window_s=3600, series_cols=["s"], min_baseline=5
        ).collect()
    }
    spike = out[_ts(600)]
    assert spike["is_anomaly"] and spike["base_n"] == 10
    assert spike["base_mean"] == pytest.approx(10.0)
    assert spike["base_std"] == pytest.approx(1.0)
    assert spike["z"] == pytest.approx(10.0)
    # early rows below min_baseline: NULL z, not flagged
    assert out[_ts(0)]["z"] is None and not out[_ts(0)]["is_anomaly"]
    # a baseline row well past min_baseline is unflagged (|z| == 1)
    assert not out[_ts(540)]["is_anomaly"]
    assert abs(out[_ts(540)]["z"]) == pytest.approx(1.0, abs=0.2)


def test_anomaly_zscore_excludes_self_and_ts_peers(spark):
    from python_vegindex_spark.operators.rate import anomaly_zscore

    rows = [("a", _ts(i * 60), 10) for i in range(6)]
    # two peers at the same ts: neither sees the other in its baseline
    rows += [("a", _ts(360), 10), ("a", _ts(360), 1000)]
    df = spark.createDataFrame(rows, ["s", "ts", "value"])
    out = anomaly_zscore(
        df, window_s=3600, series_cols=["s"], min_baseline=5
    ).where(F.col("ts") == _ts(360)).collect()
    assert all(r["base_n"] == 6 for r in out)  # peers excluded
    # zero-variance baseline -> NULL z, never a div-by-zero flag
    assert all(r["z"] is None and not r["is_anomaly"] for r in out)
    with pytest.raises(ValueError, match="min_baseline"):
        anomaly_zscore(df, window_s=60, series_cols=["s"], min_baseline=1)


def test_sliding_time_stats_range_window_and_ties(spark):
    rows = [
        ("a", _ts(0), 1),
        ("a", _ts(0), 2),      # ts tie: peers see each other (RANGE)
        ("a", _ts(30), 4),
        ("a", _ts(3600), 8),   # inclusive lower edge: covers t=0
        ("a", _ts(3601), 16),  # t=0 rows age out
    ]
    df = spark.createDataFrame(rows, ["s", "ts", "value"])
    out = sliding_time_stats(
        df, window_s=3600, series_cols=["s"], round_to=None
    ).orderBy("ts", "value").collect()
    assert [r["w_n"] for r in out] == [2, 2, 3, 4, 3]
    assert [r["w_sum"] for r in out] == [3, 3, 7, 15, 28]
    assert out[3]["w_avg"] == pytest.approx(15 / 4)
    with pytest.raises(ValueError, match="window_s"):
        sliding_time_stats(df, window_s=0, series_cols=["s"])


# ------------------------------------------------------------- terms


def test_tfidf_top_terms_ranking_and_scores(spark):
    from math import log

    from python_vegindex_spark.operators.terms import tfidf_top_terms

    rows = [
        (1, "web", "apple apple banana common"),
        (2, "web", "apple cherry common"),
        (3, "code", "zebra zebra zebra common"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {
        (r["source"], r["rank"]): r
        for r in tfidf_top_terms(df, k=2, min_len=3).collect()
    }
    web1 = out[("web", 1)]
    # tf ties broken by df asc: apple tf=3 wins outright
    assert web1["term"] == "apple" and web1["tf"] == 3 and web1["df"] == 2
    assert web1["tfidf"] == pytest.approx(3 * (log(4 / 3) + 1.0), abs=1e-6)
    code1 = out[("code", 1)]
    assert code1["term"] == "zebra" and code1["df"] == 1
    # 'common' appears in all docs -> lowest idf, still rankable by tf
    assert out[("web", 2)]["term"] in ("banana", "cherry", "common")
    with pytest.raises(ValueError, match="k must"):
        tfidf_top_terms(df, k=0)


def test_tfidf_min_len_and_null_text(spark):
    from python_vegindex_spark.operators.terms import tfidf_top_terms

    rows = [(1, "a", "is a of the quantum"), (2, "a", None)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    got = tfidf_top_terms(df, k=10).collect()
    assert [r["term"] for r in got] == ["quantum", "the"]  # short terms dropped


def test_value_heatmap_bins_and_drops_nulls(spark):
    from python_vegindex_spark.operators.downsample import value_heatmap

    rows = [
        ("a", _ts(0), 12.0),     # bin 1 at width 10
        ("a", _ts(1), 19.9),     # bin 1
        ("a", _ts(2), -0.1),     # bin -1 (floor, not trunc)
        ("a", _ts(3), None),
        ("a", _ts(4), float("nan")),
    ]
    df = spark.createDataFrame(rows, ["s", "ts", "value"])
    out = {
        (r["v_bin"]): r["n"]
        for r in value_heatmap(
            df, tier="hourly", bin_width=10.0, series_cols=["s"]
        ).collect()
    }
    assert out == {1: 2, -1: 1}
    with pytest.raises(ValueError, match="bin_width"):
        value_heatmap(df, tier="hourly", bin_width=0, series_cols=["s"])


# -------------------------------------------------------------- plans


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_new_operator_plans_are_jvm_only_minimal_shuffle(spark):
    from python_vegindex_spark.operators.rate import time_weighted_avg

    rows = [("a", _ts(i * 60), 1, float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, ["s", "ts", "eid", "value"])

    # twa: window and aggregate share the (series, bucket) key -> the
    # plan needs exactly ONE data shuffle
    twa = time_weighted_avg(
        df, tier="hourly", series_cols=["s"], order_cols=["eid"]
    )
    p = _plan(twa)
    assert p.count("Exchange hashpartitioning") == 1, p
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in p

    # fill: both directed windows share one partitioning -> one shuffle
    filled = fill_series(
        df.select("s", F.col("ts").alias("bucket_start"), F.col("value").alias("v")),
        ["s"],
        "bucket_start",
        ["v"],
    )
    p = _plan(filled)
    assert p.count("Exchange hashpartitioning") == 1, p
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in p


# ------------------------------------------------- ewma_smooth


def test_ewma_hand_values_and_renormalization(spark):
    from python_vegindex_spark.operators.rate import ewma_smooth, ewma_weights

    assert ewma_weights(0.5, 3) == [0.5, 0.25, 0.125]
    rows = [("a", 0, 10.0), ("a", 1, 20.0), ("a", 2, 30.0)]
    df = spark.createDataFrame(rows, ["s", "i", "v"])
    out = {
        r["i"]: r["ewma"]
        for r in ewma_smooth(df, ["s"], ["i"], "v", alpha=0.5, span_k=2).collect()
    }
    # t0: only w0 present -> renormalizes to the raw value
    assert out[0] == 10.0
    # t1: (0.5*20 + 0.25*10) / 0.75
    assert out[1] == pytest.approx(16.666667, abs=1e-6)
    # t2: (0.5*30 + 0.25*20) / 0.75
    assert out[2] == pytest.approx(26.666667, abs=1e-6)


def test_ewma_skips_nulls_and_isolates_series(spark):
    from python_vegindex_spark.operators.rate import ewma_smooth

    rows = [
        ("a", 0, 10.0),
        ("a", 1, None),   # gap-filled empty bucket
        ("a", 2, 30.0),
        ("b", 0, 99.0),
    ]
    df = spark.createDataFrame(rows, ["s", "i", "v"])
    out = {
        (r["s"], r["i"]): r["ewma"]
        for r in ewma_smooth(df, ["s"], ["i"], "v", alpha=0.5, span_k=3).collect()
    }
    # null row still gets its predecessors' trail: 0.25*10 / 0.25
    assert out[("a", 1)] == 10.0
    # t2: w0*30 + w2*10 (the null lag-1 term drops) / (w0 + w2)
    assert out[("a", 2)] == pytest.approx((0.5 * 30 + 0.125 * 10) / 0.625, abs=1e-6)
    assert out[("b", 0)] == 99.0  # series isolated


def test_ewma_validation():
    from python_vegindex_spark.operators.rate import ewma_weights

    with pytest.raises(ValueError, match="alpha"):
        ewma_weights(0.0, 4)
    with pytest.raises(ValueError, match="alpha"):
        ewma_weights(1.5, 4)
    with pytest.raises(ValueError, match="span_k"):
        ewma_weights(0.5, 0)


# ------------------------------------------------ linear_trend


def test_linear_trend_perfect_line(spark):
    from python_vegindex_spark.operators.rate import linear_trend

    # y = 2x + 5 at x = 0/10/20 s into the hour
    rows = [("a", _ts(0), 5), ("a", _ts(10), 25), ("a", _ts(20), 45)]
    df = spark.createDataFrame(rows, ["s", "ts", "v"])
    r = linear_trend(df, "hourly", ["s"], value_col="v").collect()[0]
    assert r["n"] == 3
    assert r["slope"] == pytest.approx(2.0)
    assert r["intercept"] == pytest.approx(5.0)  # value at bucket start
    assert r["corr"] == pytest.approx(1.0)


def test_linear_trend_degenerate_cases(spark):
    from python_vegindex_spark.operators.rate import linear_trend

    rows = [
        ("flat", _ts(0), 7), ("flat", _ts(30), 7),        # zero y-variance
        ("one", _ts(5), 3),                               # n = 1
        ("same_x", _ts(10), 1), ("same_x", _ts(10), 9),   # zero x-variance
        ("null", _ts(0), None), ("null", _ts(20), 4),     # null dropped -> n=1
    ]
    df = spark.createDataFrame(rows, ["s", "ts", "v"])
    out = {r["s"]: r for r in linear_trend(df, "hourly", ["s"], value_col="v").collect()}
    assert out["flat"]["slope"] == 0.0 and out["flat"]["corr"] is None
    assert out["one"]["slope"] is None and out["one"]["intercept"] is None
    assert out["same_x"]["slope"] is None
    assert out["null"]["n"] == 1 and out["null"]["slope"] is None
    with pytest.raises(ValueError):
        linear_trend(df, "fortnightly", ["s"], value_col="v")


# --------------------------------------------- distinct_rollup


def test_distinct_rollup_exact_and_null_keys(spark):
    from python_vegindex_spark.operators.rate import distinct_rollup

    rows = [
        ("a", _ts(0), 1), ("a", _ts(1), 1), ("a", _ts(2), 2),
        ("a", _ts(3), None),                 # row counted, key not
        ("a", _ts(3700), 1),                 # next hour
    ]
    df = spark.createDataFrame(rows, ["s", "ts", "uid"])
    out = {
        r["bucket_start"].hour: (r["n_rows"], r["n_distinct"])
        for r in distinct_rollup(df, "hourly", ["s"], "uid").collect()
    }
    assert out == {0: (4, 2), 1: (1, 1)}


def test_distinct_rollup_approx_close_to_exact(spark):
    from python_vegindex_spark.operators.rate import distinct_rollup

    rows = [("a", _ts(i % 3000), i % 500) for i in range(5000)]
    df = spark.createDataFrame(rows, ["s", "ts", "uid"])
    exact = distinct_rollup(df, "hourly", ["s"], "uid").collect()[0]
    approx = distinct_rollup(df, "hourly", ["s"], "uid", approx=True).collect()[0]
    assert exact["n_distinct"] == 500
    assert abs(approx["n_distinct"] - 500) <= 50  # rsd=0.05 -> ~2 sigma


# ------------------------------------------ histogram_quantile


def test_histogram_quantile_interpolation_and_edges(spark):
    from python_vegindex_spark.operators.downsample import (
        histogram_quantile,
        value_heatmap,
    )

    # bins at width 10: [0,10) x5 rows, [10,20) x5 rows
    rows = [("a", _ts(i), float(i)) for i in range(10)] + [
        ("a", _ts(10 + i), 10.0 + i) for i in range(10)
    ]
    df = spark.createDataFrame(
        [(s, t, v) for (s, t, v) in rows][:10] + rows[10:], ["s", "ts", "value"]
    )
    hm = value_heatmap(df, tier="hourly", bin_width=10.0, series_cols=["s"])
    est = lambda q: histogram_quantile(hm, q, 10.0, ["s"]).collect()[0]["est"]
    # target q*20: 0.5 -> 10 at cum boundary -> upper edge of bin 0
    assert est(0.5) == 10.0
    # 0.9 -> target 18 -> bin 1: 10 + 10*(18-10)/10
    assert est(0.9) == 18.0
    # q=1 -> upper edge of the last occupied bin
    assert est(1.0) == 20.0


def test_histogram_quantile_negative_bins_and_validation(spark):
    from python_vegindex_spark.operators.downsample import (
        histogram_quantile,
        value_heatmap,
    )

    rows = [("a", _ts(0), -5.0), ("a", _ts(1), 5.0)]
    df = spark.createDataFrame(rows, ["s", "ts", "value"])
    hm = value_heatmap(df, tier="hourly", bin_width=10.0, series_cols=["s"])
    r = histogram_quantile(hm, 0.5, 10.0, ["s"]).collect()[0]
    # target 1 -> falls in bin -1: -10 + 10*(1-0)/1
    assert r["est"] == 0.0 and r["total_n"] == 2
    with pytest.raises(ValueError, match="q must"):
        histogram_quantile(hm, 0.0, 10.0, ["s"])
    with pytest.raises(ValueError, match="q must"):
        histogram_quantile(hm, 1.5, 10.0, ["s"])
    with pytest.raises(ValueError, match="bin_width"):
        histogram_quantile(hm, 0.5, 0.0, ["s"])


def test_trend_distinct_ewma_histq_plans_jvm_only(spark):
    from python_vegindex_spark.operators.downsample import (
        histogram_quantile,
        value_heatmap,
    )
    from python_vegindex_spark.operators.rate import (
        distinct_rollup,
        ewma_smooth,
        linear_trend,
    )

    rows = [("a", _ts(i * 60), i, i % 7) for i in range(200)]
    df = spark.createDataFrame(rows, ["s", "ts", "v", "uid"])

    # trend: one hash-agg shuffle, like the rollup
    p = _plan(linear_trend(df, "hourly", ["s"], value_col="v"))
    assert p.count("Exchange hashpartitioning") == 1, p
    # ewma over pre-aggregated rows: the (series) window shuffle only
    pre = df.select("s", F.col("ts").alias("bucket_start"), F.col("v").alias("v_mean"))
    p = _plan(ewma_smooth(pre, ["s"], ["bucket_start"], "v_mean"))
    assert p.count("Exchange hashpartitioning") == 1, p
    # distinct: two-phase agg; histq: heatmap agg + window over aggregates
    for d in (
        distinct_rollup(df, "hourly", ["s"], "uid"),
        histogram_quantile(
            value_heatmap(df, "hourly", 10.0, ["s"], value_col="v"), 0.9, 10.0, ["s"]
        ),
    ):
        p = _plan(d)
        assert p.count("Exchange hashpartitioning") <= 2, p
    for op in (
        linear_trend(df, "hourly", ["s"], value_col="v"),
        ewma_smooth(pre, ["s"], ["bucket_start"], "v_mean"),
        distinct_rollup(df, "hourly", ["s"], "uid"),
        histogram_quantile(value_heatmap(df, "hourly", 10.0, ["s"], value_col="v"), 0.9, 10.0, ["s"]),
    ):
        p = _plan(op)
        for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
            assert marker not in p


# ---------------------------------------------- interval_coverage


def test_interval_coverage_merges_and_clips(spark):
    from python_vegindex_spark.operators.rate import interval_coverage

    rows = [
        # overlapping pair -> one island [0, 900s)
        ("a", _ts(0)), ("a", _ts(300)),
        # distinct island in the same hour [2000, 2600)
        ("a", _ts(2000)),
        # island spanning the hour edge [3500, 4100)
        ("a", _ts(3500)),
        # other series untouched
        ("b", _ts(10)),
    ]
    df = spark.createDataFrame(rows, ["s", "ts"])
    out = {
        (r["s"], r["bucket_start"].hour): r
        for r in interval_coverage(
            df, "hourly", ["s"], timeout_s=600
        ).collect()
    }
    a0 = out[("a", 0)]
    # [0,900) + [2000,2600) + [3500,3600) = 900 + 600 + 100 s
    assert a0["uptime_us"] == 1_600 * 1_000_000
    assert a0["n_islands"] == 3
    assert a0["uptime_frac"] == pytest.approx(1600 / 3600, abs=1e-6)
    a1 = out[("a", 1)]
    assert a1["uptime_us"] == 500 * 1_000_000 and a1["n_islands"] == 1
    assert out[("b", 0)]["uptime_us"] == 600 * 1_000_000


def test_interval_coverage_duplicate_ts_and_validation(spark):
    from python_vegindex_spark.operators.rate import interval_coverage

    rows = [("a", _ts(100)), ("a", _ts(100)), ("a", _ts(100))]
    df = spark.createDataFrame(rows, ["s", "ts"])
    r = interval_coverage(df, "hourly", ["s"], timeout_s=60).collect()
    assert len(r) == 1 and r[0]["uptime_us"] == 60_000_000
    assert r[0]["n_islands"] == 1
    with pytest.raises(ValueError, match="timeout_s"):
        interval_coverage(df, "hourly", ["s"], timeout_s=0)
    with pytest.raises(ValueError, match="fixed-width"):
        interval_coverage(df, "weekly", ["s"], timeout_s=60)


def test_interval_coverage_minute_tier_full_bucket(spark):
    from python_vegindex_spark.operators.rate import interval_coverage

    # heartbeats every 60 s with timeout 90 s -> continuous coverage
    rows = [("a", _ts(i * 60)) for i in range(10)]  # [0, 540] + 90 -> 630 s
    df = spark.createDataFrame(rows, ["s", "ts"])
    out = {
        r["bucket_start"].minute: r["uptime_frac"]
        for r in interval_coverage(df, "5min", ["s"], timeout_s=90).collect()
    }
    assert out[0] == 1.0 and out[5] == 1.0
    # third bucket covers [600, 630) of [600, 900)
    assert out[10] == pytest.approx(30 / 300, abs=1e-6)


def test_interval_coverage_plan_jvm_only(spark):
    from python_vegindex_spark.operators.rate import interval_coverage

    rows = [("a", _ts(i * 50)) for i in range(100)]
    df = spark.createDataFrame(rows, ["s", "ts"])
    p = _plan(interval_coverage(df, "hourly", ["s"], timeout_s=60))
    # window on (series) + island agg + bucket agg: raw rows shuffle once
    assert p.count("Exchange hashpartitioning") <= 3, p
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in p


# ------------------------------------- seasonal profile / deviation


def test_seasonal_profile_slots_and_moments(spark):
    from python_vegindex_spark.operators.rate import seasonal_profile

    # Mon 2024-01-01 10:xx twice, Tue 2024-01-02 10:xx once
    rows = [
        ("a", datetime(2024, 1, 1, 10, 5), 10),
        ("a", datetime(2024, 1, 1, 10, 50), 30),
        ("a", datetime(2024, 1, 2, 10, 5), 7),
        ("a", datetime(2024, 1, 2, 11, 5), None),  # dropped
    ]
    df = spark.createDataFrame(rows, ["s", "ts", "v"])
    out = {
        (r["dow"], r["hour"]): r
        for r in seasonal_profile(df, ["s"], value_col="v").collect()
    }
    mon = out[(2, 10)]  # Spark dayofweek: 1=Sun, 2=Mon
    assert mon["n"] == 2 and mon["mean"] == 20.0 and mon["std"] == 10.0
    tue = out[(3, 10)]
    assert tue["n"] == 1 and tue["mean"] == 7.0 and tue["std"] == 0.0
    assert (3, 11) not in out  # the NULL row contributed nothing


def test_seasonal_deviation_scores_against_slot(spark):
    from python_vegindex_spark.operators.rate import (
        seasonal_deviation,
        seasonal_profile,
    )

    # 12 Mondays at 10:00 with value 10, one spike of 40
    hist = [("a", datetime(2024, 1, 1, 10, 0) + timedelta(days=7 * i), 10)
            for i in range(12)]
    df = spark.createDataFrame(hist, ["s", "ts", "v"])
    prof = seasonal_profile(df, ["s"], value_col="v", round_to=None)
    live = spark.createDataFrame(
        [("a", datetime(2024, 6, 24, 10, 30), 40),   # Monday spike
         ("a", datetime(2024, 6, 24, 10, 31), 10),   # Monday normal
         ("a", datetime(2024, 6, 25, 10, 30), 40)],  # Tuesday: no slot
        ["s", "ts", "v"],
    )
    out = seasonal_deviation(
        live, prof, ["s"], value_col="v", threshold=3.0, min_baseline=10
    ).collect()
    by_ts = {r["ts"]: r for r in out}
    spike = by_ts[datetime(2024, 6, 24, 10, 30)]
    # slot mean 10, std 0 -> zero variance gate: z NULL, not flagged
    assert spike["base_n"] == 12 and spike["z"] is None
    assert spike["is_anomaly"] is False
    # give the slot real variance
    hist2 = hist + [("a", datetime(2024, 4, 1, 10, 0), 16)]
    prof2 = seasonal_profile(
        spark.createDataFrame(hist2, ["s", "ts", "v"]), ["s"],
        value_col="v", round_to=None,
    )
    out2 = {
        r["ts"]: r
        for r in seasonal_deviation(
            live, prof2, ["s"], value_col="v", threshold=3.0, min_baseline=10
        ).collect()
    }
    assert out2[datetime(2024, 6, 24, 10, 30)]["is_anomaly"] is True
    assert out2[datetime(2024, 6, 24, 10, 31)]["is_anomaly"] is False
    tue = out2[datetime(2024, 6, 25, 10, 30)]
    # unmatched slot: no baseline -> never flagged (anomaly_zscore's gate)
    assert tue["base_n"] is None and tue["is_anomaly"] is False


def test_seasonal_deviation_plan_is_broadcast_zero_shuffle(spark):
    from python_vegindex_spark.operators.rate import (
        seasonal_deviation,
        seasonal_profile,
    )

    rows = [("a", _ts(i * 3600), i % 5) for i in range(500)]
    df = spark.createDataFrame(rows, ["s", "ts", "v"])
    prof = seasonal_profile(df, ["s"], value_col="v")
    scored = seasonal_deviation(df, prof, ["s"], value_col="v")
    p = _plan(scored)
    assert "BroadcastHashJoin" in p, p
    # the RAW side must not shuffle: only the profile agg exchanges
    assert p.count("Exchange hashpartitioning") <= 1, p
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in p


def test_ewma_span_cap():
    from python_vegindex_spark.operators.rate import ewma_weights

    with pytest.raises(ValueError, match="span_k"):
        ewma_weights(0.5, 129)
    assert len(ewma_weights(0.5, 128)) == 128


def test_interval_coverage_boundary_exact_at_minute_grain(spark):
    """An island ending EXACTLY on a bucket boundary must not leak a
    zero-length row into the next bucket — the float-quotient trap the
    integer div avoids (bucket indices ~3e10 at 1min grain outgrow the
    double spacing of 1/step)."""
    from python_vegindex_spark.operators.rate import interval_coverage

    # timeout 60 s: island [2024-01-01 00:00:30, 00:01:30) at 1min grain
    # ends exactly on the 00:01:30? no — pick ts so end == boundary:
    # heartbeat at 00:00:00 + timeout 60 -> island [00:00, 00:01) ends
    # exactly at the 1min boundary
    df = spark.createDataFrame([("a", _ts(0))], ["s", "ts"])
    out = interval_coverage(df, "1min", ["s"], timeout_s=60).collect()
    assert len(out) == 1  # nothing in the second bucket
    assert out[0]["uptime_us"] == 60_000_000
    assert out[0]["uptime_frac"] == 1.0


def test_new_rate_ops_treat_nan_as_null(spark):
    from python_vegindex_spark.operators.rate import (
        ewma_smooth,
        linear_trend,
        seasonal_deviation,
        seasonal_profile,
    )

    nan = float("nan")
    # ewma: NaN bucket behaves exactly like a NULL one
    df = spark.createDataFrame(
        [("a", 0, 10.0), ("a", 1, nan), ("a", 2, 30.0)], ["s", "i", "v"]
    )
    out = {
        r["i"]: r["ewma"]
        for r in ewma_smooth(df, ["s"], ["i"], "v", alpha=0.5, span_k=3).collect()
    }
    assert out[1] == 10.0
    assert out[2] == pytest.approx((0.5 * 30 + 0.125 * 10) / 0.625, abs=1e-6)

    # trend: a NaN would otherwise cast to 0L and poison the sums
    tdf = spark.createDataFrame(
        [("a", _ts(0), 5.0), ("a", _ts(10), 25.0), ("a", _ts(20), nan)],
        ["s", "ts", "v"],
    )
    [tr] = linear_trend(tdf, "hourly", ["s"], value_col="v").collect()
    assert tr["n"] == 2 and tr["slope"] == pytest.approx(2.0)

    # seasonal: NaN rows never enter the profile and are never flagged
    hist = [("a", datetime(2024, 1, 1, 10, 0) + timedelta(days=7 * i), 10.0)
            for i in range(12)] + [("a", datetime(2024, 4, 1, 10, 0), 16.0)]
    pdf = spark.createDataFrame(hist + [("a", datetime(2024, 4, 8, 10, 0), nan)],
                                ["s", "ts", "v"])
    prof = seasonal_profile(pdf, ["s"], value_col="v", round_to=None)
    assert prof.collect()[0]["n"] == 13  # NaN row excluded
    live = spark.createDataFrame(
        [("a", datetime(2024, 6, 24, 10, 30), nan)], ["s", "ts", "v"]
    )
    [r] = seasonal_deviation(
        live, prof, ["s"], value_col="v", threshold=1.0, min_baseline=5
    ).collect()
    assert r["is_anomaly"] is False and r["z"] is None


# ------------------------------- period_over_period / threshold_alerts


def test_period_over_period_exact_offset(spark):
    from python_vegindex_spark.operators.rate import period_over_period

    rows = [
        ("a", _ts(0), 10.0),
        ("a", _ts(3600), 20.0),
        # hour 2 missing entirely
        ("a", _ts(3 * 3600), 40.0),
        ("b", _ts(3600), 99.0),  # other series: no bleed
    ]
    df = spark.createDataFrame(rows, ["s", "bucket_start", "v"])
    out = {
        (r["s"], r["bucket_start"]): r
        for r in period_over_period(
            df, ["s"], "bucket_start", "v", period_s=3600
        ).collect()
    }
    r0 = out[("a", _ts(0))]
    assert r0["prev_value"] is None and r0["pct_change"] is None
    r1 = out[("a", _ts(3600))]
    assert (r1["prev_value"], r1["delta"], r1["pct_change"]) == (10.0, 10.0, 1.0)
    # the gap means NO baseline (exact offset, not previous row)
    r3 = out[("a", _ts(3 * 3600))]
    assert r3["prev_value"] is None
    assert out[("b", _ts(3600))]["prev_value"] is None
    with pytest.raises(ValueError, match="period_s"):
        period_over_period(df, ["s"], "bucket_start", "v", period_s=0)


def test_threshold_alerts_hysteresis(spark):
    from python_vegindex_spark.operators.rate import threshold_alerts

    vals = [1.0, 12.0, 11.0, 5.0, 2.0, 15.0, float("nan"), 2.0]
    rows = [("a", _ts(i), i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["s", "ts", "eid", "v"])
    out = (
        threshold_alerts(df, ["s"], hi=10, lo=3, value_col="v", order_cols=["eid"])
        .orderBy("eid")
        .collect()
    )
    assert [r["alert_state"] for r in out] == [0, 1, 1, 1, 0, 1, 1, 0]
    assert [r["episode"] for r in out] == [0, 1, 1, 1, 1, 2, 2, 2]
    with pytest.raises(ValueError, match="hi > lo"):
        threshold_alerts(df, ["s"], hi=3, lo=10, value_col="v")


def test_pop_alerts_plans_jvm_only(spark):
    from python_vegindex_spark.operators.rate import (
        period_over_period,
        threshold_alerts,
    )

    pre = spark.createDataFrame(
        [("a", _ts(i * 3600), float(i)) for i in range(100)],
        ["s", "bucket_start", "v"],
    )
    pop = period_over_period(pre, ["s"], "bucket_start", "v", period_s=3600)
    p = _plan(pop)
    assert p.count("Exchange hashpartitioning") == 1, p  # the window only

    raw = spark.createDataFrame(
        [("a", _ts(i), i, float(i % 40)) for i in range(200)],
        ["s", "ts", "eid", "v"],
    )
    al = threshold_alerts(raw, ["s"], hi=30, lo=5, value_col="v",
                          order_cols=["eid"])
    p = _plan(al)
    assert p.count("Exchange hashpartitioning") == 1, p  # one series window
    for op in (pop, al):
        p = _plan(op)
        for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
            assert marker not in p


# ---------------------------------------------------------------------------
# cusum_changepoints
# ---------------------------------------------------------------------------

def test_cusum_hand_sequence(spark):
    """Hand-walked two-sided CUSUM: a level shift alarms, state resets,
    episode numbering advances; a stable series never alarms."""
    import math

    from python_vegindex_spark.operators.rate import cusum_changepoints

    # series 'a': 6 low values then 6 high ones (a clear upward shift);
    # series 'b': constant (sd == 0 -> z == 0 -> S decays at -k, no alarm)
    vals_a = [10, 10, 10, 10, 10, 10, 20, 20, 20, 20, 20, 20]
    rows = [("a", _ts(i * 3600), v) for i, v in enumerate(vals_a)]
    rows += [("b", _ts(i * 3600), 7) for i in range(5)]
    df = spark.createDataFrame(rows, ["s", "bucket_start", "v"])
    out = cusum_changepoints(
        df, ["s"], order_col="bucket_start", value_col="v", k=0.5, h=2.2
    )
    got = {
        (r["s"], r["bucket_start"]): r
        for r in out.collect()
    }

    # python reference walk for series 'a'
    n = len(vals_a)
    mean = sum(vals_a) / n
    sd = math.sqrt(sum(v * v for v in vals_a) / n - mean * mean)
    sp = sn = 0.0
    ep = 0
    for i, v in enumerate(vals_a):
        z = (v - mean) / sd
        sp = max(0.0, sp + z - 0.5)
        sn = max(0.0, sn - z - 0.5)
        al = sp > 2.2 or sn > 2.2
        r = got[("a", _ts(i * 3600))]
        assert r["s_pos"] == sp and r["s_neg"] == sn and r["alarm"] == al
        if al:
            ep += 1
            sp = sn = 0.0
        assert r["episode"] == ep
    assert ep == 2  # one alarm per side of the shift

    for i in range(5):
        r = got[("b", _ts(i * 3600))]
        assert r["alarm"] is False and r["s_pos"] == 0.0 and r["s_neg"] == 0.0


def test_holt_hand_sequence(spark):
    """Hand-walked Holt smoothing: level/trend/fitted recursion, the
    b1 = x2 - x1 init, the single-row trend-0 edge, series isolation."""
    from python_vegindex_spark.operators.rate import holt_smooth

    a, g = 0.5, 0.25
    xs = [10, 14, 12, 20]
    rows = [("a", _ts(i * 3600), v) for i, v in enumerate(xs)]
    rows.append(("solo", _ts(0), 42))
    df = spark.createDataFrame(rows, ["s", "bucket_start", "v"])
    out = holt_smooth(df, ["s"], "bucket_start", "v", alpha=a, beta=g)
    got = {(r["s"], r["bucket_start"]): r for r in out.collect()}

    l, b = float(xs[0]), float(xs[1] - xs[0])
    r0 = got[("a", _ts(0))]
    assert (r0["level"], r0["trend"], r0["fitted"]) == (l, b, None)
    for t in range(1, len(xs)):
        fit = l + b
        lvl = a * xs[t] + (1.0 - a) * (l + b)
        b = g * (lvl - l) + (1.0 - g) * b
        r = got[("a", _ts(t * 3600))]
        assert (r["level"], r["trend"], r["fitted"]) == (lvl, b, fit)
        l = lvl

    solo = got[("solo", _ts(0))]
    assert (solo["level"], solo["trend"], solo["fitted"]) == (42.0, 0.0, None)


def test_value_drift_planted(spark):
    """Identical halves -> 0; disjoint supports -> 1 (total-variation
    distance); a shifted half -> strictly between; empty side -> NULL;
    validation."""
    import datetime as dt

    from python_vegindex_spark.operators.downsample import value_drift

    t0 = dt.datetime(2024, 1, 1)
    split = dt.datetime(2024, 1, 2)

    def rows(series, before_vals, after_vals):
        out = [(series, t0 + dt.timedelta(minutes=i), float(v))
               for i, v in enumerate(before_vals)]
        out += [(series, split + dt.timedelta(minutes=i), float(v))
                for i, v in enumerate(after_vals)]
        return out

    same = rows("same", [1, 2, 3, 4] * 5, [1, 2, 3, 4] * 5)
    disjoint = rows("disjoint", [1, 2] * 6, [100, 101] * 6)
    shifted = rows("shifted", [1, 1, 2, 2] * 5, [1, 2, 2, 3] * 5)
    onesided = [("onesided", t0, 1.0)]
    df = spark.createDataFrame(
        same + disjoint + shifted + onesided,
        "series string, ts timestamp, value double",
    )
    got = {
        r["series"]: r
        for r in value_drift(df, split, ["series"], bin_width=1.0).collect()
    }
    assert got["same"]["drift"] == 0.0
    assert got["disjoint"]["drift"] == 1.0
    assert 0.0 < got["shifted"]["drift"] < 1.0
    assert got["onesided"]["drift"] is None
    assert (got["same"]["n_before"], got["same"]["n_after"]) == (20, 20)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        value_drift(df, split, ["series"], bin_width=0.0)
