"""Hand-built cases for the bar/state/rolling-quantile/gap operators.

ohlc_bars (operators/bars.py), state_durations (operators/funnel.py),
sliding_time_quantile + gap_report (operators/rate.py).
"""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark.sql import functions as F

from python_vegindex_spark.operators.bars import ohlc_bars
from python_vegindex_spark.operators.funnel import state_durations
from python_vegindex_spark.operators.rate import gap_report, sliding_time_quantile


def _ts(h, m=0, s=0, d=1):
    return datetime(2024, 3, d, h, m, s)


# ---------------------------------------------------------------- ohlc


def test_ohlc_hand_values(spark):
    rows = [
        # series a, hour 10: open=4 (earliest), high=9, low=1, close=6
        ("a", _ts(10, 0), 4.0, 2.0, 1),
        ("a", _ts(10, 15), 9.0, 1.0, 2),
        ("a", _ts(10, 30), 1.0, 3.0, 3),
        ("a", _ts(10, 45), 6.0, 4.0, 4),
        # series b, single row: open=high=low=close
        ("b", _ts(10, 5), 5.0, 10.0, 5),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double, w double, id int")
    out = ohlc_bars(
        df, "hourly", ["k"], value_col="v", weight_col="w", order_cols=["id"]
    ).orderBy("k")
    a, b = out.collect()
    assert (a["open"], a["high"], a["low"], a["close"], a["n"]) == (4.0, 9.0, 1.0, 6.0, 4)
    # vwap = (4*2 + 9*1 + 1*3 + 6*4) / (2+1+3+4) = 44/10
    assert a["vwap"] == pytest.approx(4.4)
    assert a["w_sum"] == 10.0
    assert (b["open"], b["close"], b["vwap"]) == (5.0, 5.0, 5.0)
    assert a["bucket_start"] == _ts(10)


def test_ohlc_tie_break_and_nan(spark):
    rows = [
        # two rows at the identical ts: order col id decides open/close
        ("a", _ts(10, 0), 7.0, 1.0, 2),
        ("a", _ts(10, 0), 3.0, 1.0, 1),  # id=1 -> open
        ("a", _ts(10, 59), 8.0, 1.0, 3),
        # NaN value and NaN weight rows are dropped entirely
        ("a", _ts(10, 30), float("nan"), 1.0, 4),
        ("a", _ts(10, 31), 99.0, float("nan"), 5),
        ("a", None, 55.0, 1.0, 6),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double, w double, id int")
    r = ohlc_bars(
        df, "hourly", ["k"], value_col="v", weight_col="w", order_cols=["id"]
    ).collect()[0]
    assert r["n"] == 3
    assert r["open"] == 3.0  # tie broken by id
    assert r["close"] == 8.0
    assert r["high"] == 8.0 and r["low"] == 3.0


def test_ohlc_no_weight_col(spark):
    df = spark.createDataFrame(
        [("a", _ts(10, 1), 2.0), ("a", _ts(10, 2), 6.0)], "k string, ts timestamp, v double"
    )
    out = ohlc_bars(df, "hourly", ["k"], value_col="v")
    assert "vwap" not in out.columns and "w_sum" not in out.columns
    r = out.collect()[0]
    assert (r["open"], r["close"]) == (2.0, 6.0)


# ------------------------------------------------------- state durations


def test_state_durations_hand_case(spark):
    rows = [
        ("u1", _ts(10, 0), "A"),
        ("u1", _ts(10, 30), "B"),
        ("u1", _ts(11, 15), "A"),
    ]
    df = spark.createDataFrame(rows, "u string, ts timestamp, state string")
    out = state_durations(
        df, "hourly", ["u"], "state", through=_ts(12, 0)
    ).orderBy("bucket_start", "state")
    got = {
        (r["bucket_start"], r["state"]): (r["dur_us"], r["n_samples"])
        for r in out.collect()
    }
    m = 60 * 1_000_000
    assert got == {
        (_ts(10), "A"): (30 * m, 1),
        (_ts(10), "B"): (30 * m, 1),
        (_ts(11), "B"): (15 * m, 0),  # carried across the edge, starts in 10h
        (_ts(11), "A"): (45 * m, 1),
    }
    fr = {
        (r["bucket_start"], r["state"]): r["dur_frac"]
        for r in out.collect()
    }
    assert fr[(_ts(11), "A")] == pytest.approx(0.75)


def test_state_durations_cut_and_ties(spark):
    rows = [
        ("u1", _ts(10, 0), "A"),
        ("u1", _ts(10, 0), "X"),  # zero-width tie: contributes nothing
        ("u1", _ts(10, 30), "B"),
        ("u1", _ts(13, 0), "C"),  # at/after the cut: dropped
    ]
    df = spark.createDataFrame(rows, "u string, ts timestamp, state string")
    out = state_durations(df, "hourly", ["u"], "state", through=_ts(11, 0))
    got = {(r["bucket_start"], r["state"]): r["dur_us"] for r in out.collect()}
    m = 60 * 1_000_000
    # one of A/X is the zero-width tie (order under ties is not pinned
    # without order_cols, but the zero-width row vanishes either way)
    assert got.pop((_ts(10), "B")) == 30 * m
    assert len(got) == 1 and set(got.values()) == {30 * m}
    assert set(k[1] for k in got) <= {"A", "X"}


def test_state_durations_multiday_span(spark):
    # one sample holding across three daily buckets
    df = spark.createDataFrame(
        [("u", datetime(2024, 3, 1, 18), "S")], "u string, ts timestamp, state string"
    )
    out = state_durations(
        df, "daily", ["u"], "state", through=datetime(2024, 3, 3, 6)
    ).orderBy("bucket_start")
    rows = out.collect()
    h = 3600 * 1_000_000
    assert [(r["bucket_start"].day, r["dur_us"], r["n_samples"]) for r in rows] == [
        (1, 6 * h, 1),
        (2, 24 * h, 0),
        (3, 6 * h, 0),
    ]


def test_state_durations_validation(spark):
    df = spark.createDataFrame(
        [("u", _ts(10), "A")], "u string, ts timestamp, state string"
    )
    with pytest.raises(ValueError, match="fixed-width"):
        state_durations(df, "weekly", ["u"], "state", through=_ts(12))


# ------------------------------------------------------ rolling quantile


def test_sliding_quantile_hand_values(spark):
    rows = [
        ("a", _ts(10, 0, 0), 5.0),
        ("a", _ts(10, 0, 30), 1.0),
        ("a", _ts(10, 1, 0), 9.0),
        ("a", _ts(10, 3, 0), 3.0),  # old rows aged out (window 60s)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = sliding_time_quantile(
        df, window_s=60, q=0.5, series_cols=["k"], value_col="v"
    ).orderBy("ts")
    meds = [r["w_quantile"] for r in out.collect()]
    # frames: [5], [5,1], [5,1,9], [3]
    assert meds == [5.0, 3.0, 5.0, 3.0]


def test_sliding_quantile_nan_excluded_and_ties_are_peers(spark):
    rows = [
        ("a", _ts(10, 0, 0), 2.0),
        ("a", _ts(10, 0, 10), float("nan")),
        ("a", _ts(10, 0, 20), 4.0),
        ("a", _ts(10, 0, 20), 6.0),  # ts tie: both are peers
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = sliding_time_quantile(
        df, window_s=3600, q=0.5, series_cols=["k"], value_col="v"
    )
    tied = [r["w_quantile"] for r in out.collect() if r["ts"] == _ts(10, 0, 20)]
    # both tied rows see {2,4,6} (NaN excluded): median 4
    assert tied == [4.0, 4.0]


def test_sliding_quantile_validation(spark):
    df = spark.createDataFrame([("a", _ts(10), 1.0)], "k string, ts timestamp, v double")
    with pytest.raises(ValueError):
        sliding_time_quantile(df, window_s=0, q=0.5, series_cols=["k"])
    with pytest.raises(ValueError):
        sliding_time_quantile(df, window_s=60, q=1.5, series_cols=["k"])


# ------------------------------------------------------------ gap report


def test_gap_report_hand_case(spark):
    rows = [
        ("a", _ts(10, 0)),
        ("a", _ts(10, 1)),   # 60s gap: below threshold
        ("a", _ts(10, 31)),  # 1800s gap: reported
        ("a", _ts(10, 31)),  # tie: zero gap, never reported
        ("b", _ts(9, 0)),    # other series: first sample, no gap vs a
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    out = gap_report(df, min_gap_s=120, series_cols=["k"])
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["k"], r["gap_start"], r["gap_end"]) == ("a", _ts(10, 1), _ts(10, 31))
    assert r["gap_us"] == 1800 * 1_000_000 and r["gap_s"] == 1800.0


def test_gap_report_threshold_inclusive(spark):
    df = spark.createDataFrame(
        [("a", _ts(10, 0)), ("a", _ts(10, 2))], "k string, ts timestamp"
    )
    assert gap_report(df, min_gap_s=120, series_cols=["k"]).count() == 1
    assert gap_report(df, min_gap_s=120.001, series_cols=["k"]).count() == 0
    with pytest.raises(ValueError):
        gap_report(df, min_gap_s=0, series_cols=["k"])


# ------------------------------------------------------- holt-winters


def test_holt_winters_hand_sequence(spark):
    from python_vegindex_spark.operators.rate import holt_winters_smooth

    rows = [("s", i, x) for i, x in enumerate([10, 14, 13, 17])]
    df = spark.createDataFrame(rows, "k string, bucket_start int, v long")
    out = (
        holt_winters_smooth(
            df, ["k"], season_len=2, value_col="v", alpha=0.5, beta=0.5, gamma=0.5
        )
        .orderBy("bucket_start")
        .collect()
    )
    got = [(r["level"], r["trend"], r["seasonal"], r["fitted"]) for r in out]
    assert got[0] == (None, None, -2.0, None)
    assert got[1] == (12.0, 1.5, 2.0, None)
    assert got[2] == (14.25, 1.875, -1.25, 11.5)
    assert got[3] == (15.5625, 1.59375, 1.4375, 18.125)


def test_holt_winters_short_series_and_validation(spark):
    import pytest as _pytest

    from python_vegindex_spark.operators.rate import holt_winters_smooth

    rows = [("a", 0, 5), ("a", 1, 6), ("a", 2, 9), ("b", 0, 4)]
    df = spark.createDataFrame(rows, "k string, bucket_start int, v long")
    out = holt_winters_smooth(df, ["k"], season_len=2, value_col="v").orderBy(
        "k", "bucket_start"
    )
    rs = out.collect()
    # series a: n=3 in [m, 2m) -> zero initial trend; recursion still runs
    a = [r for r in rs if r["k"] == "a"]
    assert a[1]["level"] == 5.5 and a[1]["trend"] == 0.0
    assert a[2]["fitted"] is not None
    # series b: n=1 < m -> all smoothing columns NULL
    b = [r for r in rs if r["k"] == "b"][0]
    assert b["level"] is None and b["seasonal"] is None and b["fitted"] is None
    with _pytest.raises(ValueError):
        holt_winters_smooth(df, ["k"], season_len=1, value_col="v")
    with _pytest.raises(ValueError):
        holt_winters_smooth(df, ["k"], season_len=2, value_col="v", alpha=1.0)


# --------------------------------------------------------------- SAX


def test_sax_symbols_hand_case(spark):
    from python_vegindex_spark.operators.sax import sax_symbols

    # series a: hourly values with mean 20, pop std 10 over {10,20,30}x4
    rows = []
    for d_, v in [(1, 10), (2, 20), (3, 30), (4, 10), (5, 20), (6, 30)]:
        rows += [("a", datetime(2024, 3, d_, 0), v), ("a", datetime(2024, 3, d_, 1), v)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v long")
    out = sax_symbols(
        df, "daily", ["k"], value_col="v", alphabet_size=4
    ).orderBy("bucket_start")
    rs = out.collect()
    # mu = 20, sigma = sqrt(500/6*... ) -> z = (paa-20)/sigma; day means
    # are 10/20/30 so z ~ -1.22/0/1.22: symbols a, c, d (z=0 >= bp 0.0)
    assert [r["symbol"] for r in rs] == ["a", "c", "d", "a", "c", "d"]
    assert all(r["n"] == 2 for r in rs)
    assert rs[0]["paa_mean"] == 10.0 and rs[1]["paa_mean"] == 20.0


def test_sax_zero_variance_and_validation(spark):
    import pytest as _pytest

    from python_vegindex_spark.operators.sax import sax_symbols

    df = spark.createDataFrame(
        [("c", datetime(2024, 3, 1), 5), ("c", datetime(2024, 3, 2), 5)],
        "k string, ts timestamp, v long",
    )
    rs = sax_symbols(df, "daily", ["k"], value_col="v").collect()
    assert all(r["symbol"] is None and r["z"] is None for r in rs)
    with _pytest.raises(ValueError):
        sax_symbols(df, "daily", ["k"], value_col="v", alphabet_size=26)


def test_sax_motifs_counting_and_gaps(spark):
    from python_vegindex_spark.operators.sax import sax_motifs

    rows = [
        ("a", 1, "a"), ("a", 2, "b"), ("a", 3, "a"), ("a", 4, "b"),
        ("a", 5, "a"), ("a", 6, None), ("a", 7, "b"), ("a", 8, "a"),
    ]
    df = spark.createDataFrame(rows, "k string, bucket_start int, symbol string")
    out = sax_motifs(df, ["k"], word_len=2)
    got = {r["word"]: r["cnt"] for r in out.collect()}
    # pairs: ab, ba, ab, ba, (a,NULL)x, (NULL,b)x, ba ... walk:
    # rows 1-2 ab, 2-3 ba, 3-4 ab, 4-5 ba, 5-6 NULL, 6-7 NULL, 7-8 ba
    assert got == {"ab": 2, "ba": 3}


# ----------------------------------------------------------- diversity


def test_category_diversity_hand_case(spark):
    from python_vegindex_spark.operators.generic_rollup import category_diversity

    rows = (
        [("s", _ts(10, i), "x") for i in range(3)]
        + [("s", _ts(10, 30 + i), "y") for i in range(2)]
        + [("s", _ts(10, 50), "z")]
        + [("s", _ts(11, 0), "only")]          # second bucket: n=1
        + [("s", _ts(11, 5), None)]            # NULL key dropped
    )
    df = spark.createDataFrame(rows, "k string, ts timestamp, key string")
    out = category_diversity(df, "hourly", ["k"], "key").orderBy("bucket_start")
    b0, b1 = out.collect()
    # bucket 10h: counts {3,2,1}, n=6: simpson = 1 - 14/36, pie = 1 - 8/30
    assert b0["n"] == 6 and b0["k_distinct"] == 3
    assert b0["top_share"] == pytest.approx(0.5)
    assert b0["simpson"] == pytest.approx(1 - 14 / 36, abs=1e-6)
    assert b0["pie"] == pytest.approx(1 - 8 / 30, abs=1e-6)
    # bucket 11h: single row -> simpson 0, pie NULL
    assert b1["n"] == 1 and b1["simpson"] == 0.0 and b1["pie"] is None


# ------------------------------------------------------ bollinger bands


def test_bollinger_hand_values(spark):
    from python_vegindex_spark.operators.bars import bollinger_bands

    rows = [
        ("a", _ts(10, 0, 0), 2),
        ("a", _ts(10, 0, 30), 4),
        ("a", _ts(10, 2, 0), 6),  # first two aged out (60s window)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v long")
    out = bollinger_bands(
        df, window_s=60, series_cols=["k"], k=2.0, value_col="v"
    ).orderBy("ts")
    r1, r2, r3 = out.collect()
    # frame [2]: mean 2, std 0, bands collapse, pos NULL (zero width)
    assert (r1["w_n"], r1["bb_mean"], r1["bb_std"], r1["bb_pos"]) == (1, 2.0, 0.0, None)
    # frame [2,4]: mean 3, std 1 -> bands [1, 5]; row value 4 -> pos 0.75
    assert (r2["w_n"], r2["bb_mean"], r2["bb_std"]) == (2, 3.0, 1.0)
    assert (r2["bb_upper"], r2["bb_lower"], r2["bb_pos"]) == (5.0, 1.0, 0.75)
    # frame [6]: window restarted
    assert (r3["w_n"], r3["bb_mean"]) == (1, 6.0)


def test_bollinger_nan_and_validation(spark):
    import pytest as _pytest

    from python_vegindex_spark.operators.bars import bollinger_bands

    df = spark.createDataFrame(
        [("a", _ts(10, 0, 0), 2.0), ("a", _ts(10, 0, 10), float("nan")),
         ("a", _ts(10, 0, 20), 4.0)],
        "k string, ts timestamp, v double",
    )
    rows = bollinger_bands(df, 3600, ["k"], value_col="v").orderBy("ts").collect()
    assert rows[1]["w_n"] == 1 and rows[1]["bb_pos"] is None  # NaN row excluded
    assert rows[2]["w_n"] == 2 and rows[2]["bb_mean"] == 3.0
    with _pytest.raises(ValueError):
        bollinger_bands(df, 0, ["k"])
    with _pytest.raises(ValueError):
        bollinger_bands(df, 60, ["k"], k=0)


# ------------------------------------------------------- cap per group


def test_cap_per_group_exact_and_nested(spark):
    from pyspark.sql import Window

    from python_vegindex_spark.operators.sampling import cap_per_group, sample_key

    df = spark.createDataFrame(
        [(f"g{i % 3}", i) for i in range(60)], "grp string, id long"
    )
    capped = cap_per_group(df, ["grp"], cap=5, key_cols=["id"])
    rows = capped.collect()
    from collections import Counter

    assert Counter(r["grp"] for r in rows) == {"g0": 5, "g1": 5, "g2": 5}
    assert all(1 <= r["grp_rank"] <= 5 for r in rows)
    # differential vs the naive single window (the two-phase claim)
    naive = (
        df.withColumn("_d", sample_key(["id"]))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("grp").orderBy(F.col("_d").asc(), F.col("id").asc())
            ),
        )
        .where(F.col("rk") <= 5)
    )
    assert {(r["grp"], r["id"]) for r in rows} == {
        (r["grp"], r["id"]) for r in naive.collect()
    }
    # nesting: cap=2 survivors are a subset of cap=5 survivors
    two = {(r["grp"], r["id"]) for r in cap_per_group(df, ["grp"], 2, ["id"]).collect()}
    assert two < {(r["grp"], r["id"]) for r in rows}


def test_cap_per_group_small_groups_and_validation(spark):
    import pytest as _pytest

    from python_vegindex_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], "grp string, id long")
    out = cap_per_group(df, ["grp"], cap=10, key_cols=["id"])
    assert out.count() == 3  # groups under the cap pass through whole
    with _pytest.raises(ValueError):
        cap_per_group(df, ["grp"], 0, ["id"])


# ----------------------------------------------------- dimensional cube


def test_dimensional_rollup_hand_case(spark):
    from python_vegindex_spark.operators.generic_rollup import dimensional_rollup

    rows = [
        ("web", "en", 10), ("web", "en", 20), ("web", "de", 5),
        ("app", "en", 1), ("app", None, 2),  # NULL dim VALUE, not subtotal
    ]
    df = spark.createDataFrame(rows, "src string, lang string, v long")
    out = dimensional_rollup(df, ["src", "lang"], "v", mode="cube")
    got = {
        (r["src"], r["lang"], r["gid"]): (r["n"], r["v_sum"]) for r in out.collect()
    }
    # concrete cells (gid=0) — includes the genuine NULL lang value
    assert got[("web", "en", 0)] == (2, 30)
    assert got[("app", None, 0)] == (1, 2)
    # lang subtotals (gid=1: lang rolled up)
    assert got[("web", None, 1)] == (3, 35)
    assert got[("app", None, 1)] == (2, 3)
    # src subtotals (gid=2) and grand total (gid=3)
    assert got[(None, "en", 2)] == (3, 31)
    assert got[(None, None, 3)] == (5, 38)
    # cube = 4 sets; rollup drops the (None, lang) set
    roll = dimensional_rollup(df, ["src", "lang"], "v", mode="rollup")
    gids = {r["gid"] for r in roll.collect()}
    assert gids == {0, 1, 3}


def test_dimensional_rollup_bucketed_and_validation(spark):
    import pytest as _pytest

    from python_vegindex_spark.operators.generic_rollup import dimensional_rollup

    rows = [
        ("a", _ts(10, 0), 1), ("a", _ts(10, 30), 2), ("b", _ts(11, 0), 4),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v long")
    out = dimensional_rollup(
        df, ["k"], "v", mode="cube", ts_col="ts", tier="hourly"
    )
    got = {(r["k"], r["bucket_start"], r["gid"]): r["v_sum"] for r in out.collect()}
    # bucket never subtotals: every row has a concrete bucket_start
    assert all(k[1] is not None for k in got)
    assert got[("a", _ts(10), 0)] == 3
    assert got[(None, _ts(10), 1)] == 3  # k rolled up within the bucket
    assert got[(None, _ts(11), 1)] == 4
    with _pytest.raises(ValueError):
        dimensional_rollup(df, ["k"], "v", mode="matrix")
    with _pytest.raises(ValueError):
        dimensional_rollup(df, ["k"], "v", ts_col="ts")


def test_dimensional_rollup_bucketed_rollup_mode(spark):
    """ROLLUP + bucket: the bucket must survive every subtotal level
    (it leads the rollup order), so per-bucket grand totals exist."""
    from python_vegindex_spark.operators.generic_rollup import dimensional_rollup

    rows = [
        ("a", "x", _ts(10, 0), 1), ("a", "y", _ts(10, 30), 2),
        ("b", "x", _ts(10, 40), 4), ("a", "x", _ts(11, 0), 8),
    ]
    df = spark.createDataFrame(rows, "k string, j string, ts timestamp, v long")
    out = dimensional_rollup(
        df, ["k", "j"], "v", mode="rollup", ts_col="ts", tier="hourly"
    )
    got = {
        (r["k"], r["j"], r["bucket_start"], r["gid"]): r["v_sum"]
        for r in out.collect()
    }
    assert all(key[2] is not None for key in got)  # bucket never subtotaled
    assert got[("a", "x", _ts(10), 0)] == 1
    assert got[("a", None, _ts(10), 1)] == 3      # j rolled up
    assert got[(None, None, _ts(10), 3)] == 7     # per-bucket grand total
    assert got[(None, None, _ts(11), 3)] == 8
    # rollup lattice only: gid=2 (k rolled, j concrete) must NOT exist
    assert not any(key[3] == 2 for key in got)


# ---------------------------------------------------------------- BM25


def test_bm25_hand_reference(spark):
    import math

    from python_vegindex_spark.operators.terms import bm25_search

    corpus = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "cherry cherry cherry durian"),
        (4, "apple"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = bm25_search(df, ["apple", "cherry"], k=10).collect()

    # independent reference
    toks = {i: t.split() for i, t in corpus}
    N = len(toks)
    avg = sum(len(v) for v in toks.values()) / N
    dfs = {
        t: sum(1 for v in toks.values() if t in v) for t in ("apple", "cherry")
    }
    def score(i):
        s = 0.0
        for t in ("apple", "cherry"):
            tf = toks[i].count(t)
            if not tf:
                continue
            idf = math.log(1.0 + (N - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(toks[i]) / avg))
        return s

    exp = {i: score(i) for i in toks if score(i) > 0}
    assert {r["doc_id"] for r in got} == set(exp)
    for r in got:
        assert r["score"] == pytest.approx(exp[r["doc_id"]], abs=1e-6)
    # ranking follows (score desc, id asc)
    ranked = sorted(got, key=lambda r: r["rank"])
    assert [r["doc_id"] for r in ranked] == sorted(
        exp, key=lambda i: (-round(exp[i], 6), i)
    )


def test_bm25_case_fold_and_validation(spark):
    import pytest as _pytest

    from python_vegindex_spark.operators.terms import bm25_search

    df = spark.createDataFrame([(1, "Apple APPLE"), (2, "pear")], "doc_id long, text string")
    got = bm25_search(df, ["APPLE"], k=5).collect()
    assert len(got) == 1 and got[0]["doc_id"] == 1 and got[0]["tf_total"] == 2
    with _pytest.raises(ValueError):
        bm25_search(df, [], k=5)
    with _pytest.raises(ValueError):
        bm25_search(df, ["x"], k=0)


# ----------------------------------------------- blackouts + decimation


def test_exclude_intervals_global_and_keyed(spark):
    from python_vegindex_spark.operators.interval_join import exclude_intervals

    facts = spark.createDataFrame(
        [("a", _ts(10, 0)), ("a", _ts(10, 30)), ("a", _ts(11, 0)),
         ("b", _ts(10, 30))],
        "k string, ts timestamp",
    )
    bl = spark.createDataFrame(
        [(_ts(10, 15), _ts(10, 45))], "start_ts timestamp, end_ts timestamp"
    )
    out = exclude_intervals(facts, bl).collect()
    assert {(r["k"], r["ts"]) for r in out} == {
        ("a", _ts(10, 0)), ("a", _ts(11, 0)),
    }
    # keyed: only series a's blackout applies
    blk = spark.createDataFrame(
        [("a", _ts(10, 15), _ts(10, 45))],
        "k string, start_ts timestamp, end_ts timestamp",
    )
    outk = exclude_intervals(facts, blk, key_cols=["k"]).collect()
    assert {(r["k"], r["ts"]) for r in outk} == {
        ("a", _ts(10, 0)), ("a", _ts(11, 0)), ("b", _ts(10, 30)),
    }
    # boundary semantics: start inclusive, end exclusive
    bl2 = spark.createDataFrame(
        [(_ts(10, 0), _ts(10, 30))], "start_ts timestamp, end_ts timestamp"
    )
    out2 = exclude_intervals(facts, bl2).collect()
    assert ("a", _ts(10, 30)) in {(r["k"], r["ts"]) for r in out2}
    assert ("a", _ts(10, 0)) not in {(r["k"], r["ts"]) for r in out2}


def test_stride_downsample(spark):
    import pytest as _pytest

    from python_vegindex_spark.operators.downsample import stride_downsample

    rows = [("a", _ts(10, i), i) for i in range(10)] + [("b", _ts(10, 0), 99)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v long")
    out = stride_downsample(df, stride=3, series_cols=["k"], order_cols=["v"])
    got = sorted((r["k"], r["v"], r["sample_idx"]) for r in out.collect())
    assert got == [("a", 0, 0), ("a", 3, 1), ("a", 6, 2), ("a", 9, 3), ("b", 99, 0)]
    off = stride_downsample(df, stride=3, series_cols=["k"], order_cols=["v"], offset=1)
    assert sorted(r["v"] for r in off.collect() if r["k"] == "a") == [1, 4, 7]
    with _pytest.raises(ValueError):
        stride_downsample(df, 0, ["k"])
    with _pytest.raises(ValueError):
        stride_downsample(df, 3, ["k"], offset=3)


# --------------------------------------------------- last point + SLO


def test_last_point(spark):
    from python_vegindex_spark.operators.generic_rollup import last_point

    rows = [
        ("a", _ts(10, 0), 1.0, 1), ("a", _ts(11, 0), 5.0, 2),
        ("a", _ts(11, 0), 7.0, 3),  # ts tie: higher order col wins
        ("b", _ts(9, 0), 2.0, 4), ("b", None, 99.0, 5),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double, id int")
    out = {
        r["k"]: r
        for r in last_point(df, ["k"], value_col="v", order_cols=["id"]).collect()
    }
    assert out["a"]["last_ts"] == _ts(11, 0) and out["a"]["last_value"] == 7.0
    assert out["a"]["n"] == 3
    assert out["b"]["last_value"] == 2.0 and out["b"]["n"] == 1


def test_slo_fraction_hand_case(spark):
    import pytest as _pytest

    from python_vegindex_spark.operators.rate import slo_fraction

    rows = [("a", _ts(10, i), float(v)) for i, v in enumerate([100, 150, 300, 250])]
    rows += [("a", _ts(11, 0), float("nan"))]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = slo_fraction(
        df, "hourly", ["k"], threshold=200.0, value_col="v", objective=0.75
    ).orderBy("bucket_start").collect()
    r = out[0]
    assert (r["n"], r["n_good"]) == (4, 2)
    assert r["good_frac"] == 0.5
    assert bool(r["breached"]) is True
    assert r["burn_rate"] == pytest.approx(2.0)  # 0.5 bad / 0.25 budget
    assert len(out) == 1  # the NaN-only bucket has no valid samples
    with _pytest.raises(ValueError):
        slo_fraction(df, "hourly", ["k"], 200.0, objective=1.0)


# --------------------------------------------------------------- mlprep


def test_normalize_per_group_zscore_and_minmax(spark):
    import pytest as _pytest

    from python_vegindex_spark.operators.mlprep import normalize_per_group

    rows = [("a", v) for v in (10, 20, 30)] + [("b", 5), ("b", 5)]
    df = spark.createDataFrame(rows, "g string, v long")
    z = {
        (r["g"], r["v"]): r["v_zscore"]
        for r in normalize_per_group(df, ["g"], "v").collect()
    }
    # group a: mean 20, pop std sqrt(200/3); group b: std 0 -> NULL
    import math

    sd = math.sqrt(1400.0 / 3.0 - 400.0)  # pop std of {10,20,30}
    assert z[("a", 10)] == pytest.approx(-10 / sd, abs=1e-6)
    assert z[("a", 20)] == 0.0
    assert z[("b", 5)] is None
    mm = {
        (r["g"], r["v"]): r["v_minmax"]
        for r in normalize_per_group(df, ["g"], "v", method="minmax").collect()
    }
    assert mm[("a", 10)] == 0.0 and mm[("a", 30)] == 1.0 and mm[("a", 20)] == 0.5
    assert mm[("b", 5)] is None
    with _pytest.raises(ValueError):
        normalize_per_group(df, ["g"], "v", method="robust")


def test_normalize_with_frozen_stats(spark):
    from python_vegindex_spark.operators.mlprep import group_stats, normalize_per_group

    train = spark.createDataFrame([("a", 0), ("a", 10)], "g string, v long")
    serve = spark.createDataFrame([("a", 20)], "g string, v long")
    st = group_stats(train, ["g"], "v")
    out = normalize_per_group(serve, ["g"], "v", stats=st).collect()[0]
    # serve row scaled by TRAIN stats: mean 5, pop std 5 -> z = 3
    assert out["v_zscore"] == 3.0


def test_quantile_bins(spark):
    import pytest as _pytest

    from python_vegindex_spark.operators.mlprep import quantile_bins

    rows = [("a", v) for v in range(1, 9)] + [("a", None)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["v"]: r["bin"] for r in quantile_bins(df, ["g"], "v", n_bins=4).collect()}
    # edges at p25/p50/p75 of 1..8 -> 2.75, 4.5, 6.25
    assert out[1] == 0 and out[2] == 0
    assert out[3] == 1 and out[4] == 1
    assert out[5] == 2 and out[6] == 2
    assert out[7] == 3 and out[8] == 3
    assert out[None] is None
    with _pytest.raises(ValueError):
        quantile_bins(df, ["g"], "v", n_bins=1)


# ----------------------------------------------------- trailing distinct


def test_trailing_distinct_hand_case(spark):
    import pytest as _pytest

    from python_vegindex_spark.operators.rate import trailing_distinct

    d1, d2, d4 = datetime(2024, 3, 1), datetime(2024, 3, 2), datetime(2024, 3, 4)
    rows = [
        ("s", d1, "u1"), ("s", d1, "u2"), ("s", d1, "u1"),  # dup collapses
        ("s", d2, "u2"), ("s", d2, "u3"),
        ("s", d4, "u1"),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, u string")
    out = {
        r["bucket_start"].day: r["n_distinct"]
        for r in trailing_distinct(df, "daily", 2, ["k"], "u").collect()
    }
    # day1: {u1,u2}=2; day2: day1+day2 = {u1,u2,u3}=3; day3: day2 only
    # (window [d2,d3]) = {u2,u3}=2; day4: {u1}=1 (day3 empty)
    assert out == {1: 2, 2: 3, 3: 2, 4: 1}
    # approx path agrees at tiny cardinalities
    ap = {
        r["bucket_start"].day: r["n_distinct"]
        for r in trailing_distinct(df, "daily", 2, ["k"], "u", approx=True).collect()
    }
    assert {k: int(round(v)) for k, v in ap.items()} == out
    with _pytest.raises(ValueError):
        trailing_distinct(df, "daily", 0, ["k"], "u")
    with _pytest.raises(ValueError):
        trailing_distinct(df, "weekly", 2, ["k"], "u")


# ------------------------------------------------------------ MAD rollup


def test_mad_rollup_hand_case(spark):
    import pytest as _pytest

    from python_vegindex_spark.operators.rate import mad_rollup

    # bucket 10h: values 1..7 plus a wild 1000 -> median 4.5,
    # deviations {3.5,2.5,1.5,.5,.5,1.5,2.5,995.5} -> mad 2.0;
    # threshold 3*1.4826*2 = 8.8956 -> only 1000 is an outlier
    rows = [("s", _ts(10, i), float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 1000])]
    rows += [("s", _ts(11, 0), 5.0)]  # singleton bucket: mad 0, no outliers
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {r["bucket_start"]: r for r in mad_rollup(df, "hourly", ["k"], value_col="v").collect()}
    b0 = out[_ts(10)]
    assert (b0["n"], b0["median"], b0["mad"], b0["n_outliers"]) == (8, 4.5, 2.0, 1)
    b1 = out[_ts(11)]
    assert (b1["n"], b1["median"], b1["mad"], b1["n_outliers"]) == (1, 5.0, 0.0, 0)
    with _pytest.raises(ValueError):
        mad_rollup(df, "hourly", ["k"], outlier_k=0)
