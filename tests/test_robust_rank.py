"""Hand-verified cases for the robust/rank family added in round 3
session 3: trimmed mean, Theil-Sen slope, Spearman rank correlation,
classical seasonal decomposition, and overlap chunking."""

from __future__ import annotations

import datetime as dt
import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from python_vegindex_spark.operators.correlate import spearman_correlation
from python_vegindex_spark.operators.decompose import seasonal_decompose
from python_vegindex_spark.operators.packing import chunk_overlap
from python_vegindex_spark.operators.robust import (
    theilsen_slopes,
    trimmed_mean_rollup,
)

D = dt.datetime


def _ev(spark, rows):
    return spark.createDataFrame(rows, "event_type string, ts timestamp, value double")


# ---------------------------------------------------------------- trimmed


def test_trimmed_mean_hand(spark):
    # 10 values 1..10 (quantized x100), trim 10% -> drop 1 low + 1 high:
    # mean(2..9) = 5.5
    rows = [("a", D(2024, 1, 1, 0, i), float(i + 1)) for i in range(10)]
    out = trimmed_mean_rollup(
        _ev(spark, rows), "daily", ["event_type"], trim_frac=0.1
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n"], r["n_trim"], r["n_kept"]) == (10, 1, 8)
    assert r["trimmed_mean"] == pytest.approx(5.5)


def test_trimmed_mean_tie_straddle_deterministic(spark):
    # ties straddling the cut: values [1,1,1,9]; trim_frac=0.25 -> k=1
    # per side, survivors are {1,1} regardless of which tied "1" drops.
    rows = [("a", D(2024, 1, 1, 0, i), v) for i, v in enumerate([1.0, 1.0, 1.0, 9.0])]
    r = trimmed_mean_rollup(
        _ev(spark, rows), "daily", ["event_type"], trim_frac=0.25
    ).collect()[0]
    assert r["n_kept"] == 2  # k=1 off each end: survivors {1, 1} minus top... n-2k=2
    assert r["trimmed_mean"] == pytest.approx(1.0)


def test_trimmed_mean_zero_trim_is_mean(spark):
    rows = [("a", D(2024, 1, 1, 0, i), float(v)) for i, v in enumerate([2, 4, 9])]
    r = trimmed_mean_rollup(
        _ev(spark, rows), "daily", ["event_type"], trim_frac=0.0
    ).collect()[0]
    assert r["trimmed_mean"] == pytest.approx(5.0)


def test_trimmed_mean_validates():
    with pytest.raises(ValueError):
        trimmed_mean_rollup(None, "daily", ["s"], trim_frac=0.5)


# ---------------------------------------------------------------- theilsen


def test_theilsen_hand_slope(spark):
    # points (t=0s,v=0), (t=10s,v=10), (t=20s,v=40):
    # slopes: (10-0)/10=1, (40-0)/20=2, (40-10)/10=3 -> median 2.0
    rows = [
        ("a", D(2024, 1, 1, 0, 0, 0), 0.0),
        ("a", D(2024, 1, 1, 0, 0, 10), 10.0),
        ("a", D(2024, 1, 1, 0, 0, 20), 40.0),
    ]
    r = theilsen_slopes(_ev(spark, rows), "daily", ["event_type"]).collect()[0]
    assert (r["n"], r["n_pairs"]) == (3, 3)
    assert r["slope"] == pytest.approx(2.0)


def test_theilsen_outlier_resistance(spark):
    # clean unit slope + one wild point: median of pairwise slopes stays
    # near 1 where OLS would be dragged far off.
    rows = [("a", D(2024, 1, 1, 0, 0, i), float(i)) for i in range(9)]
    rows.append(("a", D(2024, 1, 1, 0, 0, 9), 1000.0))
    r = theilsen_slopes(_ev(spark, rows), "daily", ["event_type"]).collect()[0]
    assert abs(r["slope"] - 1.0) < 0.2


def test_theilsen_equal_ts_and_singleton(spark):
    # one lone point -> no pairs -> slope NULL; equal-ts pair excluded
    rows = [
        ("a", D(2024, 1, 1), 1.0),
        ("b", D(2024, 1, 1, 5), 1.0),
        ("b", D(2024, 1, 1, 5), 9.0),  # same ts: undefined slope, dropped
        ("b", D(2024, 1, 1, 6), 2.0),
    ]
    out = {r["event_type"]: r for r in theilsen_slopes(
        _ev(spark, rows), "daily", ["event_type"]).collect()}
    assert out["a"]["n_pairs"] == 0 and out["a"]["slope"] is None
    assert out["b"]["n_pairs"] == 2  # (1.0->2.0) and (9.0->2.0), not the tie


def test_theilsen_bucket_guard(spark):
    rows = [("a", D(2024, 1, 1, 0, 0, i), float(i)) for i in range(5)]
    with pytest.raises(ValueError, match="max_bucket_rows"):
        theilsen_slopes(_ev(spark, rows), "daily", ["event_type"],
                        max_bucket_rows=3)


# ---------------------------------------------------------------- spearman


def test_spearman_perfect_monotone_nonlinear(spark):
    # b = a^3 over distinct daily sums: Spearman 1.0 exactly (Pearson < 1)
    rows = []
    for i, a in enumerate([1.0, 2.0, 3.0, 4.0, 5.0]):
        rows.append(("a", D(2024, 1, 1 + i), a))
        rows.append(("b", D(2024, 1, 1 + i), a ** 3))
    r = spearman_correlation(_ev(spark, rows), "daily", "event_type").collect()[0]
    assert (r["series_a"], r["series_b"], r["n"]) == ("a", "b", 5)
    assert r["corr"] == pytest.approx(1.0)


def test_spearman_ties_average_ranks(spark):
    # a daily sums: [1, 1, 2]; b: [3, 5, 4]
    # tie-averaged ranks a: [1.5, 1.5, 3], b: [1, 3, 2]
    # spearman = pearson(ranks) = 0.866025...
    vals_a, vals_b = [1.0, 1.0, 2.0], [3.0, 5.0, 4.0]
    rows = []
    for i in range(3):
        rows.append(("a", D(2024, 1, 1 + i), vals_a[i]))
        rows.append(("b", D(2024, 1, 1 + i), vals_b[i]))
    r = spearman_correlation(_ev(spark, rows), "daily", "event_type").collect()[0]
    ra = np.array([1.5, 1.5, 3.0])
    rb = np.array([1.0, 3.0, 2.0])
    expect = np.corrcoef(ra, rb)[0, 1]
    assert r["corr"] == pytest.approx(expect, abs=1e-6)


def test_spearman_reversal(spark):
    rows = []
    for i, a in enumerate([1.0, 2.0, 3.0, 4.0]):
        rows.append(("a", D(2024, 1, 1 + i), a))
        rows.append(("b", D(2024, 1, 1 + i), 10.0 - a))
    r = spearman_correlation(_ev(spark, rows), "daily", "event_type").collect()[0]
    assert r["corr"] == pytest.approx(-1.0)


# ---------------------------------------------------------------- decompose


def test_seasonal_decompose_recovers_components(spark):
    # pure signal: weekly seasonal [0,3,6,0,-3,-6,0] on a flat level 100,
    # one point per day -> trend = pooled 7-day mean = 100 exactly
    # (each full window sees one full cycle), seasonal = the pattern.
    pattern = [0.0, 3.0, 6.0, 0.0, -3.0, -6.0, 0.0]
    base = dt.date(2024, 1, 1)
    rows = []
    for i in range(35):
        day = base + dt.timedelta(days=i)
        pos = (day - dt.date(1970, 1, 1)).days % 7  # epoch-anchored, tz-free
        rows.append(
            ("a", dt.datetime(day.year, day.month, day.day, 12), 100.0 + pattern[int(pos)])
        )
    out = seasonal_decompose(_ev(spark, rows), ["event_type"], season=7)
    rows_out = {r["day"]: r for r in out.collect()}
    mid = sorted(rows_out)[17]  # a fully-windowed interior day
    r = rows_out[mid]
    assert r["trend"] == pytest.approx(100.0)
    assert r["v"] == pytest.approx(
        r["trend"] + r["seasonal"] + r["residual"], abs=1e-5
    )
    assert abs(r["residual"]) < 1e-5
    # edges (first/last 3 days) have no full window -> NULL trend
    first = rows_out[sorted(rows_out)[0]]
    assert first["trend"] is None and first["residual"] is None


def test_seasonal_decompose_gap_leaves_trend_null(spark):
    # 9 consecutive days with day 5 missing: the windows that span the
    # gap see only 6 lattice days -> trend NULL there.
    base = dt.date(2024, 1, 1)
    rows = [
        ("a", dt.datetime(2024, 1, 1 + i, 12), 1.0)
        for i in range(9)
        if i != 4
    ]
    out = seasonal_decompose(_ev(spark, rows), ["event_type"], season=7)
    got = {r["day"].isoformat(): r["trend"] for r in out.collect()}
    assert all(v is None for v in got.values())  # every window is holed/edged


def test_seasonal_decompose_validates():
    with pytest.raises(ValueError):
        seasonal_decompose(None, ["s"], season=6)
    with pytest.raises(ValueError):
        seasonal_decompose(None, ["s"], season=7, min_cycles=0)


# ---------------------------------------------------------------- chunking


def test_chunk_overlap_hand(spark):
    txt = "abcdefghij"  # len 10, chunk 4, stride 3 -> starts 1,4,7 (+ cover to end)
    df = spark.createDataFrame([(1, txt)], "doc_id long, text string")
    out = chunk_overlap(df, chunk_chars=4, stride=3).orderBy("chunk_idx").collect()
    # n_extra = ceil((10-4)/3) = 2 -> 3 chunks: abcd, defg, ghij
    chunks = ["abcd", "defg", "ghij"]
    assert len(out) == 3
    for i, (r, expect) in enumerate(zip(out, chunks)):
        assert r["chunk_start"] == i * 3 + 1
        assert r["chunk_len"] == 4
        assert r["chunk_md5"] == hashlib.md5(expect.encode()).hexdigest()


def test_chunk_overlap_short_and_null(spark):
    df = spark.createDataFrame(
        [(1, "ab"), (2, None), (3, "")], "doc_id long, text string"
    )
    out = chunk_overlap(df, chunk_chars=4, stride=3).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(out) == 3  # one chunk each
    assert by_id[1]["chunk_len"] == 2
    assert by_id[2]["chunk_len"] == 0
    assert by_id[2]["chunk_md5"] == hashlib.md5(b"").hexdigest()


def test_chunk_overlap_full_coverage_and_overlap(spark):
    txt = "x" * 1000
    df = spark.createDataFrame([(1, txt)], "doc_id long, text string")
    out = chunk_overlap(df, chunk_chars=512, stride=384).orderBy("chunk_idx").collect()
    # covered ranges must tile [1, 1000] with overlap chunk-stride=128
    end_prev = 0
    covered_to = 0
    for r in out:
        assert r["chunk_start"] <= covered_to + 1  # no holes
        covered_to = max(covered_to, r["chunk_start"] + r["chunk_len"] - 1)
    assert covered_to == 1000


def test_chunk_overlap_validates():
    with pytest.raises(ValueError):
        chunk_overlap(None, chunk_chars=0)
    with pytest.raises(ValueError):
        chunk_overlap(None, chunk_chars=10, stride=11)


# ---------------------------------------------------------- rolling corr


def test_rolling_correlation_window_and_gap(spark):
    """Trailing 3-day correlation: perfectly aligned daily sums give
    corr 1.0 once min_periods is met; the frame is LATTICE days, so a
    gap shrinks the sample (n drops) instead of stretching the window."""
    from python_vegindex_spark.operators.correlate import rolling_correlation

    rows = []
    # days 1..5 with day 4 missing; b = 2*a (same daily ordering)
    for i, day in enumerate([1, 2, 3, 5]):
        a = float(10 + i * 3)
        rows.append(("a", D(2024, 1, day), a))
        rows.append(("b", D(2024, 1, day), 2.0 * a))
    out = rolling_correlation(
        _ev(spark, rows), "daily", "event_type", window=3, min_periods=2
    ).orderBy("bucket_start").collect()
    by_day = {r["bucket_start"].day if hasattr(r["bucket_start"], "day") else r["bucket_start"]: r for r in out}
    days = sorted(by_day)
    # day 1: n=1 -> NULL; day 2: n=2 -> corr 1.0; day 3: n=3 -> 1.0
    assert by_day[days[0]]["n"] == 1 and by_day[days[0]]["corr"] is None
    assert by_day[days[1]]["n"] == 2 and by_day[days[1]]["corr"] == pytest.approx(1.0)
    assert by_day[days[2]]["n"] == 3 and by_day[days[2]]["corr"] == pytest.approx(1.0)
    # day 5's 3-day lattice frame covers days 3..5, day 4 missing -> n=2
    assert by_day[days[3]]["n"] == 2


def test_rolling_correlation_validates(spark):
    from python_vegindex_spark.operators.correlate import rolling_correlation

    with pytest.raises(ValueError, match="window"):
        rolling_correlation(None, "daily", "s", window=1)
    with pytest.raises(ValueError, match="fixed-step"):
        rolling_correlation(_ev(spark, []), "3day", "s")


# ------------------------------------------------------- property-based


def _np_trimmed(vals: list[float], frac: float) -> tuple[int, float]:
    q = np.floor(np.asarray(vals) * 100).astype(np.int64)
    q.sort()
    k = int(np.floor(len(q) * frac))
    kept = q[k: len(q) - k]
    return len(kept), float(kept.sum()) / (len(kept) * 100)


def _np_spearman(a: np.ndarray, b: np.ndarray) -> float:
    def ranks(x):
        order = np.argsort(x, kind="stable")
        r = np.empty(len(x), dtype=float)
        i = 0
        sx = x[order]
        while i < len(x):
            j = i
            while j + 1 < len(x) and sx[j + 1] == sx[i]:
                j += 1
            r[order[i: j + 1]] = (i + j) / 2.0 + 1.0
            i = j + 1
        return r

    return float(np.corrcoef(ranks(a), ranks(b))[0, 1])


def test_trimmed_mean_property(spark):
    """Random multisets (with ties) vs an independent numpy oracle."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        vals=st.lists(
            st.integers(min_value=-500, max_value=500).map(lambda v: v / 7.0),
            min_size=1, max_size=40,
        ),
        frac=st.sampled_from([0.0, 0.1, 0.25, 0.4]),
    )
    def check(vals, frac):
        rows = [("a", D(2024, 1, 1, 0, 0, i % 60, i // 60), float(v))
                for i, v in enumerate(vals)]
        r = trimmed_mean_rollup(
            _ev(spark, rows), "daily", ["event_type"], trim_frac=frac
        ).collect()[0]
        n_kept, mean = _np_trimmed(vals, frac)
        assert r["n_kept"] == n_kept
        assert r["trimmed_mean"] == pytest.approx(mean, abs=1e-6)

    check()


def test_spearman_property(spark):
    """Random paired series (with ties) vs an independent average-rank
    numpy Spearman."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        pairs=st.lists(
            st.tuples(st.integers(0, 20), st.integers(0, 20)),
            min_size=3, max_size=25,
        )
    )
    def check(pairs):
        a = np.array([p[0] for p in pairs], dtype=float)
        b = np.array([p[1] for p in pairs], dtype=float)
        if np.all(a == a[0]) or np.all(b == b[0]):
            return  # zero variance -> NULL by contract
        rows = []
        for i, (x, y) in enumerate(pairs):
            day = D(2024, 1, 1) + dt.timedelta(days=i)
            rows.append(("a", day, float(x)))
            rows.append(("b", day, float(y)))
        r = spearman_correlation(
            _ev(spark, rows), "daily", "event_type"
        ).collect()[0]
        expect = _np_spearman(a, b)
        assert r["corr"] == pytest.approx(expect, abs=1e-6)

    check()


def test_chunk_overlap_property(spark):
    """For random (len, chunk, stride): full coverage, correct chunk
    count 1 + ceil(max(0, len-chunk)/stride), last chunk reaches the
    end, all starts on the stride lattice."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        n=st.integers(0, 300),
        chunk=st.integers(1, 64),
        data=st.data(),
    )
    def check(n, chunk, data):
        stride = data.draw(st.integers(1, chunk))
        txt = "".join(chr(97 + (i % 26)) for i in range(n))
        df = spark.createDataFrame([(1, txt)], "doc_id long, text string")
        out = (
            chunk_overlap(df, chunk_chars=chunk, stride=stride)
            .orderBy("chunk_idx").collect()
        )
        import math
        expect_n = 1 + max(0, math.ceil(max(0, n - chunk) / stride))
        assert len(out) == expect_n
        covered = 0
        for i, r in enumerate(out):
            assert r["chunk_idx"] == i
            assert r["chunk_start"] == i * stride + 1
            assert r["chunk_start"] <= covered + 1  # no holes
            covered = max(covered, r["chunk_start"] + r["chunk_len"] - 1)
        assert covered == n

    check()


# ----------------------------------------------------- chunk containment


def test_chunk_containment_detects_contained_doc(spark):
    """Doc B is an aligned prefix of doc A: containment 1.0; an
    unrelated doc C pairs with neither."""
    from python_vegindex_spark.operators.packing import chunk_containment

    blk = lambda ch: ch * 8  # one full 8-char lattice chunk
    a = blk("a") + blk("b") + blk("c") + blk("d")
    b = blk("a") + blk("b")
    c = blk("z") + blk("y")
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    out = chunk_containment(df, chunk_chars=8, min_shared=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert (r["chunks_a"], r["chunks_b"], r["n_shared"]) == (4, 2, 2)
    assert r["containment"] == pytest.approx(1.0)


def test_chunk_containment_min_shared_and_dupes(spark):
    """min_shared filters single-chunk boilerplate pairs; repeated
    chunks within one doc count once (distinct hashes)."""
    from python_vegindex_spark.operators.packing import chunk_containment

    blk = lambda ch: ch * 8
    df = spark.createDataFrame(
        [
            (1, blk("a") + blk("a") + blk("b")),  # distinct chunks: {a, b}
            (2, blk("a") + blk("x")),             # shares only {a}
            (3, blk("a") + blk("b")),             # shares {a, b} with 1
        ],
        "doc_id long, text string",
    )
    out = {(r["id_a"], r["id_b"]): r
           for r in chunk_containment(df, chunk_chars=8, min_shared=2).collect()}
    assert set(out) == {(1, 3)}
    r = out[(1, 3)]
    assert r["n_shared"] == 2 and r["containment"] == pytest.approx(1.0)
    with pytest.raises(ValueError):
        chunk_containment(df, min_shared=0)


# ------------------------------------------------------- savitzky-golay


def test_savgol_quadratic_reproduction(spark):
    """SG is exact on polynomials up to the fit degree: a quadratic
    daily series is reproduced exactly at interior points; a first
    derivative returns the exact slope of a linear series."""
    from python_vegindex_spark.operators.decompose import savgol_smooth

    rows = [("a", D(2024, 1, 1 + i, 12), float(2 * i * i - 3 * i + 7))
            for i in range(9)]
    out = {r["day"].isoformat(): r for r in
           savgol_smooth(_ev(spark, rows), ["event_type"], window=5).collect()}
    days = sorted(out)
    for i, day in enumerate(days):
        r = out[day]
        if 2 <= i <= 6:  # interior: full lattice window
            assert r["sg"] == pytest.approx(float(2 * i * i - 3 * i + 7), abs=1e-9)
        else:
            assert r["sg"] is None

    lin = [("a", D(2024, 1, 1 + i, 12), float(5 * i + 1)) for i in range(7)]
    der = {r["day"].isoformat(): r["sg"] for r in savgol_smooth(
        _ev(spark, lin), ["event_type"], window=5, derivative=1).collect()}
    mid = sorted(der)[3]
    assert der[mid] == pytest.approx(5.0, abs=1e-9)


def test_savgol_gap_nulls_window(spark):
    from python_vegindex_spark.operators.decompose import savgol_smooth

    rows = [("a", D(2024, 1, 1 + i, 12), 1.0) for i in range(9) if i != 4]
    out = savgol_smooth(_ev(spark, rows), ["event_type"], window=5).collect()
    # every 5-day window either hits the edge or spans the missing day 5
    assert all(r["sg"] is None for r in out)


def test_savgol_validates():
    from python_vegindex_spark.operators.decompose import savgol_smooth

    with pytest.raises(ValueError, match="unsupported"):
        savgol_smooth(None, ["s"], window=6)
    with pytest.raises(ValueError, match="unsupported"):
        savgol_smooth(None, ["s"], window=5, derivative=2)


# ---------------------------------------------------- transition dates


def test_transition_dates_hand(spark):
    """A clean seasonal hump: flat 10, ramp to 30, back down — the
    50%-amplitude crossing dates bracket the hump exactly."""
    from python_vegindex_spark.operators.decompose import transition_dates

    # quadratic hump peaking mid-series, interior-only sg ~= v exactly
    vals = [10.0, 10.0, 10.0, 14.0, 22.0, 30.0, 22.0, 14.0, 10.0, 10.0, 10.0]
    rows = [("a", D(2024, 1, 1 + i, 12), v) for i, v in enumerate(vals)]
    out = transition_dates(_ev(spark, rows), ["event_type"], frac=0.5).collect()
    assert len(out) == 1
    r = out[0]
    assert r["year"] == 2024 and r["n_days"] == len(vals) - 4  # edges NULL
    # smoothed interior values stay within the raw envelope; thr halfway
    assert r["lo"] < r["thr"] < r["hi"]
    # sos before the peak, eos after it, sos < eos
    assert r["sos_day"] < dt.date(2024, 1, 6) < r["eos_day"]


def test_transition_dates_flat_series(spark):
    """Zero amplitude: thr == lo, every smoothed day qualifies."""
    from python_vegindex_spark.operators.decompose import transition_dates

    rows = [("a", D(2024, 1, 1 + i, 12), 5.0) for i in range(9)]
    r = transition_dates(_ev(spark, rows), ["event_type"]).collect()[0]
    assert r["lo"] == r["hi"] == r["thr"]
    assert r["sos_day"] == dt.date(2024, 1, 3)  # first interior day
    assert r["eos_day"] == dt.date(2024, 1, 7)  # last interior day


def test_transition_dates_validates():
    from python_vegindex_spark.operators.decompose import transition_dates

    with pytest.raises(ValueError, match="frac"):
        transition_dates(None, ["s"], frac=1.5)
