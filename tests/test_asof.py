"""As-of join vs pandas merge_asof (the reference's exact primitive,
generate_ndvi_timeseries.py:138-149), plus window/bucketed equivalence."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from python_vegindex_spark.operators.asof import asof_join, asof_join_bucketed


@pytest.fixture(scope="module")
def streams():
    rng = np.random.default_rng(11)
    keys = ["a", "b", "c"]
    rows_l, rows_r = [], []
    t0 = pd.Timestamp("2024-03-01")
    for k in keys:
        lts = np.sort(rng.uniform(0, 86400 * 3, size=80))
        rts = np.sort(rng.uniform(0, 86400 * 3, size=60))
        for i, s in enumerate(lts):
            rows_l.append({"k": k, "lid": f"{k}{i}", "ts": t0 + pd.Timedelta(seconds=float(s)), "lv": float(i)})
        for i, s in enumerate(rts):
            rows_r.append({"k": k, "ts": t0 + pd.Timedelta(seconds=float(s)), "rv": float(i * 10)})
    l, r = pd.DataFrame(rows_l), pd.DataFrame(rows_r)
    # Spark timestamps are microsecond precision; truncate the fixture
    l["ts"] = l["ts"].dt.floor("us")
    r["ts"] = r["ts"].dt.floor("us")
    return l, r


def _expected(left, right, direction, tol_s):
    out = []
    for k, lg in left.groupby("k"):
        rg = right[right.k == k]
        m = pd.merge_asof(
            lg.sort_values("ts"),
            rg.sort_values("ts")[["ts", "rv"]].rename(columns={"ts": "r_ts"}),
            left_on="ts",
            right_on="r_ts",
            direction=direction,
            tolerance=pd.Timedelta(seconds=tol_s) if tol_s else None,
        )
        out.append(m)
    return pd.concat(out).sort_values(["k", "ts"]).reset_index(drop=True)


@pytest.mark.parametrize("direction,tol", [("backward", None), ("backward", 1800), ("forward", 3600), ("nearest", 1800), ("nearest", None)])
def test_asof_matches_pandas(spark, streams, direction, tol):
    lpdf, rpdf = streams
    l, r = spark.createDataFrame(lpdf), spark.createDataFrame(rpdf)
    got = (
        asof_join(l, r, on=["k"], direction=direction, tolerance_s=tol, payload_cols=["rv"])
        .toPandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    exp = _expected(lpdf, rpdf, direction, tol)
    pd.testing.assert_series_equal(got["r_rv"], exp["rv"].rename("r_rv"), check_exact=True)
    pd.testing.assert_series_equal(got["r_ts"], exp["r_ts"].rename("r_ts"))


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_bucketed_equivalent(spark, streams, direction):
    lpdf, rpdf = streams
    l, r = spark.createDataFrame(lpdf), spark.createDataFrame(rpdf)
    a = (
        asof_join(l, r, on=["k"], direction=direction, tolerance_s=900, payload_cols=["rv"])
        .toPandas().sort_values(["k", "lid"]).reset_index(drop=True)
    )
    b = (
        asof_join_bucketed(
            l, r, on=["k"], left_keys=["lid"], direction=direction,
            tolerance_s=900, payload_cols=["rv"],
        )
        .toPandas().sort_values(["k", "lid"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a[["k", "lid", "r_ts", "r_rv"]], b[["k", "lid", "r_ts", "r_rv"]])


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_exact_match_and_duplicate_right_ts(spark, direction):
    """Regression: a right row AT the left ts matches in every direction
    (merge_asof allow_exact_matches), and duplicate right timestamps
    resolve to the smallest payload, identically in both strategies."""
    t0 = pd.Timestamp("2024-03-01")
    lpdf = pd.DataFrame(
        [
            {"k": "a", "lid": "a0", "ts": t0 + pd.Timedelta(seconds=100), "lv": 0.0},
            {"k": "a", "lid": "a1", "ts": t0 + pd.Timedelta(seconds=500), "lv": 1.0},
        ]
    )
    rpdf = pd.DataFrame(
        [
            {"k": "a", "ts": t0 + pd.Timedelta(seconds=100), "rv": 30.0},
            {"k": "a", "ts": t0 + pd.Timedelta(seconds=100), "rv": 10.0},
            {"k": "a", "ts": t0 + pd.Timedelta(seconds=400), "rv": 20.0},
        ]
    )
    l, r = spark.createDataFrame(lpdf), spark.createDataFrame(rpdf)
    got = (
        asof_join(l, r, on=["k"], direction=direction, tolerance_s=600, payload_cols=["rv"])
        .toPandas().sort_values("lid").reset_index(drop=True)
    )
    # a0 sits exactly on a duplicated right ts: exact match wins in every
    # direction; the duplicate collapses to the smaller payload (10.0)
    assert got.loc[0, "r_rv"] == 10.0
    expected_a1 = {"backward": 20.0, "forward": None, "nearest": 20.0}[direction]
    if expected_a1 is None:
        assert pd.isna(got.loc[1, "r_rv"])
    else:
        assert got.loc[1, "r_rv"] == expected_a1
    b = (
        asof_join_bucketed(
            l, r, on=["k"], left_keys=["lid"], direction=direction,
            tolerance_s=600, payload_cols=["rv"],
        )
        .toPandas().sort_values("lid").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["k", "lid", "r_ts", "r_rv"]], b[["k", "lid", "r_ts", "r_rv"]]
    )


def test_asof_interpolate(spark):
    """Interpolated join: exact bracket math, exact-hit, boundary hold,
    tolerance gating, series isolation."""
    import datetime as dt

    from python_vegindex_spark.operators.asof import asof_join_interpolate

    t0 = dt.datetime(2024, 1, 1)

    def _ts(s):
        return t0 + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [("a", 1, _ts(25)), ("a", 2, _ts(0)), ("a", 3, _ts(-10)),
         ("a", 4, _ts(150)), ("b", 5, _ts(50))],
        "k string, id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", _ts(0), 10.0), ("a", _ts(100), 20.0)],
        "k string, ts timestamp, v double",
    )
    got = {
        r["id"]: r["v_interp"]
        for r in asof_join_interpolate(left, right, on=["k"], value_col="v").collect()
    }
    assert got[1] == 10.0 + (20.0 - 10.0) * (25_000_000.0 / 100_000_000.0)  # 12.5
    assert got[2] == 10.0   # exact hit
    assert got[3] == 10.0   # before first sample: boundary hold
    assert got[4] == 20.0   # after last sample: boundary hold
    assert got[5] is None   # series isolation: no 'b' samples

    # tolerance: only the prev bracket within 30 s -> held, not interpolated
    got_tol = {
        r["id"]: r["v_interp"]
        for r in asof_join_interpolate(
            left, right, on=["k"], value_col="v", tolerance_s=30.0
        ).collect()
    }
    assert got_tol[1] == 10.0
    assert got_tol[4] is None  # 50 s past the last sample: out of tolerance
