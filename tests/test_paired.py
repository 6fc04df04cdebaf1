"""Paired-stream index (NDVI-analog, E3) vs a pandas oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from python_vegindex_spark.operators.paired import paired_index, paired_summary


@pytest.fixture(scope="module")
def streams():
    rng = np.random.default_rng(21)
    t0 = pd.Timestamp("2024-04-01")
    rows_p, rows_s = [], []
    for k in ["s1", "s2"]:
        pts = np.sort(rng.uniform(0, 86400, 120))
        sts = np.sort(rng.uniform(0, 86400, 100))
        for i, t in enumerate(pts):
            rows_p.append(
                dict(k=k, ts=t0 + pd.Timedelta(seconds=float(t)),
                     r=float(rng.uniform(10, 200)), g=float(rng.uniform(10, 200)),
                     b=float(rng.uniform(10, 200)),
                     exposure=float(rng.choice([0.0, 30.0, 60.0], p=[0.1, 0.5, 0.4])))
            )
        for i, t in enumerate(sts):
            rows_s.append(
                dict(k=k, ts=t0 + pd.Timedelta(seconds=float(t)),
                     ir=float(rng.uniform(10, 200)),
                     exposure=float(rng.choice([0.0, 15.0, 45.0], p=[0.1, 0.5, 0.4])))
            )
    p, s = pd.DataFrame(rows_p), pd.DataFrame(rows_s)
    p["ts"] = p["ts"].dt.floor("us")
    s["ts"] = s["ts"].dt.floor("us")
    return p, s


def _oracle(p: pd.DataFrame, s: pd.DataFrame, tol_s=600.0) -> pd.DataFrame:
    outs = []
    for k, pg in p.groupby("k"):
        sg = s[s.k == k].sort_values("ts")[["ts", "ir", "exposure"]].rename(
            columns={"ts": "ir_ts", "exposure": "exp_s"}
        )
        m = pd.merge_asof(
            pg.sort_values("ts"), sg, left_on="ts", right_on="ir_ts",
            direction="nearest", tolerance=pd.Timedelta(seconds=tol_s),
        )
        outs.append(m)
    m = pd.concat(outs)
    m = m[m.ir_ts.notna() & (m.exp_s != 0) & (m.exposure != 0)]
    y = 0.30 * m.r + 0.59 * m.g + 0.11 * m.b
    zp = m.ir / np.sqrt(m.exp_s)
    rp = m.r / np.sqrt(m.exposure)
    yp = y / np.sqrt(m.exposure)
    xp = zp - yp
    m = m.assign(ndvi_c=(xp - rp) / (xp + rp))
    return m[m.ndvi_c.between(-1, 1)]


def test_paired_index_matches_oracle(spark, streams):
    p, s = streams
    got = (
        paired_index(
            spark.createDataFrame(p), spark.createDataFrame(s), on=["k"],
            tolerance_s=600,
        )
        .toPandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    exp = _oracle(p, s).sort_values(["k", "ts"]).reset_index(drop=True)
    assert len(got) == len(exp)
    np.testing.assert_allclose(got["ndvi_c"], exp["ndvi_c"], rtol=1e-12)
    np.testing.assert_array_equal(got["ir"], exp["ir"])


def test_paired_summary_shape(spark, streams):
    p, s = streams
    idx = paired_index(
        spark.createDataFrame(p), spark.createDataFrame(s), on=["k"], tolerance_s=600
    )
    summ = paired_summary(idx, tier="hourly", series_cols=["k"]).toPandas()
    assert {"k", "bucket_start", "n", "v_mean", "v_90"} <= set(summ.columns)
    assert (summ["n"] >= 0).all() and len(summ) > 0
    full = summ[summ.n > 0]
    assert full["v_mean"].between(-1, 1).all()
