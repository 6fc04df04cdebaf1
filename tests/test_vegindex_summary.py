"""generate_gcc_summary vs a faithful pandas re-implementation of
generate_summary_timeseries.py:229-531 (QC, awb skip, dnsum guard,
stored-gcc / recomputed-rcc quirk, nanmean/nanstd(ddof=0), HF-7
quantiles, midday argmin, 3-branch tiering, gap-fill)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from python_vegindex_spark.functions.quantile import hf7_numpy
from python_vegindex_spark.operators.vegindex_summary import generate_gcc_summary
from python_vegindex_spark.sources.summary_export import GCC_SUMMARY_FIELDS


@pytest.fixture(scope="module")
def roistats_pdf():
    rng = np.random.default_rng(17)
    rows = []
    day = dt.date(2019, 12, 20)  # spans a year boundary (bucket restart)
    for d in range(40):
        date = day + dt.timedelta(days=d)
        if d in (7, 8, 21):  # gap days
            continue
        n_imgs = int(rng.integers(1, 6))
        for i in range(n_imgs):
            ts = dt.datetime(date.year, date.month, date.day, 8 + 2 * i, 31, 7)
            r = float(rng.uniform(40, 120))
            g = float(rng.uniform(40, 120))
            b = float(rng.uniform(40, 120))
            rows.append(
                dict(
                    date=date,
                    local_std_time=ts.strftime("%H:%M:%S"),
                    ts=ts,
                    doy=date.timetuple().tm_yday,
                    filename=f"site_{ts:%Y_%m_%d_%H%M%S}.jpg",
                    solar_elev=float(rng.uniform(5, 70)),
                    exposure=30,
                    awbflag=int(rng.random() < 0.1),
                    mask_index=1,
                    gcc=g / (r + g + b),
                    rcc=r / (r + g + b),
                    r_mean=r,
                    g_mean=g,
                    b_mean=b,
                )
            )
    return pd.DataFrame(rows)


def _oracle(pdf: pd.DataFrame, nday: int, nmin: int, sunelev_min=10.0,
            brt_min=100.0, brt_max=665.0) -> dict:
    """Literal cursor-loop port of generate_summary_timeseries.py:260-531:
    dt_first/dt_last from the pre-awb selection, daterange2's doy lattice
    (yearly restart), and SEQUENTIAL row consumption over half-open
    [start, start + nday) windows — so each year's final bucket swallows
    early-January rows of the next year, and the awb skip happens inside
    the loop."""
    df = pdf.copy()
    brt = df.r_mean + df.g_mean + df.b_mean
    sel = df[
        brt.between(brt_min, brt_max)
        & (df.solar_elev >= sunelev_min)
        & df.r_mean.notna()
    ].sort_values("ts", kind="mergesort")
    if sel.empty:
        return {}

    def bstart(d: dt.date) -> dt.date:
        doy = d.timetuple().tm_yday
        return dt.date(d.year, 1, 1) + dt.timedelta(days=((doy - 1) // nday) * nday)

    rows_list = sel.to_dict("records")
    dates = [r["ts"].date() for r in rows_list]
    # daterange2 lattice: first bucket containing dt_first .. bucket
    # containing dt_last, doy-anchored with restart at each Jan 1
    buckets = []
    b, last_b = bstart(dates[0]), bstart(dates[-1])
    while b <= last_b:
        buckets.append(b)
        nxt = b + dt.timedelta(days=nday)
        b = dt.date(b.year + 1, 1, 1) if nxt.year != b.year else nxt

    out = {}
    ndx = 0
    for b in buckets:
        end = b + dt.timedelta(days=nday)  # full window — may cross Jan 1
        acc = []
        while ndx < len(rows_list) and b <= dates[ndx] < end:
            row = rows_list[ndx]
            ndx += 1
            if row["awbflag"] == 1:
                continue
            acc.append(row)
        center = b + dt.timedelta(days=nday // 2)
        noon = dt.datetime(center.year, center.month, center.day, 12)
        rec = {"image_count": 0}
        if acc:
            rows = pd.DataFrame(acc)
            dnsum = rows.r_mean + rows.g_mean + rows.b_mean
            okm = dnsum > 0
            gccv = np.where(okm, rows.gcc, np.nan)
            rccv = np.where(okm, rows.r_mean / dnsum, np.nan)
            cnt = int(okm.sum())
            rec["image_count"] = cnt
            if cnt > 0:
                deltas = (rows.ts - noon).abs()
                mi = int(np.argmin(deltas.to_numpy()))
                rec["midday_filename"] = rows.filename.iloc[mi]
                rec["midday_gcc"] = gccv[mi]
                rec["midday_rcc"] = rccv[mi]
                rec["max_solar_elev"] = float(rows.solar_elev.max())
            if cnt >= nmin and cnt > 0:
                rec["r_mean"] = float(np.nanmean(rows.r_mean))
                rec["r_std"] = float(np.nanstd(rows.r_mean))
                rec["gcc_mean"] = float(np.nanmean(gccv))
                rec["gcc_std"] = float(np.nanstd(gccv))
                rec["gcc_50"] = hf7_numpy(gccv, 0.5)
                rec["gcc_90"] = hf7_numpy(gccv, 0.9)
                rec["rcc_mean"] = float(np.nanmean(rccv))
                rec["rcc_75"] = hf7_numpy(rccv, 0.75)
        out[center] = rec
    return out


@pytest.mark.parametrize("nday,nmin", [(1, 1), (3, 3), (7, 2)])
def test_generate_gcc_summary_matches_oracle(spark, roistats_pdf, nday, nmin):
    sdf = spark.createDataFrame(roistats_pdf)
    got = generate_gcc_summary(sdf, nday=nday, nmin=nmin)
    assert got.columns == GCC_SUMMARY_FIELDS
    got_rows = {r["date"]: r for r in got.collect()}
    exp = _oracle(roistats_pdf, nday, nmin)
    assert set(got_rows) == set(exp), (
        sorted(set(got_rows) ^ set(exp))
    )
    for center, e in exp.items():
        g = got_rows[center]
        assert g["image_count"] == e["image_count"], center
        assert g["year"] == center.year and g["doy"] == center.timetuple().tm_yday
        for k in ("midday_filename",):
            assert g[k] == e.get(k), (center, k)
        for k in (
            "midday_gcc", "midday_rcc", "max_solar_elev", "r_mean", "r_std",
            "gcc_mean", "gcc_std", "gcc_50", "gcc_90", "rcc_mean", "rcc_75",
        ):
            ev = e.get(k)
            if ev is None or (isinstance(ev, float) and np.isnan(ev)):
                assert g[k] is None, (center, k, g[k])
            else:
                assert g[k] == pytest.approx(ev, rel=1e-12), (center, k)


def test_year_boundary_spillover(spark, roistats_pdf):
    """The reference's cursor consumes next-year rows into the previous
    year's final bucket (vegindex.py:50-63 lattice + the half-open
    [start, start+nday) window in generate_summary_timeseries.py:302-305):
    2019 has 365 days, so for nday=3 the doy-364 (Dec 30) bucket spans
    Dec 30, Dec 31 AND Jan 1 2020, and the Jan-1 bucket only gets
    Jan 2-3; for nday=7 the doy-365 (Dec 31) bucket swallows Jan 1-6."""
    sdf = spark.createDataFrame(roistats_pdf)

    def sel_count(pdf, lo, hi):
        p = pdf[(pdf.date >= lo) & (pdf.date <= hi)]
        brt = p.r_mean + p.g_mean + p.b_mean
        return int(
            (
                brt.between(100.0, 665.0)
                & (p.solar_elev >= 10.0)
                & (p.awbflag != 1)
            ).sum()
        )

    got3 = {r["date"]: r for r in generate_gcc_summary(sdf, nday=3, nmin=1).collect()}
    dec30 = got3[dt.date(2019, 12, 31)]  # center of the Dec-30 bucket
    jan1b = got3[dt.date(2020, 1, 2)]  # center of the Jan-1 bucket
    assert dec30["image_count"] == sel_count(
        roistats_pdf, dt.date(2019, 12, 30), dt.date(2020, 1, 1)
    )
    assert jan1b["image_count"] == sel_count(
        roistats_pdf, dt.date(2020, 1, 2), dt.date(2020, 1, 3)
    )

    got7 = {r["date"]: r for r in generate_gcc_summary(sdf, nday=7, nmin=1).collect()}
    dec31 = got7[dt.date(2020, 1, 3)]  # center of the Dec-31 (doy 365) bucket
    assert dec31["image_count"] == sel_count(
        roistats_pdf, dt.date(2019, 12, 31), dt.date(2020, 1, 6)
    )

    # first-year series starting ON Jan 1: no previous bucket exists, so
    # Jan 1 rows stay in the Jan-1 bucket (daterange2 starts at the
    # bucket containing dt_first)
    jan_only = roistats_pdf[roistats_pdf.date >= dt.date(2020, 1, 1)]
    gotj = {
        r["date"]: r
        for r in generate_gcc_summary(
            spark.createDataFrame(jan_only), nday=3, nmin=1
        ).collect()
    }
    assert dt.date(2019, 12, 31) not in gotj
    assert gotj[dt.date(2020, 1, 2)]["image_count"] == sel_count(
        jan_only, dt.date(2020, 1, 1), dt.date(2020, 1, 3)
    )


def test_update_across_spilled_year_boundary(spark, roistats_pdf):
    """update == full recompute when the old data ends exactly on a
    spilled Jan-1 row: the tail recompute must not re-emit (or starve)
    the frozen previous-year bucket."""
    from python_vegindex_spark.operators.vegindex_summary import update_gcc_summary

    cut = dt.datetime(2020, 1, 2)  # old rows end Jan 1 (spilled into Dec-30)
    old_summary = generate_gcc_summary(
        spark.createDataFrame(roistats_pdf[roistats_pdf.ts < cut]), nday=3, nmin=2
    )
    full_sdf = spark.createDataFrame(roistats_pdf)
    updated = update_gcc_summary(old_summary, full_sdf, nday=3, nmin=2)
    full = generate_gcc_summary(full_sdf, nday=3, nmin=2)
    u = {r["date"]: r for r in updated.collect()}
    f = {r["date"]: r for r in full.collect()}
    assert set(u) == set(f)
    for d_, fr in f.items():
        for c in GCC_SUMMARY_FIELDS:
            fv, uv = fr[c], u[d_][c]
            if isinstance(fv, float):
                assert uv == pytest.approx(fv, rel=1e-12), (d_, c)
            else:
                assert uv == fv, (d_, c)


def test_generate_summary_from_catalog_file(spark):
    """End-to-end on a REAL reference tier-1 file: the alligatorriver IR
    roistats renamed into the RGB shape (the only tier-1 sample shipped);
    checks bucket structure + counts are internally consistent."""
    import os

    REF = "/root/reference/tests/sample_data"
    if not os.path.isdir(REF):
        pytest.skip("no reference sample data")
    from python_vegindex_spark.sources.catalog import get_roi_ir_timeseries

    ir, _ = get_roi_ir_timeseries(spark, REF, "alligatorriver", "DB_1000")
    # impersonate RGB roistats: ir_mean as every band, stored gcc = 1/3
    rgbish = ir.select(
        "ts", "filename", "solar_elev", "awbflag",
        F.col("ir_mean").alias("r_mean"),
        F.col("ir_mean").alias("g_mean"),
        F.col("ir_mean").alias("b_mean"),
        F.lit(1.0 / 3).alias("gcc"),
    )
    out = generate_gcc_summary(rgbish, nday=3, nmin=1, brt_min=1.0, brt_max=1e9)
    rows = out.collect()
    assert len(rows) > 100  # 3 years of 3-day buckets incl. gap-fill
    # every populated bucket recomputed rcc == 1/3 and gcc == stored 1/3
    pop = [r for r in rows if r["image_count"] > 0]
    assert pop and all(abs(r["rcc_mean"] - 1 / 3) < 1e-9 for r in pop)
    assert all(abs(r["gcc_mean"] - 1 / 3) < 1e-9 for r in pop)
    # gap-filled zero buckets are all-ND
    zero = [r for r in rows if r["image_count"] == 0]
    assert zero and all(r["gcc_mean"] is None and r["midday_filename"] is None for r in zero)


# ---------------------------------------------------------------------------
# NDVI summary generation (second flagship)

@pytest.fixture(scope="module")
def ndvits_pdf():
    rng = np.random.default_rng(31)
    rows = []
    day = dt.date(2021, 3, 1)
    for d in range(30):
        date = day + dt.timedelta(days=d)
        if d in (5, 6):
            continue
        for i in range(int(rng.integers(1, 5))):
            ts = dt.datetime(date.year, date.month, date.day, 9 + 2 * i, 1, 3)
            r = float(rng.uniform(40, 120)); g = float(rng.uniform(40, 120)); b = float(rng.uniform(40, 120))
            rows.append(
                dict(
                    ts=ts,
                    filename_rgb=f"s_{ts:%Y_%m_%d_%H%M%S}.jpg",
                    filename_ir=f"s_IR_{ts:%Y_%m_%d_%H%M%S}.jpg",
                    solar_elev=float(rng.uniform(12, 70)),
                    r_mean=r, g_mean=g, b_mean=b,
                    gcc=g / (r + g + b),
                    NDVI_c=float(rng.uniform(-0.2, 0.9)),
                )
            )
    # a couple of out-of-range NDVI rows that filter_rows must drop
    rows.append(dict(ts=dt.datetime(2021, 3, 2, 10), filename_rgb="x.jpg",
                     filename_ir="xi.jpg", solar_elev=30.0, r_mean=50.0,
                     g_mean=50.0, b_mean=50.0, gcc=1 / 3, NDVI_c=1.5))
    return pd.DataFrame(rows)


def _ndvi_oracle(pdf: pd.DataFrame, nday: int, nmin: int, qc_mode: str = "reference") -> dict:
    df = pdf.copy()
    if qc_mode == "reference":
        # bug-compatible with the reference script: filter_rows iterates
        # self.rows, discarding the select_rows result entirely
        # (generate_ndvi_summary_timeseries.py:235-252)
        keep = df.NDVI_c.between(-1.0, 1.0)
    else:
        brt = df.r_mean + df.g_mean + df.b_mean
        keep = (
            brt.between(100.0, 665.0)
            & (df.solar_elev >= 10.0)
            & df.r_mean.notna()
            & df.NDVI_c.between(-1.0, 1.0)
        )
    df = df[keep].sort_values("ts", kind="mergesort")
    df["date"] = df.ts.dt.date

    def bstart(d):
        doy = d.timetuple().tm_yday
        return dt.date(d.year, 1, 1) + dt.timedelta(days=((doy - 1) // nday) * nday)

    out = {}
    b = bstart(df.date.min()); last = bstart(df.date.max())
    while b <= last:
        end = min(b + dt.timedelta(days=nday), dt.date(b.year + 1, 1, 1))
        rows = df[(df.date >= b) & (df.date < end)]
        center = b + dt.timedelta(days=nday // 2)
        noon = dt.datetime(center.year, center.month, center.day, 12)
        rec = {"image_count": 0}
        if len(rows):
            dnsum = rows.r_mean + rows.g_mean + rows.b_mean
            okm = dnsum > 0
            gccv = np.where(okm, rows.gcc, np.nan)
            cnt = int(okm.sum())
            rec["image_count"] = cnt
            if cnt > 0:
                mi = int(np.argmin((rows.ts - noon).abs().to_numpy()))
                rec["midday_rgb_filename"] = rows.filename_rgb.iloc[mi]
                rec["midday_ndvi"] = float(rows.NDVI_c.iloc[mi])
                rec["max_solar_elev"] = float(rows.solar_elev.max())
            if cnt >= nmin and cnt > 0:
                rec["gcc_90"] = hf7_numpy(gccv, 0.9)
                rec["ndvi_mean"] = float(np.nanmean(rows.NDVI_c))
                rec["ndvi_std"] = float(np.nanstd(rows.NDVI_c))
                rec["ndvi_50"] = hf7_numpy(rows.NDVI_c.to_numpy(), 0.5)
                rec["ndvi_90"] = hf7_numpy(rows.NDVI_c.to_numpy(), 0.9)
        out[center] = rec
        nxt = b + dt.timedelta(days=nday)
        b = dt.date(b.year + 1, 1, 1) if nxt.year != b.year else nxt
    return out


@pytest.mark.parametrize(
    "nday,nmin,qc_mode", [(3, 2, "reference"), (3, 2, "conjunctive")]
)
def test_generate_ndvi_summary_matches_oracle(spark, ndvits_pdf, nday, nmin, qc_mode):
    from python_vegindex_spark.operators.vegindex_summary import (
        generate_ndvi_summary_table,
    )
    from python_vegindex_spark.sources.summary_export import NDVI_SUMMARY_FIELDS

    got = generate_ndvi_summary_table(
        spark.createDataFrame(ndvits_pdf), nday=nday, nmin=nmin, qc_mode=qc_mode
    )
    assert got.columns == NDVI_SUMMARY_FIELDS
    got_rows = {r["date"]: r for r in got.collect()}
    exp = _ndvi_oracle(ndvits_pdf, nday, nmin, qc_mode)
    assert set(got_rows) == set(exp)
    for center, e in exp.items():
        g = got_rows[center]
        assert g["image_count"] == e["image_count"], center
        for k in ("midday_rgb_filename",):
            assert g[k] == e.get(k), (center, k)
        for k in ("midday_ndvi", "max_solar_elev", "gcc_90", "ndvi_mean",
                  "ndvi_std", "ndvi_50", "ndvi_90"):
            ev = e.get(k)
            if ev is None or (isinstance(ev, float) and np.isnan(ev)):
                assert g[k] is None, (center, k, g[k])
            else:
                assert g[k] == pytest.approx(ev, rel=1e-12), (center, k)


# ---------------------------------------------------------------------------
# incremental update (update_summary_timeseries flow)

def test_update_gcc_summary_equals_full_recompute(spark, roistats_pdf):
    from python_vegindex_spark.operators.vegindex_summary import update_gcc_summary

    cut = dt.datetime(2020, 1, 8)
    old_rows = roistats_pdf[roistats_pdf.ts < cut]
    full_sdf = spark.createDataFrame(roistats_pdf)
    old_summary = generate_gcc_summary(
        spark.createDataFrame(old_rows), nday=3, nmin=2
    )
    updated = update_gcc_summary(old_summary, full_sdf, nday=3, nmin=2)
    full = generate_gcc_summary(full_sdf, nday=3, nmin=2)

    u = {r["date"]: r for r in updated.collect()}
    f = {r["date"]: r for r in full.collect()}
    assert set(u) == set(f)
    for d_, fr in f.items():
        ur = u[d_]
        for c in GCC_SUMMARY_FIELDS:
            fv, uv = fr[c], ur[c]
            if isinstance(fv, float):
                assert uv == pytest.approx(fv, rel=1e-12), (d_, c)
            else:
                assert uv == fv, (d_, c)


def test_update_gcc_summary_with_gap_after_tail(spark, roistats_pdf):
    """New data far past the old tail: the re-opened bucket and the gap
    buckets in between must all be emitted (spine_start extension)."""
    from python_vegindex_spark.operators.vegindex_summary import update_gcc_summary

    old_rows = roistats_pdf[roistats_pdf.ts < dt.datetime(2020, 1, 8)]
    late = roistats_pdf.copy()
    late = late[(late.ts < dt.datetime(2020, 1, 8)) | (late.ts >= dt.datetime(2020, 1, 20))]
    old_summary = generate_gcc_summary(spark.createDataFrame(old_rows), nday=3, nmin=2)
    updated = update_gcc_summary(old_summary, spark.createDataFrame(late), nday=3, nmin=2)
    full = generate_gcc_summary(spark.createDataFrame(late), nday=3, nmin=2)
    u = {r["date"]: r["image_count"] for r in updated.collect()}
    f = {r["date"]: r["image_count"] for r in full.collect()}
    assert u == f  # including the zero-count gap buckets


def test_update_ndvi_summary_equals_full_recompute(spark, ndvits_pdf):
    from python_vegindex_spark.operators.vegindex_summary import (
        generate_ndvi_summary_table,
        update_ndvi_summary,
    )
    from python_vegindex_spark.sources.summary_export import NDVI_SUMMARY_FIELDS

    cut = dt.datetime(2021, 3, 18)
    old_rows = ndvits_pdf[ndvits_pdf.ts < cut]
    full_sdf = spark.createDataFrame(ndvits_pdf)
    old_summary = generate_ndvi_summary_table(
        spark.createDataFrame(old_rows), nday=3, nmin=2
    )
    updated = update_ndvi_summary(old_summary, full_sdf, nday=3, nmin=2)
    full = generate_ndvi_summary_table(full_sdf, nday=3, nmin=2)
    u = {r["date"]: r for r in updated.collect()}
    f = {r["date"]: r for r in full.collect()}
    assert set(u) == set(f)
    for d_, fr in f.items():
        for c in NDVI_SUMMARY_FIELDS:
            fv, uv = fr[c], u[d_][c]
            if isinstance(fv, float):
                assert uv == pytest.approx(fv, rel=1e-12), (d_, c)
            else:
                assert uv == fv, (d_, c)
