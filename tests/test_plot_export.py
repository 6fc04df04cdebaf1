"""plot_roistats twin (operators/plot_export + the plot-roistats CLI
job): partition split pinned to the reference's boolean masks, M4
pre-reduction bound, CSV export round-trip."""

from __future__ import annotations

import datetime as dt
import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    ),
)

from pyspark.sql import functions as F

from python_vegindex_spark.operators.plot_export import (
    plot_roistats_table,
    roistats_plot_partitions,
)


def _synth_roistats_pdf(n=120, seed=5):
    """Rows engineered to hit every partition: low sun, dark, bright,
    good, plus ND solar_elev and ND band rows."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        ts = dt.datetime(2022, 6, 1) + dt.timedelta(hours=3 * i)
        kind = i % 6
        solar = {0: 4.0, 1: 45.0, 2: 45.0, 3: 45.0, 4: None, 5: 30.0}[kind]
        if kind == 2:  # dark
            r = g = b = 20.0
        elif kind == 3:  # bright
            r = g = b = 250.0
        elif kind == 5:  # ND band -> ND brt, day row dropped
            r, g, b = None, 80.0, 90.0
        else:
            r, g, b = (float(v) for v in rng.uniform(40, 120, 3))
        tot = (r + g + b) if None not in (r, g, b) else None
        rows.append(
            dict(
                date=ts.date(), local_std_time=ts.strftime("%H:%M:%S"),
                doy=ts.timetuple().tm_yday,
                filename=f"mysite_{ts:%Y_%m_%d_%H%M%S}.jpg",
                solar_elev=solar, exposure=30, awbflag=0, mask_index=1,
                gcc=(g / tot if tot else None),
                rcc=(r / tot if tot else None),
                r_mean=r, g_mean=g, b_mean=b,
                ts=ts,
            )
        )
    return pd.DataFrame(rows)


def _reference_split(pdf: pd.DataFrame):
    """The reference's exact pandas mask logic (plot_roistats.py:88-101)."""
    df = pdf.copy()
    df["brt"] = df["r_mean"] + df["g_mean"] + df["b_mean"]
    low = df[df.solar_elev < 10.0]
    day = df[df.solar_elev >= 10.0]
    brt_f = day[(day.brt < 100) | (day.brt > 665)]
    good = day[(day.brt >= 100) & (day.brt <= 665)]
    return low, brt_f, good


def test_partitions_match_reference_masks(spark):
    pdf = _synth_roistats_pdf()
    low, brt_f, good = _reference_split(pdf)
    sdf = spark.createDataFrame(pdf)
    got = roistats_plot_partitions(sdf).groupBy("series").count().collect()
    counts = {r["series"]: r["count"] for r in got}
    assert counts.get("low_sun", 0) == len(low)
    assert counts.get("brt_filtered", 0) == len(brt_f)
    assert counts.get("good", 0) == len(good)
    # per-row membership, not just counts
    tagged = {
        r["filename"]: r["series"]
        for r in roistats_plot_partitions(sdf).select("filename", "series").collect()
    }
    assert set(tagged) == set(low.filename) | set(brt_f.filename) | set(good.filename)
    for fn in good.filename:
        assert tagged[fn] == "good"
    for fn in low.filename:
        assert tagged[fn] == "low_sun"


def test_plot_table_layers_and_bounds(spark):
    pdf = _synth_roistats_pdf()
    sdf = spark.createDataFrame(pdf)
    summary = spark.createDataFrame(
        pd.DataFrame(
            {
                "date": [dt.date(2022, 6, 1) + dt.timedelta(days=3 * i) for i in range(4)],
                "gcc_90": [0.41, 0.42, None, 0.44],
            }
        )
    )
    out = plot_roistats_table(sdf, summary, width=8).toPandas()
    assert set(out.layer) == {"points", "line"}
    line = out[out.layer == "line"]
    assert len(line) == 3 and set(line.series) == {"gcc_90"}  # ND gcc_90 dropped
    pts = out[out.layer == "points"]
    for s, grp in pts.groupby("series"):
        assert len(grp) <= 4 * 8
    # wide export keeps every distinct good point (one pixel each)
    wide = plot_roistats_table(sdf, summary, width=100000).toPandas()
    low, brt_f, good = _reference_split(pdf)
    good_pts = wide[(wide.layer == "points") & (wide.series == "good")]
    assert len(good_pts) == good.gcc.notna().sum()


def test_plot_roistats_cli_end_to_end(spark, tmp_path):
    import vegindex_job

    from python_vegindex_spark.sources.csv_compat import write_headered_csv

    pdf = _synth_roistats_pdf()
    roi_dir = tmp_path / "mysite" / "ROI"
    roi_dir.mkdir(parents=True)
    write_headered_csv(
        spark.createDataFrame(pdf.drop(columns=["ts"])),
        str(roi_dir / "mysite_DB_0001_roistats.csv"),
        {"Site": "mysite", "Veg Type": "DB", "ROI ID Number": "0001"},
        sort_cols=["date", "local_std_time"],
    )
    common = [
        "--archive", str(tmp_path), "--site", "mysite", "--roi", "DB_0001",
        "--master", "local[4]",
    ]
    # build the 3-day summary the reference script reads alongside
    vegindex_job.main(["gcc-summary", *common, "--nday", "3", "--nmin", "1"])
    path = vegindex_job.main(["plot-roistats", *common, "--width", "64"])
    assert os.path.basename(path) == "mysite_DB_0001_roistats_plot.csv"
    hdr = [line for line in open(path) if line.startswith("#")]
    assert any("M4 Width: 64" in h for h in hdr)
    back = pd.read_csv(path, comment="#")
    assert list(back.columns) == ["layer", "series", "ts", "gcc"]
    assert set(back.layer) == {"points", "line"}
    assert {"good", "low_sun", "brt_filtered"} <= set(
        back[back.layer == "points"].series
    )
    assert (back[back.layer == "line"].series == "gcc_90").all()


def test_partitions_nan_rows_dropped_like_pandas(spark):
    """Round-4 review: Spark orders NaN GREATER than every number, so
    un-normalized NaN solar/brt rows would land in 'good'/'brt_filtered'
    — the reference's pandas masks drop them. Pin the drop."""
    pdf = pd.DataFrame(
        {
            "filename": ["nan_solar.jpg", "nan_brt.jpg", "ok.jpg"],
            "solar_elev": [np.nan, 45.0, 45.0],
            "r_mean": [80.0, np.nan, 80.0],
            "g_mean": [80.0, 80.0, 80.0],
            "b_mean": [80.0, 80.0, 80.0],
            "gcc": [0.33, 0.33, 0.33],
            "ts": [dt.datetime(2022, 6, 1, 12)] * 3,
        }
    )
    got = roistats_plot_partitions(spark.createDataFrame(pdf)).collect()
    assert [(r["filename"], r["series"]) for r in got] == [("ok.jpg", "good")]
    # matches the reference masks exactly
    low, brt_f, good = _reference_split(pdf)
    assert len(low) == 0 and len(brt_f) == 0 and list(good.filename) == ["ok.jpg"]
