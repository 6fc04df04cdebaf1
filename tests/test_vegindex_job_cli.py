"""The CLI job twin end-to-end on a synthetic archive: roistats CSV in,
reference-format summary CSV out, re-readable by the golden reader."""

from __future__ import annotations

import datetime as dt
import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from python_vegindex_spark.sources.csv_compat import write_headered_csv
from python_vegindex_spark.sources.vegindex_tables import read_gcc_summary


@pytest.fixture()
def synth_archive(spark, tmp_path):
    rng = np.random.default_rng(23)
    rows = []
    for d in range(15):
        date = dt.date(2022, 6, 1) + dt.timedelta(days=d)
        for i in range(3):
            ts = dt.datetime(date.year, date.month, date.day, 9 + 2 * i, 15, 0)
            r, g, b = (float(v) for v in rng.uniform(40, 120, 3))
            rows.append(
                dict(
                    date=date, local_std_time=ts.strftime("%H:%M:%S"),
                    doy=date.timetuple().tm_yday,
                    filename=f"mysite_{ts:%Y_%m_%d_%H%M%S}.jpg",
                    solar_elev=float(rng.uniform(15, 70)), exposure=30,
                    awbflag=0, mask_index=1, gcc=g / (r + g + b),
                    rcc=r / (r + g + b), r_mean=r, g_mean=g, b_mean=b,
                )
            )
    pdf = pd.DataFrame(rows)
    roi_dir = tmp_path / "mysite" / "ROI"
    roi_dir.mkdir(parents=True)
    write_headered_csv(
        spark.createDataFrame(pdf),
        str(roi_dir / "mysite_DB_0001_roistats.csv"),
        {"Site": "mysite", "Veg Type": "DB", "ROI ID Number": "0001"},
        sort_cols=["date", "local_std_time"],
    )
    return str(tmp_path)


def test_gcc_summary_job_end_to_end(spark, synth_archive, tmp_path):
    import vegindex_job

    out_path = str(tmp_path / "out_summary.csv")
    got = vegindex_job.main(
        [
            "gcc-summary", "--archive", synth_archive, "--site", "mysite",
            "--roi", "DB_0001", "--nday", "3", "--nmin", "2",
            "--out", out_path, "--master", "local[4]",
        ]
    )
    assert got == out_path and os.path.exists(out_path)
    back, props = read_gcc_summary(spark, out_path)
    assert props["Site"] == "mysite"
    assert int(props["Aggregation Period"]) == 3
    rows = back.orderBy("date").collect()
    assert len(rows) >= 5  # 15 days / 3-day buckets
    assert all(r["image_count"] > 0 for r in rows)  # no gaps in this archive
    assert all(r["gcc_mean"] is not None for r in rows if r["image_count"] >= 2)


@pytest.fixture()
def synth_ndvi_archive(spark, tmp_path):
    rng = np.random.default_rng(41)
    rows = []
    for d in range(12):
        date = dt.date(2022, 6, 1) + dt.timedelta(days=d)
        for i in range(3):
            ts = dt.datetime(date.year, date.month, date.day, 9 + 2 * i, 45, 0)
            r, g, b = (float(v) for v in rng.uniform(40, 120, 3))
            rows.append(
                dict(
                    date=date, local_std_time=ts.strftime("%H:%M:%S"),
                    doy=date.timetuple().tm_yday,
                    filename_rgb=f"mysite_{ts:%Y_%m_%d_%H%M%S}.jpg",
                    filename_ir=f"mysite_IR_{ts:%Y_%m_%d_%H%M%S}.jpg",
                    solar_elev=float(rng.uniform(15, 70)), exposure_rgb=30,
                    exposure_ir=30, awbflag=0, mask_index=1,
                    gcc=g / (r + g + b), r_mean=r, g_mean=g, b_mean=b,
                    NDVI_c=float(rng.uniform(0.1, 0.8)),
                )
            )
    pdf = pd.DataFrame(rows)
    roi_dir = tmp_path / "mysite" / "ROI"
    roi_dir.mkdir(parents=True)
    write_headered_csv(
        spark.createDataFrame(pdf),
        str(roi_dir / "mysite_DB_0001_NDVI_roistats.csv"),
        {"Site": "mysite", "Veg Type": "DB", "ROI ID Number": "0001"},
        sort_cols=["date", "local_std_time"],
    )
    return str(tmp_path)


def test_update_ndvi_job_end_to_end(spark, synth_ndvi_archive):
    """ndvi-summary writes the canonical summary; update-ndvi re-reads it
    plus the tier-1 table and (with no new rows) reproduces it."""
    import vegindex_job

    from python_vegindex_spark.sources.vegindex_tables import read_ndvi_summary

    common = [
        "--archive", synth_ndvi_archive, "--site", "mysite",
        "--roi", "DB_0001", "--nday", "3", "--nmin", "2",
        "--master", "local[4]",
    ]
    gen_path = vegindex_job.main(["ndvi-summary", *common])
    assert os.path.basename(gen_path) == "mysite_DB_0001_ndvi_3day.csv"
    gen_df, props = read_ndvi_summary(spark, gen_path)
    assert props["Site"] == "mysite"
    upd_path = vegindex_job.main(["update-ndvi", *common])
    assert upd_path == gen_path
    upd_df, _ = read_ndvi_summary(spark, upd_path)
    g = {r["date"]: r for r in gen_df.collect()}
    u = {r["date"]: r for r in upd_df.collect()}
    assert set(g) == set(u) and len(g) >= 4
    for d_, gr in g.items():
        for c in gen_df.columns:
            gv, uv = gr[c], u[d_][c]
            if isinstance(gv, float):
                assert uv == pytest.approx(gv, rel=1e-9), (d_, c)
            else:
                assert uv == gv, (d_, c)


def test_update_preserves_creation_and_guards_thresholds(
    spark, synth_archive, tmp_path
):
    """update-gcc keeps the existing header's Creation Date/Time (the
    reference re-writes created_at read from the header) and refuses —
    exit 1, like update_summary_timeseries.py:160-177 — when the
    requested QC thresholds differ from the header's."""
    import vegindex_job

    roi_dir = os.path.join(synth_archive, "mysite", "ROI")
    vegindex_job.main(
        [
            "gcc-summary", "--archive", synth_archive, "--site", "mysite",
            "--roi", "DB_0001", "--nday", "3", "--nmin", "2",
            "--master", "local[4]",
        ]
    )
    summary_path = os.path.join(roi_dir, "mysite_DB_0001_3day.csv")
    # pin a recognizable Creation stamp into the existing file
    txt = open(summary_path).read()
    txt = txt.replace(
        "# Creation Date: ", "# Creation Date: 2017-02-16\n# _was: ", 1
    )
    open(summary_path, "w").write(txt)

    vegindex_job.main(
        [
            "update-gcc", "--archive", synth_archive, "--site", "mysite",
            "--roi", "DB_0001", "--nday", "3", "--nmin", "2",
            "--master", "local[4]",
        ]
    )
    hdr = open(summary_path).read()
    assert "# Creation Date: 2017-02-16" in hdr, "creation stamp not preserved"
    # banner prologue present (gcctimeseries.py:586-591)
    assert "# 3-day summary product timeseries for mysite" in hdr

    with pytest.raises(SystemExit) as e:
        vegindex_job.main(
            [
                "update-gcc", "--archive", synth_archive, "--site", "mysite",
                "--roi", "DB_0001", "--nday", "3", "--nmin", "2",
                "--brt-min", "130", "--master", "local[4]",
            ]
        )
    assert e.value.code == 1


def test_subthreshold_rows_render_plain_floats(spark, tmp_path):
    """0 < image_count < nmin rows print the stats block with plain '{}'
    full precision (gcctimeseries.py:510-519) while the midday block
    stays %.5f; zero-count rows print everything plain. Deterministic
    writer-level check (exact bytes)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "image_count": [0, 2, 9],
            "midday_gcc": [None, 0.25, 0.5],
            "gcc_mean": [None, None, 0.4],
            "max_solar_elev": [None, 53.5, 53.5],
        }
    )
    out = str(tmp_path / "plain.csv")
    sub_plain = {"gcc_mean", "max_solar_elev"}
    zero_plain = {"midday_gcc", "gcc_mean", "max_solar_elev"}

    def rule(row, nmin=5):
        if row.image_count == 0:
            return zero_plain
        if row.image_count < nmin:
            return sub_plain
        return None

    write_headered_csv(
        spark.createDataFrame(pdf).coalesce(1),
        out,
        {"Site": "x"},
        sort_cols=["image_count"],
        plain_cols_for_row=rule,
    )
    data = [ln.rstrip("\n") for ln in open(out) if not ln.startswith("#")][1:]
    assert data[0] == "0,NA,NA,NA"
    # sub-threshold: midday %.5f, max_solar_elev plain (no trailing zeros)
    assert data[1] == "2,0.25000,NA,53.5"
    # above threshold: everything fixed 5 decimals
    assert data[2] == "9,0.50000,0.40000,53.50000"
