"""IR tier-1 pipeline + NDVI tier-1.5 generation — the last two console
entry points (generate/update_roi_ir_timeseries, generate_ndvi_timeseries).

Oracles: the IR stats kernel against the reference formula re-derived
with np.ma/np.percentile (ir_roitimeseries.py:56-121), and the NDVI
table against the reference's own pandas flow (pd.merge_asof + Petach
algebra, generate_ndvi_timeseries.py:100-248) re-run in-process."""

from __future__ import annotations

import datetime as dt
import os
import sys

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    ),
)

from python_vegindex_spark.operators.paired import NDVI_TS_FIELDS, generate_ndvi_table
from python_vegindex_spark.operators.roi_pipeline import (
    IR_ROI_STATS_FIELDS,
    fake_decode,
    generate_roi_ir_stats,
    update_roi_ir_stats,
)
from python_vegindex_spark.operators.roi_stats import roi_ir_stats_arrays

SITE = "demo"
H, W = 48, 64


# ---------------------------------------------------------------------------
# kernel parity vs the reference formula (ir_roitimeseries.py:56-121)

def _reference_ir_stats(arr: np.ndarray, mask: np.ndarray):
    ir = arr[..., 0].astype(np.int16)
    ir_ma = np.ma.array(ir, mask=mask)
    vals = ir_ma.compressed()
    mean = vals.mean()
    diff = np.float64(vals) - mean
    std = np.sqrt(np.dot(diff, diff) / vals.size)
    pcts = np.percentile(vals, (5.0, 10.0, 25.0, 50.0, 75.0, 90.0, 95.0))
    return mean, std, pcts


def test_ir_stats_numpy_parity():
    arr = fake_decode(b"\x00\x00\x00\x07", h=100, w=120)
    mask = np.zeros((100, 120), dtype=bool)
    mask[:, :40] = True
    got = roi_ir_stats_arrays(arr[..., 0], arr[..., 1], arr[..., 2], mask)
    mean, std, pcts = _reference_ir_stats(arr, mask)
    np.testing.assert_allclose(got["ir_mean"], mean, rtol=1e-12)
    np.testing.assert_allclose(got["ir_std"], std, rtol=1e-12)
    for q, p in zip((5, 10, 25, 50, 75, 90, 95), pcts):
        np.testing.assert_allclose(got[f"ir_{q}_qtl"], p, rtol=1e-12)


def test_ir_stats_dark_bright_guards():
    mask = np.zeros((100, 120), dtype=bool)
    dark = np.zeros((100, 120, 3), dtype=np.uint8)
    got = roi_ir_stats_arrays(dark[..., 0], dark[..., 1], dark[..., 2], mask)
    assert all(v is None for v in got.values())
    bright = np.full((100, 120, 3), 250, dtype=np.uint8)
    got = roi_ir_stats_arrays(bright[..., 0], bright[..., 1], bright[..., 2], mask)
    assert all(v is None for v in got.values())
    # tiny image: empty inner crop -> reference's NaN mean fails both
    # guards -> full stats anyway
    tiny = np.zeros((10, 10, 3), dtype=np.uint8)
    got = roi_ir_stats_arrays(
        tiny[..., 0], tiny[..., 1], tiny[..., 2], np.zeros((10, 10), dtype=bool)
    )
    assert got["ir_mean"] == 0.0


# ---------------------------------------------------------------------------
# end-to-end: synthetic IR archive -> tier-1 IR roistats

IR_TIMES = [
    dt.datetime(2022, 6, 1, 9, 31, 0),
    dt.datetime(2022, 6, 10, 10, 16, 0),
    dt.datetime(2022, 6, 20, 11, 46, 0),
    dt.datetime(2022, 7, 1, 9, 1, 0),
]


def _write_ir_archive(root: str):
    """IR images (``demo_IR_*.jpg``) plus one RGB decoy that the IR scan
    must ignore; masks switch mid-June; image 2 has a .meta sidecar."""
    paths = []
    for i, t in enumerate(IR_TIMES):
        d = os.path.join(root, SITE, f"{t:%Y}", f"{t:%m}")
        os.makedirs(d, exist_ok=True)
        fn = f"{SITE}_IR_{t:%Y_%m_%d_%H%M%S}.jpg"
        p = os.path.join(d, fn)
        with open(p, "wb") as f:
            f.write(int(100 + i).to_bytes(4, "big") + b"ir")
        paths.append((fn, p, t))
    # RGB decoy in the same tree (with exposure so the NDVI pairing
    # survives the null/zero-exposure drop)
    rgb_decoy = os.path.join(
        root, SITE, "2022", "06", f"{SITE}_2022_06_01_093000.jpg"
    )
    with open(rgb_decoy, "wb") as f:
        f.write(int(1).to_bytes(4, "big") + b"rgb")
    with open(rgb_decoy.replace(".jpg", ".meta"), "w") as f:
        f.write("exposure=120\nbalance=1\n")
    with open(paths[0][1].replace(".jpg", ".meta"), "w") as f:
        f.write("exposure=40\nbalance=1\n")
    with open(paths[2][1].replace(".jpg", ".meta"), "w") as f:
        f.write("exposure=250\nbalance=0\n")
    roi_dir = os.path.join(root, SITE, "ROI")
    os.makedirs(roi_dir, exist_ok=True)
    m1 = np.zeros((H, W), dtype=bool)
    m1[:, : W // 2] = True
    m2 = np.zeros((H, W), dtype=bool)
    m2[: H // 2, :] = True
    np.save(os.path.join(roi_dir, "mask_01.npy"), m1)
    np.save(os.path.join(roi_dir, "mask_02.npy"), m2)
    with open(os.path.join(roi_dir, f"{SITE}_DB_0001_roi.csv"), "w") as f:
        f.write(
            "# ROI List for demo\n#\n"
            "start_date,start_time,end_date,end_time,maskfile,sample_image\n"
            "2022-06-01,00:00:00,2022-06-15,00:00:00,mask_01.npy,s1.jpg\n"
            "2022-06-15,00:00:00,9999-12-31,00:00:00,mask_02.npy,s2.jpg\n"
        )
    return paths, m1, m2


@pytest.fixture()
def ir_archive(tmp_path):
    return str(tmp_path), *_write_ir_archive(str(tmp_path))


def test_generate_roi_ir_stats_end_to_end(spark, ir_archive):
    root, paths, m1, m2 = ir_archive
    out = generate_roi_ir_stats(
        spark, root, SITE, "DB_0001", lat=45.0, lon=-70.0, tzoffset=-5.0,
        decode_fn=fake_decode,
    ).orderBy("ts")
    rows = out.collect()
    assert [c for c in out.columns if c != "ts"] == IR_ROI_STATS_FIELDS
    assert len(rows) == len(IR_TIMES)  # the RGB decoy is excluded
    # mask switches mid-June: first two rows mask 1, later rows mask 2
    assert [r["mask_index"] for r in rows] == [1, 1, 2, 2]
    # sidecar exposures land on images 0 and 2 only
    assert rows[2]["exposure"] == 250 and rows[2]["awbflag"] == 0
    assert rows[0]["exposure"] == 40
    assert rows[1]["exposure"] is None
    # stats equal a direct kernel call with the right mask
    arr = fake_decode(int(100).to_bytes(4, "big") + b"ir")
    want = roi_ir_stats_arrays(arr[..., 0], arr[..., 1], arr[..., 2], m1)
    np.testing.assert_allclose(rows[0]["ir_mean"], want["ir_mean"], rtol=1e-9)
    np.testing.assert_allclose(rows[0]["ir_90_qtl"], want["ir_90_qtl"], rtol=1e-9)
    # doy/solar labels derive from the filename timestamp
    assert rows[0]["doy"] == 152 and rows[0]["solar_elev"] is not None


def test_update_roi_ir_equals_full_regenerate(spark, ir_archive):
    root, paths, m1, m2 = ir_archive
    kw = dict(lat=45.0, lon=-70.0, tzoffset=-5.0, decode_fn=fake_decode)
    full = generate_roi_ir_stats(spark, root, SITE, "DB_0001", **kw)
    partial = full.filter(F.col("ts") < "2022-06-15")
    updated = update_roi_ir_stats(partial, spark, root, SITE, "DB_0001", **kw)
    a = sorted(map(tuple, full.drop("ts").collect()))
    b = sorted(map(tuple, updated.drop("ts").collect()))
    assert a == b


# ---------------------------------------------------------------------------
# NDVI tier-1.5: Spark vs the reference's own pandas flow

def _synth_tier1_frames(seed: int = 11, n: int = 60):
    """Reader-shaped RGB + IR roistats frames with jittered IR times,
    unmatched rows, null and zero exposures, and a null mean."""
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2022-06-01 08:00:00")
    rgb_ts = [base + pd.Timedelta(minutes=30 * i) for i in range(n)]
    # IR fires ~90s after RGB, with some dropouts and one far-away row
    ir_ts = [
        t + pd.Timedelta(seconds=int(rng.integers(30, 200)))
        for i, t in enumerate(rgb_ts)
        if i % 7 != 3
    ]
    ir_ts.append(base + pd.Timedelta(days=30))
    rgb = pd.DataFrame(
        {
            "ts": rgb_ts,
            "date": [t.date() for t in rgb_ts],
            "local_std_time": [t.strftime("%H:%M:%S") for t in rgb_ts],
            "doy": [float(t.dayofyear) for t in rgb_ts],
            "filename": [f"{SITE}_{t:%Y_%m_%d_%H%M%S}.jpg" for t in rgb_ts],
            "solar_elev": rng.uniform(5, 70, n).round(5),
            "exposure": rng.integers(8, 300, n).astype(float),
            "mask_index": np.ones(n),
            "gcc": rng.uniform(0.3, 0.45, n).round(5),
            "r_mean": rng.uniform(60, 120, n).round(5),
            "g_mean": rng.uniform(80, 140, n).round(5),
            "b_mean": rng.uniform(40, 100, n).round(5),
        }
    )
    rgb.loc[5, "exposure"] = np.nan   # dropped: null RGB exposure
    rgb.loc[8, "exposure"] = 0.0      # dropped: zero RGB exposure
    rgb.loc[12, "g_mean"] = np.nan    # dropped: null mean
    m = len(ir_ts)
    ir = pd.DataFrame(
        {
            "ts": ir_ts,
            "filename": [f"{SITE}_IR_{t:%Y_%m_%d_%H%M%S}.jpg" for t in ir_ts],
            "exposure": rng.integers(4, 2400, m).astype(float),
            "ir_mean": rng.uniform(40, 90, m).round(5),
            "ir_std": rng.uniform(4, 20, m).round(5),
            **{
                f"ir_{q}_qtl": rng.uniform(20, 95, m).round(0)
                for q in (5, 10, 25, 50, 75, 90, 95)
            },
        }
    )
    ir.loc[2, "exposure"] = np.nan    # dropped where matched: null IR exposure
    ir.loc[4, "exposure"] = 0.0       # dropped where matched: zero IR exposure
    return rgb, ir


def _reference_ndvi_oracle(rgb: pd.DataFrame, ir: pd.DataFrame) -> pd.DataFrame:
    """generate_ndvi_timeseries.py:100-248 verbatim in pandas."""
    df_rgb = rgb.rename(columns={"ts": "date_local_std_time"}).sort_values(
        "date_local_std_time"
    )
    df_ir = ir.rename(columns={"ts": "date_local_std_time"}).sort_values(
        "date_local_std_time"
    )
    df = pd.merge_asof(
        df_rgb,
        df_ir,
        on="date_local_std_time",
        suffixes=("_rgb", "_ir"),
        direction="nearest",
        tolerance=pd.Timedelta(minutes=10),
    )
    df = df[df.filename_ir.notnull()]
    df = df[df.exposure_ir.notnull() & df.exposure_rgb.notnull()]
    df = df[(df.exposure_ir != 0) & (df.exposure_rgb != 0)]
    df = df[
        df.r_mean.notnull() & df.g_mean.notnull() & df.b_mean.notnull()
        & df.ir_mean.notnull()
    ]
    df["Y"] = 0.3 * df.r_mean + 0.59 * df.g_mean + 0.11 * df.b_mean
    df["Z_prime"] = df.ir_mean / np.sqrt(df.exposure_ir)
    df["R_prime"] = df.r_mean / np.sqrt(df.exposure_rgb)
    df["Y_prime"] = df.Y / np.sqrt(df.exposure_rgb)
    df["X_prime"] = df.Z_prime - df.Y_prime
    df["NDVI_c"] = (df.X_prime - df.R_prime) / (df.X_prime + df.R_prime)
    df = df.astype(
        {c: "int32" for c in
         ("doy", "exposure_rgb", "exposure_ir", "mask_index",
          "r_mean", "g_mean", "b_mean", "ir_mean")}
    )
    out = df.rename(columns={"solar_elev_rgb": "solar_elev"})
    return out[[c for c in NDVI_TS_FIELDS if c not in ("date", "local_std_time")]]


def _to_spark_nullsafe(spark, pdf: pd.DataFrame):
    """createDataFrame keeps float NaN as NaN; the CSV readers produce
    real NULLs ('NA' -> null). Convert so the synth frames match the
    reader contract the operator is written against."""
    df = spark.createDataFrame(pdf)
    for f in df.schema.fields:
        if f.dataType.typeName() == "double":
            df = df.withColumn(
                f.name, F.nanvl(F.col(f.name), F.lit(None).cast("double"))
            )
    return df


def test_generate_ndvi_table_matches_reference_pandas_flow(spark):
    rgb_pd, ir_pd = _synth_tier1_frames()
    rgb = _to_spark_nullsafe(spark, rgb_pd)
    ir = _to_spark_nullsafe(spark, ir_pd)
    got = (
        generate_ndvi_table(rgb, ir)
        .orderBy("ts")
        .toPandas()
        .reset_index(drop=True)
    )
    assert [c for c in got.columns if c != "ts"] == NDVI_TS_FIELDS
    want = _reference_ndvi_oracle(rgb_pd, ir_pd).reset_index(drop=True)
    assert len(got) == len(want) and len(got) > 30
    for c in want.columns:
        if want[c].dtype == object:
            assert list(got[c]) == list(want[c]), c
        else:
            np.testing.assert_allclose(
                got[c].to_numpy(dtype=float),
                want[c].to_numpy(dtype=float),
                rtol=1e-12,
                err_msg=c,
            )


def test_ndvi_keeps_out_of_range_and_skips_clamp(spark):
    """The generator must NOT range-filter NDVI_c (that happens in the
    summary reader): craft a pair whose NDVI_c < -1 and check it survives."""
    ts = [pd.Timestamp("2022-06-01 08:00:00")]
    rgb = spark.createDataFrame(
        pd.DataFrame(
            {
                "ts": ts, "date": [ts[0].date()], "local_std_time": ["08:00:00"],
                "doy": [152.0], "filename": ["demo_2022_06_01_080000.jpg"],
                "solar_elev": [30.0], "exposure": [100.0], "mask_index": [1.0],
                "gcc": [0.4], "r_mean": [200.0], "g_mean": [10.0], "b_mean": [10.0],
            }
        )
    )
    ir = spark.createDataFrame(
        pd.DataFrame(
            {
                "ts": ts, "filename": ["demo_IR_2022_06_01_080000.jpg"],
                "exposure": [100.0], "ir_mean": [8.0], "ir_std": [1.0],
                **{f"ir_{q}_qtl": [8.0] for q in (5, 10, 25, 50, 75, 90, 95)},
            }
        )
    )
    rows = generate_ndvi_table(rgb, ir).collect()
    assert len(rows) == 1
    assert rows[0]["NDVI_c"] < -1.0  # kept, not clamped/filtered


# ---------------------------------------------------------------------------
# CLI roundtrip: generate-ir -> generate-ndvi reads what the jobs wrote

def test_cli_ir_and_ndvi_jobs_roundtrip(spark, ir_archive, tmp_path):
    import vegindex_job

    from python_vegindex_spark.sources.vegindex_tables import (
        read_ir_roistats,
        read_ndvi_timeseries,
        read_roistats,
    )

    root = ir_archive[0]
    common = [
        "--archive", root, "--site", SITE, "--roi", "DB_0001",
        "--lat", "45.0", "--lon", "-70.0", "--tzoffset", "-5.0",
        "--codec", "fake",
    ]
    ir_path = vegindex_job.main(["generate-ir", *common])
    df, props = read_ir_roistats(spark, ir_path)
    assert df.count() == len(IR_TIMES)
    assert props["Site"] == SITE
    # percentile columns survived the integer rendering as numerics
    assert df.schema["ir_90_qtl"].dataType.typeName() in ("double", "integer")

    # an RGB tier-1 table for the same site, then the NDVI pairing job
    rgb_path = vegindex_job.main(["generate-roi", *common])
    assert read_roistats(spark, rgb_path)[0].count() == 1  # the RGB decoy
    ndvi_path = vegindex_job.main(["generate-ndvi", *common])
    ndvi, _ = read_ndvi_timeseries(spark, ndvi_path)
    # the lone RGB image pairs with the IR frame 60s later (within 10 min)
    assert ndvi.count() == 1
    row = ndvi.collect()[0]
    assert row["filename_rgb"] == "demo_2022_06_01_093000.jpg"
    assert row["filename_ir"] == "demo_IR_2022_06_01_093100.jpg"
    assert abs(row["NDVI_c"]) <= 10  # algebra produced a finite value
