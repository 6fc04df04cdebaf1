"""Golden-fixture parity against the reference's OWN sample-data CSVs.

Every assertion here reproduces an assertion the reference test suite
makes about real reference output bytes, through OUR Spark readers:

* dukehw_DB_1000_ndvi_3day.csv — tests/test_ndvisummarytimeseries.py:25-99
* alligatorriver_DB_1000_IR_roistats.csv — tests/test_ir_roitimeseries.py:89-125
* harvard_DB_0001_roi.csv — tests/test_roilist.py:60-73
* site_info.csv — tests/test_utils.py:77-86
* harvard 1day/3day gcc summaries — structural + derived-value parity
  (daterange2 anchoring, Petach gcc algebra) plus a data-section
  byte-parity roundtrip through write_headered_csv.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from python_vegindex_spark.operators.interval_join import (
    interval_join,
    validate_intervals,
)
from python_vegindex_spark.functions.buckets import bucket_center, bucket_start
from python_vegindex_spark.sources.csv_compat import write_headered_csv
from python_vegindex_spark.sources.vegindex_tables import (
    read_gcc_summary,
    read_ir_roistats,
    read_ndvi_summary,
    read_roilist,
    read_site_info,
)

REF = "/root/reference/tests/sample_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference sample data not available"
)


def _p(*parts: str) -> str:
    return os.path.join(REF, *parts)


# ---------------------------------------------------------------------------
# NDVI 3-day summary (the reference's strongest numeric assertions)

def test_ndvi_summary_golden_values(spark):
    df, props = read_ndvi_summary(spark, _p("dukehw", "ROI", "dukehw_DB_1000_ndvi_3day.csv"))
    # header metadata parity (test_ndvisummarytimeseries.py:46-50)
    assert props["Site"] == "dukehw"
    assert int(props["Aggregation Period"]) == 3
    assert props["Veg Type"] == "DB"
    assert props["ROI ID Number"] == "1000"

    rows = df.orderBy("date").collect()
    assert len(rows) == 870
    first, last = rows[0], rows[-1]
    # spot values (test_ndvisummarytimeseries.py:53-62)
    assert last["midday_rgb_filename"] == "dukehw_2020_07_15_115405.jpg"
    assert last["midday_ir_filename"] == "dukehw_IR_2020_07_15_115405.jpg"
    assert first["ndvi_mean"] == pytest.approx(0.22027, abs=1e-9)
    assert first["ndvi_std"] == pytest.approx(0.16966, abs=1e-9)
    assert first["max_solar_elev"] == pytest.approx(75.9963, abs=1e-9)


def test_ndvi_summary_zero_count_nullout(spark):
    df, _ = read_ndvi_summary(spark, _p("dukehw", "ROI", "dukehw_DB_1000_ndvi_3day.csv"))
    zero = df.filter(F.col("image_count") == 0)
    assert zero.count() > 0
    bad = zero.filter(
        F.col("midday_rgb_filename").isNotNull()
        | F.col("midday_ir_filename").isNotNull()
        | F.col("ndvi_mean").isNotNull()
        | F.col("ndvi_90").isNotNull()
        | F.col("max_solar_elev").isNotNull()
    )
    assert bad.count() == 0


def test_ndvi_summary_dates_match_daterange2_anchoring(spark):
    """All 870 real reference bucket labels must equal OUR doy-anchored
    3-day bucket center (A1+A7 vs actual reference output)."""
    df, _ = read_ndvi_summary(spark, _p("dukehw", "ROI", "dukehw_DB_1000_ndvi_3day.csv"))
    chk = df.select(
        "date",
        "doy",
        "year",
        bucket_center(bucket_start(F.to_timestamp("date"), "3day"), "3day").alias("center"),
    )
    mismatch = chk.filter(
        (F.col("center") != F.col("date"))
        | (F.col("doy") != F.dayofyear("date"))
        | (F.col("year") != F.year("date"))
    )
    assert mismatch.count() == 0


# ---------------------------------------------------------------------------
# IR roistats tier-1 (test_ir_roitimeseries.py:89-112)

def test_ir_roistats_golden(spark):
    df, props = read_ir_roistats(
        spark, _p("alligatorriver", "ROI", "alligatorriver_DB_1000_IR_roistats.csv")
    )
    assert props["Site"] == "alligatorriver"
    last = df.orderBy(F.desc("ts")).limit(1).collect()[0]
    assert last["filename"] == "alligatorriver_IR_2015_12_31_193031.jpg"
    assert last["exposure"] == 2400
    # awbflag column present-but-all-NA in this file -> typed NULLs
    assert df.filter(F.col("awbflag").isNotNull()).count() == 0
    # ts assembled from (date, local_std_time)
    assert df.filter(F.col("ts").isNull()).count() == 0


# ---------------------------------------------------------------------------
# gcc 1-day / 3-day summaries (harvard)

def test_gcc_summary_1day_structure_and_algebra(spark):
    df, props = read_gcc_summary(spark, _p("harvard", "ROI", "harvard_DB_0001_1day.csv"))
    assert props["Site"] == "harvard"
    assert int(props["Aggregation Period"]) == 1
    assert int(props["Image Count Threshold"]) == 1
    rows = df.count()
    assert rows == 365
    # 1-day labels: date == our daily bucket; doy/year recomputed
    chk = df.select(
        "date", "doy", "year",
        bucket_start(F.to_timestamp("date"), "daily").alias("b"),
    )
    assert chk.filter(
        (F.col("b") != F.col("date"))
        | (F.col("doy") != F.dayofyear("date"))
        | (F.col("year") != F.year("date"))
    ).count() == 0
    # Petach algebra on real bytes: midday_gcc == g/(r+g+b) at 5 decimals
    alg = df.filter(F.col("image_count") > 0).select(
        "midday_gcc",
        F.round(
            F.col("midday_g")
            / (F.col("midday_r") + F.col("midday_g") + F.col("midday_b")),
            5,
        ).alias("gcc_calc"),
    )
    bad = alg.filter(F.abs(F.col("midday_gcc") - F.col("gcc_calc")) > 1e-5)
    assert bad.count() == 0


def test_gcc_summary_3day_anchoring(spark):
    df, props = read_gcc_summary(spark, _p("harvard", "ROI", "harvard_DB_0001_3day.csv"))
    assert int(props["Aggregation Period"]) == 3
    assert df.count() == 122
    chk = df.select(
        "date",
        bucket_center(bucket_start(F.to_timestamp("date"), "3day"), "3day").alias("center"),
    )
    assert chk.filter(F.col("center") != F.col("date")).count() == 0


def test_gcc_summary_nmin_nullout_synthetic(spark, tmp_path):
    """The `0 < image_count < nmin` branch (gcctimeseries.py:330-360):
    midday_* kept, stats nulled. The harvard file has nmin=1 so the
    branch never fires there; exercise it with nmin=3 via the override."""
    df, _ = read_gcc_summary(
        spark, _p("harvard", "ROI", "harvard_DB_0001_1day.csv"), nmin=3
    )
    some = df.filter((F.col("image_count") > 0) & (F.col("image_count") < 3))
    assert some.count() > 0
    # stats nulled...
    assert some.filter(F.col("gcc_mean").isNotNull()).count() == 0
    assert some.filter(F.col("max_solar_elev").isNotNull()).count() == 0
    # ...midday values kept
    assert some.filter(F.col("midday_gcc").isNull()).count() == 0
    assert some.filter(F.col("midday_filename").isNull()).count() == 0


def test_gcc_summary_roundtrip_byte_parity(spark, tmp_path):
    """Read the harvard 1-day golden and re-emit it through
    write_headered_csv: every DATA byte must match the reference file
    (header comments carry creation timestamps and are excluded)."""
    src = _p("harvard", "ROI", "harvard_DB_0001_1day.csv")
    df, props = read_gcc_summary(spark, src)
    out = str(tmp_path / "roundtrip.csv")
    write_headered_csv(df, out, props, sort_cols=["date"], default_decimals=5)

    def data_lines(path: str) -> list[str]:
        lines = [ln.rstrip("\n") for ln in open(path) if not ln.startswith("#")]
        return [ln for ln in lines if ln.strip()]

    ref_lines = data_lines(src)
    got_lines = data_lines(out)
    assert got_lines[0] == ref_lines[0]  # field row
    assert len(got_lines) == len(ref_lines)
    for i, (a, b) in enumerate(zip(ref_lines, got_lines)):
        assert a == b, f"line {i} differs:\nref: {a}\ngot: {b}"


# ---------------------------------------------------------------------------
# ROI list -> interval dimension (test_roilist.py:60-73)

def test_roilist_golden(spark):
    dim, props = read_roilist(spark, _p("harvard", "ROI", "harvard_DB_0001_roi.csv"))
    assert props["Site"] == "harvard"
    assert props["Veg Type"] == "DB"
    assert int(props["ROI ID Number"]) == 1
    masks = dim.collect()
    assert len(masks) == 1
    assert masks[0]["maskfile"] == "harvard_DB_0001_01.tif"
    assert masks[0]["mask_index"] == 1
    # validated, joinable interval dim
    validate_intervals(dim, key_cols=["maskfile"])


def test_roilist_feeds_interval_join(spark):
    """End-to-end S4->J2: real roi.csv file -> interval dim -> facts
    pick up mask_index by validity window."""
    dim, _ = read_roilist(spark, _p("harvard", "ROI", "harvard_DB_0001_roi.csv"))
    facts = spark.createDataFrame(
        [("2009-06-30 12:01:38",), ("1998-01-01 00:00:00",)], "ts_str string"
    ).select(F.to_timestamp("ts_str").alias("ts"))
    joined = interval_join(facts, dim.select("mask_index", "start_ts", "end_ts"))
    got = {r["ts"].year: r["mask_index"] for r in joined.collect()}
    assert got == {2009: 1}  # 1998 predates the mask window -> dropped


def test_roilist_rejects_overlap(spark, tmp_path):
    bad = tmp_path / "bad_roi.csv"
    bad.write_text(
        "#\n# Site: x\n#\n"
        "start_date,start_time,end_date,end_time,maskfile,sample_image\n"
        "2020-01-01,00:00:00,2020-06-01,00:00:00,a.tif,a.jpg\n"
        "2020-05-01,00:00:00,2020-12-01,00:00:00,b.tif,b.jpg\n"
    )
    with pytest.raises(ValueError, match="overlapping"):
        read_roilist(spark, str(bad))


def test_roilist_rejects_end_before_start(spark, tmp_path):
    bad = tmp_path / "bad_roi2.csv"
    bad.write_text(
        "#\n# Site: x\n#\n"
        "start_date,start_time,end_date,end_time,maskfile,sample_image\n"
        "2020-06-01,00:00:00,2020-01-01,00:00:00,a.tif,a.jpg\n"
    )
    with pytest.raises(ValueError, match="end date"):
        read_roilist(spark, str(bad))


# ---------------------------------------------------------------------------
# site_info dimension (test_utils.py:77-86)

def test_site_info_golden(spark):
    dim = read_site_info(spark, _p("site_info.csv"), sitename="test")
    rows = dim.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["lat"] == pytest.approx(40.0)
    assert r["lon"] == pytest.approx(-60.0)
    assert r["elev"] == pytest.approx(300.0)
    assert r["tzoffset"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# archive scan + filename timestamps (test_utils.py:23-63)

def test_filename_to_ts_golden(spark):
    from python_vegindex_spark.sources.vegindex_tables import filename_to_ts

    df = spark.createDataFrame(
        [("harvard_2009_06_30_120138.jpg",)], "fn string"
    ).select(
        filename_to_ts(F.col("fn"), "harvard").alias("rgb_ts"),
    )
    ir = spark.createDataFrame(
        [("harvard_IR_2009_06_30_120138.jpg",)], "fn string"
    ).select(filename_to_ts(F.col("fn"), "harvard", ir=True).alias("ir_ts"))
    import datetime as dt

    assert df.collect()[0]["rgb_ts"] == dt.datetime(2009, 6, 30, 12, 1, 38)
    assert ir.collect()[0]["ir_ts"] == dt.datetime(2009, 6, 30, 12, 1, 38)


def test_scan_archive_golden(spark):
    """Reproduces test_utils.py:47-63 getsiteimglist on the reference
    sample archive."""
    import datetime as dt

    from python_vegindex_spark.sources.vegindex_tables import scan_archive

    got = scan_archive(
        spark, REF, "harvard",
        start_dt=dt.datetime(2009, 6, 30), end_dt=dt.datetime(2009, 7, 1),
    ).collect()
    assert len(got) == 1
    assert got[0]["filename"] == "harvard_2009_06_30_120138.jpg"
    assert got[0]["ts"] == dt.datetime(2009, 6, 30, 12, 1, 38)
    # missing site -> empty
    assert scan_archive(spark, REF, "acadia").count() == 0
    # IR variant picks up only IR-prefixed files
    ir = scan_archive(spark, REF, "alligatorriver", ir=True).collect()
    assert len(ir) == 1
    assert ir[0]["filename"].startswith("alligatorriver_IR_")


# ---------------------------------------------------------------------------
# canonical-path helper family (vegindex.py:67-215 get_* API)

def test_catalog_helpers_golden(spark):
    from python_vegindex_spark.sources.catalog import (
        get_gcc_timeseries,
        get_ndvi_summary,
        get_roi_ir_timeseries,
        get_roi_list,
    )

    dim, props = get_roi_list(spark, REF, "harvard", "DB_0001")
    assert dim.count() == 1 and props["Site"] == "harvard"

    ir, _ = get_roi_ir_timeseries(spark, REF, "alligatorriver", "DB_1000")
    last = ir.orderBy(F.desc("ts")).limit(1).collect()[0]
    assert last["exposure"] == 2400  # test_ir_roitimeseries.py:112-125

    gcc, props = get_gcc_timeseries(spark, REF, "harvard", "DB_0001", nday=1)
    assert gcc.count() == 365 and int(props["Aggregation Period"]) == 1

    ndvi, _ = get_ndvi_summary(spark, REF, "dukehw", "DB_1000", nday=3)
    assert ndvi.count() == 870  # test_ndvisummarytimeseries.py:63


def test_merged_header_line_recovers_all_keys(spark):
    """The shipped harvard 1-day golden has a merged header line
    ('# Blue DN .05 Quantile Max: 90# Time of Day Min: 00:00:00');
    every key must still be recovered."""
    from python_vegindex_spark.sources.csv_compat import read_properties

    props = read_properties(_p("harvard", "ROI", "harvard_DB_0001_1day.csv"))
    assert props["Time of Day Min"] == "00:00:00"
    assert props["Time of Day Max"] == "23:59:59"
    assert props["Blue DN .05 Quantile Max"] == "90"
    assert props["ROI Brightness Min"] == "100"


def test_ndvi_timeseries_reader_float_formatted_ints(spark, tmp_path):
    """NDVI tier-1 reader on the generate_ndvi_timeseries.py:207-248
    column set, with exposures written float-formatted ("34.0") as real
    reference files do — parsed via the reference's int(float(...))
    coercion (ndvitimeseries.py:730-732)."""
    from python_vegindex_spark.sources.vegindex_tables import read_ndvi_timeseries

    p = tmp_path / "mysite_DB_0001_NDVI_roistats.csv"
    p.write_text(
        "#\n# Site: mysite\n# Veg Type: DB\n# ROI ID Number: 0001\n#\n"
        "date,local_std_time,doy,filename_rgb,filename_ir,solar_elev,"
        "exposure_rgb,exposure_ir,mask_index,r_mean,g_mean,b_mean,ir_mean,"
        "gcc,Y,Z_prime,R_prime,Y_prime,X_prime,NDVI_c\n"
        "2020-05-01,12:01:38,122,a.jpg,a_IR.jpg,55.12345,34.0,8.0,1,"
        "50.1,60.2,40.3,90.4,0.39974,55.0,30.1,9.1,10.0,20.1,0.37000\n"
        "2020-05-01,12:31:38,122,b.jpg,b_IR.jpg,54.00000,NA,8,1,"
        "50.1,60.2,40.3,90.4,0.39974,55.0,30.1,9.1,10.0,20.1,-9999\n"
    )
    df, props = read_ndvi_timeseries(spark, str(p))
    assert props["Site"] == "mysite"
    rows = {r["filename_rgb"]: r for r in df.collect()}
    assert rows["a.jpg"]["exposure_rgb"] == 34     # "34.0" -> 34
    assert rows["a.jpg"]["exposure_ir"] == 8
    assert rows["b.jpg"]["exposure_rgb"] is None   # NA -> NULL
    assert rows["b.jpg"]["NDVI_c"] is None         # -9999 -> NULL
    assert rows["a.jpg"]["ts"].hour == 12 and rows["a.jpg"]["ts"].second == 38
