"""CSV parity layer roundtrip + astro scalar functions."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from python_vegindex_spark.functions.astro import deg_to_dms, dms_to_deg, solar_elevation
from python_vegindex_spark.sources.csv_compat import (
    read_headered_csv,
    read_properties,
    write_headered_csv,
)


def test_csv_roundtrip(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "conv_id": ["a", "b", "c"],
            "bucket_start": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03"]),
            "n": [3, 0, 5],
            "v_mean": [1.234567, np.nan, -2.5],
        }
    )
    df = spark.createDataFrame(pdf)
    path = str(tmp_path / "gold.csv")
    props = {"Site": "conv-engine", "Aggregation Period": "1 day", "nmin": "2"}
    write_headered_csv(df, path, props, sort_cols=["conv_id"])

    text = open(path).read()
    assert text.startswith("# Site: conv-engine\n")
    assert "NA" in text  # NaN serialized as reference sentinel
    assert "1.23457" in text  # 5-decimal fixed format

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("bucket_start", T.TimestampType()),
            T.StructField("n", T.LongType()),
            T.StructField("v_mean", T.DoubleType()),
        ]
    )
    back, props2 = read_headered_csv(spark, path, schema)
    assert props2["Site"] == "conv-engine"
    b = back.orderBy("conv_id").toPandas()
    assert b["v_mean"].isna().tolist() == [False, True, False]
    assert abs(b["v_mean"][0] - 1.23457) < 1e-9
    assert b["n"].tolist() == [3, 0, 5]


def test_csv_missing_sentinels(spark, tmp_path):
    path = str(tmp_path / "legacy.csv")
    with open(path, "w") as f:
        f.write("# Site: x\n#\nc1,c2\n1.5,-9999\n-9999.0,2.25\nNA,3\n")
    schema = T.StructType(
        [T.StructField("c1", T.DoubleType()), T.StructField("c2", T.DoubleType())]
    )
    df, _ = read_headered_csv(spark, path, schema)
    pdf = df.toPandas()
    assert pdf["c1"].isna().tolist() == [False, True, True]
    assert pdf["c2"].isna().tolist() == [True, False, False]


def test_solar_elevation_sanity(spark):
    # equator, equinox: local noon (12:00 UTC at lon=0) -> sun near zenith;
    # local midnight -> far below horizon
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-03-20 12:07:00", "2024-03-20 00:07:00", "2024-06-20 12:00:00"]),
            "lat": [0.0, 0.0, 42.5],
            "lon": [0.0, 0.0, -72.2],  # Harvard Forest-ish
        }
    )
    df = spark.createDataFrame(pdf)
    out = df.select(
        solar_elevation(F.col("ts"), F.col("lat"), F.col("lon")).alias("e")
    ).toPandas()["e"]
    assert out[0] > 85.0
    assert out[1] < -80.0
    assert 20.0 < out[2] < 75.0  # midday June at 42.5N (UTC noon = ~7am local)


def test_dms_roundtrip(spark):
    # -0.5 pins the sign-prefix fix: the reference's deg2dms drops the
    # sign whenever int(angle) == 0 ('-0.5' -> '00:30:00')
    pdf = pd.DataFrame({"deg": [42.5378, -72.1715, 0.25, -0.5, -0.0169]})
    df = spark.createDataFrame(pdf)
    out = df.select(
        deg_to_dms(F.col("deg")).alias("dms"),
        dms_to_deg(deg_to_dms(F.col("deg"))).alias("back"),
        "deg",
    ).toPandas()
    np.testing.assert_allclose(out["back"], out["deg"], atol=1e-4)
    assert out.loc[out["deg"] == -0.5, "dms"].iloc[0].startswith("-0:30")


def test_read_properties_hash_in_value(tmp_path):
    """A '#' inside a property value must survive; merged header lines
    (missing newline between two properties) still split."""
    p = tmp_path / "hdr.csv"
    p.write_text(
        "# Site: station #4 east\n"
        "# Blue DN .05 Quantile Max: 90# Time of Day Min: 00:00:00\n"
        "#\n"
        "c1,c2\n1,2\n"
    )
    props = read_properties(str(p))
    assert props["Site"] == "station #4 east"
    assert props["Blue DN .05 Quantile Max"] == "90"
    assert props["Time of Day Min"] == "00:00:00"


def test_header_probe_object_store_scheme(spark, tmp_path):
    """With a session, the header probe resolves Hadoop-FS URIs (here
    ``file:``, the same code path as s3a/abfss) that plain open() cannot."""
    p = tmp_path / "hdr2.csv"
    p.write_text("# Site: schemed\n#\nc1,c2\n1.5,2.5\n")
    uri = "file://" + str(p)
    props = read_properties(uri, spark)
    assert props["Site"] == "schemed"
    schema = T.StructType(
        [T.StructField("c1", T.DoubleType()), T.StructField("c2", T.DoubleType())]
    )
    back, props2 = read_headered_csv(spark, uri, schema)
    assert props2["Site"] == "schemed"
    assert back.collect()[0]["c1"] == 1.5


def test_roilist_object_store_scheme(spark, tmp_path):
    from python_vegindex_spark.sources.vegindex_tables import read_roilist

    p = tmp_path / "site_DB_0001_roi.csv"
    p.write_text(
        "# ROI List for site\n#\n"
        "start_date,start_time,end_date,end_time,maskfile,sample_image\n"
        "2020-01-01,00:00:00,2020-06-01,00:00:00,m1.tif,s1.jpg\n"
        "2020-06-01,00:00:00,9999-12-31,00:00:00,m2.tif,s2.jpg\n"
    )
    df, _ = read_roilist(spark, "file://" + str(p))
    rows = df.orderBy("mask_index").collect()
    assert [r["maskfile"] for r in rows] == ["m1.tif", "m2.tif"]
    assert rows[1]["end_ts"].year == 9999


def test_sunelev_reference_golden(spark):
    """The reference's own golden (tests/test_utils.py:102-111):
    sunelev(42.5378, -72.1715, 2009-01-01 05:31:34 local, utc_offset=-5)
    == -18.98094 to 3 significant digits. Checked for BOTH the JVM
    column expression and the independent numpy implementation."""
    import datetime as dt

    from python_vegindex_spark.functions.astro import _solar_elev_impl

    ts_utc = dt.datetime(2009, 1, 1, 10, 31, 34)  # local 05:31:34, offset -5
    df = spark.createDataFrame([(ts_utc,)], "ts timestamp")
    got = df.select(
        solar_elevation(F.col("ts"), F.lit(42.5378), F.lit(-72.1715)).alias("e")
    ).collect()[0]["e"]
    np.testing.assert_approx_equal(got, -18.98094, 3)

    got_np = float(
        _solar_elev_impl(
            pd.Series([ts_utc]), pd.Series([42.5378]), pd.Series([-72.1715])
        ).iloc[0]
    )
    np.testing.assert_approx_equal(got_np, -18.98094, 3)
    # JVM and numpy implementations agree far tighter than the golden
    assert got == pytest.approx(got_np, abs=1e-9)


def test_solar_elevation_no_python_in_plan(spark):
    """The production solar path is whole-stage-codegen JVM arithmetic."""
    df = spark.range(5).select(
        F.timestamp_seconds(F.col("id") * 3600 + 1700000000).alias("ts")
    )
    plan = df.select(
        solar_elevation(F.col("ts"), F.lit(42.0), F.lit(-72.0)).alias("e")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_deg_to_dms_carries_rounded_seconds(spark):
    """Regression: rounding seconds to 2 decimals used to produce a
    non-canonical 60.0-seconds field ('29:59:60.0'); the round must
    carry into minutes/degrees."""
    pdf = pd.DataFrame({"deg": [29.9999999, 0.99999999, 60.504167]})
    out = (
        spark.createDataFrame(pdf)
        .select(deg_to_dms(F.col("deg")).alias("dms"), "deg")
        .toPandas()
    )
    assert out.loc[0, "dms"] == "30:0:0.0"
    assert out.loc[1, "dms"] == "1:0:0.0"
    assert out.loc[2, "dms"] == "60:30:15.0"
