"""Generate-path schema parity: rollup -> reference 32-col gcc summary
CSV -> back through our golden reader. Closes the loop

    synth turns -> turn_features -> rollup -> to_gcc_summary_schema
      -> write_headered_csv -> read_gcc_summary

so a vegindex consumer receives files in the exact field order of
gcctimeseries.py:636-669, ND flag columns included
(generate_summary_timeseries.py:381-385)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_vegindex_spark.config import RollupConfig
from python_vegindex_spark.operators.features import turn_features
from python_vegindex_spark.operators.rollup import rollup
from python_vegindex_spark.sources.csv_compat import write_headered_csv
from python_vegindex_spark.sources.summary_export import (
    GCC_SUMMARY_FIELDS,
    to_gcc_summary_schema,
)
from python_vegindex_spark.sources.synth import synth_turns
from python_vegindex_spark.sources.vegindex_tables import read_gcc_summary


@pytest.fixture(scope="module")
def one_conv_gold(spark):
    turns = synth_turns(spark, n_convs=3, seed=11, span_days=40)
    feats = turn_features(turns)
    gold = rollup(feats, RollupConfig(tier="daily", nmin=2))
    return gold.filter(F.col("conv_id") == "conv_000000")


def test_export_field_order_matches_reference(spark, one_conv_gold, tmp_path):
    out = to_gcc_summary_schema(one_conv_gold)
    assert out.columns == GCC_SUMMARY_FIELDS
    path = str(tmp_path / "export.csv")
    write_headered_csv(
        out,
        path,
        {"Site": "conv_000000", "Aggregation Period": "1", "Image Count Threshold": "2"},
        sort_cols=["date"],
    )
    field_row = next(
        ln.strip() for ln in open(path) if not ln.startswith("#") and ln.strip()
    )
    assert field_row == ",".join(GCC_SUMMARY_FIELDS)


def test_export_roundtrips_through_golden_reader(spark, one_conv_gold, tmp_path):
    out = to_gcc_summary_schema(one_conv_gold)
    path = str(tmp_path / "export2.csv")
    write_headered_csv(
        out,
        path,
        {"Site": "conv_000000", "Aggregation Period": "1", "Image Count Threshold": "2"},
        sort_cols=["date"],
    )
    back, props = read_gcc_summary(spark, path)
    exp = {r["date"]: r for r in out.collect()}
    got = {r["date"]: r for r in back.collect()}
    assert set(got) == set(exp)
    assert int(props["Image Count Threshold"]) == 2
    for d, g in got.items():
        e = exp[d]
        assert g["image_count"] == e["image_count"]
        # flag columns are always-ND like the reference generate path
        assert g["snow_flag"] is None and g["outlierflag_gcc_90"] is None
        for c in ("gcc_mean", "gcc_90", "rcc_50", "r_mean", "max_solar_elev"):
            if e[c] is None:
                assert g[c] is None, (d, c)
            else:
                assert g[c] == pytest.approx(e[c], abs=1e-5), (d, c)
        # sub-threshold rows keep midday values, full rows keep everything
        if e["midday_gcc"] is not None:
            assert g["midday_gcc"] == pytest.approx(e["midday_gcc"], abs=1e-5)


# ---------------------------------------------------------------------------
# NDVI summary family export (second measure family)

def test_ndvi_export_field_order_and_roundtrip(spark, tmp_path):
    import numpy as np
    import pandas as pd

    from python_vegindex_spark.operators.paired import paired_index, paired_summary
    from python_vegindex_spark.sources.summary_export import (
        NDVI_SUMMARY_FIELDS,
        to_ndvi_summary_schema,
    )
    from python_vegindex_spark.sources.vegindex_tables import read_ndvi_summary

    rng = np.random.default_rng(5)
    t0 = pd.Timestamp("2024-06-01")
    p = pd.DataFrame(
        dict(
            k=["s"] * 200,
            ts=[t0 + pd.Timedelta(hours=float(h)) for h in np.sort(rng.uniform(0, 24 * 12, 200))],
            r=rng.uniform(10, 200, 200), g=rng.uniform(10, 200, 200),
            b=rng.uniform(10, 200, 200), exposure=np.full(200, 30.0),
        )
    )
    s = pd.DataFrame(
        dict(
            k=["s"] * 200,
            ts=[t0 + pd.Timedelta(hours=float(h)) for h in np.sort(rng.uniform(0, 24 * 12, 200))],
            ir=rng.uniform(10, 200, 200), exposure=np.full(200, 15.0),
        )
    )
    idx = paired_index(
        spark.createDataFrame(p), spark.createDataFrame(s), on=["k"], tolerance_s=3600
    )
    summ = paired_summary(idx, tier="3day", series_cols=["k"], nmin=2)
    out = to_ndvi_summary_schema(summ, tier="3day")
    assert out.columns == NDVI_SUMMARY_FIELDS

    path = str(tmp_path / "ndvi_export.csv")
    write_headered_csv(
        out.drop("year").withColumn("year", F.year("date")).select(*NDVI_SUMMARY_FIELDS),
        path,
        {"Site": "s", "Aggregation Period": "3", "Image Count Threshold": "2"},
        sort_cols=["date"],
    )
    back, props = read_ndvi_summary(spark, path)
    assert int(props["Aggregation Period"]) == 3
    exp = {r["date"]: r for r in out.collect()}
    got = {r["date"]: r for r in back.collect()}
    assert set(got) == set(exp)
    for d, g in got.items():
        e = exp[d]
        assert g["image_count"] == e["image_count"]
        assert g["snow_flag"] is None
        for c in ("ndvi_mean", "ndvi_90"):
            if e[c] is None:
                assert g[c] is None, (d, c)
            else:
                assert g[c] == pytest.approx(e[c], abs=1e-5), (d, c)
