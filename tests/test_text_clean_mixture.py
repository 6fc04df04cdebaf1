"""Tests for operators/text_clean (boilerplate lines, PII scrub) and
operators/mixture (source-mixture resampling)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_vegindex_spark.operators.mixture import (
    mixture_fractions,
    mixture_resample,
)
from python_vegindex_spark.operators.sampling import hex_threshold, sample_key
from python_vegindex_spark.operators.text_clean import (
    boilerplate_lines,
    doc_lines,
    scrub_pii,
    strip_boilerplate_lines,
)

FOOTER = "all rights reserved"
NAV = "Home | About | Contact"


def _docs(spark):
    rows = [
        (1, f"alpha body one\n{NAV}\n{FOOTER}"),
        (2, f"{NAV}\nbeta body two\n\nbeta tail\n{FOOTER}"),
        (3, f"gamma body three\n{FOOTER}"),
        # doc 4 is nothing but boilerplate
        (4, f"{NAV}\n{FOOTER}"),
        # doc 5 repeats the footer twice and varies its whitespace/case
        (5, f"delta body five\nALL  Rights   Reserved\n{FOOTER}"),
        (6, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_detection_counts_distinct_docs(spark):
    lines = doc_lines(_docs(spark))
    boiler = {
        r["n_docs"]
        for r in boilerplate_lines(lines, min_docs=3).collect()
    }
    # footer: docs 1,2,3,4,5 (normalized, doc 5's double occurrence counts
    # once); nav: docs 1,2,4
    assert boiler == {5, 3}
    # min_docs=4 keeps only the footer
    assert boilerplate_lines(lines, min_docs=4).count() == 1


def test_strip_preserves_order_blanks_and_non_boiler_text(spark):
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate_lines(_docs(spark), min_docs=3).collect()
    }
    assert out[1]["text"] == "alpha body one"
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 1)
    # blank line survives, order preserved
    assert out[2]["text"] == "beta body two\n\nbeta tail"
    assert (out[2]["n_lines"], out[2]["n_kept"]) == (5, 3)
    # all-boilerplate doc -> empty text, zero kept
    assert out[4]["text"] == ""
    assert (out[4]["n_lines"], out[4]["n_kept"]) == (2, 0)
    # normalization unifies case/whitespace, both occurrences removed
    assert out[5]["text"] == "delta body five"
    # NULL text -> empty output, zero lines
    assert (out[6]["n_lines"], out[6]["n_kept"], out[6]["text"]) == (0, 0, "")


def test_strip_rejects_min_docs_below_two(spark):
    with pytest.raises(ValueError):
        strip_boilerplate_lines(_docs(spark), min_docs=1).collect()


def test_scrub_pii_counts_and_redacts(spark):
    rows = [
        (1, "mail a.b+c@ex-ample.org or x@y.io, server 10.0.255.7, tel +123456789"),
        (2, "no pii here 1.2 v3.4.5"),
        (3, None),
        (4, "ip-in-mail u@10.22.33.44pad.com plain 8.8.8.8"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (2, 1, 1)
    assert out[1]["text"] == "mail <email> or <email>, server <ipv4>, tel <phone>"
    # a version string / decimal never matches the 4-octet pattern
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 0, 0)
    assert out[2]["text"] == "no pii here 1.2 v3.4.5"
    # NULL stays NULL (SQL semantics)
    assert out[3]["text"] is None and out[3]["n_email"] is None
    # email scrub runs first: the dotted host inside the address is
    # consumed whole; the standalone IP still redacts. The embedded
    # "10.22.33.44pad" has no trailing word boundary, so the ipv4
    # pattern only sees the standalone address in the count too.
    assert out[4]["text"] == "ip-in-mail <email> plain <ipv4>"
    assert (out[4]["n_email"], out[4]["n_ipv4"]) == (1, 1)


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scrub_pii_plan_is_shuffle_free_jvm_only(spark):
    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("mail a@b.co from 1.2.3.4 n "), F.col("id").cast("string")).alias(
            "text"
        ),
    )
    plan = _executed_plan(scrub_pii(df))
    assert "Exchange" not in plan, "PII scrub must ride the scan"
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, f"Python eval in scrub_pii: {marker}"


def test_mixture_resample_output_plan_is_scan_level_filter(spark):
    df = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
    )
    out = mixture_resample(df, {"s0": 0.5, "s1": 0.5})
    plan = _executed_plan(out)
    # the per-source counts are a separate (tiny) collected job; the
    # RETURNED frame is a pure scan-level filter
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan


def test_mixture_fractions_math():
    counts = {"a": 100, "b": 50, "c": 10, "d": 7}
    weights = {"a": 0.5, "b": 0.3, "c": 0.2}
    f = mixture_fractions(counts, weights)
    # binding source: c (10/0.2 = 50 is the min feasible total)
    t = 50.0
    assert f["c"] == pytest.approx(1.0)
    assert f["a"] == 0.5 * t / 100
    assert f["b"] == 0.3 * t / 50
    assert f["d"] == 0.0
    # no positive weights -> everything zero
    assert set(mixture_fractions(counts, {}).values()) == {0.0}
    # weighted-but-empty source never binds
    f2 = mixture_fractions({"a": 100, "e": 0}, {"a": 1.0, "e": 5.0})
    assert f2["a"] == 1.0 and f2["e"] == 0.0


def test_mixture_resample_deterministic_and_proportioned(spark):
    rows = [(i, f"s{i % 4}") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    weights = {"s0": 0.6, "s1": 0.2, "s2": 0.2}
    got = mixture_resample(df, weights)
    a = sorted(r["doc_id"] for r in got.collect())
    b = sorted(r["doc_id"] for r in mixture_resample(df, weights).collect())
    assert a == b  # reproducible
    by_src = {
        r["source"]: r["n"]
        for r in got.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert "s3" not in by_src  # unweighted source dropped
    # binding source (s0: 1000 / 0.6 is the min total) kept whole
    assert by_src["s0"] == 1000
    # others thinned toward w * t (t = 1666.67): 333 each, hash-quantized
    for s in ("s1", "s2"):
        assert abs(by_src[s] - 333) < 60
    # survivors are exactly the rows under their stratum threshold —
    # re-derive the filter independently
    fr = mixture_fractions({"s0": 1000, "s1": 1000, "s2": 1000, "s3": 1000}, weights)
    expected = (
        df.withColumn("_k", sample_key(["doc_id"], "mix"))
        .withColumn(
            "_th",
            F.when(F.col("source") == "s0", hex_threshold(fr["s0"]))
            .when(F.col("source") == "s1", hex_threshold(fr["s1"]))
            .when(F.col("source") == "s2", hex_threshold(fr["s2"]))
            .otherwise(hex_threshold(0.0)),
        )
        .filter(F.col("_k") < F.col("_th"))
    )
    assert sorted(r["doc_id"] for r in expected.collect()) == a
