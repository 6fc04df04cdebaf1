"""HyperLogLog sketch tests: exact register parity vs a pure-Python
mirror, merge-is-lossless, estimate accuracy, correction tolerance."""

from __future__ import annotations

import hashlib
import math

import pytest

from python_vegindex_spark.operators.sketches import (
    HASH_BITS,
    alpha_m,
    hll_estimate,
    hll_merge,
    hll_registers,
    rho_sql,
)
from pyspark.sql import functions as F


def _py_registers(keys, b):
    """Reference HLL registers computed with hashlib — the ground truth
    the Spark expressions must reproduce bit-for-bit."""
    wbits = HASH_BITS - b
    regs: dict[int, int] = {}
    for k in keys:
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
        bucket = h >> wbits
        w = h & ((1 << wbits) - 1)
        rho = wbits + 1 if w == 0 else wbits - w.bit_length() + 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def test_registers_match_python_mirror(spark):
    keys = [f"user-{i}" for i in range(500)] + ["42", "", "Ünïcode ✓"]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r["bucket"]: r["reg"]
        for r in hll_registers(df, "k", [], b=5).collect()
    }
    assert got == _py_registers(keys, 5)


def test_registers_b8_and_int_keys(spark):
    keys = list(range(2000))
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["bucket"]: r["reg"]
        for r in hll_registers(df, "k", [], b=8).collect()
    }
    # int keys hash via their decimal string, same as str(k) in Python
    assert got == _py_registers(keys, 8)


def test_merge_is_lossless(spark):
    """Registers merged from two disjoint halves == registers of the
    union: the mergeability property that makes the sketch cascade."""
    rows = [(i % 2, f"k{i}") for i in range(1000)]
    df = spark.createDataFrame(rows, "half int, k string")
    split = hll_registers(df, "k", ["half"], b=6)
    merged = hll_merge(split, {"all": F.lit(1)})
    direct = hll_registers(df.withColumn("all", F.lit(1)), "k", ["all"], b=6)
    m = {r["bucket"]: r["reg"] for r in merged.collect()}
    d = {r["bucket"]: r["reg"] for r in direct.collect()}
    assert m == d


def test_estimate_accuracy_and_s_scaled(spark):
    n = 5000
    df = spark.createDataFrame([(f"u{i}",) for i in range(n)], "k string")
    regs = hll_registers(df, "k", [], b=8)
    row = hll_estimate(regs, [], b=8).collect()[0]
    # integer denominator recomputed from the python-mirror registers
    pyregs = _py_registers([f"u{i}" for i in range(n)], 8)
    K = HASH_BITS - 8 + 1
    s = sum(1 << (K - r) for r in pyregs.values()) + (256 - len(pyregs)) * (
        1 << K
    )
    assert row["s_scaled"] == s
    assert row["n_zero"] == 256 - len(pyregs)
    # standard error of HLL is 1.04/sqrt(m); allow 4 sigma
    rel = abs(row["est_raw"] - n) / n
    assert rel < 4 * 1.04 / math.sqrt(256), rel


def test_small_range_correction_tolerance(spark):
    """Correction branch: m*ln(m/V) vs the same formula in Python —
    libm ulp may differ across runtimes, so compare with rel tol."""
    keys = [f"x{i}" for i in range(20)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    regs = hll_registers(df, "k", [], b=8)
    row = hll_estimate(regs, [], b=8, with_correction=True).collect()[0]
    assert row["n_zero"] > 0 and row["est_raw"] <= 2.5 * 256
    expected = 256.0 * math.log(256.0 / row["n_zero"])
    assert row["est"] == pytest.approx(expected, rel=1e-12)
    # corrected estimate is far closer than raw in this regime
    assert abs(row["est"] - 20) <= abs(row["est_raw"] - 20)


def test_rho_sql_matches_python_chain():
    """The generated SQL CASE chain evaluates identically to the
    Python bit-length formula (checked in DuckDB over edge values)."""
    import duckdb

    wbits = 55
    vals = [0, 1, 2, 3, (1 << 52) - 1, 1 << 52, (1 << 53) + 1, (1 << 55) - 1]
    con = duckdb.connect()
    got = [
        con.sql(f"SELECT {rho_sql(str(v), wbits)}").fetchone()[0] for v in vals
    ]
    exp = [wbits + 1 if v == 0 else wbits - v.bit_length() + 1 for v in vals]
    assert got == exp


def test_validation():
    with pytest.raises(ValueError):
        hll_registers(None, "k", [], b=1)
    with pytest.raises(ValueError):
        hll_estimate(None, [], b=17)


def test_alpha_constants():
    assert alpha_m(16) == 0.673 and alpha_m(32) == 0.697
    assert abs(alpha_m(1024) - 0.7213 / (1 + 1.079 / 1024)) < 1e-15


# ----------------------------- Count-Min ------------------------------


def _py_cms(keys, depth, width):
    from collections import Counter

    counters = Counter()
    for k in keys:
        for i in range(depth):
            h = int(
                hashlib.md5(f"{i}:{k}".encode()).hexdigest()[:15], 16
            ) % width
            counters[(i, h)] += 1
    return counters


def test_cms_build_matches_python_mirror(spark):
    from python_vegindex_spark.operators.sketches import cms_build

    keys = [f"t{i % 37}" for i in range(700)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        (r["row_idx"], r["col_idx"]): r["counter"]
        for r in cms_build(df, "k", [], depth=3, width=64).collect()
    }
    assert got == dict(_py_cms(keys, 3, 64))


def test_cms_estimate_one_sided_and_exact_when_wide(spark):
    from python_vegindex_spark.operators.sketches import cms_build, cms_estimate

    keys = [f"key{i % 11}" for i in range(550)]  # each true count = 50
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    sk = cms_build(df, "k", [], depth=4, width=1024)
    cand = spark.createDataFrame([(f"key{i}",) for i in range(11)] + [("absent",)], "k string")
    est = {r["k"]: r["cms_est"] for r in cms_estimate(sk, cand, "k", depth=4, width=1024).collect()}
    for i in range(11):
        assert est[f"key{i}"] >= 50  # one-sided guarantee
        # 11 keys in 4x1024 counters: collisions effectively impossible
        assert est[f"key{i}"] == 50
    assert est["absent"] == 0


def test_cms_merge_by_sum(spark):
    from python_vegindex_spark.operators.sketches import cms_build

    rows = [(i % 2, f"k{i % 13}") for i in range(400)]
    df = spark.createDataFrame(rows, "half int, k string")
    halves = cms_build(df, "k", ["half"], depth=2, width=32)
    merged = {
        (r["row_idx"], r["col_idx"]): r["s"]
        for r in halves.groupBy("row_idx", "col_idx")
        .agg(F.sum("counter").alias("s"))
        .collect()
    }
    whole = {
        (r["row_idx"], r["col_idx"]): r["counter"]
        for r in cms_build(df, "k", [], depth=2, width=32).collect()
    }
    assert merged == whole


# ----------------------------- bottom-k -------------------------------


def test_bottomk_matches_python_and_merges(spark):
    from python_vegindex_spark.operators.sketches import (
        bottomk_distinct_estimate,
        bottomk_sample,
    )

    keys = [f"u{i}" for i in range(300)]
    df = spark.createDataFrame([(k,) for k in keys * 2], "k string")  # dups
    got = bottomk_sample(df, "k", k=10).orderBy("rank").collect()
    hs = sorted(
        (int(hashlib.md5(k.encode()).hexdigest()[:15], 16), k) for k in keys
    )[:10]
    assert [(r["h60"], r["key"]) for r in got] == hs
    assert [r["rank"] for r in got] == list(range(1, 11))
    # merge property: bottom-k of the union of two parts' bottom-k
    a = bottomk_sample(df.limit(300), "k", k=10)
    b = bottomk_sample(df.subtract(df.limit(0)), "k", k=10)  # full set
    uni = bottomk_sample(a.select("key").union(b.select("key")), "key", k=10)
    assert [(r["h60"], r["key"]) for r in uni.orderBy("rank").collect()] == hs
    # estimator: one pinned division, sane accuracy for k=64 over 300 keys
    est = bottomk_distinct_estimate(
        bottomk_sample(df, "k", k=64), k=64
    ).collect()[0]
    assert est["n_sampled"] == 64
    exp = 63 * (2**60) / hs_k if (hs_k := sorted(
        int(hashlib.md5(k.encode()).hexdigest()[:15], 16) for k in keys
    )[63]) else None
    assert est["est_distinct"] == exp
    assert abs(est["est_distinct"] - 300) / 300 < 0.5


def test_bottomk_underfull_group_reports_exact(spark):
    from python_vegindex_spark.operators.sketches import (
        bottomk_distinct_estimate,
        bottomk_sample,
    )

    df = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
    s = bottomk_sample(df, "k", k=10)
    est = bottomk_distinct_estimate(s, k=10).collect()[0]
    assert est["n_sampled"] == 3 and est["est_distinct"] == 3.0


# ------------------------- plan discipline ----------------------------


def test_sketch_plans_jvm_only_single_shuffle(spark):
    """HLL/CMS/bottom-k stay JVM-side: no Python eval anywhere; the
    register/counter build is ONE shuffle (the group hash aggregate);
    ungrouped bottom-k plans as TakeOrderedAndProject, not a global
    sort."""
    from python_vegindex_spark.operators.sketches import (
        bottomk_sample,
        cms_build,
        hll_registers,
    )
    from python_vegindex_spark.plans.lint import (
        assert_jvm_only,
        assert_no_global_sort,
        plan_report,
    )

    df = spark.createDataFrame(
        [(i % 3, f"k{i}") for i in range(200)], "g int, k string"
    )
    regs = hll_registers(df, "k", ["g"], b=5)
    regs.collect()
    assert_jvm_only(regs)
    rep = plan_report(regs)
    # one shuffle: count exchanges in the FINAL plan section only (an
    # executed AdaptiveSparkPlan string appends the Initial Plan twin)
    final = rep["plan"].split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1, final
    assert not rep["has_window"]

    cms = cms_build(df, "k", ["g"], depth=3, width=64)
    cms.collect()
    assert_jvm_only(cms)
    cms_final = plan_report(cms)["plan"].split("== Initial Plan ==")[0]
    assert cms_final.count("Exchange hashpartitioning") == 1

    bk = bottomk_sample(df, "k", k=5)
    bk.collect()
    assert_jvm_only(bk)
    assert_no_global_sort(bk)
    assert plan_report(bk)["has_take_ordered"]


def test_hll_estimate_empty_global_is_zero_cardinality(spark):
    """Round-4 (ADVICE): global estimate (group_cols=[]) over an empty
    register table must degrade to the all-absent-registers answer
    (s_scaled = m * 2^K, est_raw near 0-ish small), not NULL."""
    from python_vegindex_spark.operators.sketches import HASH_BITS

    empty = spark.createDataFrame([], "bucket int, reg int")
    row = hll_estimate(empty, [], b=5, with_correction=True).collect()[0]
    m, K = 32, HASH_BITS - 5 + 1
    assert row["n_zero"] == m
    assert row["s_scaled"] == m * (1 << K)
    # raw estimate degenerates to alpha_m * m for all-absent registers
    assert row["est_raw"] is not None and abs(row["est_raw"] - 22.304) < 0.01
    # linear counting with n_zero = m: m * ln(m/m) = 0
    assert row["est"] == 0.0
