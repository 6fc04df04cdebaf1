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
