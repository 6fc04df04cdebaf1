"""DTW: brute-force DP oracle, metric properties, band semantics."""

from __future__ import annotations

import numpy as np
import pytest

from python_vegindex_spark.operators.dtw import dtw_numpy, dtw_pairs


def _brute(a, b):
    n, m = len(a), len(b)
    dp = [[None] * (m + 1) for _ in range(n + 1)]
    dp[0][0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            preds = [
                dp[i - 1][j],
                dp[i][j - 1],
                dp[i - 1][j - 1],
            ]
            preds = [p for p in preds if p is not None]
            dp[i][j] = abs(a[i - 1] - b[j - 1]) + (min(preds) if preds else 0)
            if i == 1 and j == 1:
                dp[i][j] = abs(a[0] - b[0])
    return dp[n][m]


def test_dtw_hand_and_random():
    assert dtw_numpy(np.array([1, 3, 4]), np.array([2, 2, 5, 4])) == _brute(
        [1, 3, 4], [2, 2, 5, 4]
    )
    rng = np.random.default_rng(7)
    for _ in range(25):
        a = rng.integers(-50, 50, rng.integers(1, 12))
        b = rng.integers(-50, 50, rng.integers(1, 12))
        assert dtw_numpy(a, b) == _brute(list(a), list(b))


def test_dtw_properties():
    a = np.array([5, 7, 2, 9])
    assert dtw_numpy(a, a) == 0
    b = np.array([4, 7, 3])
    assert dtw_numpy(a, b) == dtw_numpy(b, a)
    # time-warp invariance: stretching a plateau costs nothing
    assert dtw_numpy(np.array([1, 5, 5, 5, 2]), np.array([1, 5, 2])) == 0


def test_dtw_band():
    a = np.array([1, 2, 3, 4, 5, 6])
    b = np.array([1, 2, 3, 4, 5, 6])
    assert dtw_numpy(a, b, band=1) == 0
    # a wide-enough band reproduces the unconstrained distance
    c = np.array([6, 5, 4, 3, 2, 1])
    assert dtw_numpy(a, c, band=6) == dtw_numpy(a, c)
    with pytest.raises(ValueError):
        dtw_numpy(np.array([1]), np.array([1, 2, 3]), band=1)
    with pytest.raises(ValueError):
        dtw_numpy(np.array([], dtype=np.int64), np.array([1]))


def test_dtw_pairs_spark(spark):
    rows = []
    series = {
        "a": [1, 3, 4, 4],
        "b": [1, 1, 3, 4],
        "c": [9, 9, 9, 9],
    }
    for sid, vals in series.items():
        for i, v in enumerate(vals):
            rows.append((sid, i, v))
    df = spark.createDataFrame(rows, "sid string, o int, v long")
    got = {
        (r["series_a"], r["series_b"]): (r["n_a"], r["n_b"], r["dtw_dist"])
        for r in dtw_pairs(df, "sid", "o", "v").collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    for (x, y), (na, nb, d) in got.items():
        assert (na, nb) == (4, 4)
        assert d == _brute(series[x], series[y])
    # max_points clamps the sorted prefix
    clamped = {
        (r["series_a"], r["series_b"]): r["dtw_dist"]
        for r in dtw_pairs(df, "sid", "o", "v", max_points=2).collect()
    }
    assert clamped[("a", "b")] == _brute(series["a"][:2], series["b"][:2])
    with pytest.raises(ValueError):
        dtw_pairs(df, "sid", "o", "v", max_points=0)
