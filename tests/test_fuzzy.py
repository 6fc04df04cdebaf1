"""Edit-1 deletion-join: brute-force parity, recall proof cases."""

from __future__ import annotations

import itertools

import pytest

from python_vegindex_spark.operators.fuzzy import deletion_keys, edit1_pairs
from pyspark.sql import functions as F


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]


VOCAB = [
    ("spark", 100), ("spork", 3),
    ("stream", 80), ("streem", 2), ("steam", 40),
    ("vector", 60), ("vecto", 1), ("vectors", 9),
    ("table", 50), ("cable", 7), ("tale", 5),
    ("unrelated", 20),
]


def test_edit1_pairs_bruteforce(spark):
    df = spark.createDataFrame(VOCAB, "term string, freq long")
    got = {
        (r["term_hi"], r["term_lo"])
        for r in edit1_pairs(df, min_len=4).collect()
    }
    terms = {t: f for t, f in VOCAB if len(t) >= 4}
    exp = set()
    for a, b in itertools.combinations(sorted(terms), 2):
        if _lev(a, b) == 1:
            hi, lo = (
                (a, b)
                if terms[a] > terms[b]
                or (terms[a] == terms[b] and a < b)
                else (b, a)
            )
            exp.add((hi, lo))
    assert got == exp
    # the canonical recall cases: substitution, insert/delete
    assert ("spark", "spork") in got
    assert ("vector", "vecto") in got
    assert ("vector", "vectors") in got
    # distance-2 pairs never survive the verify
    assert all(_lev(a, b) == 1 for a, b in got)


def test_deletion_keys(spark):
    row = (
        spark.range(1)
        .select(deletion_keys(F.lit("abc")).alias("k"))
        .collect()[0]["k"]
    )
    assert row == ["abc", "bc", "ac", "ab"]


def test_validation(spark):
    df = spark.createDataFrame(VOCAB, "term string, freq long")
    with pytest.raises(ValueError):
        edit1_pairs(df, min_len=0)
    with pytest.raises(ValueError):
        edit1_pairs(df, min_len=10, max_len=5)


def test_edit1_boundary_straddling_pairs_kept(spark):
    """Round-4 (ADVICE): a len-min_len term must find its
    len-(min_len-1) deletion neighbor — the pair straddles the length
    boundary and used to be silently dropped."""
    vocab = spark.createDataFrame(
        [("word", 50), ("ord", 1), ("wor", 2), ("ab", 9)],
        "term string, freq long",
    )
    out = {
        (r["term_hi"], r["term_lo"])
        for r in edit1_pairs(vocab, min_len=4, max_len=24).collect()
    }
    # both len-3 neighbors of 'word' are reported; the len-2/len-3
    # pair ('ab' vs nothing) is not (neither side in range)
    assert ("word", "ord") in out and ("word", "wor") in out
    for hi, lo in out:
        assert len(hi) >= 4 or len(lo) >= 4
