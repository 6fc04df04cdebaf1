"""Unit + plan tests for operators/decontam and operators/quality_filter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_vegindex_spark.operators.decontam import (
    benchmark_ngram_keys,
    contamination_hits,
    decontaminate,
)
from python_vegindex_spark.operators.quality_filter import (
    gopher_flags,
    top_ngram_fraction,
)


@pytest.fixture()
def corpus(spark):
    rows = [
        # shares the 4-gram "alpha beta gamma delta" with the benchmark
        (1, "intro words alpha beta gamma delta closing remark here"),
        # no overlap
        (2, "totally different content with no shared sequences at all"),
        # shares it twice (still counted once: distinct grams per doc)
        (3, "alpha beta gamma delta middle alpha beta gamma delta"),
        # shorter than n words -> can never be contaminated
        (4, "alpha beta gamma"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def bench(spark):
    return spark.createDataFrame(
        [(100, "the eval question mentions ALPHA Beta GAMMA delta exactly")],
        "doc_id long, text string",
    )


def test_contamination_hits_planted_overlap(corpus, bench):
    got = {
        r["id"]: (r["doc_grams"], r["hit_grams"])
        for r in contamination_hits(corpus, bench, n=4).collect()
    }
    # doc 1: 9 words -> 6 grams, exactly one overlapping (case-folded)
    # doc 3: 9 words -> 6 grams but only 5 DISTINCT; 1 hit
    assert got == {1: (6, 1), 3: (5, 1)}


def test_decontaminate_removes_only_hit_docs(corpus, bench):
    kept = sorted(
        r["doc_id"] for r in decontaminate(corpus, bench, n=4).collect()
    )
    assert kept == [2, 4]


def test_short_benchmark_doc_yields_no_keys(spark, corpus):
    tiny = spark.createDataFrame([(9, "only three words")], "doc_id long, text string")
    assert benchmark_ngram_keys(tiny, n=4).count() == 0
    assert contamination_hits(corpus, tiny, n=4).count() == 0


def test_decontam_join_is_broadcast_no_corpus_shuffle(corpus, bench):
    plan = (
        contamination_hits(corpus, bench, n=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    for marker in ("SortMergeJoin", "ShuffledHashJoin"):
        assert marker not in plan, f"corpus side must not shuffle for the join: {marker}"


def test_gopher_flags_each_gate(spark):
    long_ok = "the quick brown fox jumps over the lazy dog and " * 6  # 60 words
    rows = [
        (1, long_ok),  # passes everything
        (2, "too short"),  # ok_words fails
        (3, ("### " * 60).strip()),  # symbols + alpha + stopwords fail
        (4, "\n".join(["the same line is here"] * 12)),  # dup lines fail
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r.asDict() for r in gopher_flags(df, min_words=30).collect()}
    assert got[1]["keep"] is True
    assert got[2]["ok_words"] is False and got[2]["keep"] is False
    assert got[3]["ok_symbols"] is False
    assert got[3]["ok_alpha"] is False
    assert got[3]["keep"] is False
    assert got[4]["ok_dup_lines"] is False and got[4]["keep"] is False
    assert got[4]["dup_line_frac"] == pytest.approx(11 / 12)


def test_gopher_flags_is_shuffle_and_python_free(spark):
    df = spark.createDataFrame([(1, "a few words here")], "doc_id long, text string")
    plan = gopher_flags(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, plan


def test_top_ngram_fraction_known_doc(spark):
    # "ab cd" occurs 3 times among 5 2-grams; normalized len = 17 chars
    df = spark.createDataFrame(
        [(1, "ab cd ab cd ab cd")], "doc_id long, text string"
    )
    row = top_ngram_fraction(df, n=2).collect()[0]
    assert row["n_grams"] == 5
    assert row["top_cnt"] == 3
    assert row["top_gram"] == "ab cd"
    assert row["top_char_frac"] == pytest.approx(3 * 5 / 17)
    assert row["ok_top_ngram"] is False  # 0.88 > 0.2


def test_top_ngram_fraction_tie_breaks_lexicographically(spark):
    # "b c" and "a b" both occur twice -> tie resolves to "a b"
    df = spark.createDataFrame([(1, "a b c a b c")], "doc_id long, text string")
    row = top_ngram_fraction(df, n=2).collect()[0]
    assert row["top_cnt"] == 2
    assert row["top_gram"] == "a b"


def test_top_ngram_fraction_skips_docs_shorter_than_n(spark):
    df = spark.createDataFrame(
        [(1, "single"), (2, "two words")], "doc_id long, text string"
    )
    got = top_ngram_fraction(df, n=2).collect()
    assert [r["id"] for r in got] == [2]


def test_gopher_flags_null_and_blank_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "   "), (3, "")], "doc_id long, text string"
    )
    got = {r["id"]: r.asDict() for r in gopher_flags(df).collect()}
    for i in (1, 2, 3):
        assert got[i]["n_words"] == 0
        assert got[i]["mean_word_len"] is None
        assert got[i]["keep"] is False
    assert got[1]["n_stopwords"] is None  # NULL text -> NULL, like SQL
    assert got[2]["n_stopwords"] == 0
