"""Corpus vocabulary statistics: Heaps growth + inverted index.

Hand-computed goldens over a tiny deterministic corpus, plus a
plan assertion that both builds stay JVM-only (no Python eval).
The reference has no text machinery; these are LLM-pipeline
operators per the survey's training-data mandate.
"""

from __future__ import annotations

import pytest

from python_vegindex_spark.operators.vocab import (
    postings_index,
    tokenize_positions,
    vocab_growth,
)

# doc_id, text — ingestion order 0..5, batch_size=2 -> 3 batches
DOCS = [
    (0, "the cat sat"),
    (1, "the dog"),
    (2, "cat and dog ran"),
    (3, ""),
    (4, "the the the"),
    (5, "a new word"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_tokenize_positions_prefilter_positions(spark):
    # \s+ split consumes whole whitespace runs (both engines): a double
    # space yields NO empty token, so positions stay dense; a fully
    # empty doc yields one empty token, dropped by the min_len filter
    df = spark.createDataFrame(
        [(7, " Hello  WORLD "), (8, "")], "doc_id long, text string"
    )
    rows = tokenize_positions(df).orderBy("pos").collect()
    assert [(r.doc_id, r.term, r.pos) for r in rows] == [
        (7, "hello", 1),
        (7, "world", 2),
    ]


def test_vocab_growth_golden(docs):
    rows = vocab_growth(docs, batch_size=2).orderBy("batch").collect()
    # batch 0: docs 0-1 -> terms {the,cat,sat,dog} new=4, tokens=5
    # batch 1: docs 2-3 -> {and,ran} new=2, tokens=4 (doc 3 empty)
    # batch 2: docs 4-5 -> {a,new,word} new=3, tokens=6
    got = [(r.batch, r.first_doc, r.new_terms, r.cum_vocab, r.tokens, r.cum_tokens) for r in rows]
    assert got == [
        (0, 0, 4, 4, 5, 5),
        (1, 2, 2, 6, 4, 9),
        (2, 4, 3, 9, 6, 15),
    ]


def test_vocab_growth_rejects_bad_batch(docs):
    with pytest.raises(ValueError, match="batch_size"):
        vocab_growth(docs, batch_size=0)


def test_postings_index_golden(docs):
    rows = {r.term: r for r in postings_index(docs).collect()}
    # 'the': docs 0 (pos 1), 1 (pos 1), 4 (pos 1,2,3)
    the = rows["the"]
    assert (the.df, the.tf) == (3, 5)
    assert the.postings_checksum == (0 * 100003 + 1) + (1 * 100003 + 1) + (
        4 * 100003 + 1
    ) + (4 * 100003 + 2) + (4 * 100003 + 3)
    # 'dog': doc 1 pos 2, doc 2 pos 3
    dog = rows["dog"]
    assert (dog.df, dog.tf) == (2, 2)
    assert dog.postings_checksum == (1 * 100003 + 2) + (2 * 100003 + 3)
    assert len(rows) == 9  # full index when k is None


def test_postings_topk_rank_key(docs):
    rows = postings_index(docs, k=3).orderBy("rank").collect()
    # rank 1: 'the' (df=3); ties at df=2: cat, dog -> term ASC
    assert [(r.rank, r.term) for r in rows] == [(1, "the"), (2, "cat"), (3, "dog")]


def test_vocab_plans_python_free(docs):
    for df in (vocab_growth(docs, 2), postings_index(docs, k=3)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF", "mapInPandas"):
            assert marker not in plan, f"{marker} found in vocab plan"
