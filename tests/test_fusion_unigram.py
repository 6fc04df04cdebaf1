"""Brute-force oracles for unigram frequency scoring and RRF fusion."""

from __future__ import annotations

from collections import Counter

import pytest

from python_vegindex_spark.operators.fusion import hybrid_search_rrf, rrf_fuse
from python_vegindex_spark.operators.terms import unigram_freq_score


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the the the the"),
    (2, "zyzzyva qoph crwth"),
    (3, "spark streams the vector data"),
    (4, ""),
]


def _py_unigram(docs):
    toks = {i: t.lower().split() for i, t in docs}
    corpus = Counter()
    for ws in toks.values():
        corpus.update(ws)
    total = sum(corpus.values())
    out = {}
    for i, ws in toks.items():
        if not ws:
            continue
        weighted = sum(corpus[w] for w in ws)
        out[i] = (len(ws), weighted, weighted / (len(ws) * total))
    return out


def test_unigram_freq_score_bruteforce(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["weighted"], r["mean_tok_freq"])
        for r in unigram_freq_score(df).collect()
    }
    exp = _py_unigram(DOCS)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i][0] == exp[i][0]
        assert got[i][1] == exp[i][1]
        assert got[i][2] == pytest.approx(exp[i][2], rel=0, abs=0)
    # doc 1 (all 'the') must out-score the rare-word doc 2
    assert got[1][2] > got[2][2]


def test_rrf_fuse_exact(spark):
    lex = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id long, rank int"
    )
    sem = spark.createDataFrame(
        [(11, 1), (13, 2), (10, 3)], "doc_id long, rank int"
    )
    rows = rrf_fuse(lex, sem, k=10, k0=60).collect()
    got = {r["doc_id"]: (r["rank"], r["rrf_score"]) for r in rows}
    # exact-rational scores: (2*60+r1+r2)/((60+r1)*(60+r2)) or 1/(60+r)
    exp_score = {
        10: (120 + 1 + 3) / ((60 + 1) * (60 + 3)),
        11: (120 + 2 + 1) / ((60 + 2) * (60 + 1)),
        12: 1.0 / 63,
        13: 1.0 / 62,
    }
    for d, s in exp_score.items():
        assert got[d][1] == s, d
    order = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    exp_order = sorted(
        exp_score, key=lambda d: (-exp_score[d], d)
    )
    assert order == exp_order


def test_rrf_tie_breaks_on_doc_id(spark):
    # (1, 5) and (5, 1) fuse to the identical score -> doc id decides
    lex = spark.createDataFrame([(7, 1), (3, 5)], "doc_id long, rank int")
    sem = spark.createDataFrame([(7, 5), (3, 1)], "doc_id long, rank int")
    rows = rrf_fuse(lex, sem, k=2).orderBy("rank").collect()
    assert rows[0]["rrf_score"] == rows[1]["rrf_score"]
    assert [r["doc_id"] for r in rows] == [3, 7]


def test_hybrid_search_legs(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    embs = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [0.7, 0.7]),
            (4, [1.0, 0.05]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = hybrid_search_rrf(
        docs, embs, ["spark", "vector"], query_vec_id=0, k=5, pool=5
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    # doc 3 is the only lexical hit; vec 0 never appears as its own
    # semantic neighbor
    assert by_id[3]["rank_lex"] == 1
    assert 0 not in {r["doc_id"] for r in out if r["rank_sem"] is not None} or (
        by_id.get(0) and by_id[0]["rank_sem"] is None
    )
    # semantic leg ranks vec 4 nearest to vec 0
    assert by_id[4]["rank_sem"] == 1


def test_validation(spark):
    lex = spark.createDataFrame([(1, 1)], "doc_id long, rank int")
    with pytest.raises(ValueError):
        rrf_fuse(lex, lex, k=0)
    with pytest.raises(ValueError):
        hybrid_search_rrf(None, None, ["x"], 0, k=10, pool=5)


def test_new_query_plans(spark):
    """Plan discipline for the newest families: unigram scoring and RRF
    legs are JVM-only; weighted sampling plans TakeOrdered (never a
    global single-partition sort)."""
    from python_vegindex_spark.operators.sampling import (
        weighted_bottomk_sample,
    )
    from python_vegindex_spark.plans.lint import (
        assert_jvm_only,
        assert_no_global_sort,
        plan_report,
    )

    docs = spark.createDataFrame(
        [(i, f"spark stream doc {i} " * 3, 10 + i) for i in range(50)],
        "doc_id long, text string, n_chars long",
    )
    u = unigram_freq_score(docs)
    u.collect()
    assert_jvm_only(u)

    ws = weighted_bottomk_sample(docs, "doc_id", "n_chars", k=5)
    ws.collect()
    assert_jvm_only(ws)
    assert_no_global_sort(ws)
    assert plan_report(ws)["has_take_ordered"]

    embs = spark.createDataFrame(
        [(i, [float(i % 7), 1.0]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    hy = hybrid_search_rrf(docs, embs, ["spark"], query_vec_id=0, k=5, pool=10)
    hy.collect()
    assert_jvm_only(hy)
