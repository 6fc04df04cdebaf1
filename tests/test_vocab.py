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


# ---------------------------------------------------------------- cosine


def test_cosine_pairs_hand_case(spark):
    from python_vegindex_spark.operators.terms import cosine_pairs

    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "a b b"), (2, "c"), (3, "a a b")],
        "doc_id long, text string",
    )
    rows = cosine_pairs(docs, min_cos=0.0).orderBy("id_a", "id_b").collect()
    got = [(r.id_a, r.id_b, r.dot, r.norm2_a, r.norm2_b, r.cos) for r in rows]
    # d2 shares no term with anyone: the pair never materializes.
    # expected cos pinned the operator's own way: dot/(sqrt*sqrt) —
    # sqrt(5)**2 is 4.999... in IEEE doubles, NOT 5
    c08 = 4 / (5**0.5 * 5**0.5)
    assert got == [
        (0, 1, 4, 5, 5, c08),
        (0, 3, 5, 5, 5, 5 / (5**0.5 * 5**0.5)),
        (1, 3, 4, 5, 5, c08),
    ]
    # threshold keeps only the exact duplicate
    kept = cosine_pairs(docs, min_cos=0.9).collect()
    assert [(r.id_a, r.id_b, r.cos) for r in kept] == [
        (0, 3, 5 / (5**0.5 * 5**0.5))
    ]


def test_cosine_pairs_max_df_prunes_norms_too(spark):
    from python_vegindex_spark.operators.terms import cosine_pairs

    docs = spark.createDataFrame(
        [
            (0, "a a b"),
            (1, "a b b"),
            (3, "a a b"),
            (4, "x y"),
            (5, "x y"),
            (6, "x y a"),
        ],
        "doc_id long, text string",
    )
    # a (df=4) and b (df=3) are pruned at max_df=2; x,y (df=3)... also
    # pruned -> use max_df=3: a (df=4) pruned, b/x/y (df=3) kept
    rows = (
        cosine_pairs(docs, min_cos=0.99, max_df=3)
        .orderBy("id_a", "id_b")
        .collect()
    )
    got = [(r.id_a, r.id_b, r.dot, r.norm2_a, r.norm2_b, r.cos) for r in rows]
    # post-pruning d6 = {x:1, y:1} (norm2 2, NOT 3): cos(d4, d6) hits
    # the pinned unit value — proof norms are computed post-pruning
    one2 = 2 / (2**0.5 * 2**0.5)
    assert (4, 6, 2, 2, 2, one2) in got and (5, 6, 2, 2, 2, one2) in got
    assert (4, 5, 2, 2, 2, one2) in got
    # b survives: d0/d1/d3 vectors are {b:1},{b:2},{b:1} -> all cos 1.0
    assert (0, 3, 1, 1, 1, 1.0) in got
    assert len(got) == 6  # (0,1),(0,3),(1,3),(4,5),(4,6),(5,6)


def test_cosine_pairs_validation(spark):
    from python_vegindex_spark.operators.terms import cosine_pairs

    docs = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_cos"):
        cosine_pairs(docs, min_cos=1.5)
    with pytest.raises(ValueError, match="max_df"):
        cosine_pairs(docs, max_df=0)


def test_vocab_scale_plan_shapes(spark):
    # top-k must plan as TakeOrderedAndProject (per-partition top-k +
    # k-row merge), never a vocabulary-sized single-partition sort
    df = spark.createDataFrame(
        [(i, "a b c") for i in range(10)], "doc_id long, text string"
    )
    p = postings_index(df, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p
    # the growth curve explodes the corpus exactly once: both consumers
    # read the pinned (term, batch) checkpoint, so the executed plan
    # contains ZERO Generate (explode) nodes
    g = vocab_growth(df, 2)._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in g


def test_review_validations_and_cosine_pin(spark):
    from python_vegindex_spark.operators.funnel import sequence_ngrams
    from python_vegindex_spark.operators.graph import pagerank_integer
    from python_vegindex_spark.operators.terms import cosine_pairs

    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a b")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="k must"):
        postings_index(docs, k=0)
    ev = spark.createDataFrame(
        [("u", "A")], "user_id string, state string"
    )
    with pytest.raises(ValueError, match="seq_cols"):
        sequence_ngrams(ev, [], "state")
    with pytest.raises(ValueError, match="empty"):
        pagerank_integer(
            spark.createDataFrame(
                [("A", None, 5)], "src string, dst string, w long"
            )
        )
    # cosine's corpus-sized TF lineage is pinned: the executed plan of
    # the four-consumer query contains ZERO Generate (explode) nodes
    plan = (
        cosine_pairs(docs, min_cos=0.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Generate" not in plan


def test_cosine_pairs_property_vs_bruteforce(spark):
    """Random tiny corpora vs a pure-Python cosine over TF dicts,
    including the pinned sqrt*sqrt float path and max_df pruning."""
    import itertools
    import random

    from python_vegindex_spark.operators.terms import cosine_pairs

    rng = random.Random(11)
    vocab = ["a", "b", "c", "d", "e"]
    for trial in range(4):
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 6))))
            for i in range(8)
        ]
        max_df = rng.choice([None, 3, 5])
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            (r.id_a, r.id_b): (r.dot, r.norm2_a, r.norm2_b, r.cos)
            for r in cosine_pairs(df, min_cos=0.0, max_df=max_df).collect()
        }
        # brute force with identical pruning + pinned float ops
        tf: dict[int, dict[str, int]] = {}
        for i, text in docs:
            d: dict[str, int] = {}
            for t in text.split():
                d[t] = d.get(t, 0) + 1
            tf[i] = d
        if max_df is not None:
            dfreq: dict[str, int] = {}
            for d in tf.values():
                for t in d:
                    dfreq[t] = dfreq.get(t, 0) + 1
            tf = {
                i: {t: c for t, c in d.items() if dfreq[t] <= max_df}
                for i, d in tf.items()
            }
        want = {}
        for i, j in itertools.combinations(sorted(tf), 2):
            dot = sum(tf[i][t] * tf[j].get(t, 0) for t in tf[i])
            if dot == 0:
                continue
            na = sum(c * c for c in tf[i].values())
            nb = sum(c * c for c in tf[j].values())
            want[(i, j)] = (dot, na, nb, dot / (na**0.5 * nb**0.5))
        assert got == want, f"trial {trial} max_df={max_df}"


def test_sequence_ngrams_property_vs_bruteforce(spark):
    import random

    from python_vegindex_spark.operators.funnel import sequence_ngrams

    rng = random.Random(5)
    states = ["A", "B", "C"]
    rows = []
    eid = 0
    seqs: dict[str, list[str]] = {}
    for u in range(6):
        seq = [rng.choice(states) for _ in range(rng.randint(0, 7))]
        seqs[f"u{u}"] = seq
        for i, st in enumerate(seq):
            rows.append((f"u{u}", f"2024-01-01 00:{i:02d}:00", eid, st))
            eid += 1
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "user_id string, ts string, event_id long, state string"
    ).withColumn("ts", F.to_timestamp("ts"))
    for n in (2, 3):
        got = {
            r.gram: (r.n_occurrences, r.n_seqs)
            for r in sequence_ngrams(
                df, ["user_id"], "state", n=n, order_cols=["event_id"]
            ).collect()
        }
        want: dict[str, list] = {}
        for u, seq in seqs.items():
            for i in range(len(seq) - n + 1):
                g = ">".join(seq[i : i + n])
                want.setdefault(g, []).append(u)
        want_d = {g: (len(us), len(set(us))) for g, us in want.items()}
        assert got == want_d, f"n={n}"


def test_cosine_pairs_dense_path_equals_postings(spark):
    """Round-4 (bench-found): the dense-vocabulary broadcast-NLJ path
    must be bit-identical to the postings self-join — same pair
    universe (share >= 1 term), same integer dot/norms, same floats."""
    import random

    from python_vegindex_spark.operators.terms import cosine_pairs

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(12)]
    docs = spark.createDataFrame(
        [
            (f"d{i:03d}", " ".join(rng.choices(vocab, k=rng.randint(3, 30))))
            for i in range(80)
        ],
        "doc_id string, text string",
    )

    def rows(df):
        return sorted(
            (r["id_a"], r["id_b"], r["dot"], r["norm2_a"], r["norm2_b"], r["cos"])
            for r in df.collect()
        )

    for mc in (0.0, 0.5, 0.9):
        dense = rows(cosine_pairs(docs, min_cos=mc))
        postings = rows(cosine_pairs(docs, min_cos=mc, dense_vocab_max=0))
        assert dense == postings and (mc > 0.5 or len(dense) > 0)

    # a vocab larger than the threshold falls back to postings (same
    # result either way — this pins the guard is consulted)
    assert rows(cosine_pairs(docs, min_cos=0.5, dense_vocab_max=3)) == rows(
        cosine_pairs(docs, min_cos=0.5, dense_vocab_max=0)
    )

    # the dense plan is a broadcast nested-loop join with NO pair
    # shuffle (the only exchanges feed the tiny vector build)
    out = cosine_pairs(docs, min_cos=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_cosine_pairs_empty_vocabulary(spark):
    """All-empty / whitespace-only docs: no terms survive, so the dense
    path must not be taken (a zero-element array is NullType and fails
    analysis) — the result is simply empty."""
    from python_vegindex_spark.operators.terms import cosine_pairs

    empty = spark.createDataFrame(
        [("d1", ""), ("d2", "   ")], "doc_id string, text string"
    )
    assert cosine_pairs(empty, min_cos=0.5).count() == 0


def test_cosine_pairs_dense_gate_byte_cap_and_cost(spark):
    """Round-5: the dense regime is gated on broadcast BYTES
    (docs*vocab*8) and the measured cost ratio, not raw counts — a tiny
    byte cap forces the postings plan, identical output either way."""
    from python_vegindex_spark.operators.terms import cosine_pairs

    docs = spark.createDataFrame(
        [("a", "x y"), ("b", "y z"), ("c", "x z")],
        "doc_id string, text string",
    )

    def rows(df):
        return sorted(map(tuple, df.collect()))

    dense = cosine_pairs(docs, min_cos=0.0)
    capped = cosine_pairs(docs, min_cos=0.0, dense_broadcast_bytes_max=8)
    assert rows(dense) == rows(capped)
    dplan = dense._jdf.queryExecution().executedPlan().toString()
    cplan = capped._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in dplan
    assert "BroadcastNestedLoopJoin" not in cplan

    # an uneconomical dense ratio also falls back to postings
    costly = cosine_pairs(docs, min_cos=0.0, dense_cost_ratio=0.0)
    assert rows(costly) == rows(dense)
    assert "BroadcastNestedLoopJoin" not in (
        costly._jdf.queryExecution().executedPlan().toString()
    )
