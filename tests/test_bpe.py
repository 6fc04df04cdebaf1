"""BPE trainer: pure-Python mirror parity, greedy-replace overlap edge
(cross-engine), segmentation round-trip."""

from __future__ import annotations

from collections import Counter

import pytest

from python_vegindex_spark.operators.bpe import (
    bpe_segment,
    bpe_train,
    word_frequencies,
)


def _py_bpe(word_freqs: dict[str, int], n_merges: int):
    """Reference trainer: same conventions — overlapping adjacencies
    counted, greedy left-to-right merge application, tie-break
    (count DESC, left ASC, right ASC)."""
    state = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for step in range(1, n_merges + 1):
        counts: Counter = Counter()
        for syms, f in state.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (l, r), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, l, r, l + r, cnt))
        new_state: dict[tuple, int] = {}
        for syms, f in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_state[key] = new_state.get(key, 0) + f
        state = new_state
    return merges


DOCS = [
    (0, "low low low low low"),
    (1, "lower lower newest newest newest"),
    (2, "newest newest newest widest widest"),
    (3, "the cat the hat"),
    # XYXY/run-shaped words: the shared-delimiter overlap cases where a
    # naive single replace diverges from greedy pairing
    (4, "haha haha coco abab aaaa aaaaa"),
]


def test_bpe_train_matches_python_mirror(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    wf = {
        r["word"]: r["freq"] for r in word_frequencies(df).collect()
    }
    exp = _py_bpe(wf, 8)
    got = [
        (r["step"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train(spark, df, 8).orderBy("step").collect()
    ]
    assert got == exp


def test_greedy_replace_overlap_edge_cross_engine(spark):
    """The space-doubling merge must equal the greedy walker on the
    overlap edges — in BOTH engines. ' h a h a ' -> ' ha ha ' (a naive
    single replace yields ' ha h a '); ' a a a a a ' -> ' aa aa a '."""
    import duckdb
    from pyspark.sql import functions as F

    from python_vegindex_spark.operators.bpe import _apply_merge

    cases = [
        (" h a h a ", "h", "a", " ha ha "),
        (" a a a ", "a", "a", " aa a "),
        (" a a a a a ", "a", "a", " aa aa a "),
        (" x y ", "a", "b", " x y "),
    ]
    con = duckdb.connect()
    for raw, l, r, want in cases:
        got_s = (
            spark.range(1)
            .select(_apply_merge(F.lit(raw), l, r).alias("x"))
            .collect()[0]["x"]
        )
        got_d = con.sql(
            f"""SELECT replace(replace(replace('{raw}', ' ', '  '),
                 ' {l}  {r} ', ' {l}{r} '), '  ', ' ')"""
        ).fetchone()[0]
        assert got_s == got_d == want, (raw, l, r, got_s, got_d)
    con.close()


def test_bpe_train_exhausts_and_stops(spark):
    df = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    out = bpe_train(spark, df, 10).collect()
    # 'ab' merges once into a single symbol; then no pairs remain
    assert len(out) == 1
    assert (out[0]["left"], out[0]["right"], out[0]["merged"]) == ("a", "b", "ab")
    with pytest.raises(ValueError):
        bpe_train(spark, df, 0)


def test_bpe_segment_roundtrip(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    merge_rows = bpe_train(spark, df, 6).orderBy("step").collect()
    merges = [(r["left"], r["right"]) for r in merge_rows]
    seg = bpe_segment(df, merges).collect()
    by_id = {r["doc_id"]: r["bpe_tokens"] for r in seg}
    # concatenating a word's tokens reproduces the word, in order
    for doc_id, text in DOCS:
        words = [w for w in text.lower().split() if w]
        toks = by_id[doc_id]
        rebuilt, i = [], 0
        for w in words:
            acc = ""
            while acc != w:
                acc += toks[i]
                i += 1
            rebuilt.append(acc)
        assert rebuilt == words and i == len(toks)
    # the most frequent word becomes a single token after enough merges
    full_merges = [
        (r["left"], r["right"])
        for r in bpe_train(spark, df, 30).orderBy("step").collect()
    ]
    seg2 = bpe_segment(df, full_merges).collect()
    tokens0 = {r["doc_id"]: r["bpe_tokens"] for r in seg2}[0]
    assert tokens0 == ["low"] * 5


def test_bpe_random_corpora_match_mirror(spark):
    """Randomized corpora over a tiny alphabet maximize merge-order and
    overlap stress; the trainer must match the greedy mirror exactly."""
    import random

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        words = [
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
            for _ in range(40)
        ]
        text = " ".join(words)
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        wf = {r["word"]: r["freq"] for r in word_frequencies(df).collect()}
        exp = _py_bpe(wf, 5)
        got = [
            (r["step"], r["left"], r["right"], r["merged"], r["pair_count"])
            for r in bpe_train(spark, df, 5).orderBy("step").collect()
        ]
        assert got == exp, (seed, got, exp)


def test_bpe_driver_local_equals_distributed(spark):
    """Round-4: the driver-local merge loop (vocab collected once) must
    be bit-identical to the distributed per-merge loop, including
    pair_count and tie-breaks."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    fast = bpe_train(spark, df, 8).orderBy("step").collect()
    dist = (
        bpe_train(spark, df, 8, driver_vocab_rows=None)
        .orderBy("step")
        .collect()
    )
    assert len(fast) == 8
    assert [tuple(r) for r in fast] == [tuple(r) for r in dist]


def test_bpe_driver_threshold_respected(spark):
    """A threshold below the vocab size must take the distributed path
    (observable only via identical output — pin both)."""
    df = spark.createDataFrame(DOCS[:2], ["doc_id", "text"])
    fast = bpe_train(spark, df, 4, driver_vocab_rows=10**6).orderBy("step").collect()
    dist = bpe_train(spark, df, 4, driver_vocab_rows=1).orderBy("step").collect()
    assert [tuple(r) for r in fast] == [tuple(r) for r in dist]
