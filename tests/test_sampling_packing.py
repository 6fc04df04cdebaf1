"""Deterministic sampling (operators/sampling.py) and sequence packing
(operators/packing.py): semantics vs independent loops, determinism,
and plan shape (sampling = filter-only, no exchange; packing = one
shuffle on the shard key)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from python_vegindex_spark.operators.packing import (
    _greedy_pack_ids,
    pack_chunk_stats,
    pack_chunks,
    pack_greedy,
)
from python_vegindex_spark.operators.sampling import (
    hash_sample,
    hex_threshold,
    split_train_eval,
    stratified_hash_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(5)
    rows = [
        (int(i), f"lang{int(i) % 3}", int(rng.integers(1, 900)))
        for i in range(2000)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")


# ---------------------------------------------------------------------------
# sampling

def test_hex_threshold_edges():
    assert hex_threshold(0.0) == "0"
    assert hex_threshold(-1.0) == "0"
    assert hex_threshold(1.0) == "g"
    assert hex_threshold(2.0) == "g"
    assert hex_threshold(0.5) == "80000000"
    # tiny fractions never collapse to keep-nothing
    assert hex_threshold(1e-12) == "00000001"
    # every 8-hex draw is < "g" and none is < "0"
    assert "ffffffff" < "g" and not ("00000000" < "0")


def test_hash_sample_deterministic_and_nested(docs):
    s10 = set(r[0] for r in hash_sample(docs, 0.10, ["doc_id"], salt="s").select("doc_id").collect())
    s10_again = set(r[0] for r in hash_sample(docs, 0.10, ["doc_id"], salt="s").select("doc_id").collect())
    s30 = set(r[0] for r in hash_sample(docs, 0.30, ["doc_id"], salt="s").select("doc_id").collect())
    assert s10 == s10_again  # reproducible, unlike rand()
    assert s10 <= s30  # same salt => nested samples
    n = docs.count()
    assert 0.05 * n < len(s10) < 0.15 * n
    assert 0.24 * n < len(s30) < 0.36 * n
    # a different salt draws an (almost surely) different sample
    s10b = set(r[0] for r in hash_sample(docs, 0.10, ["doc_id"], salt="t").select("doc_id").collect())
    assert s10 != s10b


def test_hash_sample_fraction_edges(docs):
    assert hash_sample(docs, 0.0, ["doc_id"]).count() == 0
    assert hash_sample(docs, 1.0, ["doc_id"]).count() == docs.count()


def test_stratified_fractions(docs):
    out = stratified_hash_sample(
        docs, "lang", {"lang0": 1.0, "lang1": 0.2}, ["doc_id"], salt="s"
    )
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    per = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got["lang0"] == per["lang0"]  # fraction 1.0 keeps the stratum
    assert 0.1 * per["lang1"] < got["lang1"] < 0.3 * per["lang1"]
    assert "lang2" not in got  # default fraction 0.0


def test_split_train_eval_partitions(docs):
    out = split_train_eval(docs, 0.25, ["doc_id"])
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts["train"] + counts["eval"] == docs.count()
    assert 0.18 * docs.count() < counts["eval"] < 0.32 * docs.count()
    # keyed split: re-running yields the identical assignment
    again = {r["doc_id"]: r["split"] for r in split_train_eval(docs, 0.25, ["doc_id"]).collect()}
    for r in out.collect():
        assert again[r["doc_id"]] == r["split"]


def test_hash_sample_plan_is_filter_only(docs):
    plan = hash_sample(docs, 0.2, ["doc_id"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# packing

def _chunk_oracle(toks, budget):
    """Independent loop: running offset per doc."""
    out, off = [], 0
    for t in toks:
        first = off // budget
        last = max((off + t - 1) // budget, first)
        out.append((off, first, last))
        off += t
    return out


def test_pack_chunks_matches_loop(spark, docs):
    budget = 1000
    out = (
        pack_chunks(docs, budget, ["lang"], ["doc_id"], "n_tokens")
        .orderBy("lang", "doc_id")
        .collect()
    )
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        expect = _chunk_oracle([r["n_tokens"] for r in rows], budget)
        for r, (off, first, last) in zip(rows, expect):
            assert (r["offset"], r["pack_first"], r["pack_last"]) == (off, first, last), (lang, r)
            assert r["n_packs_spanned"] == last - first + 1


def test_pack_chunk_stats(spark, docs):
    budget = 1000
    stats = {r["lang"]: r for r in pack_chunk_stats(docs, budget, ["lang"], "n_tokens").collect()}
    per = docs.groupBy("lang").agg(F.sum("n_tokens").alias("tot"), F.count("*").alias("n")).collect()
    for r in per:
        s = stats[r["lang"]]
        assert s["n_docs"] == r["n"]
        assert s["total_tokens"] == r["tot"]
        assert s["n_packs"] == -(-r["tot"] // budget)
        assert s["pad_tokens"] == s["n_packs"] * budget - r["tot"]


def _greedy_oracle(toks, budget):
    """Straightforward row-at-a-time reference loop."""
    ids, pid, fill = [], 0, 0
    started = False
    for t in toks:
        if started and fill + t > budget:
            pid += 1
            fill = 0
        ids.append(pid)
        fill += t
        started = True
    return ids


@pytest.mark.parametrize(
    "toks,budget",
    [
        ([100, 200, 700, 1, 999, 1000, 1], 1000),   # exact fill + boundary
        ([5000, 1, 2, 5000, 3], 1000),              # oversize docs alone
        ([0, 0, 1000, 0, 1], 1000),                 # zero-token docs
        ([1] * 50, 7),
        ([1000] * 5, 1000),                         # every doc exactly full
    ],
)
def test_greedy_kernel_matches_loop(toks, budget):
    got = _greedy_pack_ids(np.array(toks, dtype=np.int64), budget).tolist()
    assert got == _greedy_oracle(toks, budget), (toks, budget)


def test_greedy_kernel_fuzz():
    rng = np.random.default_rng(11)
    for _ in range(200):
        n = int(rng.integers(1, 60))
        toks = rng.integers(0, 1500, n)
        budget = int(rng.integers(1, 1200))
        got = _greedy_pack_ids(toks.astype(np.int64), budget).tolist()
        assert got == _greedy_oracle(toks.tolist(), budget)


def test_pack_greedy_dataframe(spark, docs):
    budget = 1000
    out = (
        pack_greedy(docs, budget, ["lang"], ["doc_id"], "n_tokens")
        .orderBy("lang", "doc_id")
        .collect()
    )
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert len(out) == docs.count()
    for lang, rows in by_lang.items():
        expect = _greedy_oracle([r["n_tokens"] for r in rows], budget)
        assert [r["pack_id"] for r in rows] == expect, lang
        # no pack exceeds budget unless a single doc does
        fills: dict[int, int] = {}
        for r in rows:
            fills[r["pack_id"]] = fills.get(r["pack_id"], 0) + r["n_tokens"]
        for pid, tot in fills.items():
            members = [r["n_tokens"] for r in rows if r["pack_id"] == pid]
            assert tot <= budget or len(members) == 1


def test_pack_chunks_single_exchange(docs):
    plan = (
        pack_chunks(docs, 1000, ["lang"], ["doc_id"], "n_tokens")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one running sum in the Window operator (the alias is reused
    # by every derived column, not re-planned per column)
    assert plan.count("windowspecdefinition") == 1
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pack_rejects_bad_budget(docs):
    for fn in (
        lambda: pack_chunks(docs, 0, ["lang"], ["doc_id"], "n_tokens"),
        lambda: pack_chunk_stats(docs, -1, ["lang"], "n_tokens"),
        lambda: pack_greedy(docs, 0, ["lang"], ["doc_id"], "n_tokens"),
    ):
        with pytest.raises(ValueError):
            fn()


def test_weighted_bottomk_sample(spark):
    """Ohlsson sequential-Poisson PPS sample: python-mirror parity,
    weight bias, nesting in k, zero/NULL-weight exclusion."""
    import hashlib

    from python_vegindex_spark.operators.sampling import (
        weighted_bottomk_sample,
    )

    rows = [(f"k{i}", (i % 10) + 1) for i in range(400)] + [
        ("zero", 0),
        ("neg", -5),
    ]
    df = spark.createDataFrame(rows, "key string, w long")
    got = weighted_bottomk_sample(df, "key", "w", k=20).orderBy("rank").collect()

    def prio(key, w):
        h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
        return h / (float(2**60) * float(w))

    exp = sorted(
        ((prio(k_, w_), k_, w_) for k_, w_ in rows if w_ > 0),
    )[:20]
    assert [(r["priority"], r["key"], r["weight"]) for r in got] == exp
    assert {r["key"] for r in got}.isdisjoint({"zero", "neg"})

    # nesting: k=5 ranking is a prefix of k=20's
    small = weighted_bottomk_sample(df, "key", "w", k=5).orderBy("rank").collect()
    assert [r["key"] for r in small] == [r["key"] for r in got[:5]]

    # weight bias: the mean weight of a PPS sample exceeds the
    # population mean (weights 1..10, uniform hash)
    big = weighted_bottomk_sample(df, "key", "w", k=100).collect()
    assert sum(r["weight"] for r in big) / 100 > 5.5

    import pytest as _pt

    with _pt.raises(ValueError):
        weighted_bottomk_sample(df, "key", "w", k=0)
