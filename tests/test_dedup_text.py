"""Text shingling + MinHash dedup units (word and char shingle paths)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from python_vegindex_spark.functions.text import char_ngrams, word_ngrams
from python_vegindex_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_signatures,
)


def test_char_ngrams_values(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"t": ["Hello  World", "ab", "abcdef"]})
    )
    got = df.select(char_ngrams(F.col("t"), 5).alias("g")).collect()
    # whitespace normalized + lowercased, sliding window of 5 chars
    assert got[0]["g"][0] == "hello"
    assert got[0]["g"][1] == "ello "
    assert got[0]["g"][-1] == "world"
    assert len(got[0]["g"]) == len("hello world") - 5 + 1
    # shorter-than-n text falls back to the whole string
    assert got[1]["g"] == ["ab"]
    assert got[2]["g"] == ["abcde", "bcdef"]


def test_char_minhash_finds_near_dups(spark):
    texts = {
        "d1": "the quick brown fox jumps over the lazy dog and runs away fast",
        "d2": "the quick brown fox jumps over the lazy dog and runs away fast!",  # near-dup
        "d3": "completely different content about spark query engines at scale",
    }
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    sigs = minhash_signatures(
        df, num_hashes=64, shingle_n=5, shingle_kind="char"
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(sigs, bands=16, rows_per_band=4).collect()
    }
    assert ("d1", "d2") in pairs
    assert ("d1", "d3") not in pairs and ("d2", "d3") not in pairs


def test_shingle_kind_validation(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": ["x"], "text": ["y"]}))
    with pytest.raises(ValueError, match="shingle_kind"):
        minhash_signatures(df, shingle_kind="sentence")


# ---------------------------------------------------------------------------
# connected-components clustering + canonical selection

def test_dedup_clusters_chain_and_singleton(spark):
    from python_vegindex_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e")], "id_a string, id_b string"
    )
    ids = spark.createDataFrame([("f",)], "id string")
    got = {r["id"]: r["cluster_id"] for r in dedup_clusters(pairs, ids=ids).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d", "f": "f"}


def test_dedup_clusters_long_chain_converges(spark):
    from python_vegindex_spark.operators.dedup import dedup_clusters

    n = 40  # path graph of 40 nodes: needs ~log2(40) rounds
    pairs = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i+1:02d}") for i in range(n - 1)],
        "id_a string, id_b string",
    )
    got = {r["id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert len(got) == n
    assert set(got.values()) == {"n00"}


def test_dedup_keep_canonical(spark):
    import pandas as pd

    from python_vegindex_spark.operators.dedup import dedup_keep_canonical

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["a", "b", "c", "x"], "text": ["t1", "t1b", "t1c", "solo"]})
    )
    pairs = spark.createDataFrame([("a", "b"), ("b", "c")], "id_a string, id_b string")
    kept = sorted(r["doc_id"] for r in dedup_keep_canonical(docs, pairs).collect())
    assert kept == ["a", "x"]


# ---------------------------------------------------------------------------
# SimHash Hamming pair discovery

def test_simhash_pairs_finds_near_dups(spark):
    """Pigeonhole guarantee: hamming < tables -> pair always found.
    Synthetic signatures make the distance exact and deterministic."""
    from python_vegindex_spark.operators.dedup import simhash_pairs

    base = 0x5A5A5A5A5A5A5A5A
    near = base ^ (1 << 3) ^ (1 << 40)          # hamming 2
    far = base ^ 0x00FF00FF00FF00FF             # hamming 32
    sigs = spark.createDataFrame(
        [("d1", base), ("d2", near), ("d3", far)], "id string, simhash long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(sigs, hamming_max=3, tables=4).collect()
    }
    assert got == {("d1", "d2"): 2}

    # radius 8 with 16 tables (blocks of 4 bits): guarantee still holds
    eight = base
    for b in (1, 9, 17, 25, 33, 41, 49, 57):
        eight ^= 1 << b
    sigs2 = spark.createDataFrame(
        [("a", base), ("b", eight)], "id string, simhash long"
    )
    got2 = simhash_pairs(sigs2, hamming_max=8, tables=16).collect()
    assert len(got2) == 1 and got2[0]["hamming"] == 8


def test_simhash_pairs_identical_docs_hamming_zero(spark):
    import pandas as pd

    from python_vegindex_spark.operators.dedup import simhash64, simhash_pairs

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["a", "b"], "text": ["same exact words here"] * 2})
    )
    got = simhash_pairs(simhash64(df), hamming_max=0).collect()
    assert len(got) == 1 and got[0]["hamming"] == 0


def test_ngram_jaccard_char_kind(spark):
    from python_vegindex_spark.operators.dedup import ngram_jaccard

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": ["a", "b"],
                "text": ["hello world today", "hello world tomorrow"],
            }
        )
    )
    pairs = spark.createDataFrame([("a", "b")], "id_a string, id_b string")
    jw = ngram_jaccard(pairs, docs, n=3, shingle_kind="word").collect()[0]["jaccard"]
    jc = ngram_jaccard(pairs, docs, n=5, shingle_kind="char").collect()[0]["jaccard"]
    # word 3-grams share nothing (only one trigram each, different);
    # char 5-grams share the long common prefix
    assert jw == 0.0
    assert 0.3 < jc < 1.0
    with pytest.raises(ValueError, match="shingle_kind"):
        ngram_jaccard(pairs, docs, shingle_kind="line")


def test_simhash_pairs_rejects_bad_block_layout(spark):
    """64 % tables != 0 or an over-wide prefix silently voids the
    pigeonhole recall guarantee -> must raise instead."""
    from python_vegindex_spark.operators.dedup import simhash_pairs

    sigs = spark.createDataFrame([("a", 1)], "id string, simhash long")
    with pytest.raises(ValueError, match="divide 64"):
        simhash_pairs(sigs, tables=3)
    with pytest.raises(ValueError, match="prefix_bits"):
        simhash_pairs(sigs, tables=4, prefix_bits=17)
    with pytest.raises(ValueError, match="prefix_bits"):
        simhash_pairs(sigs, tables=4, prefix_bits=0)


def test_lsh_pairs_rejects_short_signatures(spark):
    """Regression: bands*rows_per_band beyond the signature length used
    to slice empty arrays -> md5('') -> ONE shared bucket for every doc
    (silent O(N^2) garbage candidates). Must raise instead."""
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["alpha beta gamma delta", "unrelated words entirely here"]})
    )
    sigs = minhash_signatures(docs, num_hashes=8)
    with pytest.raises(Exception, match="need bands"):
        minhash_lsh_pairs(sigs, bands=16, rows_per_band=4).collect()
    # matching layout still works
    ok = minhash_lsh_pairs(sigs, bands=4, rows_per_band=2).collect()
    assert isinstance(ok, list)


def test_dedup_exact_md5_matches_xxhash_grouping(spark):
    from python_vegindex_spark.operators.dedup import dedup_exact

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": ["Hello  World", "hello world", "other", "OTHER "],
            }
        )
    )
    fast = {
        (r["keep_id"], r["dup_count"])
        for r in dedup_exact(docs).collect()
    }
    portable = dedup_exact(docs, hash_kind="md5")
    rows = portable.collect()
    assert {(r["keep_id"], r["dup_count"]) for r in rows} == fast == {(1, 2), (3, 2)}
    # md5 fingerprints are the plain hex digest of the normalized text
    import hashlib

    assert {r["fingerprint"] for r in rows} == {
        hashlib.md5(b"hello world").hexdigest(),
        hashlib.md5(b"other").hexdigest(),
    }
    with pytest.raises(ValueError, match="hash_kind"):
        dedup_exact(docs, hash_kind="sha1")
