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
