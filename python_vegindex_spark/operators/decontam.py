"""Benchmark decontamination: drop training docs overlapping an eval set.

The standard guard in large-corpus training pipelines (GPT-3 appendix C,
The Pile, LLaMA): a training document is *contaminated* if it shares at
least one word n-gram (n typically 8-13) with any benchmark/eval
document. This module implements it Spark-first:

* benchmark side -> a DISTINCT set of n-grams, broadcast;
* corpus side -> explode each doc's distinct grams ONCE, equi-join on
  the RAW GRAM STRING against the broadcast set. The broadcast hash
  join hashes the key internally, so pre-hashing every corpus gram
  (the earlier md5-half design) paid one digest per gram for nothing —
  string equality is exactly as cross-engine-deterministic and has no
  collision window. :func:`benchmark_ngram_keys` still exposes the
  compact 64-bit md5-half key form for callers that persist or ship
  key sets.

Scale shape: the benchmark set is the tiny side by construction (eval
suites are MBs against a 100-TB corpus) — ``F.broadcast`` keeps the
corpus un-shuffled; the only wide exchange is the per-doc hit-count
aggregate on the (uniform) doc id, and only for docs that hit at all.
The heavy gram build/explode runs after a widen-only repartition of
the raw (id, text) rows, so a narrowly-partitioned batch still uses
every core.

Not in the reference (it has no text pipeline); extends the engine for
the training-data use case alongside operators/dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_ngrams
from .dedup import _md5_half, _spread


def _exact_word_ngrams(text, n: int):
    """Word n-grams of EXACTLY n words; docs shorter than n words yield
    an empty array (they cannot be contaminated — unlike
    functions.text.word_ngrams, which falls back to the whole text as
    one shingle for MinHash's benefit)."""
    grams = word_ngrams(text, n)
    nw = F.size(F.split(F.lower(F.trim(text)), r"\s+"))
    return F.when(nw >= n, grams).otherwise(F.array().cast("array<string>"))


def benchmark_ngram_keys(
    bench: DataFrame, n: int = 8, text_col: str = "text"
) -> DataFrame:
    """Distinct 64-bit n-gram keys (columns ``gk1``/``gk2``, the two
    md5 halves) of the benchmark set."""
    return (
        bench.select(
            F.explode(
                F.array_distinct(_exact_word_ngrams(F.col(text_col), n))
            ).alias("g")
        )
        .select(
            _md5_half(F.col("g"), 0).alias("gk1"),
            _md5_half(F.col("g"), 1).alias("gk2"),
        )
        .distinct()
    )


def contamination_hits(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    parallelism: int | None = None,
) -> DataFrame:
    """(id, doc_grams, hit_grams, hit_frac) for every CONTAMINATED doc.

    ``doc_grams`` counts the doc's distinct n-grams, ``hit_grams`` how
    many of them appear anywhere in the benchmark set; docs with zero
    hits are absent (join is inner against the broadcast key set).

    The join key is the raw gram STRING (round-4, bench-found): the
    previous md5-half keying paid one md5 digest per corpus gram —
    ~10M digests on a 5k-doc batch, the stage's dominant cost — only to
    build a key the broadcast hash join would re-hash anyway. String
    equality is exactly as cross-engine-deterministic, strictly MORE
    exact (no 64-bit collision window), and the broadcast grows only
    from 16 bytes to the gram text (benchmark sets are small by
    definition). ``benchmark_ngram_keys`` remains for callers that want
    the compact md5 key form."""
    keys = (
        bench.select(
            F.explode(
                F.array_distinct(_exact_word_ngrams(F.col(text_col), n))
            ).alias("g")
        )
        .distinct()
    )
    # _spread BEFORE the gram projection (round-4, bench-found): Spark
    # evaluates projection expressions on the MAP side of the
    # repartition they feed, so spreading the already-built gram arrays
    # still computed every gram on however few partitions the corpus
    # arrived in (1 small file = 1 task doing all the n-gram work).
    # Spreading the raw (id, text) rows first puts the heavy
    # build-distinct-explode work after the exchange, on all cores —
    # the minhash_signatures discipline (dedup.py:161).
    doc_grams = (
        _spread(
            docs.select(F.col(id_col).alias("id"), F.col(text_col)), parallelism
        )
        .select(
            "id",
            F.array_distinct(_exact_word_ngrams(F.col(text_col), n)).alias("_gs"),
        )
        .select("id", F.size("_gs").alias("doc_grams"), F.explode("_gs").alias("g"))
    )
    hits = (
        doc_grams.join(F.broadcast(keys), "g")
        .groupBy("id", "doc_grams")
        .agg(F.count(F.lit(1)).alias("hit_grams"))
    )
    return hits.select(
        "id",
        "doc_grams",
        "hit_grams",
        (F.col("hit_grams") / F.col("doc_grams")).alias("hit_frac"),
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The clean corpus: ``docs`` minus docs with >= ``min_hits``
    benchmark-overlapping n-grams. Anti-join on the (narrow) hit list,
    so the doc payload is never shuffled."""
    bad = (
        contamination_hits(docs, bench, n, text_col, id_col)
        .filter(F.col("hit_grams") >= min_hits)
        .select(F.col("id").alias(id_col))
    )
    return docs.join(bad, id_col, "left_anti")
