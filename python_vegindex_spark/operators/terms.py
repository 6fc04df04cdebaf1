"""Corpus term analytics: top terms per source with TF-IDF scores.

The standard "what characterizes each slice of my corpus" monitor a
pipeline owner runs per ingest batch. House tokenization (whitespace
split of lowercased text, the same rule functions/text and the
decontamination grams use) so term statistics line up with the other
text operators.

Scale shape: one explode of the corpus into words, then two hash
aggregates — tf on (source, term), document frequency on term after a
(doc, term) distinct — joined back on the term key and ranked with a
per-source window over the SMALL aggregate (terms, not words). All
keys are uniform hash keys; the word stream is the corpus-sized pass
any engine must make.

Cross-engine determinism: the ranking key is (tf DESC, df ASC, term
ASC) — pure integers + a string — so the selected rows never depend on
a float; the tf-idf score itself (smooth idf, sklearn convention
``ln((N+1)/(df+1)) + 1``) is a reported VALUE, rounded to 6 dp.

Not in the reference (no text pipeline there) — part of the
training-data operator family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 3,
) -> DataFrame:
    """Top ``k`` terms per source: (source, rank, term, tf, df, tfidf).

    ``tf`` counts occurrences within the source; ``df`` counts DISTINCT
    documents containing the term corpus-wide; terms shorter than
    ``min_len`` characters are dropped (articles/punctuation noise).
    Rank is deterministic on (tf DESC, df ASC, term ASC).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    words = docs.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("source"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "term"
        ),
    ).where(F.length("term") >= min_len)
    tf = words.groupBy("source", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = (
        words.select("id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("_n") + F.lit(1)).cast("double")
                        / (F.col("df") + F.lit(1)).cast("double")
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("source", "rank", "term", "tf", "df", "tfidf")
    )
