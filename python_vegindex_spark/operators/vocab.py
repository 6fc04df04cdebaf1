"""Corpus vocabulary statistics: Heaps-law growth and inverted-index
postings.

The reference has no text machinery (it is an image-GCC pipeline), but
a training-data engine over transcript/document corpora needs the two
classic corpus-level builds:

* :func:`vocab_growth` — vocabulary growth curve (Heaps' law
  ``V(n) ~ K * n^beta``): how many NEVER-SEEN-BEFORE terms each
  ingestion batch contributes, plus the cumulative vocabulary size.
  The curve is the standard corpus-health diagnostic — a near-dup-heavy
  crawl flattens early, a language-mix shift bends it upward.
* :func:`postings_index` — the inverted index build (term ->
  document-frequency, collection term-frequency, and an order-free
  postings checksum over every ``(doc, position)`` occurrence). This is
  the batch shape of a search/BM25 index refresh; the checksum stands
  in for the serialized postings list so the whole build is value-
  checkable without shipping gigabytes to the driver.

Scale shape (both): ONE explode of the tokenizer output and ONE
corpus-sized hash aggregate — keyed by term for the postings build,
by (term, batch) for the growth curve — term keys are near-uniform
under hashing, so the shuffle has no hot key even when the corpus has
hot documents. Everything downstream of that first aggregate is
vocabulary-sized or batch-count-sized, and the only window runs over
the batch rows (corpus_size / batch_size of them), never the corpus.

Exactness discipline: everything here is INTEGER (counts, min doc ids,
position checksums) — no floats anywhere, so the DuckDB oracle
comparison is trivially bit-exact (SURVEY §8 house rules).

Tokenizer: whitespace split of ``lower(trim(text))`` — the engine-wide
rule shared with operators/terms (TF-IDF, BM25) and functions/text, and
mirrored in the oracles as ``regexp_split_to_array(..., '\\s+')``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tokenize_positions(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 1,
) -> DataFrame:
    """Explode documents into ``(id_col, pos, term)`` with 1-based
    positions (pre-filter positions: a dropped short token still
    advances the counter, matching ``generate_subscripts`` over the
    raw split array in the oracle)."""
    return (
        df.select(
            F.col(id_col),
            F.posexplode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("pos0", "term"),
        )
        .where(F.length("term") >= int(min_len))
        .select(
            id_col, (F.col("pos0") + 1).cast("long").alias("pos"), "term"
        )
    )


def vocab_growth(
    df: DataFrame,
    batch_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 1,
) -> DataFrame:
    """Heaps-law vocabulary growth over ingestion order.

    ``id_col`` is the ingestion order (a monotone doc id / row
    sequence); a *batch* is ``batch_size`` consecutive docs. A term
    belongs to the batch of the FIRST document that contains it
    (``min(doc_id)`` per term — one hash aggregate, map-side combined).

    Output per batch: ``batch`` (index), ``first_doc`` (batch start
    id), ``new_terms``, ``cum_vocab``, ``tokens`` (token occurrences
    contributed by the batch's docs), ``cum_tokens``. The cumulative
    sums run over the BATCH rows only (corpus_size / batch_size rows),
    never the corpus.
    """
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    toks = tokenize_positions(df, id_col, text_col, min_len)
    # INTEGER `div`, not float-divide-then-cast: exact at any id
    # magnitude (Spark `div` truncates, DuckDB `//` floors — identical
    # for the non-negative ids this takes; SURVEY §8).
    batch_of = F.expr(f"`{id_col}` div {int(batch_size)}")

    # the ONE corpus-sized pass: occurrences per (term, batch). A
    # term's first batch == the batch of its min doc id (batch is
    # monotone in doc id), so both downstream aggregates — new terms
    # per batch AND token volume per batch — read this vocabulary×
    # batch-sized table, and the raw corpus is exploded exactly once.
    # pinned (house rule, SURVEY §8): two consumers below — without
    # the checkpoint each would re-run the corpus explode
    per_term_batch = (
        toks.groupBy(F.col("term"), batch_of.alias("batch"))
        .agg(F.count(F.lit(1)).cast("long").alias("occ"))
        .localCheckpoint(eager=True)
    )

    new_per_batch = (
        per_term_batch.groupBy("term")
        .agg(F.min("batch").alias("batch"))
        .groupBy("batch")
        .agg(F.count(F.lit(1)).cast("long").alias("new_terms"))
    )
    tok_per_batch = per_term_batch.groupBy("batch").agg(
        F.sum("occ").cast("long").alias("tokens")
    )
    w = (
        Window.orderBy("batch")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tok_per_batch.join(new_per_batch, on="batch", how="left")
        .na.fill({"new_terms": 0})
        .select(
            F.col("batch"),
            (F.col("batch") * F.lit(int(batch_size))).cast("long").alias("first_doc"),
            "new_terms",
            F.sum("new_terms").over(w).cast("long").alias("cum_vocab"),
            "tokens",
            F.sum("tokens").over(w).cast("long").alias("cum_tokens"),
        )
    )


#: multiplier for the (doc, pos) occurrence checksum. Bound documented
#: in :func:`postings_index`; shared with the DuckDB oracle.
_CHECKSUM_MULT = 100_003


def postings_index(
    df: DataFrame,
    k: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 1,
) -> DataFrame:
    """Inverted-index build: per term the document frequency ``df``,
    collection term frequency ``tf``, and an order-free BIGINT
    checksum over every occurrence ``sum(doc_id * 100003 + pos)`` —
    a value-level stand-in for the serialized postings list (any
    dropped/duplicated/moved occurrence changes it).

    Overflow bound: safe while ``tf_per_term * (max_doc_id * 100003 +
    max_pos) < 2^63`` — e.g. 10^9 docs x 100-term postings stay below
    10^16 per occurrence only for doc ids < 10^11; at larger ids hash
    the doc id down first. At this engine's bench scales the margin is
    ~6 orders of magnitude.

    ``k``: keep only the top-k terms by (df DESC, tf DESC, term ASC) —
    the deterministic integer rank key (never a float). ``k=None``
    returns the full index (the real sink path).
    """
    if k is not None and k < 1:
        raise ValueError(f"k must be >= 1 or None, got {k}")
    toks = tokenize_positions(df, id_col, text_col, min_len)
    idx = toks.groupBy("term").agg(
        F.countDistinct(id_col).cast("long").alias("df"),
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.sum(
            F.col(id_col).cast("long") * F.lit(_CHECKSUM_MULT) + F.col("pos")
        ).cast("long").alias("postings_checksum"),
    )
    if k is None:
        return idx
    # global top-k via orderBy().limit() — Spark plans this as
    # TakeOrderedAndProject (per-partition top-k, then a merge of only
    # k·n_partitions rows), never a vocabulary-sized single-partition
    # sort. The row_number window then ranks the k survivors only.
    order = (
        F.col("df").desc(), F.col("tf").desc(), F.col("term").asc()
    )
    top = idx.orderBy(*order).limit(int(k))
    return top.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order)).cast("long")
    ).select("rank", "term", "df", "tf", "postings_checksum")
