"""Distributed BPE tokenizer training (Sennrich, Haddow & Birch,
ACL 2016) — the subword-vocabulary induction step of every LLM data
pipeline, expressed Spark-first.

Algorithm (word-level BPE, the GPT-2/sentencepiece trainer shape):

1. ONE pass over the corpus collapses it to the word-frequency table —
   every later iteration works on the vocabulary, which is orders of
   magnitude smaller than the corpus (exactly how production trainers
   scale; the corpus is never touched again).
2. Each word is a symbol sequence, initially characters, stored as a
   space-delimited sentinel-wrapped string (`` a b c ``) — symbols are
   ``[a-z0-9]+`` concatenations so the space delimiter can never occur
   inside one.
3. Per merge step: adjacent-pair counts weighted by word frequency
   (one explode + one hash aggregate over the VOCAB), the argmax pair
   under the deterministic key (count DESC, left ASC, right ASC) — a
   one-row driver collect, the pagerank-loop scalar pattern — then the
   merge applied to every word by the SPACE-DOUBLING replace: double
   every delimiter, single-pass-replace `` l  r `` -> `` lr ``, then
   un-double. A naive ``replace(' l r ', ' lr ')`` is NOT greedy BPE —
   consecutive occurrences share a delimiter, so ``h a h a`` would
   yield ``ha h a`` instead of ``ha ha``; with doubled delimiters the
   needles stop overlapping and the single-pass replace merges exactly
   the greedy left-to-right pairing (property-tested against the
   greedy walker over 25k random symbol runs, and pinned identical
   across Spark and DuckDB replace()). Pair COUNTS include overlapping
   adjacencies (``a a a`` counts (a,a) twice) — the standard trainer
   convention, replicated verbatim by the oracle.
4. Per-step ``localCheckpoint`` keeps the iterated plan flat (the
   pagerank/CC lineage discipline).

Everything is integer counts + string surgery — no floats anywhere —
so the whole merge table is bit-reproducible, and the DuckDB oracle
re-runs the identical data-dependent loop as generated unrolled CTE
stages (``__spark_entry__._bpe_oracle_sql``), argmax included.

Scale shape: corpus → vocab is the only big shuffle (explode + hash
aggregate on the word key); each merge step shuffles PAIR counts
(thousands of rows) and maps over the vocab table. n_merges is the
iteration count exactly as in any BPE trainer. Words are restricted to
``[a-z0-9]+`` in the cross-engine contract (Java vs RE2 '.'-semantics
diverge on surrogate pairs; the operator itself is byte-agnostic if
you relax the filter in Spark-only use).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WORD_RE = "^[a-z0-9]+$"


def word_frequencies(
    docs: DataFrame, text_col: str = "text", word_re: str = WORD_RE
) -> DataFrame:
    """Corpus → (word, freq): the one corpus-sized pass."""
    return (
        docs.select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("word")
        )
        .where(F.col("word").rlike(word_re))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _init_state(words: DataFrame) -> DataFrame:
    """(word, freq) → (seq, freq): sentinel-wrapped char sequence."""
    return words.select(
        F.concat(
            F.lit(" "), F.regexp_replace(F.col("word"), "(.)", "$1 ")
        ).alias("seq"),
        "freq",
    )


def _apply_merge(seq, l: str, r: str):
    """Greedy left-to-right merge of pair (l, r) via the space-doubling
    replace (see module docstring): doubled delimiters make consecutive
    pair occurrences non-overlapping, so ONE single-pass replace merges
    exactly the greedy pairing; the final un-double restores the
    sentinel form (gaps are only ever 1 or 2 spaces, so one pass
    suffices)."""
    doubled = F.replace(seq, F.lit(" "), F.lit("  "))
    merged = F.replace(
        doubled, F.lit(f" {l}  {r} "), F.lit(f" {l}{r} ")
    )
    return F.replace(merged, F.lit("  "), F.lit(" "))


def _pair_counts(state: DataFrame) -> DataFrame:
    """Adjacent-pair counts over the vocab, weighted by word freq."""
    syms = F.filter(F.split(F.col("seq"), " "), lambda s: s != "")
    pairs = F.filter(
        F.zip_with(
            syms,
            F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
            lambda l, r: F.struct(l.alias("l"), r.alias("r")),
        ),
        lambda p: p["r"].isNotNull(),
    )
    return (
        state.select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("freq").alias("pair_count"))
    )


MERGE_SCHEMA = "step int, left string, right string, merged string, pair_count bigint"


def _train_in_driver(
    word_freqs: dict[str, int], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """In-memory merge loop over a driver-held (word, freq) table —
    identical conventions to the distributed loop (overlapping
    adjacencies counted, greedy left-to-right application, tie-break
    count DESC / left ASC / right ASC; symbols are ASCII ``[a-z0-9]+``
    so Python str ordering == Spark UTF8String binary ordering)."""
    state: dict[tuple[str, ...], int] = {}
    for w, f in word_freqs.items():
        key = tuple(w)
        state[key] = state.get(key, 0) + f
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in state.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (l, r), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, l, r, l + r, cnt))
        new_state: dict[tuple[str, ...], int] = {}
        for syms, f in state.items():
            out: list[str] = []
            i = 0
            n = len(syms)
            while i < n:
                if i + 1 < n and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_state[key] = new_state.get(key, 0) + f
        state = new_state
    return merges


def bpe_train(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    word_re: str = WORD_RE,
    driver_vocab_rows: int | None = 2_000_000,
) -> DataFrame:
    """Train ``n_merges`` BPE merges; returns the ordered merge table
    (step, left, right, merged, pair_count) — the tokenizer artifact.

    Stops early if no pair remains (fully merged vocabulary).

    After the one corpus pass collapses to (word, freq), the merge loop
    is vocabulary-sized work — and a production tokenizer is 30-50k
    merges, so paying one Spark job + localCheckpoint per merge is tens
    of thousands of driver round-trips of pure scheduling latency. When
    the distinct vocabulary fits the driver (≤ ``driver_vocab_rows``;
    real corpora collapse to a few million words), it is collected ONCE
    and the merges run in-memory — bit-identical output (pinned by
    ``test_bpe.py`` against the distributed loop), hours faster. The
    distributed per-merge loop remains for genuinely giant vocabularies
    (or ``driver_vocab_rows=None`` to force it)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    words = word_frequencies(docs, text_col, word_re).localCheckpoint()
    if (
        driver_vocab_rows is not None
        and words.count() <= driver_vocab_rows
    ):
        freqs = {r["word"]: r["freq"] for r in words.collect()}
        return spark.createDataFrame(
            _train_in_driver(freqs, n_merges), MERGE_SCHEMA
        )
    state = _init_state(words)
    state = state.localCheckpoint()
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, n_merges + 1):
        best = (
            _pair_counts(state)
            .orderBy(
                F.col("pair_count").desc(),
                F.col("left").asc(),
                F.col("right").asc(),
            )
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, cnt = best[0]["left"], best[0]["right"], best[0]["pair_count"]
        merges.append((step, l, r, l + r, cnt))
        state = state.select(
            _apply_merge(F.col("seq"), l, r).alias("seq"), "freq"
        ).localCheckpoint()
    return spark.createDataFrame(merges, MERGE_SCHEMA)


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    word_re: str = WORD_RE,
) -> DataFrame:
    """Apply a trained merge list to segment text into BPE tokens
    (per-word, merge order = training order — the standard encoder).
    Adds ``out_col`` as array<string>; non-matching words pass through
    as whole tokens."""
    return df.withColumn(
        out_col,
        F.flatten(
            F.transform(
                F.filter(
                    F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda w: w != "",
                ),
                lambda w: F.filter(
                    F.split(
                        _seq_for(w, merges, word_re), " "
                    ),
                    lambda s: s != "",
                ),
            )
        ),
    )


def _seq_for(word, merges: list[tuple[str, str]], word_re: str):
    seq = F.when(
        word.rlike(word_re),
        F.concat(F.lit(" "), F.regexp_replace(word, "(.)", "$1 ")),
    ).otherwise(F.concat(F.lit(" "), word, F.lit(" ")))
    for l, r in merges:
        seq = _apply_merge(seq, l, r)
    return seq
