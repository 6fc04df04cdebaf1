"""Gopher/C4-style document quality + repetition filters.

The published heuristic gates every large text-corpus pipeline applies
before training (Gopher, Rae et al. 2021 Table A1; C4, Raffel et al.
2020): word-count band, mean word length band, symbol-to-word ratio,
alphabetic-word fraction, stopword floor, duplicate-line fraction, and
repeated-n-gram dominance. Two operators:

* :func:`gopher_flags` — every gate that is a pure per-row expression:
  ONE projection, zero shuffles, whole-stage codegen; rides the scan at
  any scale. This is the 100-TB hot path — a quality pass over the full
  corpus should cost exactly one read.
* :func:`top_ngram_fraction` — the repetition gate (fraction of the doc
  covered by its single most frequent word n-gram) needs a per-doc
  modal count: explode distinct-counted grams, two-stage hash aggregate
  keyed on (doc, gram) then doc — partial aggregation map-side, shuffle
  rows bounded by distinct grams, never a window over raw text.

Thresholds default to Gopher's published values; every computed measure
is returned alongside its flag so callers can re-gate without a second
scan. Not in the reference (no text pipeline there) — part of the
training-data operator family (dedup / decontam / sampling / packing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import LANG_STOPWORDS, word_ngrams

# Gopher Table A1 defaults
MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MAX_SYMBOL_WORD_RATIO = 0.1
MIN_ALPHA_WORD_FRAC = 0.80
MIN_STOPWORDS = 2
MAX_DUP_LINE_FRAC = 0.30
MAX_TOP2GRAM_FRAC = 0.20


def _occurrences(text: Column, needle: str) -> Column:
    """Non-overlapping occurrence count via length difference — a pure
    string expression both Spark and ANSI SQL evaluate identically."""
    return (
        F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))
    ) / len(needle)


def gopher_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = MIN_WORDS,
    max_words: int = MAX_WORDS,
) -> DataFrame:
    """Per-doc quality measures + pass/fail flags, one shuffle-free
    projection. Returns (id, n_words, mean_word_len, symbol_ratio,
    alpha_word_frac, n_stopwords, dup_line_frac, ok_* flags, keep)."""
    t = F.col(text_col)
    words = F.split(F.trim(t), r"\s+")
    # NULL text -> n_words 0 (Spark's size(NULL) is -1, never let that
    # leak into measures); empty/whitespace-only text also 0
    nw = F.when(
        F.coalesce(F.length(F.trim(t)), F.lit(0)) == 0, F.lit(0)
    ).otherwise(F.size(words))
    total_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mean_wl = F.when(nw > 0, total_chars / nw)
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    alpha_frac = F.when(nw > 0, n_alpha / nw)
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    # NULL-safe: size(filter(NULL)) is -1; report NULL like SQL engines
    n_sw = F.when(
        t.isNotNull(),
        F.size(F.filter(words, lambda w: F.array_contains(sw, F.lower(w)))),
    )
    symbol_ratio = F.when(
        nw > 0, (_occurrences(t, "#") + _occurrences(t, "...")) / nw
    )
    lines = F.split(t, "\n")
    dup_line_frac = F.when(
        F.size(lines) > 0,
        (F.size(lines) - F.size(F.array_distinct(lines))) / F.size(lines),
    )

    d = docs.select(
        F.col(id_col).alias("id"),
        nw.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        n_sw.alias("n_stopwords"),
        dup_line_frac.alias("dup_line_frac"),
    )
    flags = d.select(
        "*",
        F.col("n_words").between(min_words, max_words).alias("ok_words"),
        (
            F.col("mean_word_len").between(MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN)
        ).alias("ok_word_len"),
        (F.col("symbol_ratio") <= MAX_SYMBOL_WORD_RATIO).alias("ok_symbols"),
        (F.col("alpha_word_frac") >= MIN_ALPHA_WORD_FRAC).alias("ok_alpha"),
        (F.col("n_stopwords") >= MIN_STOPWORDS).alias("ok_stopwords"),
        (F.col("dup_line_frac") <= MAX_DUP_LINE_FRAC).alias("ok_dup_lines"),
    )
    keep = (
        F.col("ok_words")
        & F.col("ok_word_len")
        & F.col("ok_symbols")
        & F.col("ok_alpha")
        & F.col("ok_stopwords")
        & F.col("ok_dup_lines")
    )
    return flags.select("*", F.coalesce(keep, F.lit(False)).alias("keep"))


def top_ngram_fraction(
    docs: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc dominance of the single most frequent word n-gram.

    Returns (id, n_grams, top_cnt, top_gram, top_char_frac, ok_top_ngram)
    where ``top_char_frac`` is Gopher's measure: characters covered by
    all occurrences of the modal n-gram over the doc's normalized
    length. Ties break to the lexicographically smallest gram (the
    min-struct makes the answer deterministic and engine-independent).
    Docs shorter than n words have no n-gram and are omitted — they are
    gated by ``ok_words`` in :func:`gopher_flags`, not here."""
    t = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    nw = F.size(F.split(t, " "))
    grams = docs.select(
        F.col(id_col).alias("id"),
        F.length(t).alias("_len"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("g"),
    ).where(nw >= n)
    per_gram = grams.groupBy("id", "_len", "g").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    top = per_gram.groupBy("id", "_len").agg(
        F.sum("cnt").alias("n_grams"),
        F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("g").alias("g"))).alias(
            "_top"
        ),
    )
    frac = (-F.col("_top.nc")) * F.length("_top.g") / F.col("_len")
    return top.select(
        "id",
        "n_grams",
        (-F.col("_top.nc")).alias("top_cnt"),
        F.col("_top.g").alias("top_gram"),
        frac.alias("top_char_frac"),
        (frac <= MAX_TOP2GRAM_FRAC).alias("ok_top_ngram"),
    )
