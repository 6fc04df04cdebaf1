"""Fuzzy string matching at corpus scale: edit-distance-1 term pairs
via the SymSpell deletion-variant join.

The classic spell/typo miner (Garbe's SymSpell, public domain; the
deletion-neighborhood trick goes back to Mor & Fraenkel, CACM 1982):
instead of the O(V^2) all-pairs Levenshtein over the vocabulary, every
term emits its |term|+1 deletion variants (itself plus each
one-character deletion), candidates are the pairs sharing a variant
key, and ONLY candidates pay a Levenshtein verification. Two terms at
edit distance 1 (insert/delete/substitute) ALWAYS share a key — b a
deletion of a shares b itself; a substitution pair shares the variant
with the differing position deleted — so recall is exact; the join
overgenerates (e.g. transposition pairs at distance 2 share keys) and
the verify step keeps precision exact.

Everything is integer/string: variant generation is pure string
surgery, the verifier is the built-in ``levenshtein`` (an integer DP
both Spark and DuckDB implement identically), so results are
bit-reproducible and oracle-checkable.

Scale shape: vocabulary-sized, never corpus-sized — the corpus
collapses to (term, freq) first (the BPE/vocab_growth discipline).
One explode multiplies the vocab by ~avg_len; the join key is a
near-uniform string (a variant key collides only across the ≤
alphabet-size terms that generate it), so no skew; the Levenshtein
DP runs on the candidate pairs only. ``max_len`` bounds the explode
for pathological tokens.

Use: typo detection (a high-frequency term paired with a rare edit-1
neighbor flags the rare one as a likely misspelling), query expansion,
OCR cleanup. No reference counterpart; part of the training-data
operator family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_keys(term: Column) -> Column:
    """The term plus its one-character-deletion variants, as an array.
    ``concat(substr(1, i-1), substr(i+1, len-i))`` for each position i."""
    n = F.length(term)
    return F.concat(
        F.array(term),
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat(
                term.substr(F.lit(1), i - 1), term.substr(i + 1, n - i)
            ),
        ),
    )


def edit1_pairs(
    vocab: DataFrame,
    term_col: str = "term",
    freq_col: str = "freq",
    min_len: int = 4,
    max_len: int = 24,
) -> DataFrame:
    """All term pairs at Levenshtein distance exactly 1 where at least
    one side's length falls in [``min_len``, ``max_len``], with both
    frequencies: (term_hi, freq_hi, term_lo, freq_lo) where hi is the
    more frequent side (frequency DESC, term ASC decides; a typo is
    the rare side).

    ``min_len`` drops short terms (edit-1 neighbors of 1-3 char terms
    are mostly legitimate words, and their deletion keys are the
    hottest); ``max_len`` bounds the variant explode. Because an edit-1
    pair's lengths differ by at most one, the KEYING side admits
    [min_len-1, max_len+1] and the range gate applies to the reported
    PAIR — so a len-``min_len`` term still finds its len-``min_len``-1
    deletion neighbor (pairs straddling the boundary are kept, not
    silently dropped).
    """
    if not 1 <= min_len <= max_len:
        raise ValueError(f"need 1 <= min_len <= max_len, got {min_len}, {max_len}")
    t = F.col(term_col)
    base = vocab.where(
        t.isNotNull()
        & (F.length(t) >= max(min_len - 1, 1))
        & (F.length(t) <= max_len + 1)
    ).select(t.alias("term"), F.col(freq_col).alias("freq"))
    keyed = base.select(
        "term", "freq", F.explode(deletion_keys(F.col("term"))).alias("key")
    )
    a = keyed.select(
        F.col("key"),
        F.col("term").alias("term_a"),
        F.col("freq").alias("freq_a"),
    )
    b = keyed.select(
        F.col("key"),
        F.col("term").alias("term_b"),
        F.col("freq").alias("freq_b"),
    )
    cand = (
        a.join(b, "key")
        .where(F.col("term_a") < F.col("term_b"))
        .select("term_a", "freq_a", "term_b", "freq_b")
        .distinct()
    )
    def _in_range(c: Column) -> Column:
        return (F.length(c) >= min_len) & (F.length(c) <= max_len)

    verified = cand.where(
        F.levenshtein(F.col("term_a"), F.col("term_b")) == 1
    ).where(_in_range(F.col("term_a")) | _in_range(F.col("term_b")))
    hi_is_a = (F.col("freq_a") > F.col("freq_b")) | (
        (F.col("freq_a") == F.col("freq_b"))
        & (F.col("term_a") < F.col("term_b"))
    )
    return verified.select(
        F.when(hi_is_a, F.col("term_a")).otherwise(F.col("term_b")).alias(
            "term_hi"
        ),
        F.when(hi_is_a, F.col("freq_a")).otherwise(F.col("freq_b")).alias(
            "freq_hi"
        ),
        F.when(hi_is_a, F.col("term_b")).otherwise(F.col("term_a")).alias(
            "term_lo"
        ),
        F.when(hi_is_a, F.col("freq_b")).otherwise(F.col("freq_a")).alias(
            "freq_lo"
        ),
    )
