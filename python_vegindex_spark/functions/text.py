"""Text-analysis column expressions for document/transcript tables.

All pure ``pyspark.sql.functions`` expressions (JVM-side, codegen-
friendly) — token counting, quality scoring, n-gram shingles, language
ID heuristic, rolling-hash fingerprinting. No Python UDFs.

These extend the engine beyond the reference (which has no text ops)
for large-scale training-data pipelines; they operate on the driver's
``documents`` table or any string column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword seeds for the n-gram/stopword language heuristic
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "se", "del", "las"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "une"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "im"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for blank strings)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-flavored token estimate: word pieces + digits + punctuation
    counted separately (a regex proxy for subword tokenization)."""
    pieces = F.split(
        F.trim(text), r"(?<=\W)|(?=\W)"
    )  # split at word/non-word boundaries
    return F.size(F.filter(pieces, lambda p: F.trim(p) != ""))


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^\p{Punct}]", "")
    return F.when(F.length(text) > 0, F.length(stripped) / F.length(text)).otherwise(
        F.lit(0.0)
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    words = F.split(F.lower(F.trim(text)), r"\s+")
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    n_sw = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    return F.when(F.size(words) > 0, n_sw / F.size(words)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + punctuation sanity
    + stopword presence (English-seeded). Deterministic, JVM-only."""
    toks = token_count(text)
    len_ok = F.when((toks >= 10) & (toks <= 10_000), 1.0).otherwise(
        F.when(toks > 0, 0.3).otherwise(0.0)
    )
    p = punct_ratio(text)
    punct_ok = F.when(p <= 0.2, 1.0).otherwise(F.greatest(F.lit(0.0), 1.0 - (p - 0.2) * 4))
    sw_ok = F.least(F.lit(1.0), stopword_ratio(text) * 10.0)
    return F.round(0.5 * len_ok + 0.3 * punct_ok + 0.2 * sw_ok, 6)


def lang_id(text: Column) -> Column:
    """Stopword-vote language heuristic over {en,es,fr,de}, 'und' if no vote."""
    words = F.split(F.lower(F.trim(text)), r"\s+")
    votes = {}
    for lang, sws in LANG_STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in sws])
        votes[lang] = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    best = F.greatest(*votes.values())
    out = F.lit("und")
    # deterministic priority order on ties: en > es > fr > de (first match)
    for lang in ("de", "fr", "es", "en"):
        out = F.when((votes[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def char_ngrams(text: Column, n: int = 5) -> Column:
    """Array of lowercase character n-grams (shingles) — input to MinHash."""
    t = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    idx = F.sequence(F.lit(0), F.greatest(F.length(t) - n, F.lit(0)))
    return F.when(
        F.length(t) >= n,
        F.transform(idx, lambda i: t.substr(i + 1, F.lit(n))),
    ).otherwise(F.array(t))


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Array of word n-grams joined by single spaces."""
    words = F.split(F.lower(F.trim(text)), r"\s+")
    cnt = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    return F.when(
        cnt >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, n), " ")),
    ).otherwise(F.array(F.array_join(words, " ")))


def fingerprint64(text: Column) -> Column:
    """64-bit document fingerprint (xxhash of normalized text) — the
    deterministic exact-dup key."""
    return F.xxhash64(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))
