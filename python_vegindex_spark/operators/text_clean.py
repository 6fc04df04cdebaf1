"""Corpus text cleaning: global boilerplate-line removal + PII scrubbing.

Two standard pre-training cleanup passes every large text pipeline runs
(CCNet, Wenzek et al. 2020 §4.1 line-level dedup; C4/RefinedWeb
boilerplate stripping; PII redaction per the standard corpus-release
checklists):

* :func:`strip_boilerplate_lines` — a line that appears (normalized) in
  at least ``min_docs`` DISTINCT documents is boilerplate (nav bars,
  cookie banners, license footers) and is removed from every document,
  preserving the order of the surviving lines.
* :func:`scrub_pii` — regex redaction of emails / IPv4 addresses /
  international phone numbers with per-document match counts. A pure
  per-row projection: zero shuffles, rides the scan, whole-stage
  codegen. The patterns are written in the Java∩RE2 common dialect so
  DuckDB (RE2) reproduces them bit-identically for the oracle.

Scale shape of the line pass: the document payload is DECOMPOSED into
its lines once (posexplode) — the stream then shuffles twice, first on
the 128-bit line key (uniform by construction: it is a hash) for the
global distinct-doc count, then on doc_id for reassembly. The full
document text never travels alongside its lines, and the boilerplate
key list joins as a narrow (key)-only semi side. At 100 TB the line
stream is the same order of bytes as the corpus — both shuffles are
unavoidable for a *global* line frequency (any engine must see every
line under its key once) and both keys are uniform, so the job is
bandwidth-shaped with no skew surprise.

Not in the reference (no text pipeline there) — part of the
training-data operator family (dedup / decontam / quality / sampling /
packing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LINE_SEP = "\n"

# Patterns in the Java-regex ∩ RE2 common dialect (no backrefs, no
# lookaround), so Spark and DuckDB/RE2 match identical spans. Ordered:
# emails are scrubbed before IPv4 so a dotted host inside an address is
# consumed by the email token, never double-redacted.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{9,15}\b",
}


def norm_line(line: Column) -> Column:
    """Case/whitespace-normalized form a line is COUNTED under (the
    removal keeps the original rendering)."""
    return F.lower(F.regexp_replace(F.trim(line), r"\s+", " "))


def line_key(line: Column) -> Column:
    """Engine-portable 128-bit key of the normalized line; NULL for
    blank lines (blank lines are structure, never boilerplate)."""
    n = norm_line(line)
    return F.when(F.length(n) > 0, F.md5(n))


def doc_lines(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, pos, line, line_key): one row per physical line, in order."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), LINE_SEP)).alias("pos", "line"),
    ).withColumn("line_key", line_key(F.col("line")))


def boilerplate_lines(
    lines: DataFrame, min_docs: int = 5
) -> DataFrame:
    """(line_key, n_docs) for normalized lines present in >= ``min_docs``
    distinct documents. Input is :func:`doc_lines` output (pass the
    same DataFrame the strip step uses, so one decomposition serves
    both)."""
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    return (
        lines.where(F.col("line_key").isNotNull())
        .select("id", "line_key")
        .distinct()
        .groupBy("line_key")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate_lines(
    docs: DataFrame,
    min_docs: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove every occurrence of boilerplate lines from every document.

    Returns ``docs``'s id column plus ``n_lines`` (original physical
    lines), ``n_kept`` (surviving lines) and ``text`` rebuilt from the
    survivors in original order (``''`` when everything was
    boilerplate). Blank lines always survive (they carry document
    structure and a blank line shared across docs is not boilerplate
    evidence).

    The exploded line stream feeds both the boilerplate count and the
    anti-join, so this plan scans ``docs`` twice; at the 100-TB design
    point materialize ``docs`` (or :func:`doc_lines`) first — exactly
    what plans/corpus.run_corpus_pipeline's stage materialization does
    for its other multi-read stage (fuzzy dedup)."""
    lines = doc_lines(docs, text_col, id_col)
    boiler = boilerplate_lines(lines, min_docs).select("line_key")
    # left_anti on a NULL key never matches -> blank lines fall through
    kept = lines.join(boiler, "line_key", "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            LINE_SEP,
        ).alias("text"),
    )
    # size(split(NULL)) is -1 in Spark — a NULL text has zero lines
    base = docs.select(
        F.col(id_col).alias("id"),
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(F.size(F.split(F.col(text_col), LINE_SEP)))
        .alias("n_lines"),
    )
    return (
        base.join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text", F.lit("")).alias(text_col),
        )
    )


def scrub_pii(
    docs: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Redact PII spans; append per-kind match counts.

    Counts (``n_<kind>``) are measured on the ORIGINAL text per pattern
    independently; the replacement then runs sequentially in
    ``patterns`` order (email first by default, so dotted hosts inside
    addresses are consumed whole). ``text_col`` is replaced with the
    scrubbed rendering, each span becoming ``<kind>``. NULL text stays
    NULL with NULL counts (SQL semantics). One shuffle-free projection."""
    pats = PII_PATTERNS if patterns is None else patterns
    t = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0))).alias(f"n_{kind}")
        for kind, pat in pats.items()
    ]
    scrubbed = t
    for kind, pat in pats.items():
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{kind}>")
    others = [c for c in docs.columns if c != text_col]
    return docs.select(*others, scrubbed.alias(text_col), *counts)
