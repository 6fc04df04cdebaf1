"""Sequence packing — laying variable-length documents into fixed
token-budget training sequences.

Two standard disciplines, both deterministic per (shard, order):

* :func:`pack_chunks` — concat-and-chunk (the GPT-style loader): within
  a shard the token stream is documents laid end-to-end, cut every
  ``budget`` tokens; documents may straddle cuts. Pure window cumsum —
  one shuffle on the shard key, all JVM, exactly SQL-oracle-able.
* :func:`pack_greedy` — no-split first-fit in order: a document that
  would overflow the open pack starts a new one. The pack id of row i
  depends on every prior row of its shard (a reset-cumsum), which no
  plain window expresses, so it runs per-shard in ``applyInPandas`` —
  but NOT row-at-a-time: each step closes one pack via
  ``np.searchsorted`` on the precomputed cumulative sum, so the Python
  loop is O(packs · log n) per shard, not O(rows) (same discipline as
  the codec's cross-group bit packing, codecs/chunks.py).

Scale shape: one shuffle on the shard key either way. Shards are the
unit of parallelism AND of packing determinism — a 100-TB corpus packs
as thousands of independent shards, each a single task; hot shards are
a data-layout choice, not a skew surprise (the shard key is
pipeline-chosen, e.g. ``pmod(xxhash64(doc_id), n_shards)``).

Extends the engine beyond the reference (no packing there); budget
semantics are pinned by tests against an independent loop and, for the
greedy variant, a DuckDB recursive-CTE oracle.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def pack_chunks(
    df: DataFrame,
    budget: int,
    shard_cols: Sequence[str],
    order_cols: Sequence[str],
    tokens_col: str,
) -> DataFrame:
    """Concat-and-chunk packing: adds per-document stream coordinates.

    Output columns (appended): ``offset`` (start position of the doc in
    its shard's token stream), ``pack_first`` / ``pack_last`` (ids of
    the budget-sized chunks containing the doc's first/last token;
    zero-token docs take pack_first), ``n_packs_spanned``.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    b = int(budget)
    w = Window.partitionBy(*shard_cols).orderBy(*order_cols)
    tok = F.col(tokens_col).cast("long")
    # ONE running sum (aliased, so the window expression isn't duplicated
    # per derived column), then integer `div` — exact for any long offset,
    # where floor(x / b) would round through double past 2^53 tokens.
    d = df.select("*", (F.sum(tok).over(w) - tok).alias("offset"))
    pack_first = F.expr(f"offset div {b}")
    pack_last = F.greatest(
        F.expr(f"(offset + cast({tokens_col} as bigint) - 1) div {b}"), pack_first
    )
    return d.select(
        "*",
        pack_first.alias("pack_first"),
        pack_last.alias("pack_last"),
        (pack_last - pack_first + 1).alias("n_packs_spanned"),
    )


def pack_chunk_stats(
    df: DataFrame,
    budget: int,
    shard_cols: Sequence[str],
    tokens_col: str,
) -> DataFrame:
    """Per-shard chunk-packing summary: docs, tokens, packs
    (= ceil(tokens/budget)), and pad waste in the final partial pack.
    Order-independent, so a plain hash aggregate (no window)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    tok = F.col(tokens_col).cast("long")
    agg = df.groupBy(*shard_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tok).alias("total_tokens"),
    )
    n_packs = F.ceil(F.col("total_tokens") / budget)
    return agg.select(
        *shard_cols,
        "n_docs",
        "total_tokens",
        n_packs.alias("n_packs"),
        (n_packs * budget - F.col("total_tokens")).alias("pad_tokens"),
    )


def _greedy_pack_ids(toks: np.ndarray, budget: int) -> np.ndarray:
    """Pack ids for one shard's ordered token counts: first-fit in
    order, new pack when the open pack would overflow (a pack may be
    exactly full); an oversized document occupies a pack alone. One
    searchsorted per CLOSED pack."""
    n = len(toks)
    out = np.empty(n, dtype=np.int64)
    cs = np.cumsum(toks, dtype=np.int64)
    start = 0
    pid = 0
    while start < n:
        base = cs[start - 1] if start else 0
        # last index whose inclusive cumsum still fits the budget
        nxt = int(np.searchsorted(cs, base + budget, side="right"))
        nxt = max(nxt, start + 1)  # oversize doc: advance anyway, alone
        out[start:nxt] = pid
        pid += 1
        start = nxt
    return out


def pack_greedy(
    df: DataFrame,
    budget: int,
    shard_cols: Sequence[str],
    order_cols: Sequence[str],
    tokens_col: str,
) -> DataFrame:
    """No-split greedy packing: appends ``pack_id`` (0-based per shard,
    in order). Documents are never split; a pack's total exceeds
    ``budget`` only when a single document does."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    shard_cols = list(shard_cols)
    order_cols = list(order_cols)
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField("pack_id", T.LongType())]
    )

    def assign(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        toks = pdf[tokens_col].to_numpy(dtype=np.int64)
        pdf["pack_id"] = _greedy_pack_ids(toks, budget)
        return pdf

    return df.groupBy(*shard_cols).applyInPandas(assign, schema)


def chunk_overlap(
    df: DataFrame,
    chunk_chars: int = 512,
    stride: int = 384,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking with overlap — the RAG-indexing
    third member of the packing family (pack_chunks cuts a concatenated
    stream, pack_greedy bins whole docs; this one cuts WITHIN a doc so
    every span of ``chunk_chars`` is covered and consecutive chunks
    overlap by ``chunk_chars - stride``).

    Chunk i covers characters ``[i*stride, i*stride + chunk_chars)``
    (0-based); the number of chunks is ``1 + ceil(max(0, len - chunk)
    / stride)`` — the minimal set such that every character is covered
    and the final chunk reaches the end. Empty/NULL texts emit one
    empty chunk (the doc stays represented downstream). Exact integer
    lattice + ``substring`` + ``md5`` — all JVM, all
    SQL-oracle-able; character (codepoint) indexing on both engines.

    Scale: one ``posexplode`` per doc — narrow, no shuffle; output size
    is the standard ~``chunk/stride``x text amplification every RAG
    indexer pays. Dedup the chunks afterwards with the dedup family if
    the corpus repeats boilerplate.

    Output: (id, ``chunk_idx``, ``chunk_start`` 1-based inclusive,
    ``chunk_len``, ``chunk_md5``).
    """
    if chunk_chars <= 0:
        raise ValueError(f"chunk_chars must be positive, got {chunk_chars}")
    if not (0 < stride <= chunk_chars):
        raise ValueError(
            f"stride must be in (0, chunk_chars={chunk_chars}], got {stride}"
        )
    c, s = int(chunk_chars), int(stride)
    txt = F.coalesce(F.col(text_col), F.lit(""))
    # ceil((len - c) / s) without doubles: (len - c + s - 1) div s
    n_extra = F.greatest(
        F.expr(f"(length(`{text_col}`) - {c} + {s - 1}) div {s}"), F.lit(0)
    )
    d = df.select(
        F.col(id_col),
        txt.alias("_txt"),
        F.explode(F.sequence(F.lit(0), n_extra)).alias("chunk_idx"),
    )
    chunk = F.substring(F.col("_txt"), F.col("chunk_idx") * s + 1, c)
    return d.select(
        id_col,
        "chunk_idx",
        (F.col("chunk_idx") * s + 1).alias("chunk_start"),
        F.length(chunk).alias("chunk_len"),
        F.md5(F.encode(chunk, "UTF-8")).alias("chunk_md5"),
    )


def chunk_containment(
    df: DataFrame,
    chunk_chars: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_shared: int = 2,
) -> DataFrame:
    """Containment detection via shared chunk hashes — the dedup family
    member MinHash misses: MinHash-Jaccard scores SYMMETRIC similarity,
    so a short document wholly quoted inside a long one scores low;
    containment (|A∩B| / |smaller|) flags it.

    Both docs are cut on the same NON-overlapping ``chunk_chars``
    lattice (stride = chunk size, so a doc's chunk multiset is a
    deterministic function of its text) and pairs are generated by an
    equi-join on chunk md5 — never all-pairs: only docs that share an
    exact aligned chunk meet. That makes this a fast exact-substring
    screen for aligned duplication (boilerplate blocks, full-doc
    copies, prefix/suffix reuse), not a fuzzy matcher — shifted copies
    need the shingle-based MinHash path (operators/dedup.py).

    Exactness: shared counts are exact integers (distinct chunk hashes
    per doc, pair counts from the join); ``containment`` is one pinned
    division of two BIGINTs.

    Scale: chunking is narrow (no shuffle); the join shuffles on the
    chunk hash — uniform 128-bit keys, no skew beyond genuinely
    repeated content; ``min_shared`` drops the long tail of
    single-shared-boilerplate pairs from the OUTPUT (the pairs still
    flow through the hash join and the per-pair aggregate — size the
    join for the boilerplate profile of the corpus, or pre-filter
    hyper-common chunk hashes). The size lookups are plain joins on
    the doc id — AQE picks broadcast only when the doc count actually
    fits (a forced broadcast would OOM at corpus scale).

    Output per (``id_a`` < ``id_b``): ``n_shared`` (distinct shared
    chunk hashes), ``chunks_a``, ``chunks_b``, ``containment``.
    """
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    chunks = (
        chunk_overlap(
            df, chunk_chars=chunk_chars, stride=chunk_chars,
            id_col=id_col, text_col=text_col,
        )
        .where(F.col("chunk_len") > 0)
        .select(F.col(id_col).alias("_id"), "chunk_md5")
        .distinct()
    )
    sizes = chunks.groupBy("_id").agg(F.count(F.lit(1)).alias("_nc"))
    a = chunks.select(F.col("_id").alias("id_a"), "chunk_md5")
    b = chunks.select(F.col("_id").alias("id_b"), "chunk_md5")
    pairs = (
        a.join(b, "chunk_md5")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= int(min_shared))
    )
    out = (
        pairs.join(
            sizes.select(F.col("_id").alias("id_a"),
                         F.col("_nc").alias("chunks_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col("_id").alias("id_b"),
                         F.col("_nc").alias("chunks_b")),
            "id_b",
        )
    )
    containment = F.col("n_shared").cast("double") / F.least(
        "chunks_a", "chunks_b"
    ).cast("double")
    return out.select(
        "id_a", "id_b", "n_shared", "chunks_a", "chunks_b",
        # UNROUNDED single division: a/b CAN be exactly midway at the
        # 6th decimal (e.g. odd/128 = x.xxxxxx5), where round(.,6) is
        # a cross-engine coin flip (SURVEY §8)
        containment.alias("containment"),
    )
