"""Hybrid retrieval: reciprocal-rank fusion of lexical and semantic legs.

The standard two-tower retrieval pattern for training-data curation and
RAG: a BM25 keyword leg (operators/terms.bm25_search) and an embedding
cosine leg (operators/similarity.cosine_topk) fused with Reciprocal
Rank Fusion (Cormack/Clarke/Buettcher, SIGIR 2009):

    rrf(d) = sum over legs containing d of 1 / (k0 + rank_leg(d))

Cross-engine float discipline: both legs rank on integer-or-pinned keys
(BM25 ranks on its rounded order-pinned score; cosine ranks on the
rounded fold-ordered similarity), so the RANKS are exact integers. The
fused score is then computed as ONE division of exact small integers —
for a doc in both legs, ``1/(k0+r1) + 1/(k0+r2)`` is algebraically
``(2*k0 + r1 + r2) / ((k0+r1)*(k0+r2))``, whose numerator/denominator
are exact in double — so the reported score is bit-reproducible on any
IEEE engine, with no float addition of two rounded quotients.

Final ranking ties (e.g. (r1,r2)=(1,5) vs (5,1) fuse identically) break
on doc id ascending.

Scale shape: each leg ends in a small top-``pool`` result (a per-query
window over already-aggregated candidates); the fusion itself is a
full-outer join of two <= pool-row frames — driver-trivial at any
corpus size; all heavy lifting lives in the legs, whose plans are
documented in their own modules. No reference counterpart (vegindex
has no retrieval); part of the training-data operator family.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_vegindex_spark.operators.similarity import cosine_topk
from python_vegindex_spark.operators.terms import bm25_search


def rrf_fuse(
    lexical: DataFrame,
    semantic: DataFrame,
    k: int = 20,
    k0: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fuse two (doc_id, rank) frames into top-``k`` by RRF score.

    Inputs carry columns (``id_col``, rank); output is
    (rank, doc_id, rank_lex, rank_sem, rrf_score) ordered by rank.
    """
    if k < 1 or k0 < 1:
        raise ValueError(f"k and k0 must be >= 1 (got k={k}, k0={k0})")
    lex = lexical.select(
        F.col(id_col).alias("doc_id"), F.col("rank").alias("rank_lex")
    )
    sem = semantic.select(
        F.col(id_col).alias("doc_id"), F.col("rank").alias("rank_sem")
    )
    fused = lex.join(sem, "doc_id", "full_outer")
    r1 = F.col("rank_lex")
    r2 = F.col("rank_sem")
    both = (
        (F.lit(2 * k0) + r1 + r2).cast("double")
        / ((F.lit(k0) + r1) * (F.lit(k0) + r2)).cast("double")
    )
    one = F.lit(1.0) / (F.lit(k0) + F.coalesce(r1, r2)).cast("double")
    scored = fused.withColumn(
        "rrf_score",
        F.when(r1.isNotNull() & r2.isNotNull(), both).otherwise(one),
    )
    w = Window.orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("rank", "doc_id", "rank_lex", "rank_sem", "rrf_score")
    )


def hybrid_search_rrf(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: Sequence[str],
    query_vec_id: int,
    k: int = 20,
    pool: int = 50,
    k0: int = 60,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    text_col: str = "text",
) -> DataFrame:
    """End-to-end hybrid search: BM25 over ``docs`` for ``query_terms``
    fused with cosine-to-``query_vec_id``'s embedding over
    ``embeddings`` (doc ids and vec ids share a key space). Each leg
    contributes its top ``pool``; the cosine leg excludes the query
    vector itself (a self-match carries no retrieval information).
    """
    if pool < k:
        raise ValueError(f"pool ({pool}) must be >= k ({k})")
    lex = bm25_search(
        docs, query_terms, k=pool, text_col=text_col, id_col=id_col
    ).select(id_col, "rank")
    q = embeddings.where(F.col(vec_id_col) == query_vec_id)
    sem = cosine_topk(
        embeddings, q, k=pool, id_col=vec_id_col, vec_col=vec_col
    ).select(F.col("neighbor_id").alias(id_col), "rank")
    return rrf_fuse(lex, sem, k=k, k0=k0, id_col=id_col)
