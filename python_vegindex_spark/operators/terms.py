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

from collections.abc import Sequence

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


def bm25_search(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    min_len: int = 1,
) -> DataFrame:
    """BM25 keyword search: the top ``k`` documents for a bag of query
    terms (Robertson/Sparck-Jones probabilistic ranking — the classic
    lexical retriever next to the embedding ANN family in
    operators/similarity.py). Uses the house whitespace tokenization
    shared with :func:`tfidf_top_terms` / the decontam grams.

    Per (doc, query term): ``score = idf(t) * tf*(k1+1) /
    (tf + k1*(1 - b + b*len/avglen))`` with the Lucene non-negative
    idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``; a doc's score sums over
    the query terms it contains. ``len`` is the doc's token count
    (post-``min_len`` filter), ``avglen`` its corpus mean — counts and
    lengths are all exact integers; only the final score composition is
    float, and the ranking tie-breaks on (rounded score DESC, doc id
    ASC) so order survives cross-engine libm ulp in ``ln`` (the
    tfidf_top_terms discipline: report floats rounded, rank on a
    deterministic key).

    Scale shape: the query is a tiny broadcast (terms -> df via one
    aggregate over the exploded token stream, which also yields doc
    lengths in the same pass family); the corpus-side work is one
    explode + two hash aggregates + a broadcast join — the payload
    text never shuffles. N and avglen ride a broadcast scalar. The
    final rank is two-phase: TakeOrderedAndProject (per-partition
    bounded heaps, k rows per partition to the driver) selects the k
    winners, and the row_number window runs over those k rows only —
    no single-partition sort of the matching set ever happens.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    terms = sorted({t.lower() for t in query_terms if t and len(t) >= min_len})
    if not terms:
        raise ValueError("query_terms must contain at least one usable term")
    words = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("term"),
    ).where(F.length("term") >= min_len)
    doclen = words.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("dl").alias("_dlsum")
    )
    hits = words.where(F.col("term").isin(terms)).groupBy("id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_ = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        hits.join(F.broadcast(df_), "term")
        .join(doclen, "id")
        .crossJoin(F.broadcast(stats))
    )
    nd = F.col("_n").cast("double")
    avglen = F.col("_dlsum").cast("double") / nd
    idf = F.log(
        F.lit(1.0)
        + (nd - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    denom = tf + F.lit(float(k1)) * (
        F.lit(1.0 - float(b)) + F.lit(float(b)) * F.col("dl").cast("double") / avglen
    )
    term_score = idf * (tf * F.lit(float(k1) + 1.0)) / denom
    # fixed-order score composition: one conditional sum per query term
    # (each holds <= 1 non-null addend, so it is exact), then a
    # left-associative add in sorted-term order — the per-doc score is
    # ORDER-PINNED, immune to group-sum reordering, so rounded ranks
    # reproduce cross-engine (any oracle must add in the same order)
    per_term = [
        F.sum(F.when(F.col("term") == t, term_score)).alias(f"_s{i}")
        for i, t in enumerate(terms)
    ]
    agg = scored.groupBy("id", "dl").agg(
        *per_term,
        F.count(F.lit(1)).alias("n_terms_hit"),
        F.sum("tf").alias("tf_total"),
    )
    total = F.coalesce(F.col("_s0"), F.lit(0.0))
    for i in range(1, len(terms)):
        total = total + F.coalesce(F.col(f"_s{i}"), F.lit(0.0))
    per_doc = agg.withColumn("score", F.round(total, 6)).drop(
        *[f"_s{i}" for i in range(len(terms))]
    )
    # Two-phase top-k: a bare orderBy().limit(k) plans as
    # TakeOrderedAndProject — per-partition bounded top-k heaps merged
    # on the driver (k rows per partition cross the wire, never the
    # corpus) — then the dense 1..k rank is a window over ONLY the k
    # survivors. The previous global row_number window sorted every
    # matching document in ONE task (for a query containing any common
    # term over a large corpus that is a single-partition sort of
    # millions of rows; Spark prints the "Moving all data to a single
    # partition" warning). Same ranking key, bit-identical output.
    top = per_doc.orderBy(F.col("score").desc(), F.col("id").asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(
            F.col("rank"),
            F.col("id").alias(id_col),
            "score",
            "n_terms_hit",
            "tf_total",
            "dl",
        )
    )


def cosine_pairs(
    docs: DataFrame,
    min_cos: float = 0.5,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 1,
    dense_vocab_max: int = 256,
    dense_docs_max: int = 100_000,
    dense_broadcast_bytes_max: int = 64 << 20,
    dense_cost_ratio: float = 16.0,
    pair_partitions: int = 64,
) -> DataFrame:
    """Exact all-pairs document cosine similarity over sparse TF
    vectors, via a term-partitioned postings self-join — the classic
    MapReduce all-pairs pattern (Elsayed et al. 2008, "Pairwise
    Document Similarity in Large Collections"): pairs materialize ONLY
    for documents sharing a surviving term, never a cross join.

    The exact complement to the engine's approximate screens: MinHash
    bounds Jaccard, chunk containment catches asymmetric quoting; this
    reports the true cosine for every pair above ``min_cos``.

    ``max_df`` drops terms appearing in more than ``max_df`` documents
    BEFORE the self-join. At scale this is not an optimization but the
    quadratic-blowup guard: a term with document frequency d expands to
    d·(d-1)/2 candidate pairs on one shuffle key, so a stop-word in
    half a 10^9-doc corpus is 10^17 pairs on one reducer. With pruning,
    per-term fan-out is bounded by max_df²; both the dot product AND
    the norms are computed over the pruned term space, so the reported
    cosine is self-consistent: the true cosine in the pruned vector
    space (stop-word mass excluded from both sides).

    Float discipline (SURVEY §8): dot and squared norms are exact
    BIGINTs; ``sqrt`` is IEEE-correctly-rounded on integers < 2^53, so
    ``dot / (sqrt(norm2_a) * sqrt(norm2_b))`` — one multiply, one
    division, pinned order — is bit-identical cross-engine, and the
    ``min_cos`` filter decides identically.

    DENSE-VOCABULARY REGIME (round-4, found by the bench): when the
    surviving vocabulary is tiny (≤ ``dense_vocab_max`` terms) and the
    corpus fits a broadcast (≤ ``dense_docs_max`` docs), the postings
    self-join is the WRONG plan — every term is then a hot shuffle key
    (a 31-term vocabulary gives at most 31-way parallelism while
    carrying sum(df²)/2 candidate rows through the shuffle: 145 s at
    sf0.1 vs ~4 s for this path). In that regime each document is
    densified into its |vocab|-long tf vector and pairs stream through
    a broadcast nested-loop join with the dot product computed INLINE
    (zip_with + aggregate) — no pair ever shuffles, no aggregation
    state, parallelism = ``pair_partitions``. Output is bit-identical
    (integer dot, same float expression; ``dot > 0`` re-imposes the
    postings "share ≥ 1 term" pair universe). Big sparse corpora take
    the postings path exactly as before — the regime test costs three
    cheap jobs on the checkpointed TF table.

    REGIME SELECTION IS COST-GATED (round-5, ADVICE): counts alone
    (vocab ≤ 256, docs ≤ cap) would admit a broadcast streaming
    docs²/2 nested-loop pairs each doing a |vocab|-element interpreted
    lambda — ~10⁹ element-ops per 2.8k docs × 256 terms, extremely
    expensive for a regime meant for tiny corpora. The gate compares
    the two paths' dominant terms: dense element-ops ``docs² · vocab``
    vs postings shuffle candidates ``Σ_t df(t)²``; dense is taken only
    when ``docs² · vocab ≤ dense_cost_ratio · Σ df²``, AND the
    broadcast fits: ``docs · vocab · 8 ≤ dense_broadcast_bytes_max``
    (default 64 MB — the broadcast cap is BYTE-denominated and so
    scales with the actual vocabulary: ~31k docs at vocab 256, ~260k
    at vocab 31; a flat doc cap would wrongly force a 30k-doc 31-term
    corpus — round-4's own catastrophic shape — back onto the hot-key
    postings plan), AND ``docs ≤ dense_docs_max`` as the row-count
    backstop.
    ``dense_cost_ratio`` is the measured per-unit cost gap: one
    shuffled+hash-aggregated postings candidate costs 18–50× one
    interpreted zip_with element-op on this engine (flat ~2.4 M
    candidates/s vs ~124 M element-ops/s once job overhead amortizes;
    BENCH.md §1p, ``scripts/measure_dense_cosine.py``). The default 16
    is the conservative floor of every measured break-even ≥ 2k docs —
    the gate never picks a dense plan that measured slower. The df
    aggregate that feeds the gate runs only once vocab ≤ 256 is
    already known, so big-vocabulary corpora never pay it.

    Output: (id_a, id_b, dot, norm2_a, norm2_b, cos) with id_a < id_b.
    """
    if not 0.0 <= float(min_cos) <= 1.0:
        raise ValueError(f"min_cos must be in [0, 1], got {min_cos}")
    if max_df is not None and max_df < 1:
        raise ValueError(f"max_df must be >= 1, got {max_df}")
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "term"
        ),
    ).where(F.length("term") >= int(min_len))
    tf = toks.groupBy("id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    if max_df is not None:
        # postings have one row per (doc, term) -> count(*) per term IS
        # the document frequency; inner-join keeps only cool terms
        keep = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df")).where(
            F.col("_df") <= int(max_df)
        ).select("term")
        tf = tf.join(keep, on="term", how="inner")
    # pinned (house rule, SURVEY §8): FOUR consumers below (self-join
    # a/b sides + both norm lookups) — without the checkpoint each
    # would re-run the corpus-sized tokenize/explode/TF lineage
    tf = tf.localCheckpoint(eager=True)

    if dense_vocab_max > 0:
        vocab = [
            r[0]
            for r in tf.select("term")
            .distinct()
            .limit(int(dense_vocab_max) + 1)
            .collect()
        ]
        # 0 < check: an empty vocabulary (all docs empty / filtered)
        # cannot densify — F.array() of zero elements is NullType and
        # fails analysis; the postings path returns the correct empty
        # result for free
        if 0 < len(vocab) <= dense_vocab_max:
            # limit(cap+1).count() is EXACT when <= cap (early-exits
            # the scan when over), so n_docs doubles as the gate input
            n_docs = (
                tf.select("id")
                .distinct()
                .limit(int(dense_docs_max) + 1)
                .count()
            )
            if (
                n_docs <= dense_docs_max
                and n_docs * len(vocab) * 8 <= dense_broadcast_bytes_max
            ):
                sum_df2 = (
                    tf.groupBy("term")
                    .agg(F.count(F.lit(1)).alias("_df"))
                    .agg(F.sum(F.col("_df") * F.col("_df")))
                    .collect()[0][0]
                )
                if n_docs * n_docs * len(vocab) <= float(
                    dense_cost_ratio
                ) * float(sum_df2):
                    return _cosine_pairs_dense(
                        tf, sorted(vocab), float(min_cos), int(pair_partitions)
                    )

    norms = tf.groupBy("id").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("norm2")
    )
    a, b = tf.alias("a"), tf.alias("b")
    dots = (
        a.join(
            b,
            on=(F.col("a.term") == F.col("b.term"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(
            F.sum(F.col("a.tf") * F.col("b.tf")).cast("long").alias("dot")
        )
    )
    na = norms.select(
        F.col("id").alias("id_a"), F.col("norm2").alias("norm2_a")
    )
    nb = norms.select(
        F.col("id").alias("id_b"), F.col("norm2").alias("norm2_b")
    )
    cos = F.col("dot") / (F.sqrt("norm2_a") * F.sqrt("norm2_b"))
    return (
        dots.join(na, on="id_a")
        .join(nb, on="id_b")
        .withColumn("cos", cos)
        .where(F.col("cos") >= float(min_cos))
        .select("id_a", "id_b", "dot", "norm2_a", "norm2_b", "cos")
    )


def _cosine_pairs_dense(
    tf: DataFrame, vocab: list[str], min_cos: float, pair_partitions: int
) -> DataFrame:
    """Dense-vocabulary all-pairs cosine: densify each doc's TF into a
    |vocab|-long array, broadcast the whole (tiny) corpus, stream pairs
    through a nested-loop ``id_a < id_b`` join and compute the integer
    dot inline — zero pair shuffle, zero aggregation state, parallelism
    set by repartitioning the streamed side. Bit-identical output to
    the postings path (same integer dot, same pinned float expression;
    ``dot > 0`` keeps exactly the share-a-term pair universe)."""
    zero = F.lit(0).cast("long")
    vec = F.array(
        *[
            F.coalesce(F.element_at(F.col("_m"), F.lit(t)), zero)
            for t in vocab
        ]
    )
    norm2 = F.aggregate(F.col("vec"), zero, lambda acc, x: acc + x * x)
    vecs = (
        tf.groupBy("id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("term", "tf"))
            ).alias("_m")
        )
        .select("id", vec.alias("vec"))
        .withColumn("norm2", norm2)
    )
    a = vecs.select(
        F.col("id").alias("id_a"),
        F.col("vec").alias("_va"),
        F.col("norm2").alias("norm2_a"),
    ).repartition(pair_partitions)
    b = vecs.select(
        F.col("id").alias("id_b"),
        F.col("vec").alias("_vb"),
        F.col("norm2").alias("norm2_b"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("_va"), F.col("_vb"), lambda x, y: x * y),
        zero,
        lambda acc, v: acc + v,
    )
    cos = F.col("dot") / (F.sqrt("norm2_a") * F.sqrt("norm2_b"))
    return (
        a.join(F.broadcast(b), on=F.col("id_a") < F.col("id_b"))
        .withColumn("dot", dot)
        .where(F.col("dot") > 0)
        .withColumn("cos", cos)
        .where(F.col("cos") >= min_cos)
        .select("id_a", "id_b", "dot", "norm2_a", "norm2_b", "cos")
    )


def unigram_freq_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 1,
) -> DataFrame:
    """Mean corpus token frequency per document — the log-free unigram
    language-model quality signal: high scores mean a document is built
    from very common tokens (boilerplate / templated text), low scores
    mean rare or garbled vocabulary. The integer-exact sibling of
    unigram cross-entropy: corpus-frequency WEIGHTS are exact BIGINT
    sums, and only the final ``weighted / (n_tokens * total_tokens)``
    crosses into floats (two IEEE ops — one product of exactly-rounded
    doubles, one division — deterministic cross-engine, unlike
    ``sum(ln p)`` whose libm and summation order both wobble).

    Output: (doc_id, n_tokens, weighted, mean_tok_freq) where
    ``weighted = sum_t tf_dt * ctf_t`` (ctf = corpus term frequency)
    and ``mean_tok_freq = weighted / (n_tokens * C)`` with C the corpus
    token total, so a doc of average-frequency tokens scores ~mean
    token probability. House whitespace tokenization (shared with
    tfidf_top_terms / bm25_search / the decontam grams).

    Scale shape: one corpus explode -> (doc, term) hash aggregate; the
    vocab aggregate and the back-join run over (doc, term) TF rows (df
    per term, not tf), so hot terms skew only the term-keyed join —
    AQE skew handling applies; the corpus total rides a broadcast
    scalar. Payload text never shuffles.
    """
    words = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "term"
        ),
    ).where(F.length("term") >= min_len)
    doc_tf = words.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    vocab = doc_tf.groupBy("term").agg(F.sum("tf").alias("ctf"))
    totals = vocab.agg(F.sum("ctf").alias("_c"))
    per_doc = (
        doc_tf.join(vocab, "term")
        .groupBy("id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("ctf")).cast("long").alias("weighted"),
        )
    )
    return per_doc.crossJoin(F.broadcast(totals)).select(
        F.col("id").alias(id_col),
        "n_tokens",
        "weighted",
        (
            F.col("weighted").cast("double")
            / (F.col("n_tokens").cast("double") * F.col("_c").cast("double"))
        ).alias("mean_tok_freq"),
    )
