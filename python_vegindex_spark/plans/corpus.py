"""End-to-end training-corpus pipeline: quality -> decontam -> dedup -> pack.

The document-side twin of plans/pipeline.py (the transcript rollup job):
one declarative composition of the engine's training-data operators,
taking a raw ``documents`` table to packed training shards —

  1. quality gate   — operators/quality_filter.gopher_flags ``keep``
                      (one shuffle-free projection over the scan);
  2. decontaminate  — operators/decontam vs a benchmark/eval table
                      (broadcast semi-join, anti-join removal);
  3. exact dedup    — lowest-id survivor per normalized text
                      (md5 fingerprint: one shuffle on a uniform key);
  4. pack           — operators/packing.pack_chunks concat-and-chunk
                      stream coordinates per source shard.

Optional stages: global boilerplate-line stripping and PII scrubbing
before the quality gate (operators/text_clean), MinHash-LSH near-dup
removal after exact dedup, and source-mixture resampling last
(operators/mixture — after cleaning, so the stated proportions hold in
what ships).

Each stage is the already-tested operator — this module only sequences
them and reports the funnel, so a migrating user gets the whole
pipeline as one call / one spark-submit job. Scale shape: stages 1-3
touch the full corpus exactly once each with no payload re-shuffle
(gates are scans + anti-joins on narrow id lists); only dedup and pack
shuffle, each on a uniform key (fingerprint / shard).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.decontam import decontaminate
from ..operators.packing import pack_chunks
from ..operators.quality_filter import gopher_flags


def _norm_fp(text_col: str = "text"):
    """The dedup identity: md5 of whitespace-normalized lowercased text.
    ONE definition — _dedup_exact_keep and corpus_funnel's '4_dedup'
    stage must count the same survivor set or the funnel silently
    drifts from the operator it reports on."""
    return F.md5(
        F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    )


def _dedup_exact_keep(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Lowest-id survivor per exact normalized text (md5 fingerprint so
    any engine can reproduce the key); payload rejoins by id only."""
    keep = (
        docs.select(F.col(id_col), _norm_fp().alias("_fp"))
        .groupBy("_fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return docs.join(keep, id_col, "left_semi")


def _dedup_near_keep(
    docs: DataFrame,
    jaccard_min: float = 0.8,
    shingle_n: int = 3,
) -> DataFrame:
    """Fuzzy dedup: MinHash-LSH candidates -> exact n-gram Jaccard
    verify -> connected components -> lowest-id survivor per cluster
    (operators/dedup end to end). Candidates only ever come from banded
    bucket collisions — never an all-pairs join."""
    from ..operators.dedup import (
        dedup_keep_canonical,
        minhash_lsh_pairs,
        minhash_signatures,
        ngram_jaccard,
    )

    sigs = minhash_signatures(docs, num_hashes=64, shingle_n=shingle_n)
    cand = minhash_lsh_pairs(sigs, bands=16, rows_per_band=4)
    pairs = ngram_jaccard(cand, docs, n=shingle_n).filter(
        F.col("jaccard") >= jaccard_min
    )
    return dedup_keep_canonical(docs, pairs.select("id_a", "id_b"))


def clean_corpus(
    docs: DataFrame,
    bench: DataFrame | None = None,
    min_words: int = 30,
    decontam_n: int = 4,
    near_dup_jaccard: float | None = None,
    boiler_min_docs: int | None = None,
    scrub_pii_spans: bool = False,
    mixture_weights: dict[str, float] | None = None,
) -> DataFrame:
    """[boilerplate strip ->] [PII scrub ->] quality -> decontam ->
    exact-dedup [-> fuzzy dedup] [-> mixture resample]; returns
    surviving docs.

    * ``boiler_min_docs`` (e.g. 3) first strips lines shared by that
      many distinct docs (operators/text_clean) — text edits run BEFORE
      the quality gates, CCNet-style, so a doc that is boilerplate-only
      fails ``min_words`` honestly; ``n_chars`` is recomputed.
    * ``scrub_pii_spans`` redacts email/IPv4/phone spans (a pure
      projection; the count columns are not kept — the pipeline's
      contract is the cleaned schema).
    * ``near_dup_jaccard`` (e.g. 0.8) additionally runs MinHash-LSH
      near-dup removal at that verified-Jaccard threshold.
    * ``mixture_weights`` finally thins the CLEANED corpus to the
      target source mixture (operators/mixture) — last, so the stated
      proportions hold in what ships, not in what gets filtered."""
    if boiler_min_docs is not None:
        from ..operators.text_clean import strip_boilerplate_lines

        stripped = strip_boilerplate_lines(docs, min_docs=boiler_min_docs)
        docs = (
            docs.drop("text")
            .join(stripped.select("doc_id", "text"), "doc_id")
            .withColumn("n_chars", F.length("text").cast("long"))
        )
    if scrub_pii_spans:
        from ..operators.text_clean import scrub_pii

        docs = scrub_pii(docs).select(*docs.columns)
        if "n_chars" in docs.columns:
            # redaction shortens text; keep the packing token proxy honest
            docs = docs.withColumn("n_chars", F.length("text").cast("long"))
    kept_ids = gopher_flags(docs, min_words=min_words).filter("keep").select(
        F.col("id").alias("doc_id")
    )
    survivors = docs.join(kept_ids, "doc_id", "left_semi")
    if bench is not None:
        survivors = decontaminate(survivors, bench, n=decontam_n)
    survivors = _dedup_exact_keep(survivors)
    if near_dup_jaccard is not None:
        survivors = _dedup_near_keep(survivors, jaccard_min=near_dup_jaccard)
    if mixture_weights is not None:
        from ..operators.mixture import mixture_resample

        survivors = mixture_resample(survivors, mixture_weights)
    return survivors


def corpus_funnel(
    docs: DataFrame,
    bench: DataFrame | None = None,
    min_words: int = 30,
    decontam_n: int = 4,
) -> DataFrame:
    """One row per pipeline stage: (stage, n_docs, chars) — the
    retention funnel a pipeline owner monitors per ingest batch.

    One-pass shape (round-4, bench-found): the stage frames NEST, so
    aggregating each of them separately re-executes the shared prefix —
    4 corpus scans, 3× the quality gate, 2× decontamination (warm time
    ≈ cold time: nothing was reused). Both gates are PER-DOC predicates
    (a doc's Gopher flags and its benchmark-gram hits don't depend on
    other corpus docs), so instead each gate runs ONCE over the corpus
    into boolean flag columns on a slim (doc_id, n_chars, fingerprint)
    table — pinned with one localCheckpoint, no text retained — and
    every stage row is a filtered aggregate of that table. The dedup
    stage keeps its pool semantics exactly: the canonical lowest-id
    survivor per fingerprint is chosen AMONG the quality∧decontam
    survivors (min(struct(id, chars)) per fingerprint — id is unique,
    so the struct min is the id min carrying its own chars). Counts,
    char sums and the survivor set are bit-identical to the staged
    formulation; the oracle is unchanged."""
    # (measured: pre-spreading the raw batch here is a slight net loss —
    # contamination_hits spreads internally before its gram stage, the
    # dominant cost, and the extra text exchange outweighs
    # parallelizing the cheap Gopher projection)
    q = gopher_flags(docs, min_words=min_words).select(
        F.col("id").alias("doc_id"), F.col("keep").alias("_pass_q")
    )
    slim = (
        docs.select("doc_id", "n_chars", _norm_fp().alias("_fp"))
        .join(q, "doc_id", "left")
    )
    if bench is not None:
        from ..operators.decontam import contamination_hits

        bad = (
            contamination_hits(docs, bench, decontam_n)
            .filter(F.col("hit_grams") >= 1)
            .select(F.col("id").alias("doc_id"), F.lit(True).alias("_hit"))
        )
        slim = slim.join(bad, "doc_id", "left").withColumn(
            "_pass_d", F.col("_hit").isNull()
        ).drop("_hit")
    else:
        slim = slim.withColumn("_pass_d", F.lit(True))
    slim = slim.localCheckpoint(eager=True)

    def _stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("n_chars").cast("long"), F.lit(0)).alias("chars"),
        )

    clean = slim.filter(F.col("_pass_q") & F.col("_pass_d"))
    winners = clean.groupBy("_fp").agg(
        F.min(F.struct(F.col("doc_id"), F.col("n_chars"))).alias("_w")
    ).select(F.col("_w.n_chars").alias("n_chars"))
    stages = [
        _stage("1_input", slim),
        _stage("2_quality", slim.filter("_pass_q")),
    ]
    if bench is not None:
        stages.append(_stage("3_decontam", clean))
    stages.append(_stage("4_dedup", winners))
    out = stages[0]
    for row in stages[1:]:
        out = out.unionByName(row)
    return out.orderBy("stage")


def run_corpus_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    bench: DataFrame | None = None,
    out_root: str | None = None,
    min_words: int = 30,
    decontam_n: int = 4,
    near_dup_jaccard: float | None = None,
    pack_budget: int = 4096,
    tokens_col: str = "n_chars",
    boiler_min_docs: int | None = None,
    scrub_pii_spans: bool = False,
    mixture_weights: dict[str, float] | None = None,
) -> dict:
    """Run the full pipeline; write parquet under ``out_root`` when
    given (clean/ and packed/), else count() to force execution.
    Returns a metrics dict with the funnel and per-stage walls.

    Each stage is MATERIALIZED before the next consumes it (parquet
    under ``out_root``, localCheckpoint in bench mode): the fuzzy-dedup
    stage re-reads its input several times (signatures, the Jaccard
    verify's two shingle joins, the final anti-join), and re-executing
    the quality/decontam lineage for each would re-scan the raw corpus
    4+ times — at the 100-TB design point materialization between
    stages is the production layout, exactly like plans/pipeline.py's
    silver table."""
    metrics: dict = {"stages": {}}

    def execute(name: str, df: DataFrame) -> tuple[DataFrame, int]:
        t0 = time.perf_counter()
        if out_root:
            df.write.mode("overwrite").parquet(f"{out_root}/{name}")
            out = spark.read.parquet(f"{out_root}/{name}")
        else:
            out = df.localCheckpoint(eager=True)
        n = out.count()
        metrics["stages"][name] = {
            "wall_s": round(time.perf_counter() - t0, 3),
            "rows": n,
        }
        return out, n

    t_all = time.perf_counter()
    # mixture runs as its own stage AFTER the clean materialization —
    # its per-source count pass then reads the materialized table
    # instead of re-executing the whole cleaning lineage
    clean = clean_corpus(
        docs,
        bench,
        min_words=min_words,
        decontam_n=decontam_n,
        boiler_min_docs=boiler_min_docs,
        scrub_pii_spans=scrub_pii_spans,
    )
    clean, _ = execute("clean", clean)
    if near_dup_jaccard is not None:
        # time the CONSTRUCTION too: dedup_clusters inside
        # _dedup_near_keep runs eagerly (edges checkpoint + CC rounds),
        # so the fuzzy stage's real work happens before execute() sees
        # the DataFrame — without this the stage wall under-reports by
        # the whole minhash/LSH/verify/CC cost
        t_fz = time.perf_counter()
        fz = _dedup_near_keep(clean, jaccard_min=near_dup_jaccard)
        clean, _ = execute("clean_fuzzy", fz)
        metrics["stages"]["clean_fuzzy"]["wall_s"] = round(
            time.perf_counter() - t_fz, 3
        )
    if mixture_weights is not None:
        from ..operators.mixture import mixture_resample

        clean, _ = execute("mixture", mixture_resample(clean, mixture_weights))
    packed = pack_chunks(
        clean, pack_budget, ["source"], ["doc_id"], tokens_col
    )
    packed, _ = execute("packed", packed)
    n_packs = (
        packed.groupBy("source")
        .agg((F.max("pack_last") + 1).alias("np"))
        .agg(F.sum("np"))
        .collect()[0][0]
    )
    metrics["n_input_docs"] = docs.count()
    last_clean_stage = (
        "mixture"
        if mixture_weights is not None
        else ("clean_fuzzy" if near_dup_jaccard is not None else "clean")
    )
    metrics["n_clean_docs"] = metrics["stages"][last_clean_stage]["rows"]
    metrics["n_packs"] = int(n_packs or 0)
    metrics["wall_s"] = round(time.perf_counter() - t_all, 3)
    return metrics
