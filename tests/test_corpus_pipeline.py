"""End-to-end tests for plans/corpus.py and the corpus_job CLI."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from python_vegindex_spark.plans.corpus import (
    clean_corpus,
    corpus_funnel,
    run_corpus_pipeline,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and then the dog naps "
    "while the fox runs off to find more interesting things to chase today "
)  # 26 words per repetition-free chunk; repeated below to pass min_words


def _docs(spark):
    rows = [
        # clean survivor
        (1, "srcA", GOOD + "extra tail words for doc one variety"),
        # exact duplicate of doc 1 (whitespace-normalized) -> deduped
        (2, "srcA", "  " + GOOD + "extra tail words  for doc one variety "),
        # fails quality: too short
        (3, "srcA", "way too short"),
        # contaminated: contains the benchmark 4-gram
        (4, "srcB", GOOD + "contains the secret eval answer sequence here"),
        # clean survivor in another source
        (5, "srcB", GOOD + "a different ending for doc five entirely now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    return df.withColumn("n_chars", F.length("text").cast("long"))


def _bench(spark):
    return spark.createDataFrame(
        [(100, "the SECRET eval ANSWER sequence appears in this benchmark")],
        "doc_id long, text string",
    )


def test_clean_corpus_filters_each_stage(spark):
    kept = sorted(
        r["doc_id"] for r in clean_corpus(_docs(spark), _bench(spark)).collect()
    )
    # 3 fails quality, 4 is contaminated, 2 loses the dedup to 1
    assert kept == [1, 5]


def test_corpus_funnel_counts(spark):
    rows = {
        r["stage"]: r["n_docs"]
        for r in corpus_funnel(_docs(spark), _bench(spark)).collect()
    }
    assert rows == {"1_input": 5, "2_quality": 4, "3_decontam": 3, "4_dedup": 2}


def test_funnel_without_bench_skips_decontam(spark):
    stages = [r["stage"] for r in corpus_funnel(_docs(spark)).collect()]
    assert stages == ["1_input", "2_quality", "4_dedup"]


def test_run_corpus_pipeline_writes_and_packs(spark, tmp_path):
    out = str(tmp_path / "corpus")
    m = run_corpus_pipeline(
        spark, _docs(spark), _bench(spark), out_root=out, pack_budget=100
    )
    assert m["n_input_docs"] == 5
    assert m["n_clean_docs"] == 2
    clean = spark.read.parquet(out + "/clean")
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 5]
    packed = spark.read.parquet(out + "/packed")
    # both survivors are ~170 chars at budget 100 -> each spans >= 2 packs
    assert packed.count() == 2
    spans = {r["doc_id"]: r["n_packs_spanned"] for r in packed.collect()}
    assert all(v >= 2 for v in spans.values())
    # n_packs = sum over sources of (max pack_last + 1)
    expect = (
        packed.groupBy("source").agg((F.max("pack_last") + 1).alias("np"))
        .agg(F.sum("np")).collect()[0][0]
    )
    assert m["n_packs"] == expect


def test_corpus_job_cli(spark, tmp_path, capsys):
    import sys

    sys.path.insert(0, "scripts")
    import corpus_job

    docs_path = str(tmp_path / "docs")
    bench_path = str(tmp_path / "bench")
    # write without n_chars/source to exercise the CLI's defaulting
    _docs(spark).select("doc_id", "text").write.parquet(docs_path)
    _bench(spark).write.parquet(bench_path)
    m = corpus_job.main(
        [
            "--docs", docs_path,
            "--bench", bench_path,
            "--out", str(tmp_path / "out"),
            "--budget", "100",
        ]
    )
    assert m["n_clean_docs"] == 2
    line = [
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("CORPUS_METRICS ")
    ]
    assert json.loads(line[0][len("CORPUS_METRICS "):]) == m


def test_clean_corpus_near_dup_option(spark):
    # doc 6 is a near-duplicate of doc 1 (one word changed) — exact
    # dedup keeps it, the fuzzy stage removes it at Jaccard 0.8
    # (doc 5, sharing only the GOOD prefix, stays below 0.8 and survives)
    base = _docs(spark)
    near = spark.createDataFrame(
        [(6, "srcA", GOOD + "extra tail words for doc six variety")],
        "doc_id long, source string, text string",
    ).withColumn("n_chars", F.length("text").cast("long"))
    docs = base.unionByName(near)
    bench = _bench(spark)

    exact_only = sorted(r["doc_id"] for r in clean_corpus(docs, bench).collect())
    assert exact_only == [1, 5, 6]

    fuzzy = sorted(
        r["doc_id"]
        for r in clean_corpus(docs, bench, near_dup_jaccard=0.8).collect()
    )
    assert fuzzy == [1, 5]


def test_run_corpus_pipeline_fuzzy_stage(spark, tmp_path):
    # with near_dup_jaccard the pipeline materializes a clean_fuzzy
    # stage and the funnel metrics count survivors AFTER fuzzy dedup
    near = spark.createDataFrame(
        [(6, "srcA", GOOD + "extra tail words for doc six variety")],
        "doc_id long, source string, text string",
    ).withColumn("n_chars", F.length("text").cast("long"))
    docs = _docs(spark).unionByName(near)
    out = str(tmp_path / "corpus_fuzzy")
    m = run_corpus_pipeline(
        spark, docs, _bench(spark), out_root=out,
        near_dup_jaccard=0.8, pack_budget=100,
    )
    assert set(m["stages"]) == {"clean", "clean_fuzzy", "packed"}
    assert m["stages"]["clean"]["rows"] == 3      # 1, 5, 6 pass exact
    assert m["n_clean_docs"] == 2                 # 6 removed by fuzzy
    fuzzy = spark.read.parquet(out + "/clean_fuzzy")
    assert sorted(r["doc_id"] for r in fuzzy.collect()) == [1, 5]
    packed = spark.read.parquet(out + "/packed")
    assert sorted(r["doc_id"] for r in packed.collect()) == [1, 5]


def test_clean_corpus_text_clean_and_mixture_stages(spark):
    # three docs share a footer line (boilerplate at min_docs=3); doc 7
    # carries an email; mixture keeps only weighted sources
    footer = "\nall rights reserved by example corp"
    rows = [
        (1, "srcA", GOOD + "extra tail words for doc one variety" + footer),
        (5, "srcB", GOOD + "a different ending for doc five entirely now" + footer),
        (7, "srcB", GOOD + "doc seven writes to admin@example.com often" + footer),
        (9, "srcC", GOOD + "source c doc nine stays unweighted in the mix"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).withColumn("n_chars", F.length("text").cast("long"))

    out = clean_corpus(
        docs, boiler_min_docs=3, scrub_pii_spans=True,
        mixture_weights={"srcA": 0.5, "srcB": 0.5},
    )
    got = {r["doc_id"]: r for r in out.collect()}
    # srcC dropped by the mixture (unweighted); the rest survive (the
    # binding source keeps everything at these tiny counts)
    assert 9 not in got and set(got) <= {1, 5, 7}
    assert 7 in got
    for r in got.values():
        assert "all rights reserved" not in r["text"]  # boilerplate gone
        assert r["n_chars"] == len(r["text"])          # recomputed post-strip
    assert "admin@example.com" not in got[7]["text"]
    assert "<email>" in got[7]["text"]
    # the count columns are NOT part of the pipeline schema
    assert "n_email" not in out.columns


def test_run_corpus_pipeline_mixture_stage(spark, tmp_path):
    docs = _docs(spark).unionByName(
        spark.createDataFrame(
            [(8, "srcC", GOOD + "unweighted source c doc eight ends here")],
            "doc_id long, source string, text string",
        ).withColumn("n_chars", F.length("text").cast("long"))
    )
    out = str(tmp_path / "corpus_mix")
    m = run_corpus_pipeline(
        spark, docs, _bench(spark), out_root=out, pack_budget=100,
        mixture_weights={"srcA": 0.5, "srcB": 0.5},
    )
    assert set(m["stages"]) == {"clean", "mixture", "packed"}
    assert m["stages"]["clean"]["rows"] == 3   # 1, 5, 8 pass cleaning
    assert m["n_clean_docs"] == 2              # 8 (srcC) dropped by mixture
    mixed = spark.read.parquet(out + "/mixture")
    assert sorted(r["doc_id"] for r in mixed.collect()) == [1, 5]


def test_corpus_job_cli_new_flags(spark, tmp_path):
    import sys

    sys.path.insert(0, "scripts")
    import corpus_job

    docs_path = str(tmp_path / "docs")
    _docs(spark).write.parquet(docs_path)
    m = corpus_job.main(
        [
            "--docs", docs_path,
            "--out", str(tmp_path / "out"),
            "--budget", "100",
            "--scrub-pii",
            "--mixture", '{"srcA": 0.5, "srcB": 0.5}',
        ]
    )
    assert "mixture" in m["stages"]
    assert m["n_clean_docs"] == m["stages"]["mixture"]["rows"]


def test_synth_documents_deterministic_and_planted(spark):
    from python_vegindex_spark.sources.synth import synth_documents

    a = synth_documents(spark, n_docs=2000, seed=7)
    # parallelism-independent: same content hash at 1 vs 32 partitions
    def content_hash(df):
        return (
            df.select(F.xxhash64(*df.columns).alias("h"))
            .agg(F.expr("bit_xor(h)")).collect()[0][0]
        )
    assert content_hash(a.repartition(32)) == content_hash(a.coalesce(1))

    rows = a.collect()
    assert len(rows) == 2000
    texts = [r["text"] for r in rows]
    # planted exact duplicates exist
    assert len(set(texts)) < len(texts)
    # planted near-duplicates: the marker suffix from the generator
    assert any(t.endswith(" changed") for t in texts)
    # spam docs are one repeated word
    assert any(len(set(t.split())) == 1 and len(t.split()) > 4 for t in texts)
    # most docs pass the quality gate, spam/short fail it
    from python_vegindex_spark.operators.quality_filter import gopher_flags
    kept = gopher_flags(a, min_words=30).filter("keep").count()
    assert 0.7 * 2000 < kept < 0.95 * 2000
