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
