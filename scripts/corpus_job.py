"""spark-submit job: training-corpus cleaning pipeline over documents.

    spark-submit --master local[N] --py-files /tmp/pvs.zip \
        scripts/corpus_job.py --docs <parquet> [--bench <parquet>] \
        [--out DIR] [--min-words 30] [--decontam-n 4] [--budget 4096] \
        [--boiler-min-docs 3] [--scrub-pii] [--mixture '{"web":0.6,...}']

Chains quality gates -> benchmark decontamination -> exact dedup ->
sequence packing (plans/corpus.py) and prints one marker-prefixed JSON
metrics line (funnel + per-stage walls).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--bench", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--min-words", type=int, default=30)
    ap.add_argument("--decontam-n", type=int, default=4)
    ap.add_argument(
        "--near-dup-jaccard", type=float, default=None,
        help="also remove MinHash-LSH near-dups at this verified Jaccard",
    )
    ap.add_argument("--budget", type=int, default=4096)
    ap.add_argument(
        "--boiler-min-docs", type=int, default=None,
        help="strip lines shared by this many distinct docs before the quality gate",
    )
    ap.add_argument(
        "--scrub-pii", action="store_true",
        help="redact email/IPv4/phone spans before the quality gate",
    )
    ap.add_argument(
        "--mixture", default=None,
        help='JSON source->weight map, e.g. \'{"web": 0.6, "code": 0.4}\'; '
        "resamples the cleaned corpus to the largest exact target mixture",
    )
    args = ap.parse_args(argv)
    mixture_weights = json.loads(args.mixture) if args.mixture else None

    from pyspark.sql import functions as F

    from python_vegindex_spark.plans.corpus import run_corpus_pipeline
    from python_vegindex_spark.session import get_spark

    spark = get_spark("vxs-corpus")
    docs = spark.read.parquet(args.docs)
    if "n_chars" not in docs.columns:
        docs = docs.withColumn("n_chars", F.length("text").cast("long"))
    if "source" not in docs.columns:
        docs = docs.withColumn("source", F.lit("default"))
    bench = spark.read.parquet(args.bench) if args.bench else None
    metrics = run_corpus_pipeline(
        spark,
        docs,
        bench,
        out_root=args.out,
        min_words=args.min_words,
        decontam_n=args.decontam_n,
        near_dup_jaccard=args.near_dup_jaccard,
        pack_budget=args.budget,
        boiler_min_docs=args.boiler_min_docs,
        scrub_pii_spans=args.scrub_pii,
        mixture_weights=mixture_weights,
    )
    print("CORPUS_METRICS " + json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main()
