"""spark-submit job script: full rollup pipeline on a turns parquet table.

    spark-submit --master local[N] --py-files /tmp/pvs.zip \
        scripts/run_pipeline.py --turns <path> [--out <dir>] [--cores N]

Prints one JSON line of pipeline metrics on stdout (marker-prefixed).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cores", type=int, default=None, help="for shuffle sizing + report")
    ap.add_argument("--tiers", default="hourly,daily,weekly")
    ap.add_argument("--no-chunks", action="store_true")
    ap.add_argument(
        "--fused",
        action="store_true",
        help="all gold tiers from one scan + one shuffle (multitier)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from python_vegindex_spark.plans.pipeline import run_pipeline
    from python_vegindex_spark.session import scratch_dir

    builder = (
        SparkSession.builder.appName("vxs-pipeline")
        .config("spark.local.dir", os.path.join(scratch_dir(), "vxs-spark-local"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
    )
    if args.cores:
        # 4 partitions per core: enough waves that one slow task (host
        # jitter) amortizes instead of defining the stage wall
        builder = builder.config("spark.sql.shuffle.partitions", str(max(16, 4 * args.cores)))
    spark = builder.getOrCreate()

    turns = spark.read.parquet(args.turns)
    metrics = run_pipeline(
        spark,
        turns,
        out_root=args.out,
        tiers=tuple(args.tiers.split(",")),
        with_chunks=not args.no_chunks,
        fused=args.fused,
    )
    metrics["cores"] = args.cores
    print("PIPELINE_METRICS " + json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
