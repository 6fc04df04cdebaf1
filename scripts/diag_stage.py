"""Diagnostic: run one pipeline stage with event logging, dump stage stats.

    spark-submit --master local[N] scripts/diag_stage.py --turns <path> \
        --stage silver|chunks|gold_hourly

Prints per-Spark-stage wall, task count, and task-time sum from the
event log so we can see where parallelism collapses.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", required=True)
    ap.add_argument("--stage", default="silver")
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    evdir = "/dev/shm/vxs-eventlog"
    os.makedirs(evdir, exist_ok=True)
    for f in glob.glob(evdir + "/*"):
        os.remove(f)

    spark = (
        SparkSession.builder.appName("diag")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(2 * args.cores))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.local.dir", "/dev/shm/vxs-spark-local")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    from python_vegindex_spark.operators.features import turn_features
    from python_vegindex_spark.operators.rollup import rollup
    from python_vegindex_spark.config import RollupConfig
    from python_vegindex_spark.codecs.chunks import encode_chunks

    turns = spark.read.parquet(args.turns)
    t0 = time.perf_counter()
    if args.stage == "silver":
        turn_features(turns).write.mode("overwrite").parquet(
            "/dev/shm/vxs_diag_silver"
        )
    elif args.stage == "chunks":
        feats = turn_features(turns).select(
            "conv_id", "ts", F.col("fcc").alias("value")
        )
        n = encode_chunks(feats, "hourly", ["conv_id"]).count()
        print("chunks:", n)
    else:
        n = rollup(
            turn_features(turns), RollupConfig(tier="hourly", nmin=2)
        ).count()
        print("rollup rows:", n)
    wall = time.perf_counter() - t0
    print(f"WALL {args.stage} {wall:.2f}s")
    spark.stop()

    # parse event log
    stages = {}
    for path in glob.glob(evdir + "/*"):
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    dur = (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1e3
                    stages[sid] = {
                        "name": si["Stage Name"].split("\n")[0][:70],
                        "tasks": si["Number of Tasks"],
                        "wall_s": round(dur, 2),
                    }
                elif ev.get("Event") == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    if sid in stages:
                        st = stages[sid]
                    else:
                        st = stages.setdefault(sid, {})
                    ti = ev.get("Task Info", {})
                    rt = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1e3
                    st["task_time_sum_s"] = round(st.get("task_time_sum_s", 0) + rt, 2)
                    st["task_max_s"] = round(max(st.get("task_max_s", 0), rt), 2)
                    mx = ev.get("Task Metrics") or {}
                    st["cpu_sum_s"] = round(
                        st.get("cpu_sum_s", 0) + mx.get("Executor CPU Time", 0) / 1e9, 2
                    )
                    st["py_sum_s"] = st.get("py_sum_s", 0)
    for sid in sorted(stages):
        print(sid, json.dumps(stages[sid]))


if __name__ == "__main__":
    main()
