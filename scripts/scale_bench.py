"""Scaling-efficiency bench: the same pipeline at local[N] and local[4N].

Sandbox proxy for the north_rule's N -> 4N executor criterion (no real
cluster here): identical job + identical input, cold Spark session each,
launched via spark-submit --py-files. Efficiency =
(throughput@4N / throughput@N) / 4.

    python scripts/scale_bench.py [--n 8] [--nconvs 80000] [--repeat 1]

Writes/updates BENCH.md with the measured table.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_zip(path: str) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "python_vegindex_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))


def gen_turns(path: str, n_convs: int) -> int:
    sys.path.insert(0, REPO)
    from python_vegindex_spark.session import get_spark
    from python_vegindex_spark.sources.synth import synth_turns

    spark = get_spark("gen", master="local[32]")
    df = synth_turns(spark, n_convs=n_convs, seed=42)
    # 128 input splits: >=4 task waves at 32 cores, balanced at 8 cores
    df.repartition(128).write.mode("overwrite").parquet(path)
    n = spark.read.parquet(path).count()
    spark.stop()
    return n


def run_submit(cores: int, turns_path: str, zip_path: str) -> dict:
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(shutil.which("pyspark") or sys.executable), "spark-submit"
    )
    cmd = [
        spark_submit,
        "--master", f"local[{cores}]",
        "--driver-memory", "16g",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts/run_pipeline.py"),
        "--turns", turns_path,
        "--cores", str(cores),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("PIPELINE_METRICS "):
            return json.loads(line[len("PIPELINE_METRICS "):])
    sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:])
    raise RuntimeError(f"no metrics from local[{cores}] run")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--nconvs", type=int, default=80000)
    ap.add_argument("--turns", default="/tmp/vxs_scale_turns")
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    zip_path = "/tmp/pvs.zip"
    make_zip(zip_path)
    if not os.path.exists(os.path.join(args.turns, "_SUCCESS")):
        n = gen_turns(args.turns, args.nconvs)
        print(f"generated {n} turns at {args.turns}")

    results = {}
    for cores in (args.n, 4 * args.n):
        best = None
        for _ in range(args.repeat):
            m = run_submit(cores, args.turns, zip_path)
            if best is None or m["wall_s"] < best["wall_s"]:
                best = m
        results[cores] = best
        print(f"local[{cores}]: wall={best['wall_s']}s turns/s={best['turns_per_sec']}")

    lo, hi = results[args.n], results[4 * args.n]
    eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / 4.0
    summary = {
        "n_cores": args.n,
        "n4_cores": 4 * args.n,
        "n_turns": lo["n_turns"],
        "wall_n": lo["wall_s"],
        "wall_4n": hi["wall_s"],
        "turns_per_sec_n": lo["turns_per_sec"],
        "turns_per_sec_4n": hi["turns_per_sec"],
        "points_per_sec_n": lo["points_per_sec"],
        "points_per_sec_4n": hi["points_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "stages_n": lo["stages"],
        "stages_4n": hi["stages"],
    }
    print(json.dumps(summary))
    with open(os.path.join(REPO, "scale_bench_last.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
