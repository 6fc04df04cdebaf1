"""Scaling-efficiency bench for the CORPUS pipeline (documents side).

Same protocol as scale_bench.py (cold spark-submit --py-files JVMs,
taskset-pinned to exactly N cores, /proc/stat steal sampling, best of
interleaved reps) but the job is scripts/corpus_job.py over a synthetic
documents table (sources/synth.synth_documents): quality gates ->
exact dedup -> MinHash-LSH fuzzy dedup -> sequence packing.

    python scripts/corpus_scale_bench.py [--n 2] [--ndocs 400000] [--repeat 2]

Prints one JSON line {"n_docs":..., "runs": {...}, "efficiency": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from scale_bench import _cpu_sample, make_zip  # noqa: E402

SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"


def gen_docs(path: str, n_docs: int) -> int:
    from python_vegindex_spark.session import get_spark
    from python_vegindex_spark.sources.synth import synth_documents

    spark = get_spark("gen-docs", master="local[32]")
    synth_documents(spark, n_docs=n_docs, seed=7).repartition(64).write.mode(
        "overwrite"
    ).parquet(path)
    n = spark.read.parquet(path).count()
    spark.stop()
    return n


def run_submit(cores: int, docs_path: str, zip_path: str, out_dir: str) -> dict:
    spark_submit = shutil.which("spark-submit")
    s0, t0 = _cpu_sample()
    cmd = []
    if shutil.which("taskset"):
        cmd += ["taskset", "-c", f"0-{cores - 1}"]
    cmd += [
        spark_submit,
        "--master", f"local[{cores}]",
        "--driver-memory", "16g",
        "--conf", f"spark.local.dir={SCRATCH}/vxs-spark-local",
        "--conf", f"spark.sql.shuffle.partitions={max(16, 4 * cores)}",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts/corpus_job.py"),
        "--docs", docs_path,
        "--out", out_dir,
        "--near-dup-jaccard", "0.8",
    ]
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
    t_wall = time.perf_counter()
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=3600, env=env
    )
    wall = time.perf_counter() - t_wall
    for line in out.stdout.splitlines():
        if line.startswith("CORPUS_METRICS "):
            m = json.loads(line[len("CORPUS_METRICS "):])
            s1, t1 = _cpu_sample()
            m["steal_pct"] = round(100.0 * (s1 - s0) / max(1, t1 - t0), 1)
            m["submit_wall_s"] = round(wall, 1)
            return m
    sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:])
    raise RuntimeError(f"no metrics from local[{cores}] run")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--ndocs", type=int, default=400_000)
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    # same node protocol as scale_bench.py (BENCH.md §3.1: DAMON reclaim
    # serializes multi-GB JVM heaps; restored on exit)
    import hosttune

    hosttune.tune(enable=os.environ.get("VXS_HOSTTUNE", "1") == "1")

    docs_path = f"{SCRATCH}/vxs_docs_{args.ndocs}"
    zip_path = "/tmp/pvs.zip"
    make_zip(zip_path)
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        n = gen_docs(docs_path, args.ndocs)
        print(f"generated {n} docs at {docs_path}", flush=True)

    n, n4 = args.n, 4 * args.n
    best: dict = {}
    for rep in range(args.repeat):
        for cores in (n, n4):
            m = run_submit(
                cores, docs_path, zip_path, f"{SCRATCH}/vxs_corpus_out_{cores}"
            )
            m["docs_per_sec"] = round(args.ndocs / m["wall_s"], 1)
            print(
                f"rep{rep} local[{cores}]: wall={m['wall_s']}s "
                f"docs/s={m['docs_per_sec']} steal={m['steal_pct']}%",
                flush=True,
            )
            k = str(cores)
            if k not in best or m["wall_s"] < best[k]["wall_s"]:
                best[k] = m

    eff = best[str(n)]["wall_s"] / (4.0 * best[str(n4)]["wall_s"])
    result = {
        "job": "corpus_pipeline(quality+dedup+fuzzy+pack)",
        "n_docs": args.ndocs,
        "pair": f"{n}->{n4}",
        "runs": {
            k: {
                "wall_s": v["wall_s"],
                "docs_per_sec": v["docs_per_sec"],
                "steal_pct": v["steal_pct"],
                "stages": v["stages"],
            }
            for k, v in best.items()
        },
        "efficiency": round(eff, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
