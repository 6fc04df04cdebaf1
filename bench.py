"""Benchmark harness — one JSON line on stdout.

Runs the engine's headline workloads on ``local[$SPARK_GRAFT_CPUS]``
(default local[32]) against ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) plus a synthetic transcript table (the engine's
native input shape), and prints::

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., ...extra}

Scaling-efficiency evidence (north_rule: >=0.8 from N to 4N cores) is
produced by scripts/scale_bench.py, which runs this same workload at
local[8] and local[32]; results recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
_SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
TURNS_PATH = os.environ.get(
    "SPARK_GRAFT_TURNS", f"{_SCRATCH}/vxs_bench_turns_{os.getuid()}"
)
N_CONVS = int(os.environ.get("SPARK_GRAFT_NCONVS", "40000"))


def main() -> None:
    # Benchmark entrypoint: opts into host tuning (DAMON reclaim off,
    # prominent print + restore-on-exit inside hosttune) and tmpfs
    # scratch. Disable with VXS_HOSTTUNE=0. Library code never does this.
    os.environ.setdefault("VXS_SCRATCH", "/dev/shm")
    try:
        from scripts import hosttune

        hosttune.tune(enable=os.environ.get("VXS_HOSTTUNE", "1") == "1")
    except Exception:
        pass

    from python_vegindex_spark.config import RollupConfig
    from python_vegindex_spark.operators.features import turn_features
    from python_vegindex_spark.operators.rollup import rollup
    from python_vegindex_spark.session import get_spark
    from python_vegindex_spark.sources.synth import synth_turns

    import __spark_entry__ as entrymod

    spark = get_spark("bench", master=f"local[{CPUS}]")

    def _stat_snap() -> tuple[int, int]:
        with open("/proc/stat") as f:
            parts = [int(x) for x in f.readline().split()[1:]]
        return parts[7] if len(parts) > 7 else 0, sum(parts)

    steal0, tot0 = _stat_snap()

    # --- synthetic transcript table (generated once, cached on disk) ------
    marker = os.path.join(TURNS_PATH, "_SUCCESS_MARKER")
    if not os.path.exists(marker):
        synth_turns(spark, n_convs=N_CONVS, seed=42).write.mode(
            "overwrite"
        ).parquet(TURNS_PATH)
        open(marker, "w").write("ok")
    turns = spark.read.parquet(TURNS_PATH)
    n_turns = turns.count()

    timings: dict[str, float] = {}
    colds: dict[str, float] = {}

    def run(name: str, fn) -> None:
        # three executions per query: the first pays one-time JIT/codegen
        # warmup (recorded as cold_queries); the reported steady-state
        # figure is the best of two warm runs — this host shows sporadic
        # hypervisor steal, and best-of-2 keeps round-over-round deltas
        # comparable instead of charging one query with a noise spike
        t0 = time.perf_counter()
        df = fn()
        n = df.count()  # forces full execution
        colds[name] = round(time.perf_counter() - t0, 3)
        warms = []
        for _ in range(2):
            t1 = time.perf_counter()
            fn().count()
            warms.append(time.perf_counter() - t1)
        timings[name] = round(min(warms), 3)
        timings[f"{name}_rows"] = n

    feats = turn_features(turns)
    for tier in ("hourly", "daily", "weekly"):
        run(
            f"rollup_{tier}",
            lambda tier=tier: rollup(feats, RollupConfig(tier=tier, nmin=2)),
        )

    # fused path: all three tiers from one scan + one shuffle
    from python_vegindex_spark.operators.multitier import rollup_tiers

    run(
        "rollup_3tier_fused",
        lambda: rollup_tiers(
            feats,
            [RollupConfig(tier=t, nmin=2) for t in ("hourly", "daily", "weekly")],
        ),
    )

    # storage tier: Gorilla/delta-of-delta chunk encode + decode roundtrip
    from pyspark.sql import functions as F

    from python_vegindex_spark.codecs.chunks import decode_chunks, encode_chunks

    chunk_src = feats.select("conv_id", "ts", F.col("fcc").alias("value"))
    run("chunks_encode", lambda: encode_chunks(chunk_src, "daily", ["conv_id"]))
    run(
        "chunks_roundtrip",
        lambda: decode_chunks(
            encode_chunks(chunk_src, "daily", ["conv_id"]), ["conv_id"]
        ),
    )

    # driver-table workloads (sf dir)
    qs = entrymod.queries()
    for name in (
        "hourly_rollup_gapfill",
        "asof_backward_join",
        "minhash_near_dups",
        "ann_cosine_topk",
        "tpch_pricing_summary",
        # LLM-pipeline / documents family (round-4: round-over-round
        # perf tracking for the corpus half of the engine, including
        # the post-fix TakeOrdered BM25 rank)
        "corpus_funnel",
        "bm25_search_docs",
        "cosine_pairs_docs",
        "bpe_merges_docs",
    ):
        run(name, lambda name=name: qs[name](spark, SF_DIR))

    query_secs = {k: v for k, v in timings.items() if not k.endswith("_rows")}
    total = round(sum(query_secs.values()), 3)
    rollup_secs = sum(
        v
        for k, v in query_secs.items()
        if k.startswith("rollup_") and k != "rollup_3tier_fused"
    )
    fused_sec = query_secs.get("rollup_3tier_fused")
    out = {
        "metric": "engine_bench_total_wall",
        "value": total,
        "unit": "sec",
        "queries": query_secs,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "n_turns": n_turns,
        "turns_per_sec_3tier": round(3 * n_turns / rollup_secs, 1) if rollup_secs else None,
        "turns_per_sec_3tier_fused": round(3 * n_turns / fused_sec, 1) if fused_sec else None,
        "rows": {k[:-5]: v for k, v in timings.items() if k.endswith("_rows")},
        "cold_queries": colds,
        "cpus": int(CPUS),
    }
    steal1, tot1 = _stat_snap()
    if tot1 > tot0:
        # hypervisor steal across the whole bench window — a noisy host
        # shows here, so a slow round can be told apart from a slow engine
        out["steal_pct"] = round(100.0 * (steal1 - steal0) / (tot1 - tot0), 1)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
