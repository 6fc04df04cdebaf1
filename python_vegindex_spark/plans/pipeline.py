"""End-to-end rollup pipeline job — the spark-submit entry point.

    spark-submit --master local[8] --py-files pvs.zip \
        -m python_vegindex_spark.plans.pipeline  (or scripts/run_pipeline.py)

Stages (one logical plan per tier, shared scan + feature projection):
  bronze turns -> tier-1 features -> gold hourly/daily/weekly rollups
  -> hourly chunk encode (Gorilla/delta-of-delta) [-> retention]

Produces a metrics dict: per-stage wall seconds, row counts, and
turns/sec / points/sec throughput — the BASELINE.json reporting unit.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import RollupConfig
from ..codecs.chunks import encode_chunks
from ..operators.features import derive_features, turn_features_physical
from ..operators.rollup import rollup


def run_pipeline(
    spark: SparkSession,
    turns: DataFrame,
    out_root: str | None = None,
    tiers: tuple[str, ...] = ("hourly", "daily", "weekly"),
    nmin: int = 2,
    with_chunks: bool = True,
    work_dir: str | None = None,
    chunk_tier: str = "daily",
    fused: bool = False,
) -> dict:
    """Run the full pipeline; write parquet when ``out_root`` given,
    otherwise count() to force execution (bench mode).

    The tier-1 feature table (silver) is materialized ONCE to parquet and
    re-scanned by each tier — the production lakehouse layout. Parquet
    write/scan is CPU-scalable (encode/decode), unlike an in-memory cache
    whose fill is memory-bandwidth bound and flattens the 4N scaling.
    """
    import tempfile

    from ..session import scratch_dir

    metrics: dict = {"stages": {}}

    def execute(name: str, df: DataFrame) -> int:
        t0 = time.perf_counter()
        if out_root:
            df.write.mode("overwrite").parquet(f"{out_root}/{name}")
            n = spark.read.parquet(f"{out_root}/{name}").count()
        else:
            n = df.count()
        metrics["stages"][name] = {
            "wall_s": round(time.perf_counter() - t0, 3),
            "rows": n,
        }
        return n

    t_all = time.perf_counter()
    base_dir = work_dir or out_root
    tmp_base = None if base_dir else tempfile.mkdtemp(prefix="vxs_", dir=scratch_dir())
    silver_dir = (base_dir or tmp_base) + "/silver_features"
    t0 = time.perf_counter()
    # materialize only the physical columns (text folds + lag window);
    # derived measures are recomputed as projections on every read —
    # ~45% less silver write/read bandwidth, and silver is scanned once
    # per gold tier plus the chunk encoder
    turn_features_physical(turns).write.mode("overwrite").parquet(silver_dir)
    feats = derive_features(spark.read.parquet(silver_dir))
    n_turns = feats.count()
    metrics["stages"]["silver_features"] = {
        "wall_s": round(time.perf_counter() - t0, 3),
        "rows": n_turns,
    }
    metrics["n_turns"] = n_turns

    points = 0
    if fused:
        # one scan + one shuffle for every tier (operators/multitier);
        # written partitioned by tier so each tier's gold stays a
        # prunable directory, still a single execution
        from ..operators.multitier import rollup_tiers

        gold = rollup_tiers(
            feats, [RollupConfig(tier=t, nmin=nmin) for t in tiers]
        )
        t0 = time.perf_counter()
        if out_root:
            gold.write.mode("overwrite").partitionBy("tier").parquet(
                f"{out_root}/gold_tiers"
            )
            gold = spark.read.parquet(f"{out_root}/gold_tiers")
        per_tier = {
            r["tier"]: r["count"]
            for r in gold.groupBy("tier").count().collect()
        }
        points = sum(per_tier.values())
        metrics["stages"]["gold_tiers_fused"] = {
            "wall_s": round(time.perf_counter() - t0, 3),
            "rows": points,
            "per_tier": per_tier,
        }
    else:
        for tier in tiers:
            points += execute(
                f"gold_{tier}", rollup(feats, RollupConfig(tier=tier, nmin=nmin))
            )
    if with_chunks:
        # Chunk grain is a caller knob (default daily): hourly chunks of
        # conversational series average a handful of points (hot convs
        # pace ~15 min), so the per-chunk fixed cost dominates; day-sized
        # chunks amortize it ~24x while keeping per-group memory bounded
        # (TimescaleDB-style chunk sizing). Rollup tiers are unaffected —
        # chunks are the storage layer, not the aggregate grain. Callers
        # needing hourly parity with pre-r1 metrics pass
        # ``chunk_tier="hourly"``; the metrics key carries the grain.
        chunk_src = feats.select("conv_id", "ts", F.col("fcc").alias("value"))
        execute(
            f"chunks_{chunk_tier}",
            encode_chunks(chunk_src, chunk_tier, ["conv_id"]),
        )

    if tmp_base:
        # bench mode: the silver materialization was transient
        import shutil

        shutil.rmtree(tmp_base, ignore_errors=True)

    wall = time.perf_counter() - t_all
    metrics["wall_s"] = round(wall, 3)
    metrics["turns_per_sec"] = round(n_turns * len(tiers) / wall, 1)
    metrics["points_per_sec"] = round(points / wall, 1)
    metrics["rolled_points"] = points
    return metrics
