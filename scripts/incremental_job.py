"""spark-submit job script: fused incremental maintenance run.

    spark-submit --master local[N] --py-files /tmp/pvs.zip \
        scripts/incremental_job.py --turns <bronze_path> --store <dir> \
        [--tiers hourly,daily,weekly] [--nmin 2] [--backfill <delta_path>] \
        [--snapshots] [--history TIER | --rollback TIER:V | --expire TIER:K |
         --zorder TIER:COL,COL]

One bronze scan updates every gold tier past its checkpoint
(streaming/incremental.incremental_rollup_tiers); with ``--backfill``
the given delta parquet is ingested through backfill_rollup per tier
instead (late event times allowed). Prints one JSON metrics line,
marker-prefixed, like run_pipeline.py.
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
    ap.add_argument("--store", required=True)
    ap.add_argument("--tiers", default="hourly,daily,weekly")
    ap.add_argument("--nmin", type=int, default=2)
    ap.add_argument("--backfill", default=None,
                    help="delta parquet of late rows (event time may be "
                         "below the watermark); turns must already "
                         "contain them")
    ap.add_argument("--chunks-through", default=None,
                    help="also extend the compressed chunk tier with "
                         "closed buckets strictly before this ISO "
                         "timestamp (stored at <store>/chunks)")
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--snapshots", action="store_true",
                    help="store gold tiers as Iceberg-style snapshot "
                         "tables (atomic manifest commits, time travel, "
                         "rollback; sources/snapshots.py)")
    ap.add_argument("--rollback", default=None, metavar="TIER:VERSION",
                    help="instead of ingesting, roll a snapshot-mode "
                         "gold tier back to VERSION (metadata-only)")
    ap.add_argument("--history", default=None, metavar="TIER",
                    help="instead of ingesting, print a snapshot-mode "
                         "gold tier's commit history")
    ap.add_argument("--zorder", default=None, metavar="TIER:COL,COL",
                    help="instead of ingesting, rewrite the tier's gold "
                         "snapshot ZORDER BY the named columns (Morton-"
                         "clustered file groups with min/max zone maps "
                         "on those columns; snapshots.compact)")
    ap.add_argument("--zorder-target-rows", type=int, default=1_000_000,
                    metavar="N",
                    help="rows per file group for the --zorder rewrite "
                         "(sizes how many groups — and therefore how "
                         "much pruning granularity — the layout gets)")
    ap.add_argument("--hll", default=None, metavar="TIER[:KEY[:B]]",
                    help="also maintain the distinct-count sketch tier: "
                         "max-merge per-bucket HLL registers of KEY "
                         "(default conv_id) at TIER grain into gold "
                         "hll_<TIER> (monotone — no bucket invalidation)")
    ap.add_argument("--expire", default=None, metavar="TIER:KEEP",
                    help="instead of ingesting, expire all but the "
                         "newest KEEP snapshots of a gold tier (deletes "
                         "newly-unreferenced file groups)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from python_vegindex_spark.config import RollupConfig
    from python_vegindex_spark.session import scratch_dir
    from python_vegindex_spark.streaming.incremental import (
        RollupStore,
        backfill_rollup,
        incremental_rollup_tiers,
    )

    builder = (
        SparkSession.builder.appName("vxs-incremental")
        .config("spark.local.dir", os.path.join(scratch_dir(), "vxs-spark-local"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    if args.cores:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(max(16, 4 * args.cores))
        )
    spark = builder.getOrCreate()

    store = RollupStore(args.store, snapshots=args.snapshots)

    if args.history or args.rollback or args.expire or args.zorder:
        if not args.snapshots:
            ap.error("--history/--rollback/--expire/--zorder require --snapshots")
        if args.history:
            metrics = {"mode": "history", "tier": args.history,
                       "history": store.gold_snapshot(spark, args.history).history()}
        elif args.zorder:
            tier, _, cols = args.zorder.partition(":")
            zcols = [c for c in cols.split(",") if c]
            if not zcols:
                ap.error("--zorder needs TIER:COL[,COL...]")
            # stats_cols=zcols: the rewrite must RECORD zone maps on the
            # z-ordered columns or prune_range reads stay unselective
            snap = store.gold_snapshot(spark, tier, stats_cols=zcols)
            new_v = snap.compact(
                target_rows_per_file=args.zorder_target_rows,
                zorder_by=zcols,
            )
            m = snap._manifest(new_v)
            with_stats = sum(1 for g in m["files"] if g.get("stats"))
            metrics = {"mode": "zorder", "tier": tier, "zorder_by": zcols,
                       "new_version": new_v, "n_groups": len(m["files"]),
                       "groups_with_zone_maps": with_stats}
        elif args.rollback:
            tier, _, ver = args.rollback.partition(":")
            new_v = store.gold_snapshot(spark, tier).rollback(int(ver))
            metrics = {"mode": "rollback", "tier": tier,
                       "rolled_back_to": int(ver), "new_version": new_v}
        else:
            tier, _, keep = args.expire.partition(":")
            metrics = {"mode": "expire", "tier": tier,
                       **store.gold_snapshot(spark, tier).expire_snapshots(int(keep))}
        print("INCREMENTAL_METRICS " + json.dumps(metrics))
        spark.stop()
        return

    turns = spark.read.parquet(args.turns)
    cfgs = [
        RollupConfig(tier=t, nmin=args.nmin) for t in args.tiers.split(",")
    ]
    if args.backfill:
        delta = spark.read.parquet(args.backfill)
        metrics = {
            "mode": "backfill",
            "tiers": {
                c.tier: backfill_rollup(spark, turns, delta, store, c)
                for c in cfgs
            },
        }
    else:
        metrics = incremental_rollup_tiers(spark, turns, store, cfgs)
        metrics["mode"] = "incremental"

    if args.hll:
        from python_vegindex_spark.streaming.incremental import incremental_hll

        tier, _, rest = args.hll.partition(":")
        key, _, b_s = rest.partition(":")
        metrics["hll"] = incremental_hll(
            spark, turns, store, tier=tier or "hourly",
            key_col=key or "conv_id", b=int(b_s) if b_s else 5,
        )

    if args.chunks_through:
        from python_vegindex_spark.streaming.incremental import extend_chunks

        metrics["chunks"] = extend_chunks(
            spark, args.turns, f"{args.store}/chunks", args.chunks_through
        )

    def _clean(o):
        if isinstance(o, dict):
            return {k: _clean(v) for k, v in o.items()}
        return str(o) if hasattr(o, "isoformat") else o

    print("INCREMENTAL_METRICS " + json.dumps(_clean(metrics)))
    spark.stop()


if __name__ == "__main__":
    main()
