"""Checkpoint-resumable incremental rollup + retention + lineage.

The batch-incremental contract of the reference ``update_*`` scripts,
re-expressed over tables:

* watermark — resume from the max ingested ``ts`` recorded in a
  checkpoint table (update_roi_timeseries.py:134-139 resumes from the
  last CSV row's timestamp).
* bucket invalidation — a series' LAST summary bucket is always
  recomputed because new data may extend an open period
  (update_summary_timeseries.py:246-256). Here per-conv: recompute from
  min(conv's last gold bucket, conv's first new-turn bucket) through the
  conv's last new bucket — gap buckets in between are (re)emitted.
* lag-correctness — per-turn latency deltas need each conv's last turn
  BEFORE the invalidation window; fetched as one max-struct aggregate
  over the old slice (bounded by #affected convs), unioned in, then
  dropped after feature computation.
* upsert — recomputed rows MERGE into gold on (conv_id, bucket_start)
  via TableIO (Iceberg MERGE in production).
* lineage/metrics — one append-only row per (run, tier): rows in/out,
  watermarks, wall time (north_rule).
* retention — raw day-partitions older than a horizon are dropped only
  after chunk row-counts verify the day is fully represented in the
  compressed tier (north_rule "drop raw turns while preserving rollups").
* tiered reads — :func:`read_tiered` queries across the retention
  boundary: old days decode from the chunk tier (zone-map pruned),
  new days scan bronze (partition-pruned), one shuffle-free union.

Invariant (tested): initial-load + N incremental runs == one full
recompute, cell-for-cell, for every tier.
"""

from __future__ import annotations

import shutil
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..codecs.chunks import decode_chunks
from ..config import RollupConfig
from ..functions.buckets import bucket_start
from ..operators.features import turn_features
from ..operators.rollup import rollup
from ..sources import tableio
from ..sources.bronze import read_turns


@dataclass
class RollupStore:
    """Directory layout for one engine instance.

    ``snapshots=True`` stores every gold tier as an Iceberg-style
    :class:`..sources.snapshots.SnapshotTable` instead of bare parquet:
    each maintenance run lands as one atomic manifest commit (readers
    stay snapshot-isolated during the MERGE), the tier keeps a commit
    history with time travel, and a bad run is undone with a
    metadata-only ``rollback``. Copy-on-write scope is tracked on
    ``bucket_start``, so an incremental run that touches only the tail
    buckets carries untouched file groups over by reference.
    Checkpoint/lineage tables stay append-only parquet either way —
    they are themselves the recovery log.
    """

    root: str
    snapshots: bool = False

    @property
    def checkpoint(self) -> str:
        return f"{self.root}/checkpoints"

    @property
    def lineage(self) -> str:
        return f"{self.root}/lineage"

    def gold(self, tier: str) -> str:
        return f"{self.root}/gold_{tier}"

    def gold_snapshot(
        self, spark: SparkSession, tier: str, stats_cols: list[str] | None = None
    ):
        """The gold tier's SnapshotTable handle (snapshots mode only) —
        for time travel, history and rollback at the call site.
        ``stats_cols`` opts written groups into per-group min/max zone
        maps on those columns (needed before a ZORDER rewrite can make
        ``prune_range`` reads selective)."""
        if not self.snapshots:
            raise ValueError("store was not created with snapshots=True")
        from ..sources.snapshots import SnapshotTable

        return SnapshotTable(
            spark,
            self.gold(tier),
            partition_by=["bucket_start"],
            stats_cols=stats_cols,
        )

    def read_gold(self, spark: SparkSession, tier: str) -> DataFrame | None:
        if self.snapshots:
            return self.gold_snapshot(spark, tier).read()
        return tableio.read(spark, self.gold(tier))

    def upsert_gold(
        self, spark: SparkSession, df: DataFrame, tier: str, keys: list[str]
    ) -> int:
        if self.snapshots:
            n = df.count()
            self.gold_snapshot(spark, tier).upsert(df, keys=keys)
            return n
        return tableio.upsert(spark, df, self.gold(tier), keys=keys)

    def overwrite_gold(self, spark: SparkSession, df: DataFrame, tier: str) -> None:
        if self.snapshots:
            self.gold_snapshot(spark, tier).overwrite(df)
        else:
            tableio.overwrite(df, self.gold(tier))


def _high_water(spark: SparkSession, store: RollupStore, tier: str):
    ck = tableio.read(spark, store.checkpoint)
    if ck is None:
        return None
    row = (
        ck.filter(F.col("tier") == tier)
        .agg(F.max("high_water_ts").alias("hw"))
        .collect()[0]
    )
    return row["hw"]


def incremental_rollup(
    spark: SparkSession,
    turns: DataFrame,
    store: RollupStore,
    cfg: RollupConfig,
    run_id: str | None = None,
) -> dict:
    """Ingest all turns with ts > checkpoint watermark into the gold tier.

    ``turns`` is the bronze table (possibly already pruned by the caller
    with read_turns bounds). Returns a metrics dict (also appended to the
    lineage table).
    """
    t0 = time.perf_counter()
    run_id = run_id or uuid.uuid4().hex[:12]
    tier = cfg.tier
    hw = _high_water(spark, store, tier)

    new = turns if hw is None else turns.filter(F.col("ts") > F.lit(hw))
    affected = new.select("conv_id").distinct()

    existing = store.read_gold(spark, tier)

    if hw is None or existing is None:
        slice_df = new.withColumn("_helper", F.lit(False))
        invalid = None
    else:
        # per-conv invalidation start: min(last gold bucket, first new bucket)
        last_gold = (
            existing.join(F.broadcast(affected), on="conv_id", how="left_semi")
            .groupBy("conv_id")
            .agg(F.max("bucket_start").alias("_lgb"))
        )
        first_new = (
            new.withColumn("_b", bucket_start(F.col("ts"), tier))
            .groupBy("conv_id")
            .agg(F.min("_b").alias("_fnb"))
        )
        invalid = first_new.join(last_gold, on="conv_id", how="left").select(
            "conv_id",
            F.least(
                F.col("_fnb"), F.coalesce(F.col("_lgb"), F.col("_fnb"))
            ).alias("invalid_from"),
        )
        # raw turns for all invalidated buckets of affected convs
        slice_turns = (
            turns.join(F.broadcast(invalid), on="conv_id")
            .filter(bucket_start(F.col("ts"), tier) >= F.col("invalid_from"))
            .drop("invalid_from")
        )
        # each conv's last turn BEFORE the slice, for lag correctness —
        # picked by max turn_idx (ts as tie-break), because turn_features'
        # lag window orders by turn_idx: choosing by max ts would hand the
        # recomputed region a different lag base whenever ts is not
        # monotonic in turn_idx (clock skew), breaking increment == full
        older = turns.join(F.broadcast(invalid), on="conv_id").filter(
            bucket_start(F.col("ts"), tier) < F.col("invalid_from")
        )
        prev_payload = F.struct(
            F.col("turn_idx").alias("_o"),
            F.col("ts").alias("_o2"),
            *[F.col(c) for c in turns.columns],
        )
        prev_rows = (
            older.groupBy("conv_id")
            .agg(F.max(prev_payload).alias("_m"))
            .select(*[F.col("_m")[c].alias(c) for c in turns.columns])
        )
        slice_df = slice_turns.withColumn("_helper", F.lit(False)).unionByName(
            prev_rows.withColumn("_helper", F.lit(True))
        )

    # ONE materialization reused by the lineage count, the rollup input,
    # and the watermark — without it each action re-scans bronze and
    # re-runs the invalidation joins (3 full scans per run)
    slice_df = slice_df.localCheckpoint(eager=True)
    real_rows = slice_df.filter(~F.col("_helper"))
    # lineage counts INGESTED rows only (ts past the watermark) — never
    # the synthetic lag helpers, and never the OLD rows the invalidation
    # window re-reads; matches incremental_rollup_tiers' accounting
    new_rows = real_rows if hw is None else real_rows.filter(F.col("ts") > F.lit(hw))
    rows_in = new_rows.count()
    if rows_in == 0:
        metrics = {
            "run_id": run_id, "tier": tier, "rows_in": 0, "rows_out": 0,
            "hw_old": hw, "hw_new": hw, "wall_ms": int((time.perf_counter() - t0) * 1000),
        }
        _append_lineage(spark, store, metrics)
        return metrics

    feats = turn_features(slice_df.drop("_helper"))
    if invalid is not None:
        # drop the lag-helper rows (anything before the invalidation start)
        feats = feats.join(F.broadcast(invalid), on="conv_id").filter(
            bucket_start(F.col("ts"), tier) >= F.col("invalid_from")
        ).drop("invalid_from")

    out = rollup(feats, cfg)
    rows_out = store.upsert_gold(
        spark, out, tier, keys=["conv_id", "bucket_start"]
    )

    # max over the checkpointed non-helper rows == max over `new` (old
    # rows in invalidated buckets all have ts <= the previous watermark),
    # without a third bronze scan
    hw_new = real_rows.agg(F.max("ts")).collect()[0][0] or hw
    ck_row = spark.createDataFrame(
        [(tier, hw_new, run_id)], "tier string, high_water_ts timestamp, run_id string"
    )
    tableio.append(ck_row, store.checkpoint)

    metrics = {
        "run_id": run_id, "tier": tier, "rows_in": rows_in, "rows_out": rows_out,
        "hw_old": hw, "hw_new": hw_new,
        "wall_ms": int((time.perf_counter() - t0) * 1000),
    }
    _append_lineage(spark, store, metrics)
    return metrics


def incremental_rollup_tiers(
    spark: SparkSession,
    turns: DataFrame,
    store: RollupStore,
    cfgs: list[RollupConfig],
    run_id: str | None = None,
) -> dict:
    """One incremental run maintaining EVERY tier from ONE bronze scan.

    :func:`incremental_rollup` per tier re-derives the invalidation
    slice from bronze each time — three tiers, three full scans per
    nightly run. This fused variant computes one shared slice (per
    conv: rows needed by ANY tier, i.e. from the earliest per-tier
    invalidation window, plus one lag-helper row before all of them),
    derives features once, then per tier filters to that tier's own
    window, rolls up and upserts. Semantics per tier are identical to
    the single-tier operator (pinned: increments across all tiers ≡
    full recompute, per tier).

    Watermark: the shared ``new``-row set uses the MINIMUM of the
    per-tier checkpoints (a lagging tier widens the slice for everyone
    — more recompute, never wrong); each tier still records its own
    checkpoint + lineage row. Intended for tiers maintained together;
    a brand-new tier (no checkpoint) forces a full-history slice.
    """
    t0 = time.perf_counter()
    run_id = run_id or uuid.uuid4().hex[:12]
    hws = {c.tier: _high_water(spark, store, c.tier) for c in cfgs}
    hw_min = None if any(v is None for v in hws.values()) else min(hws.values())

    new = turns if hw_min is None else turns.filter(F.col("ts") > F.lit(hw_min))
    affected = new.select("conv_id").distinct()

    existing = {c.tier: store.read_gold(spark, c.tier) for c in cfgs}
    fresh = hw_min is None or any(existing[c.tier] is None for c in cfgs)

    if fresh:
        slice_df = new.withColumn("_helper", F.lit(False))
        invalids: dict[str, DataFrame] = {}
    else:
        invalids = {}
        for c in cfgs:
            b = bucket_start(F.col("ts"), c.tier)
            last_gold = (
                existing[c.tier]
                .join(F.broadcast(affected), on="conv_id", how="left_semi")
                .groupBy("conv_id")
                .agg(F.max("bucket_start").alias("_lgb"))
            )
            first_new = (
                new.withColumn("_b", b)
                .groupBy("conv_id")
                .agg(F.min("_b").alias("_fnb"))
            )
            invalids[c.tier] = first_new.join(
                last_gold, on="conv_id", how="left"
            ).select(
                "conv_id",
                F.least(
                    F.col("_fnb"), F.coalesce(F.col("_lgb"), F.col("_fnb"))
                ).alias(f"_if_{c.tier}"),
            )
        inv_all = invalids[cfgs[0].tier]
        for c in cfgs[1:]:
            inv_all = inv_all.join(invalids[c.tier], on="conv_id")
        # a row is in the shared slice if ANY tier's window covers it
        needed = None
        for c in cfgs:
            cond = bucket_start(F.col("ts"), c.tier) >= F.col(f"_if_{c.tier}")
            needed = cond if needed is None else (needed | cond)
        tagged = turns.join(F.broadcast(inv_all), on="conv_id")
        slice_turns = tagged.filter(needed).drop(
            *[f"_if_{c.tier}" for c in cfgs]
        )
        # one lag-helper row per conv: the last turn before EVERY window
        older = tagged.filter(~needed)
        prev_payload = F.struct(
            F.col("turn_idx").alias("_o"),
            F.col("ts").alias("_o2"),
            *[F.col(c) for c in turns.columns],
        )
        prev_rows = (
            older.groupBy("conv_id")
            .agg(F.max(prev_payload).alias("_m"))
            .select(*[F.col("_m")[c].alias(c) for c in turns.columns])
        )
        slice_df = slice_turns.withColumn("_helper", F.lit(False)).unionByName(
            prev_rows.withColumn("_helper", F.lit(True))
        )

    slice_df = slice_df.localCheckpoint(eager=True)
    real_rows = slice_df.filter(~F.col("_helper"))
    rows_in = (
        real_rows.filter(
            F.col("ts") > F.lit(hw_min)
        ).count()
        if hw_min is not None
        else real_rows.count()
    )
    metrics: dict = {"run_id": run_id, "rows_in": rows_in, "tiers": {}}
    if rows_in == 0:
        for c in cfgs:
            m = {
                "run_id": run_id, "tier": c.tier, "rows_in": 0, "rows_out": 0,
                "hw_old": hws[c.tier], "hw_new": hws[c.tier],
                "wall_ms": int((time.perf_counter() - t0) * 1000),
            }
            _append_lineage(spark, store, m)
            metrics["tiers"][c.tier] = m
        return metrics

    feats_all = turn_features(slice_df.drop("_helper")).localCheckpoint(
        eager=True
    )
    hw_new = real_rows.agg(F.max("ts")).collect()[0][0] or hw_min
    for c in cfgs:
        feats = feats_all
        if not fresh:
            feats = feats.join(
                F.broadcast(invalids[c.tier]), on="conv_id"
            ).filter(
                bucket_start(F.col("ts"), c.tier) >= F.col(f"_if_{c.tier}")
            ).drop(f"_if_{c.tier}")
        out = rollup(feats, c)
        rows_out = store.upsert_gold(
            spark, out, c.tier, keys=["conv_id", "bucket_start"]
        )
        ck_row = spark.createDataFrame(
            [(c.tier, hw_new, run_id)],
            "tier string, high_water_ts timestamp, run_id string",
        )
        tableio.append(ck_row, store.checkpoint)
        m = {
            "run_id": run_id, "tier": c.tier, "rows_in": rows_in,
            "rows_out": rows_out, "hw_old": hws[c.tier], "hw_new": hw_new,
            "wall_ms": int((time.perf_counter() - t0) * 1000),
        }
        _append_lineage(spark, store, m)
        metrics["tiers"][c.tier] = m
    return metrics


def backfill_rollup(
    spark: SparkSession,
    turns: DataFrame,
    delta: DataFrame,
    store: RollupStore,
    cfg: RollupConfig,
    run_id: str | None = None,
) -> dict:
    """Delta-driven (CDC / backfill) ingestion: recompute exactly the
    gold buckets a late batch touches.

    :func:`incremental_rollup` is watermark-based, so rows whose EVENT
    time is at or below the checkpoint are invisible to it — the
    standard watermark contract (and the reference's:
    update_roi_timeseries.py:134-139 resumes strictly after the last
    CSV timestamp). Real lakehouse operations still produce such rows:
    repair loads, late-arriving export partitions, backfilled history.
    ``delta`` is the newly ingested row set as identified by the INGEST
    layer (an Iceberg snapshot diff, the files of the appended batch) —
    any event times, append-only on the (conv_id, turn_idx) key;
    ``turns`` is the bronze table AFTER the append (delta ⊆ turns).

    Invalidation is a bucket SET, not a tail range:

    * buckets containing delta rows, and
    * the bucket of each delta row's SUCCESSOR turn — the one existing
      row whose lag base changed (latency_delta = lag(ts) over
      (conv_id ORDER BY turn_idx)), plus
    * for delta rows OUTSIDE the conv's current gold [min, max] bucket
      range, the lattice buckets between the old boundary and the new
      extreme — so the count-0 spine rows a full recompute would emit
      there exist after the backfill too (new convs span min..max of
      their own delta).

    A 1-row repair two years back therefore recomputes ≤ 2 buckets,
    not two years of tail. Features are recomputed over the affected
    convs' full turn history (lag-correct by construction; the shuffle
    is bounded by those convs' row counts, and the scan is one
    bronze pass filtered by a broadcast semi-join — the same cost
    class as incremental_rollup's invalidation scan), aggregated with
    gap-fill OFF, then count-0 rows are synthesized for invalidated
    buckets that hold no post-QC rows. Invariant (tested): any mix of
    watermark increments and backfills equals one full recompute.
    """
    from ..functions.buckets import _bucket_seq, bucket_center

    t0 = time.perf_counter()
    run_id = run_id or uuid.uuid4().hex[:12]
    tier = cfg.tier
    hw = _high_water(spark, store, tier)
    existing = store.read_gold(spark, tier)

    rows_in = delta.count()
    if rows_in == 0:
        metrics = {
            "run_id": run_id, "tier": tier, "rows_in": 0, "rows_out": 0,
            "hw_old": hw, "hw_new": hw,
            "wall_ms": int((time.perf_counter() - t0) * 1000),
        }
        _append_lineage(spark, store, metrics)
        return metrics

    affected = delta.select("conv_id").distinct()
    conv_rows = turns.join(F.broadcast(affected), on="conv_id", how="left_semi")

    # ---- invalid bucket set ---------------------------------------------
    from pyspark.sql.window import Window

    b = bucket_start(F.col("ts"), tier)
    keyed = conv_rows.join(
        F.broadcast(
            delta.select("conv_id", "turn_idx").withColumn("_is_new", F.lit(True))
        ),
        on=["conv_id", "turn_idx"],
        how="left",
    ).withColumn("_is_new", F.coalesce(F.col("_is_new"), F.lit(False)))
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    touched = (
        keyed.withColumn(
            "_touch",
            F.col("_is_new")
            | F.coalesce(F.lag("_is_new").over(w), F.lit(False)),
        )
        .filter(F.col("_touch"))
        .select("conv_id", b.alias("bucket_start"))
        .distinct()
    )

    # lattice extension beyond the conv's current gold bucket range.
    # Bounds come from the POST-QC delta rows: a full recompute's
    # gap-fill spine spans only post-QC buckets, so a QC-failing delta
    # row beyond the gold range must NOT stretch the lattice (it would
    # upsert count-0 rows a full recompute never emits). QC must be
    # evaluated on LAG-CORRECT features (dnsum includes the latency
    # measure, which needs each row's predecessor), so the delta rows
    # are selected out of the full-history feature table by key.
    from ..operators.rollup import qc_filter

    feats = turn_features(conv_rows).localCheckpoint(eager=True)
    delta_qc = (
        qc_filter(feats, cfg)
        .join(
            F.broadcast(delta.select("conv_id", "turn_idx")),
            on=["conv_id", "turn_idx"],
            how="left_semi",
        )
        .select("conv_id", bucket_start(F.col("ts"), tier).alias("_b"))
    )
    new_bounds = delta_qc.groupBy("conv_id").agg(
        F.min("_b").alias("_min_nb"), F.max("_b").alias("_max_nb")
    )
    if existing is not None:
        gold_bounds = (
            existing.join(F.broadcast(affected), on="conv_id", how="left_semi")
            .groupBy("conv_id")
            .agg(
                F.min("bucket_start").alias("_min_gb"),
                F.max("bucket_start").alias("_max_gb"),
            )
        )
        # FULL join: gold-only convs (all delta rows QC-fail) still need
        # a span row below for the gap clamp
        bounds = new_bounds.join(gold_bounds, on="conv_id", how="full")
    else:
        bounds = new_bounds.withColumn("_min_gb", F.lit(None)).withColumn(
            "_max_gb", F.lit(None)
        )
    no_gold = F.col("_min_gb").isNull()
    ranges = F.array_compact(
        F.array(
            F.when(
                no_gold,
                F.struct(F.col("_min_nb").alias("lo"), F.col("_max_nb").alias("hi")),
            ),
            F.when(
                ~no_gold & (F.col("_max_nb") > F.col("_max_gb")),
                F.struct(F.col("_max_gb").alias("lo"), F.col("_max_nb").alias("hi")),
            ),
            F.when(
                ~no_gold & (F.col("_min_nb") < F.col("_min_gb")),
                F.struct(F.col("_min_nb").alias("lo"), F.col("_min_gb").alias("hi")),
            ),
        )
    )
    ext = (
        bounds.select("conv_id", F.explode(ranges).alias("_r"))
        .select(
            "conv_id",
            F.explode(
                _bucket_seq(F.col("_r.lo"), F.col("_r.hi"), tier)
            ).alias("bucket_start"),
        )
        .distinct()
    )
    invalid = touched.unionByName(ext).distinct().localCheckpoint(eager=True)
    n_invalid = invalid.count()

    # the conv's FULL-recompute spine span: gold bounds (the old post-QC
    # spine) widened by post-QC delta bounds. Count-0 gap rows may only
    # be emitted INSIDE it — a touched bucket past the last post-QC row
    # (its only occupant failed QC) gets recomputed-to-empty, not a
    # spine row a full recompute wouldn't have.
    span = bounds.select(
        "conv_id",
        F.least(
            F.coalesce("_min_nb", "_min_gb"), F.coalesce("_min_gb", "_min_nb")
        ).alias("_span_lo"),
        F.greatest(
            F.coalesce("_max_nb", "_max_gb"), F.coalesce("_max_gb", "_max_nb")
        ).alias("_span_hi"),
    )

    # ---- recompute exactly those buckets ---------------------------------
    # (feats computed above, checkpointed: reused by the QC'd lattice
    # bounds and this recompute without re-running the lag window)
    slice_feats = feats.withColumn("_b", bucket_start(F.col("ts"), tier)).join(
        F.broadcast(invalid.withColumnRenamed("bucket_start", "_b")),
        on=["conv_id", "_b"],
        how="left_semi",
    ).drop("_b")
    out = rollup(slice_feats, cfg, gap_fill=False)

    # count-0 rows for invalidated buckets with no surviving post-QC rows
    # (the rows a full recompute's gap-fill spine would emit there)
    gaps = (
        invalid.join(out, on=["conv_id", "bucket_start"], how="left_anti")
        .join(F.broadcast(span), on="conv_id")
        .filter(
            F.col("bucket_start").between(F.col("_span_lo"), F.col("_span_hi"))
        )
        .select("conv_id", "bucket_start")
    )
    center = bucket_center(F.col("bucket_start"), tier)
    label_cols = {
        "bucket_center": center,
        "year": F.year(center),
        "doy": F.dayofyear(center),
        "hour": F.hour("bucket_start") if tier == "hourly" else F.lit(None),
        "turn_count": F.lit(0),
    }
    gap_rows = gaps.select(
        "conv_id",
        "bucket_start",
        *[
            (label_cols[c] if c in label_cols else F.lit(None))
            .cast(out.schema[c].dataType)
            .alias(c)
            for c in out.columns
            if c not in ("conv_id", "bucket_start")
        ],
    )
    out = out.unionByName(gap_rows)

    rows_out = store.upsert_gold(
        spark, out, tier, keys=["conv_id", "bucket_start"]
    )

    # the watermark never moves backwards on a backfill
    hw_delta = delta.agg(F.max("ts")).collect()[0][0]
    hw_new = max(x for x in (hw, hw_delta) if x is not None)
    ck_row = spark.createDataFrame(
        [(tier, hw_new, run_id)],
        "tier string, high_water_ts timestamp, run_id string",
    )
    tableio.append(ck_row, store.checkpoint)

    metrics = {
        "run_id": run_id, "tier": tier, "rows_in": rows_in,
        "rows_out": rows_out, "buckets_invalidated": n_invalid,
        "hw_old": hw, "hw_new": hw_new,
        "wall_ms": int((time.perf_counter() - t0) * 1000),
    }
    _append_lineage(spark, store, metrics)
    return metrics


def _append_lineage(spark: SparkSession, store: RollupStore, m: dict) -> None:
    row = spark.createDataFrame(
        [
            (
                m["run_id"], m["tier"], m["rows_in"], m["rows_out"],
                m["hw_old"], m["hw_new"], m["wall_ms"],
            )
        ],
        "run_id string, tier string, rows_in long, rows_out long, "
        "hw_old timestamp, hw_new timestamp, wall_ms long",
    ).withColumn("logged_at", F.current_timestamp())
    tableio.append(row, store.lineage)


# ---------------------------------------------------------------------------
# retention compaction
# ---------------------------------------------------------------------------

def compact_retention(
    spark: SparkSession,
    turns_path: str,
    chunks: DataFrame,
    older_than: str,
) -> dict:
    """Drop raw day-partitions (``ts_date=YYYY-MM-DD`` dirs) strictly older
    than ``older_than`` IF the chunk table fully accounts for that day's
    rows (sum of n_points == raw count). Days failing verification are
    kept and reported. Local-FS directory delete here; Iceberg
    ``DELETE WHERE`` + snapshot expiry in production.
    """
    import os

    raw_counts = (
        spark.read.parquet(turns_path)
        .filter(F.col("ts_date") < F.lit(older_than))
        .groupBy("ts_date")
        .count()
        .collect()
    )
    # the verification attributes each chunk's n_points to
    # to_date(first_ts), which is only sound when every chunk is
    # day-contained — a multi-day chunk would count later days' points
    # against its first day, falsely verifying a partially-encoded day
    # (and deleting raw rows the chunk tier doesn't hold). Enforce it.
    spanning = (
        chunks.filter(F.to_date("first_ts") != F.to_date("last_ts")).limit(1).count()
    )
    if spanning:
        raise ValueError(
            "compact_retention requires a day-contained chunk tier "
            "(daily or finer; a chunk spans a day boundary) — "
            "re-encode with tier='daily' or verify at the chunk grain"
        )
    chunk_counts = {
        r["d"]: r["n"]
        for r in chunks.filter(F.to_date("first_ts") < F.lit(older_than))
        .groupBy(F.to_date("first_ts").alias("d"))
        .agg(F.sum("n_points").alias("n"))
        .collect()
    }
    dropped, kept = [], []
    for r in raw_counts:
        day, n_raw = r["ts_date"], r["count"]
        if chunk_counts.get(day, 0) == n_raw:
            part_dir = os.path.join(turns_path, f"ts_date={day.isoformat()}")
            if os.path.isdir(part_dir):
                shutil.rmtree(part_dir)
                dropped.append(str(day))
        else:
            kept.append(str(day))
    return {"dropped_days": sorted(dropped), "kept_unverified": sorted(kept)}


def extend_chunks(
    spark: SparkSession,
    turns_path: str,
    chunks_path: str,
    through: str,
    chunk_tier: str = "daily",
    series_cols: list[str] | None = None,
    value_expr: str = "CAST(length(text) AS DOUBLE)",
) -> dict:
    """Incrementally extend the compressed chunk tier: encode only the
    buckets past the chunk table's own high-water mark and strictly
    before ``through`` (pass "yesterday" — the chunk tier holds CLOSED
    buckets only, so an in-flight day is never half-encoded; explicit,
    never wall-clock). The bronze read is bounded by both edges, so via
    ``read_turns``'s ts_date pruning the scan cost is proportional to
    the NEW days, not the table — the nightly twin of
    :func:`incremental_rollup` for the storage tier, feeding
    :func:`compact_retention`'s verified raw-partition drops.
    """
    from ..codecs.chunks import encode_chunks

    series = series_cols or ["conv_id"]
    existing = tableio.read(spark, chunks_path)
    hw = (
        existing.agg(F.max("bucket_start")).collect()[0][0]
        if existing is not None
        else None
    )
    lo = None if hw is None else str(hw)
    src = read_turns(spark, turns_path, lo, through).select(
        *series, "ts", F.expr(value_expr).alias("value")
    )
    b = bucket_start(F.col("ts"), chunk_tier)
    src = src.filter(b < F.lit(through).cast("timestamp"))
    if hw is not None:
        src = src.filter(b > F.lit(hw))
    new_chunks = encode_chunks(src, chunk_tier, series).localCheckpoint(
        eager=True
    )
    added = new_chunks.count()
    points = (
        new_chunks.agg(F.sum("n_points")).collect()[0][0] or 0 if added else 0
    )
    if added:
        tableio.append(new_chunks, chunks_path)
    hw_new = (
        tableio.read(spark, chunks_path).agg(F.max("bucket_start")).collect()[0][0]
        if added or existing is not None
        else None
    )
    return {
        "chunks_added": added,
        "points_encoded": int(points),
        "hw_old": hw,
        "hw_new": hw_new,
    }


def compact_gold_retention(
    spark: SparkSession,
    store: RollupStore,
    fine_tier: str,
    coarse_tier: str,
    older_than: str,
    series_cols: list[str] | None = None,
    count_col: str = "turn_count",
) -> dict:
    """Multi-resolution gold retention: drop FINE-tier buckets older
    than a horizon once the COARSE tier verifiably covers them — the
    "hourly for 30 days, daily for a year, weekly forever" ladder of
    production time-series stores (TimescaleDB retention policies on
    continuous aggregates), completing the raw→chunk compaction
    (:func:`compact_retention`) one level up.

    Verification is the cascade's own algebra: for each coarse bucket
    whose WINDOW closes strictly before ``older_than``, the sum of the
    fine rows' ``count_col`` must equal the coarse row's — counts
    compose exactly under the lattice-nesting rule
    (``operators.cascade._check_nesting`` validates the tier pair), so
    a mismatch means the tiers disagree and the fine rows are KEPT and
    reported, never silently destroyed. Coarse buckets straddling the
    horizon, or absent from the coarse gold, also keep their fine rows.

    Parquet emulation: anti-join + overwrite (Iceberg ``DELETE WHERE``
    in production, same predicate).
    """
    from ..operators.cascade import _check_nesting, _tier_grain

    _check_nesting(fine_tier, coarse_tier)
    series = series_cols or ["conv_id"]
    fine = store.read_gold(spark, fine_tier)
    coarse = store.read_gold(spark, coarse_tier)
    if fine is None or coarse is None:
        return {"dropped_rows": 0, "dropped_buckets": 0, "kept_unverified": 0}

    cb = bucket_start(F.col("bucket_start"), coarse_tier)
    kind, width = _tier_grain(coarse_tier)
    if kind == "fixed":
        cb_end = F.to_timestamp(cb) + F.expr(f"INTERVAL {width} SECONDS")
    else:
        cb_end = F.to_timestamp(F.date_add(cb, width))
    horizon = F.lit(older_than).cast("timestamp")

    cand = fine.withColumn("_cb", cb).withColumn("_closed", cb_end <= horizon)
    sums = (
        cand.filter("_closed")
        .groupBy(*series, "_cb")
        .agg(F.sum(count_col).alias("_fine_n"))
    )
    cov = coarse.select(
        *series,
        F.col("bucket_start").alias("_cb"),
        F.col(count_col).alias("_coarse_n"),
    )
    # pin the small bucket-level join once: the two counts below would
    # otherwise each re-run the sums/cov aggregation lineage
    joined = sums.join(cov, on=[*series, "_cb"], how="left").localCheckpoint(
        eager=True
    )
    verified = joined.filter(
        F.col("_coarse_n").isNotNull() & (F.col("_coarse_n") == F.col("_fine_n"))
    ).select(*series, "_cb")
    n_unverified = joined.count() - verified.count()

    keys = verified.localCheckpoint(eager=True)
    n_buckets = keys.count()
    # no broadcast hint: the dropped-bucket key set can be arbitrarily
    # large (years of buckets x series); AQE picks the join strategy
    remaining = (
        fine.withColumn("_cb", cb)
        .join(keys, on=[*series, "_cb"], how="left_anti")
        .drop("_cb")
        .localCheckpoint(eager=True)
    )
    dropped_rows = fine.count() - remaining.count()
    store.overwrite_gold(spark, remaining, fine_tier)
    return {
        "dropped_rows": dropped_rows,
        "dropped_buckets": n_buckets,
        "kept_unverified": n_unverified,
    }


# ---------------------------------------------------------------------------
# tiered reads across the retention boundary
# ---------------------------------------------------------------------------

def read_tiered(
    spark: SparkSession,
    turns_path: str,
    chunks: DataFrame,
    boundary: str,
    series_cols: list[str] | None = None,
    value_expr: str = "CAST(length(text) AS DOUBLE)",
    ts_min: str | None = None,
    ts_max: str | None = None,
) -> DataFrame:
    """The post-compaction read path: one (series, ts, value) DataFrame
    spanning the retention boundary — days **< boundary** come from the
    compressed chunk tier (``codecs.chunks.decode_chunks`` with its
    zone-map ``ts_min``/``ts_max`` pruning), days **>= boundary** from
    the raw bronze tier (``sources.bronze.read_turns`` with its
    ts_date partition pruning). Each side is pruned by ITS OWN storage
    stats before any row materializes; the union is by name and needs
    no shuffle.

    ``value_expr`` must be the expression the chunks were encoded from
    (the engine's convention: text length), so a range query straddling
    the boundary is value-identical to reading the original raw table —
    pinned by ``test_incremental.py``.

    Bounds are optional ISO timestamps; ``ts_min`` is inclusive,
    ``ts_max`` exclusive (read_turns' convention).
    """
    import datetime as _dt

    def _parse(s: str) -> _dt.datetime:
        # chronological comparison, never lexicographic: Spark accepts
        # both "2024-01-02T12:00:00" and "2024-01-02 12:00:00", and the
        # 'T' form sorts AFTER the space form as a string — a mixed-form
        # boundary would silently skip a whole tier. tz-aware forms
        # ('Z' / '+00:00') normalize to naive UTC so mixed aware/naive
        # bounds stay comparable (the session tz is pinned UTC).
        d = _dt.datetime.fromisoformat(s.replace("T", " ").replace("Z", "+00:00"))
        if d.tzinfo is not None:
            d = d.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return d

    series = list(series_cols) if series_cols is not None else ["conv_id"]
    out = None
    # chunk tier: [ts_min, boundary)
    if ts_min is None or _parse(ts_min) < _parse(boundary):
        if ts_max is None or _parse(boundary) <= _parse(ts_max):
            hi = boundary
        else:
            hi = ts_max
        old = decode_chunks(chunks, series, ts_min=ts_min, ts_max=hi).where(
            F.col("ts") < F.lit(hi).cast("timestamp")  # exclusive upper bound
        )
        out = old
    # raw tier: [max(ts_min, boundary), ts_max)
    if ts_max is None or _parse(ts_max) > _parse(boundary):
        if ts_min is None or _parse(boundary) >= _parse(ts_min):
            lo = boundary
        else:
            lo = ts_min
        raw = read_turns(spark, turns_path, lo, ts_max).select(
            *series, "ts", F.expr(value_expr).alias("value")
        )
        out = raw if out is None else out.unionByName(raw)
    assert out is not None
    return out


def incremental_hll(
    spark: SparkSession,
    turns: DataFrame,
    store: RollupStore,
    tier: str = "hourly",
    key_col: str = "conv_id",
    b: int = 5,
    run_id: str | None = None,
) -> dict:
    """Checkpoint-resumable maintenance of a per-bucket HLL register
    table (operators/sketches) — the distinct-count gold tier.

    MONOTONE maintenance: register state is a max-semilattice, so
    unlike :func:`incremental_rollup` this needs NO bucket
    invalidation, no lag helpers and no open-bucket recompute — a late
    or still-open bucket is handled by max-merging the new rows'
    registers into gold on (bucket_start, bucket). ``increment ≡ full``
    is an algebraic identity here; the test pins the PLUMBING
    (watermark resume, greatest-merge upsert, idempotent no-op run,
    lineage rows) rather than the algebra. Checkpoint/lineage rows use
    tier name ``hll_<tier>`` so the sketch tier coexists with the
    moment tiers in one store.

    One bronze scan per run: the pruned (ts, key) slice is
    localCheckpointed and feeds the row count, the register aggregate
    and the new watermark.
    """
    from ..operators.sketches import hll_registers

    t0 = time.perf_counter()
    run_id = run_id or uuid.uuid4().hex[:12]
    tname = f"hll_{tier}"
    hw = _high_water(spark, store, tname)

    # geometry guard FIRST (even a no-op run with mismatched b/key_col
    # is a misconfiguration worth failing loudly on)
    existing = store.read_gold(spark, tname)
    if existing is not None:
        meta = existing.select("b", "key_col").first()
        if meta is not None and (meta["b"] != b or meta["key_col"] != key_col):
            raise ValueError(
                f"gold {tname} holds registers for b={meta['b']}, "
                f"key_col={meta['key_col']!r}; refusing to merge a "
                f"b={b}, key_col={key_col!r} run into it"
            )

    sl = turns.where(F.col("ts").isNotNull() & F.col(key_col).isNotNull())
    if hw is not None:
        sl = sl.filter(F.col("ts") > F.lit(hw))
    sl = sl.select("ts", key_col).localCheckpoint(eager=True)
    rows_in = sl.count()
    if rows_in == 0:
        metrics = {
            "run_id": run_id, "tier": tname, "rows_in": 0, "rows_out": 0,
            "hw_old": hw, "hw_new": hw,
            "wall_ms": int((time.perf_counter() - t0) * 1000),
        }
        _append_lineage(spark, store, metrics)
        return metrics

    keyed = sl.select(
        F.to_timestamp(bucket_start(F.col("ts"), tier)).alias("bucket_start"),
        key_col,
    )
    regs_new = hll_registers(keyed, key_col, ["bucket_start"], b=b).select(
        "bucket_start",
        "bucket",
        "reg",
        # geometry rides IN the gold table: registers from a different b
        # or key column must never silently max-merge (rho values from
        # different widths/domains give plausible-but-wrong estimates)
        F.lit(b).alias("b"),
        F.lit(key_col).alias("key_col"),
    )

    if existing is not None:
        old = existing.select(
            "bucket_start", "bucket", F.col("reg").alias("_reg_old")
        )
        regs_new = (
            regs_new.join(old, ["bucket_start", "bucket"], "left")
            .select(
                "bucket_start",
                "bucket",
                F.greatest(F.col("reg"), F.coalesce("_reg_old", "reg")).alias(
                    "reg"
                ),
                "b",
                "key_col",
            )
        )
    rows_out = store.upsert_gold(
        spark, regs_new, tname, keys=["bucket_start", "bucket"]
    )

    hw_new = sl.agg(F.max("ts")).collect()[0][0] or hw
    ck_row = spark.createDataFrame(
        [(tname, hw_new, run_id)],
        "tier string, high_water_ts timestamp, run_id string",
    )
    tableio.append(ck_row, store.checkpoint)
    metrics = {
        "run_id": run_id, "tier": tname, "rows_in": rows_in,
        "rows_out": rows_out, "hw_old": hw, "hw_new": hw_new,
        "wall_ms": int((time.perf_counter() - t0) * 1000),
    }
    _append_lineage(spark, store, metrics)
    return metrics
