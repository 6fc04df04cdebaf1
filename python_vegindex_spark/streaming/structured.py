"""Structured Streaming continuous aggregate (the streaming-native path).

The reference is batch-only; its ``update_*`` scripts emulate micro-batch
incremental maintenance (SURVEY.md §2.9), which streaming/incremental.py
reproduces faithfully. This module additionally offers the
Spark-streaming-native expression of the same hourly rollup for users
who ingest turns as a stream:

* file-source ``readStream`` over the bronze directory
* event-time watermark for late turns (the analog of the reference's
  "re-open the last bucket" rule — late data within the watermark still
  lands in its true bucket)
* tumbling 1-hour window aggregate; approx_percentile instead of the
  exact HF-7 sort (exact percentiles are not incrementally maintainable;
  the batch tiers remain the golden path, streaming is the low-latency
  approximation — documented divergence)
* append output mode: a bucket emits once its watermark passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TURNS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _require_utc(spark: SparkSession) -> None:
    """Streaming hour/day windows (``F.window``) are epoch/UTC-anchored
    while the batch lattice (``to_date``/``date_trunc``) follows the
    session timezone — they only produce the SAME buckets when the
    session is UTC (session.get_spark pins it; a user-built session may
    not). Raising beats silently landing streamed rows in off-by-a-few-
    hours buckets relative to the batch tables they append onto."""
    tz = spark.conf.get("spark.sql.session.timeZone", "")
    if tz not in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
        raise ValueError(
            f"streaming hour/day windows need a UTC session timezone to "
            f"align with the batch bucket lattice; session has {tz!r} "
            "(set spark.sql.session.timeZone=UTC, as session.get_spark does)"
        )


def _window_length(tier: str) -> str:
    """Tier -> Spark streaming window length — the ONE mapping shared by
    every streaming aggregate (chunk encoder, cascade), so tier
    acceptance cannot drift between them. Minute tiers are epoch-
    anchored like the batch lattice; doy-anchored multi-day tiers are
    batch-only (they need year anchoring)."""
    from ..functions.buckets import tier_minutes

    if tier == "hourly":
        return "1 hour"
    if tier in ("daily", "1day"):
        return "1 day"
    m = tier_minutes(tier)
    if m is not None:
        return f"{m} minutes"
    raise ValueError(
        f"streaming tiers are 'hourly', 'daily' or 'Nmin', got {tier!r} "
        "(doy-anchored multi-day tiers are batch-only)"
    )


def _turn_stream(spark: SparkSession, input_path: str) -> DataFrame:
    """The shared bronze readStream block (file source, typed schema,
    bounded files per trigger)."""
    return (
        spark.readStream.schema(TURNS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_path)
    )


def streaming_hourly_rollup(
    spark: SparkSession,
    input_path: str,
    watermark: str = "2 hours",
    value_expr: str = "CAST(length(text) AS DOUBLE)",
) -> DataFrame:
    """Build the streaming DataFrame (caller attaches the sink)."""
    _require_utc(spark)
    stream = _turn_stream(spark, input_path)
    v = F.expr(value_expr).alias("v")
    return (
        stream.select("conv_id", "ts", v)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("conv_id"))
        .agg(
            F.count("v").alias("n"),
            F.avg("v").alias("v_mean"),
            F.stddev_pop("v").alias("v_std"),
            F.max("v").alias("v_max"),
            F.expr("approx_percentile(v, 0.9, 10000)").alias("v_90_approx"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "conv_id",
            "n",
            "v_mean",
            "v_std",
            "v_max",
            "v_90_approx",
        )
    )


def streaming_dedup_turns(
    spark: SparkSession,
    input_path: str,
    watermark: str = "2 hours",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Ingestion-time exact dedup of a turn stream.

    At-least-once producers (log shippers, retried writers) duplicate
    turns; this keeps the FIRST arrival of each key and drops repeats
    that arrive within the event-time watermark —
    ``dropDuplicatesWithinWatermark``, so the state store retains each
    key only until the watermark passes it (bounded state; a plain
    ``dropDuplicates`` on a stream would grow state forever, which is
    the 100-TB failure mode). Keys recurring LATER than the watermark
    are treated as new data, the documented trade-off of every
    watermarked dedup. State persists across restarts through the sink
    checkpoint, so a resumed backfill still drops duplicates from
    before the restart (tested)."""
    stream = _turn_stream(spark, input_path)
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def run_available_now(
    df: DataFrame, checkpoint: str, output_path: str
) -> None:
    """Drain everything currently available to a parquet sink and stop —
    the micro-batch-equivalent trigger used by tests and backfills."""
    q = (
        df.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def snapshot_batch_writer(
    table,
    mode: str = "append",
    keys: list[str] | None = None,
    sink_id: str = "default",
):
    """foreachBatch function committing each micro-batch to an
    Iceberg-style :class:`..sources.snapshots.SnapshotTable` —
    exactly-once across restarts, the public Iceberg streaming-sink
    design: every commit records ``(stream_sink_id, stream_batch_id)``;
    after a checkpoint recovery Structured Streaming replays the last
    possibly-uncommitted batch with the SAME id, and a batch at or below
    this sink's high-water mark is skipped instead of double-landed.

    Idempotence is scoped to ``sink_id`` (one per checkpoint location —
    batch ids are only monotonic WITHIN a checkpoint): a job re-pointed
    at a fresh checkpoint gets a fresh sink scope instead of having all
    its batches silently skipped against another checkpoint's counter.
    The high-water mark lives in a sidecar file updated after each
    commit (so it survives ``expire_snapshots`` trimming old manifests)
    AND is cross-checked against retained commit summaries (so a crash
    between commit and sidecar update still skips the replay).
    ``mode="upsert"`` MERGEs each batch on ``keys`` (for
    update/complete-mode aggregates); ``"append"`` adds a file group."""
    import hashlib
    import json
    import os

    if mode not in ("append", "upsert"):
        raise ValueError(f"mode must be 'append' or 'upsert', got {mode!r}")
    if mode == "upsert" and not keys:
        raise ValueError("mode='upsert' requires keys")

    sink_dir = os.path.join(table.root, "stream_sinks")
    os.makedirs(sink_dir, exist_ok=True)
    marker = os.path.join(
        sink_dir, hashlib.md5(sink_id.encode()).hexdigest()[:16] + ".json"
    )

    def _high_water() -> int | None:
        best = None
        try:
            best = json.loads(table.io.read_text(marker))["last_batch_id"]
        except (FileNotFoundError, ValueError, KeyError):
            pass
        # newest-first manifest scan, stopping at this sink's FIRST hit
        # (batch ids are monotonic per sink, so the newest is the max):
        # O(1-2) reads in the steady state instead of re-parsing the
        # whole history every micro-batch. The scan only exists to cover
        # a crash between commit and the sidecar update above.
        snapdir = os.path.join(table.root, "snapshots")
        for name in reversed(table._manifest_names()):
            summary = json.loads(
                table.io.read_text(os.path.join(snapdir, name))
            ).get("summary", {})
            b = summary.get("stream_batch_id")
            if b is not None and summary.get("stream_sink_id") == sink_id:
                return b if best is None else max(best, b)
        return best

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        hw = _high_water()
        if hw is not None and batch_id <= hw:
            return  # replay of an already-committed batch for THIS sink
        extra = {"stream_batch_id": batch_id, "stream_sink_id": sink_id}
        if mode == "append":
            table.append(batch_df, summary_extra=extra)
        else:
            table.upsert(batch_df, keys=keys, summary_extra=extra)
        table.io.swap(
            marker, json.dumps({"sink_id": sink_id, "last_batch_id": batch_id})
        )

    return _write


def run_available_now_snapshot(
    df: DataFrame,
    checkpoint: str,
    table,
    mode: str = "append",
    keys: list[str] | None = None,
) -> None:
    """Drain everything currently available into a snapshot table (one
    atomic manifest commit per micro-batch) and stop — the snapshot-sink
    twin of :func:`run_available_now`. The sink's idempotence scope is
    the checkpoint location (see :func:`snapshot_batch_writer`)."""
    writer = snapshot_batch_writer(table, mode, keys, sink_id=checkpoint)
    q = (
        df.writeStream.foreachBatch(writer)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_chunk_encoder(
    spark: SparkSession,
    input_path: str,
    tier: str = "hourly",
    watermark: str = "2 hours",
    series_cols: list[str] | None = None,
    value_expr: str = "CAST(length(text) AS DOUBLE)",
) -> DataFrame:
    """Streaming-native chunk compression: live turns -> closed, Gorilla-
    compressed chunk rows (codecs/chunks.py schema, byte-compatible with
    the batch encoder's decode path).

    Shape: watermarked tumbling-window aggregate collects each (series,
    bucket)'s points as a sorted array — Spark's state store holds one
    in-flight array per open bucket, bounded by points-per-bucket, and
    append mode emits a bucket exactly once, when the watermark passes
    its end (the streaming analog of the reference's "only complete
    buckets are final" update rule, update_summary_timeseries.py) — then
    a stateless ``mapInPandas`` stage runs the same vectorized
    delta-of-delta + Gorilla-XOR encoders over every closed bucket in
    the Arrow batch. No second shuffle: the window aggregate already
    co-located each bucket.

    Only epoch-aligned tiers stream ('hourly'/'daily' — doy-anchored
    multi-day lattices need the batch path's year anchoring). Late rows
    inside the watermark still land in their true bucket; later ones are
    dropped by the state store (documented divergence from the batch
    update flow, which re-opens buckets unconditionally).
    """
    from ..codecs.chunks import TS_CODEC, VAL_CODEC, _chunk_schema
    from ..codecs.gorilla import encode_floats_grouped, encode_timestamps_grouped

    window_len = _window_length(tier)
    if tier in ("hourly", "daily", "1day"):
        _require_utc(spark)  # minute tiers are tz-independent on both paths
    series_cols = list(series_cols or ["conv_id"])

    stream = _turn_stream(spark, input_path)
    pts = (
        stream.select(
            *series_cols, F.col("ts"), F.expr(value_expr).alias("_v")
        )
        .withWatermark("ts", watermark)
        .groupBy(*series_cols, F.window("ts", window_len).alias("w"))
        .agg(
            F.sort_array(F.collect_list(F.struct("ts", "_v"))).alias("pts")
        )
        .select(
            *series_cols,
            # daily buckets are DateType in the batch encoder
            # (buckets.bucket_start: nday==1 -> to_date) — match it so
            # streaming chunk rows union/append cleanly onto batch tables
            (
                F.to_date("w.start")
                if window_len == "1 day"
                else F.col("w.start")
            ).alias("bucket_start"),
            "pts",
        )
    )

    series_fields = [pts.schema[c] for c in series_cols]
    bucket_type = pts.schema["bucket_start"].dataType
    schema = _chunk_schema(series_fields, bucket_type)
    import numpy as np
    import pandas as pd

    def encode_closed(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            lens = pdf["pts"].map(len).to_numpy(dtype="int64")
            ends = np.cumsum(lens)
            starts = ends - lens
            flat_ts = np.concatenate(
                [[p["ts"] for p in row] for row in pdf["pts"]]
            )
            ts_dt = pd.to_datetime(pd.Series(flat_ts)).to_numpy()
            ts_us = ts_dt.astype("datetime64[us]").astype("int64")
            vals = np.concatenate(
                [[p["_v"] for p in row] for row in pdf["pts"]]
            ).astype(np.float64)
            yield pd.DataFrame(
                {
                    **{c: pdf[c].to_numpy() for c in series_cols},
                    "bucket_start": pdf["bucket_start"].to_numpy(),
                    "n_points": lens.astype("int32"),
                    "first_ts": ts_dt[starts],
                    "last_ts": ts_dt[ends - 1],
                    "ts_codec": np.repeat(TS_CODEC, len(pdf)),
                    "val_codec": np.repeat(VAL_CODEC, len(pdf)),
                    "ts_chunk": encode_timestamps_grouped(ts_us, starts, ends),
                    "val_chunk": encode_floats_grouped(vals, starts, ends),
                }
            )

    return pts.mapInPandas(encode_closed, schema)


def streaming_seasonal_scorer(
    spark: SparkSession,
    input_path: str,
    profile: DataFrame,
    value_expr: str = "CAST(length(text) AS DOUBLE)",
    series_cols: list[str] | None = None,
    threshold: float = 3.0,
    min_baseline: int = 10,
) -> DataFrame:
    """Score a LIVE turn stream against a batch-computed weekly seasonal
    baseline (operators/rate.seasonal_profile) — the stream-static
    enrichment pattern: ``seasonal_deviation`` is STATELESS (broadcast
    hash join + projections, no window/aggregate), so it applies to a
    streaming DataFrame unchanged, needs no watermark and holds no
    state; each micro-batch is scored row-by-row against the broadcast
    profile with zero shuffle.

    This is the deployment split monitoring systems actually use: the
    profile refreshes on a slow batch cadence (nightly rollup job), the
    scorer runs at ingest latency. Flags are identical to the batch
    scorer's on the same rows (tested), because the operator is the
    same plan.
    """
    from ..operators.rate import seasonal_deviation

    series = list(series_cols) if series_cols is not None else ["role"]
    stream = _turn_stream(spark, input_path)
    # dict.fromkeys dedupes while preserving order: series_cols may
    # overlap the id columns (e.g. series_cols=['conv_id']), and a
    # duplicated column would make the downstream join ambiguous
    id_cols = list(dict.fromkeys([*series, "conv_id", "turn_idx", "ts"]))
    live = stream.select(*id_cols, F.expr(value_expr).alias("v"))
    return seasonal_deviation(
        live,
        profile,
        series_cols=series,
        value_col="v",
        threshold=threshold,
        min_baseline=min_baseline,
    )


def streaming_cascade_moments(
    spark: SparkSession,
    input_path: str,
    fine: str = "5min",
    coarse: str = "hourly",
    watermark: str = "2 hours",
    series_cols: list[str] | None = None,
    value_expr: str = "CAST(length(text) AS BIGINT)",
) -> tuple[DataFrame, DataFrame]:
    """Streaming twin of ``operators.cascade``: CHAINED windowed
    aggregations (Spark 3.4+ multiple-stateful-operator support) build
    the fine tier's BIGINT moment sums and re-aggregate them into the
    coarse tier inside ONE streaming query — raw rows hit state once,
    the second stateful operator consumes already-closed fine windows.

    Only fixed-width epoch-aligned tiers stream (minute grains /
    'hourly' / 'daily'; doy lattices are batch-only), and the pair must
    nest — validated by the batch cascade's own rule. Moments compose
    exactly (order-free integer sums), so the coarse output equals the
    batch ``rollup_moments`` over the same closed buckets (pinned by
    ``tests/test_streaming_cascade.py``).

    Returns (fine_df, coarse_df) unstarted streaming frames — attach
    sinks with ``run_available_now``; ``finish_moments`` works on both.
    """
    from ..operators.cascade import _check_nesting

    _check_nesting(fine, coarse)
    if fine in ("hourly", "daily", "1day") or coarse in ("hourly", "daily", "1day"):
        _require_utc(spark)

    series = series_cols or ["conv_id"]
    stream = _turn_stream(spark, input_path)
    y = F.expr(value_expr)
    src = stream.select(*series, "ts", y.alias("_y")).where(
        F.col("ts").isNotNull() & F.col("_y").isNotNull()
    )
    fine_mom = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", _window_length(fine)).alias("w"), *series)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_y").alias("v_sum"),
            F.sum(F.col("_y") * F.col("_y")).alias("v_sumsq"),
            F.min("_y").alias("v_min"),
            F.max("_y").alias("v_max"),
        )
    )
    coarse_mom = fine_mom.groupBy(
        F.window(F.col("w"), _window_length(coarse)).alias("w2"), *series
    ).agg(
        F.sum("n").alias("n"),
        F.sum("v_sum").alias("v_sum"),
        F.sum("v_sumsq").alias("v_sumsq"),
        F.min("v_min").alias("v_min"),
        F.max("v_max").alias("v_max"),
    )
    fine_out = fine_mom.select(
        *series, F.col("w.start").alias("bucket_start"),
        "n", "v_sum", "v_sumsq", "v_min", "v_max",
    )
    coarse_out = coarse_mom.select(
        *series, F.col("w2.start").alias("bucket_start"),
        "n", "v_sum", "v_sumsq", "v_min", "v_max",
    )
    return fine_out, coarse_out


def streaming_ohlc_bars(
    spark: SparkSession,
    input_path: str,
    tier: str = "hourly",
    watermark: str = "2 hours",
    series_cols: list[str] | None = None,
    value_expr: str = "CAST(length(text) AS BIGINT)",
    order_expr: str = "turn_idx",
) -> DataFrame:
    """Streaming twin of :func:`..operators.bars.ohlc_bars`: live turns
    -> closed OHLC candlestick rows, emitted exactly once per bucket
    when the watermark passes its end (append mode).

    The SAME aggregate expressions as the batch operator — open/close
    via lexicographic min/max over a ``(epoch-µs, order, value)``
    struct, extremes over the value — run inside a watermarked tumbling
    window, so a bucket closed by the stream is ROW-IDENTICAL to the
    batch bar over the same input (pinned by
    tests/test_streaming_chunks.py). Struct min/max aggregation state
    is O(1) per open bucket; no second shuffle.

    Epoch-aligned tiers only ('hourly'/'daily'/'Nmin' —
    :func:`_window_length`'s shared rule). NULL/NaN values are dropped
    before the window, matching the batch keep-filter. Late rows
    inside the watermark land in their true bucket; later ones are
    dropped by the state store (same documented divergence as the
    streaming chunk encoder).
    """
    from ..functions.timeutil import epoch_us

    window_len = _window_length(tier)
    if tier in ("hourly", "daily", "1day"):
        _require_utc(spark)
    series_cols = list(series_cols or ["conv_id"])

    stream = _turn_stream(spark, input_path)
    v = F.expr(value_expr)
    d = stream.select(
        *series_cols,
        F.col("ts"),
        v.alias("_v"),
        F.expr(order_expr).alias("_o"),
    ).where(
        F.col("ts").isNotNull()
        & F.col("_v").isNotNull()
        & ~F.isnan(F.col("_v").cast("double"))
    )
    key = F.struct(
        epoch_us(F.col("ts")).alias("_t"), F.col("_o").alias("_o0"), F.col("_v")
    )
    agg = (
        d.withColumn("_key", key)
        .withWatermark("ts", watermark)
        .groupBy(*series_cols, F.window("ts", window_len).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("_key").getField("_v").alias("open"),
            F.max("_v").alias("high"),
            F.min("_v").alias("low"),
            F.max("_key").getField("_v").alias("close"),
        )
    )
    return agg.select(
        *series_cols,
        (
            F.to_date("w.start") if window_len == "1 day" else F.col("w.start")
        ).alias("bucket_start"),
        "n",
        "open",
        "high",
        "low",
        "close",
    )


def streaming_hll_registers(
    spark: SparkSession,
    input_path: str,
    tier: str = "hourly",
    key_col: str = "conv_id",
    b: int = 5,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of :func:`..operators.sketches.hll_registers`:
    live turns -> closed per-bucket HLL register rows
    ``(bucket_start, bucket, reg)``, emitted exactly once per time
    bucket when the watermark passes (append mode).

    Unlike the streaming percentile (approx-only, a documented
    divergence), the distinct sketch is EXACT under streaming: register
    state is a running MAX, which is trivially incrementally
    maintainable, so a bucket closed by the stream is row-identical to
    the batch ``hll_registers`` over the same input (pinned by
    tests/test_streaming_chunks.py). Aggregation state is at most
    ``2^b`` registers per open time bucket. Downstream, the streamed
    register rows merge into coarser tiers with the ordinary batch
    ``hll_merge`` — the streaming head feeds the same cascade.

    Epoch-aligned tiers only ('hourly'/'daily'/'Nmin'); hour/day tiers
    require a UTC session (same rule as every streaming aggregate
    here).
    """
    from ..operators.sketches import HASH_BITS, _validate_b, hash60, rho_expr

    _validate_b(b)
    window_len = _window_length(tier)
    if tier in ("hourly", "daily", "1day"):
        _require_utc(spark)
    wbits = HASH_BITS - b
    stream = _turn_stream(spark, input_path)
    h = hash60(F.col(key_col))
    keyed = stream.where(
        F.col("ts").isNotNull() & F.col(key_col).isNotNull()
    ).select(
        F.col("ts"),
        F.shiftright(h, wbits).alias("bucket"),
        rho_expr(h.bitwiseAND(F.lit((1 << wbits) - 1)), wbits)
        .cast("int")
        .alias("rho"),
    )
    agg = (
        keyed.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len).alias("w"), F.col("bucket"))
        .agg(F.max("rho").alias("reg"))
    )
    return agg.select(
        F.col("w.start").alias("bucket_start"), "bucket", "reg"
    )


def streaming_cms_counters(
    spark: SparkSession,
    input_path: str,
    tier: str = "hourly",
    key_expr: str = "conv_id",
    depth: int = 4,
    width: int = 1024,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of :func:`..operators.sketches.cms_build`: live
    turns -> closed per-bucket Count-Min counter rows
    ``(bucket_start, row_idx, col_idx, counter)``, emitted exactly once
    per time bucket when the watermark passes (append mode).

    Like the streaming HLL (max state) and unlike the streaming
    percentile, this live aggregate is EXACT: counter state is a
    running SUM, so a bucket closed by the stream is row-identical to
    the batch ``cms_build`` over the same input (pinned by
    tests/test_streaming_chunks.py), and closed buckets sum-merge into
    coarser tiers with ordinary batch aggregation. State per open
    bucket is at most depth*width counters.
    """
    from ..operators.sketches import _validate_cms, cms_probe_structs

    _validate_cms(depth, width)
    window_len = _window_length(tier)
    if tier in ("hourly", "daily", "1day"):
        _require_utc(spark)
    stream = _turn_stream(spark, input_path)
    k = F.expr(key_expr)
    hashed = stream.where(F.col("ts").isNotNull() & k.isNotNull()).select(
        F.col("ts"),
        F.explode(cms_probe_structs(k, depth, width)).alias("rc"),
    )
    agg = (
        hashed.select("ts", "rc.row_idx", "rc.col_idx")
        .withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window_len).alias("w"),
            F.col("row_idx"),
            F.col("col_idx"),
        )
        .agg(F.count(F.lit(1)).alias("counter"))
    )
    return agg.select(
        F.col("w.start").alias("bucket_start"), "row_idx", "col_idx", "counter"
    )
