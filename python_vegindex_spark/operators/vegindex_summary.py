"""generate_summary_timeseries as one declarative Spark plan.

The reference's flagship job (generate_summary_timeseries.py:229-531)
reads a tier-1 roistats CSV and emits the n-day gcc summary. This
operator runs the same computation over a roistats DataFrame (from
:func:`..sources.vegindex_tables.read_roistats` or the catalog helpers)
— the last step letting a vegindex user run their actual daily job on
Spark. Faithful semantics, including the quirks:

* QC select_rows (roitimeseries.py:809-841): time-of-day window,
  brt = r+g+b in [brt_min, brt_max], solar_elev >= sunelev_min,
  r_mean not null; then the awbflag==1 skip
  (generate_summary_timeseries.py:309-315).
* Buckets are nday doy-anchored with yearly restart (daterange2,
  vegindex.py:22-64); every bucket between the first and last QC'd row
  is emitted (gap-fill), label = start + floor(nday/2) days. Row
  assignment follows the reference's SEQUENTIAL CURSOR
  (generate_summary_timeseries.py:295-305): each year's final bucket
  spans the full nday window, so early-January rows spill into the
  previous year's last bucket (except in the series' first year) — see
  :func:`..functions.buckets.bucket_start_cursor`.
* Per-row: dnsum = r+g+b of the ROW means; rows with dnsum <= 0 do NOT
  count toward image_count and contribute NaN gcc/rcc — but their raw
  r/g/b DO feed the DN means, and their solar_elev feeds max_solar_elev
  (generate_summary_timeseries.py:324-336).
* gcc uses the STORED per-image gcc column; rcc is RECOMPUTED as
  r/dnsum (generate_summary_timeseries.py:326-336 — the comment says
  both are recomputed, the code only recomputes rcc/bcc; we are
  bug-compatible with the code).
* stats: nanmean + POPULATION nanstd + exact HF-7 quantiles
  (generate_summary_timeseries.py:438-457).
* midday row = argmin |ts - noon(center)|, first-in-time tie-break
  (generate_summary_timeseries.py:393-400).
* Tiering (generate_summary_timeseries.py:383-461): image_count==0 ->
  everything ND; 0 < count < nmin -> midday_* AND max_solar_elev kept,
  stats ND (note: the reference's readCSV nulls max_solar_elev below
  nmin on read — an asymmetry we reproduce on each side faithfully);
  count >= nmin -> full stats. snow/outlier flags always ND.

Spark shape: one shuffle (groupBy bucket), JVM-only aggregates
(hash aggregate + exact percentile + min(struct) midday), tiny spine
join for gap-fill — the same plan family as operators/rollup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.buckets import (
    _bucket_seq,
    bucket_center,
    bucket_start,
    bucket_start_cursor,
    midpoint_anchor,
)
from ..functions.timeutil import epoch_us
from ..sources.summary_export import GCC_SUMMARY_FIELDS


def generate_gcc_summary(
    roistats: DataFrame,
    nday: int = 3,
    nmin: int = 1,
    tod_min: str = "00:00:00",
    tod_max: str = "23:59:59",
    sunelev_min: float = 10.0,
    brt_min: float = 100.0,
    brt_max: float = 665.0,
    spine_start=None,
    series_start=None,
) -> DataFrame:
    """roistats DataFrame -> n-day gcc summary in GCC_SUMMARY_FIELDS order.

    ``spine_start`` (date) extends the gap-fill spine's lower bound —
    used by :func:`update_gcc_summary` so the re-opened tail bucket is
    emitted even when new tier-1 rows start later. ``series_start``
    (date) tells the year-boundary cursor (bucket_start_cursor) which
    year the FULL series began in when ``roistats`` is a filtered tail
    of it — without it a tail starting on Jan 1 would wrongly treat
    that year as the series' first and skip the spill-over."""
    tier = f"{int(nday)}day"
    brt = F.col("r_mean") + F.col("g_mean") + F.col("b_mean")
    tod = F.date_format("ts", "HH:mm:ss")
    # selection criteria (roitimeseries.py:809-841); the awb skip happens
    # INSIDE the reference's bucket loop, after dt_first/dt_last are
    # taken (generate_summary_timeseries.py:242-262;309-315), so spine
    # bounds and the series-start year come from the pre-awb set.
    qc_sel = roistats.filter(
        (tod >= tod_min)
        & (tod <= tod_max)
        & brt.between(brt_min, brt_max)
        & (F.col("solar_elev") >= sunelev_min)
        & F.col("r_mean").isNotNull()
    )
    qc = qc_sel.filter(F.col("awbflag").isNull() | (F.col("awbflag") != 1))

    # one tiny bounds row: naive-lattice spine range + first-row year
    naive_b = bucket_start(F.col("ts"), tier)
    y0 = F.year(F.min("ts"))
    if series_start is not None:
        y0 = F.least(y0, F.lit(int(series_start.year)))
    bounds = qc_sel.agg(
        F.min(naive_b).alias("_lo"), F.max(naive_b).alias("_hi"), y0.alias("_y0")
    )

    dnsum = F.col("r_mean") + F.col("g_mean") + F.col("b_mean")
    ok = dnsum > 0
    d = (
        qc.crossJoin(F.broadcast(bounds.select("_y0")))
        .withColumn(
            "bucket_start", bucket_start_cursor(F.col("ts"), tier, F.col("_y0"))
        )
        .withColumn("_anchor", midpoint_anchor(F.col("bucket_start"), tier))
        .withColumn("_gcc", F.when(ok, F.col("gcc")))
        .withColumn("_rcc", F.when(ok, F.col("r_mean") / dnsum))
    )

    mid_payload = F.struct(
        F.abs(epoch_us(F.col("ts")) - epoch_us(F.col("_anchor"))).alias("d"),
        F.col("ts").alias("ts"),
        F.col("filename").alias("filename"),
        F.col("r_mean").alias("r"),
        F.col("g_mean").alias("g"),
        F.col("b_mean").alias("b"),
        F.col("_gcc").alias("gcc"),
        F.col("_rcc").alias("rcc"),
    )

    # one shared percentile buffer per measure (see rollup._agg_exprs):
    # percentile(col, array(...)) buffers each group's values ONCE for
    # all three quantiles instead of once per quantile
    qarr = F.array(F.lit(0.5), F.lit(0.75), F.lit(0.9))
    agg = d.groupBy("bucket_start").agg(
        F.count(F.when(ok, 1)).alias("image_count"),
        F.min(mid_payload).alias("_mid"),
        F.avg("r_mean").alias("r_mean_"),
        F.stddev_pop("r_mean").alias("r_std"),
        F.avg("g_mean").alias("g_mean_"),
        F.stddev_pop("g_mean").alias("g_std"),
        F.avg("b_mean").alias("b_mean_"),
        F.stddev_pop("b_mean").alias("b_std"),
        F.avg("_gcc").alias("gcc_mean"),
        F.stddev_pop("_gcc").alias("gcc_std"),
        F.percentile(F.col("_gcc"), qarr).alias("_gcc_pq"),
        F.avg("_rcc").alias("rcc_mean"),
        F.stddev_pop("_rcc").alias("rcc_std"),
        F.percentile(F.col("_rcc"), qarr).alias("_rcc_pq"),
        F.max("solar_elev").alias("max_solar_elev"),
    )
    agg = agg.select(
        "*",
        *[
            F.element_at(F.col(f"_{m}_pq"), i + 1).alias(f"{m}_{p}")
            for m in ("gcc", "rcc")
            for i, p in enumerate((50, 75, 90))
        ],
    ).drop("_gcc_pq", "_rcc_pq")

    lo = F.col("_lo")
    if spine_start is not None:
        lo = F.least(lo, F.lit(spine_start).cast("date"))
    spine = bounds.select(
        F.explode(_bucket_seq(lo, F.col("_hi"), tier)).alias("bucket_start")
    )
    agg = spine.join(agg, on=["bucket_start"], how="left")

    cnt = F.coalesce(F.col("image_count"), F.lit(0))
    some = cnt > 0
    full = cnt >= int(nmin)
    center = bucket_center(F.col("bucket_start"), tier)
    nd_int = F.lit(None).cast("int")
    stat_cols = [
        ("r_mean", "r_mean_"), ("r_std", "r_std"),
        ("g_mean", "g_mean_"), ("g_std", "g_std"),
        ("b_mean", "b_mean_"), ("b_std", "b_std"),
        ("gcc_mean", "gcc_mean"), ("gcc_std", "gcc_std"),
        ("gcc_50", "gcc_50"), ("gcc_75", "gcc_75"), ("gcc_90", "gcc_90"),
        ("rcc_mean", "rcc_mean"), ("rcc_std", "rcc_std"),
        ("rcc_50", "rcc_50"), ("rcc_75", "rcc_75"), ("rcc_90", "rcc_90"),
    ]
    out = agg.select(
        center.alias("date"),
        F.year(center).alias("year"),
        F.dayofyear(center).alias("doy"),
        cnt.cast("int").alias("image_count"),
        F.when(some, F.col("_mid.filename")).alias("midday_filename"),
        F.when(some, F.col("_mid.r")).alias("midday_r"),
        F.when(some, F.col("_mid.g")).alias("midday_g"),
        F.when(some, F.col("_mid.b")).alias("midday_b"),
        F.when(some, F.col("_mid.gcc")).alias("midday_gcc"),
        F.when(some, F.col("_mid.rcc")).alias("midday_rcc"),
        *[F.when(full, F.col(src)).alias(dst) for dst, src in stat_cols],
        # kept (not nulled) in the sub-threshold branch, unlike readCSV
        F.when(some, F.col("max_solar_elev")).alias("max_solar_elev"),
        nd_int.alias("snow_flag"),
        nd_int.alias("outlierflag_gcc_mean"),
        nd_int.alias("outlierflag_gcc_50"),
        nd_int.alias("outlierflag_gcc_75"),
        nd_int.alias("outlierflag_gcc_90"),
    )
    assert out.columns == GCC_SUMMARY_FIELDS
    return out


def generate_ndvi_summary_table(
    ndvits: DataFrame,
    nday: int = 3,
    nmin: int = 1,
    tod_min: str = "00:00:00",
    tod_max: str = "23:59:59",
    sunelev_min: float = 10.0,
    brt_min: float = 100.0,
    brt_max: float = 665.0,
    spine_start=None,
    series_start=None,
    qc_mode: str = "reference",
) -> DataFrame:
    """NDVI timeseries DataFrame -> n-day NDVI summary, the second
    flagship job (generate_ndvi_summary_timeseries.py:229-470), in
    NDVI_SUMMARY_FIELDS order. ``spine_start``/``series_start`` mirror
    :func:`generate_gcc_summary` (used by :func:`update_ndvi_summary`).

    ``qc_mode`` controls which rows feed the summary:

    * ``"reference"`` (default, bug-compatible): ONLY the F3 range
      filter (NDVI_c in [-1, 1]) applies. The reference script calls
      ``select_rows`` but then overwrites its result with
      ``filter_rows(...)``, which iterates ``self.rows`` — the FULL
      unfiltered table (generate_ndvi_summary_timeseries.py:235-252,
      ndvitimeseries.py:621-642) — so the time-of-day / brightness /
      solar-elevation QC has NO effect on the released NDVI summary.
      The tod/brt/sunelev parameters are accepted but unused here.
    * ``"conjunctive"``: the repaired semantics — select_rows QC AND
      the NDVI range filter both apply. (The reference's
      update_ndvi_summary_timeseries would have applied ONLY
      select_rows, :237-243 — but that script is an unfinished stub
      that exits at :221 before any update logic runs, so the generate
      script's behavior is the only released NDVI-summary semantics;
      see tests/test_reference_differential.py.)

    Faithful quirks (both modes): per-row gcc uses the STORED gcc and
    only counts (and only contributes) where dnsum > 0 (the img_cnt
    guard, :339-346); ndvi stats are over ALL selected rows' NDVI_c
    regardless of the dnsum guard; sub-threshold buckets keep midday_*
    and max_solar_elev, stats go ND.
    """
    from ..sources.summary_export import NDVI_SUMMARY_FIELDS

    if qc_mode not in ("reference", "conjunctive"):
        raise ValueError(f"qc_mode must be 'reference' or 'conjunctive', got {qc_mode!r}")
    tier = f"{int(nday)}day"
    ndvi_ok = F.col("NDVI_c").between(-1.0, 1.0)
    if qc_mode == "reference":
        qc = ndvits.filter(ndvi_ok)
    else:
        brt = F.col("r_mean") + F.col("g_mean") + F.col("b_mean")
        tod = F.date_format("ts", "HH:mm:ss")
        qc = ndvits.filter(
            (tod >= tod_min)
            & (tod <= tod_max)
            & brt.between(brt_min, brt_max)
            & (F.col("solar_elev") >= sunelev_min)
            & F.col("r_mean").isNotNull()
            & ndvi_ok
        )

    # dt_first/dt_last come from the filter_rows output — the qc set of
    # the active mode (generate_ndvi_summary_timeseries.py:253-265; the
    # awb skip is commented out there, :306-307).
    naive_b = bucket_start(F.col("ts"), tier)
    y0 = F.year(F.min("ts"))
    if series_start is not None:
        y0 = F.least(y0, F.lit(int(series_start.year)))
    bounds = qc.agg(
        F.min(naive_b).alias("_lo"), F.max(naive_b).alias("_hi"), y0.alias("_y0")
    )

    dnsum = F.col("r_mean") + F.col("g_mean") + F.col("b_mean")
    ok = dnsum > 0
    d = (
        qc.crossJoin(F.broadcast(bounds.select("_y0")))
        .withColumn(
            "bucket_start", bucket_start_cursor(F.col("ts"), tier, F.col("_y0"))
        )
        .withColumn("_anchor", midpoint_anchor(F.col("bucket_start"), tier))
        .withColumn("_gcc", F.when(ok, F.col("gcc")))
    )
    mid_payload = F.struct(
        F.abs(epoch_us(F.col("ts")) - epoch_us(F.col("_anchor"))).alias("d"),
        F.col("ts").alias("ts"),
        F.col("filename_rgb").alias("rgb"),
        F.col("filename_ir").alias("ir"),
        F.col("NDVI_c").alias("ndvi"),
    )
    agg = d.groupBy("bucket_start").agg(
        F.count(F.when(ok, 1)).alias("image_count"),
        F.min(mid_payload).alias("_mid"),
        F.percentile(F.col("_gcc"), F.lit(0.9)).alias("gcc_90"),
        F.avg("NDVI_c").alias("ndvi_mean"),
        F.stddev_pop("NDVI_c").alias("ndvi_std"),
        # one shared buffer for the three NDVI quantiles (see above)
        F.percentile(
            F.col("NDVI_c"), F.array(F.lit(0.5), F.lit(0.75), F.lit(0.9))
        ).alias("_ndvi_pq"),
        F.max("solar_elev").alias("max_solar_elev"),
    )
    agg = agg.select(
        "*",
        *[
            F.element_at(F.col("_ndvi_pq"), i + 1).alias(f"ndvi_{p}")
            for i, p in enumerate((50, 75, 90))
        ],
    ).drop("_ndvi_pq")
    lo = F.col("_lo")
    if spine_start is not None:
        lo = F.least(lo, F.lit(spine_start).cast("date"))
    spine = bounds.select(
        F.explode(_bucket_seq(lo, F.col("_hi"), tier)).alias("bucket_start")
    )
    agg = spine.join(agg, on=["bucket_start"], how="left")

    cnt = F.coalesce(F.col("image_count"), F.lit(0))
    some = cnt > 0
    full = cnt >= int(nmin)
    center = bucket_center(F.col("bucket_start"), tier)
    nd_int = F.lit(None).cast("int")
    out = agg.select(
        center.alias("date"),
        F.year(center).alias("year"),
        F.dayofyear(center).alias("doy"),
        cnt.cast("int").alias("image_count"),
        F.when(some, F.col("_mid.rgb")).alias("midday_rgb_filename"),
        F.when(some, F.col("_mid.ir")).alias("midday_ir_filename"),
        F.when(some, F.col("_mid.ndvi")).alias("midday_ndvi"),
        F.when(full, F.col("gcc_90")).alias("gcc_90"),
        F.when(full, F.col("ndvi_mean")).alias("ndvi_mean"),
        F.when(full, F.col("ndvi_std")).alias("ndvi_std"),
        F.when(full, F.col("ndvi_50")).alias("ndvi_50"),
        F.when(full, F.col("ndvi_75")).alias("ndvi_75"),
        F.when(full, F.col("ndvi_90")).alias("ndvi_90"),
        F.when(some, F.col("max_solar_elev")).alias("max_solar_elev"),
        nd_int.alias("snow_flag"),
        nd_int.alias("outlierflag_ndvi_mean"),
        nd_int.alias("outlierflag_ndvi_50"),
        nd_int.alias("outlierflag_ndvi_75"),
        nd_int.alias("outlierflag_ndvi_90"),
    )
    assert out.columns == NDVI_SUMMARY_FIELDS
    return out


def update_gcc_summary(
    existing: DataFrame,
    roistats: DataFrame,
    nday: int = 3,
    nmin: int = 1,
    **qc,
) -> DataFrame:
    """The update_summary_timeseries flow over DataFrames.

    The reference's incremental script re-opens the LAST bucket of the
    existing summary (its row is provisional — new tier-1 rows may still
    extend it, update_summary_timeseries.py:246-256), recomputes every
    bucket from that one forward from the tier-1 table, and keeps the
    older summary rows untouched. Returns the merged summary in
    GCC_SUMMARY_FIELDS order.

    Invariant (tested): ``update_gcc_summary(generate(old_rows), all_rows)
    == generate(all_rows)`` row-for-row.
    """
    import datetime as _dt

    row = existing.agg(F.max("date").alias("m"), F.min("date").alias("lo")).collect()[0]
    last = row["m"]
    if last is None:
        return generate_gcc_summary(roistats, nday=nday, nmin=nmin, **qc)
    # summary dates are bucket CENTERS: center = start + nday//2
    open_start = last - _dt.timedelta(days=nday // 2)
    # the series' first bucket start — its YEAR anchors the year-boundary
    # cursor, so a tail recompute starting on Jan 1 still spills into the
    # previous year's final bucket exactly like the full job would
    series_start = row["lo"] - _dt.timedelta(days=nday // 2)
    # the recompute window is defined by CURSOR bucket, not raw date:
    # rows that spill forward into the reopened bucket are included,
    # rows after open_start that spill BACK into an earlier (frozen)
    # bucket are excluded — otherwise they would double-count against
    # ``kept``. (The reference's own update script re-anchors on the
    # first new row's date, update_summary_timeseries.py:250-282, which
    # near year boundaries can rebuild a closed bucket from a partial
    # row set; we keep the stronger update == full-recompute invariant.)
    tier = f"{int(nday)}day"
    tail_bucket = bucket_start_cursor(
        F.col("ts"), tier, F.lit(int(series_start.year))
    )
    fresh = generate_gcc_summary(
        roistats.filter(tail_bucket >= F.lit(open_start)),
        nday=nday,
        nmin=nmin,
        spine_start=open_start,
        series_start=series_start,
        **qc,
    )
    kept = existing.filter(F.col("date") < F.lit(last))
    return kept.unionByName(fresh)


def update_ndvi_summary(
    existing: DataFrame,
    ndvits: DataFrame,
    nday: int = 3,
    nmin: int = 1,
    **qc,
) -> DataFrame:
    """The incremental-NDVI flow over DataFrames — the NDVI twin of
    :func:`update_gcc_summary`, COMPLETING the reference's
    update_ndvi_summary_timeseries: that script is an unfinished stub in
    vegindex 0.10.2 (it crashes at :214 as shipped, and with the crash
    repaired it reads the summary and sys.exit(0)s at :221 — its
    select_rows/aggregation/insert_row body, :237-460, is dead code;
    pinned in tests/test_reference_differential.py). This twin applies
    update_summary_timeseries.py's proven pattern (re-open the last
    summary bucket, recompute forward, keep older rows) to the NDVI
    table with the generate script's row-selection semantics.

    Invariant (tested): ``update_ndvi_summary(generate(old_rows),
    all_rows) == generate(all_rows)`` row-for-row; the recompute window
    is cursor-bucket-defined exactly as in :func:`update_gcc_summary`.
    ``qc_mode`` passes through to :func:`generate_ndvi_summary_table`
    (default "reference").
    """
    import datetime as _dt

    row = existing.agg(F.max("date").alias("m"), F.min("date").alias("lo")).collect()[0]
    last = row["m"]
    if last is None:
        return generate_ndvi_summary_table(ndvits, nday=nday, nmin=nmin, **qc)
    open_start = last - _dt.timedelta(days=nday // 2)
    series_start = row["lo"] - _dt.timedelta(days=nday // 2)
    tier = f"{int(nday)}day"
    tail_bucket = bucket_start_cursor(
        F.col("ts"), tier, F.lit(int(series_start.year))
    )
    fresh = generate_ndvi_summary_table(
        ndvits.filter(tail_bucket >= F.lit(open_start)),
        nday=nday,
        nmin=nmin,
        spine_start=open_start,
        series_start=series_start,
        **qc,
    )
    kept = existing.filter(F.col("date") < F.lit(last))
    return kept.unionByName(fresh)
