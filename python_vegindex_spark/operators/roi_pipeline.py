"""E1 end-to-end: archive -> .meta sidecars -> mask intervals -> tier-1.

The reference's generate_roi_timeseries.py:44-185 walks the archive per
ROI-mask validity interval, decodes each image, computes masked pixel
stats (tier 0), pulls exposure/awb from the image's ``.meta`` sidecar,
and appends a tier-1 roistats row; update_roi_timeseries.py:131-242 is
the incremental twin that only processes images missing from the
existing CSV. This module re-expresses both as Spark plans:

* archive listing — :func:`..sources.vegindex_tables.scan_archive`
  (catalog-scale listing, filename-timestamp parse as expressions);
* image bytes — ``spark.read.format("binaryFile")`` over the archive,
  joined to the listing by filename (never collected to the driver);
* ``.meta`` sidecars — :func:`read_meta_sidecars`: a distributed
  ``spark.read.text`` + key=value parse (roitimeseries.py:233-257
  semantics: only lines with exactly ONE '=' count, value rstripped,
  absent file/key -> ND) joined per image;
* mask assignment — a when-chain over the O(10) ROI-list mask validity
  intervals (validated non-overlapping, roilist.py:230-238) tags each
  image's mask_index in ONE pass; all masks ship together inside the
  Arrow-batched tier-0 closure (:func:`..operators.roi_stats.roi_stats_table`),
  so the archive is binary-scanned exactly once, not once per mask;
* solar elevation — the JVM NOAA expression at the image's UTC instant
  (``local ts - tzoffset`` hours, utils.py:288-313);
* gcc/rcc from band means where brt > 0 (roitimeseries.py:481-492).

Image and mask DECODING is injectable (no codec ships in this
container): ``decode_fn(bytes) -> HxWx3 uint8`` and
``mask_load_fn(path) -> bool array`` (default loads ``.npy`` masks,
True = excluded pixel). ``resize_to_mask=True`` ports the reference's
resizeFlg (roitimeseries.py:426-433): images whose dims differ from the
mask are Lanczos-resampled to the mask dims before stats (injectable
``resize_fn``); with the flag off such images are skipped, exactly as
the reference's exception path does — never silently mis-masked.
"""

from __future__ import annotations

import os
from collections.abc import Callable

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.astro import solar_elevation
from ..operators.roi_stats import IR_STAT_FIELDS, roi_ir_stats_table, roi_stats_table
from ..sources import catalog
from ..sources.vegindex_tables import scan_archive

# tier-1 roistats field order (roitimeseries.py:778-789 writeCSV header)
ROI_STATS_FIELDS = (
    ["date", "local_std_time", "doy", "filename", "solar_elev"]
    + ["exposure", "awbflag", "mask_index", "gcc", "rcc"]
    + [
        f"{band}_{name}"
        for band in ("r", "g", "b")
        for name in (
            "mean", "std", "5_qtl", "10_qtl", "25_qtl",
            "50_qtl", "75_qtl", "90_qtl", "95_qtl",
        )
    ]
    + ["r_g_correl", "g_b_correl", "b_r_correl"]
)


def read_meta_sidecars(spark: SparkSession, meta_paths) -> DataFrame:
    """``.meta`` key=value sidecars -> (img_base, exposure, awbflag).

    get_im_metadata (roitimeseries.py:233-257) splits each line on '='
    and silently skips lines that don't unpack to exactly two parts;
    values are right-stripped. The consumer (create_row,
    roitimeseries.py:493-507) int()-casts ``exposure`` and ``balance``
    and falls back to ND on any failure — mirrored with try_cast.
    ``img_base`` is the sidecar filename minus ``.meta``, the join key
    back to the image's basename-minus-extension.

    Accepts a root directory (searched recursively for ``*.meta``), a
    glob, or a list of paths; a distributed text scan, so a 100-TB
    archive's sidecars never funnel through the driver.
    """
    txt = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.meta")
        .text(meta_paths)
        .select(
            F.input_file_name().alias("meta_path"),
            "value",
            # in-file line order: text rows of one (tiny, single-split)
            # sidecar stay in one partition in file order, where
            # monotonically_increasing_id is strictly increasing
            F.monotonically_increasing_id().alias("line_id"),
        )
    )
    parts = F.split("value", "=")
    kv = txt.filter(F.size(parts) == 2).select(
        "meta_path",
        F.element_at(parts, 1).alias("k"),
        F.rtrim(F.element_at(parts, 2)).alias("v"),
        "line_id",
    )

    def _last(key: str):
        # the reference's dict assignment keeps the LAST occurrence of a
        # duplicated key (get_im_metadata builds a dict line by line) —
        # max_by over the line id, ignoring other keys' rows
        is_k = F.col("k") == key
        return F.max_by(F.when(is_k, F.col("v")), F.when(is_k, F.col("line_id")))

    agg = kv.groupBy("meta_path").agg(
        _last("exposure").alias("_exp"), _last("balance").alias("_bal")
    )
    return agg.select(
        F.regexp_extract("meta_path", r"([^/]+)\.meta$", 1).alias("img_base"),
        F.col("_exp").try_cast("int").alias("exposure"),
        F.col("_bal").try_cast("int").alias("awbflag"),
    )


def _default_mask_load(path: str) -> np.ndarray:
    """Mask raster loader seam: ``.npy`` natively; TIFF (the
    reference's mask format) through Pillow when importable. Matches
    the reference's RAW boolean cast ``np.asarray(mask_img,
    dtype=np.bool8)`` (roimask.py:62-69) — no luminance conversion, so
    a pixel is masked-out iff its raw value is nonzero. Multi-band
    rasters reduce any-channel-nonzero to HxW (the reference would
    return a 3-D mask there and fail downstream; single-band masks are
    the contract)."""
    if path.endswith(".npy"):
        return np.load(path).astype(bool)
    try:
        from PIL import Image
    except ImportError:
        Image = None
    if Image is None or not hasattr(Image, "open"):
        # absent OR importable-but-broken (name collision / bare stub)
        raise NotImplementedError(
            "no image codec importable for mask rasters; install "
            "Pillow, inject mask_load_fn(path) -> bool HxW array, or "
            "ship .npy masks"
        )
    with Image.open(path) as im:
        mask = np.asarray(im).astype(bool)
    return mask.any(axis=-1) if mask.ndim == 3 else mask


def _tier1_stats_core(
    spark: SparkSession,
    archive_dir: str,
    site: str,
    roilist_id: str,
    stats_table_fn,
    glob: str,
    ir: bool,
    decode_fn: Callable[[bytes], np.ndarray] | None,
    mask_load_fn: Callable[[str], np.ndarray] | None,
    exclude_filenames: DataFrame | None,
    resize_to_mask: bool = False,
    resize_fn: Callable[[np.ndarray, tuple[int, int]], np.ndarray] | None = None,
) -> DataFrame:
    """Shared RGB/IR tier-1 core: archive listing -> one-pass mask-index
    assignment -> single binary scan -> per-image stats kernel ->
    ``.meta`` sidecar join.
    Returns (filename, <stats...>, ts, mask_index, exposure, awbflag);
    callers project by name.

    ``exclude_filenames`` (a 1-column ``filename`` DataFrame) anti-joins
    already-processed images away — the incremental path
    (update_roi_timeseries.py:131-242 / update_roi_ir_timeseries.py only
    append rows whose image is not in the existing CSV).
    """
    mask_load = mask_load_fn or _default_mask_load
    roilist, _props = catalog.get_roi_list(spark, archive_dir, site, roilist_id)
    masks = sorted(roilist.collect(), key=lambda r: r["mask_index"])

    imgs = scan_archive(spark, archive_dir, site, ir=ir)
    if exclude_filenames is not None:
        imgs = imgs.join(
            exclude_filenames.select("filename"), on="filename", how="left_anti"
        )

    # one distributed binary scan of the whole site tree; joined to the
    # listing by basename (unique: filenames embed the full timestamp).
    # The RGB glob also matches IR files; the inner join against the
    # RGB-only listing drops them (and vice versa the IR glob is exact).
    binary = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", glob)
        .load(os.path.join(archive_dir, site))
        .select(
            F.regexp_extract("path", r"([^/]+)$", 1).alias("filename"), "content"
        )
    )

    meta = read_meta_sidecars(spark, os.path.join(archive_dir, site))

    if not masks:
        raise ValueError(f"ROI list {roilist_id} has no masks")
    # single-pass mask-interval assignment: validity intervals are
    # validated non-overlapping (roilist.py:230-238), so a when-chain
    # over the O(10) masks assigns each image its one mask_index and the
    # whole archive flows through ONE binary scan — never one scan (and
    # one full byte read) per mask
    assign = None
    for m in masks:
        cond = F.col("ts").between(m["start_ts"], m["end_ts"])
        val = F.lit(int(m["mask_index"]))
        assign = F.when(cond, val) if assign is None else assign.when(cond, val)
    imgs = imgs.withColumn("mask_index", assign).filter(
        F.col("mask_index").isNotNull()
    )
    mask_arrs = {
        int(m["mask_index"]): mask_load(
            catalog.roi_path(archive_dir, site, m["maskfile"])
        )
        for m in masks
    }

    # ts and mask_index ride THROUGH the mapInPandas stage — re-joining
    # them from the listing afterwards would re-execute the listing scan
    # and shuffle O(archive) rows for two tiny columns
    all_stats = stats_table_fn(
        imgs.join(binary, on="filename"),
        mask=mask_arrs,
        mask_index_col="mask_index",
        decode_fn=decode_fn,
        id_col="filename",
        content_col="content",
        passthrough_cols=["ts", "mask_index"],
        resize_to_mask=resize_to_mask,
        resize_fn=resize_fn,
    ).withColumnRenamed("image_id", "filename")

    base = F.regexp_replace("filename", r"\.[^.]+$", "")
    # no broadcast hint: the sidecar table is O(images in the archive) —
    # unbounded at the design point — so the join stays a shuffle join
    # (AQE still broadcasts it at runtime when it is actually small)
    return all_stats.withColumn("img_base", base).join(
        meta, on="img_base", how="left"
    )


def _ts_label_cols(lat: float, lon: float, tzoffset: float) -> list:
    """date/local time/doy/solar_elev projection shared by both tiers
    (create_row, roitimeseries.py:444-478 / ir_roitimeseries.py:281-308)."""
    # seconds, not make_interval(hours=...): Spark int-casts a fractional
    # hour (5.5 -> 5h), which would shift half-hour zones (e.g. -3.5,
    # +5.75) by up to 45 min and flip images near the sunelev_min gate
    utc_ts = F.col("ts") - F.make_dt_interval(
        secs=F.lit(round(float(tzoffset) * 3600.0, 6))
    )
    return [
        F.to_date("ts").alias("date"),
        F.date_format("ts", "HH:mm:ss").alias("local_std_time"),
        F.dayofyear("ts").alias("doy"),
        F.col("filename"),
        solar_elevation(utc_ts, F.lit(float(lat)), F.lit(float(lon)))
        .alias("solar_elev"),
    ]


def generate_roi_stats(
    spark: SparkSession,
    archive_dir: str,
    site: str,
    roilist_id: str,
    lat: float,
    lon: float,
    tzoffset: float = 0.0,
    decode_fn: Callable[[bytes], np.ndarray] | None = None,
    mask_load_fn: Callable[[str], np.ndarray] | None = None,
    exclude_filenames: DataFrame | None = None,
    resize_to_mask: bool = False,
    resize_fn: Callable[[np.ndarray, tuple[int, int]], np.ndarray] | None = None,
) -> DataFrame:
    """Archive -> tier-1 roistats DataFrame in ROI_STATS_FIELDS order."""
    all_stats = _tier1_stats_core(
        spark, archive_dir, site, roilist_id,
        stats_table_fn=roi_stats_table, glob="*.jpg", ir=False,
        decode_fn=decode_fn, mask_load_fn=mask_load_fn,
        exclude_filenames=exclude_filenames,
        resize_to_mask=resize_to_mask, resize_fn=resize_fn,
    )
    brt = F.col("r_mean") + F.col("g_mean") + F.col("b_mean")
    out = all_stats.select(
        *_ts_label_cols(lat, lon, tzoffset),
        "exposure",
        "awbflag",
        "mask_index",
        F.when(brt > 0, F.col("g_mean") / brt).alias("gcc"),
        F.when(brt > 0, F.col("r_mean") / brt).alias("rcc"),
        *[
            F.col(c)
            for c in ROI_STATS_FIELDS
            if c.startswith(("r_", "g_", "b_"))
        ],
        F.col("ts"),
    )
    assert [c for c in out.columns if c != "ts"] == ROI_STATS_FIELDS
    return out


# tier-1 IR roistats field order (ir_roitimeseries.py:225-239 header)
IR_ROI_STATS_FIELDS = (
    ["date", "local_std_time", "doy", "filename", "solar_elev"]
    + ["exposure", "awbflag", "mask_index"]
    + IR_STAT_FIELDS
)


def generate_roi_ir_stats(
    spark: SparkSession,
    archive_dir: str,
    site: str,
    roilist_id: str,
    lat: float,
    lon: float,
    tzoffset: float = 0.0,
    decode_fn: Callable[[bytes], np.ndarray] | None = None,
    mask_load_fn: Callable[[str], np.ndarray] | None = None,
    exclude_filenames: DataFrame | None = None,
    resize_to_mask: bool = False,
    resize_fn: Callable[[np.ndarray, tuple[int, int]], np.ndarray] | None = None,
) -> DataFrame:
    """Archive -> tier-1 IR roistats in IR_ROI_STATS_FIELDS order — the
    generate_roi_ir_timeseries.py twin: same scan/mask/sidecar plumbing,
    IR filename lattice (``{site}_IR_YYYY_...``, utils.py fn2datetime
    irFlag=True) and the single-channel stats kernel."""
    all_stats = _tier1_stats_core(
        spark, archive_dir, site, roilist_id,
        stats_table_fn=roi_ir_stats_table, glob="*_IR_*.jpg", ir=True,
        decode_fn=decode_fn, mask_load_fn=mask_load_fn,
        exclude_filenames=exclude_filenames,
        resize_to_mask=resize_to_mask, resize_fn=resize_fn,
    )
    out = all_stats.select(
        *_ts_label_cols(lat, lon, tzoffset),
        "exposure",
        "awbflag",
        "mask_index",
        *[F.col(c) for c in IR_STAT_FIELDS],
        F.col("ts"),
    )
    assert [c for c in out.columns if c != "ts"] == IR_ROI_STATS_FIELDS
    return out


def fake_decode(raw: bytes, h: int = 48, w: int = 64) -> np.ndarray:
    """Deterministic stand-in codec for tests / --codec fake: the first
    4 content bytes seed a reproducible HxWx3 uint8 array (same pattern
    as tests/test_roi_stats.py and operators/multimodal.py)."""
    seed = int.from_bytes(raw[:4], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(20, 200, (h, w, 3)).astype(np.uint8)


def update_roi_stats(
    existing: DataFrame,
    spark: SparkSession,
    archive_dir: str,
    site: str,
    roilist_id: str,
    **kw,
) -> DataFrame:
    """Incremental tier-1: stats only for images absent from ``existing``
    (by filename, the reference's dedup key — update_roi_timeseries.py
    appends rows for new images and leaves old rows untouched), unioned
    with the existing rows. Invariant (tested): update over a partial
    table == generate over the full archive, row for row."""
    return _update_union(existing, generate_roi_stats, spark, archive_dir,
                         site, roilist_id, **kw)


def update_roi_ir_stats(
    existing: DataFrame,
    spark: SparkSession,
    archive_dir: str,
    site: str,
    roilist_id: str,
    **kw,
) -> DataFrame:
    """Incremental IR tier-1 (update_roi_ir_timeseries.py twin): same
    anti-join-by-filename increment as :func:`update_roi_stats`."""
    return _update_union(existing, generate_roi_ir_stats, spark, archive_dir,
                         site, roilist_id, **kw)


def _update_union(existing, generate_fn, spark, archive_dir, site,
                  roilist_id, **kw) -> DataFrame:
    fresh = generate_fn(
        spark,
        archive_dir,
        site,
        roilist_id,
        exclude_filenames=existing.select("filename"),
        **kw,
    )
    keep_cols = fresh.columns
    ex = existing
    if "ts" not in ex.columns:
        ex = ex.withColumn(
            "ts", F.to_timestamp(F.concat_ws(" ", "date", "local_std_time"))
        )
    return ex.select(*keep_cols).unionByName(fresh)
