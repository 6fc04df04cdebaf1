"""Tier-0 per-image ROI pixel statistics (the roistats generator).

The reference's innermost kernel (get_dn_means roitimeseries.py:55-95,
get_roi_stats roitimeseries.py:97-227) computes masked-pixel statistics
for one image/mask pair. Here the same math runs vectorized over a
DataFrame of binary image columns via ``mapInPandas`` — the Spark side
(schema, batching, mask broadcast) is real; only the jpg/tiff DECODE is
stubbed behind an injectable callable because no image codec ships in
this container (same honest pattern as operators/multimodal.py).

Array-level semantics are exact:
* band means over the UNMASKED pixels; ``brt`` over the whole image
  (get_dn_means:88-91 uses the full-frame brt mean);
* population std via the dot-product form (roitimeseries.py:196-207);
* the 7 percentiles (5/10/25/50/75/90/95) with ``np.percentile``'s
  linear interpolation — identical to the reference call
  (roitimeseries.py:210-212);
* cross-band correlations from the covariance cross terms
  (roitimeseries.py:215-223);
* dark/bright guards: if the inner crop (30 px border removed) of the
  FULL-frame brightness is < 30 or > 725, every stat is ND
  (roitimeseries.py:119-170 — note the guard uses the whole image, not
  the ROI);
* mask convention: True = pixel EXCLUDED (np.ma).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

PCT_QS = (5.0, 10.0, 25.0, 50.0, 75.0, 90.0, 95.0)

_BANDS = ("r", "g", "b")
_STAT_FIELDS = [
    f"{band}_{name}"
    for band in _BANDS
    for name in ("mean", "std", "5_qtl", "10_qtl", "25_qtl", "50_qtl", "75_qtl", "90_qtl", "95_qtl")
] + ["r_g_correl", "g_b_correl", "b_r_correl"]

ROI_STATS_SCHEMA = T.StructType(
    [T.StructField("image_id", T.StringType())]
    + [T.StructField("brt", T.DoubleType())]
    + [T.StructField(f, T.DoubleType()) for f in _STAT_FIELDS]
)


def dn_means_arrays(
    r: np.ndarray, g: np.ndarray, b: np.ndarray, mask: np.ndarray
) -> tuple[float, float, float, float]:
    """get_dn_means (roitimeseries.py:55-95): ROI band means + whole-frame brt."""
    brt = float((r.astype(np.float64) + g + b).mean())
    keep = ~mask.astype(bool)
    return (
        float(r[keep].mean()),
        float(g[keep].mean()),
        float(b[keep].mean()),
        brt,
    )


def roi_stats_arrays(
    r: np.ndarray, g: np.ndarray, b: np.ndarray, mask: np.ndarray
) -> dict[str, float | None]:
    """get_roi_stats (roitimeseries.py:97-227) on raw band arrays."""
    r16 = r.astype(np.int16)
    g16 = g.astype(np.int16)
    b16 = b.astype(np.int16)
    brt_full = r16 + g16 + b16
    out: dict[str, float | None] = {
        "brt": float(brt_full.astype(np.float64).mean())
    }
    inner = brt_full[30:-30, 30:-30]
    # Images under ~61 px have an EMPTY inner crop; the reference's
    # np.mean of the empty slice is NaN, which fails BOTH comparisons
    # (roitimeseries.py:123,147), so tiny images always pass the guards
    # and proceed to full stats — mirrored here by skipping the guard.
    if inner.size:
        inner_mean = inner.mean()
        if inner_mean < 30.0 or inner_mean > 725.0:
            for f in _STAT_FIELDS:
                out[f] = None
            return out

    keep = ~mask.astype(bool)
    vals = {"r": r16[keep].astype(np.float64), "g": g16[keep].astype(np.float64), "b": b16[keep].astype(np.float64)}
    diffs, stds = {}, {}
    for band, v in vals.items():
        mean = v.mean()
        diff = v - mean
        std = float(np.sqrt(np.dot(diff, diff) / v.size))
        diffs[band], stds[band] = diff, std
        out[f"{band}_mean"] = float(mean)
        out[f"{band}_std"] = std
        pcts = np.percentile(v, PCT_QS)
        for q, p in zip((5, 10, 25, 50, 75, 90, 95), pcts):
            out[f"{band}_{q}_qtl"] = float(p)
    n = diffs["r"].size
    out["r_g_correl"] = float(np.dot(diffs["r"], diffs["g"]) / n / (stds["r"] * stds["g"]))
    out["g_b_correl"] = float(np.dot(diffs["g"], diffs["b"]) / n / (stds["g"] * stds["b"]))
    out["b_r_correl"] = float(np.dot(diffs["b"], diffs["r"]) / n / (stds["b"] * stds["r"]))
    return out


# --------------------------------------------------------------------------
# IR twin (ir_roitimeseries.py): single-channel stats over the same ROI mask

IR_STAT_FIELDS = ["ir_mean", "ir_std"] + [
    f"ir_{q}_qtl" for q in (5, 10, 25, 50, 75, 90, 95)
]

IR_STATS_SCHEMA = T.StructType(
    [T.StructField("image_id", T.StringType())]
    + [T.StructField(f, T.DoubleType()) for f in IR_STAT_FIELDS]
)


def roi_ir_stats_arrays(
    ir: np.ndarray, b2: np.ndarray, b3: np.ndarray, mask: np.ndarray
) -> dict[str, float | None]:
    """get_roi_IR_stats (ir_roitimeseries.py:56-121) on raw band arrays.

    IR images are stored as 3-band files whose bands "should all be the
    same"; the stats use band 0 only, while the dark/bright guards use
    the 3-band sum's inner crop (same < 30 / > 725 thresholds as the RGB
    kernel, ir_roitimeseries.py:82-96). Mean, POPULATION std via the
    dot-product form, and the same 7 linear-interpolation percentiles —
    all over the unmasked pixels. Tiny images (< ~61 px) have an empty
    inner crop whose np.mean is NaN, failing both guard comparisons, so
    they proceed to full stats — mirrored by skipping the guard.
    """
    ir16 = ir.astype(np.int16)
    brt_full = ir16 + b2.astype(np.int16) + b3.astype(np.int16)
    out: dict[str, float | None] = {}
    inner = brt_full[30:-30, 30:-30]
    if inner.size:
        inner_mean = inner.mean()
        if inner_mean < 30.0 or inner_mean > 725.0:
            for f in IR_STAT_FIELDS:
                out[f] = None
            return out
    keep = ~mask.astype(bool)
    vals = ir16[keep].astype(np.float64)
    mean = vals.mean()
    diff = vals - mean
    out["ir_mean"] = float(mean)
    out["ir_std"] = float(np.sqrt(np.dot(diff, diff) / vals.size))
    for q, p in zip((5, 10, 25, 50, 75, 90, 95), np.percentile(vals, PCT_QS)):
        out[f"ir_{q}_qtl"] = float(p)
    return out


def _default_decode(raw: bytes) -> np.ndarray:
    """Default codec seam (round-5): PPM/BMP decode natively, anything
    else (JPEG/TIFF — the real archive formats) through Pillow when it
    is importable; otherwise a clearly-named NotImplementedError.
    ``decode_fn`` still overrides for custom codecs."""
    from ..codecs.images import decode_image

    return decode_image(raw)


def _stats_map_table(
    images: DataFrame,
    mask: np.ndarray | dict[int, np.ndarray],
    stats_fn,
    schema: T.StructType,
    decode_fn: Callable[[bytes], np.ndarray] | None,
    id_col: str,
    content_col: str,
    mask_index_col: str | None = None,
    passthrough_cols: list[str] | None = None,
    resize_to_mask: bool = False,
    resize_fn: Callable[[np.ndarray, tuple[int, int]], np.ndarray] | None = None,
) -> DataFrame:
    """Shared mapInPandas plumbing for the per-image stats kernels: the
    tiny mask(s) ship to executors inside the Arrow-batched closure (the
    broadcast-dimension pattern); images stream through ``mapInPandas``
    so a 100 TB archive never concentrates anywhere. ``mask`` is either
    one array, or a dict keyed by mask index with ``mask_index_col``
    naming the per-row index column — the multi-mask form lets a whole
    archive flow through ONE binary scan instead of one scan per mask.
    ``decode_fn`` injects the codec (default: native PPM/BMP, Pillow
    for JPEG/TIFF when importable, else NotImplementedError — see
    ``codecs.images.decode_image``). ``passthrough_cols`` ride along
    unchanged and are
    appended after the stats columns — carrying tiny metadata (ts, mask
    index) THROUGH the stage saves the caller a re-join against the
    listing, i.e. a second listing scan plus a shuffle over O(archive)
    rows.

    Mixed-resolution archives (cameras get swapped): when a decoded
    image's dims differ from its mask, ``resize_to_mask=True`` resizes
    the image to the mask dims before stats (the reference's resizeFlg,
    roitimeseries.py:426-433 — ANTIALIAS; default
    ``codecs.images.resize_image``, a Lanczos-3 twin, injectable via
    ``resize_fn``). With the flag off, mismatched images are SKIPPED —
    the reference's "Problem getting ROI stats ... Skipping this file"
    path (roitimeseries.py:445-455: the masked-array constructor raises
    and the row is dropped), never silently mis-masked."""
    decode = decode_fn or _default_decode
    if resize_fn is None:
        # bit-parity preference (round-5): the reference resizes via
        # PIL (roitimeseries.py:426-433), so when Pillow is importable
        # the seam defaults to it — the native Lanczos twin (±1 DN on
        # knife-edge pixels) covers Pillow-less environments
        from ..codecs.images import pil_available, pil_resize, resize_image

        resize_fn = pil_resize if pil_available() else resize_image
    if isinstance(mask, dict):
        if mask_index_col is None:
            raise ValueError("mask dict requires mask_index_col")
        masks = {int(k): np.ascontiguousarray(v.astype(bool)) for k, v in mask.items()}
    else:
        masks = {0: np.ascontiguousarray(mask.astype(bool))}
    passthrough = list(passthrough_cols or [])
    in_cols = [id_col, content_col] + ([mask_index_col] if mask_index_col else [])
    in_cols += [c for c in passthrough if c not in in_cols]
    out_schema = T.StructType(
        list(schema.fields) + [images.schema[c] for c in passthrough]
    )
    stat_names = [f.name for f in schema.fields]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mis = pdf[mask_index_col] if mask_index_col else [0] * len(pdf)
            rows, kept = [], []
            for pos, (image_id, raw, mi) in enumerate(
                zip(pdf[id_col], pdf[content_col], mis)
            ):
                arr = decode(bytes(raw))
                m = masks[int(mi)]
                if arr.shape[:2] != m.shape:
                    if resize_to_mask:
                        arr = resize_fn(arr, m.shape)
                    else:
                        continue  # reference skips mismatched files
                stats = stats_fn(arr[..., 0], arr[..., 1], arr[..., 2], m)
                stats["image_id"] = str(image_id)
                rows.append(stats)
                kept.append(pos)
            out = pd.DataFrame(rows, columns=stat_names)
            for c in passthrough:
                out[c] = pdf[c].to_numpy()[kept]
            yield out

    return images.select(*in_cols).mapInPandas(_batches, schema=out_schema)


def roi_stats_table(
    images: DataFrame,
    mask: np.ndarray | dict[int, np.ndarray],
    decode_fn: Callable[[bytes], np.ndarray] | None = None,
    id_col: str = "image_id",
    content_col: str = "content",
    mask_index_col: str | None = None,
    passthrough_cols: list[str] | None = None,
    resize_to_mask: bool = False,
    resize_fn: Callable[[np.ndarray, tuple[int, int]], np.ndarray] | None = None,
) -> DataFrame:
    """Distributed roistats: (image_id, content: binary) -> one stats row
    per image (generate_roi_timeseries main loop re-expressed)."""
    return _stats_map_table(
        images, mask, roi_stats_arrays, ROI_STATS_SCHEMA,
        decode_fn, id_col, content_col, mask_index_col, passthrough_cols,
        resize_to_mask, resize_fn,
    )


def roi_ir_stats_table(
    images: DataFrame,
    mask: np.ndarray | dict[int, np.ndarray],
    decode_fn: Callable[[bytes], np.ndarray] | None = None,
    id_col: str = "image_id",
    content_col: str = "content",
    mask_index_col: str | None = None,
    passthrough_cols: list[str] | None = None,
    resize_to_mask: bool = False,
    resize_fn: Callable[[np.ndarray, tuple[int, int]], np.ndarray] | None = None,
) -> DataFrame:
    """Distributed IR roistats: the generate_roi_ir_timeseries inner loop
    (ir_roitimeseries.py create_row) as the same streaming plan. Same
    resize-to-mask semantics as :func:`roi_stats_table`
    (ir_roitimeseries.py:313-320)."""
    return _stats_map_table(
        images, mask, roi_ir_stats_arrays, IR_STATS_SCHEMA,
        decode_fn, id_col, content_col, mask_index_col, passthrough_cols,
        resize_to_mask, resize_fn,
    )
