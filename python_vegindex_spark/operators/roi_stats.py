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


def _decode_unavailable(raw: bytes) -> np.ndarray:
    raise NotImplementedError(
        "no image codec in this environment; inject decode_fn(bytes) -> "
        "HxWx3 uint8 array (e.g. PIL/imageio on a real cluster)"
    )


def roi_stats_table(
    images: DataFrame,
    mask: np.ndarray,
    decode_fn: Callable[[bytes], np.ndarray] | None = None,
    id_col: str = "image_id",
    content_col: str = "content",
) -> DataFrame:
    """Distributed roistats: (image_id, content: binary) -> one stats row
    per image (generate_roi_timeseries main loop re-expressed).

    The mask (tiny) ships to executors inside the Arrow-batched closure
    — the broadcast-dimension pattern; images stream through
    ``mapInPandas`` so a 100 TB archive never concentrates anywhere.
    ``decode_fn`` injects the codec (absent here -> NotImplementedError,
    honestly stubbed)."""
    decode = decode_fn or _decode_unavailable
    mask_arr = np.ascontiguousarray(mask.astype(bool))

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for image_id, raw in zip(pdf[id_col], pdf[content_col]):
                arr = decode(bytes(raw))
                stats = roi_stats_arrays(
                    arr[..., 0], arr[..., 1], arr[..., 2], mask_arr
                )
                stats["image_id"] = str(image_id)
                rows.append(stats)
            yield pd.DataFrame(rows, columns=[f.name for f in ROI_STATS_SCHEMA.fields])

    sel = images.select(id_col, content_col)
    return sel.mapInPandas(_batches, schema=ROI_STATS_SCHEMA)
