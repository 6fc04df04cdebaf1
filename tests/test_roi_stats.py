"""Tier-0 per-image ROI pixel statistics vs direct numpy formulas
(get_dn_means roitimeseries.py:55-95, get_roi_stats :97-227)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from python_vegindex_spark.operators.roi_stats import (
    ROI_STATS_SCHEMA,
    dn_means_arrays,
    roi_stats_arrays,
    roi_stats_table,
)

H, W = 100, 120
RNG = np.random.default_rng(9)


def _img():
    return (
        RNG.integers(20, 200, (H, W)).astype(np.uint8),
        RNG.integers(20, 200, (H, W)).astype(np.uint8),
        RNG.integers(20, 200, (H, W)).astype(np.uint8),
    )


def _mask():
    m = np.ones((H, W), dtype=bool)  # True = excluded
    m[10:60, 20:90] = False          # ROI window
    return m


def test_dn_means_match_numpy():
    r, g, b = _img()
    m = _mask()
    r_mean, g_mean, b_mean, brt = dn_means_arrays(r, g, b, m)
    keep = ~m
    assert r_mean == pytest.approx(r[keep].mean(), rel=1e-12)
    assert g_mean == pytest.approx(g[keep].mean(), rel=1e-12)
    # brt is the WHOLE-frame brightness (get_dn_means:88)
    assert brt == pytest.approx(
        (r.astype(float) + g + b).mean(), rel=1e-12
    )


def test_roi_stats_values():
    r, g, b = _img()
    m = _mask()
    s = roi_stats_arrays(r, g, b, m)
    keep = ~m
    rv = r[keep].astype(np.float64)
    gv = g[keep].astype(np.float64)
    assert s["r_mean"] == pytest.approx(rv.mean(), rel=1e-12)
    assert s["r_std"] == pytest.approx(rv.std(ddof=0), rel=1e-12)  # population
    assert s["g_50_qtl"] == pytest.approx(np.percentile(gv, 50.0), rel=1e-12)
    assert s["r_g_correl"] == pytest.approx(np.corrcoef(rv, gv)[0, 1], rel=1e-9)
    assert -1.0 <= s["b_r_correl"] <= 1.0


def test_dark_bright_guards():
    m = _mask()
    dark = np.full((H, W), 5, dtype=np.uint8)
    s = roi_stats_arrays(dark, dark, dark, m)
    assert s["r_mean"] is None and s["r_g_correl"] is None
    bright = np.full((H, W), 250, dtype=np.uint8)
    s2 = roi_stats_arrays(bright, bright, bright, m)
    assert s2["gcc" if False else "g_mean"] is None
    # borderline-inner crop: bright border but dim interior passes
    mixed = np.full((H, W), 250, dtype=np.uint8)
    mixed[30:-30, 30:-30] = 60
    s3 = roi_stats_arrays(mixed, mixed, mixed, m)
    assert s3["r_mean"] is not None


def test_roi_stats_table_with_fake_decoder(spark):
    """The distributed path with a deterministic fake codec: content
    bytes are a seed; decode synthesizes the HxWx3 array."""

    def fake_decode(raw: bytes) -> np.ndarray:
        seed = int.from_bytes(raw[:4], "big")
        rng = np.random.default_rng(seed)
        return rng.integers(20, 200, (H, W, 3)).astype(np.uint8)

    m = _mask()
    pdf = pd.DataFrame(
        {
            "image_id": [f"img{i}" for i in range(6)],
            "content": [int(i).to_bytes(4, "big") for i in range(6)],
        }
    )
    out = roi_stats_table(
        spark.createDataFrame(pdf), mask=m, decode_fn=fake_decode
    ).collect()
    assert len(out) == 6
    byid = {r["image_id"]: r for r in out}
    # spot-check one image against the array-level function
    arr = fake_decode(int(2).to_bytes(4, "big"))
    exp = roi_stats_arrays(arr[..., 0], arr[..., 1], arr[..., 2], m)
    assert byid["img2"]["r_mean"] == pytest.approx(exp["r_mean"], rel=1e-12)
    assert byid["img2"]["b_95_qtl"] == pytest.approx(exp["b_95_qtl"], rel=1e-12)


def test_roi_stats_table_stub_raises(spark):
    """An undecodable payload with no injected decode_fn fails loudly:
    NotImplementedError naming the seam when Pillow is absent (this
    container), or Pillow's cannot-identify error when present — never
    a silent skip."""
    pdf = pd.DataFrame({"image_id": ["x"], "content": [b"1234"]})
    df = roi_stats_table(spark.createDataFrame(pdf), mask=_mask())
    with pytest.raises(Exception, match="no decoder for magic|identify"):
        df.collect()


def test_tiny_image_skips_guards():
    """Images under ~61 px have an empty 30-px inner crop; the reference's
    mean of the empty slice is NaN, which fails BOTH guard comparisons
    (roitimeseries.py:123,147), so full stats are computed even for an
    otherwise too-dark or too-bright tiny frame."""
    m = np.zeros((10, 10), dtype=bool)
    dark = np.full((10, 10), 2, dtype=np.uint8)
    s = roi_stats_arrays(dark, dark, dark, m)
    assert s["r_mean"] == pytest.approx(2.0)
    bright = np.full((10, 10), 250, dtype=np.uint8)
    s2 = roi_stats_arrays(bright, bright, bright, m)
    assert s2["g_mean"] == pytest.approx(250.0)


def test_roi_stats_table_multi_mask(spark):
    """The multi-mask form: a dict of masks + a per-row mask_index column
    routes each image through its own mask inside ONE kernel pass."""

    def fake_decode(raw: bytes) -> np.ndarray:
        seed = int.from_bytes(raw[:4], "big")
        rng = np.random.default_rng(seed)
        return rng.integers(20, 200, (H, W, 3)).astype(np.uint8)

    m1 = _mask()
    m2 = np.zeros((H, W), dtype=bool)
    m2[H // 2 :, :] = True
    pdf = pd.DataFrame(
        {
            "image_id": [f"img{i}" for i in range(4)],
            "content": [int(i).to_bytes(4, "big") for i in range(4)],
            "mask_index": [1, 2, 1, 2],
        }
    )
    out = roi_stats_table(
        spark.createDataFrame(pdf),
        mask={1: m1, 2: m2},
        mask_index_col="mask_index",
        decode_fn=fake_decode,
    ).collect()
    byid = {r["image_id"]: r for r in out}
    assert len(byid) == 4
    for i, m in [(0, m1), (1, m2), (2, m1), (3, m2)]:
        arr = fake_decode(int(i).to_bytes(4, "big"))
        exp = roi_stats_arrays(arr[..., 0], arr[..., 1], arr[..., 2], m)
        assert byid[f"img{i}"]["g_mean"] == pytest.approx(exp["g_mean"], rel=1e-12)
        assert byid[f"img{i}"]["r_g_correl"] == pytest.approx(
            exp["r_g_correl"], rel=1e-12
        )
    # the two masks genuinely differ for the same image
    arr = fake_decode(int(0).to_bytes(4, "big"))
    e1 = roi_stats_arrays(arr[..., 0], arr[..., 1], arr[..., 2], m1)
    e2 = roi_stats_arrays(arr[..., 0], arr[..., 1], arr[..., 2], m2)
    assert e1["g_mean"] != e2["g_mean"]


def test_roi_stats_table_mask_dict_requires_index_col(spark):
    pdf = pd.DataFrame({"image_id": ["x"], "content": [b"1234"]})
    with pytest.raises(ValueError, match="mask_index_col"):
        roi_stats_table(spark.createDataFrame(pdf), mask={1: _mask()})
