"""Image decoders: native PPM/BMP plus an optional-import Pillow path.

The two classic uncompressed formats need nothing beyond numpy — the
formats are public specs: netpbm P6 (magic + ASCII dims/maxval + raw
RGB) and the Windows BITMAPINFOHEADER BMP (BI_RGB, 24 bpp, BGR rows
padded to 4 bytes, bottom-up unless height < 0). JPEG/TIFF/PNG — what
a real phenocam archive actually contains — decode through Pillow WHEN
IMPORTABLE (round-5; this container has no PIL, so those paths are
exercised via an injected stand-in and skipif-gated parity tests, and
degrade to a clearly-named ``NotImplementedError`` otherwise).

This turns the engine's injectable decode seams into a REAL path:

* ``decode_image(raw)`` -> HxWx3 uint8 RGB array — plugs directly into
  ``operators/roi_stats``' ``decode_fn`` (the reference's tier-0 decode
  seam, roitimeseries.py:394-553) and ``operators/multimodal``'s
  ``decoder=`` (flattened) so an archive of PPM/BMP images runs the
  full pixel-statistics pipeline end to end with no stub.
* ``encode_ppm(arr)`` — the matching writer, so tests can synthesize
  real image bytes and assert decode(encode(x)) == x.

Scale: decoding runs inside the existing Arrow-batched mapInPandas
stages; these functions are per-record numpy (no Python-loop pixel
work — `np.frombuffer` + reshape/slice only).
"""

from __future__ import annotations

import numpy as np


def encode_ppm(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 -> binary PPM (P6, maxval 255)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected HxWx3, got {a.shape}")
    h, w = a.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(raw: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval <= 255) -> HxWx3 uint8 RGB.

    Handles the netpbm header grammar: whitespace-separated tokens with
    ``#`` comments allowed anywhere before the pixel data; exactly one
    whitespace byte separates the maxval from the raster.
    """
    if raw[:2] != b"P6":
        raise ValueError("not a binary PPM (P6)")
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(raw):
            # progress guarantee: a truncated header must raise, never
            # spin (a corrupt record must fail, not hang the executor)
            raise ValueError("truncated PPM header")
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if raw[pos : pos + 1] == b"#":
            while pos < len(raw) and raw[pos : pos + 1] not in (b"\n", b"\r"):
                pos += 1
            continue
        start = pos
        # a '#' may begin a comment ANYWHERE, including mid-token
        # ("3#c\n" is the token 3 followed by a comment, per the spec)
        while pos < len(raw) and not raw[pos : pos + 1].isspace() and raw[
            pos : pos + 1
        ] != b"#":
            pos += 1
        if pos > start:
            tokens.append(raw[start:pos])
        if raw[pos : pos + 1] == b"#":
            # consume to end-of-line even after the maxval token, so the
            # newline terminating the comment is the raster delimiter
            while pos < len(raw) and raw[pos : pos + 1] not in (b"\n", b"\r"):
                pos += 1
    pos += 1  # the single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if not 0 < maxval <= 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    n = w * h * 3
    data = np.frombuffer(raw, dtype=np.uint8, count=n, offset=pos)
    out = data.reshape(h, w, 3)
    if maxval != 255:
        # netpbm samples are relative to maxval; rescale to 8-bit like
        # PIL/netpbm tools, otherwise low-maxval images read ~maxval/255
        # as dim and skew downstream pixel statistics
        out = np.rint(out.astype(np.float64) * (255.0 / maxval)).astype(np.uint8)
        return out
    return out.copy()


def decode_bmp(raw: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB) -> HxWx3 uint8
    RGB. Rows are 4-byte aligned BGR, bottom-up unless height < 0."""
    if raw[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = int.from_bytes(raw[10:14], "little")
    header_size = int.from_bytes(raw[14:18], "little")
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    w = int.from_bytes(raw[18:22], "little", signed=True)
    h = int.from_bytes(raw[22:26], "little", signed=True)
    bpp = int.from_bytes(raw[28:30], "little")
    compression = int.from_bytes(raw[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        raw, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    if bottom_up:
        rgb = rgb[::-1]
    return rgb.copy()


def pil_available() -> bool:
    """True when a FUNCTIONAL Pillow is importable (optional dependency
    — absent in this container, present on real archive-migration
    clusters). Capability-checked, not just importable: a module merely
    named PIL (a namespace collision, or the bare stub some tools
    install so PIL-importing code can load) must not flip the engine's
    decode/resize seams onto a Pillow that cannot actually decode."""
    try:
        from PIL import Image
    except ImportError:
        return False
    return all(hasattr(Image, a) for a in ("open", "fromarray", "LANCZOS"))


def _pil_decode(raw: bytes) -> np.ndarray | None:
    """Decode via Pillow when importable; ``None`` when Pillow is
    absent (the caller falls through to its no-codec error). A
    present-but-failing Pillow decode RAISES — a corrupt JPEG on a
    cluster that has the codec is a data error, not a missing-codec
    condition, and must not be silently re-labelled as one."""
    try:
        from PIL import Image
    except ImportError:
        return None
    if not hasattr(Image, "open"):  # importable-but-broken PIL: treat
        return None                 # as absent, keep the seam's error
    import io

    with Image.open(io.BytesIO(raw)) as im:
        # convert() covers palette/greyscale/CMYK/16-bit inputs; the
        # engine's pixel-stats contract is HxWx3 uint8 RGB, matching
        # the reference's `Image.open(...).convert('RGB')` ingest
        # (roitimeseries.py:97-227)
        arr = np.asarray(im.convert("RGB"), dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"PIL decode produced shape {arr.shape}, not HxWx3")
    return arr


def decode_image(raw: bytes) -> np.ndarray:
    """Sniff-and-decode -> HxWx3 uint8 RGB. P6 PPM and 24-bit BMP
    decode natively (zero-dependency, always available); any other
    magic (JPEG/TIFF/PNG...) goes through Pillow WHEN IMPORTABLE — the
    optional-import path a real phenocam archive (JPEG images, TIFF
    masks — roitimeseries.py:97-227, roimask.py:55-70) needs. Without
    Pillow, unknown magics raise ``NotImplementedError`` naming the
    seam, exactly as before."""
    if raw[:2] == b"P6":
        return decode_ppm(raw)
    if raw[:2] == b"BM":
        return decode_bmp(raw)
    arr = _pil_decode(raw)
    if arr is not None:
        return arr
    raise NotImplementedError(
        f"no decoder for magic {raw[:2]!r} (PPM/BMP decode natively; "
        "JPEG/TIFF/PNG decode via Pillow when installed, or inject "
        "decode_fn)"
    )


def pil_resize(arr: np.ndarray, size_hw: tuple[int, int]) -> np.ndarray:
    """Pillow Lanczos resize with this module's (height, width) seam
    signature — bit-parity with the reference's
    ``im.resize((xsize, ysize), Image.ANTIALIAS)``
    (roitimeseries.py:426-433; ANTIALIAS *is* LANCZOS in modern PIL).
    Raises ImportError when Pillow is absent — callers pick the seam
    via :func:`pil_available`, default :func:`resize_image`."""
    from PIL import Image

    a = np.asarray(arr, dtype=np.uint8)
    h, w = size_hw
    return np.asarray(
        Image.fromarray(a).resize((w, h), Image.LANCZOS), dtype=np.uint8
    )


# --------------------------------------------------------------------------
# resize-to-mask resampling (the reference's resizeFlg path,
# roitimeseries.py:426-433 / ir_roitimeseries.py:313-320: when image
# dims != mask dims, `im.resize((xsize, ysize), Image.ANTIALIAS)`).
# PIL's ANTIALIAS is a separable Lanczos-3 convolution; this is the same
# algorithm (same support window, same centering, horizontal-then-
# vertical with per-pass uint8 clamp) in plain numpy. Coefficients are
# float64 where PIL uses 8.22 fixed point, so outputs can differ from a
# given PIL build by +-1 DN on knife-edge pixels — inject the real PIL
# resize via the `resize_fn` seam for bit parity on clusters that have
# it.

def _lanczos3(x: float) -> float:
    if x <= -3.0 or x >= 3.0:
        return 0.0
    if x == 0.0:
        return 1.0
    import math

    px = math.pi * x
    return 3.0 * math.sin(px) * math.sin(px / 3.0) / (px * px)


def _resample_axis_coeffs(in_size: int, out_size: int):
    """Per-output-pixel (start, weights) for one axis — PIL
    precompute_coeffs: center = (i + 0.5) * scale, window scaled by
    max(scale, 1), weights normalized to sum 1."""
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 3.0 * filterscale
    coeffs = []
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        w = np.array(
            [_lanczos3((x - center + 0.5) / filterscale) for x in range(xmin, xmax)],
            dtype=np.float64,
        )
        s = w.sum()
        if s != 0.0:
            w /= s
        coeffs.append((xmin, w))
    return coeffs


def resize_image(arr: np.ndarray, size_hw: tuple[int, int]) -> np.ndarray:
    """Lanczos-3 resample of an HxW or HxWxC uint8 image to
    ``(out_h, out_w)`` — the ANTIALIAS semantics of the reference's
    resize-to-mask path. Horizontal pass then vertical, each clamped and
    rounded to uint8 (mirroring PIL's two-pass 8-bit pipeline)."""
    out_h, out_w = int(size_hw[0]), int(size_hw[1])
    if out_h < 1 or out_w < 1:
        raise ValueError(f"bad target size {size_hw}")
    a = np.asarray(arr)
    squeeze = a.ndim == 2
    if squeeze:
        a = a[:, :, None]
    h, w = a.shape[:2]
    if (h, w) == (out_h, out_w):
        return arr
    x = a.astype(np.float64)
    if w != out_w:
        cols = np.empty((h, out_w, x.shape[2]), dtype=np.float64)
        for j, (start, wts) in enumerate(_resample_axis_coeffs(w, out_w)):
            cols[:, j, :] = np.tensordot(
                x[:, start : start + len(wts), :], wts, axes=([1], [0])
            )
        x = np.clip(np.rint(cols), 0, 255)
    if h != out_h:
        rows = np.empty((out_h, x.shape[1], x.shape[2]), dtype=np.float64)
        for i, (start, wts) in enumerate(_resample_axis_coeffs(h, out_h)):
            rows[i, :, :] = np.tensordot(
                x[start : start + len(wts), :, :], wts, axes=([0], [0])
            )
        x = np.clip(np.rint(rows), 0, 255)
    out = x.astype(np.uint8)
    return out[:, :, 0] if squeeze else out
