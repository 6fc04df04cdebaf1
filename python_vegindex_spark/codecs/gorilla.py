"""Gorilla XOR float compression + delta-of-delta timestamp compression.

North_rule additions (no vegindex analog): per-(series, ts-bucket) chunk
columns storing compressed timestamps/values as binary, per the public
Gorilla paper (Pelkonen et al., VLDB 2015) design.

Format (self-defined, documented for decode parity):

Timestamps (int64 microseconds, non-decreasing):
  [64b first_ts] then per delta-of-delta (first delta vs prev_delta=0):
    dod == 0                  -> '0'
    dod in [-63, 64]          -> '10'   + 7  bits (dod + 63)
    dod in [-255, 256]        -> '110'  + 9  bits (dod + 255)
    dod in [-2047, 2048]      -> '1110' + 12 bits (dod + 2047)
    else                      -> '1111' + 64 bits (two's complement)

Floats (float64, NaN-safe — NaN is just a bit pattern):
  [64b first value bits] then per XOR with previous value:
    xor == 0 -> '0'
    else     -> '1' + 5 bits leading-zero count (capped 31)
                    + 6 bits (meaningful-length - 1)
                    + meaningful bits (xor >> trailing zeros)
  (Stateless-window variant of Gorilla: the "reuse previous window"
  branch is dropped so encoding is fully numpy-vectorizable; costs a
  few bits per non-zero XOR, decode state stays trivial.)

Encoding is vectorized numpy end-to-end (bit matrix -> packbits); decode
walks elements (not bits) with a byte-window cursor. Both run inside
grouped applyInPandas over Arrow batches (codecs/chunks.py) — chunk
sizes are bounded by the ts-bucket, so memory per group is bounded.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (x != 0)."""
    # top 32 bits via float64 log2 is unsafe near 2^53; use bit halving
    n = np.full(x.shape, 0, dtype=np.int64)
    v = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = v >> _U64(64 - shift) == 0
        n = np.where(mask, n + shift, n)
        v = np.where(mask, v << _U64(shift), v)
    return n


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros for uint64 (x != 0)."""
    lowbit = x & (~x + _U64(1))
    return 63 - _clz64(lowbit)


def _pack_segments(vals: np.ndarray, lens: np.ndarray) -> bytes:
    """Concatenate per-element MSB-first bit codes (vals[i] in lens[i]
    bits) into a byte string. Fully vectorized via a (n, 64) bit matrix."""
    n = len(vals)
    if n == 0:
        return b""
    maxlen = 64
    shifts = np.arange(maxlen - 1, -1, -1, dtype=np.uint64)
    bits = (vals[:, None] >> shifts[None, :]) & _U64(1)  # (n, 64) MSB..LSB
    # keep only the last lens[i] bits of each row, in order
    keep = (np.arange(maxlen)[None, :] >= (maxlen - lens[:, None]))
    flat = bits[keep].astype(np.uint8)  # row-major: element order preserved
    return np.packbits(flat).tobytes()


class _BitReader:
    """Element-wise bit cursor over bytes (reads up to 64 bits at a time)."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        p = self.pos
        self.pos = p + k
        first_byte = p >> 3
        last_byte = (p + k - 1) >> 3
        window = int.from_bytes(self.data[first_byte : last_byte + 1], "big")
        total_bits = (last_byte - first_byte + 1) * 8
        window >>= total_bits - (p - (first_byte << 3)) - k
        return window & ((1 << k) - 1)


# ---------------------------------------------------------------------------
# timestamps: delta-of-delta
# ---------------------------------------------------------------------------

_TS_CLASSES = (  # (low, high, head_bits, head_len, payload_bits, bias)
    (-63, 64, 0b10, 2, 7, 63),
    (-255, 256, 0b110, 3, 9, 255),
    (-2047, 2048, 0b1110, 4, 12, 2047),
)


def encode_timestamps(ts_us: np.ndarray) -> bytes:
    """Encode int64 microsecond timestamps (sorted, any gaps)."""
    ts = np.asarray(ts_us, dtype=np.int64)
    n = len(ts)
    if n == 0:
        return b""
    first = ts[0]
    out_head = [np.array([first]).astype(np.uint64)]
    out_len = [np.array([64], dtype=np.int64)]
    if n > 1:
        deltas = np.diff(ts)
        dod = np.diff(np.concatenate([[np.int64(0)], deltas]))
        heads = np.zeros(n - 1, dtype=np.uint64)
        hlens = np.zeros(n - 1, dtype=np.int64)
        pays = np.zeros(n - 1, dtype=np.uint64)
        plens = np.zeros(n - 1, dtype=np.int64)
        done = dod == 0  # head '0', no payload
        hlens[done] = 1
        for low, high, hb, hl, pb, bias in _TS_CLASSES:
            sel = (~done) & (dod >= low) & (dod <= high)
            heads[sel] = hb
            hlens[sel] = hl
            pays[sel] = (dod[sel] + bias).astype(np.uint64)
            plens[sel] = pb
            done |= sel
        rest = ~done
        heads[rest] = 0b1111
        hlens[rest] = 4
        pays[rest] = dod[rest].astype(np.uint64)  # two's complement
        plens[rest] = 64
        # interleave head/payload per element
        vals = np.empty(2 * (n - 1), dtype=np.uint64)
        lens = np.empty(2 * (n - 1), dtype=np.int64)
        vals[0::2], vals[1::2] = heads, pays
        lens[0::2], lens[1::2] = hlens, plens
        out_head.append(vals)
        out_len.append(lens)
    vals = np.concatenate(out_head)
    lens = np.concatenate(out_len)
    keep = lens > 0
    return _pack_segments(vals[keep], lens[keep])


def decode_timestamps(data: bytes, n: int) -> np.ndarray:
    """Decode ``n`` timestamps."""
    if n == 0:
        return np.empty(0, dtype=np.int64)
    r = _BitReader(data)
    first = r.read(64)
    if first >= 1 << 63:
        first -= 1 << 64
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    delta = 0
    for i in range(1, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            dod = r.read(64)
            if dod >= 1 << 63:
                dod -= 1 << 64
        delta += dod
        out[i] = out[i - 1] + delta
    return out


# ---------------------------------------------------------------------------
# floats: XOR (stateless-window Gorilla variant)
# ---------------------------------------------------------------------------

def encode_floats(values: np.ndarray) -> bytes:
    """Encode float64 values (NaNs allowed — encoded as raw bit patterns)."""
    v = np.asarray(values, dtype=np.float64)
    n = len(v)
    if n == 0:
        return b""
    bits = v.view(np.uint64)
    first = bits[0]
    segs_v = [np.array([first], dtype=np.uint64)]
    segs_l = [np.array([64], dtype=np.int64)]
    if n > 1:
        xor = bits[1:] ^ bits[:-1]
        zero = xor == 0
        nz = ~zero
        lz = np.zeros(n - 1, dtype=np.int64)
        tz = np.zeros(n - 1, dtype=np.int64)
        safe = np.where(nz, xor, _U64(1))
        lz_all = np.minimum(_clz64(safe), 31)
        tz_all = _ctz64(safe)
        lz[nz], tz[nz] = lz_all[nz], tz_all[nz]
        mb = np.where(nz, 64 - lz - tz, 0)
        # head: '0' (1 bit) or '1'+5+6 = 12 bits
        heads = np.where(nz, (_U64(1) << _U64(11)) | (lz.astype(np.uint64) << _U64(6)) | (mb - 1).astype(np.uint64) & _U64(63), _U64(0))
        hlens = np.where(nz, 12, 1)
        pays = np.where(nz, xor >> tz.astype(np.uint64), _U64(0))
        plens = np.where(nz, mb, 0)
        vals = np.empty(2 * (n - 1), dtype=np.uint64)
        lens = np.empty(2 * (n - 1), dtype=np.int64)
        vals[0::2], vals[1::2] = heads, pays
        lens[0::2], lens[1::2] = hlens, plens
        keep = lens > 0
        segs_v.append(vals[keep])
        segs_l.append(lens[keep])
    return _pack_segments(np.concatenate(segs_v), np.concatenate(segs_l))


def decode_floats(data: bytes, n: int) -> np.ndarray:
    """Decode ``n`` float64 values."""
    if n == 0:
        return np.empty(0, dtype=np.float64)
    r = _BitReader(data)
    out = np.empty(n, dtype=np.uint64)
    out[0] = r.read(64)
    prev = int(out[0])
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        lz = r.read(5)
        mb = r.read(6) + 1
        payload = r.read(mb)
        tz = 64 - lz - mb
        if tz < 0:  # mb stored as (mb-1)&63 with true mb=64 -> lz must be 0
            tz = 0
        prev ^= payload << tz
        out[i] = prev
    return out.view(np.float64)
