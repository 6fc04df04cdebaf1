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


def _emit_grouped(
    vals: np.ndarray,
    lens: np.ndarray,
    seg_per_elem: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
) -> list[bytes]:
    """Pack per-element (head,payload) segments for MANY groups in ONE
    packbits pass, returning one byte string per group.

    ``vals``/``lens`` hold up to 2 segments per element in element order
    (segment slots with len 0 are dropped). Each group's bitstream is
    padded to a byte boundary with a zero pad segment, so the flat packed
    buffer can be split at byte offsets — the per-group streams are
    byte-identical to individually-encoded ones (decoders read exactly
    ``n`` elements and ignore trailing pad bits).
    """
    n = len(seg_per_elem)
    n_groups = len(starts)
    # bits per element, then per group
    elem_bits = lens.reshape(-1, 2).sum(axis=1)
    cum = np.concatenate(([0], np.cumsum(elem_bits)))
    group_bits = cum[ends] - cum[starts]
    pad_bits = (-group_bits) % 8
    group_nbytes = ((group_bits + pad_bits) // 8).astype(np.int64)

    # Flat segment order: group 0's element slots, pad0, group 1's …
    # Every element owns exactly 2 slots (a zero-length slot packs to
    # nothing) and every group one pad slot, so positions are pure
    # arithmetic: element i sits at 2*i + group_idx(i); group g's pad at
    # 2*ends[g] + g. One scatter, one packbits, one byte-offset split.
    group_idx = np.repeat(np.arange(n_groups, dtype=np.int64), ends - starts)
    total = 2 * n + n_groups
    fv = np.zeros(total, dtype=np.uint64)
    fl = np.zeros(total, dtype=np.int64)
    epos = 2 * np.arange(n, dtype=np.int64) + group_idx
    v2 = vals.reshape(-1, 2)
    l2 = lens.reshape(-1, 2)
    fv[epos] = v2[:, 0]
    fl[epos] = l2[:, 0]
    fv[epos + 1] = v2[:, 1]
    fl[epos + 1] = l2[:, 1]
    ppos = 2 * ends + np.arange(n_groups, dtype=np.int64)
    fl[ppos] = pad_bits

    # Pack in cache-sized blocks cut at group boundaries (group streams
    # are byte-aligned, so block outputs concatenate losslessly). One
    # monolithic pack builds ~0.5 GB of temporaries, which on a
    # low-DRAM-bandwidth host is far slower than L2-resident blocks.
    seg_end_per_group = ppos + 1  # segments consumed through group g
    BLOCK_SEGS = 16384
    parts: list[bytes] = []
    g0 = 0
    seg0 = 0
    while g0 < n_groups:
        g1 = int(
            np.searchsorted(seg_end_per_group, seg0 + BLOCK_SEGS, side="left")
        )
        g1 = max(g1, g0 + 1)
        seg1 = int(seg_end_per_group[g1 - 1])
        parts.append(_pack_segments(fv[seg0:seg1], fl[seg0:seg1]))
        g0, seg0 = g1, seg1
    packed = b"".join(parts)
    offs = np.concatenate(([0], np.cumsum(group_nbytes)))
    return [packed[offs[g]: offs[g + 1]] for g in range(n_groups)]


def encode_timestamps_grouped(
    ts_us: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> list[bytes]:
    """Vectorized multi-group delta-of-delta encode.

    ``ts_us`` is a flat sorted-per-group int64 array; groups are the
    [starts[i], ends[i]) slices. Produces, per group, the same bytes as
    :func:`encode_timestamps` (padded to whole bytes). One numpy pass +
    one packbits for the whole batch instead of per-group Python calls.
    """
    ts = np.asarray(ts_us, dtype=np.int64)
    n = len(ts)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    is_start = np.zeros(n, dtype=bool)
    is_start[starts] = True

    delta = np.zeros(n, dtype=np.int64)
    delta[1:] = ts[1:] - ts[:-1]
    dod = np.zeros(n, dtype=np.int64)
    dod[1:] = delta[1:] - delta[:-1]
    second = starts + 1
    second = second[second < ends]  # second element of each multi-row group
    dod[second] = delta[second]  # prev delta is 0 at a group start
    dod[is_start] = 0

    heads = np.zeros(n, dtype=np.uint64)
    hlens = np.zeros(n, dtype=np.int64)
    pays = np.zeros(n, dtype=np.uint64)
    plens = np.zeros(n, dtype=np.int64)
    done = dod == 0  # head '0'
    hlens[:] = 1
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
    pays[rest] = dod[rest].astype(np.uint64)
    plens[rest] = 64
    # group-start elements: single raw 64-bit segment
    heads[is_start] = ts[is_start].astype(np.uint64)
    hlens[is_start] = 64
    pays[is_start] = 0
    plens[is_start] = 0

    vals = np.empty(2 * n, dtype=np.uint64)
    lens = np.empty(2 * n, dtype=np.int64)
    vals[0::2], vals[1::2] = heads, pays
    lens[0::2], lens[1::2] = hlens, plens
    seg_per_elem = np.where(is_start, 1, 2)
    return _emit_grouped(vals, lens, seg_per_elem, starts, ends)


def encode_floats_grouped(
    values: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> list[bytes]:
    """Vectorized multi-group Gorilla-XOR encode (see
    :func:`encode_timestamps_grouped` for the batching contract)."""
    v = np.asarray(values, dtype=np.float64)
    n = len(v)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    is_start = np.zeros(n, dtype=bool)
    is_start[starts] = True

    bits = v.view(np.uint64)
    xor = np.zeros(n, dtype=np.uint64)
    xor[1:] = bits[1:] ^ bits[:-1]
    xor[is_start] = 0  # unused for start elements

    nz = (~is_start) & (xor != 0)
    safe = np.where(nz, xor, _U64(1))
    lz = np.where(nz, np.minimum(_clz64(safe), 31), 0)
    tz = np.where(nz, _ctz64(safe), 0)
    mb = np.where(nz, 64 - lz - tz, 0)

    heads = np.where(
        nz,
        (_U64(1) << _U64(11))
        | (lz.astype(np.uint64) << _U64(6))
        | (mb - 1).astype(np.uint64) & _U64(63),
        _U64(0),
    )
    hlens = np.where(nz, 12, 1)
    pays = np.where(nz, xor >> tz.astype(np.uint64), _U64(0))
    plens = np.where(nz, mb, 0)
    # group-start: raw 64-bit value
    heads = np.where(is_start, bits, heads)
    hlens = np.where(is_start, 64, hlens)
    pays = np.where(is_start, _U64(0), pays)
    plens = np.where(is_start, 0, plens)

    vals = np.empty(2 * n, dtype=np.uint64)
    lens = np.empty(2 * n, dtype=np.int64)
    vals[0::2], vals[1::2] = heads, pays
    lens[0::2], lens[1::2] = hlens, plens
    seg_per_elem = np.where(is_start, 1, 2)
    return _emit_grouped(vals, lens, seg_per_elem, starts, ends)


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
