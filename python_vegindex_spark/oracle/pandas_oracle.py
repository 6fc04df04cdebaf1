"""Pure-pandas re-implementation of the engine math — the test oracle.

This is a from-first-principles port of the reference's *semantics*
(generate_summary_timeseries.py:229-461, vegindex.py:22-64,
quantile.py:42-76) to pandas, deliberately written in a different style
from both the reference (list[dict] loops) and the engine (Spark plans)
so agreement between engine and oracle is meaningful evidence.

Used only by tests — never in the engine's execution path.
"""

from __future__ import annotations

import re
from datetime import date, timedelta

import numpy as np
import pandas as pd

from ..config import TIER_NDAY, RollupConfig

_WS = re.compile(r"\s+")


def oracle_features(turns: pd.DataFrame) -> pd.DataFrame:
    df = turns.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    prev_ts = df.groupby("conv_id")["ts"].shift(1)
    df["latency_delta_s"] = (df["ts"] - prev_ts).dt.total_seconds()
    df["text_len"] = df["text"].str.len().astype(float)
    df["word_count"] = df["text"].map(
        lambda t: 0.0 if not t.strip() else float(len(_WS.split(t.strip())))
    )
    df["tool_call"] = (df["tool"] != "").astype(int)
    df["r_dn"] = df["text_len"]
    df["g_dn"] = df["word_count"] * 8.0
    df["b_dn"] = df["latency_delta_s"].fillna(0.0)
    df["dnsum"] = df["r_dn"] + df["g_dn"] + df["b_dn"]
    ok = df["dnsum"] > 0
    df["fcc"] = np.where(ok, df["g_dn"] / df["dnsum"], np.nan)
    df["rcc_like"] = np.where(ok, df["r_dn"] / df["dnsum"], np.nan)
    secs = (
        df["ts"].dt.hour * 3600 + df["ts"].dt.minute * 60 + df["ts"].dt.second
    ).astype(float)
    df["gate_value"] = 90.0 - (secs - 43200.0).abs() / 43200.0 * 180.0
    df["quality_flag"] = (df["text_len"] < 10).astype(int)
    return df


def _bucket_start(ts: pd.Timestamp, tier: str):
    if tier == "hourly":
        return ts.floor("h")
    n = TIER_NDAY[tier]
    jan1 = date(ts.year, 1, 1)
    doy = (ts.date() - jan1).days + 1
    return jan1 + timedelta(days=int((doy - 1) // n) * n)


def _bucket_center(start, tier: str):
    if tier == "hourly":
        return start
    return start + timedelta(days=TIER_NDAY[tier] // 2)


def _anchor(start, tier: str) -> pd.Timestamp:
    if tier == "hourly":
        return start + pd.Timedelta(minutes=30)
    return pd.Timestamp(_bucket_center(start, tier)) + pd.Timedelta(hours=12)


def _spine(min_b, max_b, tier: str) -> list:
    out = []
    if tier == "hourly":
        cur = min_b
        while cur <= max_b:
            out.append(cur)
            cur = cur + pd.Timedelta(hours=1)
        return out
    n = TIER_NDAY[tier]
    cur = min_b
    while cur <= max_b:
        out.append(cur)
        nxt = cur + timedelta(days=n)
        if nxt.year != cur.year:
            # lattice restarts at Jan 1 (short final bucket of the year,
            # reference vegindex.py:50-58)
            nxt = date(cur.year + 1, 1, 1)
        cur = nxt
    return out


# HF plotting-position parameters (Hyndman & Fan 1996, table 1), spelled
# as the per-type (a, b) offsets plus the (c, d) interpolation weights.
# The oracle implements the formula itself rather than numpy's named
# methods: numpy clamps to y[0] when the position lands in (-1, 0),
# while the semantics under test (reference quantile.py via the engine)
# EXTRAPOLATE there (trunc toward zero leaves j == -0.0 with negative g),
# and numpy's averaged type 2 differs from the tabulated-formula type 2.
_HF_PARAMS = {
    1: (0.0, 0.0, 1.0, 0.0), 2: (0.5, 0.0, 1.0, 0.0), 3: (0.5, 0.0, 0.0, 0.0),
    4: (0.0, 0.0, 0.0, 1.0), 5: (0.5, 0.0, 0.0, 1.0), 6: (0.0, 1.0, 0.0, 1.0),
    8: (1 / 3, 1 / 3, 0.0, 1.0), 9: (3 / 8, 0.25, 0.0, 1.0),
}


def _q7(x: np.ndarray, q: float, qtype: int = 7) -> float:
    x = x[~np.isnan(x)]
    if len(x) == 0:
        return np.nan
    if qtype == 7:
        # interior by construction (h = (n-1)q + 1 ∈ [1, n]); numpy's
        # default linear method is exactly HF-7
        return float(np.quantile(x, q, method="linear"))
    y = np.sort(x)
    n = len(y)
    a, b, c, d = _HF_PARAMS[qtype]
    pos = a + (n + b) * q - 1.0
    whole = float(np.trunc(pos))  # toward zero: (-1, 0) -> -0.0, kept
    frac = pos - whole
    if whole < 0:
        return float(y[0])
    if whole >= n:
        return float(y[-1])
    lo = y[int(whole)]
    hi = y[min(int(whole) + 1, n - 1)]
    if frac == 0:
        return float(lo)
    return float(lo + (hi - lo) * (c + d * frac))


MEASURES = ["text_len", "latency_delta_s", "fcc", "rcc_like", "r_dn", "g_dn", "b_dn"]
PCTS = ["fcc", "rcc_like"]


def oracle_rollup(
    feats: pd.DataFrame, cfg: RollupConfig, series_col: str = "conv_id"
) -> pd.DataFrame:
    qc = cfg.qc
    tod = feats["ts"].dt.strftime("%H:%M:%S")
    keep = (
        (tod >= qc.tod_min)
        & (tod <= qc.tod_max)
        & feats["dnsum"].between(qc.brt_min, qc.brt_max)
        & (feats["gate_value"] >= qc.gate_min)
        & feats["r_dn"].notna()
        & (feats["quality_flag"] != 1)
    )
    df = feats[keep].copy()
    df["bucket_start"] = df["ts"].map(lambda t: _bucket_start(t, cfg.tier))

    rows = []
    for sk, g in df.groupby(series_col, sort=True):
        buckets = _spine(g["bucket_start"].min(), g["bucket_start"].max(), cfg.tier)
        by_bucket = dict(tuple(g.groupby("bucket_start")))
        for b in buckets:
            gb = by_bucket.get(b)
            row = {series_col: sk, "bucket_start": b}
            center = _bucket_center(b, cfg.tier)
            row["bucket_center"] = center
            row["year"] = center.year
            row["doy"] = center.timetuple().tm_yday if cfg.tier != "hourly" else center.dayofyear
            if cfg.tier == "hourly":
                row["hour"] = b.hour
            cnt = 0 if gb is None else int((gb["dnsum"] > 0).sum())
            row["turn_count"] = cnt
            if cnt > 0:
                anchor = _anchor(b, cfg.tier)
                deltas = (gb["ts"] - anchor).abs()
                # argmin with first-in-time tie-break
                order = gb.assign(_d=deltas).sort_values(["_d", "ts"], kind="stable")
                mid = order.iloc[0]
                row["mid_ts"] = mid["ts"]
                row["mid_turn_idx"] = mid["turn_idx"]
                row["mid_text_len"] = mid["text_len"]
                row["mid_fcc"] = mid["fcc"]
                row["mid_rcc_like"] = mid["rcc_like"]
                row["mid_r_dn"] = mid["r_dn"]
                row["mid_g_dn"] = mid["g_dn"]
                row["mid_b_dn"] = mid["b_dn"]
                row["max_gate_value"] = gb["gate_value"].max()
            if cnt >= cfg.nmin and gb is not None:
                for m in MEASURES:
                    v = gb[m].to_numpy(dtype=float)
                    vv = v[~np.isnan(v)]
                    row[f"{m}_mean"] = vv.mean() if len(vv) else np.nan
                    row[f"{m}_std"] = vv.std(ddof=0) if len(vv) else np.nan
                for m in PCTS:
                    for q in cfg.percentiles:
                        row[f"{m}_{int(round(q*100))}"] = _q7(
                            gb[m].to_numpy(dtype=float), q,
                            getattr(cfg, "quantile_type", 7),
                        )
            rows.append(row)
    return pd.DataFrame(rows)
