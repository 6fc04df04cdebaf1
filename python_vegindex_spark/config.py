"""Engine configuration — the Spark analog of the reference's config.py.

Reference thresholds (``/root/reference/src/vegindex/config.py:40-58``):
time-of-day window, minimum solar elevation, brightness bounds, and the
minimum per-bucket image count ``NIMAGE_MIN = 1`` (config.py:55) that
drives the 3-way count tiering in generate_summary_timeseries.py:354-461.

Here the same knobs are re-based onto transcript turns: the QC gate
filters turns, the count threshold drives rollup tiering. Missing data is
SQL NULL internally; the reference's "NA"/-9999 sentinels
(config.py:61-63, roitimeseries.py:21-50) exist only at CSV boundaries
(see sources/csv_compat.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Tier definitions: name -> (bucket length, anchoring).
# "hourly" is clock-anchored (date_trunc); "daily"/"weekly" are
# day-of-year anchored with yearly restart, exactly the reference's
# daterange2 semantics with nday=1 and nday=7 (vegindex.py:22-64,
# buckets restart at Jan 1; the final bucket of a year may be short).
TIERS = ("hourly", "daily", "weekly")

# nday for doy-anchored tiers (weekly=7); hourly handled separately.
# "3day" is the reference's own default aggregation period
# (generate_summary_timeseries.py nday=3 products, *_3day.csv goldens).
TIER_NDAY = {"daily": 1, "3day": 3, "weekly": 7}

ND_FLOAT = "NA"  # CSV-boundary sentinel, reference config.py:61
ND_INT = "NA"  # reference config.py:62
ND_STRING = "None"  # reference config.py:63


@dataclass(frozen=True)
class QCConfig:
    """select_rows-style turn-validity gate.

    Mirrors ROITimeSeries.select_rows(tod_min, tod_max, sunelev_min,
    brt_min, brt_max) — reference roitimeseries.py:809-841 — re-based:
    * gate_value  ~ solar_elev   (keep rows with gate_value >= gate_min)
    * text_len    ~ brightness   (keep rows with brt in [min, max])
    * quality_flag ~ awbflag     (rows with flag == 1 skipped during
      aggregation, generate_summary_timeseries.py:309-315)
    """

    gate_min: float = 5.0  # MIN_SUN_ANGLE analog, config.py:46
    brt_min: float = 1.0  # MIN_BRT analog, config.py:47
    brt_max: float = 100_000.0  # MAX_BRT analog, config.py:48
    tod_min: str = "00:00:00"  # config.py:44 (wide-open by default here)
    tod_max: str = "23:59:59"  # config.py:45


@dataclass(frozen=True)
class RollupConfig:
    """Per-run rollup parameters.

    ``nmin`` is the NIMAGE_MIN analog (config.py:55): buckets with
    0 < count < nmin emit only the midpoint columns + max gate value;
    count >= nmin emit full stats; count == 0 emit an all-null gap row
    (generate_summary_timeseries.py:354-461).
    """

    tier: str = "daily"
    nmin: int = 1
    qc: QCConfig = field(default_factory=QCConfig)
    # exact percentiles to roll up (0.9 = the gcc90 estimator,
    # generate_summary_timeseries.py:448-455)
    percentiles: tuple[float, ...] = (0.5, 0.75, 0.9)
    # opt-in fast path: t-digest approx_percentile instead of the exact
    # sort-based percentile. NOT golden-comparable (SURVEY.md §2.4 —
    # defaults must stay exact); cuts the percentile stage's per-group
    # sort at extreme group sizes. accuracy = 1/eps (Spark default 10000).
    approx_percentiles: bool = False
    approx_accuracy: int = 10_000
    # Hyndman–Fan quantile type 1..9 (reference quantile.py:42-63
    # implements all nine; every shipped call site uses 7). 7 is the
    # hot path (Spark's exact percentile, one hash aggregate); other
    # types use the array_sort(collect_list) HF expression
    # (functions/quantile.hf_quantile_expr) — exact, JVM-side, but
    # holds each group's vector, so intended for bucket-sized groups.
    quantile_type: int = 7

    def __post_init__(self) -> None:
        if self.tier not in TIERS:
            raise ValueError(f"tier must be one of {TIERS}, got {self.tier!r}")
        if self.nmin < 1:
            raise ValueError("nmin must be >= 1")
        if not 1 <= self.quantile_type <= 9:
            raise ValueError(
                f"quantile_type must be 1..9, got {self.quantile_type}"
            )
        if self.approx_percentiles and self.quantile_type != 7:
            raise ValueError(
                "approx_percentiles (t-digest) only approximates the "
                "type-7 estimator; set quantile_type=7 or disable approx"
            )
        if any(not 0.0 <= q <= 1.0 for q in self.percentiles):
            raise ValueError(
                f"percentiles must be in [0, 1], got {self.percentiles}"
            )
