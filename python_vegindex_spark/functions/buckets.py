"""Calendar-anchored bucket assignment + gap-filled spines.

Reference semantics ("daterange2", vegindex.py:22-64): n-day buckets are
anchored at day-of-year 1, 1+n, 1+2n, ... per calendar year; buckets
RESTART at Jan 1 every year, so the last bucket of a year may be short.
The bucket-center label is start + floor(n/2) days (the reference's
``date + timedelta(nday/2)`` truncates fractional days,
generate_summary_timeseries.py:276-277), and the "noon anchor" used for
the representative-row argmin is 12:00 of the center date
(generate_summary_timeseries.py:297-300).

Graft tiers:
* hourly — clock-anchored ``date_trunc('hour')``; anchor = start + 30 min
* daily  — nday=1 doy-anchored (== date_trunc('day')); anchor = 12:00
* weekly — nday=7 doy-anchored with yearly restart (NOT ISO weeks);
  anchor = noon of start+3d

Everything here is a pure column expression — whole-stage codegen,
no UDFs, no shuffles.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import TIER_NDAY
from .timeutil import epoch_us

_MIN_RE = re.compile(r"^(\d+)min$")


def tier_minutes(tier: str) -> int | None:
    """Minutes for a fixed-width sub-day tier ("5min", "15min", ...),
    else None. Minute buckets are EPOCH-anchored (time_bucket
    semantics): boundary = ts - ts mod step, so widths dividing 86400 s
    align to UTC midnight; other widths drift across days (documented,
    like any time_bucket)."""
    m = _MIN_RE.match(tier)
    if not m:
        return None
    n = int(m.group(1))
    if n < 1:
        raise ValueError(f"tier minutes must be >= 1, got {tier!r}")
    return n


def tier_step_seconds(tier: str) -> int | None:
    """Bucket width in seconds for FIXED-WIDTH tiers (hourly / Nmin);
    None for calendar day tiers (their width is nominal, see callers)."""
    if tier == "hourly":
        return 3600
    n = tier_minutes(tier)
    return n * 60 if n is not None else None


def tier_nday(tier: str) -> int:
    """nday for a doy-anchored tier; any "Nday" spelling works (the
    reference's aggregation period is an arbitrary integer,
    generate_summary_timeseries.py nday argument)."""
    if tier in TIER_NDAY:
        return TIER_NDAY[tier]
    if tier.endswith("day") and tier[:-3].isdigit():
        n = int(tier[:-3])
        if n < 1:
            # '0day' would divide by zero in bucket_start -> NULL buckets
            # that silently collapse every row into one group
            raise ValueError(f"tier nday must be >= 1, got {tier!r}")
        return n
    raise KeyError(f"unknown tier {tier!r}")


def bucket_start(ts: Column, tier: str) -> Column:
    """Bucket start for a timestamp. DateType for day tiers,
    TimestampType for hourly / minute tiers."""
    if tier == "hourly":
        return F.date_trunc("hour", ts)
    m = tier_minutes(tier)
    if m is not None:
        # epoch-anchored, pure integer µs arithmetic (pmod keeps floor
        # semantics even pre-1970)
        step = m * 60 * 1_000_000
        t = epoch_us(ts)
        return F.timestamp_micros(t - F.pmod(t, F.lit(step)))
    n = tier_nday(tier)
    if n == 1:
        return F.to_date(ts)
    # Jan 1 of ts's year + floor((doy-1)/n)*n days  (vegindex.py:34-58)
    jan1 = F.trunc(ts, "year")
    return F.date_add(jan1, (F.floor((F.dayofyear(ts) - 1) / n) * n).cast("int"))


def bucket_start_cursor(ts: Column, tier: str, series_start_year: Column) -> Column:
    """Bucket start with the reference's SEQUENTIAL-CURSOR year-boundary
    semantics (generate_summary_timeseries.py:295-305 + vegindex.py:50-63).

    daterange2 restarts the doy lattice at Jan 1, but the final bucket of
    each year still spans ``nday`` days — its half-open window
    ``[start, start + nday)`` can reach into the next year, and the
    reference's row cursor consumes those next-year rows into it before
    the Jan-1 bucket gets a chance. Concretely: a 365-day year with
    nday=3 has its last bucket at doy 364 (Dec 30) covering Dec 30,
    Dec 31 AND Jan 1; with nday=7 the doy-365 bucket (Dec 31) swallows
    Jan 1–6. So rows whose doy <= overflow(previous year) belong to the
    PREVIOUS year's final bucket — except in the series' first year,
    where no previous bucket was ever generated (daterange2 starts at
    the bucket containing the first row's date, vegindex.py:38-43).

    ``series_start_year`` is the year of the first post-QC row (the
    reference computes dt_first after select_rows but before the awb
    skip, generate_summary_timeseries.py:242-262). Only the year
    matters: the first generated bucket is always anchored within
    dt_first's own year, so spill applies exactly to rows in years
    strictly after it.

    Pure column expressions — no UDFs, no shuffles; nday=1 and hourly
    never spill (their windows can't cross Jan 1).
    """
    if tier == "hourly" or tier_minutes(tier) is not None:
        return bucket_start(ts, tier)
    n = tier_nday(tier)
    if n == 1:
        return F.to_date(ts)
    naive = bucket_start(ts, tier)
    jan1 = F.trunc(ts, "year")
    prev_jan1 = F.add_months(jan1, -12)
    prev_days = F.datediff(jan1, prev_jan1)  # 365 or 366
    prev_final_off = F.floor((prev_days - F.lit(1)) / n) * n
    overflow = prev_final_off + n - prev_days  # days spilling past Dec 31
    spill = (F.dayofyear(ts) <= overflow) & (F.year(ts) > series_start_year)
    prev_final_start = F.date_add(prev_jan1, prev_final_off.cast("int"))
    return F.when(spill, prev_final_start).otherwise(naive)


def bucket_center(start: Column, tier: str) -> Column:
    """Center label: start + floor(n/2) units (truncating fractional days,
    generate_summary_timeseries.py:276-277)."""
    if tier == "hourly" or tier_minutes(tier) is not None:
        return start  # fixed-width buckets are labeled by their start
    n = tier_nday(tier)
    return F.date_add(start, n // 2)


def midpoint_anchor(start: Column, tier: str) -> Column:
    """Timestamp the representative row is nearest to (the "noon" anchor,
    generate_summary_timeseries.py:297-300)."""
    if tier == "hourly":
        return start + F.expr("INTERVAL 30 MINUTES")
    m = tier_minutes(tier)
    if m is not None:
        return start + F.expr(f"INTERVAL {m * 30} SECONDS")
    center = bucket_center(start, tier)
    return F.to_timestamp(center) + F.expr("INTERVAL 12 HOURS")


def _bucket_seq(min_b: Column, max_b: Column, tier: str) -> Column:
    """Array of every bucket start between two bucket starts, inclusive.

    For doy-anchored tiers we generate the daily sequence and keep days
    where (doy-1) % n == 0 — this restarts the lattice at Jan 1 of each
    year for free, reproducing the short-final-bucket behavior of
    vegindex.py:50-58 without per-year logic.
    """
    if tier == "hourly":
        return F.sequence(min_b, max_b, F.expr("INTERVAL 1 HOUR"))
    m = tier_minutes(tier)
    if m is not None:
        # bucket starts are step-aligned, so a fixed-step sequence
        # between two of them visits exactly the lattice
        return F.sequence(min_b, max_b, F.expr(f"INTERVAL {m} MINUTES"))
    n = tier_nday(tier)
    days = F.sequence(min_b, max_b, F.expr("INTERVAL 1 DAY"))
    if n == 1:
        return days
    return F.filter(days, lambda d: (F.dayofyear(d) - 1) % n == 0)


def bucket_spine(
    df: DataFrame,
    tier: str,
    series_cols: list[str],
    bucket_col: str = "bucket_start",
    start_at=None,
) -> DataFrame:
    """Gap-filled spine: one row per (series, bucket) from the bucket
    containing each series' first datum to the one containing its last —
    the loop-over-all-periods behavior of generate_summary_timeseries.py:295-301
    (every bucket emitted even with zero rows).

    One aggregation (min/max per series) + explode; the spine is tiny
    relative to the input (counts buckets, not rows), so the later
    left-join against aggregates broadcasts naturally under AQE.
    """
    bounds = df.groupBy(*series_cols).agg(
        F.min(bucket_col).alias("_min_b"), F.max(bucket_col).alias("_max_b")
    )
    if start_at is not None:
        # extend the spine's lower bound (incremental update: the open
        # tail bucket is re-emitted even when the new data starts later)
        typ = (
            "timestamp"
            if tier == "hourly" or tier_minutes(tier) is not None
            else "date"
        )
        bounds = bounds.withColumn(
            "_min_b", F.least(F.col("_min_b"), F.lit(start_at).cast(typ))
        )
    return bounds.select(
        *series_cols,
        F.explode(_bucket_seq(F.col("_min_b"), F.col("_max_b"), tier)).alias(
            bucket_col
        ),
    )
