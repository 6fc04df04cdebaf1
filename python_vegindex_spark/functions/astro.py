"""Astronomy/scalar helpers: solar elevation (C3) and deg<->DMS (C4).

The reference computes per-image solar elevation with pyephem
(utils.py:288-313) to drive the QC gate; its own golden asserts only 3
significant digits (tests/test_utils.py:102-111). pyephem is not
available here, so ``solar_elevation`` implements the standard NOAA
solar-position approximation (public-domain formulas) — accurate to
~0.1-0.2 degrees, far tighter than the gate thresholds it feeds, and
passing the reference's sunelev golden. The production path is pure
JVM column expressions (whole-stage codegen, no Python in the plan);
``_solar_elev_impl`` keeps an independent numpy implementation of the
same formulas for cross-checking. deg<->DMS (utils.py:258-282) are
plain column expressions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _solar_elev_impl(
    ts_utc: pd.Series, lat: pd.Series, lon: pd.Series
) -> pd.Series:
    """Vectorized NOAA solar elevation (degrees) for UTC timestamps."""
    t = pd.to_datetime(ts_utc)
    # Julian day / century
    jd = t.astype("datetime64[us]").astype("int64") / 86400e6 + 2440587.5
    jc = (jd - 2451545.0) / 36525.0
    gmls = (280.46646 + jc * (36000.76983 + jc * 0.0003032)) % 360.0
    gmas = 357.52911 + jc * (35999.05029 - 0.0001537 * jc)
    eeo = 0.016708634 - jc * (0.000042037 + 0.0000001267 * jc)
    seqc = (
        np.sin(np.radians(gmas)) * (1.914602 - jc * (0.004817 + 0.000014 * jc))
        + np.sin(np.radians(2 * gmas)) * (0.019993 - 0.000101 * jc)
        + np.sin(np.radians(3 * gmas)) * 0.000289
    )
    stl = gmls + seqc
    sal = stl - 0.00569 - 0.00478 * np.sin(np.radians(125.04 - 1934.136 * jc))
    moe = 23.0 + (26.0 + (21.448 - jc * (46.815 + jc * (0.00059 - jc * 0.001813))) / 60.0) / 60.0
    oc = moe + 0.00256 * np.cos(np.radians(125.04 - 1934.136 * jc))
    decl = np.degrees(
        np.arcsin(np.sin(np.radians(oc)) * np.sin(np.radians(sal)))
    )
    vary = np.tan(np.radians(oc / 2.0)) ** 2
    eot = 4.0 * np.degrees(
        vary * np.sin(2.0 * np.radians(gmls))
        - 2.0 * eeo * np.sin(np.radians(gmas))
        + 4.0 * eeo * vary * np.sin(np.radians(gmas)) * np.cos(2.0 * np.radians(gmls))
        - 0.5 * vary * vary * np.sin(4.0 * np.radians(gmls))
        - 1.25 * eeo * eeo * np.sin(2.0 * np.radians(gmas))
    )
    mins = (
        t.dt.hour * 60.0 + t.dt.minute + t.dt.second / 60.0
        + t.dt.microsecond / 6e7
    )
    tst = (mins + eot + 4.0 * lon.to_numpy()) % 1440.0
    ha = np.where(tst / 4.0 < 0, tst / 4.0 + 180.0, tst / 4.0 - 180.0)
    lat_r = np.radians(lat.to_numpy())
    zen = np.degrees(
        np.arccos(
            np.clip(
                np.sin(lat_r) * np.sin(np.radians(decl))
                + np.cos(lat_r) * np.cos(np.radians(decl)) * np.cos(np.radians(ha)),
                -1.0,
                1.0,
            )
        )
    )
    return pd.Series(90.0 - zen)


def solar_elevation(ts: Column, lat: Column, lon: Column) -> Column:
    """Solar elevation in degrees for a UTC timestamp at (lat, lon).

    Pure JVM column expressions (the NOAA formulas are closed-form
    arithmetic — no reason to leave whole-stage codegen for them), so
    the expression also mirrors 1:1 into the DuckDB oracle SQL."""
    from .timeutil import epoch_us

    ts = ts.cast("timestamp")
    lat = lat.cast("double")
    lon = lon.cast("double")
    us = epoch_us(ts)
    jd = us / F.lit(86400e6) + F.lit(2440587.5)
    jc = (jd - 2451545.0) / 36525.0
    gmls = F.pmod(280.46646 + jc * (36000.76983 + jc * 0.0003032), F.lit(360.0))
    gmas = 357.52911 + jc * (35999.05029 - 0.0001537 * jc)
    eeo = 0.016708634 - jc * (0.000042037 + 0.0000001267 * jc)
    seqc = (
        F.sin(F.radians(gmas)) * (1.914602 - jc * (0.004817 + 0.000014 * jc))
        + F.sin(F.radians(2 * gmas)) * (0.019993 - 0.000101 * jc)
        + F.sin(F.radians(3 * gmas)) * 0.000289
    )
    stl = gmls + seqc
    sal = stl - 0.00569 - 0.00478 * F.sin(F.radians(125.04 - 1934.136 * jc))
    moe = 23.0 + (
        26.0 + (21.448 - jc * (46.815 + jc * (0.00059 - jc * 0.001813))) / 60.0
    ) / 60.0
    oc = moe + 0.00256 * F.cos(F.radians(125.04 - 1934.136 * jc))
    decl = F.degrees(F.asin(F.sin(F.radians(oc)) * F.sin(F.radians(sal))))
    vary = F.tan(F.radians(oc / 2.0)) * F.tan(F.radians(oc / 2.0))
    eot = 4.0 * F.degrees(
        vary * F.sin(2.0 * F.radians(gmls))
        - 2.0 * eeo * F.sin(F.radians(gmas))
        + 4.0 * eeo * vary * F.sin(F.radians(gmas)) * F.cos(2.0 * F.radians(gmls))
        - 0.5 * vary * vary * F.sin(4.0 * F.radians(gmls))
        - 1.25 * eeo * eeo * F.sin(2.0 * F.radians(gmas))
    )
    mins = F.pmod(us, F.lit(86400e6)) / F.lit(6e7)
    tst = F.pmod(mins + eot + 4.0 * lon, F.lit(1440.0))
    ha = tst / 4.0 - 180.0  # tst >= 0 after pmod, so no sign branch
    lat_r = F.radians(lat)
    cos_zen = F.greatest(
        F.lit(-1.0),
        F.least(
            F.lit(1.0),
            F.sin(lat_r) * F.sin(F.radians(decl))
            + F.cos(lat_r) * F.cos(F.radians(decl)) * F.cos(F.radians(ha)),
        ),
    )
    return F.lit(90.0) - F.degrees(F.acos(cos_zen))


def deg_to_dms(deg: Column) -> Column:
    """Decimal degrees -> 'D:M:S.s' string (utils.py:258-269). Unlike
    the reference pair (deg2dms drops the sign whenever int(angle) == 0,
    and dms2deg ignores signs entirely), this pair round-trips — the
    sign is a string prefix, so -0.5 -> '-0:30:0.0', not '0:30:0.0'.

    Seconds are rounded in integer centiseconds FIRST and then
    decomposed, so the round carries into minutes/degrees
    (29.9999999 -> '30:0:0.0', never a non-canonical '29:59:60.0')."""
    total_cs = F.round(F.abs(deg) * 360000).cast("long")
    d = F.floor(total_cs / 360000).cast("long")
    rem = total_cs - d * 360000
    m = F.floor(rem / 6000).cast("long")
    s = (rem - m * 6000).cast("double") / 100.0
    body = F.concat_ws(":", d, m, s)
    return F.concat(F.when(deg < 0, F.lit("-")).otherwise(F.lit("")), body)


def dms_to_deg(dms: Column) -> Column:
    """'D:M:S.s' string -> decimal degrees (utils.py:272-282)."""
    parts = F.split(dms, ":")
    d = parts[0].cast("double")
    m = parts[1].cast("double")
    s = parts[2].cast("double")
    mag = F.abs(d) + m / 60.0 + s / 3600.0
    neg = F.startswith(F.trim(dms), F.lit("-"))
    return F.when(neg, -mag).otherwise(mag)
