"""Cross-engine float discipline of the driver-contract oracles.

Pins the defect found at sf0.1: Spark's ``%`` is exact IEEE fmod while
DuckDB's ``fmod`` is the naive ``x - trunc(x/m) * m`` — a 1-ulp
divergence (fmod(1900.6, 2.4): 2.1999999999999793 vs
2.2000000000000455) that flipped a row sitting on the NDVI
``BETWEEN -1..1`` filter boundary and shifted a whole bucket's stats.
The fix spells the mod as the identical explicit op sequence on both
sides (``__spark_entry__._fmod_naive``).
"""

from __future__ import annotations

import math
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")


BOUNDARY_X, M = 1900.6, 2.4  # value=111.8 * 17.0 from the sf0.1 events table


def _naive(x: float, m: float) -> float:
    return x - math.floor(x / m) * m


def test_engines_disagree_on_builtin_fmod():
    """The premise: the builtins genuinely differ at the boundary value
    (if an engine upgrade ever makes them agree, this documents why
    _fmod_naive exists and can then be revisited)."""
    duck = duckdb.connect().execute(
        f"SELECT fmod({BOUNDARY_X!r}, {M!r})"
    ).fetchone()[0]
    exact = math.fmod(BOUNDARY_X, M)  # C fmod == Spark's Remainder
    assert exact == pytest.approx(2.1999999999999793, abs=0)
    assert duck != exact  # the 1-ulp trap
    assert duck == _naive(BOUNDARY_X, M)  # DuckDB's fmod IS the naive form


def test_fmod_naive_bit_identical_across_engines(spark):
    """The fix: _fmod_naive (Spark) and the explicit floor spelling
    (DuckDB) produce bit-identical results, including the boundary value
    whose NDVI sits within 1 ulp of 1.0."""
    from pyspark.sql import functions as F

    from __spark_entry__ import _fmod_naive

    vals = [111.8, 0.0, 1.2, 17.0, 111.799999, 9999.5, 55.3]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = {
        r["value"]: r["nd"]
        for r in df.select(
            "value", (_fmod_naive(F.col("value") * 17.0, 2.4) - 1.2).alias("nd")
        ).collect()
    }
    # NB: value must enter DuckDB as DOUBLE (like the parquet column the
    # real oracles read) — a bare literal like 55.3 parses as DECIMAL and
    # computes different arithmetic
    con = duckdb.connect()
    for v in vals:
        exp = con.execute(
            "SELECT (v * 17.0 - floor(v * 17.0 / 2.4) * 2.4) - 1.2 "
            "FROM (SELECT CAST(? AS DOUBLE) AS v)",
            [v],
        ).fetchone()[0]
        assert got[v] == exp, (v, got[v].hex(), exp.hex())  # bitwise
    # and the boundary row lands on the SAME side of the filter
    assert (got[111.8] <= 1.0) == (
        con.execute(
            "SELECT (v * 17.0 - floor(v * 17.0 / 2.4) * 2.4) - 1.2 <= 1.0 "
            "FROM (SELECT CAST(111.8 AS DOUBLE) AS v)"
        ).fetchone()[0]
    )
