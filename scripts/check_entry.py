"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
on DuckDB over the same sf dir, compares row counts and order-insensitive
values (columns sorted by name). Usage:

    python scripts/check_entry.py [--tol] [sf_dir] [query ...]

``--tol``: when the exact rounded-string compare fails, retry allowing
each float to differ by at most one 6-decimal rounding quantum and
report [OK-TOL] if it passes — this separates real semantic mismatches
from cross-engine aggregate summation-order ulps that flip a 6th
rounded decimal (observed only at sf0.1 volumes; the driver's sf0.01
gate uses the exact compare).
"""

from __future__ import annotations

import math
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def frame_sig(df: pd.DataFrame) -> list[str]:
    cols = sorted(df.columns)
    rows = [
        "|".join(norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def _tol_equal(sdf: pd.DataFrame, ddf: pd.DataFrame, atol: float = 1.01e-6) -> bool:
    """Order-insensitive compare allowing floats to differ by at most ONE
    6-decimal rounding quantum (the queries round to 6 dp on both sides,
    so a last-ulp summation-order difference in the unrounded aggregate
    surfaces as exactly 1e-6 post-round); everything else compares
    exactly."""
    if len(sdf) != len(ddf) or sorted(sdf.columns) != sorted(ddf.columns):
        return False
    cols = sorted(sdf.columns)
    # align rows by the NON-float columns only — a float differing in its
    # last digit must not shuffle the row to a different sort position
    key_cols = [c for c in cols if sdf[c].dtype.kind != "f" and ddf[c].dtype.kind != "f"]

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        k = df[key_cols].map(norm_cell).apply(lambda r: "|".join(r), axis=1)
        return df[cols].iloc[np.argsort(k.to_numpy(), kind="stable")].reset_index(drop=True)

    a, b = keyed(sdf), keyed(ddf)
    for c in cols:
        x, y = a[c], b[c]
        if x.dtype.kind == "f" or y.dtype.kind == "f":
            xv = pd.to_numeric(x, errors="coerce").astype(float).to_numpy()
            yv = pd.to_numeric(y, errors="coerce").astype(float).to_numpy()
            if not np.allclose(xv, yv, rtol=0.0, atol=atol, equal_nan=True):
                return False
        else:
            if list(x.map(norm_cell)) != list(y.map(norm_cell)):
                return False
    return True


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--tol"]
    use_tol = "--tol" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod
    from python_vegindex_spark.session import get_spark

    spark = get_spark("check-entry", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"[FAIL-SPARK] {name}: {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"[ROWS-ONLY] {name}: {len(sdf)} rows")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"[FAIL-SQL]   {name}: {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        s_sig, d_sig = frame_sig(sdf), frame_sig(ddf)
        if len(sdf) != len(ddf):
            print(f"[MISMATCH]  {name}: rows {len(sdf)} vs {len(ddf)}")
            failures.append(name)
        elif s_sig != d_sig:
            if use_tol and _tol_equal(sdf, ddf):
                print(
                    f"[OK-TOL]    {name}: {len(sdf)} rows match within one "
                    "rounding quantum (summation-order ulp only)"
                )
                continue
            diff = [(a, b) for a, b in zip(s_sig, d_sig) if a != b][:3]
            print(f"[MISMATCH]  {name}: values differ; first diffs:")
            for a, b in diff:
                print(f"   spark: {a}\n   duck : {b}")
            if not diff:
                print("   (row multiset differs in ordering-insensitive compare)")
            failures.append(name)
        else:
            print(f"[OK]        {name}: {len(sdf)} rows match")
    spark.stop()
    print("\nFAILED:" if failures else "\nALL MATCH", failures if failures else "")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
