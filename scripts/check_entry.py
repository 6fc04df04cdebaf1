"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
on DuckDB over the same sf dir, compares row counts and order-insensitive
values (columns sorted by name). Usage:

    python scripts/check_entry.py [sf_dir] [query ...]
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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

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
