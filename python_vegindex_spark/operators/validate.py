"""Data-contract validation — the Deequ / dbt-tests analog.

A 100-TB ingest pipeline gates every batch on declarative quality
rules before it reaches training (AWS Deequ is literally a Spark
library for this; dbt ships the same checks as `tests:`). The engine
version keeps the scale shape honest:

* every ROW-LEVEL rule (not-null, range, set membership, regex) is a
  conditional count inside ONE shared aggregate — a single pass over
  the table, no matter how many rules;
* ``unique`` rules ride the same aggregate as ``count - count(distinct)``
  (rows beyond the first occurrence; NULLs are the not-null rule's
  business and don't count here);
* ``refs`` (referential integrity) are one broadcast left-anti count
  per (col, dim) — the dim is the small side by construction;
* ``freshness`` compares ``max(ts)`` against an EXPLICIT ``as_of``
  (never wall-clock — deterministic, resumable, oracle-checkable).

Output: one row per rule — (rule, column, violations, total, passed),
sorted by (rule, column). Regexes must stay in the Java∩RE2 subset
(the PII-scrub discipline) so external oracles agree.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate_table(
    df: DataFrame,
    not_null: Sequence[str] = (),
    unique: Sequence[str] = (),
    in_range: Mapping[str, tuple[float, float]] | None = None,
    in_set: Mapping[str, Sequence] | None = None,
    matches: Mapping[str, str] | None = None,
    refs: Sequence[tuple[str, DataFrame, str]] = (),
    freshness: tuple[str, int, str] | None = None,
) -> DataFrame:
    """Evaluate a rule set; see module docstring for the plan shape.

    ``in_range`` maps col -> (lo, hi) inclusive; NULLs never violate
    range/set/regex rules (declare ``not_null`` for that). ``refs`` is
    (col, dim_df, dim_col) triples; ``freshness`` is
    (ts_col, max_age_seconds, as_of_iso).
    """
    in_range = dict(in_range or {})
    in_set = dict(in_set or {})
    matches = dict(matches or {})

    aggs: list[Column] = [F.count(F.lit(1)).alias("_total")]
    rows: list[tuple[str, str]] = []  # (rule, column) aligned with agg cols

    def add(rule: str, col: str, expr: Column) -> None:
        aggs.append(expr.alias(f"_v{len(rows)}"))
        rows.append((rule, col))

    for c in not_null:
        add("not_null", c, F.count(F.when(F.col(c).isNull(), 1)))
    for c in unique:
        add(
            "unique", c,
            F.count(F.col(c)) - F.count_distinct(F.col(c)),
        )
    for c, (lo, hi) in in_range.items():
        add(
            "in_range", c,
            F.count(
                F.when(
                    F.col(c).isNotNull() & ~F.col(c).between(lo, hi), 1
                )
            ),
        )
    for c, vals in in_set.items():
        add(
            "in_set", c,
            F.count(
                F.when(F.col(c).isNotNull() & ~F.col(c).isin(list(vals)), 1)
            ),
        )
    for c, pat in matches.items():
        add(
            "matches", c,
            F.count(F.when(F.col(c).isNotNull() & ~F.col(c).rlike(pat), 1)),
        )
    if freshness is not None:
        ts_col, max_age_s, as_of = freshness
        stale = F.max(F.col(ts_col)) < F.to_timestamp(
            F.lit(as_of)
        ) - F.expr(f"INTERVAL {int(max_age_s)} SECONDS")
        add(
            "freshness", ts_col,
            F.when(stale | F.max(F.col(ts_col)).isNull(), F.lit(1)).otherwise(
                F.lit(0)
            ).cast("long"),
        )

    one = df.agg(*aggs)
    stack_args: list[Column] = []
    for i, (rule, col) in enumerate(rows):
        stack_args += [F.lit(rule), F.lit(col), F.col(f"_v{i}")]
    out = one.select(
        F.col("_total"),
        F.expr(
            f"stack({len(rows)}, "
            + ", ".join(
                f"'{r}', '{c}', _v{i}" for i, (r, c) in enumerate(rows)
            )
            + ") AS (rule, column, violations)"
        ),
    ).select("rule", "column", "violations", F.col("_total").alias("total"))

    for col, dim, dim_col in refs:
        orphan = (
            df.select(F.col(col))
            .where(F.col(col).isNotNull())
            .join(
                F.broadcast(dim.select(F.col(dim_col).alias(col)).distinct()),
                on=col,
                how="left_anti",
            )
            .agg(F.count(F.lit(1)).alias("violations"))
        )
        total = df.agg(F.count(F.lit(1)).alias("total"))
        out = out.unionByName(
            orphan.crossJoin(total).select(
                F.lit("ref_integrity").alias("rule"),
                F.lit(col).alias("column"),
                "violations",
                "total",
            )
        )

    return out.withColumn("passed", F.col("violations") == 0).orderBy(
        "rule", "column"
    )
