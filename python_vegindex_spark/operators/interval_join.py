"""Interval-validity joins and broadcast dimension lookups.

Reference semantics:
* J2 — each image joins the ROI mask whose validity window contains its
  timestamp; the mask list is tiny, validated non-overlapping and
  ordered, so each row matches at most one interval
  (generate_roi_timeseries.py:123-151, roilist.py:230-238,331-363).
* J3 — site -> (lat, lon, elev, tzoffset) dimension lookup at
  construction time (roitimeseries.py:374-384, utils.py:219-252).

Spark shape: broadcast the dimension; the interval predicate rides a
BroadcastNestedLoopJoin (or a broadcast hash join when an equi-key like
series id exists, with the interval as a residual filter) — zero
shuffles of the fact side either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validate_intervals(
    dim: DataFrame,
    key_cols: list[str],
    start_col: str = "start_ts",
    end_col: str = "end_ts",
) -> None:
    """Reject overlapping or unordered validity windows per key — the
    ROIList validation (roilist.py:230-238). Raises ValueError."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(start_col)
    bad = (
        dim.withColumn("_prev_end", F.lag(end_col).over(w))
        .filter(
            (F.col(start_col) >= F.col(end_col))
            | (F.col("_prev_end").isNotNull() & (F.col(start_col) < F.col("_prev_end")))
        )
        .count()
    )
    if bad:
        raise ValueError(f"{bad} invalid/overlapping validity intervals")


def interval_join(
    facts: DataFrame,
    dim: DataFrame,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    how: str = "inner",
) -> DataFrame:
    """Join facts to the (broadcast) dimension row whose [start, end)
    window contains the fact timestamp, optionally also matching equi
    keys. With validated non-overlapping windows each fact matches <= 1
    dim row (asserted by construction, not re-checked per row)."""
    cond = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    if key_cols:
        for k in key_cols:
            cond = cond & (facts[k] == dim[k])
        d = dim
        out = facts.join(F.broadcast(d), on=cond, how=how)
        # drop duplicated key columns from the dim side
        return out.drop(*[d[k] for k in key_cols])
    return facts.join(F.broadcast(dim), on=cond, how=how)


def dim_lookup(
    facts: DataFrame, dim: DataFrame, on: list[str], how: str = "left"
) -> DataFrame:
    """J3: plain broadcast equi-join against a small dimension."""
    return facts.join(F.broadcast(dim), on=on, how=how)


def exclude_intervals(
    df: DataFrame,
    blackouts: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Blackout-window exclusion: drop every fact row whose timestamp
    falls inside ANY ``[start, end)`` interval of the (tiny)
    ``blackouts`` table — the ops staple for maintenance windows, load
    tests, and known-bad ingestion ranges that must not pollute
    rollups/baselines (the anti form of :func:`interval_join`).

    ``key_cols`` scopes blackouts to matching series (e.g. per
    conv/host); omit for global windows. Intervals may overlap freely —
    anti-join semantics need no validation pass.

    Shape: ``left_anti`` broadcast join — a BroadcastNestedLoopJoin for
    global windows, a broadcast hash join with a residual range filter
    when ``key_cols`` exist. The fact side never shuffles and survivors
    stream through; cost is rows × intervals comparisons, so keep the
    blackout list broadcast-sized (it is, by nature).
    """
    t = F.col(f"__f.{ts_col}")
    cond = (t >= F.col(f"__b.{start_col}")) & (t < F.col(f"__b.{end_col}"))
    for k in key_cols or []:
        cond = cond & (F.col(f"__f.{k}") == F.col(f"__b.{k}"))
    return (
        df.alias("__f")
        .join(F.broadcast(blackouts.alias("__b")), cond, "left_anti")
    )
