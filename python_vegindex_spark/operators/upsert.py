"""Keyed upsert (merge) — the reference's insert_row semantics.

Reference: linear-probe replace-or-append keyed by filename/date
(roitimeseries.py:555-582, gcctimeseries.py:471-484). Known index-0 bug
(``if row_index:`` treats position 0 as "not found", roitimeseries.py:576)
deliberately NOT replicated.

Spark shape: ``MERGE INTO`` on Iceberg; here the format-agnostic
dataframe form — anti-join the base against update keys, union the
updates. The sinks module applies it with partition-overwrite so only
touched partitions rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(base: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """WHEN MATCHED UPDATE, WHEN NOT MATCHED INSERT — as a dataframe op.

    Requires identical schemas, and ``updates`` MUST be key-unique —
    duplicate update keys both survive the union (Iceberg MERGE INTO
    rejects this case at runtime; here it would silently double rows).
    Collapse a multi-version batch with :func:`dedup_by_key` first.
    The anti-join shuffles on the key columns; with updates typically
    << base, AQE broadcasts the update side of the anti-join.
    """
    kept = base.join(updates.select(*keys), on=keys, how="left_anti")
    return kept.unionByName(updates)


def exists_check(candidates: DataFrame, existing: DataFrame, keys: list[str]) -> DataFrame:
    """Rows of ``candidates`` whose key is NOT in ``existing`` — the
    update scripts' append-only existence check
    (update_roi_timeseries.py:131-132,205-218). Left-anti join."""
    return candidates.join(existing.select(*keys), on=keys, how="left_anti")


def dedup_by_key(df: DataFrame, keys: list[str], order_col: str = "ts") -> DataFrame:
    """Keep the last row per key ordered by ``order_col`` (U2 ingest
    dedup semantics) via one max-struct aggregate, not a window sort."""
    payload = F.struct(F.col(order_col).alias("_o"), *[F.col(c) for c in df.columns])
    agg = df.groupBy(*keys).agg(F.max(payload).alias("_m"))
    return agg.select(*[F.col("_m")[c].alias(c) for c in df.columns if c not in keys], *keys).select(*df.columns)
