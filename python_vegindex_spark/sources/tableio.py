"""TableIO — format adapter with MERGE-like semantics on plain parquet.

The engine's logic is format-agnostic; in production these tables are
Iceberg and upserts are ``MERGE INTO`` / ``replaceWhere``. This sandbox
has no Iceberg runtime jar, so TableIO emulates the same surface on
parquet directories:

* ``upsert``   — MERGE on keys: read target, anti-join, union, rewrite.
  At scale the rewrite is confined to affected partitions via a
  per-write dynamic partition overwrite (DataFrameWriter option, never
  the session conf), exactly the partitions the update keys touch.
* ``append``   — plain append.
* ``read``     — schema-stable read that tolerates a missing table.

Keeping this adapter thin means a real Iceberg catalog is a config
change, not a refactor (SURVEY.md §7).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def exists(path: str) -> bool:
    """True only on parquet evidence (.parquet files or a _SUCCESS
    marker, possibly inside partition subdirectories) — stray leftovers
    like a _temporary dir from an interrupted write do not count, so
    read() keeps its missing-table -> None contract."""
    if not os.path.isdir(path):
        return False
    for root, _dirs, files in os.walk(path):
        if any(n.endswith(".parquet") or n == "_SUCCESS" for n in files):
            return True
    return False


def read(spark: SparkSession, path: str) -> DataFrame | None:
    if not exists(path):
        return None
    return spark.read.parquet(path)


def append(df: DataFrame, path: str) -> None:
    df.write.mode("append").parquet(path)


def overwrite(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def upsert(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    keys: list[str],
    partition_by: list[str] | None = None,
) -> int:
    """MERGE-equivalent: replace target rows matching update keys, insert
    the rest. Returns the number of upserted rows.

    With ``partition_by``, only partitions present in ``updates`` are
    rewritten (dynamic partition overwrite) — the parquet emulation of
    Iceberg's ``replaceWhere``/MERGE write amplification profile.
    """
    n_up = updates.count()
    existing = read(spark, path)
    if existing is None:
        overwrite(updates, path, partition_by)
        return n_up

    if partition_by:
        touched = updates.select(*partition_by).distinct()
        base = existing.join(F.broadcast(touched), on=partition_by, how="left_semi")
        kept = base.join(updates.select(*keys), on=keys, how="left_anti")
        out = kept.unionByName(updates).localCheckpoint(eager=True)
        # per-write dynamic overwrite: scoped to THIS write, so the
        # session-global partitionOverwriteMode (and every later
        # partitioned overwrite's full-replace semantics) is untouched
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_by)
            .parquet(path)
        )
    else:
        kept = existing.join(updates.select(*keys), on=keys, how="left_anti")
        out = kept.unionByName(updates).localCheckpoint(eager=True)
        overwrite(out, path)
    return n_up


def compact(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int,
    partition_by: list[str] | None = None,
) -> dict:
    """Small-file compaction — the Iceberg ``rewrite_data_files`` analog.

    Incremental appends (``extend_chunks``, checkpoint/lineage writes,
    per-run upserts) accumulate many small parquet files; at scale each
    file is a scan task and a NameNode/manifest entry, so periodic
    bin-packing is standard table maintenance. Parquet emulation: read,
    coalesce to ``ceil(rows / target_rows_per_file)`` files, rewrite
    through an eager localCheckpoint (safe to overwrite the source),
    preserving ``partition_by`` directories when given.
    """
    import math

    df = read(spark, path)
    if df is None:
        return {"files_before": 0, "files_after": 0, "rows": 0}

    def _nfiles() -> int:
        n = 0
        for root, _dirs, files in os.walk(path):
            n += sum(1 for f in files if f.endswith(".parquet"))
        return n

    before = _nfiles()
    rows = df.count()
    n_out = max(1, math.ceil(rows / target_rows_per_file))
    pinned = df.localCheckpoint(eager=True)
    if partition_by:
        # coalesce within partitions: repartition by the partition cols
        # so each directory gets contiguous writers
        out = pinned.repartition(n_out, *[F.col(c) for c in partition_by])
        w = out.write.mode("overwrite").partitionBy(*partition_by)
    else:
        w = pinned.coalesce(n_out).write.mode("overwrite")
    w.parquet(path)
    return {"files_before": before, "files_after": _nfiles(), "rows": rows}
