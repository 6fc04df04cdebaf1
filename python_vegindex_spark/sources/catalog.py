"""Canonical-path helpers over a vegindex archive directory.

The reference's top-level user API is the ``get_*`` family
(vegindex.py:67-215): given (site, roilist_id) it derives the canonical
``{archive}/{site}/ROI/{site}_{roilist_id}_<suffix>.csv`` path and reads
the table. Same surface here, returning (DataFrame, header-properties)
through the typed readers in :mod:`vegindex_tables` — a vegindex user
points these at their existing archive unchanged (``archive_dir``
replaces the reference's ``config.archive_dir`` global).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .vegindex_tables import (
    read_gcc_summary,
    read_ir_roistats,
    read_ndvi_summary,
    read_ndvi_timeseries,
    read_roilist,
    read_roistats,
)


def roi_path(archive_dir: str, site: str, filename: str) -> str:
    return os.path.join(archive_dir, site, "ROI", filename)


def get_roi_list(
    spark: SparkSession, archive_dir: str, site: str, roilist_id: str
) -> tuple[DataFrame, dict]:
    """vegindex.py:67-90 — ``{site}_{roilist_id}_roi.csv`` -> validated
    interval dimension."""
    return read_roilist(
        spark, roi_path(archive_dir, site, f"{site}_{roilist_id}_roi.csv")
    )


def get_roi_timeseries(
    spark: SparkSession, archive_dir: str, site: str, roilist_id: str
) -> tuple[DataFrame, dict]:
    """vegindex.py:92-115 — ``{site}_{roilist_id}_roistats.csv``."""
    return read_roistats(
        spark, roi_path(archive_dir, site, f"{site}_{roilist_id}_roistats.csv")
    )


def get_roi_ir_timeseries(
    spark: SparkSession, archive_dir: str, site: str, roilist_id: str
) -> tuple[DataFrame, dict]:
    """vegindex.py:117-141 — ``{site}_{roilist_id}_IR_roistats.csv``."""
    return read_ir_roistats(
        spark, roi_path(archive_dir, site, f"{site}_{roilist_id}_IR_roistats.csv")
    )


def get_ndvi_timeseries(
    spark: SparkSession, archive_dir: str, site: str, roilist_id: str
) -> tuple[DataFrame, dict]:
    """vegindex.py:143-165 — ``{site}_{roilist_id}_NDVI_roistats.csv``."""
    return read_ndvi_timeseries(
        spark, roi_path(archive_dir, site, f"{site}_{roilist_id}_NDVI_roistats.csv")
    )


def get_gcc_timeseries(
    spark: SparkSession,
    archive_dir: str,
    site: str,
    roilist_id: str,
    nday: int = 3,
    nmin: int | None = None,
) -> tuple[DataFrame, dict]:
    """vegindex.py:167-187 — ``{site}_{roilist_id}_{nday}day.csv`` with
    the read-side threshold null-out."""
    return read_gcc_summary(
        spark,
        roi_path(archive_dir, site, f"{site}_{roilist_id}_{nday}day.csv"),
        nmin=nmin,
    )


def get_ndvi_summary(
    spark: SparkSession,
    archive_dir: str,
    site: str,
    roilist_id: str,
    nday: int = 3,
    nmin: int | None = None,
) -> tuple[DataFrame, dict]:
    """vegindex.py:189-215 — ``{site}_{roilist_id}_ndvi_{nday}day.csv``."""
    return read_ndvi_summary(
        spark,
        roi_path(archive_dir, site, f"{site}_{roilist_id}_ndvi_{nday}day.csv"),
        nmin=nmin,
    )
