"""Typed readers for the reference's on-disk table formats.

The reference persists five table kinds as ``#``-comment-headered CSVs
(SURVEY.md §1). :mod:`csv_compat` provides the generic scan; this module
adds the PER-TABLE schemas and read-side semantics so a vegindex user
can point the Spark engine at their existing files:

* tier-1 roistats / IR roistats / NDVI timeseries
  (roitimeseries.py:843-974, ir_roitimeseries.py readCSV,
  ndvitimeseries.py:644-759) — schema-typed scan, ``NA``/``-9999``/
  ``None`` -> NULL, plus a real ``ts`` TimestampType column assembled
  from (date, local_std_time) replacing the reference's string pair;
* tier-2 gcc summary (gcctimeseries.py:186-393) — same, PLUS the
  read-side threshold projection: stats become NULL where
  ``image_count == 0 OR image_count < nmin`` and the midday_* columns
  become NULL where ``image_count == 0`` (the reference's three-branch
  null-out re-expressed as two CASE WHEN column families);
* tier-2 NDVI summary (ndvi_summary_timeseries.py:183-353) — same,
  with its (asymmetric, bug-compatible) column families: at
  ``0 < image_count < nmin`` the reference KEEPS midday_ndvi/gcc_90/
  ndvi_mean/ndvi_std but nulls ndvi_50/75/90 + max_solar_elev + flags;
* ROI mask list (roilist.py:129-252) — driver-side parse (O(10) rows)
  with the reference's validation (end > start, ordered,
  non-overlapping; roilist.py:230-238), returned as the
  validity-interval broadcast dimension consumed by
  :func:`..operators.interval_join.interval_join`;
* site_info (utils.py:219-252 local-CSV fallback) — broadcast
  dimension of per-site (lat, lon, elev, tzoffset).

All scans are distributed ``spark.read.csv`` with explicit schemas
(header-driven, so optional columns like IR ``awbflag`` are handled);
only the tiny dimensions (ROI list, header properties) touch the
driver.
"""

from __future__ import annotations

import json
from datetime import datetime
from http.client import HTTPException

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .csv_compat import head_lines, read_properties, sentinel_cast

# ---------------------------------------------------------------------------
# schemas (header-driven: column name -> Spark type)

_INT_COLS = {
    "doy",
    "year",
    "image_count",
    "exposure",
    "exposure_rgb",
    "exposure_ir",
    "awbflag",
    "mask_index",
    "snow_flag",
}
_STR_COLS = {
    "local_std_time",
    "filename",
    "filename_rgb",
    "filename_ir",
    "midday_filename",
    "midday_rgb_filename",
    "midday_ir_filename",
    "sitename",
    "maskfile",
    "sample_image",
}
_DATE_COLS = {"date", "start_date", "end_date"}


def _col_type(name: str) -> T.DataType:
    if name in _DATE_COLS:
        return T.DateType()
    if name in _INT_COLS or name.startswith("outlierflag_"):
        return T.IntegerType()
    if name in _STR_COLS:
        return T.StringType()
    return T.DoubleType()


def _header_columns(path: str, spark: SparkSession | None = None) -> list[str]:
    """First non-comment line = the CSV field row. With ``spark`` the
    probe runs through the Hadoop FS layer (object-store-safe, see
    csv_compat.head_lines); still O(header) either way."""
    for line in head_lines(path, spark):
        if line.startswith("#") or not line.strip():
            continue
        return [c.strip() for c in line.strip().split(",")]
    raise ValueError(f"no CSV header row found in {path}")


def _typed_scan(
    spark: SparkSession, path: str
) -> tuple[DataFrame, dict[str, str]]:
    """Distributed scan with a header-derived schema; all reference
    missing-value spellings (``NA``, ``None``, ``-9999``, empty) -> NULL
    before the typed cast."""
    props = read_properties(path, spark)
    cols = _header_columns(path, spark)
    raw = (
        spark.read.option("comment", "#")
        .option("header", "true")
        .csv(path)
    )
    # sentinel handling + tolerant casts live in ONE place
    # (csv_compat.sentinel_cast, shared with read_headered_csv)
    return raw.select(*[sentinel_cast(n, _col_type(n)) for n in cols]), props


def _with_ts(df: DataFrame) -> DataFrame:
    """Assemble the reference's (date, local_std_time) string pair into a
    real TimestampType column — the engine's native event-time key."""
    return df.withColumn(
        "ts",
        F.to_timestamp(
            F.concat_ws(" ", F.col("date").cast("string"), F.col("local_std_time"))
        ),
    )


# ---------------------------------------------------------------------------
# tier-1 readers

def read_roistats(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """Tier-1 RGB roistats CSV (39 columns; roitimeseries.py:777-789
    field list, readCSV roitimeseries.py:843-974)."""
    df, props = _typed_scan(spark, path)
    return _with_ts(df), props


def read_ir_roistats(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """Tier-1 IR roistats CSV (ir_roitimeseries.py readCSV; the awbflag
    column is optional and handled by the header-driven schema)."""
    df, props = _typed_scan(spark, path)
    return _with_ts(df), props


def read_ndvi_timeseries(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """Tier-1.5 NDVI timeseries CSV (ndvitimeseries.py:644-759; column
    set per generate_ndvi_timeseries.py:207-248)."""
    df, props = _typed_scan(spark, path)
    return _with_ts(df), props


# ---------------------------------------------------------------------------
# tier-2 summary readers with threshold null-out

_GCC_STATS_LT_NMIN = [
    "r_mean", "r_std", "g_mean", "g_std", "b_mean", "b_std",
    "gcc_mean", "gcc_std", "gcc_50", "gcc_75", "gcc_90",
    "rcc_mean", "rcc_std", "rcc_50", "rcc_75", "rcc_90",
    "max_solar_elev", "snow_flag",
    "outlierflag_gcc_mean", "outlierflag_gcc_50",
    "outlierflag_gcc_75", "outlierflag_gcc_90",
]
_GCC_MIDDAY_ZERO = [
    "midday_filename", "midday_r", "midday_g", "midday_b",
    "midday_gcc", "midday_rcc",
]

_NDVI_STATS_LT_NMIN = [
    "ndvi_50", "ndvi_75", "ndvi_90", "max_solar_elev", "snow_flag",
    "outlierflag_ndvi_mean", "outlierflag_ndvi_50",
    "outlierflag_ndvi_75", "outlierflag_ndvi_90",
]
_NDVI_ZERO_ONLY = [
    "midday_rgb_filename", "midday_ir_filename", "midday_ndvi",
    "ndvi_mean", "ndvi_std",
]


def threshold_nullout(
    df: DataFrame, nmin: int, lt_nmin_cols: list[str], zero_cols: list[str]
) -> DataFrame:
    cnt = F.col("image_count")
    lt = (cnt == 0) | (cnt < F.lit(int(nmin)))
    zero = cnt == 0
    updates = {
        c: F.when(lt, F.lit(None)).otherwise(F.col(c))
        for c in lt_nmin_cols
        if c in df.columns
    }
    updates.update(
        {
            c: F.when(zero, F.lit(None)).otherwise(F.col(c))
            for c in zero_cols
            if c in df.columns
        }
    )
    return df.withColumns(updates)


def _nmin_from(props: dict, nmin: int | None) -> int:
    if nmin is not None:
        return int(nmin)
    return int(props.get("Image Count Threshold", 1) or 1)


def read_gcc_summary(
    spark: SparkSession, path: str, nmin: int | None = None
) -> tuple[DataFrame, dict]:
    """Tier-2 gcc summary CSV with the read-side threshold projection
    (gcctimeseries.py:186-393): stats NULL where ``image_count == 0`` or
    ``< nmin`` (default: the file's ``Image Count Threshold`` header),
    midday_* NULL where ``image_count == 0``; ``year`` recomputed from
    ``date`` (recompute-don't-trust, gcctimeseries.py:291-293)."""
    df, props = _typed_scan(spark, path)
    df = df.withColumn("year", F.year("date"))
    df = threshold_nullout(
        df, _nmin_from(props, nmin), _GCC_STATS_LT_NMIN, _GCC_MIDDAY_ZERO
    )
    return df, props


def read_ndvi_summary(
    spark: SparkSession, path: str, nmin: int | None = None
) -> tuple[DataFrame, dict]:
    """Tier-2 NDVI summary CSV with its read-side threshold projection
    (ndvi_summary_timeseries.py:183-353). Bug-compatible asymmetry: at
    ``0 < image_count < nmin`` the reference keeps midday_ndvi, gcc_90,
    ndvi_mean and ndvi_std but nulls ndvi_50/75/90, max_solar_elev and
    the flags; at ``image_count == 0`` everything is NULL."""
    df, props = _typed_scan(spark, path)
    df = df.withColumn("year", F.year("date"))
    df = threshold_nullout(
        df, _nmin_from(props, nmin), _NDVI_STATS_LT_NMIN, _NDVI_ZERO_ONLY
    )
    return df, props


# ---------------------------------------------------------------------------
# dimensions

def read_roilist(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """ROI mask list -> validity-interval broadcast dimension.

    Driver-side parse + the reference's validation (roilist.py:230-238):
    end_dt > start_dt, masks ordered and non-overlapping. Returns
    (mask_index [1-based file order], start_ts, end_ts, maskfile,
    sample_image) ready for ``interval_join`` (J2); year-9999 open ends
    are kept as-is (TimestampType covers them)."""
    props = read_properties(path, spark)
    cols = _header_columns(path, spark)
    rows = []
    # ROI lists are O(10) masks — the whole file is one header probe;
    # sourcing the lines through the Hadoop FS keeps this object-store
    # safe while preserving the reference's file-order validation
    lines = head_lines(path, spark, max_lines=100_000)
    import csv as _csv

    rdr = _csv.DictReader(
        (ln for ln in lines if not ln.startswith("#") and ln.strip())
    )
    last_end = datetime(1999, 1, 1)
    for i, row in enumerate(rdr, start=1):
        start_dt = datetime.strptime(
            row["start_date"] + " " + row["start_time"], "%Y-%m-%d %H:%M:%S"
        )
        end_dt = datetime.strptime(
            row["end_date"] + " " + row["end_time"], "%Y-%m-%d %H:%M:%S"
        )
        if end_dt <= start_dt:
            raise ValueError("Mask end date is <= start date")
        if start_dt < last_end:
            raise ValueError("Mask date ranges are overlapping or out of order")
        last_end = end_dt
        rows.append(
            (i, start_dt, end_dt, row["maskfile"], row.get("sample_image"))
        )
    schema = (
        "mask_index int, start_ts timestamp, end_ts timestamp, "
        "maskfile string, sample_image string"
    )
    del cols  # header validated implicitly by DictReader key access
    return spark.createDataFrame(rows, schema), props


def read_site_info(
    spark: SparkSession, path: str, sitename: str | None = None
) -> DataFrame:
    """site_info CSV -> broadcast dimension (utils.py:219-252 local
    fallback): (sitename, lat, lon, elev, tzoffset, ...)."""
    df, _ = _typed_scan(spark, path)
    casts = {}
    for name, typ in (
        ("lat", "double"), ("lon", "double"), ("elev", "double"),
        ("tzoffset", "double"), ("nimage", "int"),
    ):
        if name in df.columns:
            casts[name] = F.col(name).cast(typ)
    df = df.withColumns(casts)
    if sitename is not None:
        df = df.filter(F.col("sitename") == sitename)
    return df


# ---------------------------------------------------------------------------
# archive scan (S1): filename-encoded timestamps -> real ts column

def filename_to_ts(filename, sitename: str, ir: bool = False):
    """Column expression parsing the reference's path-encoded timestamp
    ``{site}[_IR]_YYYY_MM_DD_HHNNSS.jpg`` (utils.py:63-97 fn2datetime,
    fixed positions after the prefix) into a TimestampType column —
    whole-stage-codegen, no UDF."""
    prefix = sitename + ("_IR" if ir else "")
    dt = F.substring(filename, len(prefix) + 2, 17)  # YYYY_MM_DD_HHNNSS
    # try_to_timestamp, not to_timestamp: Catalyst's constraint
    # propagation can replay this expression against OTHER filename
    # columns across an equi-join (e.g. the binaryFile scan of a mixed
    # RGB+IR tree in roi_pipeline), and ANSI mode would throw on the
    # non-matching names instead of nulling them out. The listing regex
    # has already guaranteed parseability for every row we keep.
    return F.try_to_timestamp(dt, F.lit("yyyy_MM_dd_HHmmss"))


def scan_archive(
    spark: SparkSession,
    archive_dir: str,
    sitename: str,
    start_dt: datetime | None = None,
    end_dt: datetime | None = None,
    ir: bool = False,
) -> DataFrame:
    """S1 archive directory scan -> DataFrame(path, filename, ts), sorted.

    Mirrors utils.py:103-213 getsiteimglist: ``site/YYYY/MM/`` dirs
    pruned to the [start, end] year-month range driver-side (the listing
    is catalog-scale, not data-scale; on a real lakehouse this is
    partition pruning on a ts_date column — see sources/bronze.py), the
    standard-filename regex match, then timestamp parse + range filter as
    Spark expressions."""
    import os as _os
    import re as _re

    start_dt = start_dt or datetime(1990, 1, 1)
    end_dt = end_dt or datetime(9999, 1, 1)
    prefix = sitename + ("_IR" if ir else "")
    rows = []
    sitepath = _os.path.join(archive_dir, sitename)
    if _os.path.isdir(sitepath):
        for yeardir in sorted(_os.listdir(sitepath)):
            if not _re.match(r"^\d{4}$", yeardir):
                continue
            y = int(yeardir)
            if y < start_dt.year or y > end_dt.year:
                continue
            yearpath = _os.path.join(sitepath, yeardir)
            if not _os.path.isdir(yearpath):
                continue
            for mondir in sorted(_os.listdir(yearpath)):
                if not _re.match(r"^\d{2}$", mondir):
                    continue
                m = int(mondir)
                if not 1 <= m <= 12:
                    continue
                if (y == start_dt.year and m < start_dt.month) or (
                    y == end_dt.year and m > end_dt.month
                ):
                    continue
                monpath = _os.path.join(yearpath, mondir)
                if not _os.path.isdir(monpath):
                    continue
                pat = _re.compile(
                    rf"^{_re.escape(prefix)}_{yeardir}_{mondir}_.*\.jpg$"
                )
                for f in sorted(_os.listdir(monpath)):
                    if pat.match(f):
                        rows.append((_os.path.join(monpath, f), f))
    df = spark.createDataFrame(rows or [], "path string, filename string")
    return (
        df.withColumn("ts", filename_to_ts(F.col("filename"), sitename, ir))
        .filter(F.col("ts").between(start_dt, end_dt))
        .orderBy("path")
    )


SITE_INFO_URL = "https://phenocam.nau.edu/webcam/sites/{0}/info/"


def get_site_info(
    spark: SparkSession,
    sitename: str,
    csv_path: str | None = None,
    url_template: str | None = SITE_INFO_URL,
    fetch_fn=None,
    timeout_s: float = 10.0,
) -> dict | None:
    """The reference's ``getsiteinfo`` (utils.py:219-252): try the
    site-info JSON URL first, fall back to the local CSV.

    ``fetch_fn(url) -> str`` injects the HTTP client (tests; custom
    auth); the default is stdlib urllib with ``timeout_s``. I/O-shaped
    fetch failures — no network (this sandbox), HTTP error, bad JSON —
    fall through to the CSV like the reference's
    ``except RequestException``; that is ``OSError`` (urllib's error
    hierarchy), ``http.client.HTTPException`` (malformed responses —
    BadStatusLine, IncompleteRead — which urllib raises unwrapped) and
    ``ValueError`` (``json.JSONDecodeError``'s base), NOT a bare
    ``except`` — a programming error inside an injected
    ``fetch_fn`` (TypeError etc.) propagates instead of silently
    degrading to stale CSV data. Pass ``url_template=None`` to skip the
    network path entirely (air-gapped clusters). The CSV fallback
    raises ``FileNotFoundError`` when ``csv_path`` is unreadable
    (reference exits -1 there) and returns ``None`` for an unknown
    site (reference's IndexError -> None).
    """
    if url_template is not None:
        url = url_template.format(sitename)
        try:
            if fetch_fn is not None:
                body = fetch_fn(url)
            else:
                from urllib.request import urlopen

                with urlopen(url, timeout=timeout_s) as resp:
                    body = resp.read().decode("utf-8")
            info = json.loads(body)
            if isinstance(info, dict):
                return info
        except (OSError, ValueError, HTTPException):
            pass  # I/O / parse failure -> CSV fallback, like the reference
    if csv_path is None:
        raise FileNotFoundError(
            "site-info URL unavailable and no csv_path fallback given"
        )
    rows = (
        read_site_info(spark, csv_path, sitename=sitename).limit(1).collect()
    )
    return rows[0].asDict() if rows else None
