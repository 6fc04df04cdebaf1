"""vegindex-style headered CSV parity layer.

The reference persists every tier as CSV with a ``#`` comment header of
table properties, ``NA`` float sentinels, and fixed decimal formats
(roitimeseries.py:729-807 write, 843-974 read; gcctimeseries.py:570-722;
config.py:61-63 sentinels; -9999 coercion roitimeseries.py:21-50).

The Spark engine stores parquet/Iceberg; this layer exists so a
vegindex user can (a) ingest their existing CSVs and (b) export goldens
byte-comparable to the reference format:

* read  — distributed ``spark.read.option('comment', '#')`` with an
  explicit schema; ``NA``/``-9999`` -> NULL via try_cast + nullif.
  Header properties are parsed driver-side from the file head (the
  header is O(10) lines).
* write — collects to the driver (the summary tiers are O(buckets) —
  tiny) and formats with the reference's decimal conventions.
"""

from __future__ import annotations

import io
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ND_FLOAT = "NA"
ND_INT = "NA"
ND_STRING = "None"
MISSING_INPUTS = ("-9999", "-9999.0", "NA", "None", "")


def head_lines(
    path: str, spark: SparkSession | None = None, max_lines: int = 400
) -> list[str]:
    """First ``max_lines`` lines of a file — the header-probe primitive.

    With a ``spark`` session the probe goes through ``spark.read.text``,
    which resolves any Hadoop-FS scheme (``s3a://``, ``abfss://``,
    ``gs://``, ``file:``) instead of the driver's local filesystem.
    Header files are far below one input split, so line order is
    preserved. Without a session it falls back to a local ``open``."""
    if spark is not None:
        return [r[0] for r in spark.read.text(path).limit(max_lines).collect()]
    out: list[str] = []
    with open(path, "r", errors="replace") as f:
        for line in f:
            out.append(line.rstrip("\n"))
            if len(out) >= max_lines:
                break
    return out


def read_properties(
    path: str, spark: SparkSession | None = None, max_lines: int = 400
) -> dict[str, str]:
    """Parse '# key: value' comment-header properties (regex per
    roitimeseries.py:283-312). Pass ``spark`` to probe object-store
    paths (see :func:`head_lines`).

    Real reference files contain merged header lines (a missing newline:
    ``# Blue DN .05 Quantile Max: 90# Time of Day Min: 00:00:00`` in the
    shipped harvard 1-day golden) — a ``#`` is treated as a segment
    break only when what follows itself looks like a ``Key: value``
    property, so a ``#`` inside a free-text property value survives
    intact."""
    props: dict[str, str] = {}
    for line in head_lines(path, spark, max_lines):
        if not line.startswith("#"):
            if line.strip():
                break
            continue
        for segment in re.split(r"#(?=[^:]+:)", line):
            m = re.match(r"\s*([^:]+):\s*(.*)$", segment)
            if m:
                props[m.group(1).strip()] = m.group(2).strip()
    return props


def sentinel_cast(name: str, dtype: T.DataType):
    """One typed column from its raw string column: every reference
    missing-value spelling -> NULL, then a tolerant cast. Integer fields
    coerce through double first (the reference's
    ``_int_or_none(_float_or_none(...))`` — e.g. exposure written as
    "34.0", ndvitimeseries.py:730-732) — a direct string->int cast would
    NULL those. THE one definition of the sentinel/cast pipeline, shared
    by read_headered_csv and vegindex_tables._typed_scan."""
    c = F.col(name)
    for miss in MISSING_INPUTS:
        c = F.nullif(c, F.lit(miss))
    if isinstance(dtype, T.IntegerType):
        c = c.try_cast("double").try_cast("int")
    else:
        c = c.try_cast(dtype.simpleString())
    return c.alias(name)


def read_headered_csv(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, dict[str, str]]:
    """Distributed CSV scan honoring comment headers and NA sentinels."""
    props = read_properties(path, spark)
    raw = (
        spark.read.option("comment", "#")
        .option("header", "true")
        .option("nullValue", "NA")
        .csv(path)
    )
    return raw.select(*[sentinel_cast(f_.name, f_.dataType) for f_ in schema.fields]), props


def write_headered_csv(
    df: DataFrame,
    path: str,
    properties: dict[str, str],
    sort_cols: list[str],
    float_decimals: dict[str, int] | None = None,
    default_decimals: int = 5,
    banner: str | None = None,
    plain_cols_for_row=None,
) -> int:
    """Reference-format export: '# key: value' header, sorted rows,
    fixed decimals, NA sentinels (gcctimeseries.py:570-722 conventions;
    NULL renders as ``NA`` in numeric columns and ``None`` in string
    columns, matching config.py:61-63 ND_FLOAT/ND_STRING). Returns the
    row count written (so callers never re-execute the plan to count).

    ``banner`` reproduces the reference's free-text header prologue
    (``#\\n# {banner}\\n#`` before the key-value lines, e.g. 'ROI color
    statistics timeseries for harvard', roitimeseries.py:742-744).

    ``plain_cols_for_row(row) -> set[str] | None`` names float columns
    that THIS row formats with plain ``{}`` (full repr) instead of fixed
    decimals — the reference's sub-threshold/no-data branches switch
    per-row formats this way (gcctimeseries.py:497-531,
    ndvi_summary_timeseries.py:432-459).

    Spark integer columns that pandas upcast to float64 (because they
    carry NULLs) still render as plain ints, matching the reference's
    '{}' for exposure/awbflag/mask_index.

    Collects — use only for summary tiers / golden comparison."""
    string_cols = {
        f_.name for f_ in df.schema.fields if isinstance(f_.dataType, T.StringType)
    }
    int_cols = {
        f_.name
        for f_ in df.schema.fields
        if isinstance(f_.dataType, (T.ByteType, T.ShortType, T.IntegerType, T.LongType))
    }
    pdf = df.orderBy(*sort_cols).toPandas()
    float_decimals = float_decimals or {}
    buf = io.StringIO()
    if banner is not None:
        buf.write(f"#\n# {banner}\n#\n")
    for k, v in properties.items():
        buf.write(f"# {k}: {v}\n")
    buf.write("#\n")
    cols = list(pdf.columns)
    buf.write(",".join(cols) + "\n")
    import numpy as np
    import pandas as pd

    def fmt(v, col, plain) -> str:
        if v is None or (isinstance(v, float) and np.isnan(v)) or v is pd.NaT:
            return ND_STRING if col in string_cols else ND_FLOAT
        if isinstance(v, (float, np.floating)):
            if col in int_cols:  # nullable int upcast by pandas
                return str(int(v))
            if plain and col in plain:
                return f"{v}"
            return f"{v:.{float_decimals.get(col, default_decimals)}f}"
        if isinstance(v, pd.Timestamp):
            return v.strftime("%Y-%m-%d %H:%M:%S")
        return str(v)

    for row in pdf.itertuples(index=False):
        plain = plain_cols_for_row(row) if plain_cols_for_row else None
        buf.write(",".join(fmt(v, c, plain) for v, c in zip(row, cols)) + "\n")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(buf.getvalue())
    return len(pdf)
