"""Timestamp helpers tolerant of TIMESTAMP vs TIMESTAMP_NTZ inputs.

Parquet written by other engines (e.g. the driver's testdata) often
carries TIMESTAMP_NTZ; Spark's ``unix_micros`` only accepts TIMESTAMP.
``epoch_us`` casts first — with the session timezone pinned to UTC
(session.get_spark) the NTZ->instant interpretation is the identity, so
deltas and bucket math are wall-clock correct either way.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(c: Column) -> Column:
    """Microseconds since epoch for TIMESTAMP or TIMESTAMP_NTZ columns."""
    return F.unix_micros(c.cast("timestamp"))
