"""Bronze (raw turns) table reader with partition pruning.

The Spark analog of the reference archive scan ``getsiteimglist``
(utils.py:103-213), which prunes year/month directories outside the
requested [startDT, endDT] before touching files. Bronze turns are laid
out partitioned by ``ts_date`` (sources/synth.py:write_turns); a filter
on the raw ``ts`` column alone does NOT prune those partitions (verified
via .explain — only row-group pushdown happens), so this reader derives
the equivalent ``ts_date`` predicate explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TURNS_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def read_turns(
    spark: SparkSession,
    path: str,
    start_ts: str | None = None,
    end_ts: str | None = None,
) -> DataFrame:
    """Scan bronze turns, pruning day partitions to [start_ts, end_ts).

    Both bounds are optional ISO timestamps. The ``ts_date`` predicates
    turn into PartitionFilters (directory pruning); the ``ts`` predicates
    turn into parquet PushedFilters (row-group pruning).
    """
    df = spark.read.parquet(path)
    has_day_partition = "ts_date" in df.columns
    if start_ts is not None:
        df = df.filter(F.col("ts") >= F.lit(start_ts))
        if has_day_partition:
            df = df.filter(F.col("ts_date") >= F.to_date(F.lit(start_ts)))
    if end_ts is not None:
        df = df.filter(F.col("ts") < F.lit(end_ts))
        if has_day_partition:
            df = df.filter(F.col("ts_date") <= F.to_date(F.lit(end_ts)))
    return df.select(*TURNS_COLS)
