"""Batch sessionization — the deterministic batch twin of
``streaming/stateful.sessionize_stream``.

Semantics (identical to the streaming operator's gap rule, which
generalizes the reference's open-tail-bucket state,
update_summary_timeseries.py:246-256): within one key, ordered by
``(ts, *tie_break_cols)``, a row whose gap from the previous row
STRICTLY exceeds ``gap_s`` starts a new session. Batch sees the whole
input, so unlike the streaming twin it also emits each key's tail
session — the streaming operator's output is exactly this output minus
each key's last session (asserted in tests/test_stateful_streaming.py).

Scale shape: ONE shuffle. The lag + running-sum window partitions by the
key, and the session aggregate's group keys (key, session_idx) are a
superset of that hash partitioning, so Catalyst plans the groupBy
without a second Exchange (plan-asserted in tests/test_plans.py). Gap
math is integer microseconds (``unix_micros``), never float seconds, so
the strict-``>`` boundary is exact. Per-key work is a window sort; a
pathologically hot key lands in one task — inherent to session chaining
(each row's session id depends on every prior row of its key), and the
same sequential dependency bounds the streaming twin's per-key state
path. All expressions are JVM-side (no Python eval in the plan).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from python_vegindex_spark.functions.timeutil import epoch_us


def sessionize_batch(
    df: DataFrame,
    gap_s: float,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    weight: Column | str | None = None,
    tie_break_cols: Sequence[str] = (),
) -> DataFrame:
    """Session windows over a batch DataFrame.

    ``weight`` is the per-row quantity summed into ``weight_sum``
    (default ``length(text)``, mirroring the streaming twin's
    ``text_len_sum``). Returns one row per (key, session):
    (key_col, session_idx, session_start, session_end, n_turns,
    weight_sum), where session_idx is 0-based in time order within the
    key.
    """
    if weight is None:
        weight = F.length("text").cast("long")
    elif isinstance(weight, str):
        weight = F.col(weight)
    gap_us = int(round(gap_s * 1_000_000))

    w = Window.partitionBy(key_col).orderBy(ts_col, *tie_break_cols)
    # first row of a key: lag is NULL -> comparison NULL -> otherwise(0)
    brk = F.when(
        epoch_us(F.col(ts_col)) - epoch_us(F.lag(ts_col).over(w)) > gap_us,
        F.lit(1),
    ).otherwise(F.lit(0))
    sid = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))

    return (
        df.select(
            F.col(key_col),
            F.col(ts_col),
            weight.alias("_w"),
            sid.alias("session_idx"),
        )
        .groupBy(key_col, "session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_turns"),
            F.sum("_w").alias("weight_sum"),
        )
    )
