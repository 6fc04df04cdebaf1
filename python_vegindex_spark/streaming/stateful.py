"""Custom stateful streaming operator: conversation sessionization.

The reference's incremental scripts keep one piece of state per series —
the open tail bucket (update_summary_timeseries.py:246-256 re-opens the
last period because new data may extend it). This operator generalizes
that to a custom stateful session window over a turn stream with
``applyInPandasWithState`` (the engine's GroupState surface):

* group by conv_id; state = the OPEN session (start, last ts, counts);
* a turn arriving within ``gap_s`` of the last extends the session;
* a larger gap CLOSES the session (emitted) and opens a new one;
* state persists in the streaming checkpoint, so a later
  ``availableNow`` run resumes open sessions across restarts — the
  streaming twin of streaming/incremental.py's watermark resume.

Within each micro-batch the work is vectorized (numpy gap-split), not
per-row Python; the state object holds only the open session tuple.

Open sessions are emitted when closed by a later turn, or — when
``flush_after_s`` is set — by a processing-time timeout that fires after
a conversation has been quiet for that long (the tail session is then
emitted and its state dropped). With ``flush_after_s=None`` (default)
tail sessions stay provisional forever, mirroring the reference's rule
that the tail bucket is always provisional
(update_summary_timeseries.py:246-256).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("text_len_sum", T.LongType()),
    ]
)

# open-session state: (start_us, last_us, n_turns, text_len_sum)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("tls", T.LongType()),
    ]
)


def _sessionize(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.hasTimedOut:
        # flush: the conversation has been quiet past flush_after_s —
        # emit the open tail session and drop its state
        if state.exists:
            start_us, last_us, n, s = state.get
            state.remove()
            if n > 0:
                yield pd.DataFrame(
                    {
                        "conv_id": [conv_id],
                        "session_start": pd.to_datetime([start_us], unit="us"),
                        "session_end": pd.to_datetime([last_us], unit="us"),
                        "n_turns": [n],
                        "text_len_sum": [s],
                    }
                )
        else:
            state.remove()
        return
    pdf = pd.concat(list(pdfs), ignore_index=True)
    if len(pdf) == 0:
        return
    pdf = pdf.sort_values("ts", kind="mergesort")
    ts_us = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    tls = pdf["text_len"].to_numpy(dtype="int64")
    # round, not truncate: int(1.001 * 1e6) is 1000999, which would split
    # exact-gap boundaries the batch twin (sessionize_batch) keeps together
    gap_us = int(round(pdf["gap_s"].iloc[0] * 1_000_000))

    if state.exists:
        start_us, last_us, n, s = state.get
    else:
        start_us, last_us, n, s = ts_us[0], ts_us[0] - 1, 0, 0
        # (last_us sentinel one µs before first turn: first gap is tiny)

    # split points: turns whose gap from the previous event exceeds gap_us
    prev = np.concatenate(([last_us], ts_us[:-1]))
    new_session = (ts_us - prev) > gap_us
    out_rows = []
    if state.exists and bool(new_session[0]):
        # the batch's first turn does NOT extend the open session:
        # close and emit it, then start fresh
        out_rows.append((conv_id, start_us, last_us, n, s))
        n, s = 0, 0
        start_us = ts_us[0]
    split_idx = np.flatnonzero(new_session)
    seg_starts = np.concatenate(([0], split_idx))
    seg_ends = np.concatenate((split_idx, [len(ts_us)]))
    for k, (a, b) in enumerate(zip(seg_starts, seg_ends)):
        if a == b:
            continue
        if k == 0:
            # continues the open state session
            seg_n = n + (b - a)
            seg_start = start_us
            seg_tls = s + int(tls[a:b].sum())
        else:
            seg_n = b - a
            seg_start = ts_us[a]
            seg_tls = int(tls[a:b].sum())
        seg_last = ts_us[b - 1]
        is_final = b == len(ts_us)
        if is_final:
            state.update((int(seg_start), int(seg_last), int(seg_n), int(seg_tls)))
            flush_ms = int(pdf["flush_ms"].iloc[0])
            if flush_ms > 0:
                state.setTimeoutDuration(flush_ms)
        else:
            out_rows.append((conv_id, seg_start, seg_last, seg_n, seg_tls))
    if out_rows:
        yield pd.DataFrame(
            {
                "conv_id": [r[0] for r in out_rows],
                "session_start": pd.to_datetime([r[1] for r in out_rows], unit="us"),
                "session_end": pd.to_datetime([r[2] for r in out_rows], unit="us"),
                "n_turns": [r[3] for r in out_rows],
                "text_len_sum": [r[4] for r in out_rows],
            }
        )


def sessionize_stream(
    stream: DataFrame, gap_s: float = 1800.0, flush_after_s: float | None = None
) -> DataFrame:
    """Stateful session windows over a streaming turns DataFrame.

    ``stream`` needs (conv_id, ts, text). Emits one row per CLOSED
    session; the open tail session lives in checkpointed state and is
    closed by future batches (restart-safe). When ``flush_after_s`` is
    set, a conversation quiet for that much processing time has its tail
    session flushed (emitted) via a GroupState timeout instead of being
    held open forever.
    """
    from pyspark.sql import functions as F

    flush_ms = 0 if flush_after_s is None else max(1, int(flush_after_s * 1000))
    prepped = stream.select(
        "conv_id",
        "ts",
        # coalesce: a NULL text would reach pandas as float64 NaN, and
        # numpy's NaN->int64 cast silently yields INT64_MIN garbage sums
        F.coalesce(F.length("text"), F.lit(0)).cast("long").alias("text_len"),
        F.lit(float(gap_s)).alias("gap_s"),
        F.lit(flush_ms).cast("long").alias("flush_ms"),
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if flush_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return prepped.groupBy("conv_id").applyInPandasWithState(
        _sessionize,
        SESSION_SCHEMA,
        STATE_SCHEMA,
        "append",
        timeout,
    )
