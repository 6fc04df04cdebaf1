"""applyInPandasWithState sessionization: correctness + restart resume.

Oracle = pandas sessionization over the full turn set; the streaming
operator must emit exactly the CLOSED sessions (every session except
each conv's open tail), including sessions whose turns span two separate
``availableNow`` runs sharing one checkpoint (state resume).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from python_vegindex_spark.streaming.stateful import (
    SESSION_SCHEMA,
    sessionize_stream,
)

GAP_S = 600.0  # 10 min session gap

T0 = dt.datetime(2024, 3, 1, 8, 0, 0)


def _mk_turns(spec):
    """spec: list of (conv_id, offset_minutes, text)."""
    return pd.DataFrame(
        {
            "conv_id": [s[0] for s in spec],
            "ts": [T0 + dt.timedelta(minutes=s[1]) for s in spec],
            "text": [s[2] for s in spec],
        }
    )


BATCH1 = _mk_turns(
    [
        ("a", 0, "hello"),       # a session 1
        ("a", 2, "world!"),      # a session 1
        ("a", 30, "back again"), # a session 2 (gap 28 min)
        ("b", 1, "hi"),          # b session 1
        ("b", 5, "there"),       # b session 1
    ]
)
BATCH2 = _mk_turns(
    [
        ("a", 33, "still here"),   # extends a session 2 ACROSS the restart
        ("a", 90, "new session"),  # closes a session 2, opens a session 3
        ("b", 50, "later"),        # closes b session 1, opens b session 2
        ("c", 0, "solo"),          # c session 1 (stays open, never emitted)
    ]
)


def _oracle_closed_sessions(pdf: pd.DataFrame) -> set[tuple]:
    out = []
    for conv, g in pdf.sort_values("ts").groupby("conv_id"):
        cur = []
        last = None
        for r in g.itertuples():
            if last is not None and (r.ts - last).total_seconds() > GAP_S:
                out.append((conv, cur))
                cur = []
            cur.append(r)
            last = r.ts
        # cur = open tail session: NOT emitted
    return {
        (
            conv,
            rows[0].ts,
            rows[-1].ts,
            len(rows),
            sum(len(r.text) for r in rows),
        )
        for conv, rows in out
    }


@pytest.fixture()
def dirs(tmp_path):
    return {
        "in": str(tmp_path / "turns_in"),
        "out": str(tmp_path / "sessions_out"),
        "ck": str(tmp_path / "ck"),
    }


def _run_available_now(spark, dirs):
    stream = (
        spark.readStream.schema("conv_id string, ts timestamp, text string")
        .parquet(dirs["in"])
    )
    sessions = sessionize_stream(stream, gap_s=GAP_S)
    q = (
        sessions.writeStream.format("parquet")
        .option("path", dirs["out"])
        .option("checkpointLocation", dirs["ck"])
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_sessionization_matches_oracle_across_restart(spark, dirs):
    spark.createDataFrame(BATCH1).write.mode("append").parquet(dirs["in"])
    _run_available_now(spark, dirs)

    spark.createDataFrame(BATCH2).write.mode("append").parquet(dirs["in"])
    _run_available_now(spark, dirs)  # same checkpoint -> resumes state

    got_df = spark.read.schema(SESSION_SCHEMA).parquet(dirs["out"]).toPandas()
    got = {
        (r.conv_id, r.session_start.to_pydatetime(), r.session_end.to_pydatetime(),
         r.n_turns, r.text_len_sum)
        for r in got_df.itertuples()
    }
    want = _oracle_closed_sessions(pd.concat([BATCH1, BATCH2]))
    assert got == want
    # the cross-restart session: a's session 2 spans both batches
    spans = [g for g in got if g[0] == "a" and g[3] == 2 and g[1] == T0 + dt.timedelta(minutes=30)]
    assert spans, "session spanning the restart was not stitched from state"


# ---------------------------------------------------------------------------
# flush path: ProcessingTimeTimeout emits the quiet tail session


class _FakeState:
    """Minimal GroupState double for driving _sessionize directly."""

    def __init__(self, state_tuple=None, timed_out=False):
        self._s = state_tuple
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._s is not None

    @property
    def get(self):
        return self._s

    def update(self, s):
        self._s = s

    def remove(self):
        self._s, self.removed = None, True

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def test_flush_timeout_emits_open_tail():
    from python_vegindex_spark.streaming.stateful import _sessionize

    start_us = int(pd.Timestamp(T0).value // 1000)
    last_us = start_us + 120_000_000
    st = _FakeState(state_tuple=(start_us, last_us, 4, 77), timed_out=True)
    out = list(_sessionize(("conv-x",), iter([]), st))
    assert st.removed
    assert len(out) == 1
    row = out[0].iloc[0]
    assert row["conv_id"] == "conv-x"
    assert row["n_turns"] == 4
    assert row["text_len_sum"] == 77
    assert pd.Timestamp(row["session_start"]).value // 1000 == start_us
    assert pd.Timestamp(row["session_end"]).value // 1000 == last_us


def test_flush_timeout_without_state_emits_nothing():
    from python_vegindex_spark.streaming.stateful import _sessionize

    st = _FakeState(state_tuple=None, timed_out=True)
    out = list(_sessionize(("conv-y",), iter([]), st))
    assert out == [] and st.removed


def test_open_tail_sets_timeout_when_flush_enabled():
    from python_vegindex_spark.streaming.stateful import _sessionize

    pdf = _mk_turns([("c", 0, "hi"), ("c", 1, "there")])
    pdf["text_len"] = pdf["text"].str.len().astype("int64")
    pdf["gap_s"] = GAP_S
    pdf["flush_ms"] = 30_000
    st = _FakeState()
    out = list(_sessionize(("c",), iter([pdf]), st))
    assert out == []  # only an open tail, nothing closed
    assert st.exists and st.timeout_ms == 30_000


# ---------------------------------------------------------------------------
# batch twin: sessionize_batch over the same input


def test_batch_twin_matches_streaming_closed_sessions(spark, dirs):
    """sessionize_batch is the batch twin of the streaming operator: its
    output minus each conv's tail session (the one the stream holds open
    in state) equals the streamed emitted set exactly."""
    from python_vegindex_spark.operators.sessionize import sessionize_batch

    all_turns = pd.concat([BATCH1, BATCH2], ignore_index=True)
    spark.createDataFrame(all_turns).write.mode("append").parquet(dirs["in"])
    _run_available_now(spark, dirs)
    streamed_df = spark.read.schema(SESSION_SCHEMA).parquet(dirs["out"]).toPandas()
    streamed = {
        (r.conv_id, r.session_start.to_pydatetime(), r.session_end.to_pydatetime(),
         r.n_turns, r.text_len_sum)
        for r in streamed_df.itertuples()
    }

    batch = sessionize_batch(
        spark.createDataFrame(all_turns), gap_s=GAP_S
    ).toPandas()
    tail_idx = batch.groupby("conv_id")["session_idx"].transform("max")
    closed = batch[batch["session_idx"] < tail_idx]
    got = {
        (r.conv_id, r.session_start.to_pydatetime(), r.session_end.to_pydatetime(),
         r.n_turns, r.weight_sum)
        for r in closed.itertuples()
    }
    assert got == streamed
    # exactly one open tail per conv beyond the closed set
    assert len(batch) == len(closed) + batch["conv_id"].nunique()


def test_batch_gap_boundary_is_strict(spark):
    """A gap of exactly gap_s stays in the same session; one microsecond
    more starts a new one (integer-microsecond math, no float drift)."""
    from python_vegindex_spark.operators.sessionize import sessionize_batch

    rows = pd.DataFrame(
        {
            "conv_id": ["e", "e", "e"],
            "ts": [
                T0,
                T0 + dt.timedelta(seconds=GAP_S),  # exactly gap_s: same session
                T0 + dt.timedelta(seconds=2 * GAP_S, microseconds=1),  # +1us: new
            ],
            "text": ["a", "bb", "ccc"],
        }
    )
    out = (
        sessionize_batch(spark.createDataFrame(rows), gap_s=GAP_S)
        .orderBy("session_idx")
        .toPandas()
    )
    assert list(out["n_turns"]) == [2, 1]
    assert list(out["weight_sum"]) == [3, 3]


def test_gap_threshold_rounds_not_truncates():
    """gap_s=1.001: int(1.001*1e6) truncates to 1000999 and would SPLIT
    two turns exactly 1.001s apart; the batch twin rounds — the stream
    must agree at the exact-gap boundary."""
    from python_vegindex_spark.streaming.stateful import _sessionize

    pdf = _mk_turns([("g", 0.0, "a")])
    pdf = pd.concat(
        [pdf, _mk_turns([("g", 1.001 / 60.0, "b")])], ignore_index=True
    )
    pdf["text_len"] = pdf["text"].str.len().astype("int64")
    pdf["gap_s"] = 1.001
    pdf["flush_ms"] = 0
    st = _FakeState()
    out = list(_sessionize(("g",), iter([pdf]), st))
    assert out == []  # one OPEN session: the pair was NOT split
    assert st.exists and st.get[2] == 2  # n_turns in state


def test_null_text_counts_as_zero_length(spark, dirs):
    """A NULL text must contribute 0 to text_len_sum (end to end through
    sessionize_stream's coalesce), not the INT64_MIN garbage numpy
    produces casting NaN to int64."""
    pdf = pd.DataFrame(
        {
            "conv_id": ["m", "m", "m"],
            "ts": [T0, T0 + dt.timedelta(minutes=1), T0 + dt.timedelta(minutes=30)],
            "text": ["abc", None, "z"],
        }
    )
    spark.createDataFrame(
        pdf, "conv_id string, ts timestamp, text string"
    ).write.mode("append").parquet(dirs["in"])
    _run_available_now(spark, dirs)
    got = spark.read.schema(SESSION_SCHEMA).parquet(dirs["out"]).collect()
    assert len(got) == 1  # the 30-min gap closed one session
    assert got[0]["n_turns"] == 2
    assert got[0]["text_len_sum"] == 3  # 3 + 0 for the NULL text
