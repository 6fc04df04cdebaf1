"""Sequence analytics: transition matrix + ordered conversion funnels
(operators/funnel). Driver-query parity: event_transition_matrix /
funnel_conversion oracles in __spark_entry__."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from python_vegindex_spark.operators.funnel import (
    funnel_steps,
    funnel_summary,
    transition_counts,
)

T0 = datetime(2024, 1, 1)


def _ts(seconds: float) -> datetime:
    return T0 + timedelta(seconds=seconds)


def test_transition_counts_pairs_and_edges(spark):
    rows = [
        ("u1", _ts(0), 1, "A"),
        ("u1", _ts(10), 2, "B"),
        ("u1", _ts(20), 3, "A"),
        ("u2", _ts(0), 4, "B"),     # first event: no pair
        ("u2", _ts(5), 5, None),    # NULL state dropped entirely
        ("u2", _ts(9), 6, "B"),
    ]
    df = spark.createDataFrame(rows, ["u", "ts", "eid", "s"])
    out = {
        (r["from_state"], r["to_state"]): r["n"]
        for r in transition_counts(df, ["u"], "s", order_cols=["eid"]).collect()
    }
    assert out == {("A", "B"): 1, ("B", "A"): 1, ("B", "B"): 1}


def test_funnel_earliest_qualifying_and_order(spark):
    rows = [
        # u1: clean A -> B -> C
        ("u1", _ts(0), "A"), ("u1", _ts(10), "B"), ("u1", _ts(20), "C"),
        # u2: B before A doesn't count; the later B does
        ("u2", _ts(0), "B"), ("u2", _ts(10), "A"), ("u2", _ts(30), "B"),
        # u3: never starts (no A) -> absent
        ("u3", _ts(0), "B"), ("u3", _ts(10), "C"),
        # u4: repeated As; earliest A is the anchor, earliest later B wins
        ("u4", _ts(0), "A"), ("u4", _ts(5), "A"),
        ("u4", _ts(7), "B"), ("u4", _ts(9), "B"),
    ]
    df = spark.createDataFrame(rows, ["u", "ts", "s"])
    out = {r["u"]: r for r in funnel_steps(df, ["u"], "s", ["A", "B", "C"]).collect()}
    assert set(out) == {"u1", "u2", "u4"}
    us = lambda sec: int(_ts(sec).timestamp() * 1_000_000)
    assert (out["u1"]["t1"], out["u1"]["t2"], out["u1"]["t3"]) == (
        us(0), us(10), us(20)
    )
    assert (out["u2"]["t2"], out["u2"]["t3"]) == (us(30), None)
    assert (out["u4"]["t1"], out["u4"]["t2"]) == (us(0), us(7))


def test_funnel_max_gap_and_validation(spark):
    rows = [
        ("u1", _ts(0), "A"), ("u1", _ts(100), "B"),   # gap 100 s
        ("u2", _ts(0), "A"), ("u2", _ts(10), "B"),
    ]
    df = spark.createDataFrame(rows, ["u", "ts", "s"])
    out = {
        r["u"]: r["t2"]
        for r in funnel_steps(df, ["u"], "s", ["A", "B"], max_gap_s=30).collect()
    }
    assert out["u1"] is None and out["u2"] is not None
    with pytest.raises(ValueError, match="steps"):
        funnel_steps(df, ["u"], "s", ["A"])
    with pytest.raises(ValueError, match="max_gap_s"):
        funnel_steps(df, ["u"], "s", ["A", "B"], max_gap_s=0)


def test_funnel_summary_counts(spark):
    rows = [
        ("u1", _ts(0), "A"), ("u1", _ts(1), "B"),
        ("u2", _ts(0), "A"),
    ]
    df = spark.createDataFrame(rows, ["u", "ts", "s"])
    f = funnel_steps(df, ["u"], "s", ["A", "B"])
    out = {r["step"]: r["n_reached"] for r in funnel_summary(f, 2).collect()}
    assert out == {1: 2, 2: 1}


def test_funnel_and_transitions_plans_jvm_only(spark):
    rows = [("u%d" % (i % 20), _ts(i * 3), "e%d" % (i % 3)) for i in range(300)]
    df = spark.createDataFrame(rows, ["u", "ts", "s"])
    for op in (
        transition_counts(df, ["u"], "s"),
        funnel_steps(df, ["u"], "s", ["e0", "e1", "e2"]),
    ):
        p = op._jdf.queryExecution().executedPlan().toString()
        for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
            assert marker not in p


def test_cohort_retention_matrix(spark):
    from python_vegindex_spark.operators.funnel import cohort_retention

    day = 86400
    # 2024-01-04 is epoch day 19726 = 7 * 2818: an epoch-anchored
    # 7-day period boundary, so the hand-offsets below are exact
    b = datetime(2024, 1, 4)
    t = lambda sec: b + timedelta(seconds=sec)
    rows = [
        # u1: first period 0, active periods 0, 1, 3
        ("u1", t(0)), ("u1", t(2 * day)),          # period 0 twice
        ("u1", t(8 * day)), ("u1", t(22 * day)),
        # u2: only period 0
        ("u2", t(3 * day)),
        # u3: first period 1, active 1 and 3
        ("u3", t(9 * day)), ("u3", t(23 * day)),
    ]
    df = spark.createDataFrame(rows, ["u", "ts"])
    out = {
        (r["cohort_start"], r["offset"]): r["n_active"]
        for r in cohort_retention(df, ["u"], period_s=7 * day).collect()
    }
    starts = sorted({c for c, _ in out})
    c0, c1 = starts[0], starts[1]
    assert out[(c0, 0)] == 2          # cohort size
    assert out[(c0, 1)] == 1 and out[(c0, 3)] == 1
    assert out[(c1, 0)] == 1 and out[(c1, 2)] == 1
    assert (c0, 2) not in out
    # max_offset truncation
    trunc = cohort_retention(df, ["u"], period_s=7 * day, max_offset=1)
    assert max(r["offset"] for r in trunc.collect()) <= 1
    with pytest.raises(ValueError, match="period_s"):
        cohort_retention(df, ["u"], period_s=0)
    with pytest.raises(ValueError, match="max_offset"):
        cohort_retention(df, ["u"], max_offset=-1)


def test_sequence_ops_on_transcript_payload(spark):
    """The same operators drive role/tool flow analysis on the turns
    table (the transcript payload): every conv contributes exactly
    turns-1 adjacent role pairs."""
    from python_vegindex_spark.operators.funnel import transition_counts
    from python_vegindex_spark.sources.synth import synth_turns

    turns = synth_turns(spark, n_convs=40, seed=5)
    n_turns = turns.count()
    n_convs = turns.select("conv_id").distinct().count()
    pairs = transition_counts(
        turns, ["conv_id"], "role", order_cols=["turn_idx"]
    )
    assert pairs.agg(F.sum("n")).collect()[0][0] == n_turns - n_convs
    roles = {r["from_state"] for r in pairs.collect()} | {
        r["to_state"] for r in pairs.collect()
    }
    assert roles <= {"user", "assistant", "tool", "system"}


def test_funnel_timing_stats(spark):
    from python_vegindex_spark.operators.funnel import funnel_steps, funnel_timing

    rows = [
        ("u1", _ts(0), "A"), ("u1", _ts(10), "B"),
        ("u2", _ts(0), "A"), ("u2", _ts(30), "B"),
        ("u3", _ts(0), "A"),  # stalls: excluded from timing
    ]
    df = spark.createDataFrame(rows, ["u", "ts", "s"])
    f = funnel_steps(df, ["u"], "s", ["A", "B"])
    [r] = funnel_timing(f, 2).collect()
    assert r["step"] == 2 and r["n_converted"] == 2
    assert r["median_s"] == pytest.approx(20.0)  # interpolated between 10, 30
    assert r["p90_s"] == pytest.approx(28.0)     # type-7 at h=0.9
    with pytest.raises(ValueError, match="steps"):
        funnel_timing(f, 1)


def test_cohort_plan_jvm_only(spark):
    from python_vegindex_spark.operators.funnel import cohort_retention

    rows = [("u%d" % (i % 30), _ts(i * 9000)) for i in range(400)]
    df = spark.createDataFrame(rows, ["u", "ts"])
    p = cohort_retention(df, ["u"])._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in p


def test_sequence_ngrams_hand_case(spark):
    from python_vegindex_spark.operators.funnel import sequence_ngrams

    rows = [
        ("u1", _ts(0), 1, "A"),
        ("u1", _ts(10), 2, "B"),
        ("u1", _ts(20), 3, "A"),
        ("u1", _ts(30), 4, "B"),
        ("u2", _ts(0), 5, "A"),
        ("u2", _ts(10), 6, "B"),
        ("u2", _ts(20), 7, "A"),
        ("u3", _ts(0), 8, "C"),       # too short for any trigram
        ("u3", _ts(5), 9, None),      # NULL state dropped pre-window
        ("u3", _ts(10), 10, "C"),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long, state string"
    )
    got = {
        r.gram: (r.n_occurrences, r.n_seqs)
        for r in sequence_ngrams(
            df, ["user_id"], "state", n=3, order_cols=["event_id"]
        ).collect()
    }
    # u1: A>B>A, B>A>B; u2: A>B>A -> support 2 sequences for A>B>A
    assert got == {"A>B>A": (2, 2), "B>A>B": (1, 1)}

    # min_support prunes the singleton gram
    kept = sequence_ngrams(
        df, ["user_id"], "state", n=3, order_cols=["event_id"], min_support=2
    ).collect()
    assert [(r.gram, r.n_occurrences) for r in kept] == [("A>B>A", 2)]


def test_sequence_ngrams_n2_matches_transition_counts(spark):
    from python_vegindex_spark.operators.funnel import sequence_ngrams

    rows = [
        ("u1", _ts(0), 1, "A"),
        ("u1", _ts(10), 2, "B"),
        ("u1", _ts(20), 3, "A"),
        ("u2", _ts(0), 4, "B"),
        ("u2", _ts(10), 5, "B"),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long, state string"
    )
    bigrams = {
        r.gram: r.n_occurrences
        for r in sequence_ngrams(
            df, ["user_id"], "state", n=2, order_cols=["event_id"]
        ).collect()
    }
    pairs = {
        f"{r.from_state}>{r.to_state}": r.n
        for r in transition_counts(
            df, ["user_id"], "state", order_cols=["event_id"]
        ).collect()
    }
    assert bigrams == pairs == {"A>B": 1, "B>A": 1, "B>B": 1}


def test_sequence_ngrams_validation(spark):
    from python_vegindex_spark.operators.funnel import sequence_ngrams

    df = spark.createDataFrame(
        [("u1", _ts(0), 1, "A")],
        "user_id string, ts timestamp, event_id long, state string",
    )
    with pytest.raises(ValueError, match="n must"):
        sequence_ngrams(df, ["user_id"], "state", n=1)
    with pytest.raises(ValueError, match="min_support"):
        sequence_ngrams(df, ["user_id"], "state", min_support=0)
