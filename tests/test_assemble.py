"""Conversation assembly (operators/assemble): the transcripts ->
corpus bridge, pinned to the per-turn text-equality invariant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_vegindex_spark.operators.assemble import assemble_conversations
from python_vegindex_spark.sources.synth import synth_turns

ROWS = [
    # deliberately out of order: assembly must sort by turn_idx
    ("c1", 2, "user", "third", None, "2024-01-01 00:02:00"),
    ("c1", 0, "user", "first", None, "2024-01-01 00:00:00"),
    ("c1", 1, "assistant", "second\nwith newline", "search", "2024-01-01 00:01:00"),
    ("c2", 0, "user", None, None, "2024-01-01 00:00:00"),   # NULL text
    ("c2", 1, None, "reply", None, "2024-01-01 00:01:00"),  # NULL role
    (None, 0, "user", "orphan", None, "2024-01-01 00:00:00"),  # dropped
]


@pytest.fixture(scope="module")
def turns(spark):
    return spark.createDataFrame(
        ROWS,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_assemble_stable_order_and_nulls(turns):
    got = {
        r.conv_id: r
        for r in assemble_conversations(turns).collect()
    }
    assert set(got) == {"c1", "c2"}  # NULL conv dropped
    c1 = got["c1"]
    assert c1.text == "user: first\nassistant: second\nwith newline\nuser: third"
    assert (c1.n_turns, c1.n_chars) == (3, len(c1.text))
    # NULL role/text render empty, never NULL-ing the document
    assert got["c2"].text == "user: \n: reply"


def test_assemble_max_turns_truncates_sorted_prefix(turns):
    got = {
        r.conv_id: r
        for r in assemble_conversations(turns, max_turns=2).collect()
    }
    # truncation happens AFTER the sort: keeps turns 0 and 1
    assert got["c1"].text == "user: first\nassistant: second\nwith newline"
    assert got["c1"].n_turns == 2
    with pytest.raises(ValueError, match="max_turns"):
        assemble_conversations(turns, max_turns=0)
    with pytest.raises(ValueError, match="order_cols"):
        assemble_conversations(turns, order_cols=())


def test_assemble_synth_per_turn_equality(spark):
    """Composition with the real transcript shape: every turn of every
    synth conversation appears byte-identically, in (conv_id,
    turn_idx) order — the driver contract's per-row invariant."""
    src = synth_turns(spark, n_convs=20, seed=3).select(
        "conv_id", "turn_idx", "role", "text"
    )
    expected: dict[str, list[tuple[int, str, str]]] = {}
    for r in src.collect():
        expected.setdefault(r.conv_id, []).append(
            (r.turn_idx, r.role or "", r.text or "")
        )
    docs = {
        r.conv_id: r.text
        for r in assemble_conversations(src).collect()
    }
    assert set(docs) == set(expected)
    for conv, turns_ in expected.items():
        want = "\n".join(f"{role}: {text}" for _, role, text in sorted(turns_))
        assert docs[conv] == want, f"mismatch in {conv}"


def test_assemble_plan_python_and_window_free(turns):
    out = assemble_conversations(turns)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF",
                   "mapInPandas", "Window"):
        assert marker not in plan, f"{marker} in assembly plan"


def test_assemble_max_buffer_turns_filters_before_aggregate(spark, turns):
    """Round-4: max_buffer_turns must bound the collect_list buffer by
    filtering upstream of the aggregate — a pathological long
    conversation is truncated pre-aggregate, not buffered."""
    # a 10^6-turn conversation: build lazily via range, never collected raw
    big = (
        spark.range(1_000_000)
        .select(
            F.lit("huge").alias("conv_id"),
            F.col("id").cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.lit("x").alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
        )
    )
    out = assemble_conversations(big, max_turns=3, max_buffer_turns=3)
    # the pre-filter must reach the plan BELOW the aggregate
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Filter" in plan and "turn_idx" in plan
    row = out.collect()[0]
    assert row["n_turns"] == 3 and row["text"] == "user: x\nuser: x\nuser: x"

    # semantics vs plain max_turns are identical when buffer >= output
    a = {
        (r["conv_id"], r["text"], r["n_turns"])
        for r in assemble_conversations(turns, max_turns=2).collect()
    }
    b = {
        (r["conv_id"], r["text"], r["n_turns"])
        for r in assemble_conversations(
            turns, max_turns=2, max_buffer_turns=50
        ).collect()
    }
    assert a == b

    with pytest.raises(ValueError, match="max_buffer_turns"):
        assemble_conversations(turns, max_turns=5, max_buffer_turns=2)
    with pytest.raises(ValueError, match="max_buffer_turns"):
        assemble_conversations(turns, max_buffer_turns=0)


def test_assemble_max_turns_alone_bounds_buffer(spark, turns):
    """Round-5 (VERDICT): the safe path is the default — max_turns=N on
    an integer turn index bounds the aggregation buffer itself (the
    pre-aggregate filter appears without opting into max_buffer_turns),
    and an explicit max_buffer_turns=None opts back out."""
    big = (
        spark.range(1_000_000)
        .select(
            F.lit("huge").alias("conv_id"),
            F.col("id").cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.lit("x").alias("text"),
        )
    )
    out = assemble_conversations(big, max_turns=3)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Filter" in plan and "turn_idx" in plan
    row = out.collect()[0]
    assert row["n_turns"] == 3 and row["text"] == "user: x\nuser: x\nuser: x"

    # explicit None = the old unbounded-buffer behavior (no pre-filter)
    unbounded = assemble_conversations(turns, max_turns=2,
                                       max_buffer_turns=None)
    uplan = unbounded._jdf.queryExecution().optimizedPlan().toString()
    assert " < 2" not in uplan

    # a non-integer first order column never auto-bounds: ts < 2 would
    # be a meaningless cross-type comparison
    by_ts = assemble_conversations(
        turns, order_cols=("ts", "turn_idx"), max_turns=2
    )
    tplan = by_ts._jdf.queryExecution().optimizedPlan().toString()
    assert " < 2" not in tplan
    got = {r.conv_id: r for r in by_ts.collect()}
    assert got["c1"].n_turns == 2
    assert got["c1"].text == "user: first\nassistant: second\nwith newline"


def test_assemble_buffer_bound_keeps_null_order_rows(spark):
    """Round-5 (ADVICE): rows whose first order column is NULL must
    survive the buffer bound (NULL < N would silently drop them) —
    the bounded and unbounded paths agree on NULL-indexed turns."""
    rows = [
        ("c1", 0, "user", "a"),
        ("c1", None, "user", "lost?"),   # NULL turn_idx
        ("c2", None, "user", "only-null"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )

    def norm(out):
        return sorted(
            (r.conv_id, r.text, r.n_turns) for r in out.collect()
        )

    bounded = norm(assemble_conversations(df, max_buffer_turns=10))
    unbounded = norm(assemble_conversations(df))
    assert bounded == unbounded
    # array_sort orders the NULL-indexed struct before non-NULL turns
    # (ascending NULLS FIRST, Spark's default ordering)
    assert ("c1", "user: lost?\nuser: a", 2) in bounded
    assert ("c2", "user: only-null", 1) in bounded


def test_assemble_auto_bound_only_for_turn_idx_contract_column(spark):
    """Round-5 self-review: the auto buffer bound is prefix-equivalent
    ONLY for the dense 0-based turn_idx contract — an arbitrary integer
    order column (1-based, gapped, global ids) must NOT auto-bound, or
    conversations could silently lose turns."""
    rows = [("c1", 1, "user", "a"), ("c1", 2, "user", "b"),
            ("c1", 3, "user", "c")]
    df = spark.createDataFrame(
        rows, "conv_id string, seq int, role string, text string"
    )
    out = assemble_conversations(df, order_cols=("seq",), max_turns=3)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert " < 3" not in plan  # no auto pre-filter on a non-contract col
    got = out.collect()[0]
    # all three 1-based turns survive (the auto filter would drop seq=3)
    assert got["n_turns"] == 3 and got["text"].endswith("user: c")

    # same data under the contract NAME but 1-based indices: the caller
    # broke the documented contract, and the docstring says so — pin
    # that the bound applies (regression guard on the gate condition)
    df2 = df.withColumnRenamed("seq", "turn_idx")
    out2 = assemble_conversations(df2, max_turns=3)
    plan2 = out2._jdf.queryExecution().optimizedPlan().toString()
    assert " < 3" in plan2
