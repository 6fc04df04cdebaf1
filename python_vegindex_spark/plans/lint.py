"""Plan-quality linting: the engine's executed-plan discipline as a
public API.

The test suite enforces a set of physical-plan invariants on every
hot path (no row-at-a-time Python, no surprise corpus-sized window,
pruned scans, TakeOrdered for global top-k). This module exposes the
same checks for users wiring their OWN queries out of the operator
library — run ``plan_report(df)`` in a notebook or
``assert_jvm_only(df)`` in a deployment smoke test and catch the
10-100x Python-eval or single-partition-sort regressions before they
meet the 100-TB table.

All functions inspect the EXECUTED plan string (after AQE planning),
the same surface the repo's tests assert on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: row-at-a-time or batch Python evaluation nodes — the slow path.
PYTHON_MARKERS = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "PythonUDF",
    "mapInPandas",
    "FlatMapGroupsInPandas",
)

#: markers whose presence is deliberate for Arrow-vectorized operators
#: (codecs, stateful streaming) — pass ``allow_arrow=True`` there.
ARROW_MARKERS = ("ArrowEvalPython", "mapInPandas", "FlatMapGroupsInPandas")


def executed_plan(df: DataFrame) -> str:
    """The executed physical plan string (AQE-finalized if executed)."""
    return df._jdf.queryExecution().executedPlan().toString()


def plan_report(df: DataFrame) -> dict:
    """Structured plan-quality summary.

    Keys: ``python_markers`` (which slow-path nodes appear),
    ``exchanges`` (shuffle count — every one is a full network pass),
    ``generates`` (explode nodes — corpus multiplications),
    ``has_window`` / ``has_codegen`` / ``has_take_ordered`` /
    ``has_broadcast``, and ``plan`` (the raw string, last — for eyes).
    """
    plan = executed_plan(df)
    return {
        "python_markers": [m for m in PYTHON_MARKERS if m in plan],
        "exchanges": plan.count("Exchange"),
        "generates": plan.count("Generate"),
        "has_window": "Window" in plan,
        "has_codegen": "WholeStageCodegen" in plan or "*(" in plan,
        "has_take_ordered": "TakeOrderedAndProject" in plan,
        "has_broadcast": "BroadcastHashJoin" in plan
        or "BroadcastExchange" in plan,
        "plan": plan,
    }


def assert_jvm_only(df: DataFrame, allow_arrow: bool = False) -> None:
    """Raise AssertionError if any Python evaluation node is planned.

    ``allow_arrow=True`` tolerates Arrow-vectorized nodes (pandas UDF /
    mapInPandas) but still rejects row-at-a-time BatchEvalPython — the
    right setting for codec/stateful paths where Python IS the
    operator but must stay batched.
    """
    plan = executed_plan(df)
    allowed = set(ARROW_MARKERS) if allow_arrow else set()
    hits = [m for m in PYTHON_MARKERS if m in plan and m not in allowed]
    assert not hits, f"Python evaluation in plan: {hits}"


def assert_exchange_free(df: DataFrame) -> None:
    """Raise if the plan contains any shuffle (Exchange) node — for
    operators advertised as narrow (chunk_overlap, codebook assign)."""
    plan = executed_plan(df)
    assert "Exchange" not in plan, "unexpected shuffle (Exchange) in plan"


def assert_no_global_sort(df: DataFrame) -> None:
    """Raise on a global Sort that is NOT a TakeOrderedAndProject.

    A global sort is a full range-repartition shuffle of the whole
    result — almost never what a pipeline wants when a bounded top-k
    (TakeOrdered) or a per-partition order (sortWithinPartitions)
    expresses the real requirement."""
    plan = executed_plan(df)
    if "TakeOrderedAndProject" in plan:
        return
    for line in plan.splitlines():
        # physical Sort prints as `Sort [keys...], <global>, <offset>`
        if "Sort [" in line and "], true," in line:
            raise AssertionError(f"global sort in plan: {line.strip()}")
