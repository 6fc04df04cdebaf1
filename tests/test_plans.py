"""Physical-plan assertions — the ".explain and iterate" contract.

Locks in the scan/pushdown/codegen properties the engine's scale story
depends on (SURVEY.md §4): partition pruning + predicate pushdown reach
the parquet scan, rollup aggregation is JVM hash-aggregate inside
whole-stage codegen, and no Python evaluation appears in the rollup hot
path (input_hint: vectorized/JVM only).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_vegindex_spark.config import RollupConfig
from python_vegindex_spark.operators.features import turn_features
from python_vegindex_spark.operators.rollup import rollup
from python_vegindex_spark.sources.bronze import read_turns
from python_vegindex_spark.sources.synth import synth_turns, write_turns


@pytest.fixture(scope="module")
def turns_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "turns")
    write_turns(synth_turns(spark, n_convs=40, seed=3), path)
    return path


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_bronze_scan_prunes_partitions_and_pushes_predicates(spark, turns_path):
    bronze = read_turns(spark, turns_path, "2024-03-01", "2024-09-01")
    plan = _executed_plan(bronze)
    assert "PartitionFilters" in plan and "ts_date" in plan
    assert "PushedFilters" in plan and "GreaterThanOrEqual(ts" in plan


def test_rollup_plan_is_jvm_only_hash_aggregate(spark, turns_path):
    bronze = read_turns(spark, turns_path, "2023-01-01", "2026-01-01")
    gold = rollup(turn_features(bronze), RollupConfig(tier="daily", nmin=2))
    gold.collect()  # materialize THIS plan (AQE finalizes on execution)
    plan = _executed_plan(gold)
    assert "isFinalPlan=true" in plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan
    # whole-stage codegen spans render as "*(n) Operator" in plan strings
    assert "WholeStageCodegen" in plan or "*(" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF", "mapInPandas"):
        assert marker not in plan, f"Python eval in rollup hot path: {marker}"


def test_feature_column_pruning_reaches_scan(spark, turns_path):
    """Selecting only key/ts feature columns must prune text at the scan.

    (The full rollup legitimately reads text on every row — the QC gate
    depends on text-derived dnsum — so pruning is asserted at the
    feature-projection layer.)"""
    bronze = spark.read.parquet(turns_path)
    slim = turn_features(bronze).select("conv_id", "turn_idx", "ts")
    scan_schema = _executed_plan(slim).split("ReadSchema:")[-1].splitlines()[0]
    assert "text" not in scan_schema


def test_gap_fill_is_join_free_single_scan(spark, turns_path):
    """The join-free gap-fill contract: a gap-filled rollup scans its
    input exactly ONCE and contains no join operator at all (empty
    buckets are synthesized from the aggregate output via lag+sequence,
    not a spine rescan + left join)."""
    bronze = spark.read.parquet(turns_path)
    gold = rollup(turn_features(bronze), RollupConfig(tier="weekly", nmin=2))
    n = gold.count()  # force AQE final plan
    assert n > 0
    plan = _executed_plan(gold)
    assert plan.count("Scan parquet") == 1, "gap-fill must not rescan the input"
    for join_marker in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                        "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert join_marker not in plan, f"gap-fill must be join-free ({join_marker})"


def test_ivf_assignment_is_zero_shuffle(spark):
    """The IVF Lloyd-assignment claim: picking each vector's centroid is
    a pure projection (literal codebook argmax), so the assignment plan
    must contain NO Exchange and no Python eval."""
    import pandas as pd
    import numpy as np

    from python_vegindex_spark.operators.similarity import _codebook_assign_expr

    rng = np.random.default_rng(2)
    pdf = pd.DataFrame(
        {
            "id": range(50),
            "vec": [list(map(float, rng.normal(size=8))) for _ in range(50)],
        }
    )
    corpus = spark.createDataFrame(pdf)
    cent_rows = [(i, list(map(float, rng.normal(size=8)))) for i in range(4)]
    assigned = corpus.withColumn(
        "centroid_id", _codebook_assign_expr(cent_rows, "vec")
    )
    plan = _executed_plan(assigned)
    assert "Exchange" not in plan, "IVF assignment must not shuffle"
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan


def test_sessionize_batch_single_shuffle_no_python(spark, turns_path):
    """The batch sessionizer's scale contract: ONE shuffle total — the
    session aggregate's group keys (key, session_idx) are a superset of
    the lag-window's hash partitioning on the key, so Catalyst must not
    insert a second Exchange — and every expression is JVM-side."""
    from python_vegindex_spark.operators.sessionize import sessionize_batch

    bronze = spark.read.parquet(turns_path)
    sessions = sessionize_batch(bronze, gap_s=3600.0, tie_break_cols=("turn_idx",))
    assert sessions.count() > 0  # force AQE final plan
    plan = _executed_plan(sessions)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan


def test_ivf_pandas_assignment_is_zero_shuffle_and_arrow(spark):
    """The large-codebook IVF path (codebook beyond literal_codebook_max
    travels as a pandas-UDF closure) must stay Exchange-free like the
    literal path, and its Python stage must be the Arrow-vectorized
    evaluator (ArrowEvalPython), never row-at-a-time BatchEvalPython."""
    import numpy as np
    import pandas as pd

    from python_vegindex_spark.operators.similarity import codebook_assign

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "id": range(50),
            "vec": [list(map(float, rng.normal(size=8))) for _ in range(50)],
        }
    )
    corpus = spark.createDataFrame(pdf)
    cent_rows = [(i, list(map(float, rng.normal(size=8)))) for i in range(80)]
    assigned = corpus.withColumn(
        "centroid_id", codebook_assign(cent_rows, "vec", literal_codebook_max=64)
    )
    plan = _executed_plan(assigned)
    assert "Exchange" not in plan, "large-codebook IVF assignment must not shuffle"
    assert "ArrowEvalPython" in plan, "expected the vectorized Arrow evaluator"
    assert "BatchEvalPython" not in plan, "row-at-a-time Python eval is forbidden"


def test_asof_bucketed_has_no_global_window(spark):
    """The bucketed as-of scale path must not contain any Window
    operator (its whole point is replacing the per-key window sort with
    a (key, ts-bucket) equi-join + hash aggregate)."""
    import pandas as pd

    from python_vegindex_spark.operators.asof import asof_join_bucketed

    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": [1, 2, 3],
                "k": ["a", "a", "b"],
                "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 11:00", "2024-01-01 10:30"]),
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "b"],
                "ts": pd.to_datetime(["2024-01-01 09:58", "2024-01-01 10:29"]),
                "v": [1.0, 2.0],
            }
        )
    )
    out = asof_join_bucketed(
        left, right, on=["k"], left_keys=["event_id"],
        direction="backward", tolerance_s=600, payload_cols=["v"],
    )
    plan = _optimized_plan(out)
    assert "Window" not in plan, "bucketed as-of must not use window functions"
    assert out.count() == 3


def test_vegindex_summary_plan_is_jvm_only(spark):
    """The flagship generate_gcc_summary plan: hash aggregates, no
    Python eval, no window operators."""
    import datetime as dt

    import numpy as np
    import pandas as pd

    from python_vegindex_spark.operators.vegindex_summary import generate_gcc_summary

    rng = np.random.default_rng(4)
    rows = []
    for d in range(9):
        for i in range(3):
            ts = dt.datetime(2023, 4, 1 + d, 9 + i, 0, 0)
            r, g, b = (float(v) for v in rng.uniform(40, 120, 3))
            rows.append(dict(ts=ts, filename="f.jpg", solar_elev=40.0,
                             awbflag=0, r_mean=r, g_mean=g, b_mean=b,
                             gcc=g / (r + g + b)))
    out = generate_gcc_summary(spark.createDataFrame(pd.DataFrame(rows)), nday=3, nmin=2)
    out.collect()
    plan = _executed_plan(out)
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan
    assert "Window" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF", "mapInPandas"):
        assert marker not in plan, f"Python eval in flagship plan: {marker}"


def test_ndvi_summary_plan_is_jvm_only(spark):
    """The second flagship, generate_ndvi_summary_table (both qc modes):
    hash aggregates, no Python eval, no window operators — the same
    single-shuffle plan family as the gcc flagship."""
    import datetime as dt

    import numpy as np
    import pandas as pd

    from python_vegindex_spark.operators.vegindex_summary import (
        generate_ndvi_summary_table,
    )

    rng = np.random.default_rng(5)
    rows = []
    for d in range(9):
        for i in range(3):
            ts = dt.datetime(2023, 4, 1 + d, 9 + i, 0, 0)
            r, g, b = (float(v) for v in rng.uniform(40, 120, 3))
            rows.append(dict(ts=ts, filename_rgb="f.jpg", filename_ir="i.jpg",
                             solar_elev=40.0, r_mean=r, g_mean=g, b_mean=b,
                             gcc=g / (r + g + b),
                             NDVI_c=float(rng.uniform(-1.2, 1.2))))
    sdf = spark.createDataFrame(pd.DataFrame(rows))
    for mode in ("reference", "conjunctive"):
        out = generate_ndvi_summary_table(sdf, nday=3, nmin=2, qc_mode=mode)
        out.collect()
        plan = _executed_plan(out)
        assert "HashAggregate" in plan or "ObjectHashAggregate" in plan, mode
        assert "Window" not in plan, mode
        for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF", "mapInPandas"):
            assert marker not in plan, f"Python eval in NDVI flagship plan: {marker}"


def test_correlate_plan_jvm_only_single_raw_scan(spark, turns_path):
    """Correlation family: the raw table is scanned ONCE (stage 1's hash
    aggregate); the pairwise stage runs on the small aggregate; the whole
    plan is Python-free."""
    from python_vegindex_spark.operators.correlate import series_correlation

    bronze = read_turns(spark, turns_path, "2023-01-01", "2026-01-01").withColumn(
        "value", F.length("text").cast("double")
    )
    out = series_correlation(bronze, "daily", "role")
    out.collect()
    plan = _executed_plan(out)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF", "FlatMapsInPandas"):
        assert marker not in plan, f"Python eval in correlate plan: {marker}"
    # the raw table is scanned ONCE, at the eager stage-1 checkpoint;
    # the final pairwise plan self-joins the pinned aggregate and never
    # touches the parquet files again
    assert "FileScan parquet" not in plan


def test_asof_interpolate_plan_python_free(spark, turns_path):
    from python_vegindex_spark.operators.asof import asof_join_interpolate

    bronze = read_turns(spark, turns_path, "2023-01-01", "2026-01-01")
    left = bronze.select("conv_id", "ts").limit(500)
    right = bronze.select(
        "conv_id", "ts", F.length("text").cast("double").alias("v")
    )
    out = asof_join_interpolate(left, right, on=["conv_id"], value_col="v")
    out.collect()
    plan = _executed_plan(out)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, f"Python eval in interpolated as-of: {marker}"


def test_ohlc_single_shuffle_no_python(spark, turns_path):
    """OHLC bars: ONE hash-partition Exchange on (series, bucket) —
    the struct min/max open/close picks are aggregates, never a window
    over raw rows — and the plan is Python-free."""
    from python_vegindex_spark.operators.bars import ohlc_bars

    bronze = read_turns(spark, turns_path, "2023-01-01", "2026-01-01").select(
        "conv_id", "ts", "turn_idx", F.length("text").cast("long").alias("v")
    )
    out = ohlc_bars(
        bronze, "daily", ["conv_id"], value_col="v", order_cols=["turn_idx"]
    )
    out.collect()
    plan = _executed_plan(out).split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" not in plan, "open/close must not use a raw-row window"
    # struct min/max buffers force SortAggregate (documented in bars.py)
    # but it still partial-aggregates map-side before the one Exchange
    assert "partial_min" in plan and "partial_max" in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF", "mapInPandas"):
        assert marker not in plan, f"Python eval in OHLC plan: {marker}"


def test_sax_single_raw_scan_no_python(spark, turns_path):
    """SAX symbols: the raw table is scanned and shuffled ONCE (the
    (series, bucket) aggregate); the per-series moments re-aggregate
    the bucket sums, never the raw rows; Python-free."""
    from python_vegindex_spark.operators.sax import sax_symbols

    bronze = read_turns(spark, turns_path, "2023-01-01", "2026-01-01").select(
        "conv_id", "ts", F.length("text").cast("long").alias("v")
    )
    out = sax_symbols(bronze, "daily", ["conv_id"], value_col="v")
    out.collect()
    plan = _executed_plan(out).split("== Initial Plan ==")[0]
    # stage 1 is checkpointed, so the FINAL plan reads the pinned bucket
    # aggregate (ExistingRDD), never the parquet files — the raw table
    # was scanned exactly once, inside the checkpoint itself
    assert "FileScan parquet" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF", "mapInPandas"):
        assert marker not in plan, f"Python eval in SAX plan: {marker}"


def test_robust_family_python_free_single_scan(spark, turns_path):
    """Round-3 session-3 family: trimmed mean / Theil-Sen / decomposition
    plans are pure JVM (no Python eval), and the decomposition touches
    the raw table exactly once (daily aggregate feeds both the trend
    window and the seasonal median)."""
    from python_vegindex_spark.operators.decompose import seasonal_decompose
    from python_vegindex_spark.operators.robust import (
        theilsen_slopes,
        trimmed_mean_rollup,
    )

    bronze = read_turns(spark, turns_path, "2023-01-01", "2026-01-01").withColumn(
        "value", F.length("text").cast("double")
    )
    for df in (
        trimmed_mean_rollup(bronze, "daily", ["role"]),
        theilsen_slopes(bronze.limit(2000), "daily", ["role"]),
        seasonal_decompose(bronze, ["role"]),
    ):
        df.collect()
        plan = _executed_plan(df)
        for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
            assert marker not in plan, f"Python eval in robust family: {marker}"
    dec = seasonal_decompose(bronze, ["role"])
    dec.collect()
    plan = _executed_plan(dec)
    assert plan.count("FileScan parquet") <= 1


def test_chunk_overlap_no_shuffle_no_python(spark, turns_path):
    """Overlap chunking is a narrow per-row explode: no Exchange, no
    Python eval — the plan the 100-TB story needs (chunking must not
    reshuffle the corpus)."""
    from python_vegindex_spark.operators.packing import chunk_overlap

    bronze = read_turns(spark, turns_path, "2023-01-01", "2026-01-01").select(
        F.col("conv_id").alias("doc_id"), "text"
    )
    out = chunk_overlap(bronze, chunk_chars=64, stride=48)
    out.collect()
    plan = _executed_plan(out)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, f"Python eval in chunk_overlap: {marker}"
    assert "Exchange" not in plan, "chunk_overlap must not shuffle"


def test_savgol_and_transition_python_free_single_scan(spark, turns_path):
    """SG smoothing: one raw scan feeding one window stage, no Python;
    transition dates: the pinned smoothed frame means the final plan
    never re-touches parquet."""
    from python_vegindex_spark.operators.decompose import (
        savgol_smooth,
        transition_dates,
    )

    bronze = read_turns(spark, turns_path, "2023-01-01", "2026-01-01").withColumn(
        "value", F.length("text").cast("double")
    )
    sg = savgol_smooth(bronze, ["role"])
    sg.collect()
    plan = _executed_plan(sg)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, f"Python eval in savgol plan: {marker}"
    # count scans in the FINAL plan only (the AQE dump appends an
    # "== Initial Plan ==" section that would double-count)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") <= 1

    td = transition_dates(bronze, ["role"])
    td.collect()
    plan = _executed_plan(td)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, f"Python eval in transition plan: {marker}"
    assert "FileScan parquet" not in plan  # smoothed frame is pinned


def test_chunk_containment_single_hash_join_no_python(spark, turns_path):
    """Containment: the only join is the equi-join on the chunk hash
    (plus broadcast size lookups) — no Python eval, no cartesian."""
    from python_vegindex_spark.operators.packing import chunk_containment

    bronze = read_turns(spark, turns_path, "2023-01-01", "2026-01-01").select(
        F.col("conv_id").alias("doc_id"), "text"
    )
    out = chunk_containment(bronze, chunk_chars=64)
    out.collect()
    plan = _executed_plan(out)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, f"Python eval in containment plan: {marker}"
    assert "CartesianProduct" not in plan


def test_bm25_rank_is_take_ordered_no_global_sort(spark, turns_path):
    """Round-4 scale fix: bm25_search's final rank must be planned as
    TakeOrderedAndProject (per-partition bounded top-k heaps) rather
    than a single-partition row_number window over every matching
    document. The residual rank window runs over only the k survivors
    of the limit."""
    from python_vegindex_spark.operators.terms import bm25_search
    from python_vegindex_spark.plans.lint import assert_no_global_sort

    docs = read_turns(spark, turns_path, "2023-01-01", "2026-01-01").select(
        F.col("conv_id").alias("doc_id"), "text"
    )
    out = bm25_search(docs, ["the", "a", "tool"], k=5)
    out.collect()
    plan = _executed_plan(out)
    assert "TakeOrderedAndProject" in plan
    assert_no_global_sort(out)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan


def test_cosine_topk_rank_is_two_phase_sharded(spark):
    """Round-4 scale fix: the brute-force rank must never sort a
    query's full scored corpus in one task. Stage 1 is a window over
    (query_id, _shard); stage 2 partitions by query_id over bounded
    survivors — no SinglePartition exchange anywhere. Output must be
    bit-identical to the naive single-window rank."""
    import pandas as pd

    from python_vegindex_spark.operators.similarity import cosine_topk

    rng = __import__("random").Random(7)
    vecs = pd.DataFrame(
        {
            "vec_id": [f"v{i:03d}" for i in range(120)],
            "embedding": [
                [rng.uniform(-1, 1) for _ in range(8)] for _ in range(120)
            ],
        }
    )
    corpus = spark.createDataFrame(vecs)
    queries = spark.createDataFrame(vecs.head(4))
    out = cosine_topk(corpus, queries, k=6)
    got = out.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    out.collect()
    plan = _executed_plan(out)
    assert "SinglePartition" not in plan, "per-query full-corpus sort resurfaced"
    assert "_shard" in plan  # stage-1 shard-local window really planned

    # equivalence vs a plain pandas top-k (cos desc, neighbor_id asc)
    import numpy as np

    m = np.array(vecs["embedding"].tolist())
    norms = np.linalg.norm(m, axis=1)
    for qi in range(4):
        cos = np.round(m @ m[qi] / (norms * norms[qi]), 6)
        order = sorted(
            (i for i in range(120) if i != qi),
            key=lambda i: (-cos[i], vecs["vec_id"][i]),
        )[:6]
        sub = got[got.query_id == vecs["vec_id"][qi]]
        assert list(sub.neighbor_id) == [vecs["vec_id"][i] for i in order]
        assert np.allclose(sub.cos_sim.to_numpy(), cos[order])


def test_postings_cosine_skew_join_splits_hot_term(spark):
    """Round-5 (VERDICT stretch): on the SPARSE postings path (vocab
    above the dense-regime cap), a hot term is a hot shuffle key in the
    postings self-join — AQE's skew-join rule must split that partition
    at runtime (`SortMergeJoin(skew=true)` in the final adaptive plan).
    Thresholds are lowered to make a test-sized corpus legible to the
    detector; on production sizes the defaults trigger the same rule.
    Broadcast demotion is disabled because at test scale AQE would
    otherwise (correctly) turn the join into a broadcast join, which
    has no skew problem by construction."""
    import random
    import string

    from python_vegindex_spark.operators.terms import cosine_pairs

    rng = random.Random(3)
    vocab = [f"t{i:03d}" for i in range(400)]  # 400 > dense_vocab_max

    def did(i):  # fat ids so the hot partition exceeds the threshold
        return f"d{i:05d}_" + "".join(rng.choices(string.ascii_letters, k=120))

    docs = spark.createDataFrame(
        [
            (did(i), " ".join(["hot"] + rng.choices(vocab, k=5)))
            for i in range(6000)
        ],
        "doc_id string, text string",
    )
    tuned = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8k",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        out = cosine_pairs(docs, min_cos=0.99)
        out.collect()  # AQE decides from runtime stats: must execute
        plan = _executed_plan(out)
        final = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin(skew=true)" in final, final[:2000]
        # and it is the TERM join that split (the hot-key site), not an
        # unrelated downstream join
        skew_line = next(
            l for l in final.splitlines() if "SortMergeJoin(skew=true)" in l
        )
        assert "term#" in skew_line, skew_line
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
