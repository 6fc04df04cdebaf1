"""streaming_cascade_moments: chained windowed aggregations ≡ batch cascade.

The coarse streaming output (window-of-window re-aggregation) must
equal the batch rollup_moments at the coarse tier over the CLOSED
buckets the stream emitted; the fine output likewise per fine bucket.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_vegindex_spark.operators.cascade import rollup_moments
from python_vegindex_spark.sources.synth import synth_turns, write_turns
from python_vegindex_spark.streaming.structured import (
    run_available_now,
    streaming_cascade_moments,
)


def _collect_stream(spark, df, tmp_path, name):
    out = str(tmp_path / f"out_{name}")
    run_available_now(df, str(tmp_path / f"ck_{name}"), out)
    return spark.read.parquet(out)


def test_streaming_cascade_equals_batch(spark, tmp_path):
    turns = synth_turns(spark, n_convs=20, seed=17, span_days=10)
    src = str(tmp_path / "bronze")
    write_turns(turns, src)

    fine_df, coarse_df = streaming_cascade_moments(
        spark, src, fine="15min", coarse="hourly", watermark="1 hour"
    )
    fine = _collect_stream(spark, fine_df, tmp_path, "fine")
    coarse = _collect_stream(spark, coarse_df, tmp_path, "coarse")
    assert fine.count() > 0 and coarse.count() > 0

    ev = turns.select(
        "conv_id", "ts", F.expr("CAST(length(text) AS BIGINT)").alias("v")
    )
    batch_fine = rollup_moments(ev, "15min", ["conv_id"], value_col="v")
    batch_coarse = rollup_moments(ev, "hourly", ["conv_id"], value_col="v")

    # append mode withholds buckets the watermark never closed — compare
    # on the emitted set, and require it to be almost everything
    for got, exp, name in (
        (fine, batch_fine, "fine"),
        (coarse, batch_coarse, "coarse"),
    ):
        g = {tuple(r) for r in got.collect()}
        e = {tuple(r) for r in exp.collect()}
        assert g <= e, f"{name}: streaming emitted a bucket batch disagrees with"
        missing = len(e) - len(g)
        assert missing <= len(e) * 0.05 + 2, (
            f"{name}: too many unclosed buckets withheld ({missing}/{len(e)})"
        )


def test_streaming_cascade_rejects_non_nesting(spark, tmp_path):
    with pytest.raises(ValueError, match="nest"):
        streaming_cascade_moments(
            spark, str(tmp_path), fine="hourly", coarse="90min"
        )
    with pytest.raises(ValueError, match="batch-only|nest|streaming tiers"):
        streaming_cascade_moments(
            spark, str(tmp_path), fine="daily", coarse="weekly"
        )
