"""Round-5 calibration run for cosine_pairs' dense_cost_ratio gate.

Measures, on this engine/host, the two per-unit costs the gate
compares (terms.py cosine_pairs):

* dense regime: seconds per vector element-op — total ops are
  docs^2 * vocab (the broadcast-NLJ streams docs^2/2 ordered pairs,
  each doing a |vocab|-element interpreted zip_with+aggregate);
* postings regime: seconds per shuffle candidate — total candidates
  are sum_t df(t)^2 (each surviving term t expands to df^2/2 join
  rows through the exchange + hash aggregate).

The implied ratio (postings per-candidate cost / dense per-element
cost) justifies the dense_cost_ratio default: dense should be chosen
whenever docs^2*vocab <= ratio * sum(df^2). Results land in
BENCH.md §1p. Usage:

    python scripts/measure_dense_cosine.py [n_docs ...]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from python_vegindex_spark.session import get_spark  # noqa: E402
from python_vegindex_spark.operators.terms import cosine_pairs  # noqa: E402

VOCAB = 31  # round-4's catastrophic shape: tiny dense vocabulary


def corpus(spark, n_docs: int):
    rng = random.Random(11)
    words = [f"w{i:02d}" for i in range(VOCAB)]
    rows = [
        (f"d{i:06d}", " ".join(rng.choices(words, k=rng.randint(10, 40))))
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1000, 2000, 4000]
    spark = get_spark("dense-cosine-calib", master="local[32]")
    out = []
    for n in sizes:
        docs = corpus(spark, n).localCheckpoint(eager=True)
        # exact df profile for the cost-model denominators
        tf = (
            docs.select(
                F.col("doc_id").alias("id"),
                F.explode(
                    F.split(F.lower(F.trim(F.col("text"))), r"\s+")
                ).alias("term"),
            )
            .groupBy("id", "term")
            .count()
        )
        sum_df2 = (
            tf.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
            .agg(F.sum(F.col("df") * F.col("df")))
            .collect()[0][0]
        )
        timings = {}
        for label, kwargs in (
            ("dense", dict(dense_vocab_max=256, dense_cost_ratio=1e18)),
            ("postings", dict(dense_vocab_max=0)),
        ):
            t0 = time.monotonic()
            cnt = cosine_pairs(docs, min_cos=0.9, **kwargs).count()
            timings[label] = round(time.monotonic() - t0, 3)
        dense_ops = n * n * VOCAB
        rec = {
            "n_docs": n,
            "sum_df2": int(sum_df2),
            "dense_ops": dense_ops,
            "t_dense_s": timings["dense"],
            "t_postings_s": timings["postings"],
            "pairs_per_sec_dense": round((n * n / 2) / timings["dense"]),
            "dense_elem_ops_per_sec": round(dense_ops / timings["dense"]),
            "postings_candidates_per_sec": round(
                sum_df2 / timings["postings"]
            ),
            "implied_cost_ratio": round(
                (timings["postings"] / sum_df2)
                / (timings["dense"] / dense_ops),
                2,
            ),
            "result_pairs": cnt,
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"runs": out}))


if __name__ == "__main__":
    main()
