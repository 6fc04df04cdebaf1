"""Source-mixture resampling: the largest exactly-proportioned corpus.

Training-data pipelines rarely ship a corpus at its natural source mix —
they target stated proportions (e.g. 50 % web / 30 % code / 20 % papers,
the Pile/LLaMA-style mixture tables). Given per-source target weights,
this operator downsamples each source deterministically so the output
hits the target mixture at the LARGEST feasible total size: the
binding source (the one whose natural share is furthest below its
target) is kept whole, every other source is thinned to match.

Math (:func:`mixture_fractions`): with counts ``n_s`` and weights
``w_s`` (only ``w_s > 0`` participate), the feasible total is
``t = min_s(n_s / w_s)`` and the per-source keep fraction is
``f_s = w_s * t / n_s`` (1.0 for the binding source, 0.0 for sources
without a positive weight). The expression ORDER is part of the
contract — the DuckDB oracle evaluates the identical op sequence, so
the fractions (and thus the exact surviving row set) are bit-equal
across engines.

Row selection reuses :mod:`operators.sampling`'s content-keyed hash
Bernoulli filter: reproducible across runs / retries / engines, nested
across fractions, all-or-nothing per key, zero shuffle. The only
non-scan work is the per-source count — an aggregate whose output is
one row per source (tiny by construction), collected to the driver to
build the CASE thresholds, exactly like the IVF codebook collect.

Not in the reference (no sampling there) — part of the training-data
operator family.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import stratified_hash_sample


def mixture_fractions(
    counts: dict[str, int], weights: dict[str, float]
) -> dict[str, float]:
    """Per-source keep fractions for the largest exact mixture.

    Sources absent from ``weights`` (or weighted <= 0, or empty) get
    0.0. The float op order (``n / w`` then ``min`` then ``w * t / n``)
    is pinned — the SQL oracle mirrors it term for term."""
    active = {
        s: w
        for s, w in weights.items()
        if w > 0.0 and counts.get(s, 0) > 0
    }
    if not active:
        return {s: 0.0 for s in counts}
    t = min(counts[s] / w for s, w in active.items())
    return {
        s: (active[s] * t / counts[s]) if s in active else 0.0
        for s in counts
    }


def mixture_resample(
    docs: DataFrame,
    weights: dict[str, float],
    strata_col: str = "source",
    key_cols: Sequence[str] = ("doc_id",),
    salt: str = "mix",
) -> DataFrame:
    """Deterministically thin ``docs`` to the target source mixture.

    Two passes: (1) per-source counts (one aggregate, rows = number of
    sources — collected driver-side like any dimension-sized scalar);
    (2) one scan-level stratified hash filter. Rows from sources not in
    ``weights`` are dropped."""
    counts = {
        r[0]: r[1]
        for r in docs.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    fracs = mixture_fractions(counts, weights)
    return stratified_hash_sample(
        docs, strata_col, fracs, key_cols, salt=salt, default_fraction=0.0
    )
