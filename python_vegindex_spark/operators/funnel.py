"""Sequence analytics over event/turn streams: state transitions and
ordered conversion funnels (the Amplitude/Mixpanel class of queries,
and — on the transcript payload — role/tool flow analysis: the same
operators run on (conv_id, role/tool, ts)).

* :func:`transition_counts` — first-order Markov transition matrix:
  per sequence (user / conv) ordered by ts, count each
  (from_state -> to_state) adjacent pair. One (sequence)-keyed window
  for the lag + one hash aggregate on the tiny (from, to) key.
* :func:`funnel_steps` — strictly-ordered first-occurrence funnel:
  for steps ``[A, B, C]`` a sequence converts to step k when it has an
  event of state k AFTER its step-(k-1) conversion time (optionally
  within ``max_gap_s``). Earliest-completion semantics: each step
  takes the MINIMUM qualifying timestamp (min aggregates on integral
  epoch-µs — order-free and engine-exact).
* :func:`cohort_retention` — cohort retention matrix: sequences
  grouped by their first-activity period, activity counted per
  (cohort, period offset). Integer period arithmetic throughout.

Funnel shape at scale: one filtered aggregate per step over only that
step's rows, chained by an equi-join on the sequence key — k-1 joins of
NARROW per-sequence aggregates (one row per sequence each), all
shuffling on the same uniform key, payload never moves. No window over
the full stream, no per-sequence state: at 100 TB the funnel costs k
filtered scans of the (pruned) state column, not a sort of the world.
A per-sequence ``collect_list`` funnel — the naive approach — would
carry every event through the shuffle instead.
"""

from __future__ import annotations

import functools
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_us


def transition_counts(
    df: DataFrame,
    seq_cols: Sequence[str],
    state_col: str,
    ts_col: str = "ts",
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Count adjacent (from_state, to_state) pairs across all sequences.

    ``order_cols`` breaks ts ties deterministically (pass a unique id).
    The first event of a sequence has no predecessor and contributes no
    pair. Output: ``from_state``, ``to_state``, ``n`` — the raw Markov
    transition matrix (row-normalize downstream if probabilities are
    wanted; counts stay integer-exact).
    """
    w = Window.partitionBy(*[F.col(c) for c in seq_cols]).orderBy(
        ts_col, *order_cols
    )
    d = df.where(F.col(ts_col).isNotNull() & F.col(state_col).isNotNull()).select(
        F.lag(state_col).over(w).alias("from_state"),
        F.col(state_col).alias("to_state"),
    )
    return (
        d.where(F.col("from_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def funnel_steps(
    df: DataFrame,
    seq_cols: Sequence[str],
    state_col: str,
    steps: Sequence[str],
    ts_col: str = "ts",
    max_gap_s: float | None = None,
) -> DataFrame:
    """Per-sequence funnel completion times.

    Returns one row per sequence that completed step 1, with columns
    ``t1..tk`` (epoch-µs BIGINT of the earliest qualifying event per
    step; NULL once the funnel stalls). Step k qualifies when its event
    is strictly AFTER ``t(k-1)`` and, with ``max_gap_s``, at most that
    far after. Repeated states are fine — only the minimum qualifying
    ts is kept. Aggregate the result for conversion counts
    (:func:`funnel_summary`).
    """
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError(f"a funnel needs >= 2 steps, got {steps!r}")
    if max_gap_s is not None and max_gap_s <= 0:
        raise ValueError(f"max_gap_s must be > 0, got {max_gap_s}")
    gap = None if max_gap_s is None else int(round(float(max_gap_s) * 1_000_000))
    keys = [F.col(c) for c in seq_cols]
    base = df.where(
        F.col(ts_col).isNotNull() & F.col(state_col).isin(steps)
    ).select(*seq_cols, F.col(state_col).alias("_s"), epoch_us(F.col(ts_col)).alias("_t"))

    cur = (
        base.where(F.col("_s") == steps[0])
        .groupBy(*keys)
        .agg(F.min("_t").alias("t1"))
    )
    for k, state in enumerate(steps[1:], start=2):
        prev = f"t{k - 1}"
        rows = base.where(F.col("_s") == state)
        cond = F.col("_t") > F.col(prev)
        if gap is not None:
            cond = cond & (F.col("_t") <= F.col(prev) + F.lit(gap))
        nxt = (
            rows.join(cur.select(*seq_cols, prev), list(seq_cols))
            .where(cond)
            .groupBy(*keys)
            .agg(F.min("_t").alias(f"t{k}"))
        )
        cur = cur.join(nxt, list(seq_cols), "left")
    return cur


def funnel_summary(funnel: DataFrame, n_steps: int) -> DataFrame:
    """Reduce :func:`funnel_steps` output to per-step reach counts:
    ``step`` (1-based), ``n_reached``. One tiny aggregate."""
    agg = funnel.agg(
        *[
            F.count(F.col(f"t{k}")).alias(f"_n{k}")
            for k in range(1, n_steps + 1)
        ]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(k).alias("step"), F.col(f"_n{k}").alias("n_reached")
            )
            for k in range(1, n_steps + 1)
        ]
    )
    return agg.select(F.explode(pairs).alias("p")).select("p.step", "p.n_reached")


def cohort_retention(
    df: DataFrame,
    seq_cols: Sequence[str],
    ts_col: str = "ts",
    period_s: int = 7 * 86400,
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention matrix (the product-analytics staple next to
    funnels): cohort = the epoch-anchored period of a sequence's FIRST
    event; for every later period it was active in, count it under
    (cohort, offset). ``offset`` 0 is the cohort period itself, so
    ``n_active`` at offset 0 is the cohort size.

    Shape: one aggregate collapses events to distinct (sequence,
    period) pairs — map-side dedup, the heavy lift; one aggregate
    derives first periods; a narrow equi-join on the sequence key tags
    each activity period with its cohort; one final count per (cohort,
    offset). All integer period arithmetic (epoch-µs ``div``), exact.

    ``max_offset`` truncates the matrix width (NULL = keep all).
    Output: ``cohort_start`` (timestamp), ``offset`` (periods after
    the cohort period, BIGINT), ``n_active``.
    """
    if period_s <= 0:
        raise ValueError(f"period_s must be > 0, got {period_s}")
    if max_offset is not None and max_offset < 0:
        raise ValueError(f"max_offset must be >= 0, got {max_offset}")
    step = int(period_s) * 1_000_000
    keys = list(seq_cols)
    periods = (
        df.where(F.col(ts_col).isNotNull())
        .select(*keys, epoch_us(F.col(ts_col)).alias("_t"))
        .select(*keys, F.expr(f"_t div {step}").alias("_p"))
        .distinct()
    )
    first = periods.groupBy(*keys).agg(F.min("_p").alias("_p0"))
    tagged = periods.join(first, keys).select(
        F.col("_p0"), (F.col("_p") - F.col("_p0")).alias("offset")
    )
    if max_offset is not None:
        tagged = tagged.where(F.col("offset") <= max_offset)
    return (
        tagged.groupBy("_p0", "offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .select(
            F.timestamp_micros(F.col("_p0") * F.lit(step)).alias("cohort_start"),
            "offset",
            "n_active",
        )
    )


def funnel_timing(
    funnel: DataFrame, n_steps: int, round_to: int | None = 6
) -> DataFrame:
    """Time-to-convert stats per funnel step: for each step k >= 2,
    the count of converted sequences and the exact median / p90 of
    ``t(k) - t(k-1)`` in seconds (linear-interpolated percentile over
    the integral µs deltas — one tiny aggregate over the per-sequence
    funnel rows).

    Output: ``step`` (2-based), ``n_converted``, ``median_s``,
    ``p90_s``.
    """
    if n_steps < 2:
        raise ValueError(f"a funnel needs >= 2 steps, got {n_steps}")

    def _r(c):
        return F.round(c, round_to) if round_to is not None else c

    aggs = []
    for k in range(2, n_steps + 1):
        d = F.col(f"t{k}") - F.col(f"t{k - 1}")  # NULL-safe: stalls drop out
        aggs += [
            F.count(d).alias(f"_n{k}"),
            F.percentile(d, F.lit(0.5)).alias(f"_med{k}"),
            F.percentile(d, F.lit(0.9)).alias(f"_p90{k}"),
        ]
    agg = funnel.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(k).alias("step"),
                F.col(f"_n{k}").alias("n_converted"),
                _r(F.col(f"_med{k}") / F.lit(1_000_000.0)).alias("median_s"),
                _r(F.col(f"_p90{k}") / F.lit(1_000_000.0)).alias("p90_s"),
            )
            for k in range(2, n_steps + 1)
        ]
    )
    return agg.select(F.explode(rows).alias("p")).select(
        "p.step", "p.n_converted", "p.median_s", "p.p90_s"
    )


def state_durations(
    df: DataFrame,
    tier: str,
    seq_cols: Sequence[str],
    state_col: str,
    through,
    ts_col: str = "ts",
    order_cols: Sequence[str] = (),
    round_to: int | None = 6,
) -> DataFrame:
    """Time spent in each state per calendar bucket (TimescaleDB
    ``state_agg``/``duration_in`` analog; on transcripts: seconds per
    role/tool per conv per hour).

    Semantics: each sample asserts its state over ``[ts, next_ts)``
    (LOCF — the state holds until the next sample), the LAST sample
    holds until ``through`` (an explicit cut timestamp, never
    wall-clock — the freshness discipline of operators/validate.py).
    Intervals are clipped to ``[ts, through)`` and exploded onto
    epoch-anchored buckets exactly like :func:`..rate.interval_coverage`
    (integer-µs ``div``/clip arithmetic, never float).

    Scale shape: ONE (sequence)-keyed window for the lead, then the
    explode runs on one row per sample bounded by the interval's bucket
    span, and one hash aggregate on (seq, bucket, state). Ties on ts
    are zero-width intervals — they contribute nothing regardless of
    tie order, so the result is order-deterministic without an id
    column (pass ``order_cols`` anyway for reproducible plans).

    Fixed-width tiers only (hourly / daily / ``Nmin``): durations need
    exact bucket edges, which the doy-anchored weekly tier lacks.

    Output per (seq, ``bucket_start``, ``state``): ``n_samples`` (the
    samples whose NON-EMPTY interval starts in the bucket — zero-width
    ties contribute neither duration nor count), ``dur_us`` (exact
    BIGINT), ``dur_frac`` (dur_us / bucket_us, pinned division).
    """
    step_s = {"hourly": 3600, "daily": 86400}.get(tier)
    if step_s is None:
        from ..functions.buckets import tier_step_seconds

        step_s = tier_step_seconds(tier)
    if step_s is None:
        raise ValueError(
            f"state_durations needs a fixed-width tier (hourly/daily/Nmin), got {tier!r}"
        )
    step = int(step_s) * 1_000_000
    t = epoch_us(F.col(ts_col))
    cut = epoch_us(F.lit(through).cast("timestamp"))
    d = df.where(
        F.col(ts_col).isNotNull() & F.col(state_col).isNotNull()
    ).select(
        *seq_cols,
        F.col(state_col).alias("state"),
        t.alias("_t"),
        cut.alias("_cut"),
        *[F.col(c) for c in order_cols],
    )
    w = Window.partitionBy(*[F.col(c) for c in seq_cols]).orderBy(
        "_t", *order_cols
    )
    d = (
        d.withColumn("_e", F.least(F.coalesce(F.lead("_t").over(w), F.col("_cut")), F.col("_cut")))
        .where(F.col("_e") > F.col("_t"))  # zero-width ties + rows past the cut drop
    )
    lo = F.col("_bidx") * F.lit(step)
    hi = lo + F.lit(step)
    overlap = F.least(F.col("_e"), hi) - F.greatest(F.col("_t"), lo)
    per_bucket = d.select(
        *seq_cols,
        "state",
        "_t",
        "_e",
        F.explode(
            F.sequence(F.expr(f"_t div {step}"), F.expr(f"(_e - 1) div {step}"))
        ).alias("_bidx"),
    ).select(
        *seq_cols,
        "state",
        "_bidx",
        overlap.alias("_ov"),
        # count the sample in its START bucket only
        (F.expr(f"_t div {step}") == F.col("_bidx")).alias("_starts_here"),
    )
    out = per_bucket.groupBy(*seq_cols, "_bidx", "state").agg(
        F.count(F.when(F.col("_starts_here"), 1)).alias("n_samples"),
        F.sum("_ov").alias("dur_us"),
    )
    frac = F.col("dur_us").cast("double") / F.lit(float(step))
    if round_to is not None:
        frac = F.round(frac, round_to)
    return out.select(
        *seq_cols,
        F.timestamp_micros(F.col("_bidx") * F.lit(step)).alias("bucket_start"),
        "state",
        "n_samples",
        "dur_us",
        frac.alias("dur_frac"),
    )


def sequence_ngrams(
    df: DataFrame,
    seq_cols: Sequence[str],
    state_col: str,
    n: int = 3,
    ts_col: str = "ts",
    order_cols: Sequence[str] = (),
    min_support: int = 1,
    sep: str = ">",
) -> DataFrame:
    """Ordered state n-gram mining: the k-th-order generalization of
    :func:`transition_counts` (n=2 reproduces it, gram-encoded).

    Every run of ``n`` consecutive states within a sequence becomes one
    gram ``s1>s2>...>sn``; output is per-gram ``n_occurrences`` (total,
    overlapping windows counted) and ``n_seqs`` (distinct sequences
    containing the gram) — the standard support measures of sequential
    pattern mining, both exact integers.

    Scale shape: one window pass partitioned by the sequence key (the
    same per-sequence shuffle every sequence operator here pays —
    transcripts are hot-key-free since one conversation is one
    partition-local run), then ONE hash aggregate on the gram string;
    gram keys are near-uniform under hashing. ``n_seqs`` rides a
    distinct on (gram, sequence) — a second skinny aggregate over the
    gram stream, never the corpus.

    ``order_cols`` must make the per-sequence order total (pass a
    unique id) or window output is nondeterministic. ``sep`` must not
    occur in state values — gram strings would alias (validated
    downstream only by the caller; states here are enum-like).
    """
    if not seq_cols:
        raise ValueError("seq_cols must be non-empty")
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    w = Window.partitionBy(*[F.col(c) for c in seq_cols]).orderBy(
        ts_col, *order_cols
    )
    leads = [F.lead(state_col, i).over(w).alias(f"_s{i}") for i in range(n)]
    d = df.where(
        F.col(ts_col).isNotNull() & F.col(state_col).isNotNull()
    ).select(*[F.col(c) for c in seq_cols], *leads)
    # windows running off the end of a sequence have NULL tails: drop
    full = d.where(
        functools.reduce(
            lambda a, b: a & b,
            [F.col(f"_s{i}").isNotNull() for i in range(n)],
        )
    ).select(
        *[F.col(c) for c in seq_cols],
        F.concat_ws(sep, *[F.col(f"_s{i}") for i in range(n)]).alias("gram"),
    )
    return (
        full.groupBy("gram")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.countDistinct(*[F.col(c) for c in seq_cols])
            .cast("long")
            .alias("n_seqs"),
        )
        .where(F.col("n_occurrences") >= int(min_support))
    )
