"""Deterministic hash-based sampling / splitting for training-data tables.

``df.sample()`` / ``rand()`` are non-reproducible at scale: task retries,
AQE re-planning, and partition re-ordering all reshuffle the random
stream, so two runs of the same pipeline sample different rows. At
100 TB that breaks caching, incremental rebuilds, and train/eval
hygiene. The standard fix (used by every large corpus pipeline) is
content-keyed Bernoulli sampling: a row is kept iff
``hash(salt || key) < fraction * 2^k`` — a pure per-row expression, so

* identical across runs, executors, retries, and engines;
* no shuffle, no state — it rides the scan as a plain filter and
  whole-stage codegen;
* disjoint salts give independent samples; the same salt gives nested
  samples (a 1% sample is a subset of the 10% sample).

The hash is the first 8 hex chars of md5 compared AS A STRING against a
precomputed hex threshold — string comparison over lowercase hex is
numeric order, and both Spark and DuckDB/ANSI SQL render it identically,
so every operator here is exactly oracle-checkable (the engine-parity
trick established in operators/dedup.py).

Extends the engine beyond the reference (no sampling there); the
reference-adjacent consumer is the flagship rollup's input stage at
reduced fractions for dev runs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPACE = 16**8  # 8 hex chars = 32 bits of the md5 digest


def hex_threshold(fraction: float) -> str:
    """Lowercase-hex string T such that a uniform 8-hex-char draw is
    ``< T`` with probability ``fraction`` (quantized to 2^-32).

    fraction <= 0 -> "0" (an 8-char hex string is never < "0": equal
    first char, longer string sorts after). fraction >= 1 -> "g" (every
    hex digit sorts before 'g'). Both edge strings keep the comparison a
    plain string compare in any engine."""
    if fraction <= 0.0:
        return "0"
    if fraction >= 1.0:
        return "g"
    return format(max(1, int(fraction * _HEX_SPACE)), "08x")


def sample_key(key_cols: Sequence[str], salt: str = "") -> Column:
    """The 8-hex-char draw: ``substr(md5(concat_ws('|', salt, keys)), 1, 8)``.
    Identical SQL: ``substr(md5(concat_ws('|', salt, keys)), 1, 8)``."""
    return F.substring(
        F.md5(F.concat_ws("|", F.lit(salt), *[F.col(c).cast("string") for c in key_cols])),
        1,
        8,
    )


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_cols: Sequence[str],
    salt: str = "",
) -> DataFrame:
    """Reproducible Bernoulli sample keyed on ``key_cols``.

    Rows whose key hashes below the fraction threshold survive. Keying
    on a stable id (not the row position) means the SAME logical rows
    survive across runs and across engines; keying on a grouping column
    (e.g. conv_id) keeps groups intact (all-or-nothing per key)."""
    return df.filter(sample_key(key_cols, salt) < F.lit(hex_threshold(fraction)))


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_cols: Sequence[str],
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum fractions (e.g. upsample rare languages): a CASE over
    precomputed hex thresholds, still one scan-level filter."""
    thr: Column = F.lit(hex_threshold(default_fraction))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(hex_threshold(frac))
        ).otherwise(thr)
    return df.filter(sample_key(key_cols, salt) < thr)


def split_train_eval(
    df: DataFrame,
    eval_fraction: float,
    key_cols: Sequence[str],
    salt: str = "split",
) -> DataFrame:
    """Leakage-free deterministic train/eval split: adds a ``split``
    column ('eval' iff the key hash lands under ``eval_fraction``).
    Keyed on the dedup key (or conv_id), the same document can never
    drift between splits across pipeline runs."""
    return df.withColumn(
        "split",
        F.when(
            sample_key(key_cols, salt) < F.lit(hex_threshold(eval_fraction)),
            F.lit("eval"),
        ).otherwise(F.lit("train")),
    )


def cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    cap: int,
    key_cols: Sequence[str],
    salt: str = "",
    presalt_shards: int = 16,
) -> DataFrame:
    """Deterministic per-group row cap — the pretraining
    "domain frequency" control (C4/CCNet-style: an over-represented
    domain/source must not dominate the mixture): keep at most ``cap``
    rows per group, chosen by SMALLEST content hash (the
    :func:`sample_key` draw, tie-broken by the key itself), so the
    surviving set is

    * reproducible across runs/engines (content-keyed, no rand()),
    * NESTED across caps (the cap-100 set contains the cap-10 set —
      the same property salt-nesting gives fractions), and
    * uniform within the group (md5 is order-free).

    Scale shape — the naive single window sorts EVERY row of the
    hottest domain in one task; instead the rank runs twice:

    1. pre-prune within (group, shard) where shard = pmod(crc32(draw),
       ``presalt_shards``): each shard keeps its local smallest ``cap``
       draws — a window over 1/shards of the hot group,
    2. final rank over the survivors (≤ shards × cap rows per group —
       bounded, tiny) keeps the global smallest ``cap``.

    Stage 1 can never evict a global top-``cap`` row (its shard keeps
    its own smallest ``cap``, and the global winners number ≤ cap in
    any shard) — the standard distributed top-k argument, so the
    two-phase result is EXACTLY the single-window result.

    Output: the input rows that survive, plus ``grp_rank`` (1-based
    rank by draw within the group — ``grp_rank <= cap`` for all
    survivors). ``grp_rank`` is an OUTPUT column: an input already
    carrying that name would be silently overwritten, so it raises;
    scratch columns use collision-proof internal names.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    if presalt_shards < 1:
        raise ValueError(f"presalt_shards must be >= 1, got {presalt_shards}")
    if "grp_rank" in df.columns:
        raise ValueError(
            "cap_per_group writes output column 'grp_rank'; rename the "
            "input column of that name first"
        )
    from pyspark.sql import Window

    draw_col, r1_col = "__cap_draw__", "__cap_r1__"
    for c in (draw_col, r1_col):
        if c in df.columns:
            raise ValueError(f"input column {c!r} collides with a scratch name")
    draw = sample_key(key_cols, salt=salt)
    d = df.withColumn(draw_col, draw)
    order = [F.col(draw_col).asc()] + [F.col(c).asc() for c in key_cols]
    shard = F.pmod(F.crc32(F.col(draw_col)), F.lit(presalt_shards))
    w1 = Window.partitionBy(
        *[F.col(c) for c in group_cols], shard
    ).orderBy(*order)
    w2 = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order)
    return (
        d.withColumn(r1_col, F.row_number().over(w1))
        .where(F.col(r1_col) <= cap)
        .withColumn("grp_rank", F.row_number().over(w2))
        .where(F.col("grp_rank") <= cap)
        .drop(draw_col, r1_col)
    )


def weighted_bottomk_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    group_cols: Sequence[str] = (),
    salt: str = "",
) -> DataFrame:
    """Probability-proportional-to-size sample without replacement:
    keep the ``k`` keys with smallest priority ``u/w`` — Ohlsson's
    sequential Poisson sampling (Ohlsson, "Sequential Poisson
    sampling", J. Official Statistics 1998), the standard deterministic
    PPS-WOR scheme. ``u`` is the 60-bit md5-prefix hash of
    ``salt || key`` scaled to [0,1), so the sample is reproducible
    across runs/engines and NESTED in ``k`` (the top-10 of k=10 is a
    prefix of k=50's ranking); heavier rows are proportionally more
    likely to survive.

    Float discipline: the priority is ONE IEEE product + ONE division
    of exactly-representable inputs (``double(h) / (2^60 * double(w))``
    — 2^60 is a power of two), identical on any IEEE engine, so the
    ranking reproduces bit-for-bit; ties (h collisions) break on key.

    Rows with NULL or non-positive weight are excluded (a zero-weight
    row has selection probability 0; negative weights are undefined).
    Duplicate (group, key) rows must agree on the weight — conflicting
    weights RAISE at execution (``raise_error`` inside the dedup
    aggregate, the same fail-loud contract as fractional weights; one
    key must never occupy multiple sample slots). Output: group_cols +
    (rank, key, weight, priority).

    Scale shape: same as bottom-k — grouped: per-group window over the
    distinct-key frame; ungrouped: TakeOrderedAndProject.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    kind = dict(df.dtypes).get(weight_col)
    if kind not in ("bigint", "int", "smallint", "tinyint"):
        # fractional weights would be silently floored by the long cast
        # below (prob-shaped weights in (0,1) all floor to 0 and the
        # "sample" degenerates to key order) — scale them to integers
        # upstream instead
        raise ValueError(
            f"weight_col must be integral (got {weight_col}: {kind}); "
            "scale fractional weights to integers first"
        )
    from pyspark.sql import Window

    from ..operators.sketches import HASH_BITS, hash60

    w = F.col(weight_col)
    keyed = (
        df.where(F.col(key_col).isNotNull() & w.isNotNull() & (w > 0))
        .select(
            *group_cols,
            F.col(key_col).alias("key"),
            w.cast("long").alias("weight"),
        )
        .groupBy(*group_cols, "key")
        .agg(F.min("weight").alias("_wmin"), F.max("weight").alias("_wmax"))
        .select(
            *group_cols,
            "key",
            F.when(F.col("_wmin") == F.col("_wmax"), F.col("_wmin"))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "weighted_bottomk_sample: conflicting weights "
                            "for key "
                        ),
                        F.col("key").cast("string"),
                    )
                )
            )
            .alias("weight"),
        )
    )
    h = hash60(F.concat(F.lit(salt), F.col("key").cast("string")))
    keyed = keyed.withColumn(
        "priority",
        h.cast("double")
        / (F.lit(float(2**HASH_BITS)) * F.col("weight").cast("double")),
    )
    order = [F.col("priority").asc(), F.col("key").asc()]
    if not group_cols:
        keyed = keyed.orderBy(*order).limit(k)
    win = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        keyed.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select(*group_cols, "rank", "key", "weight", "priority")
    )
