"""SAX — Symbolic Aggregate approXimation (Lin, Keogh, Lonardi &
Chiu, DMKD'03) over the engine's calendar buckets, plus motif (most
frequent word) counting.

The classic time-series pattern-mining pipeline: z-normalize the
series, piecewise-aggregate it (PAA — here, the engine's own
epoch/calendar buckets via :func:`..functions.buckets.bucket_start`),
and discretize each segment mean into an alphabet of
equiprobable-under-N(0,1) symbols. Repeated symbol words = motifs;
rare words = discords.

Engine-exactness discipline: z-normalization is AFFINE, so PAA of the
z-scored series equals ``(bucket_mean - mu) / sigma`` with ``mu`` /
``sigma`` the per-series population moments of the RAW (integral)
values — both computable from order-free BIGINT sums in the
:func:`..rate.seasonal_profile` pinned op order
(``mean = s/n; std = sqrt(sq/n - mean*mean)``). The Gaussian
breakpoints are module literals (the published SAX table), and a
symbol is just the count of breakpoints <= z — comparisons, never
arithmetic — so the symbols (and hence motif counts) are bit-exact
cross-engine even though z itself carries float rounding.

Scale shape: the raw table is aggregated ONCE on (series, bucket) —
count / sum / sum-of-squares per bucket. The per-series moments are
then an exact RE-aggregation of those bucket sums (BIGINT addition is
associative, so summing per-bucket sums equals summing raw values —
the cascade_moments lattice argument), i.e. a second tiny aggregate
over already-collapsed rows, broadcast-joined back. Net: one raw
shuffle, never two scans of the big table. Motif words use one
lead-window over bucket rows (already tiny) + one hash aggregate on
(series, word).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.buckets import bucket_start

#: Equiprobable N(0,1) breakpoints per alphabet size (standard SAX
#: table — Phi^{-1}(i/a), i = 1..a-1). Literal precision does not
#: affect cross-engine exactness: symbols come from comparisons
#: against these exact literals on both engines.
SAX_BREAKPOINTS: dict[int, tuple[float, ...]] = {
    2: (0.0,),
    3: (-0.4307273, 0.4307273),
    4: (-0.6744898, 0.0, 0.6744898),
    5: (-0.8416212, -0.2533471, 0.2533471, 0.8416212),
    6: (-0.9674216, -0.4307273, 0.0, 0.4307273, 0.9674216),
    7: (-1.0675705, -0.5659488, -0.1800124, 0.1800124, 0.5659488, 1.0675705),
    8: (-1.1503494, -0.6744898, -0.3186394, 0.0, 0.3186394, 0.6744898, 1.1503494),
    9: (
        -1.2206403, -0.7647097, -0.4307273, -0.1397103,
        0.1397103, 0.4307273, 0.7647097, 1.2206403,
    ),
    10: (
        -1.2815516, -0.8416212, -0.5244005, -0.2533471, 0.0,
        0.2533471, 0.5244005, 0.8416212, 1.2815516,
    ),
}

_ALPHABET = "abcdefghij"


def sax_symbols(
    df: DataFrame,
    tier: str,
    series_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    alphabet_size: int = 4,
    round_to: int | None = 6,
) -> DataFrame:
    """Per (series, bucket): the PAA mean, its z-score against the
    series' population moments, and the SAX symbol (letter, 'a' =
    lowest band).

    ``value_col`` must be integral (quantize upstream — the
    engine-wide exactness contract): per-bucket and per-series sums
    are then BIGINT/order-free and every float is derived in one
    pinned op order. Zero-variance series (sigma = 0) yield NULL
    z / symbol, the :func:`..rate.anomaly_zscore` guard. Buckets with
    no rows simply don't appear (SAX over the observed series; gap-fill
    upstream with :func:`...functions.fill.fill_series` if a dense
    word stream is wanted).
    """
    if alphabet_size not in SAX_BREAKPOINTS:
        raise ValueError(
            f"alphabet_size must be in {sorted(SAX_BREAKPOINTS)}, got {alphabet_size}"
        )
    bps = SAX_BREAKPOINTS[alphabet_size]
    v = F.col(value_col)
    d = df.where(
        F.col(ts_col).isNotNull() & v.isNotNull() & ~F.isnan(v.cast("double"))
    ).select(
        *series_cols,
        bucket_start(F.col(ts_col), tier).alias("bucket_start"),
        v.cast("long").alias("_v"),
    )
    per_bucket = d.groupBy(*series_cols, "bucket_start").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_v").alias("_s"),
        F.sum(F.col("_v") * F.col("_v")).alias("_sq"),
    ).localCheckpoint(eager=True)
    # ^ pin stage 1 (the correlate.py discipline): the moments branch
    # prunes _s-only while the probe branch prunes _sq-only, so without
    # the checkpoint Catalyst compiles two DIFFERENT aggregates over the
    # raw table — two full scans. The checkpoint is series x buckets
    # rows (tiny) and guarantees the big table is read exactly once.
    # series moments as exact re-aggregation of the bucket sums
    moments = per_bucket.groupBy(*series_cols).agg(
        F.sum("n").alias("_N"),
        F.sum("_s").alias("_S"),
        F.sum("_sq").alias("_SQ"),
    )
    nd = F.col("_N").cast("double")
    mu = F.col("_S").cast("double") / nd
    sigma = F.sqrt(F.col("_SQ").cast("double") / nd - mu * mu)
    moments = moments.select(
        *series_cols, mu.alias("_mu"), sigma.alias("_sigma")
    )
    j = per_bucket.join(F.broadcast(moments), list(series_cols))
    paa = F.col("_s").cast("double") / F.col("n").cast("double")
    z = (paa - F.col("_mu")) / F.col("_sigma")
    # symbol index = count of breakpoints <= z (comparisons only)
    idx = sum(
        (z >= F.lit(bp)).cast("int") for bp in bps
    )
    sym = F.when(
        F.col("_sigma") > 0,
        F.substring(F.lit(_ALPHABET[:alphabet_size]), idx + 1, 1),
    )

    def _r(c):
        return F.round(c, round_to) if round_to is not None else c

    return j.select(
        *series_cols,
        "bucket_start",
        "n",
        _r(paa).alias("paa_mean"),
        _r(F.when(F.col("_sigma") > 0, z)).alias("z"),
        sym.alias("symbol"),
    )


def sax_motifs(
    symbols: DataFrame,
    series_cols: Sequence[str],
    word_len: int = 3,
    order_col: str = "bucket_start",
    symbol_col: str = "symbol",
) -> DataFrame:
    """Count SAX words (motifs): per series, slide a ``word_len``
    window over the symbol stream ordered by ``order_col`` and count
    each word. A word forms only from ``word_len`` CONSECUTIVE rows
    present in the frame — a NULL symbol anywhere in the window (or
    the trailing edge) forms no word, so gaps poison exactly the words
    they touch. Runs on already-bucketed rows (tiny): one lead-window
    per series + one hash aggregate on (series, word).

    Output: series, ``word``, ``cnt`` — rank downstream (the driver
    query takes the per-series top with a (cnt DESC, word ASC)
    deterministic tie-break).
    """
    if word_len < 1:
        raise ValueError(f"word_len must be >= 1, got {word_len}")
    w = Window.partitionBy(*[F.col(c) for c in series_cols]).orderBy(order_col)
    parts = [F.col(symbol_col)] + [
        F.lead(symbol_col, i).over(w) for i in range(1, word_len)
    ]
    # concat is NULL if any component is NULL — exactly the contract
    word = parts[0]
    for p in parts[1:]:
        word = F.concat(word, p)
    d = symbols.withColumn("_word", word).where(F.col("_word").isNotNull())
    return d.groupBy(*series_cols, F.col("_word").alias("word")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
