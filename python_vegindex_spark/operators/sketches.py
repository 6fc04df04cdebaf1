"""Mergeable cardinality sketches: HyperLogLog over DataFrame groups.

At 10^12 turns, ``count(DISTINCT user)`` per bucket is the one rollup
measure the engine's continuous aggregates cannot cascade: distinct
counts are not summable, so the hourly -> daily -> weekly tier chain
(operators/cascade.py) either re-scans raw turns per tier or stores a
MERGEABLE sketch. This module provides the standard answer — a
HyperLogLog register table as just another gold rollup, coarsened the
same way the OHLC cascade coarsens bars: registers merge by elementwise
``max``, so a weekly sketch derived from daily sketches is IDENTICAL
(not approximately equal) to one built from raw rows. Flajolet et al.,
"HyperLogLog: the analysis of a near-optimal cardinality estimation
algorithm" (AofA 2007) — public knowledge; no reference-counterpart
(vegindex has no distinct aggregation, SURVEY §2.4).

Relationship to ``operators/cascade.rollup_hll``: the cascade module
wires Spark's NATIVE DataSketches HLL (``hll_sketch_agg`` /
``hll_union_agg``) into the tier chain — the compact production path
(one opaque binary column per bucket). This module is its transparent
twin: registers live in plain (bucket, reg) integer rows, so the
sketch state itself is portable, value-checkable against ANY engine
with md5 (the DuckDB oracle checks it bit-for-bit — impossible for
the DataSketches binary), storable in formats without binary columns,
and inspectable. Same asymptotics, same merge algebra; pick by
whether you need compactness (native) or auditability (this).

Cross-engine float discipline (the house rule): everything up to the
estimate is INTEGER-EXACT and oracle-checkable bit-for-bit —
  * the 60-bit hash is the first 15 hex chars of ``md5(key)`` (md5 is
    identical in Spark, DuckDB and hashlib; 15 chars keep the value in
    a signed BIGINT),
  * the register index is the top ``b`` bits, the rank ``rho`` is
    1 + leading-zero-count of the remaining ``60-b`` bits, computed by
    an explicit integer CASE chain (NOT ``floor(log2(w))`` — above
    2^53 the double conversion rounds across power-of-two boundaries
    and libm log2 is not exact at the lattice points),
  * the harmonic denominator ``Z = sum_j 2^-M_j`` is kept scaled by
    2^K (K = 61-b, the max rank) as a plain BIGINT — powers of two sum
    exactly; absent registers (M=0) contribute 2^K,
  * the raw estimate is ONE pinned division,
    ``alpha_m * m^2 * 2^K / double(S)`` — the numerator is a single
    Python-computed double literal shared verbatim with any oracle,
    and BIGINT->double conversion is IEEE round-half-even on both
    engines.
The small-range (linear-counting) correction ``m * ln(m/V)`` is
provided for API completeness but flagged: ``ln`` is libm and may
differ by 1 ulp across engines, so oracle-checked queries should
select ``est_raw`` (and sized so the correction regime does not apply)
while tests compare the corrected column with a relative tolerance.

Scale shape: building registers is one hash aggregate on
(group, bucket) — at most ``m`` rows per group survive, so a year of
hourly sketches at m=1024 is ~9M tiny rows regardless of input size;
merging tiers is a second aggregate over those rows, never the raw
data. No windows, no Python, whole-stage codegen end to end.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BITS = 60  # 15 hex chars of md5 -> always fits signed BIGINT

# Flajolet et al. bias constants: exact published values for small m,
# the asymptotic formula beyond.
_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def alpha_m(m: int) -> float:
    return _ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))


def _validate_b(b: int) -> None:
    # m = 2^b >= 16: the Flajolet bias constants are defined for m >= 16
    # only — smaller register counts would carry an uncorrected
    # multiplicative bias
    if not 4 <= b <= 16:
        raise ValueError(f"b (register index bits) must be in [4, 16], got {b}")


def hash60(key: Column) -> Column:
    """60-bit md5-prefix hash of ``key`` (cast to string first): the
    identical value is computable in DuckDB as
    ``CAST(concat('0x', substr(md5(CAST(k AS VARCHAR)), 1, 15)) AS BIGINT)``."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )


def rho_expr(w: Column, wbits: int) -> Column:
    """1 + leading-zero count of ``w`` within a ``wbits``-wide field:
    an integer threshold CASE chain (exact for any width, unlike float
    log2). ``w == 0`` maps to ``wbits + 1`` per the HLL paper."""
    out = None
    for i in range(wbits):
        cond = w >= F.lit(1 << (wbits - 1 - i))
        out = F.when(cond, i + 1) if out is None else out.when(cond, i + 1)
    return out.otherwise(wbits + 1)


def rho_sql(w_expr: str, wbits: int) -> str:
    """The DuckDB/ANSI twin of :func:`rho_expr` — generated from the
    same loop so engine and oracle share one definition."""
    cases = "".join(
        f" WHEN {w_expr} >= {1 << (wbits - 1 - i)} THEN {i + 1}"
        for i in range(wbits)
    )
    return f"(CASE{cases} ELSE {wbits + 1} END)"


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str],
    b: int = 5,
) -> DataFrame:
    """Per-group HLL register table: ``group_cols + (bucket, reg)``.

    One hash aggregate; at most ``2^b`` rows per group survive. This is
    the storable/mergeable sketch: coarsen groups (day -> week) with
    ``groupBy(coarser + bucket).agg(max(reg))`` and the result is
    bit-identical to registers built from raw rows.
    """
    _validate_b(b)
    wbits = HASH_BITS - b
    h = hash60(F.col(key_col))
    w = h.bitwiseAND(F.lit((1 << wbits) - 1))
    return (
        df.where(F.col(key_col).isNotNull())
        .select(
            *group_cols,
            F.shiftright(h, wbits).alias("bucket"),
            rho_expr(w, wbits).cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_merge(
    registers: DataFrame, coarser_group: Sequence[str] | dict[str, Column]
) -> DataFrame:
    """Merge register tables to a coarser grouping (elementwise max).

    ``coarser_group`` is either a subset of the existing group columns
    or a mapping new_name -> expression over them (e.g.
    ``{"week": F.date_trunc("week", F.col("day"))}``).
    """
    if isinstance(coarser_group, dict):
        keyed = registers.select(
            *[expr.alias(name) for name, expr in coarser_group.items()],
            "bucket",
            "reg",
        )
        names = list(coarser_group)
    else:
        keyed = registers
        names = list(coarser_group)
    return keyed.groupBy(*names, "bucket").agg(F.max("reg").alias("reg"))


def hll_estimate(
    registers: DataFrame,
    group_cols: Sequence[str],
    b: int = 5,
    with_correction: bool = False,
) -> DataFrame:
    """Collapse a register table into per-group estimate rows:
    ``group_cols + (m, n_zero, s_scaled, est_raw [, est])``.

    ``s_scaled`` is the 2^K-scaled harmonic denominator (exact BIGINT);
    ``est_raw`` is the single pinned division described in the module
    docstring and is safe to oracle-check bit-exact. ``est`` (opt-in)
    applies the standard small-range linear-counting correction, which
    crosses libm ``ln`` — compare with tolerance only.
    """
    _validate_b(b)
    m = 1 << b
    K = HASH_BITS - b + 1
    numerator = _numerator(b)  # THE shared double literal (see below)
    est = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n_present"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {K} - reg)")).alias(
            "_s_present"
        ),
    )
    out = est.select(
        *group_cols,
        F.lit(m).alias("m"),
        (F.lit(m) - F.col("_n_present")).cast("int").alias("n_zero"),
        (
            # coalesce: a global (group_cols=[]) aggregate over an
            # EMPTY register table yields one row with a NULL sum —
            # the zero-cardinality answer is all-absent registers,
            # s_scaled = m * 2^K, not NULL
            F.coalesce(F.col("_s_present"), F.lit(0))
            + (F.lit(m) - F.col("_n_present")) * F.lit(1 << K)
        ).cast("bigint").alias("s_scaled"),
    ).withColumn(
        "est_raw", F.lit(numerator) / F.col("s_scaled").cast("double")
    )
    if with_correction:
        out = out.withColumn(
            "est",
            F.when(
                (F.col("n_zero") > 0) & (F.col("est_raw") <= F.lit(2.5 * m)),
                F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("n_zero")),
            ).otherwise(F.col("est_raw")),
        )
    return out


def _numerator(b: int) -> float:
    """The one estimate-numerator expression (alpha_m * m^2 * 2^K).
    Engine (hll_estimate) and oracle (hll_estimate_numerator) both call
    THIS — the bit-exact contract depends on there being exactly one
    evaluation order of this product."""
    m = 1 << b
    K = HASH_BITS - b + 1
    return float(alpha_m(m) * m * m * (2.0 ** K))


def hll_estimate_numerator(b: int) -> str:
    """repr of the shared double numerator literal for oracle SQL —
    guarantees the oracle divides the IDENTICAL double."""
    _validate_b(b)
    return repr(_numerator(b))


# --------------------------------------------------------------------------
# Count-Min sketch: sum-mergeable frequency counters (Cormode &
# Muthukrishnan, J. Algorithms 2005). The counter matrix is a DataFrame of
# (group, row_idx, col_idx, counter) — d*w rows per group regardless of
# key cardinality, merged across batches/tiers by plain SUM (vs HLL's
# max). Everything is integer: hashes are independent md5 prefixes
# (row index salted into the hashed string), estimates are MIN over d
# counters, and the classic one-sided guarantee (est >= true count)
# is assertable in-query.
# --------------------------------------------------------------------------


def cms_hash(key: Column, row_idx: int, width: int) -> Column:
    """Column index of ``key`` in CMS row ``row_idx``: the 60-bit
    md5-prefix hash of ``"{row_idx}:{key}"`` mod width — independent
    rows via input salting, reproducible verbatim in any engine with
    md5 (DuckDB twin: same concat, same substr, same mod)."""
    return F.pmod(
        hash60(F.concat(F.lit(f"{row_idx}:"), key.cast("string"))),
        F.lit(width),
    )


def _validate_cms(depth: int, width: int) -> None:
    if depth < 1 or width < 2:
        raise ValueError(
            f"need depth >= 1 and width >= 2, got d={depth} w={width}"
        )


def cms_probe_structs(key: Column, depth: int, width: int) -> Column:
    """The (row_idx, col_idx) struct array a key lands in — THE one
    definition of CMS geometry, shared by cms_build, cms_estimate and
    the streaming counter aggregate (a salting change that touched only
    one copy would silently break streaming==batch parity)."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row_idx"),
                cms_hash(key, i, width).alias("col_idx"),
            )
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str],
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Per-group CMS counter table ``group_cols + (row_idx, col_idx,
    counter)`` counting occurrences of ``key_col``.

    One pass: each input row lands in ``depth`` counters (a small
    row-multiplying projection, NOT a shuffle per row — the single
    shuffle is the (group, row, col) hash aggregate, bounded at
    depth*width rows per group). Merge sketches across groups/batches
    with ``groupBy(coarser, row_idx, col_idx).agg(sum(counter))``.
    """
    _validate_cms(depth, width)
    k = F.col(key_col)
    hashed = df.where(k.isNotNull()).select(
        *group_cols,
        F.explode(cms_probe_structs(k, depth, width)).alias("rc"),
    )
    return (
        hashed.select(*group_cols, "rc.row_idx", "rc.col_idx")
        .groupBy(*group_cols, "row_idx", "col_idx")
        .agg(F.count(F.lit(1)).alias("counter"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each candidate key: ``candidates``
    columns + ``cms_est`` (the min over the d counters; missing
    counters are true zeros). ``candidates`` is expected small (it is
    broadcast against the fixed-size sketch).

    The sketch must be UNGROUPED — exactly (row_idx, col_idx, counter).
    A grouped sketch (built with group_cols) would silently mix
    counters across groups into a meaningless cross-group min; merge it
    first (``groupBy('row_idx','col_idx').agg(sum('counter'))`` for the
    total, or filter to one group)."""
    extra = set(sketch.columns) - {"row_idx", "col_idx", "counter"}
    if extra or set(sketch.columns) != {"row_idx", "col_idx", "counter"}:
        raise ValueError(
            "cms_estimate needs an ungrouped sketch with columns exactly "
            f"(row_idx, col_idx, counter); got {sorted(sketch.columns)} — "
            "sum-merge the group axis away first"
        )
    probes = candidates.select(
        "*",
        F.explode(cms_probe_structs(F.col(key_col), depth, width)).alias("rc"),
    ).select("*", "rc.row_idx", "rc.col_idx").drop("rc")
    joined = probes.join(F.broadcast(sketch), ["row_idx", "col_idx"], "left")
    others = [c for c in candidates.columns]
    return (
        joined.groupBy(*others)
        .agg(F.min(F.coalesce(F.col("counter"), F.lit(0))).alias("cms_est"))
    )


# --------------------------------------------------------------------------
# Bottom-k sample: the deterministic distributed uniform sample — keep
# the k keys with the SMALLEST 60-bit hash (Cohen & Kaplan, "Summarizing
# data using bottom-k sketches", PODC 2007). Mergeable (bottom-k of a
# union = bottom-k of the parts' bottom-k sets), reproducible across
# runs/engines (no RNG), and doubles as a distinct-count estimator:
# (k-1) * 2^60 / h_(k) with h_(k) the k-th smallest hash.
# --------------------------------------------------------------------------


def bottomk_sample(
    df: DataFrame,
    key_col: str,
    k: int = 64,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group bottom-k distinct sample: ``group_cols + (rank, key,
    h60)`` for the k distinct keys with smallest hash. Distinct-first
    (duplicates share a hash and must count once). Grouped: a per-group
    window (each group's candidate stream shrinks to k). Ungrouped:
    ``orderBy().limit(k)`` so Catalyst plans TakeOrderedAndProject —
    per-partition heaps, never a single-partition global sort — and
    the rank window then runs over only k rows."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    keyed = (
        df.where(F.col(key_col).isNotNull())
        .select(*group_cols, F.col(key_col).alias("key"))
        .distinct()
        .withColumn("h60", hash60(F.col("key")))
    )
    order = [F.col("h60").asc(), F.col("key").asc()]
    if not group_cols:
        keyed = keyed.orderBy(*order).limit(k)
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(*group_cols, "rank", "key", "h60")
    )


def bottomk_distinct_estimate(
    sample: DataFrame, k: int, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Distinct-count estimate from a bottom-k sample: groups whose
    sample is FULL (rank k exists) estimate (k-1)*2^60/h_(k) — one
    pinned division; groups with fewer than k distinct keys report the
    exact count (the sample IS the key set). Output: group_cols +
    (n_sampled, est_distinct)."""
    agg = sample.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.max(F.when(F.col("rank") == k, F.col("h60"))).alias("_hk"),
    )
    return agg.select(
        *group_cols,
        "n_sampled",
        F.when(
            F.col("_hk").isNotNull(),
            F.lit(float((k - 1) * (2**HASH_BITS))) / F.col("_hk").cast("double"),
        )
        .otherwise(F.col("n_sampled").cast("double"))
        .alias("est_distinct"),
    )
