"""As-of join: pair each left row with the temporally nearest right row.

The reference pairs each RGB image with the nearest-in-time IR image
within a +/-10 min tolerance via ``pd.merge_asof(..., direction=
'nearest', tolerance=10min)`` (generate_ndvi_timeseries.py:138-149) —
single-node pandas. Spark has no as-of primitive, so this module
provides two distributed strategies with identical semantics:

* ``asof_join`` (union + window): tag both sides, union, and per equi-key
  take the running ``last``/``first`` non-null right payload around each
  left row. One shuffle-sort per equi-key partition. Best when no
  tolerance bounds the search or keys are well-distributed.
* ``asof_join_interpolate``: the interpolated variant — each left row
  gets the right series' value linearly interpolated between its
  bracketing samples (boundary-held at the edges), same union+window
  shape as ``asof_join``.
* ``asof_join_bucketed`` (range join): bucketize ts by the tolerance,
  explode the right side into the 3 adjacent buckets, equi-join on
  (key, bucket), keep |delta| <= tolerance, pick the best match per left
  row with one ``min(struct)`` aggregate. Shuffles on (key, bucket) so a
  hot key is split across time — the scale path for skewed keys.

Tie semantics (both): equal distance before/after -> the earlier
(backward) right row wins, matching pandas' searchsorted behavior; a
right row AT the left timestamp matches in every direction (merge_asof's
``allow_exact_matches=True`` default); equal ts on the right -> the
smallest payload struct wins (value-deterministic, unlike pandas'
positional tie-break — requires orderable payload columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from ..functions.timeutil import epoch_us


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "nearest",
    tolerance_s: float | None = None,
    payload_cols: list[str] | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Union+window as-of join. Returns all left columns plus
    ``{prefix}{payload}`` columns and ``{prefix}ts`` (null if no match)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"bad direction {direction!r}")
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in on and c != right_ts]

    lcols = left.columns
    lrow_type = left.select(
        F.struct(*[F.col(c) for c in lcols]).alias("s")
    ).schema["s"].dataType
    rrow_type = right.select(
        F.struct(
            F.col(right_ts).alias("_rts"), *[F.col(c) for c in payload_cols]
        ).alias("s")
    ).schema["s"].dataType
    l_tag = left.select(
        *on,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in lcols]).alias("_lrow"),
        F.lit(None).cast(rrow_type).alias("_rrow"),
    )
    # Equal-ts right rows collapse to the smallest payload struct FIRST, so
    # the window picks are value-deterministic and match the bucketed
    # variant's min(struct) tie-break (pandas merge_asof is positional on
    # ties — input-order-dependent — so both strategies standardize on the
    # value-deterministic pick instead).
    r_tag = (
        right.filter(F.col(right_ts).isNotNull())
        .select(
            *on,
            F.col(right_ts).alias("_t"),
            F.struct(
                F.col(right_ts).alias("_rts"), *[F.col(c) for c in payload_cols]
            ).alias("_rrow"),
        )
        .groupBy(*on, "_t")
        .agg(F.min("_rrow").alias("_rrow"))
        .select(
            *on,
            "_t",
            F.lit(0).alias("_is_left"),
            F.lit(None).cast(lrow_type).alias("_lrow"),
            "_rrow",
        )
    )
    u = l_tag.unionByName(r_tag)

    # right rows sort before left rows at equal ts so a same-instant right
    # row is visible "backward" (merge_asof allow_exact_matches=True)
    w_back = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t"), F.col("_is_left"))
        .rowsBetween(0, Window.unboundedFollowing)
    )
    u = u.withColumn("_prev", F.last(F.col("_rrow"), ignorenulls=True).over(w_back))
    u = u.withColumn("_next", F.first(F.col("_rrow"), ignorenulls=True).over(w_fwd))

    lt = F.col("_t")
    prev_d = epoch_us(lt) - epoch_us(F.col("_prev._rts"))
    next_d = epoch_us(F.col("_next._rts")) - epoch_us(lt)
    tol_us = None if tolerance_s is None else int(tolerance_s * 1_000_000)

    prev_ok = F.col("_prev").isNotNull() & (
        F.lit(True) if tol_us is None else (prev_d <= tol_us)
    )
    next_ok = F.col("_next").isNotNull() & (
        F.lit(True) if tol_us is None else (next_d <= tol_us)
    )
    if direction == "backward":
        best = F.when(prev_ok, F.col("_prev"))
    elif direction == "forward":
        # a same-instant right row sorts BEFORE the left row, so it lands in
        # _prev (prev_d == 0), not _next — merge_asof's allow_exact_matches
        best = F.when(prev_ok & (prev_d == 0), F.col("_prev")).when(
            next_ok, F.col("_next")
        )
    else:  # nearest; tie -> backward
        best = (
            F.when(prev_ok & next_ok, F.when(next_d < prev_d, F.col("_next")).otherwise(F.col("_prev")))
            .when(prev_ok, F.col("_prev"))
            .when(next_ok, F.col("_next"))
        )
    u = u.filter(F.col("_is_left") == 1).withColumn("_best", best)
    out_cols = [F.col("_lrow")[c].alias(c) for c in lcols]
    out_cols.append(F.col("_best._rts").alias(f"{prefix}ts"))
    out_cols += [F.col("_best")[c].alias(f"{prefix}{c}") for c in payload_cols]
    return u.select(*out_cols)


def asof_join_interpolate(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    value_col: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_s: float | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Interpolated time join (QuestDB/kdb-family; pandas merge_asof +
    interpolate): each left row gets the right series' value LINEARLY
    INTERPOLATED between its bracketing samples, instead of the nearest
    sample — e.g. scoring each turn against a metric sampled on its own
    clock. Semantics:

    * both brackets within tolerance -> ``prev + (next - prev) * (dt /
      span)`` — the exact IEEE op order shared with
      :func:`..functions.fill.fill_series`, integer-µs dt/span;
    * only one bracket within tolerance -> that sample's value held
      (boundary hold, same rule as fill_series' edge behavior);
    * neither -> NULL. A right sample AT the left timestamp returns
      exactly that sample's value (dt == 0).

    Same distributed shape as :func:`asof_join`: tag + union + two
    windows per equi-key — one shuffle-sort, no join. Equal-ts right
    rows collapse to the smallest value first (value-deterministic).
    Returns all left columns plus ``out_col`` (default
    ``{value_col}_interp``).
    """
    out_col = out_col or f"{value_col}_interp"

    lcols = left.columns
    l_tag = left.select(
        *on,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in lcols]).alias("_lrow"),
        F.lit(None).cast("double").alias("_rv"),
    )
    lrow_type = l_tag.schema["_lrow"].dataType
    # a NULL-valued sample is no sample: dropping it keeps the paired
    # (_pt, _pv) window picks from ever decoupling onto different rows
    r_tag = (
        right.filter(F.col(value_col).isNotNull() & F.col(right_ts).isNotNull())
        .select(
            *on,
            F.col(right_ts).alias("_t"),
            F.col(value_col).cast("double").alias("_rv"),
        )
        .groupBy(*on, "_t")
        .agg(F.min("_rv").alias("_rv"))
        .select(
            *on,
            "_t",
            F.lit(0).alias("_is_left"),
            F.lit(None).cast(lrow_type).alias("_lrow"),
            "_rv",
        )
    )
    u = l_tag.unionByName(r_tag)

    w_back = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t"), F.col("_is_left"))
        .rowsBetween(0, Window.unboundedFollowing)
    )
    is_r = F.col("_is_left") == 0
    rt = F.when(is_r, epoch_us(F.col("_t")))
    rv = F.when(is_r, F.col("_rv"))
    u = (
        u.withColumn("_pt", F.last(rt, ignorenulls=True).over(w_back))
        .withColumn("_pv", F.last(rv, ignorenulls=True).over(w_back))
        .withColumn("_nt", F.first(rt, ignorenulls=True).over(w_fwd))
        .withColumn("_nv", F.first(rv, ignorenulls=True).over(w_fwd))
        .filter(F.col("_is_left") == 1)
    )

    lt = epoch_us(F.col("_t"))
    tol_us = None if tolerance_s is None else int(tolerance_s * 1_000_000)
    prev_ok = F.col("_pt").isNotNull() & (
        F.lit(True) if tol_us is None else ((lt - F.col("_pt")) <= tol_us)
    )
    next_ok = F.col("_nt").isNotNull() & (
        F.lit(True) if tol_us is None else ((F.col("_nt") - lt) <= tol_us)
    )
    dt = (lt - F.col("_pt")).cast("double")
    span = (F.col("_nt") - F.col("_pt")).cast("double")
    interp = F.col("_pv") + (F.col("_nv") - F.col("_pv")) * (dt / span)
    val = (
        F.when(prev_ok & next_ok,
               F.when(span == 0, F.col("_pv")).otherwise(interp))
        .when(prev_ok, F.col("_pv"))
        .when(next_ok, F.col("_nv"))
    )
    return u.select(
        *[F.col("_lrow")[c].alias(c) for c in lcols], val.alias(out_col)
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "nearest",
    tolerance_s: float = 600.0,
    payload_cols: list[str] | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Bucketed range-join as-of (requires a finite tolerance).

    ``left_keys`` must uniquely identify left rows (used to regroup
    candidate matches). Scale path: shuffles on (equi-key, ts-bucket),
    so hot keys are split across time buckets.
    """
    if tolerance_s is None or tolerance_s <= 0:
        raise ValueError("bucketed as-of needs a positive tolerance")
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in on and c != right_ts]
    tol_us = int(tolerance_s * 1_000_000)

    lb = left.withColumn("_b", (epoch_us(F.col(left_ts)) / tol_us).cast("long"))
    rb = right.filter(F.col(right_ts).isNotNull()).select(
        *on,
        F.col(right_ts).alias("_rts_in"),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
    ).withColumn(
        "_b0", (epoch_us(F.col("_rts_in")) / tol_us).cast("long")
    ).withColumn("_b", F.explode(F.array(F.col("_b0") - 1, F.col("_b0"), F.col("_b0") + 1)))

    j = lb.join(rb.drop("_b0"), on=[*on, "_b"], how="left")
    delta = epoch_us(F.col(left_ts)) - epoch_us(F.col("_rts_in"))
    if direction == "backward":
        ok = (delta >= 0) & (delta <= tol_us)
    elif direction == "forward":
        ok = (delta <= 0) & (-delta <= tol_us)
    else:
        ok = F.abs(delta) <= tol_us
    # rank candidates: |delta|, then backward-preferred, then right ts
    cand = F.when(
        ok & F.col("_rts_in").isNotNull(),
        F.struct(
            F.abs(delta).alias("_d"),
            F.when(delta >= 0, F.lit(0)).otherwise(F.lit(1)).alias("_fwd"),
            F.col("_rts_in").alias("_rts"),
            *[F.col(f"_p_{c}").alias(c) for c in payload_cols],
        ),
    )
    lcols = [c for c in left.columns]
    agg = j.groupBy(*[F.col(c) for c in left_keys]).agg(
        *[F.first(F.col(c)).alias(c) for c in lcols if c not in left_keys],
        F.min(cand).alias("_best"),
    )
    out_cols = [F.col(c) for c in lcols]
    out_cols.append(F.col("_best._rts").alias(f"{prefix}ts"))
    out_cols += [F.col("_best")[c].alias(f"{prefix}{c}") for c in payload_cols]
    return agg.select(*out_cols)
