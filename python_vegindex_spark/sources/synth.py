"""Deterministic synthetic transcript ("turns") generator.

Produces the engine's bronze input table with exactly the BASELINE.json
``input_hint`` shape::

    (conv_id:string, turn_idx:int32, role:string, text:string,
     tool:string, ts:timestamp)

Design constraints:
* **Distributed**: built from ``spark.range`` + column expressions; no
  driver-side loops, scales to any row count.
* **Deterministic under any parallelism**: every pseudo-random draw is
  ``xxhash64(seed, conv, turn, tag)`` of *values*, never of partition or
  task ids — the same (seed, n_convs) always yields byte-identical rows,
  which is what the per-turn text-equality invariant needs.
* **Skewed + gappy on purpose** (FIXTURES.md §1): ~1% of convs are hot
  keys with ~50x the turns (salting tests); ~5% of convs get multi-hour
  gaps (gap-fill tests); a slice of convs runs at sub-second deltas
  (delta-of-delta codec edge); conv start times span >2 calendar years
  (year-boundary bucket anchoring, reference vegindex.py:34-58).

This replaces the reference's filesystem image archive
(utils.py:103-213): timestamps are a real column, not path-encoded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "query", "table",
    "join", "rollup", "bucket", "window", "stream", "batch", "shuffle",
    "spill", "codec", "chunk", "spine", "tier", "metric", "lineage",
    "anchor", "argmin", "percentile", "gorilla", "delta", "vector",
    "arrow", "parquet", "iceberg", "catalyst", "tungsten", "executor",
    "driver", "partition", "broadcast", "salt", "skew", "watermark",
    "checkpoint", "retention", "compaction", "transcript",
]

_TOOLS = ["search", "calculator", "browser", "python", "sql", "shell"]


def _u(seed: int, *cols) -> F.Column:
    """Deterministic uniform(0,1) from a value-hash (never NULL, never 0/1)."""
    h = F.xxhash64(F.lit(seed), *cols)
    return (F.pmod(h, F.lit(1_000_000)) + 0.5) / 1_000_000.0


def synth_turns(
    spark: SparkSession,
    n_convs: int = 200,
    seed: int = 42,
    start: str = "2023-11-15 00:00:00",
    span_days: int = 480,
    base_turns: int = 24,
) -> DataFrame:
    """Generate the deterministic turns table.

    The span crosses a calendar-year boundary by default so the
    doy-anchored weekly buckets exercise the yearly restart.
    """
    conv = spark.range(n_convs).select(
        F.col("id").alias("conv_seq"),
        F.format_string("conv_%06d", F.col("id")).alias("conv_id"),
    )

    # conversation archetypes (hash-derived, deterministic)
    u_hot = _u(seed, F.col("conv_seq"), F.lit("hot"))
    u_len = _u(seed, F.col("conv_seq"), F.lit("len"))
    u_start = _u(seed, F.col("conv_seq"), F.lit("start"))
    u_pace = _u(seed, F.col("conv_seq"), F.lit("pace"))

    # conversation archetypes:
    #   chat  (~55%): minutes-long, mean gap 40 s
    #   agent (~30%): long-running sessions, mean gap 2 h (spans days-weeks)
    #   gappy (~10%): mean gap 20 min + multi-hour/day holes (gap-fill tests)
    #   dense ( ~5%): sub-second deltas (delta-of-delta codec edge)
    # hot keys (~1%, overlaid): ~50x turns at 15-min pace -> weeks-long,
    # hundreds of daily buckets (skew/salting tests)
    arch = (
        F.when(u_pace < 0.55, F.lit("chat"))
        .when(u_pace < 0.85, F.lit("agent"))
        .when(u_pace < 0.95, F.lit("gappy"))
        .otherwise(F.lit("dense"))
    )
    conv = conv.select(
        "conv_seq",
        "conv_id",
        (u_hot < 0.01).alias("is_hot"),
        arch.alias("arch"),
        F.greatest(
            F.lit(2),
            F.when(
                u_hot < 0.01,
                (base_turns * 50 * (0.5 + u_len)).cast("int"),
            ).otherwise((-F.log(u_len) * base_turns).cast("int") + 2),
        ).alias("n_turns"),
        (
            F.to_timestamp(F.lit(start))
            + F.make_interval(secs=(u_start * span_days * 86400.0))
        ).alias("conv_start"),
    )

    turns = conv.select(
        "conv_seq",
        "conv_id",
        "is_hot",
        "arch",
        "conv_start",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    u_gap = _u(seed, F.col("conv_seq"), F.col("turn_idx"), F.lit("gap"))
    u_big = _u(seed, F.col("conv_seq"), F.col("turn_idx"), F.lit("big"))
    mean_gap = (
        F.when(F.col("is_hot"), 900.0)
        .when(F.col("arch") == "agent", 7200.0)
        .when(F.col("arch") == "gappy", 1200.0)
        .when(F.col("arch") == "dense", 0.4)
        .otherwise(40.0)
    )
    gap_s = -F.log(u_gap) * mean_gap + F.when(
        (F.col("arch") == "gappy") & (u_big < 0.20),
        (u_big * 30.0) * 86400.0 + 3600.0,
    ).otherwise(0.0)
    turns = turns.withColumn("gap_s", F.when(F.col("turn_idx") == 0, 0.0).otherwise(gap_s))

    # cumulative gaps -> ts (one shuffle, partitioned by conv)
    w = Window.partitionBy("conv_seq").orderBy("turn_idx")
    turns = turns.withColumn("off_s", F.sum("gap_s").over(w)).withColumn(
        "ts", F.col("conv_start") + F.make_interval(secs=F.col("off_s"))
    )

    u_role = _u(seed, F.col("conv_seq"), F.col("turn_idx"), F.lit("role"))
    u_tool = _u(seed, F.col("conv_seq"), F.col("turn_idx"), F.lit("tool"))
    role = (
        F.when(u_role < 0.04, F.lit("tool"))
        .when(F.col("turn_idx") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    tool = F.when(
        (role == "assistant") & (u_tool < 0.25),
        F.element_at(
            F.array(*[F.lit(t) for t in _TOOLS]),
            (F.pmod(F.xxhash64(F.lit(seed), "conv_seq", "turn_idx", F.lit("tn")), F.lit(len(_TOOLS)))).cast("int") + 1,
        ),
    ).otherwise(F.lit(""))

    n_words = (
        F.pmod(F.xxhash64(F.lit(seed), "conv_seq", "turn_idx", F.lit("nw")), F.lit(58))
        + 3
    ).cast("int")
    word_pool = F.array(*[F.lit(wd) for wd in _WORDS])
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda i: F.element_at(
                word_pool,
                F.pmod(
                    F.xxhash64(F.lit(seed), F.col("conv_seq"), F.col("turn_idx"), i),
                    F.lit(len(_WORDS)),
                ).cast("int")
                + 1,
            ),
        ),
        " ",
    )

    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        "ts",
    )


def synth_documents(
    spark: SparkSession,
    n_docs: int = 100_000,
    seed: int = 7,
    mean_words: int = 120,
    n_sources: int = 20,
) -> DataFrame:
    """Deterministic synthetic ``documents`` table for corpus-pipeline
    tests/benches: (doc_id, text, lang, source, n_chars).

    Same design rules as :func:`synth_turns` — pure ``spark.range`` +
    value-hash expressions, byte-identical at any parallelism, no
    driver loops. Planted structure so every pipeline stage has work:

    * ~4% exact duplicates (text derived from an earlier doc's id, so
      the copy is generated, not joined);
    * ~3% near duplicates (same parent text with the last word changed
      — high n-gram Jaccard, distinct fingerprint);
    * ~5% low-quality spam (one word repeated: fails the Gopher
      repetition/stopword gates);
    * ~3% too-short docs (fail the word-count gate).
    """
    d = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    u_arch = _u(seed, F.col("doc_id"), F.lit("arch"))
    # dup/near-dup parents: an earlier doc id from a normal-range hash
    parent = F.pmod(
        F.xxhash64(F.lit(seed), F.col("doc_id"), F.lit("par")),
        F.greatest(F.col("doc_id"), F.lit(1)),
    )
    arch = (
        F.when(u_arch < 0.04, F.lit("dup"))
        .when(u_arch < 0.07, F.lit("near"))
        .when(u_arch < 0.12, F.lit("spam"))
        .when(u_arch < 0.15, F.lit("short"))
        .otherwise(F.lit("normal"))
    )
    d = d.select(
        "doc_id",
        arch.alias("arch"),
        F.when(arch.isin("dup", "near"), parent)
        .otherwise(F.col("doc_id"))
        .alias("text_key"),
    )

    word_pool = F.array(*[F.lit(wd) for wd in _WORDS])
    # every ~4th word is an English stopword so realistic docs pass the
    # Gopher stopword gate (spam docs still fail it: one repeated word)
    stop_pool = F.array(*[
        F.lit(wd)
        for wd in ("the", "and", "of", "to", "is", "in", "that", "it")
    ])

    def words_of(key, n):
        def pick(i):
            h = F.xxhash64(F.lit(seed), key, F.lit("w"), i)
            return F.when(
                F.pmod(h, F.lit(4)) == 0,
                F.element_at(stop_pool, F.pmod(h, F.lit(8)).cast("int") + 1),
            ).otherwise(
                F.element_at(
                    word_pool,
                    F.pmod(h, F.lit(len(_WORDS))).cast("int") + 1,
                )
            )

        return F.transform(F.sequence(F.lit(1), n), pick)

    key = F.col("text_key")
    u_len = _u(seed, key, F.lit("len"))
    n_words = F.when(F.col("arch") == "short", F.lit(5)).otherwise(
        (-F.log(u_len) * mean_words).cast("int") + 30
    )
    base_words = words_of(key, n_words)
    spam_word = F.element_at(
        word_pool,
        F.pmod(F.xxhash64(F.lit(seed), key, F.lit("sp")), F.lit(len(_WORDS)))
        .cast("int") + 1,
    )
    text = F.when(
        F.col("arch") == "spam",
        F.array_join(F.transform(F.sequence(F.lit(1), n_words), lambda i: spam_word), " "),
    ).when(
        F.col("arch") == "near",
        F.concat(
            F.array_join(F.slice(base_words, 1, n_words - 1), " "),
            F.lit(" changed"),
        ),
    ).otherwise(F.array_join(base_words, " "))

    src = F.format_string(
        "src%02d",
        F.pmod(F.xxhash64(F.lit(seed), "doc_id", F.lit("src")), F.lit(n_sources)).cast("int"),
    )
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("es"), F.lit("fr"), F.lit("de")),
        F.pmod(F.xxhash64(F.lit(seed), "doc_id", F.lit("lg")), F.lit(4)).cast("int") + 1,
    )
    return d.select(
        "doc_id",
        text.alias("text"),
        lang.alias("lang"),
        src.alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )


def write_turns(
    df: DataFrame, path: str, partition_by_day: bool = True, mode: str = "overwrite"
) -> None:
    """Persist bronze turns, partitioned by ts-day — the Spark analog of
    the reference archive's year/month directory pruning
    (utils.py:144-176): `WHERE ts BETWEEN ...` prunes partitions."""
    out = df.withColumn("ts_date", F.to_date("ts"))
    writer = out.write.mode(mode)
    if partition_by_day:
        writer = writer.partitionBy("ts_date")
    writer.parquet(path)
