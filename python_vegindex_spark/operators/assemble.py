"""Conversation assembly: transcripts -> one document per conversation.

The bridge between the engine's two data shapes: the turn table
(conv_id, turn_idx, role, text, tool, ts — the north-rule input) and
the document corpus every text operator consumes (dedup, quality
gates, vocab, chunking, packing). This is the SFT-export / corpus-
build step: role-tagged turns joined in stable (conv_id, turn_idx)
order — the exact per-row invariant ``tests/test_text_invariant.py``
pins for the raw layers, carried through to the derived corpus.

Scale shape: ONE shuffle keyed by the conversation id (one
conversation = one group; conv ids are near-uniform under hashing, and
a single conversation never exceeds one group — the natural partition
of transcript data). ``array_sort`` over (order..., role, text)
structs pins the intra-group order deterministically; the struct sort
key starts with the caller's order columns, which the contract
requires to be unique per conversation (turn_idx is). ``max_turns``
truncates the OUTPUT to the sorted prefix — note it does NOT bound the
aggregation buffer: ``collect_list`` materializes the whole
conversation per group before the slice (inherent to sort-after-
collect; conversations are short relative to executor memory by the
transcript data contract). For a corpus with adversarially long
conversations pass ``max_buffer_turns`` — it pre-filters
``order_cols[0] < N`` (0-based turn index) BEFORE the collect_list,
bounding the buffer itself.

All JVM built-ins (collect_list / array_sort / slice / transform /
array_join) — no Python in the path, no window function.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INT_TYPES = frozenset({"tinyint", "smallint", "int", "bigint"})

# sentinel: "derive the buffer bound from max_turns when safe" — distinct
# from an explicit None (= unbounded buffer, the pre-round-5 behavior)
_AUTO = object()


def assemble_conversations(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_cols: Sequence[str] = ("turn_idx",),
    role_col: str = "role",
    text_col: str = "text",
    sep: str = "\n",
    role_sep: str = ": ",
    max_turns: int | None = None,
    max_buffer_turns=_AUTO,
) -> DataFrame:
    """One document per conversation.

    Output: ``conv_col``, ``text`` (role-tagged turns joined by
    ``sep``), ``n_turns`` (turns kept after the ``max_turns``
    truncation), ``n_chars`` (length of the assembled text). NULL
    role/text render as empty strings (a NULL payload must not
    blank the whole document). Rows with a NULL conversation id are
    dropped — they have no home document.

    ``max_buffer_turns`` bounds the AGGREGATION BUFFER, not just the
    output: rows with ``order_cols[0] >= max_buffer_turns`` are
    filtered BEFORE the collect_list, so a pathological million-turn
    conversation never materializes in one group buffer. It requires
    the first order column to be a 0-based dense turn index (the
    transcript contract's ``turn_idx``); when both bounds are given,
    ``max_buffer_turns`` must be >= ``max_turns`` or the output would
    be silently shorter than asked — that combination raises.

    The safe path is the DEFAULT — narrowly: when ``max_turns`` is set
    AND the first order column is the integer-typed contract column
    ``turn_idx`` (whose documented semantics are a 0-based dense index
    — sources/synth, the input_hint schema), the buffer bound defaults
    to ``max_turns``; under that contract the two are
    output-equivalent, and the group buffer is bounded too. Any OTHER
    order column — a timestamp, an event id, an integer that might be
    1-based or gapped — never auto-bounds, because a static
    ``order < max_turns`` filter is only prefix-equivalent for dense
    0-based indices (for ``turn_idx`` values 1..N it would drop the
    last turn; for global-id ordering it could drop whole
    conversations). Pass ``max_buffer_turns`` explicitly to bound
    those, or ``max_buffer_turns=None`` to force the unbounded
    pre-round-5 behavior even for ``turn_idx``.

    Rows whose first order column is NULL are KEPT under the buffer
    bound (``< N OR IS NULL``) — ``array_sort`` orders them before all
    non-NULL turns (ascending NULLS FIRST), exactly where the
    unbounded path puts them, so opting into the bound never silently
    drops NULL-indexed turns.
    """
    if max_turns is not None and max_turns < 1:
        raise ValueError(f"max_turns must be >= 1, got {max_turns}")
    if max_buffer_turns is _AUTO:
        first = order_cols[0] if order_cols else ""
        first_type = dict(turns.dtypes).get(first)
        max_buffer_turns = (
            max_turns
            if max_turns is not None
            and first == "turn_idx"
            and first_type in _INT_TYPES
            else None
        )
    if max_buffer_turns is not None:
        if max_buffer_turns < 1:
            raise ValueError(
                f"max_buffer_turns must be >= 1, got {max_buffer_turns}"
            )
        if max_turns is not None and max_buffer_turns < max_turns:
            raise ValueError(
                f"max_buffer_turns ({max_buffer_turns}) < max_turns "
                f"({max_turns}): the buffer bound would truncate the "
                "requested output"
            )
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    if max_buffer_turns is not None:
        turns = turns.where(
            (F.col(order_cols[0]) < max_buffer_turns)
            | F.col(order_cols[0]).isNull()
        )
    struct_cols = [F.col(c) for c in order_cols] + [
        F.coalesce(F.col(role_col).cast("string"), F.lit("")).alias("_r"),
        F.coalesce(F.col(text_col).cast("string"), F.lit("")).alias("_t"),
    ]
    arr = F.array_sort(F.collect_list(F.struct(*struct_cols)))
    grouped = (
        turns.where(F.col(conv_col).isNotNull())
        .groupBy(conv_col)
        .agg(arr.alias("_arr"))
    )
    kept = (
        F.slice(F.col("_arr"), 1, int(max_turns))
        if max_turns is not None
        else F.col("_arr")
    )
    text = F.array_join(
        F.transform(
            kept, lambda x: F.concat(x["_r"], F.lit(role_sep), x["_t"])
        ),
        sep,
    )
    return grouped.select(
        conv_col,
        text.alias("text"),
        F.size(kept).cast("long").alias("n_turns"),
        F.length(text).cast("long").alias("n_chars"),
    )
