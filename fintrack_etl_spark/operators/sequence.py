"""Sequence pattern matching over event streams — MATCH_RECOGNIZE-lite
(engine extension; Flink CEP / Trino MATCH_RECOGNIZE territory. The
reference's closest shape is the stateful line classifier in its PDF
parsers — parse/lines.py here — which is the same encode-then-scan
idea over document lines).

Each event maps to one character; a key's ordered history becomes a
compact string; patterns are plain regular expressions over that
alphabet ("vc+p" = view, one-or-more clicks, purchase). Matches are
scanned left-to-right, non-overlapping — the MATCH_RECOGNIZE
AFTER MATCH SKIP PAST LAST ROW default.

Engine-portability note: patterns over single-character classes with
contiguous-run quantifiers (the CEP common case) have UNIQUE match
extents, so Java regex (Spark) and RE2 (DuckDB) produce identical
match lists and the operator is value-oracle-checkable. Patterns with
genuinely ambiguous alternation lengths could differ between
leftmost-first and leftmost-longest engines — keep oracle-gated
patterns in the unambiguous class.

Scale shape: ONE shuffle (the per-key groupBy); the sequence encode is
a map, the regex scan is linear in the sequence, and per-key state is
bounded by that key's activity — the same envelope as sessionization.
A key with pathological history length is a data-quality signal, not
an operator limit (cap with a slice() on the sorted array if needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def encode_events(type_col: Column | str, mapping: dict[str, str]) -> Column:
    """Map an event-type column to its one-character code; unmapped
    types become '?' so they break match runs instead of vanishing
    (a gap in the history must not splice two half-patterns)."""
    c = F.col(type_col) if isinstance(type_col, str) else type_col
    expr = F.when(F.lit(False), F.lit(None))
    for k, v in mapping.items():
        assert len(v) == 1, (k, v)
        expr = expr.when(c == k, F.lit(v))
    return F.coalesce(expr, F.lit("?"))


def event_sequences(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    type_col: str,
    mapping: dict[str, str],
) -> DataFrame:
    """(key, seq): each key's full ordered history as one string.
    Deterministic ordering requires ``order_cols`` to be a total
    order per key (e.g. [ts, event_id])."""
    ordered = F.array_sort(
        F.collect_list(F.struct(*[F.col(c) for c in order_cols], F.col("__chr")))
    )
    return (
        df.withColumn("__chr", encode_events(type_col, mapping))
        .groupBy(key_col)
        .agg(
            F.concat_ws(
                "", F.transform(ordered, lambda s: s.getField("__chr"))
            ).alias("seq")
        )
    )


def match_pattern(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    type_col: str,
    mapping: dict[str, str],
    pattern: str,
) -> DataFrame:
    """Non-overlapping left-to-right pattern matches per key:
    (key, seq_len, n_matches, matched_chars — total characters inside
    matches, so callers can derive e.g. clicks-per-conversion without
    a second scan)."""
    seqs = event_sequences(df, key_col, order_cols, type_col, mapping)
    matches = F.expr(f"regexp_extract_all(seq, '{pattern}', 0)")
    return seqs.select(
        key_col,
        F.length("seq").cast("long").alias("seq_len"),
        F.size(matches).cast("long").alias("n_matches"),
        F.aggregate(
            F.transform(matches, F.length),
            F.lit(0),
            lambda a, x: a + x,
        ).cast("long").alias("matched_chars"),
    )
