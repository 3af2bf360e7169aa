"""Time-series gap filling — densify a per-key calendar and carry
observations forward.

The continuous-aggregate family (``aggregate.time_bucket_agg``) leaves
holes where a key had no events; downstream consumers (budget pacing,
charting, feature windows) need one row per (key, bucket). This
operator generates each key's missing buckets with ``sequence`` +
``explode`` — an executor-side expansion, no driver loop, no cross
join against a global calendar — then left-joins observations back and
forward-fills with the classic last-non-null frame (W2).

Scale notes: the expansion is proportional to (span × keys), not to
the raw event count; the join and the fill share one shuffle key, so
the whole densify is 2 exchanges regardless of input size. A global
calendar cross join would instead explode to |keys| × |max span| and
shuffle all of it — per-key spans prune that to what each key needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_daily(
    df: DataFrame,
    key_col: str,
    date_col: str,
    value_col: str,
) -> DataFrame:
    """One row per (key, day) between each key's first and last
    observed day; ``value_col`` forward-filled, ``is_observed`` marking
    real rows. Input must be one row per (key, day)."""
    spans = df.groupBy(key_col).agg(
        F.min(date_col).alias("_d0"), F.max(date_col).alias("_d1")
    )
    calendar = spans.select(
        key_col, F.explode(F.sequence("_d0", "_d1")).alias(date_col)
    )
    joined = calendar.join(df, [key_col, date_col], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        key_col,
        date_col,
        F.last(value_col, ignorenulls=True).over(w).alias(value_col),
        F.col(value_col).isNotNull().alias("is_observed"),
    )
