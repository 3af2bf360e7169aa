"""Skew-mitigation operators (engine extensions, SURVEY.md §2 scale
notes).

AQE's skew-join handling splits oversized *shuffle* partitions, but it
cannot help a skewed aggregation key (one reducer still owns the hot
key's final combine) and it only kicks in past its size thresholds.
These operators remove the hot-key bottleneck structurally:

* ``salted_group_agg`` — two-phase aggregate: spread each key over
  ``buckets`` salt values so the hot key's partial aggregation runs on
  ``buckets`` cores, then combine the tiny per-salt partials. Works for
  any re-aggregatable measure (sum/count/min/max).
* ``salted_join`` — replicate the small(er) side once per salt value
  and split the big side's hot keys across ``(key, salt)`` pairs, so
  no single task owns an entire hot key. Use when the small side is too
  big to broadcast but small enough to replicate ``buckets``×.

Salt assignment never changes results — only placement — so both
operators are value-identical to their unsalted forms (which is exactly
what their DuckDB oracles check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_group_agg(
    df: DataFrame,
    keys: list[str],
    value: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregate → one row per key with
    ``n``/``total``/``vmin``/``vmax`` over ``value``.

    Phase 1 shuffles on (keys, salt) — ``buckets`` partials per hot key
    instead of one giant reducer; phase 2 combines |keys|×buckets tiny
    rows. At 100 TB the second shuffle is negligible (bounded by
    distinct keys × buckets, not by input rows).
    """
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(buckets)).alias(_SALT)
    partial = (
        df.select(*keys, salt, F.col(value))
        .groupBy(*keys, _SALT)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(value).alias("_s"),
            F.min(value).alias("_mn"),
            F.max(value).alias("_mx"),
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias("n"),
        F.sum("_s").alias("total"),
        F.min("_mn").alias("vmin"),
        F.max("_mx").alias("vmax"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    dist_col: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the big side is salted by hashing
    ``dist_col`` (any roughly-uniform column, e.g. the fact table's
    primary key), the small side is replicated once per salt value, and
    the join runs on ``on + [salt]`` — each hot key's rows land on
    ``buckets`` different reducers.

    Value-identical to ``big.join(small, on, how)`` ONLY for
    ``inner``/``left``: for right/full-outer (and semi/anti) the
    ``buckets``×-replicated small side would emit its unmatched rows
    once per salt value, changing results — so those modes are
    rejected rather than silently wrong.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "the replicated small side duplicates unmatched rows under "
            "right/full_outer/semi/anti"
        )
    salted_big = big.withColumn(
        _SALT, F.pmod(F.xxhash64(dist_col), F.lit(buckets)).cast("int")
    )
    replicated = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return salted_big.join(replicated, on + [_SALT], how).drop(_SALT)
