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


def choose_join_strategy(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    *,
    how: str = "inner",
    dist_col: str | None = None,
    broadcast_threshold_rows: int = 500_000,
    skew_frac: float = 0.05,
    buckets: int = 8,
    depth: int = 4,
    width: int = 1024,
) -> tuple[str, DataFrame, dict]:
    """Sketch-driven join planning (VERDICT r3 next-round #7): pick
    broadcast vs plain shuffle vs salted from Count-Min estimates of
    the two key distributions WITHOUT a full pre-join — the decision
    reads two depth×width integer grids, never the data twice at
    planner level.

    Signals (all from the sketches):

    - side row counts — each sketch row sums to exactly N, so totals
      are free and exact;
    - heavy-key upper bound — ``min over depth of (max cell)`` bounds
      the most frequent key's count from above (CM never undercounts);
    - expected join output — ``incremental.count_min_join_size``'s
      bucket-dot-product estimate, returned as diagnostics.

    Decision: the smaller side under ``broadcast_threshold_rows`` →
    ``'broadcast'`` (hint injected, map-side join, no shuffle of the
    big side); else if the bigger side's heavy-key bound exceeds
    ``skew_frac`` of its rows → ``'salted'`` (``salted_join``: hot
    keys split across ``buckets`` reducers); else ``'shuffle'`` (plain
    equi-join, Catalyst/AQE pick the physical op). Mode guards mirror
    ``salted_join``/broadcast semantics: a 'left' join can only
    broadcast its right side and only salt when the LEFT side is the
    big one — ineligible combinations degrade to 'shuffle' rather
    than change results.

    At 100 TB the sketches are not built inline like this — they are
    maintained incrementally per partition/day and merged
    (``merge_count_min_state``), so planning reads only metadata; the
    inline build here is one narrow pass per side.

    Returns ``(strategy, joined_df, info)`` where info carries the
    sketch scalars that drove the choice."""
    from .incremental import count_min_join_size, count_min_state

    on = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"choose_join_strategy supports inner/left, got {how!r}")

    def _key(df: DataFrame) -> DataFrame:
        return df.select(
            F.concat_ws("\x1f", *[F.col(c).cast("string") for c in on]).alias("_k")
        )

    sl = count_min_state(_key(left), "_k", depth=depth, width=width)
    sr = count_min_state(_key(right), "_k", depth=depth, width=width)

    def _scalars(state: DataFrame) -> tuple[int, int]:
        rows = state.groupBy("sketch_row").agg(
            F.sum("cnt").alias("tot"), F.max("cnt").alias("mx")
        ).collect()
        if not rows:
            return 0, 0
        # every row sums to N (exact); heavy bound = min of row maxima
        return max(r["tot"] for r in rows), min(r["mx"] for r in rows)

    tot_l, mx_l = _scalars(sl)
    tot_r, mx_r = _scalars(sr)
    est_out = count_min_join_size(sl, sr) if tot_l and tot_r else 0
    left_is_big = tot_l >= tot_r
    big, small = (left, right) if left_is_big else (right, left)
    tot_big, mx_big = (tot_l, mx_l) if left_is_big else (tot_r, mx_r)
    tot_small = min(tot_l, tot_r)
    info = {
        "rows_left": tot_l,
        "rows_right": tot_r,
        "est_max_key_freq_big": mx_big,
        "est_join_rows": est_out,
    }

    left_only = how != "inner"  # left joins constrain build side / salting
    if tot_small <= broadcast_threshold_rows and (left_is_big or not left_only):
        # broadcast the small side; for 'left' the build side must be
        # the right operand, which the guard above ensures
        joined = (
            left.join(F.broadcast(right), on, how)
            if left_is_big
            else F.broadcast(left).join(right, on, how)
        )
        return "broadcast", joined, info

    skewed = tot_big > 0 and mx_big >= max(1.0, skew_frac * tot_big)
    if skewed and (left_is_big or not left_only):
        dc = dist_col
        big2 = big
        if dc is None:
            dc = "__cjs_rid"
            big2 = big.withColumn(dc, F.monotonically_increasing_id())
        joined = salted_join(big2, small, on, dc, buckets=buckets, how=how)
        if dist_col is None:
            joined = joined.drop(dc)
        return "salted", joined, info

    return "shuffle", left.join(right, on, how), info
