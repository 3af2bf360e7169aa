"""Joins (reference parity: J1-J5, SURVEY.md §2.3).

The reference's joins are pandas merges on the driver
(``compare_budget.py:69-78``) and SQL MERGE (``datatrack_spark_utils.py:306-362``).
Here they are distributed equi-joins; small sides are explicitly
broadcast so no shuffle lands on the big fact table at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .aggregate import mode_per_group

#: sorted_neighborhood_pairs: widest partition layout whose rank
#: offsets are attached as a literal-array lookup; wider layouts fall
#: back to the broadcast-join form (a 100k-element literal array would
#: bloat analysis/codegen, while 4096 longs is a ~32 KiB expression).
_LITERAL_OFFSET_MAX = 4096


def budget_vs_actual(
    budget: DataFrame,
    actual: DataFrame,
    key: str = "categoria",
    budget_col: str = "orcado",
    actual_col: str = "realizado",
) -> DataFrame:
    """J1 — budget ⟗ actuals with overrun analytics
    (``compare_budget.py:66-93``).

    Full-outer on the category key; unmatched actuals flagged
    ``sem_orcamento``; derived ``diferenca``/``status``/``pct_esto``.

    No broadcast hint on purpose: Spark cannot broadcast either side
    of a FULL OUTER join (it would miss the unmatched build-side rows),
    so a hint only logs a warning and falls back. Both inputs here are
    post-aggregation category tables (|distinct categories| rows), so
    the sort-merge exchange moves a few hundred bytes at any data
    scale — the heavy lifting already happened in the upstream agg.

    Inputs must be cent-grid doubles (exact multiples of 0.01 — what
    every upstream money agg emits); the analytics run on the recovered
    EXACT integer cents, so ``diferenca``/``status`` can never sit on a
    float rounding boundary and ``pct_esto`` is floor-scaled centi-
    percent — bit-identical across engines (the ext_correlation
    discipline; round(diff/orcado·100, 2) can land exactly on .xx5).
    """
    joined = actual.join(budget, key, "full_outer")
    oc = F.coalesce(F.expr(f"CAST(round({budget_col} * 100) AS BIGINT)"), F.lit(0))
    rc = F.coalesce(F.expr(f"CAST(round({actual_col} * 100) AS BIGINT)"), F.lit(0))
    diff_c = rc - oc
    return joined.select(
        F.col(key),
        (oc / 100.0).alias(budget_col),
        (rc / 100.0).alias(actual_col),
        F.col(budget_col).isNull().alias("sem_orcamento"),
        (diff_c / 100.0).alias("diferenca"),
        F.when(diff_c <= 0, "OK").otherwise("ESTOURO").alias("status"),
        (
            F.when(
                oc > 0,
                F.floor((diff_c * 10000).cast("double") / oc) / 100.0,
            )
        ).alias("pct_esto"),
    )


def mode_backfill(
    df: DataFrame,
    group_key: str,
    value: str,
) -> DataFrame:
    """J2 — fill NULL ``value`` from the per-group mode
    (``bradesco_bill.py:322-330``): group → mode → broadcast-join back
    → coalesce. The mode table is |distinct keys| rows → broadcast.
    """
    modes = mode_per_group(df, [group_key], value)
    alias = f"{value}_mode"
    return (
        df.join(F.broadcast(modes), group_key, "left")
        .withColumn(value, F.coalesce(F.col(value), F.col(alias)))
        .drop(alias)
    )


def enrich_with_constants(df: DataFrame, constants: dict) -> DataFrame:
    """J5 — attach document-level resumo fields to every row
    (``bradesco_bill.py:332-335``) as literal columns."""
    out = df
    for name, value in constants.items():
        out = out.withColumn(name, F.lit(value))
    return out


def semi_join(left: DataFrame, right: DataFrame, on: list[str] | str) -> DataFrame:
    """Extension — EXISTS (needed by MERGE matched-semantics, J3)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: list[str] | str) -> DataFrame:
    """Extension — NOT EXISTS (MERGE not-matched / idempotent replace D2)."""
    return left.join(right, on, "left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Extension — backward as-of join: attach to each left row the
    right row with the greatest ``right_ts <= left_ts`` per key.

    Spark-first formulation: tag both sides, union, ONE shuffle on the
    join keys, forward-fill the right payload down event time, keep the
    left rows. No range state, no per-key loops — at 100 TB this is a
    single hash partitioning by key with a sort within partitions, and
    skew handling falls out of AQE like any other shuffle. (The
    point-in-time alternative — broadcast + windowed lookup — only wins
    when the right side fits in memory; this version needs neither side
    small.)

    ``right_cols`` maps right column → output name; defaults to every
    non-key, non-ts right column under an ``asof_`` prefix, plus
    ``asof_ts`` for the matched timestamp. Ties on the timestamp are
    resolved right-side-first (a quote at exactly the trade's time is
    visible to it), matching ``ON right_ts <= left_ts`` semantics.
    """
    if right_cols is None:
        right_cols = {
            c: f"asof_{c}" for c in right.columns if c not in on and c != right_ts
        }
    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in right_cols]
    )
    l2 = left.select(
        *on,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__l"),
    )
    r2 = right.select(
        *on, F.col(right_ts).alias("__t"), F.lit(0).alias("__side"), payload.alias("__r")
    )
    unioned = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    m = F.col("__m")
    return filled.filter(F.col("__side") == 1).select(
        F.col("__l.*"),
        m["__ts"].alias("asof_ts"),
        *[m[src].alias(out) for src, out in right_cols.items()],
    )


def range_join(
    fact: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """Extension — band/range join: match each fact row to the range
    rows with ``lo <= value < hi``. The ranges side is a dimension
    (tiers, buckets, SLA bands) — explicitly broadcast so the physical
    plan is a BroadcastNestedLoopJoin streaming over the fact table with
    zero shuffle; the fact side never moves, which is the only strategy
    that survives a 100 TB fact scan."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return fact.join(F.broadcast(ranges), cond, how)


def fuzzy_self_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    max_dist: int = 3,
    max_block_size: int | None = None,
) -> DataFrame:
    """Extension — blocked fuzzy matching: all pairs of rows in the
    same block whose ``text_col`` values are within ``max_dist``
    Levenshtein edits (entity-resolution / near-duplicate-name
    detection).

    Blocking is the scale contract: the self-join equi-joins on
    ``block_cols`` FIRST, so the quadratic edit-distance work is
    per-block, never corpus-wide — the same shape as the shingle-
    blocked n-gram dedup (dedup_text.py). Pick block keys so the
    largest block stays small (a hot block is a skew key like any
    other — salt it or tighten the key). ``levenshtein`` is a native
    JVM expression with identical unit-cost semantics in DuckDB, so
    pair sets are exactly oracle-checkable. ``id_l < id_r``
    canonicalizes pairs (no self/mirrored matches).

    ``max_block_size`` is the hard quadratic quarantine (VERDICT r5
    #5, x41's basket-cap discipline): blocks larger than the cap emit
    NO pairs — one hot block (an empty-string key, a tokenizer bug, a
    skewed merchant) otherwise goes O(n²) and owns the stage. Use
    :func:`fuzzy_block_audit` to surface what was quarantined; a cap
    an order of magnitude above the expected block size costs one
    |blocks|-row broadcast and fires only on pathology.
    """
    if max_block_size is not None:
        sizes = df.groupBy(*block_cols).agg(F.count(F.lit(1)).alias("__bn"))
        keep = sizes.filter(F.col("__bn") <= max_block_size).drop("__bn")
        df = df.join(F.broadcast(keep), block_cols, "left_semi")
    a = df.select(
        F.col(id_col).alias("id_l"),
        F.col(text_col).alias("text_l"),
        *[F.col(c).alias(f"__b{i}") for i, c in enumerate(block_cols)],
    )
    b = df.select(
        F.col(id_col).alias("id_r"),
        F.col(text_col).alias("text_r"),
        *[F.col(c).alias(f"__c{i}") for i, c in enumerate(block_cols)],
    )
    cond = [F.col(f"__b{i}") == F.col(f"__c{i}") for i in range(len(block_cols))]
    # Length pre-filter INSIDE the join condition: |len_l − len_r| >
    # max_dist already implies dist > max_dist, so most in-block pairs
    # never reach the DP at all; the bounded levenshtein then runs the
    # banded O(max_dist·n) algorithm instead of the full O(n²) table
    # (it returns -1 past the threshold — those pairs are exactly the
    # ones the <= max_dist filter drops). Together ~4x on 450-row
    # blocks (12 -> 3 s at sf0.1) with bit-identical surviving pairs.
    len_gate = (
        F.abs(F.length("text_l") - F.length("text_r")) <= max_dist
    )
    pairs = a.join(b, cond + [F.col("id_l") < F.col("id_r"), len_gate], "inner")
    dist = F.levenshtein("text_l", "text_r", max_dist)
    return pairs.select(
        "id_l",
        "id_r",
        "text_l",
        "text_r",
        # block cols are pair-invariant — emit them under their original
        # names so callers group without re-joining the source
        *[F.col(f"__b{i}").alias(c) for i, c in enumerate(block_cols)],
        dist.alias("dist"),
    ).where((F.col("dist") >= 0) & (F.col("dist") <= max_dist))


def fuzzy_block_audit(
    df: DataFrame, block_cols: list[str], max_block_size: int
) -> DataFrame:
    """The quarantine ledger for :func:`fuzzy_self_pairs`: one row per
    block LARGER than ``max_block_size`` — (block keys, n_rows,
    n_pairs_skipped). At 100 TB this is the table an operator reviews
    to decide whether a hot block is data pathology (drop it) or a
    blocking-key problem (tighten the key / salt) — silent truncation
    would read as 'covered everything' when it didn't."""
    n = F.col("__bn")
    return (
        df.groupBy(*block_cols)
        .agg(F.count(F.lit(1)).alias("__bn"))
        .filter(n > max_block_size)
        .select(
            *block_cols,
            n.cast("long").alias("n_rows"),
            (n * (n - 1) / 2).cast("long").alias("n_pairs_skipped"),
        )
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_col,
    window: int = 5,
    num_partitions: int | None = None,
) -> DataFrame:
    """Extension — sorted-neighborhood blocking (Hernández/Stolfo SNM):
    sort all records by a blocking key, slide a window of ``window``
    rows over the sorted order, and emit every in-window pair. The
    classic complement to equi-key blocking (``fuzzy_self_pairs``):
    equi-blocks miss near-misses that straddle a block boundary, SNM
    catches anything the sort brings within ``window`` positions,
    regardless of block membership.

    Distributed shape — no single-partition window:

    1. ``repartitionByRange`` + in-partition sort on ``(key, id)``
       gives a total order across partitions; the global rank is the
       per-partition row index plus a prefix-sum of partition counts
       (one O(#partitions) driver collect, same discipline as
       ``packing.pack_documents_by_tokens``). r12: the per-partition
       index comes from ``monotonically_increasing_id`` evaluated
       above the in-partition sort (pid in the upper 31 bits, row
       index in partition order in the lower 33 — nondeterministic-
       flagged, so the optimizer cannot move it below the Sort, and
       the localCheckpoint pins one materialization exactly as it
       already did for the range layout) instead of
       ``row_number() OVER (PARTITION BY pid)``, which forced a
       second, hash-on-pid exchange of every row plus a window sort.
       One exchange total, down from two (guide §2.4).
    2. In-window pairs (rank gap 1..window-1) come from ONE equi-join:
       with ``step = window - 1``, ranks at most ``step`` apart have
       bucket ids ``rank div step`` differing by at most 1, so the
       probe side is duplicated into its own bucket and the previous
       one (2x fanout, pigeonhole-complete) and the join is a plain
       shuffle equi-join on the bucket id — never an all-pairs
       product, never a driver sort. r12: the bucket is integer
       ``div``, not ``FLOOR(double/double)`` (same value for the
       nonnegative ranks, no double round-trip), and the prefix-sum
       offsets are attached as a LITERAL array lookup
       (``element_at(array<offsets>, pid+1)``) rather than a
       broadcast join — the offsets are already on the driver from
       the totals collect, and the join forced a broadcast exchange
       + hash join per consumer subtree (two in the x66 plan, 26
       nodes → 14). Above ``_LITERAL_OFFSET_MAX`` partitions the
       literal would bloat the plan, so huge layouts keep the
       broadcast-join form.

    Output: ``src`` / ``dst`` (id pairs, src rank < dst rank),
    ``key_l`` / ``key_r``, ``gap`` (rank distance, 1..window-1).
    Deterministic: the order ``(key, id)`` is total.
    """
    step = window - 1
    if step < 1:
        raise ValueError("window must be >= 2")
    spark = df.sparkSession
    parts = num_partitions or spark.sparkContext.defaultParallelism
    key_expr = F.col(key_col) if isinstance(key_col, str) else key_col
    keyed = df.select(F.col(id_col).alias("_id"), key_expr.alias("_key"))
    # localCheckpoint pins one materialization: repartitionByRange
    # samples boundaries per execution, so without the pin the count
    # pass and the rank pass could see different layouts. LAZY: the
    # totals collect below is the first action and persists the
    # blocks in the same pass (one fewer full-data job per call).
    local = (
        keyed.repartitionByRange(parts, "_key", "_id")
        .sortWithinPartitions("_key", "_id")
        .withColumn("_mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=False)
    )
    pid = F.shiftright(F.col("_mid"), 33)
    rn_local = F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1)) + F.lit(1)
    totals = (
        local.groupBy(pid.alias("_pid")).agg(F.count(F.lit(1)).alias("_n"))
        .orderBy("_pid")
        .collect()
    )
    offsets, acc = {}, 0
    for r in totals:
        offsets[int(r["_pid"])] = acc
        acc += r["_n"]
    n_pids = (max(offsets) + 1) if offsets else 1
    if n_pids <= _LITERAL_OFFSET_MAX:
        off_arr = F.array(
            *[F.lit(offsets.get(p, 0)).cast("long") for p in range(n_pids)]
        )
        rank = F.element_at(off_arr, (pid + F.lit(1)).cast("int")) + rn_local
        ranked = local.select("_id", "_key", rank.alias("_rank"))
    else:  # plan-bloat guard: keep the broadcast-join form at extreme widths
        from ..io import local_rows

        off_df = local_rows(
            spark,
            [(p, off) for p, off in offsets.items()],
            "_pid bigint, _offset bigint",
        )
        ranked = (
            local.withColumn("_pid", pid)
            .join(F.broadcast(off_df), "_pid")
            .select(
                "_id",
                "_key",
                (F.col("_offset") + rn_local).alias("_rank"),
            )
        )
    bkt = F.expr(f"_rank div {step}")
    anchor = ranked.select(
        F.col("_id").alias("src"),
        F.col("_key").alias("key_l"),
        F.col("_rank").alias("_ra"),
        bkt.alias("_bkt"),
    )
    probe = ranked.select(
        F.col("_id").alias("dst"),
        F.col("_key").alias("key_r"),
        F.col("_rank").alias("_rb"),
        F.explode(F.array(bkt, bkt - 1)).alias("_bkt"),
    )
    return (
        anchor.join(probe, "_bkt")
        .where(
            (F.col("_rb") > F.col("_ra")) & (F.col("_rb") - F.col("_ra") <= step)
        )
        .select(
            "src",
            "dst",
            "key_l",
            "key_r",
            (F.col("_rb") - F.col("_ra")).alias("gap"),
        )
    )
