"""Distributed bounded suffix-array construction (engine extension).

Prefix doubling (Manber–Myers) re-expressed as DataFrame rounds: after
round k every position holds the DENSE rank of its suffix truncated to
2^k characters; ``lead(rank, k)`` within the document supplies the
second sort key, and a distributed dense-rank over (rank, next_rank)
pairs produces the next round's ranks. ``log2(bound)`` rounds total —
the textbook O(n log n) construction, each round one range-partitioned
sort instead of a comparison sort over full suffixes.

The global dense rank is NEVER a single-partition window: rows are
``repartitionByRange`` on the pair (equal pairs land in one partition
by the range-partitioner contract), ranked within partitions, and
shifted by per-partition distinct-pair counts collected as an
O(#partitions) prefix sum — the same discipline as
``operators/packing.py``. At 100 TB this is the Terasort shape: the
only data-sized exchanges are the per-round range shuffles.

Reference analog: none (the suffix-sorting backbone of Lee et al.
2022's ExactSubstr dedup — x76 implements the gram-table variant;
this is the exact-ranks variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _distributed_dense_rank(
    df: DataFrame, cols: list[str]
) -> tuple[DataFrame, int, int, DataFrame]:
    """Append ``r``: the GLOBAL dense rank of ``cols`` (1-based),
    computed without a single-partition window: range-partition on the
    key (equal keys co-locate), dense-rank within each partition, then
    add per-partition offsets (cumulative distinct-key counts — an
    O(#partitions) collect, metadata not data). Returns
    (ranked, n_distinct, n_rows, part) — the caller's convergence
    probe is free because the offsets collect already carries both
    counts, and ``part`` is the checkpointed-block handle the caller
    unpersists once the NEXT round is materialized."""
    part = (
        df.repartitionByRange(*[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    # localCheckpoint: the offsets collect and the ranked output must
    # see the SAME partitioning; recomputation could re-sample range
    # boundaries and skew the offsets. LAZY (eager=False): the offsets
    # collect right below is the first action, so the blocks persist
    # as a side effect of that SAME pass — an eager checkpoint would
    # schedule one extra full-data job per doubling round (~25 % of
    # x80's wall at sf0.1, measured by the r8 scale probe work).
    part = part.localCheckpoint(eager=False)
    stats = {
        r["_pid"]: (r["_n"], r["_rows"])
        for r in part.groupBy("_pid")
        .agg(F.count_distinct(*cols).alias("_n"), F.count(F.lit(1)).alias("_rows"))
        .collect()
    }
    offsets, acc, total = {}, 0, 0
    for pid in sorted(stats):
        offsets[pid] = acc
        acc += stats[pid][0]
        total += stats[pid][1]
    off = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    ranked = (
        part.withColumn("_lr", F.dense_rank().over(w))
        .withColumn("r", (F.col("_lr") + off[F.col("_pid")]).cast("long"))
        .drop("_pid", "_lr")
    )
    return ranked, acc, total, part


def suffix_ranks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bound: int = 64,
    stats: dict | None = None,
) -> DataFrame:
    """Rank every (doc, position) by its suffix truncated to ``bound``
    chars, dense over the whole corpus — equal (bounded) suffixes share
    a rank, which is exactly what repeated-substring detection needs.
    Returns (id, p, srank) for every position (0-based).

    Round 0 ranks single characters; round k extends the compared
    prefix to 2^(k+1) chars via (rank, lead(rank, 2^k) within doc) —
    positions past the doc end compare as rank 0 (smaller than any
    real rank), matching the oracle's plain string comparison where a
    shorter suffix that is a prefix of a longer one sorts first.
    """
    # Initial ranks cover a 4-char block (one string sort of short
    # keys), not single chars: rounds = 1 + log2(bound/4) instead of
    # log2(bound) — at gate scale the fixed per-round job overhead
    # dominates, so two fewer rounds is ~a third of the wall. A block
    # shorter than 4 (suffix tail) compares as the shorter string,
    # exactly like the oracle's substring comparison.
    init_w = 4
    # bound must be 4·2^n: the loop doubles the compared prefix from 4
    # and the last round (k = bound/2) compares exactly `bound` chars —
    # any other bound would silently compare up to 2k > bound chars,
    # breaking the "truncated to bound" contract (and the oracle).
    if bound < init_w or bound & (bound - 1):
        raise ValueError(f"bound must be a power of two >= {init_w}, got {bound}")
    chars = F.expr(f"filter(split({text_col}, ''), c -> c <> '')")
    # empty-text guard (same trap as gram_store/pcm_fingerprint):
    # sequence(0, size-1) with size 0 is the DESCENDING [0, -1], and the
    # p = -1 element evaluates slice(t, 0, ·) → 'array indices start at
    # 1' — guard INSIDE the expression so Catalyst can't re-derive an
    # unguarded copy.
    grams = F.transform(
        F.array(chars),  # let-binding: chars evaluated once per row
        lambda t: F.when(
            F.size(t) >= 1,
            F.transform(
                F.sequence(F.lit(0), F.size(t) - 1),
                lambda p: F.array_join(F.slice(t, p + 1, init_w), ""),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )[0]
    pos = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(grams).alias("p", "ch"),
    )
    r0, nd, nrows, prev_part = _distributed_dense_rank(pos, ["ch"])
    ranked = r0.select(
        "id", F.col("p").cast("long").alias("p"), F.col("r").alias("rank")
    )
    k = init_w
    if stats is not None:
        # scale-probe counter (tools/scale_probe.py): doubling rounds
        # incl. round 0 — growth here, not per-round cost, is the
        # superlinear risk the probe watches
        stats["rounds"] = 1
    # EARLY TERMINATION: once every position's rank is unique, further
    # doubling cannot change any rank (all pairs already distinct) —
    # natural text distinguishes suffixes in 3-4 rounds, and the probe
    # is free (counts ride the offsets collect). Exact-duplicate
    # suffixes never become unique, so the equal-rank contract for
    # repeated substrings is unaffected by stopping "early": we stop
    # only when NOTHING can change, or at the bound.
    while k < bound and nd < nrows:
        if stats is not None:
            stats["rounds"] += 1
        wdoc = Window.partitionBy("id").orderBy("p")
        paired = ranked.withColumn(
            "nrk", F.coalesce(F.lead("rank", k).over(wdoc), F.lit(0))
        )
        rk, nd, nrows, new_part = _distributed_dense_rank(paired, ["rank", "nrk"])
        # the new round's offsets collect just materialized new_part's
        # blocks, which embed everything they need from the previous
        # round — the previous round's checkpoint blocks are dead
        # weight from here on (before this, ALL rounds' position
        # tables stayed resident for the session: ~4 × corpus chars of
        # block-manager pressure on every downstream query)
        from .memo import unpersist_checkpointed

        unpersist_checkpointed(prev_part)
        prev_part = new_part
        ranked = rk.select("id", "p", F.col("r").alias("rank"))
        k *= 2
    return ranked.select(
        F.col("id").alias(id_col), "p", F.col("rank").alias("srank")
    )
