"""Token-budget shard packing — the step between dedup/filtering and
training: assign each document to a shard so every shard carries
~``max_tokens`` tokens, deterministically, at corpus scale.

The naive formulation is a running sum over ONE global window — a
single-partition sort that dies at 100 TB. Here the cumulative token
count is a textbook distributed prefix-sum:

1. range-partition by the (deterministic) order key;
2. per-partition running sum — a window PARTITIONED by the physical
   partition id, so every partition sorts locally, no global exchange;
3. per-partition totals (one row per partition) → driver-side prefix
   offsets → broadcast back.

Only step 3 touches the driver, with O(#partitions) rows. Shard id is
``floor(prefix_before_doc / max_tokens)`` — a document is never split,
so a shard can overshoot by at most one document's tokens (the
standard greedy-pack contract); every shard except the last is at
least ``max_tokens`` minus that same slack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_documents_by_tokens(
    df: DataFrame,
    max_tokens: int,
    order_col: str = "doc_id",
    token_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``shard_id`` — greedy sequential packing in ``order_col``
    order, ≤ one document of overshoot per shard.

    Output: input columns + ``shard_id`` (bigint). Deterministic for a
    given (order_col, token_col): range partitioning, in-partition
    ordering, and the prefix offsets are all pure functions of the
    data.
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    # Bound the local-cumsum window's sort (the x80/r9 lesson): the
    # window's own clustering exchange would hash the `parts` pids into
    # spark.sql.shuffle.partitions buckets — per-task sort input then
    # grows as nrows/32 no matter what `parts` the caller sized for the
    # data. Feeding the window an explicit hash repartition on _pid (at
    # `parts` width; hash-on-key satisfies the clustering requirement,
    # so no second exchange appears) keeps per-task input at one range
    # partition's worth, i.e. caller-bounded at any corpus size.
    ranged = ranged.repartition(parts, "_pid")
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # localCheckpoint pins ONE materialization: repartitionByRange
    # samples its boundaries per execution, so without the pin the
    # totals pass and the final join could see different _pid layouts
    # and the prefix offsets would mis-align. LAZY: the totals collect
    # right below is the first action and persists the blocks as a
    # side effect of that same pass — eager would schedule one extra
    # full-data job per call (the suffix-doubling lesson, r8).
    local = ranged.withColumn("_cum_local", F.sum(token_col).over(w)).localCheckpoint(
        eager=False
    )

    # one row per partition → tiny driver collect → running offsets
    totals = (
        local.groupBy("_pid").agg(F.max("_cum_local").alias("_total")).orderBy("_pid").collect()
    )
    offsets, acc = {}, 0
    for r in totals:
        offsets[r["_pid"]] = acc
        acc += r["_total"]
    spark = df.sparkSession
    from ..io import local_rows

    off_df = local_rows(
        spark,
        [(pid, off) for pid, off in offsets.items()],
        "_pid bigint, _offset bigint",
    )

    prefix_before = F.col("_offset") + F.col("_cum_local") - F.col(token_col)
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn("shard_id", F.floor(prefix_before / F.lit(max_tokens)))
        .drop("_pid", "_cum_local", "_offset")
    )


def shard_summary(packed: DataFrame, token_col: str = "n_tokens") -> DataFrame:
    """Tokens and documents per shard — the packing-quality audit."""
    return (
        packed.groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum(token_col).alias("n_tokens"))
        .orderBy("shard_id")
    )
