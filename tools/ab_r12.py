"""r12 same-session A/B harness — old vs new forms of the queries this
round rewrites, interleaved in ONE session so host weather hits both
sides equally. The timed action matches bench.py (toRdd().count(), warm
and cold-ish first-run numbers both printed)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from fintrack_etl_spark.io import table
from fintrack_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(df, n=3):
    rdd = df._jdf.queryExecution().toRdd()
    outs = []
    for _ in range(n):
        t0 = time.time()
        rdd.count()
        outs.append(round(time.time() - t0, 3))
    return outs  # first entry carries codegen/AQE compile; min = warm


def x41_old(spark):
    li = table(spark, "lineitem", SF_DIR)
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") <= 1000)
    )
    pair_expr = F.expr(
        "flatten(transform(parts, (x, i) -> "
        "transform(slice(parts, i + 2, size(parts)), "
        "y -> struct(x AS part_a, y AS part_b))))"
    )
    pairs = (
        baskets.select(F.explode(pair_expr).alias("p"))
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders_together"))
    )
    return pairs.orderBy(F.col("n_orders_together").desc(), "part_a", "part_b").limit(20)


def x66_old_pairs(df, id_col, key_col, window=5, num_partitions=None):
    spark = df.sparkSession
    step = window - 1
    parts = num_partitions or spark.sparkContext.defaultParallelism
    key_expr = F.col(key_col) if isinstance(key_col, str) else key_col
    keyed = df.select(F.col(id_col).alias("_id"), key_expr.alias("_key"))
    ranged = keyed.repartitionByRange(parts, "_key", "_id").withColumn(
        "_pid", F.spark_partition_id()
    )
    ranged = ranged.repartition(parts, "_pid")
    w = Window.partitionBy("_pid").orderBy("_key", "_id")
    local = ranged.withColumn("_rn_local", F.row_number().over(w)).localCheckpoint(
        eager=False
    )
    totals = (
        local.groupBy("_pid").agg(F.max("_rn_local").alias("_n")).orderBy("_pid").collect()
    )
    offsets, acc = {}, 0
    for r in totals:
        offsets[r["_pid"]] = acc
        acc += r["_n"]
    from fintrack_etl_spark.io import local_rows

    off_df = local_rows(
        spark,
        [(pid, off) for pid, off in offsets.items()],
        "_pid bigint, _offset bigint",
    )
    ranked = local.join(F.broadcast(off_df), "_pid").select(
        "_id", "_key", (F.col("_offset") + F.col("_rn_local")).alias("_rank")
    )
    anchor = ranked.select(
        F.col("_id").alias("src"),
        F.col("_key").alias("key_l"),
        F.col("_rank").alias("_ra"),
        F.floor(F.col("_rank") / step).alias("_bkt"),
    )
    probe = ranked.select(
        F.col("_id").alias("dst"),
        F.col("_key").alias("key_r"),
        F.col("_rank").alias("_rb"),
        F.explode(
            F.array(
                F.floor(F.col("_rank") / step),
                F.floor(F.col("_rank") / step) - 1,
            )
        ).alias("_bkt"),
    )
    return (
        anchor.join(probe, "_bkt")
        .where((F.col("_rb") > F.col("_ra")) & (F.col("_rb") - F.col("_ra") <= step))
        .select("src", "dst", "key_l", "key_r", (F.col("_rb") - F.col("_ra")).alias("gap"))
    )


def x66_old(spark):
    pairs = x66_old_pairs(
        table(spark, "part", SF_DIR), "p_partkey", F.lower(F.col("p_name")), window=5
    )
    return (
        pairs.withColumn("dist", F.levenshtein("key_l", "key_r").cast("long"))
        .where(F.col("dist") <= 3)
        .select("src", "dst", F.col("gap").cast("long").alias("gap"), "dist")
    )


def main():
    from fintrack_etl_spark.queries_ext import x41_copurchase_pairs, x66_sorted_neighborhood

    spark = get_spark("ab_r12")
    # construction wall matters for x66 (checkpoint + collect run there)
    for label, builder in (
        ("x41_old", lambda: x41_old(spark)),
        ("x41_new", lambda: x41_copurchase_pairs(spark, SF_DIR)),
        ("x66_old", lambda: x66_old(spark)),
        ("x66_new", lambda: x66_sorted_neighborhood(spark, SF_DIR)),
    ):
        for rep in range(2):  # interleave two rounds
            spark.sparkContext.setJobDescription(f"ab:{label}")
            t0 = time.time()
            df = builder()
            build = round(time.time() - t0, 3)
            runs = timed(df)
            print(json.dumps({"label": label, "rep": rep, "build_sec": build, "runs": runs}), flush=True)
    # value parity spot check (order-insensitive multiset)
    a = sorted(map(tuple, x41_old(spark).collect()))
    b = sorted(map(tuple, x41_copurchase_pairs(spark, SF_DIR).collect()))
    print("x41 values equal:", a == b)
    c = sorted(map(tuple, x66_old(spark).collect()))
    d = sorted(map(tuple, x66_sorted_neighborhood(spark, SF_DIR).collect()))
    print("x66 values equal:", c == d)
    spark.stop()


if __name__ == "__main__":
    main()
