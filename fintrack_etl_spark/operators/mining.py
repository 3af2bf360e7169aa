"""Association-rule mining over basket data (engine extension; the
classic Apriori support/confidence/lift step applied to 2-itemsets —
the "customers who bought A also bought B" primitive and, for training
corpora, the term/source co-occurrence rule miner).

All three rule metrics are exact scaled BIGINTs (the x24/x61 stance:
never emit engine-divergent float ratios):

    support_ppm      = floor(1e6 * c_ab / N)
    confidence_milli = floor(1e3 * c_ab / c_a)
    lift_milli       = floor(1e3 * c_ab * N / (c_a * c_b))

Overflow envelope: the lift numerator ``1e3 * c_ab * N`` stays inside
int64 while N ≲ 9·10^7 baskets (c_ab ≤ N); past that, widen the lift
product to DECIMAL(38,0)/HUGEINT on both engines — the gate fixtures
sit far below the bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    items: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 1,
    max_basket_size: int = 1000,
) -> DataFrame:
    """Directional 2-itemset rules a→b from an (basket, item) stream.

    Scale (same discipline as x41 copurchase): NOT a fact-table
    self-join — one shuffle groups the distinct basket arrays, the
    k·(k-1) directional pair expansion runs basket-locally on the
    sorted array (baskets past ``max_basket_size`` quarantine as
    pathological), the pair count is a second partial-agg shuffle on
    the (a, b) key, and the per-item counts / basket total N are
    |catalog|- and 1-row broadcasts. The fact stream crosses the wire
    once.
    """
    # ONE scan of the fact stream: the basket arrays are materialized
    # eagerly (localCheckpoint — persist() on a real cluster) and item
    # counts / basket total / pair expansion all derive from them, so
    # the 100 TB fact table crosses the wire exactly once instead of
    # once per downstream statistic.
    baskets = (
        items.select(basket_col, item_col)
        .distinct()
        .groupBy(basket_col)
        .agg(F.sort_array(F.collect_set(item_col)).alias("_items"))
        .filter(F.size("_items") <= max_basket_size)
        .localCheckpoint()
    )
    n_baskets = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    item_counts = (
        baskets.select(F.explode("_items").alias(item_col))
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    pair_expr = F.expr(
        "flatten(transform(_items, x -> "
        "transform(filter(_items, y -> y != x), "
        "y -> struct(x AS antecedent, y AS consequent))))"
    )
    pairs = (
        baskets.select(F.explode(pair_expr).alias("p"))
        .select("p.antecedent", "p.consequent")
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_pair_count)
    )
    # Two broadcast copies of item_counts share one lineage: alias
    # them explicitly and write the join conditions against the
    # aliases (the round-4 form compared against item_counts[item_col]
    # while joining the withColumnRenamed derivative — it leaned on
    # exprId passthrough and Spark's self-join disambiguation, which
    # is version-fragile). Mirrors the oracle's `ic ca` / `ic cb`.
    ca = item_counts.withColumnRenamed("_c", "_ca").alias("ca")
    cb = item_counts.withColumnRenamed("_c", "_cb").alias("cb")
    return (
        pairs.join(
            F.broadcast(ca),
            F.col("antecedent") == F.col(f"ca.{item_col}"),
        )
        .drop(item_col)
        .join(
            F.broadcast(cb),
            F.col("consequent") == F.col(f"cb.{item_col}"),
        )
        .drop(item_col)
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            F.col("pair_count").cast("long").alias("pair_count"),
            F.expr("1000000 * pair_count DIV n_baskets").alias("support_ppm"),
            F.expr("1000 * pair_count DIV _ca").alias("confidence_milli"),
            F.expr("1000 * pair_count * n_baskets DIV (_ca * _cb)").alias(
                "lift_milli"
            ),
        )
    )
