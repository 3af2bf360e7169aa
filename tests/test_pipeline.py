"""Entity-transformer framework tests (I3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fintrack_etl_spark.pipeline import BaseEntityTransformer, PartitionTransform


class OrdersRollup(BaseEntityTransformer):
    entity_name = "fin.orders_rollup"
    inputs = ["t_orders_in", "t_prio_map"]
    primary_key = ["o_orderkey"]
    order_column = "updated_at"
    partition_column = "o_orderdate"
    partition_transform = PartitionTransform.MONTH

    def pre_transform(self, dfs):
        dfs["t_orders_in"] = dfs["t_orders_in"].filter(F.col("o_totalprice") > 0)
        return dfs

    def transform(self, dfs):
        o = dfs["t_orders_in"]
        m = dfs["t_prio_map"]
        return o.join(F.broadcast(m), "o_orderpriority", "left")

    def post_transform(self, df):
        return df.withColumn("loaded", F.lit(True))


@pytest.fixture()
def views(spark):
    spark.createDataFrame(
        [
            (1, "1-URGENT", 10.0, "2024-01-05", 1),
            (1, "1-URGENT", 10.0, "2024-01-05", 2),  # dup, later version wins
            (2, "5-LOW", -3.0, "2024-02-01", 1),  # dropped by pre_transform
            (3, "5-LOW", 7.0, "2024-03-09", 1),
        ],
        "o_orderkey long, o_orderpriority string, o_totalprice double, o_orderdate string, updated_at int",
    ).createOrReplaceTempView("t_orders_in")
    spark.createDataFrame(
        [("1-URGENT", "alta"), ("5-LOW", "baixa")], ["o_orderpriority", "prio_label"]
    ).createOrReplaceTempView("t_prio_map")
    yield
    spark.catalog.dropTempView("t_orders_in")
    spark.catalog.dropTempView("t_prio_map")


def test_build_runs_full_lifecycle(spark, views):
    out = OrdersRollup(spark).build()
    rows = {r["o_orderkey"]: r for r in out.collect()}
    assert set(rows) == {1, 3}  # filtered + deduped
    assert rows[1]["updated_at"] == 2  # latest-wins on order_column
    assert rows[1]["prio_label"] == "alta"
    assert rows[1]["loaded"] is True


def test_run_merge_latest_wins(spark, views):
    target = spark.createDataFrame(
        [(1, "1-URGENT", 99.0, "2024-01-05", 9, "alta", True),
         (7, "5-LOW", 1.0, "2023-12-31", 1, "baixa", True)],
        "o_orderkey long, o_orderpriority string, o_totalprice double, "
        "o_orderdate string, updated_at int, prio_label string, loaded boolean",
    )
    merged = OrdersRollup(spark).run_merge(target)
    rows = {r["o_orderkey"]: r for r in merged.collect()}
    assert set(rows) == {1, 3, 7}
    assert rows[1]["updated_at"] == 9  # target newer → kept (MATCHED AND cond)
    assert rows[7]["o_totalprice"] == 1.0  # target-only survives


def test_partition_expr(spark, views):
    t = OrdersRollup(spark)
    df = spark.createDataFrame([("2024-03-09",)], ["o_orderdate"]).select(
        F.to_date("o_orderdate").alias("o_orderdate")
    )
    assert df.select(t.partition_expr().alias("p")).first()["p"] == 3


def test_transform_is_required(spark):
    class Bad(BaseEntityTransformer):
        inputs = []

    with pytest.raises(TypeError):
        Bad(spark)


def test_observed_write_audits_without_rescan(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from fintrack_etl_spark.io import table
    from fintrack_etl_spark.pipeline import observed_write

    o = table(spark, "orders", sf_dir).withColumn(
        "valor", F.when(F.col("o_orderkey") % 7 == 0, None).otherwise(F.col("o_totalprice"))
    )
    out = str(tmp_path / "audited")
    got = observed_write(o, lambda d: d.write.mode("overwrite").parquet(out), "valor")

    n = o.count()
    n_null = o.filter(F.col("valor").isNull()).count()
    total = o.agg(F.round(F.sum("valor"), 2)).first()[0]
    assert got["n_rows"] == n and got["n_null_value"] == n_null
    assert abs(got["total_value"] - total) < 0.01
    assert spark.read.parquet(out).count() == n
