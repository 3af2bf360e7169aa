"""Lake DDL + catalog introspection tests (S6-S9, S11)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fintrack_etl_spark import lake


@pytest.fixture()
def sample(spark):
    return spark.range(100).select(
        F.col("id"),
        (F.col("id") % 3).alias("ingestao_year"),
        F.lit(1).alias("ingestao_month"),
        F.lit(2).alias("ingestao_day"),
        (F.col("id") * 1.5).alias("value"),
    )


def test_schema_to_ddl(sample):
    ddl = lake.schema_to_ddl(sample)
    assert "id BIGINT" in ddl and "value DOUBLE" in ddl


def test_partitioned_create_and_recover(spark, sample, tmp_path):
    path = str(tmp_path / "tbl")
    lake.write_partitioned(sample, path, ("ingestao_year",), mode="overwrite")
    lake.create_external_table(
        spark,
        "t_lake_test",
        path,
        "id bigint, ingestao_month int, ingestao_day int, value double, ingestao_year bigint",
        ("ingestao_year",),
    )
    try:
        got = spark.table("t_lake_test")
        assert got.count() == 100
        # partition pruning: the year filter hits partition directories
        pruned = got.filter(F.col("ingestao_year") == 1)
        assert pruned.count() == sum(1 for i in range(100) if i % 3 == 1)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_lake_test")


def test_upsert_create_then_append(spark, sample, tmp_path):
    """The fixture's partition columns are NOT trailing (id, year, month,
    day, value) — the by-name realignment before the positional
    insertInto must keep every value in its own column on append."""
    path = str(tmp_path / "u")
    try:
        lake.upsert_table_partitioned(sample, spark, "t_upsert_test", path)
        assert spark.table("t_upsert_test").count() == 100
        lake.upsert_table_partitioned(sample, spark, "t_upsert_test", path)
        got = spark.table("t_upsert_test")
        assert got.count() == 200  # append, not replace
        # value fidelity, not just counts: every row must satisfy the
        # generator invariants value == id*1.5 and year == id%3
        bad = got.filter(
            (F.col("value") != F.col("id") * 1.5)
            | (F.col("ingestao_year") != F.col("id") % 3)
            | (F.col("ingestao_month") != 1)
            | (F.col("ingestao_day") != 2)
        )
        assert bad.count() == 0, bad.limit(5).collect()
        # each id appears exactly twice (once per upsert call)
        assert got.groupBy("id").count().filter("count != 2").count() == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_upsert_test")


def test_upsert_append_missing_column_raises(spark, sample, tmp_path):
    path = str(tmp_path / "u2")
    try:
        lake.upsert_table_partitioned(sample, spark, "t_upsert_test2", path)
        with pytest.raises(ValueError, match="missing table columns"):
            lake.upsert_table_partitioned(
                sample.drop("value"), spark, "t_upsert_test2", path
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS t_upsert_test2")


def test_columns_excluding_types(spark):
    catalog = spark.createDataFrame(
        [
            ("MOVIMENTOS", "ID", "NUMBER"),
            ("MOVIMENTOS", "DESCRICAO", "VARCHAR2"),
            ("MOVIMENTOS", "ANEXO", "BLOB"),
            ("MOVIMENTOS", "LAUDO", "CLOB"),
            ("OUTRA", "X", "NUMBER"),
        ],
        ["table_name", "column_name", "data_type"],
    )
    cols = lake.columns_excluding_types(catalog, "movimentos")
    assert cols == ["ID", "DESCRICAO"]


def test_expire_snapshots_refuses_without_iceberg(spark):
    with pytest.raises(NotImplementedError):
        lake.expire_snapshots(spark, "any_table")


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Co-bucketed tables joined on the bucket key must plan a
    sort-merge join with NO Exchange on either side (the pay-shuffle-
    once-at-write contract)."""
    from fintrack_etl_spark.io import table
    from fintrack_etl_spark.lake import write_bucketed

    orders = table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    li = (
        table(spark, "lineitem", sf_dir)
        .select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity")
    )
    write_bucketed(orders, "t_bkt_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(li, "t_bkt_lineitem", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("t_bkt_orders").join(spark.table("t_bkt_lineitem"), "o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_bkt_orders")
        spark.sql("DROP TABLE IF EXISTS t_bkt_lineitem")


def test_overwrite_partitions_touches_only_incoming(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from fintrack_etl_spark.io import table
    from fintrack_etl_spark.lake import overwrite_partitions

    out = str(tmp_path / "dynpart")
    o = table(spark, "orders", sf_dir).withColumn("prio", F.substring("o_orderpriority", 1, 1))
    overwrite_partitions(o, out, ["prio"])
    before = spark.read.parquet(out)
    n_total = before.count()
    n_p1 = before.filter("prio = '1'").count()

    # reload ONLY priority-1 rows, halved: other partitions must survive
    p1_half = o.filter("prio = '1'").filter(F.col("o_orderkey") % 2 == 0)
    n_half = p1_half.count()
    overwrite_partitions(p1_half, out, ["prio"])
    after = spark.read.parquet(out)
    assert after.filter("prio = '1'").count() == n_half
    assert after.count() == n_total - n_p1 + n_half
    # idempotency: same input again → same state
    overwrite_partitions(p1_half, out, ["prio"])
    assert spark.read.parquet(out).count() == n_total - n_p1 + n_half


def test_evolve_table_add_columns_roundtrip(spark):
    """ALTER TABLE ADD COLUMNS evolution (``evoluir_schema`` parity):
    old rows read the new column as NULL, appended rows NULL-fill the
    columns they don't carry, and VALUES land in the right columns."""
    try:
        spark.sql("DROP TABLE IF EXISTS t_evolve_test")
        spark.range(3).select(
            "id", (F.col("id") * 1.5).alias("value")
        ).write.saveAsTable("t_evolve_test")
        new = spark.range(3, 5).select(
            # deliberately NOT table order, and missing `value`
            F.concat(F.lit("tag"), F.col("id")).alias("tag"), "id"
        )
        added = lake.evolve_table_add_columns(new, spark, "t_evolve_test")
        assert added == ["tag"]
        got = {r.id: r for r in spark.table("t_evolve_test").collect()}
        assert set(got) == {0, 1, 2, 3, 4}
        assert got[1].value == 1.5 and got[1].tag is None  # old row, NULL new col
        assert got[4].tag == "tag4" and got[4].value is None  # new row, NULL old col
        # second evolve with no new columns is a plain append
        assert lake.evolve_table_add_columns(new, spark, "t_evolve_test") == []
        assert spark.table("t_evolve_test").count() == 7
    finally:
        spark.sql("DROP TABLE IF EXISTS t_evolve_test")


def test_evolve_table_type_clash_raises(spark):
    try:
        spark.sql("DROP TABLE IF EXISTS t_evolve_clash")
        spark.range(2).select("id", F.lit(1.0).alias("value")).write.saveAsTable(
            "t_evolve_clash"
        )
        bad = spark.range(2).select("id", F.lit("s").alias("value"))
        with pytest.raises(ValueError, match="incompatible column types"):
            lake.evolve_table_add_columns(bad, spark, "t_evolve_clash")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_evolve_clash")


def test_analyze_table_populates_cbo_stats(spark, sf_dir):
    """ANALYZE writes catalog stats the optimizer actually reads:
    rowCount appears in the optimized plan's statistics (not just
    file-size bytes), and column stats carry NDV for join estimation."""
    import uuid

    from fintrack_etl_spark.io import table as fixture_table
    from fintrack_etl_spark.lake import analyze_table

    name = f"analyze_t_{uuid.uuid4().hex[:8]}"
    fixture_table(spark, "nation", sf_dir).write.saveAsTable(name)
    saved_cbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    try:
        # row-count estimation flows into plans only under CBO — the
        # mode ANALYZE exists to feed
        spark.conf.set("spark.sql.cbo.enabled", "true")
        analyze_table(spark, name, columns=["n_nationkey", "n_regionkey"])
        df2 = spark.table(name)
        stats = df2._jdf.queryExecution().optimizedPlan().stats()
        assert stats.rowCount().isDefined()
        assert stats.rowCount().get() == df2.count()
        desc = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(f"DESCRIBE EXTENDED {name} n_nationkey").collect()
        }
        assert int(desc["distinct_count"]) > 0
    finally:
        spark.conf.set("spark.sql.cbo.enabled", saved_cbo)
        spark.sql(f"DROP TABLE IF EXISTS {name}")
