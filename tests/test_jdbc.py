"""S11 against a LIVE database (VERDICT r3 #9): Apache Derby's
embedded JDBC driver ships inside Spark's own jar directory (it backs
the Hive metastore), so the JDBC scan path can be exercised for real —
no network, no install: DDL + inserts through java.sql.DriverManager,
catalog metadata through DatabaseMetaData.getColumns, then
``jdbc_read_partitioned`` / ``columns_excluding_types`` over the live
table exactly as the reference's source-ingestion config drives them
(``create_source_ingestao.py:38-71``, ``datatrack_spark_utils.py:771-829``).
"""

from __future__ import annotations

import pytest

from fintrack_etl_spark.lake import columns_excluding_types, jdbc_read_partitioned

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    """A live embedded Derby database with a table containing a LOB
    column, created through plain JDBC in the Spark JVM."""
    db = str(tmp_path_factory.mktemp("derby") / "livedb")
    url = f"jdbc:derby:{db};create=true"
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DRIVER)  # register the embedded driver
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE TXNS (ID INT NOT NULL, AMOUNT DOUBLE, "
        "MEMO CLOB, CATEGORY VARCHAR(20))"
    )
    ps = conn.prepareStatement("INSERT INTO TXNS VALUES (?, ?, ?, ?)")
    for i in range(100):
        ps.setInt(1, i)
        ps.setDouble(2, round(i * 1.5, 2))
        ps.setString(3, f"memo text {i}")
        ps.setString(4, f"cat{i % 4}")
        ps.executeUpdate()
    st.close()
    conn.close()
    yield url
    try:  # embedded Derby shuts down via the magic URL + expected SQLException
        jvm.java.sql.DriverManager.getConnection(f"jdbc:derby:{db};shutdown=true")
    except Exception:  # noqa: BLE001
        pass


def test_jdbc_partitioned_read_against_live_derby(spark, derby):
    """Partitioned scan: 4 JDBC partitions over the ID range, values
    intact, LOB column projected away inside the dbtable subquery."""
    df = jdbc_read_partitioned(
        spark,
        derby,
        "TXNS",
        {"driver": DRIVER},
        columns=["ID", "AMOUNT", "CATEGORY"],
        partition_column="ID",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    assert set(df.columns) == {"ID", "AMOUNT", "CATEGORY"}  # MEMO never fetched
    rows = {r["ID"]: r for r in df.collect()}
    assert len(rows) == 100
    assert rows[40]["AMOUNT"] == pytest.approx(60.0)
    assert rows[41]["CATEGORY"] == "cat1"


def test_type_exclusion_from_live_jdbc_metadata(spark, derby):
    """columns_excluding_types over the REAL driver metadata: the CLOB
    column is dropped, everything else kept, and the resulting
    projection round-trips through the partitioned read."""
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(derby)
    rs = conn.getMetaData().getColumns(None, "APP", "TXNS", None)
    cat = []
    while rs.next():
        cat.append(
            ("TXNS", rs.getString("COLUMN_NAME"), rs.getString("TYPE_NAME"))
        )
    conn.close()
    catalog = spark.createDataFrame(
        cat, ["table_name", "column_name", "data_type"]
    )
    cols = columns_excluding_types(catalog, "TXNS")
    assert "MEMO" not in cols and set(cols) == {"ID", "AMOUNT", "CATEGORY"}
    df = jdbc_read_partitioned(spark, derby, "TXNS", {"driver": DRIVER}, columns=cols)
    assert df.count() == 100 and "MEMO" not in df.columns
