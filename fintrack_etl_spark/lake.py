"""Lake-table DDL and catalog operators (SURVEY.md §2.1 S6-S9, S11,
§2.9 D5).

The reference creates Iceberg v2 tables via DataFrameWriterV2 with
transform partitioning (``datatrack_spark_utils.py:376-481``), external
Hive tables via DDL + MSCK (``:618-680``), and introspects JDBC
catalogs to exclude LOB columns (``:771-829``). This container has no
Hive metastore or Iceberg jar, so table DDL targets Spark's built-in
catalog over parquet — identical query semantics, different commit
atomicity (documented, not hidden).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# S8 — schema → DDL
# ---------------------------------------------------------------------------


def schema_to_ddl(df: DataFrame) -> str:
    """``schema_to_ddl`` (``datatrack_spark_utils.py:365-374``) —
    column list for CREATE TABLE, via the JVM's canonical toDDL."""
    return df._jdf.schema().toDDL()


# ---------------------------------------------------------------------------
# S6/S7/S9 — partitioned table create / append
# ---------------------------------------------------------------------------


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...],
    mode: str = "append",
    fmt: str = "parquet",
) -> None:
    """S9 — ``write_to_minio`` (``datatrack_spark_utils.py:618-624``):
    hive-style partition directories; partition values become
    directory keys so scans prune on them."""
    df.write.mode(mode).partitionBy(*partition_cols).format(fmt).save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Extension — bucketed managed table: pays the shuffle ONCE at
    write time (hash on ``bucket_cols`` into ``n_buckets`` files per
    partition) so every later equi-join or aggregation on the bucket
    key between co-bucketed tables runs with ZERO exchange — the
    co-located-join strategy for fact↔fact joins too big to broadcast,
    and the direct equivalent of the reference's Iceberg
    ``bucket(n, col)`` partition transform
    (``datatrack_spark_utils.py:540-551``). ``sort_cols`` additionally
    sorts within buckets, removing the sort from future sort-merge
    joins."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def create_external_table(
    spark: SparkSession,
    name: str,
    path: str,
    schema_ddl: str,
    partition_cols: tuple[str, ...] = (),
    fmt: str = "parquet",
) -> None:
    """S9 — ``create_table_external_hive`` (``:627-680``): DDL-first
    external table over an existing tree + partition recovery (the
    MSCK REPAIR TABLE equivalent for datasource tables)."""
    part = f"PARTITIONED BY ({', '.join(partition_cols)})" if partition_cols else ""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} ({schema_ddl}) USING {fmt} {part} LOCATION '{path}'"
    )
    if partition_cols:
        recover_partitions(spark, name)


def recover_partitions(spark: SparkSession, name: str) -> None:
    """S9 — ``MSCK REPAIR TABLE`` (``:676-680``); datasource-table
    spelling is RECOVER PARTITIONS."""
    spark.sql(f"ALTER TABLE {name} RECOVER PARTITIONS")


def upsert_table_partitioned(
    df: DataFrame,
    spark: SparkSession,
    name: str,
    path: str,
    partition_cols: tuple[str, ...] = ("ingestao_year", "ingestao_month", "ingestao_day"),
) -> None:
    """S6 — ``upsert_iceberg_table_partitioned``
    (``etls_raw/main.py:318-345``): create-if-absent else append, same
    partition spec every time.

    ``insertInto`` is POSITIONAL, and the table's layout puts partition
    columns last (``_data_ddl``) — so the frame is realigned to the
    table's declared column order by NAME before the append, matching
    the reference's by-name ``writeTo().append()`` semantics. Without
    this, any caller whose partition columns aren't already trailing
    would get silently column-scrambled data.
    """
    if spark.catalog.tableExists(name):
        target_cols = spark.table(name).columns
        missing = [c for c in target_cols if c not in df.columns]
        if missing:
            raise ValueError(
                f"append to {name}: dataframe is missing table columns {missing}"
            )
        df.select(*target_cols).write.mode("append").insertInto(name)
    else:
        write_partitioned(df, path, partition_cols, mode="overwrite")
        create_external_table(spark, name, path, _data_ddl(df, partition_cols), partition_cols)


def evolve_table_add_columns(df: DataFrame, spark: SparkSession, name: str) -> list[str]:
    """§1.3 — catalog-side schema evolution (``evoluir_schema``,
    ``datatrack_spark_utils.py:221-302``): columns present in the
    incoming frame but absent from the managed table are added with
    ``ALTER TABLE ... ADD COLUMNS`` (existing rows read them as NULL —
    a metadata-only DDL, no rewrite of existing files at any scale),
    then the frame is appended realigned to the table's evolved column
    order, with NULLs for table columns the frame doesn't carry.

    Returns the list of added column names. Type changes are NOT
    evolved (parquet-backed tables can't safely widen in place);
    a name collision with a different type raises.
    """
    target = spark.table(name).schema
    target_types = {f.name: f.dataType.simpleString() for f in target.fields}
    add, clash = [], []
    for f in df.schema.fields:
        have = target_types.get(f.name)
        if have is None:
            add.append(f)
        elif have != f.dataType.simpleString():
            clash.append(f"{f.name}: table={have} frame={f.dataType.simpleString()}")
    if clash:
        raise ValueError(f"evolve {name}: incompatible column types: {clash}")
    if add:
        ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in add)
        spark.sql(f"ALTER TABLE {name} ADD COLUMNS ({ddl})")
    evolved_cols = spark.table(name).columns
    aligned = df.select(
        *[
            F.col(c) if c in df.columns else F.lit(None).cast(target_types[c]).alias(c)
            for c in evolved_cols
        ]
    )
    aligned.write.mode("append").insertInto(name)
    return [f.name for f in add]


def _data_ddl(df: DataFrame, partition_cols: tuple[str, ...]) -> str:
    """DDL with partition columns last (hive layout requirement)."""
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    ordered = [c for c in df.columns if c not in partition_cols] + list(partition_cols)
    return ", ".join(f"{c} {fields[c]}" for c in ordered)


# ---------------------------------------------------------------------------
# S11 — JDBC catalog introspection (LOB exclusion)
# ---------------------------------------------------------------------------

#: ``datatrack_spark_utils.py:771-829`` — types excluded from wide scans
DEFAULT_EXCLUDED_TYPES: tuple[str, ...] = (
    "BLOB",
    "CLOB",
    "NCLOB",
    "BFILE",
    "LONG",
    "LONG RAW",
    "RAW",
    "XMLTYPE",
    "BYTEA",
    "TEXT",
)


def columns_excluding_types(
    catalog_columns: DataFrame,
    table_name: str,
    excluded_types: tuple[str, ...] = DEFAULT_EXCLUDED_TYPES,
    col_name: str = "column_name",
    type_name: str = "data_type",
    table_col: str = "table_name",
) -> list[str]:
    """S11 — ``remove_colunas_por_tipo`` (``:771-829``): build the
    projection for a JDBC read from the source catalog's column
    dictionary (``all_tab_columns`` / ``information_schema.columns``),
    dropping LOB-typed columns. The catalog frame is tiny → collect is
    driver-safe."""
    rows = (
        catalog_columns.filter(F.upper(F.col(table_col)) == table_name.upper())
        .filter(~F.upper(F.col(type_name)).isin([t.upper() for t in excluded_types]))
        .select(col_name)
        .collect()
    )
    return [r[0] for r in rows]


def jdbc_read_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict,
    columns: list[str] | None = None,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
) -> DataFrame:
    """S11 — partitioned JDBC scan as configured per-table by the
    reference's source-ingestion JSON (``create_source_ingestao.py:38-71``:
    delta_colum with lowerBound/upperBound/numPartitions). The
    projection is pushed into the dbtable subquery so LOBs never leave
    the source database."""
    projection = ", ".join(columns) if columns else "*"
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"(SELECT {projection} FROM {table}) src")
    )
    for k, v in properties.items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
            .option("numPartitions", num_partitions or 8)
        )
    return reader.load()


def analyze_table(spark: SparkSession, name: str, columns: list[str] | None = None) -> None:
    """I4 companion — collect catalog statistics for the cost-based
    optimizer: table-level size/rowCount, plus per-column NDV/min/max/
    null-count histograms when ``columns`` is given.

    The reference reads optimizer stats ad hoc
    (``datatrack_spark_utils.py:582-596``, ``sizeInBytes`` for
    partition sizing); persisting them via ANALYZE is what lets CBO
    pick broadcast sides and join orders from ROW counts instead of
    raw file bytes — on a 100 TB lake, a scheduled ANALYZE after each
    load window is the difference between stats-driven plans and
    guessed ones.
    """
    # Backtick-quote identifiers (dots in `name` separate db.table parts)
    # so names that collide with keywords or carry odd chars can't break
    # or reshape the statement.
    def bq(ident: str) -> str:
        return "`" + ident.replace("`", "``") + "`"

    tbl = ".".join(bq(p) for p in name.split("."))
    spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(bq(c) for c in columns)
        spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS FOR COLUMNS {cols}")


# ---------------------------------------------------------------------------
# D5 — snapshot expiry (lake maintenance)
# ---------------------------------------------------------------------------


def expire_snapshots(spark: SparkSession, table: str, older_than=None, retain_last: int = 1):
    """D5 — ``CALL system.expire_snapshots``
    (``datatrack_spark_utils.py:756-768``).

    For a versioned commit-log table (``lake_tx`` root path) this is a
    real vacuum: delete committed version directories beyond the newest
    ``retain_last`` (the current version always survives). For catalog
    tables there is no snapshot lineage without the Iceberg extension,
    so that case still raises rather than silently pretending."""
    import os as _os

    from .lake_tx import expire_versions, table_exists

    if _os.path.sep in table or table_exists(table):
        return expire_versions(table, retain_last=retain_last)
    if _iceberg_available(spark):
        # Real Iceberg catalog present: the reference's exact call
        # (datatrack_spark_utils.py:756-768). older_than defaults to
        # "now" so retain_last is the effective knob, like the ref.
        args = [f"table => '{table}'", f"retain_last => {int(retain_last)}"]
        if older_than is not None:
            args.insert(1, f"older_than => TIMESTAMP '{older_than}'")
        return spark.sql(
            f"CALL {_iceberg_catalog(spark)}.system.expire_snapshots({', '.join(args)})"
        )
    raise NotImplementedError(
        "expire_snapshots on a catalog table requires an Iceberg catalog; "
        "use a lake_tx versioned table root for plain-parquet snapshot "
        "lineage (see fintrack_etl_spark/lake_tx.py)"
    )


def _iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg runtime jar + a configured catalog are on
    the session — lights up the real MERGE/DELETE/expire paths when a
    user runs this engine on a cluster that ships Iceberg (the sandbox
    does not, so the lake_tx commit-log fallback stays the default)."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 — jar probe
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        )
    except Exception:  # noqa: BLE001 — any JVM error means "not present"
        return False
    return _iceberg_catalog(spark) is not None


def _iceberg_catalog(spark: SparkSession) -> str | None:
    """First catalog configured with the Iceberg SparkCatalog impl."""
    try:
        confs = spark.sparkContext.getConf().getAll()
    except Exception:  # noqa: BLE001
        return None
    for k, v in confs:
        if (
            k.startswith("spark.sql.catalog.")
            and k.count(".") == 3
            and "iceberg" in str(v).lower()
        ):
            return k.rsplit(".", 1)[-1]
    return None


def overwrite_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Partition-scoped idempotent reload (D2 at partition granularity):
    replace ONLY the partitions present in ``df``, leave every other
    partition untouched.

    Uses dynamic partition-overwrite mode scoped to this single write
    (the session default stays static, where ``overwrite`` would wipe
    the whole table). This is the reference's DELETE-where-key +
    append contract when the lineage key IS the partition key — at
    100 TB it rewrites gigabytes, not the table, and re-running the
    same input converges to identical state.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
