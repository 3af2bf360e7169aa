"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Query implementations live in ``fintrack_etl_spark.queries`` (relational
core, SURVEY.md §2) and ``fintrack_etl_spark.queries_ext`` (text
analysis / dedup / similarity-search extensions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's headline report — totals per category
    (``monthly_summary.py:32-38``) — in its fixture shape: the
    pricing-summary rollup over lineitem.
    """
    from fintrack_etl_spark.queries import a1_group_sum_flagship

    return a1_group_sum_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    All four modules ship in the package — an import failure in any of
    them is a real bug and must surface, not silently shrink the
    correctness gate to the queries that still import.
    """
    from fintrack_etl_spark import queries as core
    from fintrack_etl_spark import queries_ext, queries_parse, queries_reports

    merged = dict(core.QUERIES)
    for mod in (queries_ext, queries_parse, queries_reports):
        merged.update(mod.QUERIES)
    return merged


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin per query (omitted → rows-only check)."""
    from fintrack_etl_spark import queries as core
    from fintrack_etl_spark import queries_ext, queries_parse, queries_reports

    merged = dict(core.ORACLES)
    for mod in (queries_ext, queries_parse, queries_reports):
        merged.update(mod.ORACLES)
    return merged
