"""Joins (reference parity: J1-J5, SURVEY.md §2.3).

The reference's joins are pandas merges on the driver
(``compare_budget.py:69-78``) and SQL MERGE (``datatrack_spark_utils.py:306-362``).
Here they are distributed equi-joins; small sides are explicitly
broadcast so no shuffle lands on the big fact table at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .aggregate import mode_per_group


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
    Budget tables are tiny → broadcast the budget side.
    """
    joined = actual.join(F.broadcast(budget), key, "full_outer")
    orcado = F.coalesce(F.col(budget_col), F.lit(0.0))
    realizado = F.coalesce(F.col(actual_col), F.lit(0.0))
    diferenca = F.round(realizado - orcado, 2)
    return joined.select(
        F.col(key),
        F.round(orcado, 2).alias(budget_col),
        F.round(realizado, 2).alias(actual_col),
        F.col(budget_col).isNull().alias("sem_orcamento"),
        diferenca.alias("diferenca"),
        F.when(diferenca <= 0, "OK").otherwise("ESTOURO").alias("status"),
        F.round(F.when(orcado > 0, diferenca / orcado * 100.0), 2).alias("pct_esto"),
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
