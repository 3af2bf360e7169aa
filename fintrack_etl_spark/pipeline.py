"""Declarative entity-transformer framework (SURVEY.md §2.12 I3).

Reference: ``transform/base_entity_transformer.py:14-63`` — a strategy
declares its catalog inputs, primary key, and partition spec; the base
class drives load → pre_transform → transform → post_transform, and a
runner handles dedup + merge + write. Re-expressed with the same
contract plus a composable ``run`` that wires in this engine's
operators (W1 dedup, J3 merge, I5 size-based repartition) — all
logical-plan composition, nothing materializes until the sink.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from enum import Enum

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class PartitionTransform(Enum):
    """``TipoParticionamento`` + ``definir_particionamento``
    (``datatrack_spark_utils.py:525-562``)."""

    YEAR = "ANO"
    MONTH = "MES"
    DAY = "DIA"
    BUCKET = "BUCKET"


class BaseEntityTransformer(ABC):
    """Multi-input → single-output transformation strategy.

    Subclasses declare ``entity_name``, ``inputs`` (catalog table or
    view names), ``primary_key``, and optionally a partition column +
    transform; the runner does the rest.
    """

    entity_name: str | None = None
    inputs: list[str] = []
    primary_key: list[str] = []
    partition_column: str | None = None
    partition_transform: PartitionTransform | None = None
    #: order column for latest-wins dedup/merge (D1/J3); None → arbitrary
    order_column: str | None = None

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def load_inputs(self) -> dict[str, DataFrame]:
        """``load_inputs`` (``base_entity_transformer.py:36-41``)."""
        return {t: self.spark.table(t) for t in self.inputs}

    def pre_transform(self, dfs: dict[str, DataFrame]) -> dict[str, DataFrame]:
        return dfs

    @abstractmethod
    def transform(self, dfs: dict[str, DataFrame]) -> DataFrame:
        """Strategy body — must return exactly one DataFrame."""

    def post_transform(self, df: DataFrame) -> DataFrame:
        return df

    # ------------------------------------------------------------------
    # Runner
    # ------------------------------------------------------------------

    def build(self) -> DataFrame:
        """load → pre → transform → post → keyed dedup. Pure plan
        composition; one shuffle for the dedup window iff a primary
        key is declared."""
        out = self.post_transform(self.transform(self.pre_transform(self.load_inputs())))
        if self.primary_key:
            from .operators.windows import dedup_latest

            out = dedup_latest(out, self.primary_key, self.order_column)
        return out

    def run_merge(self, target: DataFrame) -> DataFrame:
        """Apply the built output to an existing target with J3
        latest-wins MERGE semantics (``mesclar_dados``,
        ``datatrack_spark_utils.py:306-362``)."""
        from .operators.upsert import merge_latest_wins

        return merge_latest_wins(target, self.build(), self.primary_key, self.order_column)

    def partition_expr(self):
        """Iceberg-style transform partitioning
        (``datatrack_spark_utils.py:525-562``): years/months/days of the
        partition column, or identity."""
        if self.partition_column is None:
            return None
        c = F.col(self.partition_column)
        if self.partition_transform == PartitionTransform.YEAR:
            return F.year(c)
        if self.partition_transform == PartitionTransform.MONTH:
            return F.month(c)
        if self.partition_transform == PartitionTransform.DAY:
            return F.dayofmonth(c)
        return c


def observed_write(
    df: DataFrame,
    writer: "callable",
    value_col: str | None = None,
) -> dict:
    """Run-level audit metrics, the Spark-idiomatic way.

    The reference writes a ``_summary.json`` per batch by re-reading
    what it just wrote (``extract_movimentacoes_folder.py:337-343``).
    ``DataFrame.observe`` attaches the metrics to the WRITE job itself:
    row count, null-value count and value total ride along with the
    action — zero extra scans, exact even under retries, and at 100 TB
    the difference between "free" and "rescan everything".

    ``writer`` receives the observed DataFrame and must trigger exactly
    one action (e.g. ``lambda d: d.write.parquet(path)``). Returns the
    metrics dict (``n_rows`` plus ``n_null_value``/``total_value`` when
    ``value_col`` is given).
    """
    from pyspark.sql import Observation

    metrics = [F.count(F.lit(1)).alias("n_rows")]
    if value_col is not None:
        metrics.append(
            F.sum(F.col(value_col).isNull().cast("long")).alias("n_null_value")
        )
        metrics.append(F.round(F.sum(value_col), 2).alias("total_value"))
    obs = Observation()
    writer(df.observe(obs, *metrics))
    return obs.get
