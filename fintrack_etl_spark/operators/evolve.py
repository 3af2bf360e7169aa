"""Schema evolution (reference parity: §1.3, ``evoluir_schema`` at
``datatrack_spark_utils.py:221-302``).

The reference diffs source vs target columns, ALTERs the target for new
columns, backfills missing source columns with typed NULLs, and
reorders to the target order. Without a mutable catalog the same
semantics are pure DataFrame ops — which is also what makes them safe
to run inside a 1000-executor job: nothing here is driver-bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def align_to_schema(df: DataFrame, target: StructType, keep_extra: bool = True) -> DataFrame:
    """Backfill + reorder one frame to a target schema.

    * columns missing in ``df`` → ``lit(NULL).cast(target_type)``
      (``datatrack_spark_utils.py:283-293``);
    * columns present in both → cast to the target type;
    * extra source columns are appended after the target order when
      ``keep_extra`` (add-column evolution, ``:261-269``), else dropped.
    """
    cols = []
    for field in target.fields:
        if field.name in df.columns:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    if keep_extra:
        target_names = {f.name for f in target.fields}
        cols += [F.col(c) for c in df.columns if c not in target_names]
    return df.select(*cols)


def evolve_union(target: DataFrame, source: DataFrame) -> DataFrame:
    """Union two frames under evolved (merged) schema — the pure-Spark
    equivalent of the reference's zero-row ``merge-schema`` append
    (``datatrack_spark_utils.py:354``): target columns keep their order
    and types, new source columns are appended, each side NULL-backfills
    what it lacks. ``unionByName(allowMissingColumns=True)`` after
    aligning shared column types.
    """
    aligned_src = source
    for field in target.schema.fields:
        if field.name in source.columns:
            aligned_src = aligned_src.withColumn(field.name, F.col(field.name).cast(field.dataType))
    return target.unionByName(aligned_src, allowMissingColumns=True)


def schema_diff(source: StructType, target: StructType) -> dict[str, list[str]]:
    """Report the evolution plan the reference logs (``:239-259``)."""
    src = {f.name for f in source.fields}
    tgt = {f.name for f in target.fields}
    return {
        "add_to_target": sorted(src - tgt),
        "backfill_in_source": sorted(tgt - src),
        "common": sorted(src & tgt),
    }
