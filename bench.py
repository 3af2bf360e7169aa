#!/usr/bin/env python
"""Benchmark runner — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

Each query runs twice: a warm-up pass (JIT/codegen/file-footer caches)
is NOT counted, matching how a long-lived cluster session behaves; the
reported number is the timed second pass. Set BENCH_WARMUP=0 to disable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from __spark_entry__ import queries
from fintrack_etl_spark.session import get_spark

#: The headline subset — one representative per operator family, biased
#: toward the scans/joins/windows that dominate a 100 TB workload.
HEADLINE = [
    "a1_group_sum_flagship",
    "a2_group_sum_composite",
    "a8_mode_per_group",
    "j1_budget_vs_actual",
    "j2_mode_backfill",
    "j3_merge_upsert",
    "w1_dedup_latest",
    "w2_forward_fill",
    "ext_running_sum",
    "ext_sessionize",
    "o1_top_abs",
    "f12_categorize",
    "d2_replace_by_key",
    "ext_tumbling_window",
    "ext_cube",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warmup = os.environ.get("BENCH_WARMUP", "1") != "0"
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = get_spark("bench")
    qs = queries()
    names = [n for n in HEADLINE if n in qs]
    # Optional extras via BENCH_QUERIES=name1,name2 or "all"
    extra = os.environ.get("BENCH_QUERIES")
    if extra == "all":
        names = list(qs)
    elif extra:
        names = [n for n in extra.split(",") if n in qs]

    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        if warmup:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
