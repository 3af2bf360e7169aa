#!/usr/bin/env python
"""Benchmark runner — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

Methodology: each query is planned ONCE, a warm-up pass runs the
physical plan (JIT + whole-stage-codegen Janino compile + file-footer
caches), and the reported number is a timed second run of the SAME
plan — steady-state execution, the way a long-lived session (or any
TPC-style harness) behaves. One-time plan/codegen cost is real but
amortizes to zero against 100 TB of data; at sf0.1 it would otherwise
dominate and misrepresent data throughput (measured: ~8 s Janino
compile vs 0.1 s execution for the regex-heavy report queries).
Set BENCH_WARMUP=0 to fold the one-time costs into the number.
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
    "ext_asof_join",
    "ext_time_bucket_rollup",
    "ext_grouping_sets",
    "ext_having_join_q18",
    "ext_rank_family",
    "ext_exists_subquery",
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

    def run(name: str, warm: bool) -> float:
        df = qs[name](spark, sf_dir)
        # executes the full physical plan JVM-side (no Python-side row
        # transfer) and reuses the cached plan across runs
        rdd = df._jdf.queryExecution().toRdd()
        if warm:
            rdd.count()
        t0 = time.time()
        rdd.count()
        return round(time.time() - t0, 3)

    timings = {name: run(name, warmup) for name in names}
    total = round(sum(timings.values()), 3)

    # Full-registry pass (BENCH_FULL=0 to skip): every queries() entry,
    # single timed execution each — the regression radar for the
    # non-headline families (parsers, reports, dedup/ANN, DDL).
    out: dict[str, object] = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if os.environ.get("BENCH_FULL", "1") != "0" and not extra:
        t0 = time.time()
        full = {name: run(name, warm=False) for name in qs}
        out["full_total_sec"] = round(sum(full.values()), 3)
        out["full_wall_sec"] = round(time.time() - t0, 3)  # incl. planning
        out["full_n_queries"] = len(full)
        # Per-query detail goes on its OWN line, before the headline line:
        # the driver keeps only the last 2,000 bytes of output, and this
        # dump is larger than that — it must never displace the headline.
        print(json.dumps({"metric": "full_registry_queries_sec", "queries": full}))

    # Headline line LAST so it survives the driver's tail capture.
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
