"""Z-order layout: value preservation + the file-skipping contract."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from fintrack_etl_spark.io import table
from fintrack_etl_spark.operators.layout import (
    bin_by_cuts,
    cluster_write,
    quantile_cuts,
    with_zorder_key,
    zvalue,
)

PART_LO, PART_HI = 200, 400
SUPP_LO, SUPP_HI = 10, 30


def _files_overlapping_box(path: str) -> tuple[int, int]:
    """(files whose [min,max] stats overlap the 2-d box, total files) —
    exactly the footer-stats pruning decision Spark's parquet reader
    makes per file."""
    total = overlapping = 0
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(j).name for j in range(md.num_columns)]
        pi, si = names.index("l_partkey"), names.index("l_suppkey")
        stats = [
            [md.row_group(i).column(j).statistics for i in range(md.num_row_groups)]
            for j in (pi, si)
        ]
        pmin = min(s.min for s in stats[0])
        pmax = max(s.max for s in stats[0])
        smin = min(s.min for s in stats[1])
        smax = max(s.max for s in stats[1])
        total += 1
        if pmax >= PART_LO and pmin <= PART_HI and smax >= SUPP_LO and smin <= SUPP_HI:
            overlapping += 1
    return overlapping, total


def test_zvalue_interleaves_bits(spark):
    df = spark.createDataFrame([(0b1010, 0b0110)], ["a", "b"])
    z = df.select(zvalue([F.col("a"), F.col("b")], 4).alias("z")).first()["z"]
    # bit j of a -> position 2j; bit j of b -> 2j+1
    expect = sum(((0b1010 >> j) & 1) << (2 * j) for j in range(4)) + sum(
        ((0b0110 >> j) & 1) << (2 * j + 1) for j in range(4)
    )
    assert z == expect


def test_bin_by_cuts_is_monotone_and_null_safe(spark):
    df = spark.createDataFrame([(v,) for v in [None, 0.5, 1.5, 2.5, 99.0]], ["v"])
    out = [
        r["b"]
        for r in df.select(bin_by_cuts("v", [1.0, 2.0, 3.0]).alias("b"))
        .orderBy(F.col("v").asc_nulls_first())
        .collect()
    ]
    assert out == [0, 0, 1, 2, 3]


def test_quantile_bins_are_balanced(spark, sf_dir):
    li = table(spark, "lineitem", sf_dir)
    cuts = quantile_cuts(li, "l_partkey", 4)
    counts = (
        li.select(bin_by_cuts("l_partkey", cuts).alias("b")).groupBy("b").count().collect()
    )
    n = li.count()
    for r in counts:
        assert r["count"] >= 0.15 * n  # equal-population within sketch error


def test_cluster_write_preserves_rows_and_skips_files(spark, sf_dir, tmp_path):
    li = table(spark, "lineitem", sf_dir)
    zpath = str(tmp_path / "zorder")
    cluster_write(li, ["l_partkey", "l_suppkey"], zpath, n_files=8, bits_per_dim=4)

    back = spark.read.parquet(zpath)
    assert back.count() == li.count()
    # value preservation under the box predicate
    pred = (
        F.col("l_partkey").between(PART_LO, PART_HI)
        & F.col("l_suppkey").between(SUPP_LO, SUPP_HI)
    )
    a = li.filter(pred).agg(F.sum("l_quantity")).first()[0]
    b = back.filter(pred).agg(F.sum("l_quantity")).first()[0]
    assert a == b

    # the skipping contract: clustered layout leaves files whose footer
    # stats exclude the 2-d box entirely
    overlapping, total = _files_overlapping_box(zpath)
    assert total >= 6  # repartitionByRange hit the target file count
    assert overlapping < total, "z-order produced no skippable files"

    # single-column sort gives the second dimension full-range stats in
    # every file -> suppkey contributes nothing to pruning
    lpath = str(tmp_path / "linear")
    li.repartitionByRange(8, "l_partkey").sortWithinPartitions("l_partkey").write.mode(
        "overwrite"
    ).parquet(lpath)
    lin_overlap, lin_total = _files_overlapping_box(lpath)
    frac_z = overlapping / total
    frac_lin = lin_overlap / lin_total
    assert frac_z <= frac_lin, (
        f"z-order should prune at least as hard as single-column sort "
        f"({frac_z:.2f} vs {frac_lin:.2f})"
    )


def test_with_zorder_key_is_deterministic(spark, sf_dir):
    li = table(spark, "lineitem", sf_dir).limit(2000)
    a = with_zorder_key(li, ["l_partkey", "l_suppkey"]).select(F.sum("__zkey")).first()[0]
    b = with_zorder_key(li, ["l_partkey", "l_suppkey"]).select(F.sum("__zkey")).first()[0]
    assert a == b


def test_parquet_footer_stats_audits_range_clustered_files(spark, sf_dir, tmp_path):
    """Distributed footer audit: over a range-clustered multi-file
    table, the per-file (min, max) l_orderkey windows must cover all
    rows and be pairwise DISJOINT — the property file skipping relies
    on, read back through the same footers the planner uses."""
    import glob

    from fintrack_etl_spark.operators.layout import parquet_footer_stats

    li = table(spark, "lineitem", sf_dir)
    out = str(tmp_path / "ranged")
    li.repartitionByRange(6, "l_orderkey").sortWithinPartitions(
        "l_orderkey"
    ).write.mode("overwrite").parquet(out)

    paths = sorted(glob.glob(out + "/part-*.parquet"))
    stats = parquet_footer_stats(spark, paths, "l_orderkey").collect()
    assert len(stats) >= 6
    assert sum(r["n_rows"] for r in stats) == li.count()
    spans = sorted((r["min_key"], r["max_key"]) for r in stats)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert lo1 <= hi1 and lo2 <= hi2
        assert hi1 <= lo2, f"overlapping file ranges: {(lo1, hi1)} vs {(lo2, hi2)}"
