"""Query registry — relational core (SURVEY.md §2.2-2.9).

Every entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DF``
with a DuckDB oracle SQL twin. Column names, rounding (money → 2 dp)
and tie-break keys are aligned on both sides so the driver's
order-insensitive value-hash compares clean (SURVEY §7 risk register).

Conventions:
* fixture tables are read straight from ``{sf_dir}/{name}.parquet``;
* monetary aggregates are ``round(x, 2)`` in BOTH engines;
* every top-N / window order carries a unique tie-break key;
* oracle casts integer sums to BIGINT (DuckDB sums ints to HUGEINT,
  Spark to long).
"""

from __future__ import annotations

import os
import re
import shutil
from collections.abc import Callable
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import functions as FX
from . import rules
from .operators import aggregate as agg_ops
from .operators import joins as join_ops
from .operators import topk as topk_ops
from .operators import upsert as upsert_ops
from .operators import skew as skew_ops
from .operators import windows as win_ops
from .operators.evolve import evolve_union


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from .io import table

    return table(spark, name, sf_dir)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# A1 — flagship: pricing-summary rollup (monthly_summary.py:32-38 shape,
# TPC-H Q1 on the fixture schema)
# ---------------------------------------------------------------------------


@register(
    "a1_group_sum_flagship",
    """
    WITH s AS (
        SELECT l_returnflag, l_linestatus,
               count(*)                                           AS n,
               sum(CAST(round(l_quantity * 100) AS BIGINT))       AS qc,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT))  AS pc,
               sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                   * (100 - CAST(round(l_discount * 100) AS HUGEINT))) AS dpc,
               sum(CAST(round(l_discount * 100) AS BIGINT))       AS dc
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus,
           CAST(qc AS DOUBLE) / 100.0                    AS sum_qty,
           CAST(pc AS DOUBLE) / 100.0                    AS sum_base_price,
           CAST(dpc AS DOUBLE) / 10000.0                 AS sum_disc_price,
           floor(CAST(qc AS DOUBLE) / n) / 100.0         AS avg_qty,
           floor(CAST(dc * 100 AS DOUBLE) / n) / 10000.0 AS avg_disc,
           n                                             AS n_rows
    FROM s
    """,
)
def a1_group_sum_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — ``monthly_summary.py:32-38`` re-expressed at scale: one scan,
    map-side partial agg, shuffle only on the two group keys.

    Money/quantity columns are 2-decimal doubles; all sums accumulate
    in EXACT integer cents (the ``ext_correlation`` discipline — no
    float-sum partial-order dependence can reach the driver hash), the
    discounted sum as an exact cents×percent product in decimal(38,0),
    and the averages as floor-scaled integer units divided once at the
    end — bit-identical across engines and partition orders."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    qc = F.expr("CAST(round(l_quantity * 100) AS BIGINT)")
    pc = F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
    dc = F.expr("CAST(round(l_discount * 100) AS BIGINT)")
    d38 = "decimal(38,0)"
    s = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qc).alias("qc"),
        F.sum(pc).alias("pc"),
        F.sum(pc.cast(d38) * (F.lit(100) - dc).cast(d38)).alias("dpc"),
        F.sum(dc).alias("dc"),
    )
    return s.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("qc").cast("double") / 100.0).alias("sum_qty"),
        (F.col("pc").cast("double") / 100.0).alias("sum_base_price"),
        (F.col("dpc").cast("double") / 10000.0).alias("sum_disc_price"),
        (F.floor(F.col("qc").cast("double") / F.col("n")) / 100.0).alias("avg_qty"),
        (F.floor((F.col("dc") * 100).cast("double") / F.col("n")) / 10000.0).alias("avg_disc"),
        F.col("n").alias("n_rows"),
    )


@register(
    "a2_group_sum_composite",
    """
    SELECT o_orderstatus, o_orderpriority,
           round(sum(o_totalprice), 2) AS total,
           count(*)                    AS n
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
)
def a2_group_sum_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — composite-key totals (``monthly_summary.py:42-48``)."""
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "a3_filtered_agg",
    """
    SELECT o_orderpriority,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS total
    FROM orders
    GROUP BY o_orderpriority
    HAVING sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) IS NOT NULL
    """,
)
def a3_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — conditional sum (``monthly_summary.py:51-60``): one scan,
    ``sum(when(...))`` instead of filter+agg so several conditions can
    share the shuffle."""
    out = agg_ops.filtered_group_sum(
        T(spark, sf_dir, "orders"),
        F.col("o_orderstatus") == "F",
        ["o_orderpriority"],
        "o_totalprice",
    )
    return out.withColumn("total", F.round("total", 2))


@register(
    "a4_watermark_max",
    """
    SELECT event_type, max(ts) AS max_ts
    FROM events
    GROUP BY event_type
    """,
)
def a4_watermark_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — watermark read (``datatrack_spark_utils.py:132-138``)."""
    return agg_ops.group_max(T(spark, sf_dir, "events"), ["event_type"], "ts", "max_ts")


@register(
    "a6_global_sums",
    """
    WITH s AS (
        SELECT count(*) AS n,
               sum(CAST(round(value * 100) AS BIGINT)) AS vc
        FROM events
    )
    SELECT CAST(vc AS DOUBLE) / 100.0            AS total_value,
           floor(CAST(vc AS DOUBLE) / n) / 100.0 AS avg_value,
           n
    FROM s
    """,
)
def a6_global_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — one-row global totals (``compare_budget.py:101-102``).
    Exact integer-cent accumulation (see a1): no float-sum order
    dependence, the average floor-scaled from exact integers."""
    s = T(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("vc"),
    )
    return s.select(
        (F.col("vc").cast("double") / 100.0).alias("total_value"),
        (F.floor(F.col("vc").cast("double") / F.col("n")) / 100.0).alias("avg_value"),
        "n",
    )


@register(
    "a7_value_counts",
    """
    SELECT o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def a7_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — value_counts (``inspect_bradesco_output.py:117,137``)."""
    return agg_ops.value_counts(T(spark, sf_dir, "orders"), ["o_orderpriority"])


@register(
    "a8_mode_per_group",
    """
    SELECT l_returnflag, l_linestatus AS l_linestatus_mode
    FROM (
        SELECT l_returnflag, l_linestatus,
               row_number() OVER (
                   PARTITION BY l_returnflag
                   ORDER BY count(*) DESC, l_linestatus ASC
               ) AS rn
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    )
    WHERE rn = 1
    """,
)
def a8_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — most-frequent value per group (``bradesco_bill.py:324-328``),
    deterministic tie-break."""
    return agg_ops.mode_per_group(T(spark, sf_dir, "lineitem"), ["l_returnflag"], "l_linestatus")


@register(
    "a9_describe_stats",
    """
    WITH s AS (
        SELECT count(*)                                          AS n,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS s,
               sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                   * CAST(round(l_extendedprice * 100) AS HUGEINT)) AS ss,
               min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS mn,
               max(CAST(round(l_extendedprice * 100) AS BIGINT)) AS mx
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL
    )
    SELECT n,
           floor(CAST(s AS DOUBLE) / n) / 100.0 AS mean,
           floor(sqrt(CAST(n * ss - s * s AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))) / 100.0 AS std,
           CAST(mn AS DOUBLE) / 100.0 AS min,
           CAST(mx AS DOUBLE) / 100.0 AS max
    FROM s
    """,
)
def a9_describe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 — describe() as typed aggregates (``inspect_bradesco_output.py:188-192``)."""
    return agg_ops.describe_stats(T(spark, sf_dir, "lineitem"), "l_extendedprice")


@register(
    "ext_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*)                  AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def ext_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — hierarchical subtotals (SURVEY §2.4 note)."""
    return (
        T(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "ext_cube",
    """
    SELECT o_orderstatus, o_orderpriority,
           round(sum(o_totalprice), 2) AS total,
           count(*)                    AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def ext_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — all grouping sets (SURVEY §2.4 note)."""
    return (
        T(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "ext_approx_distinct",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_exact,
           TRUE                      AS approx_within_rsd
    FROM lineitem
    GROUP BY 1
    """,
)
def ext_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — approx_count_distinct: the 100 TB-safe distinct.

    The HLL++ sketch value is engine-specific, so the oracle gates its
    ACCURACY CONTRACT instead: alongside the exact count (value-checked
    against DuckDB), the query emits whether the estimate landed within
    3× the requested 5% relative standard deviation — a derived
    invariant the driver can hash. Measured error on the fixtures is
    ~2.4–2.7%, so the bound has real margin without being vacuous.
    """
    li = T(spark, sf_dir, "lineitem")
    approx = agg_ops.approx_distinct(li, ["l_returnflag"], "l_partkey", rsd=0.05)
    exact = li.groupBy("l_returnflag").agg(F.countDistinct("l_partkey").alias("n_exact"))
    return exact.join(approx, "l_returnflag").select(
        "l_returnflag",
        "n_exact",
        (F.abs(F.col("approx_nd") - F.col("n_exact")) / F.col("n_exact") <= 0.15).alias(
            "approx_within_rsd"
        ),
    )


@register(
    "ext_sql_entry_q5",
    """
    SELECT n_name,
           CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                    * (100 - CAST(round(l_discount * 100) AS HUGEINT))) // 100
                AS DOUBLE) / 100.0                           AS revenue,
           CAST(count(*) AS BIGINT)                          AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA' AND o_orderdate >= DATE '1995-01-01'
    GROUP BY 1
    """,
)
def ext_sql_entry_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — the SQL-string entry point (SURVEY §3.3: the
    reference builds SQL strings over temp views,
    ``datatrack_spark_utils.py:62-89``) on a TPC-H Q5-shaped 5-way
    join. Catalyst broadcasts the dim chain
    (region→nation→customer) and reorders the joins; only the
    lineitem↔orders join shuffles."""
    from .io import register_fixture_views

    register_fixture_views(spark, sf_dir)
    # revenue in exact integer cents (Σ price_c·(100−disc_pct) floored
    # to cent grid) — float sums round-trip through partial-agg order
    return spark.sql(
        """
        SELECT n_name,
               CAST(div(sum(CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))
                        * (100 - CAST(round(l_discount * 100) AS DECIMAL(38,0)))), 100)
                    AS DOUBLE) / 100.0                       AS revenue,
               count(*)                                      AS n_lines
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'AMERICA' AND o_orderdate >= DATE '1995-01-01'
        GROUP BY n_name
        """
    )


@register(
    "ext_salted_agg",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT)       AS n,
           round(sum(l_quantity), 2)      AS total,
           round(min(l_quantity), 2)      AS vmin,
           round(max(l_quantity), 2)      AS vmax
    FROM lineitem
    GROUP BY 1
    """,
)
def ext_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — two-phase salted aggregate over a 3-value (maximally
    skewed) key: the hot key's partials run on 16 salt buckets before a
    tiny final combine. Oracle is the plain GROUP BY — salting must be
    value-invisible."""
    out = skew_ops.salted_group_agg(
        T(spark, sf_dir, "lineitem"), ["l_returnflag"], "l_quantity", buckets=16
    )
    return out.select(
        "l_returnflag",
        "n",
        F.round("total", 2).alias("total"),
        F.round("vmin", 2).alias("vmin"),
        F.round("vmax", 2).alias("vmax"),
    )


@register(
    "ext_salted_join",
    """
    WITH dim AS (
        SELECT DISTINCT o_orderpriority, substr(o_orderpriority, 1, 1) AS prio_class
        FROM orders
    )
    SELECT prio_class,
           CAST(count(*) AS BIGINT)    AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders JOIN dim USING (o_orderpriority)
    GROUP BY 1
    """,
)
def ext_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — skew-safe join: orders (5 hot priority keys) salted
    by o_orderkey hash across 8 buckets against the replicated dim, so
    no reducer owns a whole hot key. Oracle is the plain join — salting
    must be value-invisible."""
    orders = T(spark, sf_dir, "orders")
    dim = orders.select("o_orderpriority").distinct().withColumn(
        "prio_class", F.substring("o_orderpriority", 1, 1)
    )
    joined = skew_ops.salted_join(
        orders, dim.hint("shuffle_hash"), ["o_orderpriority"], "o_orderkey", buckets=8
    )
    return joined.groupBy("prio_class").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "ext_pivot",
    """
    SELECT o_orderpriority,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS F,
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS O,
           round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS P
    FROM orders
    GROUP BY 1
    """,
)
def ext_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — pivot with an explicit value list (no discovery
    scan: one aggregation pass, no second job to enumerate keys)."""
    piv = agg_ops.pivot_sum(
        T(spark, sf_dir, "orders"), "o_orderpriority", "o_orderstatus", ["F", "O", "P"], "o_totalprice"
    )
    return piv.select(
        "o_orderpriority",
        *[F.round(c, 2).alias(c) for c in ("F", "O", "P")],
    )


@register(
    "ext_percentiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 2) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 2) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 2) AS p75,
           round(quantile_cont(l_extendedprice, 0.99), 2) AS p99
    FROM lineitem
    GROUP BY 1
    """,
)
def ext_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — exact interpolated percentiles per group (both
    engines use the linear-interpolation definition, so values match
    to the cent). At 100 TB the approx_percentile sketch is the right
    tool; the exact form is the oracle-checkable baseline.

    r11: computed via ``aggregate.sorted_exact_percentiles`` (append
    buffer + one codegen sort) instead of the native ``percentile``
    aggregate's per-row boxed map insert — bit-identical values, 8x
    less per-task work on these near-unique prices (1.04 → 0.13 s).

    KNOWN sf0.001-ONLY ORACLE DIVERGENCE (outside the sf0.01 gate,
    pre-existing since r1, r12-documented per VERDICT r11 #7): when an
    interpolated percentile lands EXACTLY on a half cent (x.xx5, a
    representable double), Spark's ``round`` is HALF_UP
    (BigDecimal.ROUND_HALF_UP over the shortest decimal repr) while
    DuckDB's ``round`` is half-even — the two engines then disagree by
    one cent. The tiny sf0.001 lineitem happens to produce such a
    halfway midpoint; sf0.01/sf0.1 do not. This is an engine
    ``round``-semantics asterisk, not a percentile bug — the UNROUNDED
    interpolations are bit-identical (pinned by
    ``test_sorted_exact_percentiles_bit_identity``)."""
    li = T(spark, sf_dir, "lineitem")
    pct = agg_ops.sorted_exact_percentiles(
        li, ["l_returnflag"], "l_extendedprice", [0.25, 0.5, 0.75, 0.99]
    )
    return pct.select(
        "l_returnflag",
        *[F.round(F.col("pcts")[i], 2).alias(n) for i, n in enumerate(("p25", "p50", "p75", "p99"))],
    )


@register(
    "ext_percentiles_approx",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.50), 2) AS p50_exact,
           round(quantile_cont(l_extendedprice, 0.99), 2) AS p99_exact,
           TRUE AS approx_p50_in_bracket,
           TRUE AS approx_p99_in_bracket
    FROM lineitem
    GROUP BY 1
    """,
)
def ext_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — the ``approx_percentile`` scale twin of
    ``ext_percentiles``: at 100 TB the exact form sorts every group, the
    sketch is one pass with bounded memory.

    The sketch value is merge-order-dependent, so the oracle gates its
    RANK-ERROR CONTRACT: with accuracy 10000 the estimate's rank error
    is ≤ 1/10000, so the approx p50/p99 must lie inside the exact
    [p49, p51] / [p98.9, p99.1] value brackets (computed in the same
    query, value-checked via the exact p50/p99 columns). A sketch bug
    of any kind walks the estimate out of its bracket.

    Shares ext_percentiles' KNOWN sf0.001-ONLY divergence: an exact
    half-cent interpolation rounds HALF_UP in Spark and half-even in
    DuckDB (see ext_percentiles — pre-existing, outside the sf0.01
    gate, unrounded values bit-identical).
    """
    li = T(spark, sf_dir, "lineitem")
    # r11: exact side via aggregate.sorted_exact_percentiles
    # (bit-identical, 8x cheaper per task — see ext_percentiles); the
    # sketch rides in the same single aggregation pass via extra_aggs.
    approx = F.expr(
        "approx_percentile(l_extendedprice, array(0.5D, 0.99D), 10000)"
    )
    pct = agg_ops.sorted_exact_percentiles(
        li,
        ["l_returnflag"],
        "l_extendedprice",
        [0.49, 0.5, 0.51, 0.989, 0.99, 0.991],
        extra_aggs=[approx.alias("a")],
        out_col="e",
    )
    return pct.select(
        "l_returnflag",
        F.round(F.col("e")[1], 2).alias("p50_exact"),
        F.round(F.col("e")[4], 2).alias("p99_exact"),
        F.col("a")[0].between(F.col("e")[0], F.col("e")[2]).alias("approx_p50_in_bracket"),
        F.col("a")[1].between(F.col("e")[3], F.col("e")[5]).alias("approx_p99_in_bracket"),
    )


# ---------------------------------------------------------------------------
# Joins (J1-J5)
# ---------------------------------------------------------------------------


@register(
    "j1_budget_vs_actual",
    """
    WITH budget AS (
        -- 45 % of the order total in EXACT 10⁻⁴-dollar units, floored
        -- to cent grid (round(sum·0.45, 2) can land exactly on .xx5)
        SELECT o_orderpriority AS categoria,
               (sum(CAST(round(o_totalprice * 100) AS BIGINT)) * 45 // 100) AS oc
        FROM orders
        WHERE o_orderpriority < '4'
        GROUP BY o_orderpriority
    ),
    actual AS (
        SELECT o.o_orderpriority AS categoria,
               (sum(CAST(round(l.l_extendedprice * 100) AS HUGEINT)
                    * (100 - CAST(round(l.l_discount * 100) AS HUGEINT))) // 100) AS rc
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
    ),
    j AS (
        SELECT coalesce(a.categoria, b.categoria)  AS categoria,
               coalesce(b.oc, 0)                   AS oc,
               coalesce(a.rc, 0)                   AS rc,
               (b.oc IS NULL)                      AS sem_orcamento
        FROM actual a FULL OUTER JOIN budget b USING (categoria)
    )
    SELECT categoria,
           CAST(oc AS DOUBLE) / 100.0        AS orcado,
           CAST(rc AS DOUBLE) / 100.0        AS realizado,
           sem_orcamento,
           CAST(rc - oc AS DOUBLE) / 100.0   AS diferenca,
           CASE WHEN rc - oc <= 0 THEN 'OK' ELSE 'ESTOURO' END AS status,
           CASE WHEN oc > 0
                THEN floor(CAST((rc - oc) * 10000 AS DOUBLE) / oc) / 100.0
           END AS pct_esto
    FROM j
    """,
)
def j1_budget_vs_actual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — budget ⟗ actuals (``compare_budget.py:66-93``). Budget side
    broadcast; fact join shuffles once on the orderkey. Both inputs are
    exact integer cents floored to cent grid before the full-outer
    analytics (see ``budget_vs_actual``) — sum·0.45 and Σprice·(1−disc)
    land on the 10⁻⁴ grid where round-to-cents hits exact halfway."""
    orders = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    pc = F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
    dc = F.expr("CAST(round(l_discount * 100) AS BIGINT)")
    budget = (
        orders.filter(F.col("o_orderpriority") < "4")
        .groupBy(F.col("o_orderpriority").alias("categoria"))
        # cents summed in DECIMAL(38,0): a BIGINT sum wraps (ANSI:
        # errors) near 1e12 rows x 1e6 cents, and the x45 product
        # sooner — same scale guard as the m4 aggregates below
        .agg(
            F.expr(
                "div(sum(CAST(round(o_totalprice * 100) AS DECIMAL(38,0))) * 45, 100)"
            ).alias("oc")
        )
        .select("categoria", (F.col("oc") / 100.0).alias("orcado"))
    )
    actual = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("categoria"))
        .agg(F.sum(pc.cast(d38) * (F.lit(100) - dc).cast(d38)).alias("m4"))
        .select(
            "categoria",
            (F.expr("CAST(div(m4, 100) AS BIGINT)") / 100.0).alias("realizado"),
        )
    )
    return join_ops.budget_vs_actual(budget, actual)


@register(
    "j2_mode_backfill",
    """
    WITH base AS (
        SELECT l_orderkey, l_linenumber, l_returnflag,
               CASE WHEN l_linenumber = 1 THEN NULL ELSE l_linestatus END AS ls
        FROM lineitem
    ),
    modes AS (
        SELECT l_returnflag, ls AS ls_mode
        FROM (
            SELECT l_returnflag, ls,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY count(*) DESC, ls ASC) AS rn
            FROM base WHERE ls IS NOT NULL
            GROUP BY l_returnflag, ls
        ) WHERE rn = 1
    )
    SELECT b.l_orderkey, b.l_linenumber, b.l_returnflag,
           coalesce(b.ls, m.ls_mode) AS ls
    FROM base b LEFT JOIN modes m USING (l_returnflag)
    """,
)
def j2_mode_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — NULL backfill from per-group mode (``bradesco_bill.py:322-330``):
    mode table is tiny → broadcast join back."""
    base = T(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.when(F.col("l_linenumber") == 1, None).otherwise(F.col("l_linestatus")).alias("ls"),
    )
    return join_ops.mode_backfill(base, "l_returnflag", "ls")


@register(
    "j3_merge_upsert",
    """
    WITH t AS (
        SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-15'
        QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id ASC) = 1
    ),
    s AS (
        SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-15'
        QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id ASC) = 1
    ),
    u AS (
        SELECT *, 0 AS sr FROM t
        UNION ALL
        SELECT *, 1 AS sr FROM s
    )
    SELECT event_id, ts, user_id, event_type, round(value, 2) AS value
    FROM u
    QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, sr ASC, event_id ASC) = 1
    """,
)
def j3_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — MERGE latest-wins fallback (``mesclar_dados``,
    ``datatrack_spark_utils.py:306-362``): the post-MERGE table state.

    Fused single-window form (r11): dedup-each-side then merge-winners
    is ONE argmax per (user_id, event_type) over the tagged union. The
    two-phase selection (side winners by ``ts DESC, event_id ASC``;
    final by ``ts DESC, sr ASC, event_id ASC``) equals the single-pass
    argmax by ``ts DESC, sr ASC, event_id ASC`` over ALL rows: the
    global winner has max ts; if any target row carries max ts the
    final pick is the min-event_id target row at that ts on both paths
    (``sr ASC`` outranks event_id before target/source winners are
    ever compared by id), otherwise the min-event_id source row at max
    ts — i.e. exactly the side winner the merge would keep. Plan: one
    scan + one exchange + one window instead of two scans, three
    window sorts and three exchanges (the unfused composition stays in
    ``operators/upsert.merge_latest_wins`` for true two-table merges;
    equality of the two forms is pinned by
    ``test_j3_fused_equals_composed``)."""
    ev = T(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")
    sr = F.when(F.col("ts") >= cutoff, 1).otherwise(0)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.asc("_sr"), F.asc("event_id")
    )
    return (
        ev.withColumn("_sr", sr)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "event_id", "ts", "user_id", "event_type", F.round("value", 2).alias("value")
        )
    )


@register(
    "ext_setops",
    """
    SELECT 'intersect' AS op, count(*) AS n FROM (
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        INTERSECT
        SELECT o_custkey FROM orders
    )
    UNION ALL
    SELECT 'except' AS op, count(*) AS n FROM (
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        EXCEPT
        SELECT o_custkey FROM orders
    )
    UNION ALL
    SELECT 'union' AS op, count(*) AS n FROM (
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        UNION
        SELECT o_custkey FROM orders
    )
    """,
)
def ext_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 — set operations (needed by MERGE fallback & multi-bank
    consolidation; absent in reference, Spark built-ins)."""
    rich = T(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("k")
    )
    with_orders = T(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    parts = [
        rich.intersect(with_orders).agg(F.lit("intersect").alias("op"), F.count(F.lit(1)).alias("n")),
        rich.exceptAll(with_orders.distinct()).distinct().agg(
            F.lit("except").alias("op"), F.count(F.lit(1)).alias("n")
        ),
        rich.union(with_orders).distinct().agg(F.lit("union").alias("op"), F.count(F.lit(1)).alias("n")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Windows (W1-W3 + extensions)
# ---------------------------------------------------------------------------


@register(
    "w1_dedup_latest",
    """
    SELECT event_id, ts, user_id, event_type, round(value, 2) AS value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id ASC) = 1
    """,
)
def w1_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/D1 — keyed latest-wins dedup (``deduplicar_dados``,
    ``datatrack_spark_utils.py:51-95``)."""
    out = win_ops.dedup_latest(
        T(spark, sf_dir, "events"), ["user_id", "event_type"], "ts", ["event_id"]
    )
    return out.select("event_id", "ts", "user_id", "event_type", F.round("value", 2).alias("value"))


@register(
    "w2_forward_fill",
    """
    SELECT event_id, user_id, ts,
           round(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS last_purchase_value
    FROM events
    """,
)
def w2_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — last-non-null forward fill: the reference's PDF section
    context carry (``bb_statement.py:132-198``) as a running frame."""
    ev = T(spark, sf_dir, "events")
    marked = ev.withColumn(
        "last_purchase_value",
        F.when(F.col("event_type") == "purchase", F.col("value")),
    )
    filled = win_ops.forward_fill(marked, ["last_purchase_value"], "ts", ["user_id"])
    # forward_fill orders by ts only; re-derive with the event_id tie-break
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(
            F.last(F.when(F.col("event_type") == "purchase", F.col("value")), ignorenulls=True).over(w),
            2,
        ).alias("last_purchase_value"),
    )


@register(
    "w3_per_group_head",
    """
    SELECT l_returnflag, l_orderkey, l_linenumber,
           round(l_extendedprice, 2) AS price
    FROM lineitem
    QUALIFY row_number() OVER (PARTITION BY l_returnflag
                               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) <= 5
    """,
)
def w3_per_group_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — N rows per group (``inspect_bradesco_output.py:195-201``)."""
    out = win_ops.per_group_head(
        T(spark, sf_dir, "lineitem"),
        ["l_returnflag"],
        [F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")],
        n=5,
    )
    return out.select(
        "l_returnflag", "l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price")
    )


@register(
    "ext_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_total
    FROM orders
    """,
)
def ext_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — running balance per customer."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return T(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "ext_lag_lead",
    """
    SELECT o_custkey, o_orderkey,
           round(o_totalprice - lag(o_totalprice) OVER (PARTITION BY o_custkey
                                                        ORDER BY o_orderdate, o_orderkey), 2)
               AS delta_prev,
           round(lead(o_totalprice) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey), 2) AS next_price
    FROM orders
    """,
)
def ext_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — lag/lead deltas per customer."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return T(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).alias("delta_prev"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
    )


@register(
    "ext_sessionize",
    """
    WITH g AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            >= 1800 * 1000000
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(sum(brk) AS BIGINT) AS n_sessions,
           count(*)                 AS n_events
    FROM g
    GROUP BY user_id
    """,
)
def ext_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — 30-minute-gap sessionization (batch analog of
    ``session_window``)."""
    s = win_ops.sessionize(
        T(spark, sf_dir, "events"), "ts", ["user_id"], gap_minutes=30, tie_breakers=["event_id"]
    )
    return s.groupBy("user_id").agg(
        F.max("session_id").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Top-K / sorts (O1-O6)
# ---------------------------------------------------------------------------


@register(
    "o1_top_abs",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(valor_c AS DOUBLE) / 100.0      AS valor,
           CAST(abs(valor_c) AS DOUBLE) / 100.0 AS valor_abs
    FROM (
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_returnflag = 'R' THEN -mc ELSE mc END AS valor_c
        FROM (
            SELECT l_orderkey, l_linenumber, l_returnflag,
                   (CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))) // 100 AS mc
            FROM lineitem
        )
    )
    ORDER BY abs(valor_c) DESC, l_orderkey, l_linenumber
    LIMIT 15
    """,
)
def o1_top_abs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 — top-N by |value| (``monthly_summary.py:62-67``); returns
    (refunds negative) keep sign semantics. Compiles to
    TakeOrderedAndProject — no global sort at scale. Row values are
    exact floor-scaled cents (price·(1−disc) sits on the 10⁻⁴ grid
    where round-to-cents hits exact halfway; see a1)."""
    mag_c = F.expr(
        "div(CAST(round(l_extendedprice * 100) AS BIGINT)"
        " * (100 - CAST(round(l_discount * 100) AS BIGINT)), 100)"
    )
    valor_c = F.when(F.col("l_returnflag") == "R", -mag_c).otherwise(mag_c)
    df = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", valor_c.alias("valor_c")
    )
    top = df.orderBy(F.abs(F.col("valor_c")).desc(), "l_orderkey", "l_linenumber").limit(15)
    return top.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("valor_c") / 100.0).alias("valor"),
        (F.abs("valor_c") / 100.0).alias("valor_abs"),
    )


@register(
    "o2_filtered_topn",
    """
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
    FROM lineitem
    WHERE l_quantity > 45
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 10
    """,
)
def o2_filtered_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 — filter then top-N (``monthly_summary.py:70-73``)."""
    out = topk_ops.filtered_top_n(
        T(spark, sf_dir, "lineitem"),
        F.col("l_quantity") > 45,
        [F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")],
        n=10,
    )
    return out.select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price"))


# ---------------------------------------------------------------------------
# Scalar-function queries (F1-F24)
# ---------------------------------------------------------------------------


@register(
    "f1_brl_roundtrip",
    """
    WITH brl AS (
        SELECT o_orderpriority,
               'R$ ' || translate(printf('%.2f', o_totalprice), ',.', '.,') AS brl_str
        FROM orders
    )
    SELECT o_orderpriority,
           round(sum(CAST(replace(replace(regexp_replace(trim(brl_str), 'R\\$\\s*', ''),
                                  '.', ''), ',', '.') AS DOUBLE)), 2) AS total_parsed,
           count(*) AS n
    FROM brl
    GROUP BY o_orderpriority
    """,
)
def f1_brl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F18 — pt-BR money format + parse round-trip
    (``brl_to_float``, ``bb_statement.py:16-25``): native regexp chain,
    no UDF."""
    orders = T(spark, sf_dir, "orders")
    brl_str = F.concat(
        F.lit("R$ "), F.translate(F.format_number(F.col("o_totalprice"), 2), ",.", ".,")
    )
    parsed = FX.brl_to_double(brl_str)
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.sum(parsed), 2).alias("total_parsed"), F.count(F.lit(1)).alias("n")
    )


@register(
    "f7_multi_format_dates",
    """
    WITH raw AS (
        SELECT CASE WHEN o_orderkey % 2 = 0
                    THEN strftime(o_orderdate, '%d/%m/%Y')
                    ELSE strftime(o_orderdate, '%Y%m%d') END AS ds
        FROM orders
    ),
    parsed AS (
        SELECT CAST(coalesce(
            try_strptime(ds, '%Y-%m-%d'),
            try_strptime(ds, '%d/%m/%Y'),
            try_strptime(ds, '%Y%m%d'),
            try_strptime(ds, '%d%m%Y')) AS DATE) AS d
        FROM raw
    )
    SELECT EXTRACT(year FROM d) AS yr, count(*) AS n
    FROM parsed
    GROUP BY 1
    """,
)
def f7_multi_format_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — multi-format date parse (``helpers.py:39-70``): stringify
    each order date in one of two formats, parse back via the
    coalesce-of-formats chain, count per year."""
    orders = T(spark, sf_dir, "orders")
    ds = F.when(
        F.col("o_orderkey") % 2 == 0, F.date_format("o_orderdate", "dd/MM/yyyy")
    ).otherwise(F.date_format("o_orderdate", "yyyyMMdd"))
    parsed = FX.to_date_multi(ds)
    return (
        orders.select(parsed.alias("d"))
        .groupBy(F.year("d").alias("yr"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "f4_slugify",
    """
    SELECT regexp_replace(regexp_replace(regexp_replace(
               lower(trim('  ' || c_mktsegment || ' / Segment!')),
               '[^a-z0-9\\-_.]', '_', 'g'), '_+', '_', 'g'), '^_|_$', '', 'g') AS slug,
           count(*) AS n
    FROM customer
    GROUP BY 1
    """,
)
def f4_slugify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — slugify (``etls_raw/main.py:134-139``)."""
    raw = F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" / Segment!"))
    return (
        T(spark, sf_dir, "customer")
        .groupBy(FX.slugify(raw).alias("slug"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "f11_normalize_cpf",
    """
    SELECT lpad(regexp_replace(CAST(c_custkey AS VARCHAR) || '-' ||
                               CAST(c_custkey % 100 AS VARCHAR), '[.\\-\\s]', '', 'g'),
                11, '0') AS cpf,
           count(*) AS n
    FROM customer
    GROUP BY 1
    """,
)
def f11_normalize_cpf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 — CPF normalization (``helpers.py:84-98``)."""
    raw = F.concat(
        F.col("c_custkey").cast("string"), F.lit("-"), (F.col("c_custkey") % 100).cast("string")
    )
    return (
        T(spark, sf_dir, "customer")
        .groupBy(FX.normalize_cpf(raw).alias("cpf"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


_CATEGORIZE_DESC_SQL = """
    CASE CAST(p_partkey % 16 AS INT)
        WHEN 0 THEN 'UDEMY COURSE 4821'
        WHEN 1 THEN 'SUPERMERCADO BOM PRECO'
        WHEN 2 THEN 'NETFLIX.COM MENSAL'
        WHEN 3 THEN 'LOJA DAS FABRICAS PARC 02/04'
        WHEN 4 THEN 'PAGTO DEBITO AUTOMATICO'
        WHEN 5 THEN 'BOUTIQUE CHIC FORTALEZA'
        WHEN 6 THEN 'UBER TRIP 123'
        WHEN 7 THEN 'WELLHUB ACADEMIA BR'
        WHEN 8 THEN 'OPENAI CHATGPT SUBSCR'
        WHEN 9 THEN 'MERCADOLIVRE*VENDA 881'
        WHEN 10 THEN 'MERCADOPAGO LOJA DO ZE'
        WHEN 11 THEN 'ITC PARKING SHOPPING'
        WHEN 12 THEN 'TOKIO MARINE*AUTO 07/10'
        WHEN 13 THEN 'IFD*RESTAURANTE TOP FORTALEZA'
        WHEN 14 THEN 'IOF COMPRA INTERNACIONAL'
        ELSE 'XYZ DESCONHECIDO'
    END
"""


def _categorize_oracle() -> str:
    exprs = rules.categorize_sql_case(f"({_CATEGORIZE_DESC_SQL})")
    return f"""
    SELECT {exprs['categoria']}           AS categoria,
           {exprs['subcategoria']}        AS subcategoria,
           {exprs['recorrente_suspeita']} AS recorrente_suspeita,
           {exprs['parcelado_suspeito']}  AS parcelado_suspeito,
           count(*) AS n
    FROM part
    GROUP BY 1, 2, 3, 4
    """


@register("f12_categorize", None)  # oracle attached below (computed string)
def f12_categorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 — category rule engine (``categories_bb.py:223-274``) compiled
    to one native when-chain; synthetic merchant descriptions keyed off
    ``p_partkey`` exercise rules + all three fallbacks."""
    part = T(spark, sf_dir, "part")
    desc = F.expr(_CATEGORIZE_DESC_SQL)
    cat = rules.categorize(desc)
    return (
        part.select(cat.alias("c"))
        .select("c.categoria", "c.subcategoria", "c.recorrente_suspeita", "c.parcelado_suspeito")
        .groupBy("categoria", "subcategoria", "recorrente_suspeita", "parcelado_suspeito")
        .agg(F.count(F.lit(1)).alias("n"))
    )


ORACLES["f12_categorize"] = _categorize_oracle()


# ---------------------------------------------------------------------------
# Incremental / idempotency (D2-D4) + schema evolution
# ---------------------------------------------------------------------------


@register(
    "d2_replace_by_key",
    """
    SELECT event_id % 7 AS source_file,
           count(*)     AS n,
           round(sum(CASE WHEN event_id % 7 = 3 THEN value * 2 ELSE value END), 2) AS total
    FROM events
    GROUP BY 1
    """,
)
def d2_replace_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 — idempotent per-source-file replace (``forms_main.py:395-423``):
    anti-join out the reloaded file's rows, union the reload."""
    ev = T(spark, sf_dir, "events").withColumn("source_file", F.col("event_id") % 7)
    reload_src = ev.filter(F.col("source_file") == 3).withColumn("value", F.col("value") * 2)
    new_state = upsert_ops.replace_by_source_key(ev, reload_src, "source_file")
    return new_state.groupBy("source_file").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
    )


@register(
    "d4_incremental_watermark",
    """
    SELECT event_type, count(*) AS n, max(ts) AS max_ts
    FROM events
    WHERE ts > TIMESTAMP '2024-01-20 00:00:00'
    GROUP BY event_type
    """,
)
def d4_incremental_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 — high-watermark incremental load
    (``datatrack_spark_utils.py:146-188``): the predicate pushes to the
    parquet scan (partition-prunes on a date-partitioned lake table)."""
    from .operators.incremental import incremental_filter

    ev = incremental_filter(T(spark, sf_dir, "events"), "ts", "2024-01-20 00:00:00")
    return ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"), F.max("ts").alias("max_ts"))


@register(
    "ext_schema_evolution",
    """
    WITH evolved AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
        FROM orders WHERE o_orderstatus = 'O'
        UNION ALL
        SELECT o_orderkey, CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE), o_orderpriority
        FROM orders WHERE o_orderstatus <> 'O'
    )
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM evolved
    GROUP BY 1, 2
    """,
)
def ext_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§1.3 — schema evolution (``evoluir_schema``,
    ``datatrack_spark_utils.py:221-302``): add-column + NULL-backfill +
    reorder as a pure union."""
    orders = T(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = orders.filter(F.col("o_orderstatus") != "O").select("o_orderkey", "o_orderpriority")
    evolved = evolve_union(old, new)
    return evolved.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


@register("ext_alter_table_evolution", None)  # oracle attached below
def ext_alter_table_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§1.3 — the CATALOG side of schema evolution (``evoluir_schema``
    emits ``ALTER TABLE ... ADD COLUMN``, ``datatrack_spark_utils.py:
    261-269``), where ``ext_schema_evolution`` covers the DataFrame
    side: write a managed table at the old schema, append a batch
    carrying a NEW column via ``lake.evolve_table_add_columns`` (ALTER
    TABLE ADD COLUMNS — metadata-only, old files untouched — then an
    order-realigned NULL-filling append), and aggregate the evolved
    table. Same oracle as the union twin, so the DDL round-trip is
    value-checked end to end.
    """
    from .lake import evolve_table_add_columns

    orders = T(spark, sf_dir, "orders")
    slug = re.sub(r"[^A-Za-z0-9]+", "_", os.path.basename(sf_dir.rstrip("/")))
    name = f"evolved_orders_{slug}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    # a previous PROCESS's managed location survives its (per-session
    # derby) metastore entry — clear it or CTAS refuses the name
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
    orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).write.saveAsTable(name)
    new = orders.filter(F.col("o_orderstatus") != "O").select("o_orderkey", "o_orderpriority")
    added = evolve_table_add_columns(new, spark, name)
    assert added == ["o_orderpriority"], added
    return (
        spark.table(name)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


ORACLES["ext_alter_table_evolution"] = ORACLES["ext_schema_evolution"]


@register(
    "ext_asof_join",
    """
    WITH t AS (SELECT * FROM events WHERE event_type = 'purchase'),
         q AS (SELECT * FROM events WHERE event_type = 'view')
    SELECT t.event_id, t.user_id, t.ts,
           round(t.value, 2)  AS value,
           q.ts               AS asof_ts,
           round(q.value, 2)  AS asof_value
    FROM t ASOF LEFT JOIN q
      ON t.user_id = q.user_id AND q.ts <= t.ts
    """,
)
def ext_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — backward as-of join (union + forward-fill, one
    shuffle on the key): each purchase gets the latest preceding view's
    value per user. Oracle uses DuckDB's native ASOF JOIN —
    an independent implementation of the same semantics."""
    ev = T(spark, sf_dir, "events")
    trades = ev.filter(F.col("event_type") == "purchase")
    quotes = ev.filter(F.col("event_type") == "view")
    out = join_ops.asof_join(
        trades, quotes, on=["user_id"], right_cols={"value": "asof_value"}
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.round("value", 2).alias("value"),
        "asof_ts",
        F.round("asof_value", 2).alias("asof_value"),
    )


@register(
    "ext_range_join",
    """
    WITH tiers AS (
        SELECT i AS tier, i * 50000.0 AS lo, (i + 1) * 50000.0 AS hi
        FROM range(12) r(i)
    )
    SELECT tier, lo, hi,
           count(*)                    AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders JOIN tiers
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY 1, 2, 3
    """,
)
def ext_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — band/range join: orders matched to broadcast price
    tiers via ``lo <= value < hi`` (BroadcastNestedLoopJoin; the fact
    side never shuffles), then per-tier totals."""
    tiers = (
        spark.range(12)
        .select(
            F.col("id").alias("tier"),
            (F.col("id") * 50000.0).alias("lo"),
            ((F.col("id") + 1) * 50000.0).alias("hi"),
        )
    )
    orders = T(spark, sf_dir, "orders")
    joined = join_ops.range_join(orders, tiers, "o_totalprice")
    return joined.groupBy("tier", "lo", "hi").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "ext_time_bucket_rollup",
    """
    SELECT time_bucket(INTERVAL '1 day', ts) AS bucket,
           event_type,
           count(*)             AS n,
           round(sum(value), 2) AS total,
           round(min(value), 2) AS vmin,
           round(max(value), 2) AS vmax
    FROM events
    GROUP BY 1, 2
    """,
)
def ext_time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — hypertable-style continuous-aggregate rollup: 6-hour
    time buckets re-aggregated to 1-day buckets (sum-of-sums/min-of-
    mins; raw data touched once). Oracle computes the day aggregate
    directly from raw events, so the nesting of the rollup path is what
    gets value-checked."""
    ev = T(spark, sf_dir, "events")
    fine = agg_ops.time_bucket_agg(ev, "ts", "6 hours", ["event_type"], "value")
    day = agg_ops.rollup_time_buckets(fine, "1 day", ["event_type"])
    return day.select(
        "bucket",
        "event_type",
        "n",
        F.round("total", 2).alias("total"),
        F.round("vmin", 2).alias("vmin"),
        F.round("vmax", 2).alias("vmax"),
    )


@register(
    "ext_tumbling_window",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
           event_type,
           count(*)              AS n,
           round(sum(value), 2)  AS total
    FROM events
    GROUP BY 1, 2
    """,
)
def ext_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-analog — tumbling 1-day event-time window (batch
    ``F.window``; the readStream variant lives in streaming/windows.py)."""
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total",
        )
    )


# ---------------------------------------------------------------------------
# Extensions — grouped analytics beyond the reference surface (§2.4 note:
# grouping sets / distinct aggs are Spark built-ins worth exposing)
# ---------------------------------------------------------------------------

_GROUPING_SETS_SQL = """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*)                       AS n,
           round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register("ext_grouping_sets", _GROUPING_SETS_SQL)
def ext_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — GROUPING SETS through the SQL-string entry point
    (same Catalyst pipeline as the DataFrame API, SURVEY §3.3).

    Physical shape: ONE Expand (each input row emitted once per
    grouping set) feeding ONE partial-agg → exchange → final-agg. At
    100 TB the cost is 3× map-side rows into a map-side combine — not
    three scans and not three shuffles. The fixture has no NULL keys,
    so the 'ALL' coalesce labels are unambiguous on both engines.
    """
    T(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_GROUPING_SETS_SQL)


@register(
    "ext_count_distinct",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*)                  AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def ext_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — multi-column EXACT distinct aggregation.

    Catalyst rewrites N distinct aggregates into one Expand (row × N,
    each copy keeping one distinct column) + a two-round aggregate —
    one shuffle keyed (group, distinct-value), one keyed (group). The
    declarative form survives 100 TB because dedup happens distributed
    on the expanded key, never as a driver-side set. For cardinality
    estimates at scale prefer ext_approx_distinct (HLL, no Expand).
    """
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "ext_range_frame",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
               RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW), 2) AS rolling_7d
    FROM orders
    """,
)
def ext_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — value-based (RANGE) window frame: per-customer
    rolling 7-day spend.

    The frame is bounded by event-time VALUE, not row count, so
    duplicate timestamps need no tie-break (peers share a frame) and
    the result is insensitive to intra-key row order. One shuffle on
    o_custkey; both engines order on integer epoch seconds so the
    604800-second bound is bit-identical.
    """
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-604800, 0)
    )
    return T(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("rolling_7d"),
    )


@register(
    "ext_rank_family",
    """
    SELECT o_orderpriority, o_orderkey,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           CAST(ntile(4) OVER w AS INT)        AS quartile,
           round(percent_rank() OVER w, 6)     AS pct_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def ext_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — ranking family (rank/dense_rank/ntile/percent_rank)
    in one window pass: one shuffle on the partition key, explicit
    o_orderkey tie-break so every rank is deterministic (SURVEY §7).

    Scale note (r9): this entry deliberately keeps the NATIVE
    single-pass window — it is the SQL-surface showcase of Spark's
    rank family, and o_orderpriority has only 5 values, so each task
    sorts corpus/5 rows. When a low-cardinality partition key meets a
    corpus-sized table in production, the bounded path is
    ``operators.windows.grouped_global_rank`` (+ the ntile formula
    x77 uses, + percent_rank = (rank−1)/(cnt−1) off the same
    broadcast counts) — every per-task sort capped at one range
    partition; x54/x77 run that form.

    r12 10× probe (VERDICT r11 #9, `plans/r12/probe_core.jsonl`):
    0.61 → 1.04 s warm for 10× the orders — sub-linear at this scale,
    i.e. the 5-task cap is not yet the wall at 10×; it WILL become
    the wall once corpus/5 rows exceed one task's sort budget, which
    is exactly when to migrate to the grouped_global_rank form
    above."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return T(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@register(
    "ext_having_join_q18",
    """
    WITH big AS (
        SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
        FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    SELECT o.o_orderkey, c.c_name,
           round(o.o_totalprice, 2) AS o_totalprice, big.total_qty
    FROM big
    JOIN orders o   ON big.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def ext_having_join_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — TPC-H Q18 shape: aggregate-then-join reduction.

    The HAVING aggregate runs FIRST, shrinking lineitem to the few
    qualifying orderkeys before any join touches orders/customer — the
    ordering that matters at 100 TB (join the 0.1%, not the 100%).
    AQE converts the shrunken side to a broadcast at runtime.
    """
    li = T(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "o_orderkey",
            "c_name",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )


_EXISTS_SQL = """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'F')
"""


@register("ext_exists_subquery", _EXISTS_SQL)
def ext_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — correlated EXISTS subquery via the SQL entry point.

    Catalyst decorrelates it into a LEFT SEMI join (customer ⋉ orders):
    the probe side streams, the filter pushes into the orders scan, and
    no row from orders is ever materialized into the output — the plan
    a hand-written semi_join would produce, derived from ANSI SQL.
    """
    T(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    T(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_EXISTS_SQL)


@register(
    "ext_unpivot",
    """
    SELECT l_orderkey, l_linenumber, measure, value FROM (
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    )
    """,
)
def ext_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — unpivot/melt (ext_pivot's inverse): wide measure
    columns → long (measure, value) rows. Spark's ``unpivot`` expands
    each row N-fold map-side with NO shuffle and NO extra scans — the
    oracle's UNION-ALL formulation would scan the table four times;
    the Expand-based plan is why you melt in the engine, not upstream.
    """
    return T(spark, sf_dir, "lineitem").unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    )


_SCALAR_SUBQ_SQL = """
    SELECT o.o_orderkey, o.o_custkey,
           round(o.o_totalprice, 2) AS o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 2 * (
        SELECT avg(o2.o_totalprice) FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
"""


@register("ext_scalar_subquery", _SCALAR_SUBQ_SQL)
def ext_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — correlated scalar-aggregate subquery (orders more
    than 2× their customer's average) via the SQL entry point.

    Catalyst decorrelates it into ONE aggregate over orders grouped by
    the correlation key + ONE join back — the table is scanned twice
    but shuffled once per side on o_custkey, instead of the naive
    per-row subquery (O(n) scans). The hand-written equivalent
    (groupBy + join) produces the same plan; the declarative form is
    what an analyst actually writes.
    """
    T(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SCALAR_SUBQ_SQL)


@register(
    "ext_json_extract",
    """
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*)             AS n,
           round(sum(value), 2) AS total
    FROM events
    GROUP BY 1
    """,
)
def ext_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — semi-structured column pipeline (F23): parse the
    JSON ``props`` payload with an explicit schema via ``from_json``,
    aggregate on an extracted field.

    The schema-first parse matters at scale: ``from_json`` with a
    declared StructType runs in the JVM per batch and prunes unused
    JSON fields (Spark's nested-schema pruning), vs schema inference
    which costs an extra full scan before the real one.
    """
    ev = T(spark, sf_dir, "events")
    k = F.from_json("props", "k BIGINT")["k"]
    return (
        ev.select((k % 10).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )


@register(
    "f18_brl_format",
    """
    WITH v AS (
        SELECT o_orderkey,
               round(CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice
                          ELSE -o_totalprice END, 2) AS valor
        FROM orders
    ),
    cents AS (
        SELECT o_orderkey, valor,
               CAST(round(abs(valor) * 100) AS BIGINT) AS ac
        FROM v
    )
    SELECT o_orderkey,
           CASE WHEN valor < 0 THEN 'R$ -' ELSE 'R$ ' END
           || translate(format('{:,}', ac // 100), ',', '.')
           || ',' || lpad(CAST(ac % 100 AS VARCHAR), 2, '0') AS brl
    FROM cents
    """,
)
def f18_brl_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F18 — pt-BR money rendering round-trip
    (``compare_budget.py:108-111``). Spark renders with
    ``format_number`` + separator translate; the oracle rebuilds the
    string from integer cents (DuckDB cannot thousands-format floats),
    so the comparison also proves the two formatters agree digit-for-
    digit on every 2-dp value in the fixture.
    """
    signed = F.when(F.col("o_orderkey") % 2 == 0, F.col("o_totalprice")).otherwise(
        -F.col("o_totalprice")
    )
    return T(spark, sf_dir, "orders").select(
        "o_orderkey", FX.brl_format(F.round(signed, 2)).alias("brl")
    )


@register(
    "ext_gap_fill",
    """
    WITH daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               round(sum(value), 2) AS total
        FROM events GROUP BY 1, 2
    ),
    spans AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
    cal AS (
        SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        FROM spans
    ),
    j AS (
        SELECT c.user_id, c.day, d.total
        FROM cal c LEFT JOIN daily d USING (user_id, day)
    )
    SELECT user_id, day,
           last_value(total IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS total,
           total IS NOT NULL AS is_observed
    FROM j
    """,
)
def ext_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — per-user daily totals densified over each user's
    observed span (``operators/gapfill.py``): sequence+explode calendar,
    left join, last-non-null forward fill. Two exchanges total; the
    expansion is span×keys, not a global-calendar cross join.
    """
    from .operators.gapfill import gap_fill_daily

    ev = T(spark, sf_dir, "events")
    daily = (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    return gap_fill_daily(daily, "user_id", "day", "total")


@register(
    "ext_min_max_by",
    """
    SELECT o_orderpriority,
           arg_max(o_orderkey, o_totalprice) AS biggest_order,
           arg_min(o_orderkey, o_totalprice) AS smallest_order,
           round(max(o_totalprice), 2)       AS max_price,
           round(min(o_totalprice), 2)       AS min_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def ext_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — argmin/argmax aggregation (``max_by``/``min_by``):
    the single-pass "row of the extreme" idiom that replaces the
    self-join-on-max anti-pattern (one shuffle instead of two scans +
    a join). Deterministic on the fixture because per-group price
    extremes are unique (verified at sf0.01 and sf0.1); for tie-prone
    data use the W3 window form with an explicit tie-break instead.
    """
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
            F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
        )
    )


@register(
    "ext_array_agg",
    """
    SELECT o_orderpriority,
           array_to_string((array_agg(o_orderkey ORDER BY o_orderkey))[1:5], ',')
               AS first_orders,
           count(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def ext_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — ordered array aggregation: ``collect_list`` is
    unordered by contract (partition arrival order), so the
    deterministic form sorts INSIDE the aggregate result
    (``array_sort`` post-agg) — the only ordering guarantee that
    survives distributed execution. Slice keeps the payload bounded.
    The driver-hashed emission is the csv string form (x29/q8_csv
    precedent): raw array columns crash the driver's pandas
    canonicalizer (unhashable list), so both sides ``array_join``.
    """
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.array_join(
                F.slice(F.array_sort(F.collect_list("o_orderkey")), 1, 5), ","
            ).alias("first_orders"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "ext_session_window",
    """
    WITH g AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('microsecond', lag(ts) OVER w, ts)
                            >= 1800 * 1000000
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts, value,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM g
    )
    SELECT user_id, min(ts) AS session_start,
           count(*) AS n_events, round(sum(value), 2) AS total
    FROM s GROUP BY user_id, sid
    """,
)
def ext_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — native ``session_window`` (30-min inactivity gap)
    sessionization in ONE aggregate: Spark merges overlapping per-row
    windows inside the aggregation, no window-function pass, and the
    identical operator runs on a stream with a watermark
    (``streaming/pipelines.sessionized_stream``). The oracle is the
    classic lag + cumulative-sum run-id formulation — two formulations,
    one result. The oracle's break predicate is an exact
    microsecond-difference ``>= 1800s`` (not ``date_diff('second') >
    1800``, which counts second-boundary crossings and disagrees with
    the native operator for gaps in ``[1800s, 1801s)``).
    """
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "total",
        )
    )


@register(
    "ext_interval_join",
    """
    SELECT l.user_id                 AS l_key,
           l.event_id                AS l_event,
           r.event_id                AS r_event,
           l.ts                      AS l_ts,
           r.ts                      AS r_ts,
           round(r.value, 2)         AS r_value
    FROM events l
    JOIN events r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts
     AND r.ts <= l.ts + INTERVAL 30 MINUTE
     AND l.event_id < r.event_id
    WHERE l.event_type = 'click' AND r.event_type = 'purchase'
    """,
)
def ext_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of ``streaming.stream_interval_join`` — the SAME
    function runs here on bounded inputs (``withWatermark`` is a no-op
    on batch plans), so the oracle value-checks the exact join
    condition the stream-stream state machine enforces:
    right.ts ∈ [left.ts, left.ts + 30 min] per key, event-id ordered
    (click→purchase attribution). With the streaming equivalence pinned
    in tests/test_streaming.py, the driver's green row here covers the
    streaming pipeline's semantics too."""
    from .streaming.pipelines import stream_interval_join

    ev = T(spark, sf_dir, "events")
    return stream_interval_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )


@register(
    "ext_running_totals_state",
    """
    SELECT user_id,
           count(*)                              AS n,
           round(sum(coalesce(value, 0.0)), 2)   AS total
    FROM events
    GROUP BY user_id
    """,
)
def ext_running_totals_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of ``streaming.running_totals_stream``'s converged
    state: the stateful ``applyInPandasWithState`` operator folds
    (n, total) per key across micro-batches with NULLs counted as 0.0
    (``fillna(0.0)``); after a full drain its state equals this
    from-scratch aggregate (equivalence pinned in
    tests/test_streaming.py::test_running_totals_stateful_stream).
    The oracle gates the same fold: count + NULL-as-zero sum per key."""
    ev = T(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 2).alias("total"),
    )


@register(
    "ext_versioned_merge",
    """
    WITH t AS (
        SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-15'
        QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id ASC) = 1
    ),
    s AS (
        SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-15'
        QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id ASC) = 1
    ),
    u AS (
        SELECT *, 0 AS sr FROM t
        UNION ALL
        SELECT *, 1 AS sr FROM s
    )
    SELECT event_id, ts, user_id, event_type, round(value, 2) AS value
    FROM u
    QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, sr ASC, event_id ASC) = 1
    """,
)
def ext_versioned_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 through the atomic commit log (``lake_tx``): seed the target
    as version 1, MERGE the source as version 2 (read vN → write vN+1
    → one atomic manifest swap — no overwrite window, no self-read
    pin), vacuum the old snapshot (D5,
    ``datatrack_spark_utils.py:756-768``), and return the committed
    state read back from disk. Same latest-wins semantics as
    j3_merge_upsert — the oracle is identical — but the value-check
    here covers the full commit/read/expire protocol, not just the
    merge expression. Crash-atomicity contracts live in
    tests/test_lake_tx.py."""
    from . import lake_tx

    root = f"/tmp/fintrack_lake_tx_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(root, ignore_errors=True)

    ev = T(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")
    target = win_ops.dedup_latest(
        ev.filter(F.col("ts") < cutoff), ["user_id", "event_type"], "ts", ["event_id"]
    )
    lake_tx.commit_table(target, root)
    lake_tx.merge_latest_wins_versioned(
        spark,
        root,
        ev.filter(F.col("ts") >= cutoff),
        ["user_id", "event_type"],
        "ts",
        ["event_id"],
    )
    lake_tx.expire_versions(root, retain_last=1)
    return lake_tx.read_table(spark, root).select(
        "event_id", "ts", "user_id", "event_type", F.round("value", 2).alias("value")
    )


@register(
    "ext_table_changes",
    """
    WITH t AS (
        SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-15'
        QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id ASC) = 1
    ),
    s AS (
        SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-15'
        QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id ASC) = 1
    ),
    u AS (
        SELECT *, 0 AS sr FROM t
        UNION ALL
        SELECT *, 1 AS sr FROM s
    ),
    m AS (
        SELECT event_id, ts, user_id, event_type, value
        FROM u
        QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, sr ASC, event_id ASC) = 1
    )
    SELECT m.user_id, m.event_type, m.event_id,
           round(m.value, 2) AS value,
           CASE WHEN t.user_id IS NULL THEN 'insert'
                ELSE 'update_postimage' END AS _change_type
    FROM m LEFT JOIN t
      ON m.user_id = t.user_id AND m.event_type = t.event_type
    WHERE t.user_id IS NULL
       OR m.event_id <> t.event_id OR m.ts <> t.ts
       OR m.value IS DISTINCT FROM t.value
    """,
)
def ext_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed between commit-log snapshots
    (``lake_tx.table_changes`` — the public Delta CDF idea): commit the
    pre-cutoff state as v1, MERGE the post-cutoff batch as v2, then
    diff the two retained snapshots keyed on the merge keys. The oracle
    recomputes the classification relationally: a merged row whose key
    was absent from v1 is an ``insert``; one whose row image changed is
    an ``update_postimage``; latest-wins MERGE never deletes, and the
    engine must emit no delete rows (checked by the value hash — a
    spurious delete adds a row). Time-travel + vacuum interaction and
    whole-row/keyed delete coverage live in tests/test_lake_tx.py."""
    from . import lake_tx

    root = f"/tmp/fintrack_lake_cdf_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(root, ignore_errors=True)

    ev = T(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")
    target = win_ops.dedup_latest(
        ev.filter(F.col("ts") < cutoff), ["user_id", "event_type"], "ts", ["event_id"]
    )
    lake_tx.commit_table(target, root)
    lake_tx.merge_latest_wins_versioned(
        spark, root, ev.filter(F.col("ts") >= cutoff), ["user_id", "event_type"], "ts", ["event_id"]
    )
    return lake_tx.table_changes(
        spark, root, 1, 2, keys=["user_id", "event_type"]
    ).select(
        "user_id",
        "event_type",
        "event_id",
        F.round("value", 2).alias("value"),
        "_change_type",
    )


@register(
    "ext_ewma",
    """
    WITH e AS (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts ASC, event_id ASC) AS rn
        FROM events
    )
    SELECT user_id, event_id,
           round(sum(value * power(0.9, -rn))
                     OVER (PARTITION BY user_id ORDER BY rn
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / sum(power(0.9, -rn))
                     OVER (PARTITION BY user_id ORDER BY rn
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 4) AS ewma_value
    FROM e
    """,
)
def ext_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA per user over event time (α=0.1, pandas adjust=True
    semantics) — ``operators/windows.ewma``, the engine's documented
    sequential-per-key Arrow fallback. The oracle uses the closed-form
    identity ``y_i = Σ x_j(1-α)^{-j} / Σ (1-α)^{-j}`` (the common
    ``(1-α)^i`` cancels), valid at gate scale where series are short;
    the operator itself uses the recurrence and has no such length
    limit — which is exactly why it exists instead of a window
    expression.

    r11: project to exactly the 4 columns the recurrence needs BEFORE
    the operator's repartition (guide §2.3/§4.1 — ``mapInPandas`` is
    opaque to Catalyst, so without the explicit select the shuffle and
    both Arrow crossings carry ``props``/``event_type`` for nothing;
    0.52 → 0.45 s same-session at sf0.1)."""
    from .operators import windows as W

    ev = T(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    out = W.ewma(ev, ["user_id"], ["ts", "event_id"], "value", alpha=0.1, alias="ewma_value")
    return out.select("user_id", "event_id", F.round("ewma_value", 4).alias("ewma_value"))


@register(
    "ext_bloom_prune_join",
    """
    SELECT l.l_returnflag,
           CAST(count(*) AS BIGINT)                              AS n,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS HUGEINT)
                    * (100 - CAST(round(l.l_discount * 100) AS HUGEINT))) // 100
                AS DOUBLE) / 100.0 AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_returnflag
    """,
)
def ext_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — Bloom semi-join reduction (``operators/bloom.py``):
    lineitem is pruned by a distributed Bloom filter of the urgent
    orders' keys BEFORE the join shuffle (pure-codegen byte-bitmap
    probe, no UDF), then the exact join removes false positives. The
    oracle is the plain join — pruning must be value-invisible; what
    it buys at 100 TB is an exchange that carries ~20 % of the fact
    table instead of all of it."""
    from .operators.bloom import bloom_prune_join

    urgent = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    li = T(spark, sf_dir, "lineitem")
    # 2^18 bits ≈ 8.7 bits/key at sf0.1's ~30 K urgent keys (~1.6 %
    # fpp, k=5) — sized for the gate scales; size up with the dim.
    joined = bloom_prune_join(li, urgent, "l_orderkey", "o_orderkey", num_bits=1 << 18)
    d38 = "decimal(38,0)"
    pc = F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
    dc = F.expr("CAST(round(l_discount * 100) AS BIGINT)")
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(pc.cast(d38) * (F.lit(100) - dc).cast(d38)).alias("m4"),
        )
        .select(
            "l_returnflag",
            "n",
            (F.expr("CAST(div(m4, 100) AS BIGINT)") / 100.0).alias("revenue"),
        )
    )


@register(
    "ext_scd2_build",
    """
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER w AS prev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    chg AS (
        SELECT * FROM ordered
        WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, event_type,
           ts AS valid_from,
           lead(ts) OVER w2 AS valid_to,
           lead(ts) OVER w2 IS NULL AS is_current
    FROM chg
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def ext_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — type-2 slowly-changing dimension build
    (``operators/windows.py:scd2_from_changes``): treat each user's
    event stream as a change log of their ``event_type`` state,
    collapse no-op changes, and emit versioned rows with
    valid_from/valid_to/is_current. The classic warehouse dimension
    pattern the reference's MERGE pipelines feed
    (datatrack_spark_utils.py:306-362 keeps only latest-wins state;
    SCD2 is the history-preserving variant)."""
    from .operators import windows as win_ops

    ev = T(spark, sf_dir, "events")
    return win_ops.scd2_from_changes(
        ev, ["user_id"], ["ts", "event_id"], ["event_type"]
    )


@register(
    "ext_histogram",
    """
    SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT)                    AS n,
           round(min(o_totalprice), 2)                 AS lo,
           round(max(o_totalprice), 2)                 AS hi
    FROM orders
    GROUP BY 1
    """,
)
def ext_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — fixed-width histogram (profiling primitive).
    ``floor(x / width)`` bucketing is a pure map-side expression, so
    the plan is scan → partial agg → one exchange of |buckets| rows —
    the cheapest possible distribution sketch at any scale."""
    o = T(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 25000).cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@register(
    "ext_outlier_zscore",
    """
    WITH stats AS (
        SELECT event_type,
               avg(value)         AS mu,
               stddev_samp(value) AS sigma
        FROM events
        GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_outliers,
           round(max(abs((e.value - s.mu) / s.sigma)), 2) AS max_z
    FROM events e JOIN stats s USING (event_type)
    WHERE s.sigma > 0 AND abs((e.value - s.mu) / s.sigma) > 3
    GROUP BY e.event_type
    """,
)
def ext_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — z-score outlier detection per group: grouped
    mean/stddev (|groups| rows, broadcast back) then a map-side flag —
    the standard data-quality screen before training aggregation. Two
    scans of events but only one |groups|-row shuffle; at 100 TB the
    stats pass piggybacks on any existing profiling scan."""
    ev = T(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = F.abs((F.col("value") - F.col("mu")) / F.col("sigma"))
    return (
        ev.join(F.broadcast(stats), "event_type")
        .where((F.col("sigma") > 0) & (z > 3))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_outliers"),
            F.round(F.max(z), 2).alias("max_z"),
        )
    )


#: Session memo for the fuzzy part-name similarity graph: the blocked
#: Levenshtein pair build is the shared (and dominant) cost of
#: ext_fuzzy_join / ext_entity_resolution / x38_triangle_count — one
#: build per (session, sf_dir) instead of three (same discipline as
#: _LANC_CACHE and similarity._TRAIN_CACHE).
_FUZZY_PAIRS_CACHE: dict[tuple, tuple[DataFrame, DataFrame]] = {}


def _fuzzy_part_pairs(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(parts-with-block-keys, fuzzy pair graph) — 3-key blocking
    (last token, first token, type), Levenshtein <= 3, hard
    max_block_size=1000 quarantine (~13x the fixture max block; every
    consumer's oracle applies the identical window-count filter)."""
    from .operators.joins import fuzzy_self_pairs
    from .operators.memo import file_signature

    # key carries the fixture file signature (mtime+size) so an
    # in-session overwrite of sf_dir misses instead of reading stale
    key = (
        spark.sparkContext.applicationId,
        sf_dir,
        file_signature([os.path.join(sf_dir, "part.parquet")]),
    )
    got = _FUZZY_PAIRS_CACHE.get(key)
    if got is not None:
        return got
    p = T(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        "p_type",
        F.regexp_extract(F.lower(F.col("p_name")), "^[a-z0-9]+", 0).alias("fst"),
        F.regexp_extract(F.lower(F.col("p_name")), "[a-z0-9]+$", 0).alias("blk"),
    )
    pairs = fuzzy_self_pairs(
        p, "p_partkey", "p_name", ["blk", "fst", "p_type"], max_dist=3,
        max_block_size=1000,
    ).localCheckpoint(eager=False)
    # bounded + eviction-unpersisting insert: with the file signature
    # in the key, an overwrite-in-a-loop workload would otherwise
    # strand one checkpointed pair graph per rewrite
    from .operators.memo import evicting_put

    evicting_put(_FUZZY_PAIRS_CACHE, 4, key, (p, pairs))
    return (p, pairs)


@register(
    "ext_fuzzy_join",
    """
    WITH b0 AS (
        SELECT p_partkey, p_name, p_type,
               regexp_extract(lower(p_name), '^[a-z0-9]+') AS fst,
               regexp_extract(lower(p_name), '[a-z0-9]+$') AS blk
        FROM part
    ),
    b AS (
        SELECT * FROM (
            SELECT b0.*, count(*) OVER (PARTITION BY blk, fst, p_type) AS __bn
            FROM b0
        ) WHERE __bn <= 1000
    )
    SELECT a.p_type,
           CAST(count(*) AS BIGINT)           AS n_pairs,
           CAST(min(levenshtein(a.p_name, c.p_name)) AS INT) AS min_dist,
           CAST(max(levenshtein(a.p_name, c.p_name)) AS INT) AS max_dist
    FROM b a JOIN b c
      ON a.blk = c.blk AND a.fst = c.fst AND a.p_type = c.p_type
     AND a.p_partkey < c.p_partkey
    WHERE levenshtein(a.p_name, c.p_name) <= 3
    GROUP BY a.p_type
    """,
)
def ext_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — blocked fuzzy matching
    (``operators/joins.py:fuzzy_self_pairs``): near-duplicate part
    names within (type, FIRST-name-token, last-name-token) blocks,
    Levenshtein <= 3. The block key keeps the quadratic compare
    per-block — blocking choice IS the operator's scale contract, and
    the 2-key variant left 450-row blocks (4.2M full edit distances,
    ~10 s at sf0.1; 3 keys: 520 k, ~1 s). Native ``levenshtein`` has
    identical semantics in DuckDB so the pair set value-gates
    exactly. The pair graph comes from the session memo shared with
    ext_entity_resolution / x38 (one Levenshtein build per session)."""
    _, pairs = _fuzzy_part_pairs(spark, sf_dir)
    return pairs.groupBy("p_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.min("dist").cast("int").alias("min_dist"),
        F.max("dist").cast("int").alias("max_dist"),
    )


@register(
    "ext_sql_entry_q3",
    """
    SELECT l_orderkey,
           CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                    * (100 - CAST(round(l_discount * 100) AS HUGEINT))) // 100
                AS DOUBLE) / 100.0 AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
)
def ext_sql_entry_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — TPC-H Q3 shape (shipping-priority top-N) on the
    fixture schema (o_orderpriority stands in for o_shippriority;
    timestamp pivot inside the fixture's 1995-2001 span). DataFrame-API
    form: customer filter broadcasts into orders, the only big shuffle
    is lineitem↔orders, and the top-10 runs as TakeOrderedAndProject —
    no global sort. Full tie-break (revenue, date, key) keeps the
    LIMIT boundary deterministic for the oracle."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    d38 = "decimal(38,0)"
    pc = F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
    dc = F.expr("CAST(round(l_discount * 100) AS BIGINT)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(pc.cast(d38) * (F.lit(100) - dc).cast(d38)).alias("m4"))
        .select(
            "l_orderkey",
            (F.expr("CAST(div(m4, 100) AS BIGINT)") / 100.0).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "ext_sql_entry_q10",
    """
    SELECT c_custkey, c_name,
           CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                    * (100 - CAST(round(l_discount * 100) AS HUGEINT))) // 100
                AS DOUBLE) / 100.0 AS revenue,
           round(c_acctbal, 2) AS c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def ext_sql_entry_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — TPC-H Q10 shape (returned-item top customers)
    through the SQL-string entry point (SURVEY §3.3), 4-way join:
    customer/nation broadcast, lineitem↔orders shuffle, top-20 with a
    c_custkey tie-break so the LIMIT boundary is deterministic."""
    from .io import register_fixture_views

    register_fixture_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               CAST(div(sum(CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))
                        * (100 - CAST(round(l_discount * 100) AS DECIMAL(38,0)))), 100)
                    AS DOUBLE) / 100.0 AS revenue,
               round(c_acctbal, 2) AS c_acctbal, n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
        """
    )


@register(
    "ext_string_agg",
    """
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def ext_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — ordered string aggregation. Spark's ``listagg``
    leaves element order unspecified (partition arrival order), so the
    deterministic form is sort_array(collect_set) + array_join — same
    one-shuffle plan, and the output is reproducible run to run, which
    an unordered listagg is not."""
    o = T(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",").alias("statuses"),
        F.count_distinct("o_orderstatus").cast("long").alias("n_statuses"),
    )


@register(
    "ext_correlation",
    """
    WITH s AS (
        SELECT l_returnflag,
               count(*)                                            AS n,
               sum(CAST(l_quantity AS BIGINT))                     AS sx,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT))   AS sy,
               sum(CAST(l_quantity AS HUGEINT)
                   * CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sxy,
               sum(CAST(l_quantity AS HUGEINT)
                   * CAST(l_quantity AS HUGEINT))                  AS sxx,
               sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                   * CAST(round(l_extendedprice * 100) AS HUGEINT)) AS syy
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(floor(1e9 * (CAST(n * sxy - sx * sy AS DOUBLE)
                / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                       * CAST(n * syy - sy * sy AS DOUBLE)))) AS BIGINT)
               AS corr_nano,
           CAST(floor(1e3 * (CAST(n * sxy - sx * sy AS DOUBLE)
                / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) * 100.0))) AS BIGINT)
               AS covar_milli,
           CAST(floor(1e6 * (CAST(n * sxy - sx * sy AS DOUBLE)
                / (CAST(n * sxx - sx * sx AS DOUBLE) * 100.0))) AS BIGINT)
               AS slope_micro
    FROM s
    """,
)
def ext_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — grouped bivariate statistics (corr / sample
    covariance / regression slope) from EXACT integer sufficient
    statistics: n, Σx, Σy, Σxy, Σx², Σy² accumulated in integer cents
    (BIGINT/DECIMAL(38) partials — order-insensitive, overflow-safe to
    ~10^25), then ONE double conversion and division at the end.
    Native co-moment aggregates (corr/covar_samp/regr_slope) fold
    doubles in partition order, so their last ulps are run-dependent —
    round-4's one red driver row was exactly such a flake landing on a
    round() halfway boundary. Outputs are floor-scaled integer units
    (nano-corr, milli-covar, micro-slope): floor of identical IEEE
    doubles is engine-exact. Plan unchanged: map-side partials, one
    |groups|-row exchange."""
    li = T(spark, sf_dir, "lineitem")
    cents = F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
    qty = F.expr("CAST(l_quantity AS BIGINT)")
    d38 = "decimal(38,0)"
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qty).alias("sx"),
        F.sum(cents).alias("sy"),
        F.sum(qty.cast(d38) * cents.cast(d38)).alias("sxy"),
        F.sum(qty.cast(d38) * qty.cast(d38)).alias("sxx"),
        F.sum(cents.cast(d38) * cents.cast(d38)).alias("syy"),
    )
    # Keep every co-moment term in decimal(38,0): sy*sy alone is ~1e22
    # at sf0.01 — far past BIGINT, exact in 38-digit decimal / HUGEINT.
    num = F.expr(
        "CAST(CAST(n AS decimal(38,0)) * sxy"
        " - CAST(sx AS decimal(38,0)) * CAST(sy AS decimal(38,0)) AS DOUBLE)"
    )
    dx = F.expr(
        "CAST(CAST(n AS decimal(38,0)) * sxx"
        " - CAST(sx AS decimal(38,0)) * CAST(sx AS decimal(38,0)) AS DOUBLE)"
    )
    dy = F.expr(
        "CAST(CAST(n AS decimal(38,0)) * syy"
        " - CAST(sy AS decimal(38,0)) * CAST(sy AS decimal(38,0)) AS DOUBLE)"
    )
    return s.select(
        "l_returnflag",
        F.floor(F.lit(1e9) * (num / F.sqrt(dx * dy))).cast("long").alias("corr_nano"),
        F.floor(
            F.lit(1e3)
            * (num / (F.col("n").cast("double") * (F.col("n") - 1).cast("double") * F.lit(100.0)))
        ).cast("long").alias("covar_milli"),
        F.floor(F.lit(1e6) * (num / (dx * F.lit(100.0)))).cast("long").alias("slope_micro"),
    )


@register(
    "ext_skew_profile",
    """
    WITH k AS (
        SELECT o_custkey AS key, count(*) AS n
        FROM orders GROUP BY 1
    ),
    tot AS (SELECT sum(n) AS total, count(*) AS n_keys FROM k),
    ranked AS (
        SELECT n, row_number() OVER (ORDER BY n DESC, key ASC) AS rnk FROM k
    )
    SELECT CAST(tot.n_keys AS BIGINT)                       AS n_keys,
           CAST(tot.total AS BIGINT)                        AS n_rows,
           CAST(max(CASE WHEN rnk = 1 THEN n END) AS BIGINT)  AS top1_rows,
           CAST(sum(CASE WHEN rnk <= 10 THEN n ELSE 0 END) AS BIGINT) AS top10_rows,
           round(CAST(max(CASE WHEN rnk = 1 THEN n END) AS DOUBLE)
                 / CAST(tot.total AS DOUBLE) * tot.n_keys, 2) AS skew_factor
    FROM ranked CROSS JOIN tot
    GROUP BY tot.n_keys, tot.total
    """,
)
def ext_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — join/agg-key skew profiling: per-key counts, top-1 /
    top-10 shares, and skew factor (top key's rows ÷ fair share). The
    diagnostic that decides when ``operators/skew.py`` salting is worth
    its overhead. Plan: one |keys|-row shuffle for the counts; the
    ranking runs over the (small) key-count table, never the fact."""
    o = T(spark, sf_dir, "orders")
    from pyspark.sql import Window

    k = o.groupBy(F.col("o_custkey").alias("key")).agg(F.count(F.lit(1)).alias("n"))
    tot = k.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    ranked = k.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("n"), F.asc("key")))
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy("n_keys", "total")
        .agg(
            F.max(F.when(F.col("rnk") == 1, F.col("n"))).cast("long").alias("top1_rows"),
            F.sum(F.when(F.col("rnk") <= 10, F.col("n")).otherwise(0)).cast("long").alias("top10_rows"),
        )
        .select(
            F.col("n_keys").cast("long").alias("n_keys"),
            F.col("total").cast("long").alias("n_rows"),
            "top1_rows",
            "top10_rows",
            F.round(
                F.col("top1_rows").cast("double") / F.col("total").cast("double") * F.col("n_keys"),
                2,
            ).alias("skew_factor"),
        )
    )


@register(
    "ext_left_join_count_q13",
    """
    WITH co AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count, count(*) AS custdist
    FROM co GROUP BY c_count
    """,
)
def ext_left_join_count_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — TPC-H Q13 shape (customer order-count distribution):
    outer join with a join-side (not WHERE-side) predicate, then a
    double aggregation. The reference never composes these, but its
    budget-vs-actual report (``compare_budget.py``) is the same
    keep-unmatched-rows pattern. Plan: the only fact shuffle is the
    customer↔orders hash join + first groupBy on c_custkey (AQE
    coalesces both); the second groupBy runs on |customers| rows."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    co = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "ext_promo_share_q14",
    """
    WITH s AS (
        SELECT sum(CASE WHEN p_type = 'PROMO'
                        THEN CAST(round(l_extendedprice * 100) AS HUGEINT)
                             * (100 - CAST(round(l_discount * 100) AS HUGEINT))
                        ELSE 0 END) AS promo_m4,
               sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                   * (100 - CAST(round(l_discount * 100) AS HUGEINT))) AS total_m4,
               count(*) AS n_rows
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT CAST(promo_m4 * 100000 // total_m4 AS DOUBLE) / 1000.0 AS promo_share_pct,
           n_rows
    FROM s
    """,
)
def ext_promo_share_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — TPC-H Q14 shape (promo revenue share): conditional
    aggregate over a fact↔dim join. part broadcasts (2 k–200 k rows even
    at sf100), the date filter pushes to the lineitem scan, and the
    CASE runs inside the same whole-stage-codegen span as the join —
    zero shuffles beyond the final 1-row agg."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    p = T(spark, sf_dir, "part")
    d38 = "decimal(38,0)"
    pc = F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
    dc = F.expr("CAST(round(l_discount * 100) AS BIGINT)")
    rev_m4 = pc.cast(d38) * (F.lit(100) - dc).cast(d38)
    # exact integer Σm4 on both sides; share as floor-scaled milli-pct
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev_m4).otherwise(F.lit(0).cast(d38))).alias(
                "promo_m4"
            ),
            F.sum(rev_m4).alias("total_m4"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            (
                F.expr("CAST(div(promo_m4 * 100000, total_m4) AS BIGINT)") / 1000.0
            ).alias("promo_share_pct"),
            "n_rows",
        )
    )


@register(
    "ext_top_supplier_q15",
    """
    WITH rev AS (
        SELECT l_suppkey,
               sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                   * (100 - CAST(round(l_discount * 100) AS HUGEINT))) // 100 AS rev_c
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(rev_c AS DOUBLE) / 100.0 AS total_rev
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE rev_c = (SELECT max(rev_c) FROM rev)
    """,
)
def ext_top_supplier_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — TPC-H Q15 shape (top-revenue supplier via a scalar
    subquery over a derived view). The derived rev table is |suppliers|
    rows, so the max and the supplier join both broadcast; the fact
    side pays one groupBy(l_suppkey) shuffle with the date filter
    pushed to the scan. Rounded BEFORE the max comparison on both
    engines so the equality predicate sees identical values."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    d38 = "decimal(38,0)"
    pc = F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
    dc = F.expr("CAST(round(l_discount * 100) AS BIGINT)")
    # the MAX-equality predicate compares EXACT integer cents — a float
    # total at the max boundary could match on one engine only
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(pc.cast(d38) * (F.lit(100) - dc).cast(d38)).alias("m4"))
        .select("l_suppkey", F.expr("CAST(div(m4, 100) AS BIGINT)").alias("rev_c"))
    )
    mx = rev.agg(F.max("rev_c").alias("mx"))
    s = T(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.rev_c == mx.mx)
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", (F.col("rev_c") / 100.0).alias("total_rev"))
    )


@register(
    "ext_avg_subquery_q17",
    """
    WITH pa AS (
        -- exact integer sufficient stats: q < 0.5·avg ⟺ 2·q·n < Σq
        SELECT l_partkey AS pk,
               sum(CAST(l_quantity AS BIGINT)) AS sq,
               count(*) AS nq
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) // 7 AS DOUBLE)
               / 100.0 AS avg_yearly,
           count(*) AS n_small
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa   ON pk = l_partkey
    WHERE p_brand = 'Brand#12'
      AND 2 * CAST(l_quantity AS BIGINT) * pa.nq < pa.sq
    """,
)
def ext_avg_subquery_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — TPC-H Q17 shape (small-quantity revenue): a
    correlated per-key average subquery, decorrelated by hand into a
    groupBy + broadcast join — the same rewrite Catalyst's
    ``RewriteCorrelatedScalarSubquery`` performs, made explicit so the
    plan is visibly one fact groupBy + two broadcasts, never a
    per-row subquery execution."""
    li = T(spark, sf_dir, "lineitem")
    # exact integer sufficient stats: q < 0.5·avg ⟺ 2·q·n < Σq — the
    # float-average threshold could flip membership for a quantity
    # within ulps of half the mean
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.expr("CAST(l_quantity AS BIGINT)")).alias("sq"),
        F.count(F.lit(1)).alias("nq"),
    )
    p = T(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(pa), li.l_partkey == pa.pk)
        .filter(F.expr("2 * CAST(l_quantity AS BIGINT) * nq < sq"))
        .agg(
            F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).alias("sc"),
            F.count(F.lit(1)).alias("n_small"),
        )
        .select(
            (F.expr("div(sc, 7)") / 100.0).alias("avg_yearly"),
            "n_small",
        )
    )


@register(
    "ext_or_predicate_q19",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_rows
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def ext_or_predicate_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — TPC-H Q19 shape (disjunctive join predicate): an
    OR-of-ANDs mixing dim-side and fact-side columns. Catalyst splits
    the conjuncts it can push (the per-side implied filters
    ``p_brand IN (...)`` / ``l_quantity BETWEEN 1 AND 30``) to the
    scans and evaluates the residual disjunction post-join; part
    broadcasts so the fact never shuffles."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    q, b, sz = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & sz.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#21") & sz.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#14") & sz.between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "ext_not_exists_q22",
    """
    WITH ab AS (SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0)
    SELECT c_mktsegment, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM customer, ab
    WHERE c_acctbal > ab.a
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
)
def ext_not_exists_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — TPC-H Q22 shape (above-average-balance customers
    with no urgent orders): global-average scalar subquery +
    NOT EXISTS, decorrelated to a broadcast 1-row cross join + a
    left-anti join. The anti join's build side is the filtered
    DISTINCT o_custkey projection — at 100 TB that is one pruned
    column of orders, not the table. (The classic Q22 "no orders at
    all" predicate is empty on this fixture — every customer orders —
    so the priority filter keeps the result non-degenerate.)"""
    c = T(spark, sf_dir, "customer")
    o = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    ab = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("a"))
    return (
        c.crossJoin(F.broadcast(ab))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "ext_event_funnel",
    """
    WITH v AS (
        SELECT user_id, min(ts) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t_buy
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_click_after_view,
           (SELECT count(*) FROM p) AS n_purchase_after_click
    """,
)
def ext_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — ordered event funnel (view → click → purchase):
    each stage keeps users whose earliest stage-k event strictly
    follows their earliest stage-(k-1) event. Product analytics'
    bread-and-butter query; no reference counterpart (the reference
    has no event stream), events fixture per TESTDATA.md.

    Plan: each stage is one groupBy(user_id) over a filtered scan with
    the previous stage's per-user table broadcast onto it — user-level
    tables are |users| rows (≪ fact), so the fact never shuffles for
    the joins, only for the per-stage aggregates. The three scans
    read disjoint event_type slices (filter pushed down)."""
    ev = T(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(v), "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_after_click")))
    )


@register(
    "ext_cohort_retention",
    """
    WITH first AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    act AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(date_diff('day', f.cohort_week, date_trunc('week', e.ts)) / 7
                    AS INT) AS week_n
        FROM events e JOIN first f USING (user_id)
    ),
    agg AS (
        SELECT CAST(cohort_week AS DATE) AS cohort_week, week_n,
               count(*) AS n_users
        FROM act GROUP BY 1, 2
    )
    SELECT a.cohort_week, a.week_n, a.n_users,
           CAST(a.n_users * 10000 // c.n0 AS DOUBLE) / 10000.0 AS retention
    FROM agg a
    JOIN (SELECT cohort_week, n_users AS n0 FROM agg WHERE week_n = 0) c
      USING (cohort_week)
    """,
)
def ext_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — weekly cohort retention: users grouped by the week
    of their first ``signup`` event; each later week's active share is reported
    against the cohort's week-0 size. The other half of product
    analytics next to ``ext_event_funnel``; no reference counterpart.

    Both engines difference WEEK-TRUNCATED dates (always exact
    multiples of 7 days), so the week index is integer-exact and
    hash-stable. Plan: one groupBy(user) for cohort assignment, the
    |users|-row result broadcast back onto the fact scan, one distinct
    + rollup — the fact shuffles once; the week-0 join is over the
    tiny cohort matrix."""
    ev = T(spark, sf_dir, "events")
    first = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    act = (
        ev.join(F.broadcast(first), "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7
            )
            .cast("int")
            .alias("week_n"),
        )
        .distinct()
    )
    aggd = act.groupBy(
        F.col("cohort_week").cast("date").alias("cohort_week"), "week_n"
    ).agg(F.count(F.lit(1)).alias("n_users"))
    week0 = aggd.filter(F.col("week_n") == 0).select(
        "cohort_week", F.col("n_users").alias("n0")
    )
    return aggd.join(F.broadcast(week0), "cohort_week").select(
        "cohort_week",
        "week_n",
        "n_users",
        (F.expr("div(n_users * 10000, n0)") / 10000.0).alias("retention"),
    )


# ---------------------------------------------------------------------------
# TPC-H remaining decorrelation shapes (round 3, fourth wave). The fixture
# has no partsupp table and no commit/receipt dates, so Q2/Q9/Q11/Q16/Q20/Q21
# are faithful shape analogs over lineitem: the decorrelation structure
# (per-group min equality, HAVING vs scalar subquery, NOT IN, nested
# semi-joins, EXISTS + NOT EXISTS) is identical, only the cost/stock columns
# are derived from revenue instead of ps_supplycost/ps_availqty.
# ---------------------------------------------------------------------------


@register(
    "ext_min_cost_supplier_q2",
    """
    WITH pr AS (
        SELECT l_partkey, l_suppkey,
               sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                   * (100 - CAST(round(l_discount * 100) AS HUGEINT))) // 100 AS cost_c
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    m AS (SELECT l_partkey, min(cost_c) AS mincost FROM pr GROUP BY l_partkey)
    SELECT p_partkey, p_brand, s_name, CAST(cost_c AS DOUBLE) / 100.0 AS cost
    FROM pr
    JOIN m ON pr.l_partkey = m.l_partkey AND pr.cost_c = m.mincost
    JOIN part ON p_partkey = pr.l_partkey
    JOIN supplier ON s_suppkey = pr.l_suppkey
    WHERE p_size <= 3
    """,
)
def ext_min_cost_supplier_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — TPC-H Q2 shape (min-cost supplier per part): the
    correlated ``cost = (SELECT min(cost) ...)`` subquery decorrelated
    into a per-part min + equality filter. Cost is ROUNDED before both
    the min and the equality so both engines compare identical values
    (same guard as ext_top_supplier_q15). Plan: one
    groupBy(l_partkey, l_suppkey) shuffle on the fact; the per-part min
    is a WINDOW over that view — at 100 TB the per-part min table is
    |parts|-sized (too big to broadcast), while the window only
    re-keys the already-aggregated (part, supp) rows. Ties at the min
    are kept on both engines; part/supplier dims broadcast."""
    d38 = "decimal(38,0)"
    pc = F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
    dc = F.expr("CAST(round(l_discount * 100) AS BIGINT)")
    # EXACT integer cents: the min-equality predicate can never split
    # on a float ulp (see ext_top_supplier_q15)
    pr = (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(pc.cast(d38) * (F.lit(100) - dc).cast(d38)).alias("m4"))
        .select(
            "l_partkey", "l_suppkey", F.expr("CAST(div(m4, 100) AS BIGINT)").alias("cost_c")
        )
    )
    best = pr.withColumn(
        "__mincost", F.min("cost_c").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("cost_c") == F.col("__mincost"))
    p = T(spark, sf_dir, "part").filter(F.col("p_size") <= 3)
    s = T(spark, sf_dir, "supplier")
    return (
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .select("p_partkey", "p_brand", "s_name", (F.col("cost_c") / 100.0).alias("cost"))
    )


@register(
    "ext_volume_shipping_q7",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume_m4) // 100 AS DOUBLE) / 100.0 AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               CAST(round(l_extendedprice * 100) AS HUGEINT)
                 * (100 - CAST(round(l_discount * 100) AS HUGEINT)) AS volume_m4
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def ext_volume_shipping_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — TPC-H Q7 (volume shipping between two nations): a
    5-way join where the same dim (nation) enters twice under different
    roles. supplier/customer/nation all broadcast, so the only shuffles
    are lineitem↔orders (AQE may demote to broadcast at sf0.01) and the
    final small groupBy. The nation-pair OR predicate semi-prunes BOTH
    broadcast sides before the fact join — Catalyst pushes each
    disjunct's implied ``n_name IN ('NATION_1','NATION_2')`` down."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.sum(
                F.expr("CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))")
                * F.expr("CAST(100 - round(l_discount * 100) AS DECIMAL(38,0))")
            ).alias("m4")
        )
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            (F.expr("CAST(div(m4, 100) AS BIGINT)") / 100.0).alias("revenue"),
        )
    )


@register(
    "ext_market_share_q8",
    """
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume_m4 ELSE 0 END)
                * 10000 // sum(volume_m4) AS DOUBLE) / 10000.0 AS mkt_share
    FROM (
        SELECT year(o_orderdate) AS o_year,
               CAST(round(l_extendedprice * 100) AS HUGEINT)
                 * (100 - CAST(round(l_discount * 100) AS HUGEINT)) AS volume_m4,
               n2.n_name AS supp_nation
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region    ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    """,
)
def ext_market_share_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — TPC-H Q8 (national market share): an 8-way join with
    a conditional-share aggregate. Every dim broadcasts; the customer-
    side region filter prunes the broadcast customer set BEFORE the
    fact join touches it. Both the numerator and denominator sums are
    rounded to 2 dp before the division so the 4-dp share is computed
    from identical doubles on both engines."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    p = T(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    # exact integer 10⁻⁴-dollar volumes; share floor-scaled to 4 dp
    vol_m4 = F.expr("CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))") * F.expr(
        "CAST(100 - round(l_discount * 100) AS DECIMAL(38,0))"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", vol_m4).otherwise(
                    F.lit(0).cast("decimal(38,0)")
                )
            ).alias("num_m4"),
            F.sum(vol_m4).alias("den_m4"),
        )
        .select(
            "o_year",
            (
                F.expr("CAST(div(num_m4 * 10000, den_m4) AS BIGINT)") / 10000.0
            ).alias("mkt_share"),
        )
    )


@register(
    "ext_profit_by_nation_q9",
    """
    SELECT n_name AS nation, o_year,
           CAST(sum(amount_m4) // 100 AS DOUBLE) / 100.0 AS sum_profit
    FROM (
        SELECT n_name, year(o_orderdate) AS o_year,
               CAST(round(l_extendedprice * 100) AS HUGEINT)
                 * (100 - CAST(round(l_discount * 100) AS HUGEINT))
                 - CAST(round(p_retailprice * 100) AS HUGEINT)
                   * 5 * CAST(l_quantity AS HUGEINT)
                 AS amount_m4
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%gear%'
    ) profit
    GROUP BY n_name, o_year
    """,
)
def ext_profit_by_nation_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — TPC-H Q9 shape (product-type profit by nation/year).
    The fixture has no partsupp, so supply cost is modeled as
    ``p_retailprice * 0.05 * l_quantity`` — the join/aggregate
    structure (fact × 4 dims, substring part filter, two-level group)
    is Q9's. part is filtered by the LIKE before broadcasting, so the
    fact join fans out only matching parts. The per-row amount is an
    EXACT signed integer in 10⁻⁴-dollar units (cents × percent — no
    per-row round() that can land on a .5 halfway; r5's x19 red was
    exactly that class), summed exactly and trunc-divided once at the
    end (Spark div and DuckDB // both truncate toward zero)."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    s = T(spark, sf_dir, "supplier")
    p = T(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    n = T(spark, sf_dir, "nation")
    amount_m4 = (
        F.expr("CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))")
        * F.expr("CAST(100 - round(l_discount * 100) AS DECIMAL(38,0))")
        - F.expr("CAST(round(p_retailprice * 100) AS DECIMAL(38,0))")
        * F.lit(5).cast("decimal(38,0)")
        * F.expr("CAST(l_quantity AS DECIMAL(38,0))")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount_m4).alias("m4"))
        .select(
            "nation",
            "o_year",
            (F.expr("CAST(div(m4, 100) AS BIGINT)") / 100.0).alias("sum_profit"),
        )
    )


@register(
    "ext_important_stock_q11",
    """
    WITH pv AS (
        SELECT l_partkey,
               sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                   * (100 - CAST(round(l_discount * 100) AS HUGEINT))) AS m4
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_0', 'NATION_1')
        GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey, CAST(m4 // 100 AS DOUBLE) / 100.0 AS value
    FROM pv
    WHERE m4 * 500 > (SELECT sum(m4) FROM pv)
    """,
)
def ext_important_stock_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — TPC-H Q11 shape (important stock): a HAVING
    predicate against a scalar subquery over the SAME derived view.
    The per-part value view is computed once and reused for both the
    threshold and the output (Spark reuses the exchange; the oracle's
    CTE is likewise single-evaluation in DuckDB). Plan: one fact
    groupBy(l_partkey) shuffle; the 1-row threshold broadcasts back
    via a cross join. Values aggregate as integer CENTS so both the
    threshold and the compared totals are association-free (the same
    guard ext_profit_by_nation_q9 needed after a real .005 flake —
    an unrounded double sum compared against a fraction of its own
    grand total is the worst case for cross-engine ulp divergence)."""
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_0", "NATION_1")
    )
    rev_m4 = F.expr("CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))") * F.expr(
        "CAST(100 - round(l_discount * 100) AS DECIMAL(38,0))"
    )
    pv = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(rev_m4).alias("m4"))
    )
    thr = pv.agg(F.sum("m4").alias("__total_m4"))
    # m4 > total·0.002 ⟺ m4·500 > total — exact integer cross-multiply
    return (
        pv.join(F.broadcast(thr))
        .filter(F.col("m4") * 500 > F.col("__total_m4"))
        .select(
            F.col("l_partkey").alias("partkey"),
            (F.expr("CAST(div(m4, 100) AS BIGINT)") / 100.0).alias("value"),
        )
    )


@register(
    "ext_late_shipment_q12",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_returnflag
    """,
)
def ext_late_shipment_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — TPC-H Q12 shape (late shipments by priority class).
    The fixture has no l_shipmode/commitdate, so "late" is shipdate
    more than 60 days after the order date — the join-then-conditional-
    count structure and the IN/NOT-IN CASE pair are Q12's. The
    late-shipment predicate references both sides, so it evaluates as
    a post-join filter inside the same codegen span; integer counts
    make the oracle exact."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "ext_supplier_count_q16",
    """
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 9, 13)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def ext_supplier_count_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — TPC-H Q16 shape (supplier count by part attrs with a
    NOT IN exclusion). The NOT IN subquery decorrelates to a left-anti
    join against the (tiny, broadcast) excluded-supplier set — safe
    because s_suppkey is non-nullable, so NOT IN ≡ anti-join. Plan:
    part filters push to its scan, the anti join and part join both
    broadcast, and the count-distinct pays the one fact shuffle."""
    p = T(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13)
    )
    li = T(spark, sf_dir, "lineitem")
    bad = T(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "ext_excess_inventory_q20",
    """
    WITH pq AS (
        SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
    )
    SELECT s_name, n_name, round(s_acctbal, 2) AS acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM pq JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'small%' AND qty > 30
    )
    """,
)
def ext_excess_inventory_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — TPC-H Q20 shape (suppliers with excess volume of
    flagged parts): a nested IN chain decorrelated to
    aggregate → filter → semi-join. qty sums integral-valued doubles,
    so the > 30 threshold is exact in both engines. Plan: one fact
    groupBy(l_suppkey, l_partkey) shuffle with the date filter pushed
    to the scan; the flagged-part filter and the final left-semi both
    broadcast (|qualifying suppkeys| ≤ |suppliers| = 100 rows)."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    p = T(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    pq = li.groupBy("l_suppkey", "l_partkey").agg(F.sum("l_quantity").alias("qty"))
    qual = (
        pq.filter(F.col("qty") > 30)
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select("l_suppkey")
    )
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(qual), s.s_suppkey == qual.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name", F.round("s_acctbal", 2).alias("acctbal"))
    )


@register(
    "ext_waiting_supplier_q21",
    """
    WITH ls AS (
        SELECT l_orderkey, l_suppkey, max(l_shipdate) AS sd
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY l_orderkey, l_suppkey
    ),
    om AS (
        SELECT l_orderkey, max(sd) AS mx, count(*) AS nsupp
        FROM ls GROUP BY l_orderkey
    ),
    lastcnt AS (
        SELECT ls.l_orderkey, count(*) AS nlast
        FROM ls JOIN om ON ls.l_orderkey = om.l_orderkey AND ls.sd = om.mx
        GROUP BY ls.l_orderkey
    )
    SELECT s_name, count(*) AS numwait
    FROM ls
    JOIN om ON ls.l_orderkey = om.l_orderkey
    JOIN lastcnt ON ls.l_orderkey = lastcnt.l_orderkey
    JOIN supplier ON s_suppkey = ls.l_suppkey
    WHERE ls.sd = om.mx AND om.nsupp >= 2 AND lastcnt.nlast = 1
    GROUP BY s_name
    """,
)
def ext_waiting_supplier_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — TPC-H Q21 shape (suppliers who kept orders waiting):
    the EXISTS (another supplier on the order) + NOT EXISTS (another
    supplier equally late) pair decorrelated into per-order counts —
    nsupp ≥ 2 is the EXISTS, nlast = 1 is the NOT EXISTS. "Late" is
    holding the order's max shipdate (the fixture has no receipt/commit
    dates). Plan: ls pays the one fact groupBy shuffle; om and lastcnt
    are |orders|-sized windows over it (computed via a window function
    to reuse ls's partitioning instead of two more self-join shuffles);
    supplier broadcasts. Timestamp max + integer counts → exact."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    ls = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_semi")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("sd"))
    )
    w = Window.partitionBy("l_orderkey")
    per_order = ls.select(
        "l_orderkey",
        "l_suppkey",
        "sd",
        F.max("sd").over(w).alias("mx"),
        F.count(F.lit(1)).over(w).alias("nsupp"),
    ).withColumn(
        "nlast",
        F.sum(F.when(F.col("sd") == F.col("mx"), 1).otherwise(0)).over(w),
    )
    s = T(spark, sf_dir, "supplier")
    return (
        per_order.filter(
            (F.col("sd") == F.col("mx"))
            & (F.col("nsupp") >= 2)
            & (F.col("nlast") == 1)
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "ext_cdc_apply",
    """
    WITH survivors AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100
                    ELSE o_totalprice END AS o_totalprice,
               o_orderpriority
        FROM orders WHERE o_orderkey % 21 <> 0
        UNION ALL
        SELECT o_orderkey + 5000000 AS o_orderkey, o_custkey, o_orderstatus,
               o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 50 = 0
    )
    SELECT o_orderkey, o_custkey, o_orderstatus,
           round(o_totalprice, 2) AS total, o_orderpriority
    FROM survivors
    """,
)
def ext_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply (APPLY CHANGES INTO semantics): fold an ordered change
    log — upserts, inserts of new keys, delete tombstones — into a
    snapshot via ``upsert.apply_changes`` (one union + one window
    shuffle, idempotent under replay). The synthetic log updates every
    key ≡0 mod 7 (price +100, seq 1), deletes every key ≡0 mod 21
    (seq 2 — outranks the update on the same key), and inserts a new
    key (+5 000 000) for every key ≡0 mod 50. The oracle derives the
    expected FINAL STATE independently (CASE + filters, no fold) so
    the two engines agree via different derivations — a stronger check
    than twin implementations."""
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    upd = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 100)
        .withColumn("seq", F.lit(1).cast("int"))
        .withColumn("op", F.lit("U"))
    )
    dele = (
        o.filter(F.col("o_orderkey") % 21 == 0)
        .withColumn("seq", F.lit(2).cast("int"))
        .withColumn("op", F.lit("D"))
    )
    ins = (
        o.filter(F.col("o_orderkey") % 50 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + 5000000)
        .withColumn("seq", F.lit(1).cast("int"))
        .withColumn("op", F.lit("U"))
    )
    changes = upd.unionByName(dele).unionByName(ins)
    state = upsert_ops.apply_changes(
        o, changes, keys=["o_orderkey"], seq_col="seq", op_col="op"
    )
    return state.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("total"),
        "o_orderpriority",
    )


@register(
    "ext_referential_integrity",
    """
    WITH li AS (
        SELECT l_orderkey, l_partkey, l_suppkey FROM lineitem
        UNION ALL
        SELECT l_orderkey + 1000000000, l_partkey + 1000000000,
               l_suppkey + 1000000000
        FROM lineitem WHERE l_orderkey % 997 = 0
    ),
    checks AS (
        SELECT 'lineitem.l_orderkey->orders' AS fk, count(*) AS n_rows,
               CAST(sum(CASE WHEN NOT EXISTS (
                   SELECT 1 FROM orders WHERE o_orderkey = li.l_orderkey)
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
        FROM li
        UNION ALL
        SELECT 'lineitem.l_partkey->part', count(*),
               CAST(sum(CASE WHEN NOT EXISTS (
                   SELECT 1 FROM part WHERE p_partkey = li.l_partkey)
                   THEN 1 ELSE 0 END) AS BIGINT)
        FROM li
        UNION ALL
        SELECT 'lineitem.l_suppkey->supplier', count(*),
               CAST(sum(CASE WHEN NOT EXISTS (
                   SELECT 1 FROM supplier WHERE s_suppkey = li.l_suppkey)
                   THEN 1 ELSE 0 END) AS BIGINT)
        FROM li
        UNION ALL
        SELECT 'orders.o_custkey->customer', count(*),
               CAST(sum(CASE WHEN NOT EXISTS (
                   SELECT 1 FROM customer WHERE c_custkey = o.o_custkey)
                   THEN 1 ELSE 0 END) AS BIGINT)
        FROM orders o
    )
    SELECT fk, n_rows, n_orphans,
           CAST(n_orphans * 1000000 // n_rows AS DOUBLE) / 1000000.0 AS orphan_rate
    FROM checks
    """,
)
def ext_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts + rates for every
    foreign key in the star schema (with deterministic injected
    orphans so the check provably fires). Each relationship is a
    LEFT-ANTI count; part/supplier/customer broadcast, and only the
    lineitem→orders anti-join pays a shuffle — at 100 TB that one is
    the candidate for ``operators/bloom.bloom_prune_join`` (probe the
    orders-key Bloom filter below the exchange) since a >99.9 %-valid
    FK makes the anti-join's output tiny."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_suppkey")
    bad = li.filter(F.col("l_orderkey") % 997 == 0).select(
        *[(F.col(c) + 1000000000).alias(c) for c in li.columns]
    )
    li = li.unionByName(bad)
    o = T(spark, sf_dir, "orders")
    checks = []
    for fk, child, ckey, parent, pkey, bcast in [
        ("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey", False),
        ("lineitem.l_partkey->part", li, "l_partkey", T(spark, sf_dir, "part"), "p_partkey", True),
        ("lineitem.l_suppkey->supplier", li, "l_suppkey", T(spark, sf_dir, "supplier"), "s_suppkey", True),
        ("orders.o_custkey->customer", o, "o_custkey", T(spark, sf_dir, "customer"), "c_custkey", True),
    ]:
        parent_keys = parent.select(pkey)
        if bcast:
            parent_keys = F.broadcast(parent_keys)
        orphans = child.join(
            parent_keys, child[ckey] == parent_keys[pkey], "left_anti"
        ).agg(F.count(F.lit(1)).alias("n_orphans"))
        total = child.agg(F.count(F.lit(1)).alias("n_rows"))
        checks.append(
            total.crossJoin(orphans).select(
                F.lit(fk).alias("fk"), "n_rows", "n_orphans"
            )
        )
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.select(
        "fk",
        "n_rows",
        "n_orphans",
        (F.expr("div(n_orphans * 1000000, n_rows)") / 1000000.0).alias("orphan_rate"),
    )


@register(
    "ext_order_priority_q4",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o.o_orderkey
                    AND l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def ext_order_priority_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — TPC-H Q4 (order-priority count over a correlated
    EXISTS): orders that had at least one line shipped >30 days after
    the order date (the fixture's "late" stand-in for commit <
    receipt). Decorrelated to a LEFT SEMI join whose condition carries
    the cross-side date comparison; the orders date window pushes to
    its scan, and the semi join means no lineitem row is ever
    materialized into the output. This completes explicit coverage of
    all 22 TPC-H query shapes (Q1=a1, Q3/Q5/Q10/Q13-15/Q17-19/Q22 =
    ext_*, Q2/Q7-9/Q11/Q12/Q16/Q20/Q21 = fourth wave, Q6 =
    ext_revenue_q6)."""
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "ext_revenue_q6",
    """
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                    * CAST(round(l_discount * 100) AS HUGEINT)) // 100
                AS DOUBLE) / 100.0 AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """,
)
def ext_revenue_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — TPC-H Q6 (forecast revenue change): the pure
    scan-filter-aggregate. Every predicate (date range, discount band,
    quantity cap) must reach the parquet scan as a pushed filter; the
    whole query is one WholeStageCodegen span ending in a 1-row
    partial+final agg — the canonical 'filters push down, nothing else
    moves' plan."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.expr("CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))")
                * F.expr("CAST(round(l_discount * 100) AS DECIMAL(38,0))")
            ).alias("m4"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            (F.expr("CAST(div(m4, 100) AS BIGINT)") / 100.0).alias("revenue"),
            "n_rows",
        )
    )


@register(
    "ext_event_transitions",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts ASC, event_id ASC) AS next_type
        FROM events
    ),
    cnt AS (
        SELECT event_type, next_type, count(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    )
    SELECT event_type, next_type, n,
           floor(CAST(n * 1000000 AS DOUBLE) / sum(n) OVER (PARTITION BY event_type)) / 1000000.0 AS p
    FROM cnt
    """,
)
def ext_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix over per-user event sequences (the
    product-analytics "what happens after X" table): lead() within
    user, pair counts, row-normalized probabilities. Plan: ONE fact
    shuffle (the user window); the pair groupBy and the normalizing
    window both run on |event_type|² rows. Counts are integers, so the
    probabilities divide identical longs on both engines."""
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    cnt = (
        ev.select("user_id", "event_type", F.lead("event_type").over(w).alias("next_type"))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    norm = Window.partitionBy("event_type")
    return cnt.select(
        "event_type",
        "next_type",
        "n",
        (
            F.floor((F.col("n") * 1000000).cast("double") / F.sum("n").over(norm))
            / 1000000.0
        ).alias("p"),
    )


@register(
    "ext_exact_k_sample",
    """
    WITH ranked AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC,
                                           doc_id ASC) AS rn
        FROM documents
    )
    SELECT doc_id, lang FROM ranked WHERE rn <= 10
    """,
)
def ext_exact_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k per-stratum sample (eval-set construction: "exactly 10
    docs per language, stable across runs"): rank by md5(id) within
    the stratum and keep the first k — deterministic, engine-portable
    (md5 hex compares identically everywhere), and unlike rate-based
    ``stratified_sample`` the output size is exact. Plan: one shuffle
    on the stratum; WindowGroupLimit prunes each partition to k rows
    BEFORE the sort completes (same plan contract as w1), so the
    cost is top-k per group, not a full per-group sort."""
    docs = T(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 10)
        .select("doc_id", "lang")
    )


@register(
    "ext_attribution",
    """
    WITH tagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN event_type IN ('view', 'click') THEN event_id END AS t_id,
               CASE WHEN event_type IN ('view', 'click') THEN event_type END AS t_type,
               CASE WHEN event_type IN ('view', 'click') THEN ts END AS t_ts
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
    ),
    carried AS (
        SELECT user_id, ts, event_id, event_type,
               last_value(t_id IGNORE NULLS) OVER w AS touch_id,
               last_value(t_type IGNORE NULLS) OVER w AS touch_type,
               last_value(t_ts IGNORE NULLS) OVER w AS touch_ts
        FROM tagged
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id AS purchase_id, user_id, touch_id, touch_type,
           CAST(floor((epoch_us(ts) - epoch_us(touch_ts)) / 60000000) AS BIGINT)
             AS gap_minutes
    FROM carried
    WHERE event_type = 'purchase' AND touch_id IS NOT NULL
      AND ts - touch_ts <= INTERVAL 7 DAY
    """,
)
def ext_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to
    the user's most recent preceding view/click within a 7-day
    lookback. One shuffle (the per-user window); the carry-forward is
    ``last(..., ignorenulls=True)`` over the (ts, event_id)-ordered
    union of touches and purchases — the same forward-fill machinery
    as w2, applied to the product-analytics question. Deterministic
    because the window order carries the unique event_id tie-break."""
    ev = T(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    is_touch = F.col("event_type").isin("view", "click")
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(is_touch, F.col("event_id")).alias("t_id"),
        F.when(is_touch, F.col("event_type")).alias("t_type"),
        F.when(is_touch, F.col("ts")).alias("t_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.last("t_id", ignorenulls=True).over(w).alias("touch_id"),
        F.last("t_type", ignorenulls=True).over(w).alias("touch_type"),
        F.last("t_ts", ignorenulls=True).over(w).alias("touch_ts"),
    )
    return (
        carried.filter(
            (F.col("event_type") == "purchase")
            & F.col("touch_id").isNotNull()
            & (F.col("ts") <= F.col("touch_ts") + F.expr("INTERVAL 7 DAYS"))
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "touch_id",
            "touch_type",
            # elapsed whole minutes from µs epochs — DuckDB's
            # date_diff('minute') counts boundary CROSSINGS, not elapsed
            # time, so both engines floor the same integer µs delta
            F.floor(
                (
                    F.unix_micros(F.col("ts").cast("timestamp_ltz"))
                    - F.unix_micros(F.col("touch_ts").cast("timestamp_ltz"))
                )
                / 60000000
            ).cast("long").alias("gap_minutes"),
        )
    )


@register(
    "ext_rolling_wau",
    """
    WITH daily AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
        FROM events
    ),
    days AS (SELECT DISTINCT d FROM daily),
    fanned AS (
        SELECT d + CAST(u AS INTEGER) AS target_day, user_id
        FROM daily, unnest(range(0, 7)) AS t(u)
    )
    SELECT target_day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS wau
    FROM fanned
    WHERE target_day IN (SELECT d FROM days)
    GROUP BY target_day
    """,
)
def ext_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU) per day — the classic product
    health metric, computed WITHOUT a range self-join: each (day,
    user) pair fans out to the 7 target days it contributes to (a
    narrow 7× explode), then one count-distinct groupBy. At 100 TB
    the fanout unit is the DAILY-distinct pair table (already tiny
    relative to raw events), so the shuffle carries 7 × |daily actives|
    rows — versus a range join whose build side is the same table 7
    times over with none of the join-planning risk. Target days with
    no events of their own are excluded on both engines (semi-join
    against the observed day set)."""
    ev = T(spark, sf_dir, "events")
    daily = ev.select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("d"), "user_id"
    ).distinct()
    days = daily.select("d").distinct()
    fanned = daily.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("u"), "d", "user_id"
    ).select(F.date_add(F.col("d"), F.col("u")).alias("target_day"), "user_id")
    return (
        fanned.join(
            F.broadcast(days), fanned.target_day == days.d, "left_semi"
        )
        .groupBy("target_day")
        .agg(F.count_distinct("user_id").alias("wau"))
    )


@register(
    "ext_anomaly_mad",
    """
    WITH li AS (
        SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice
        FROM lineitem
        UNION ALL
        SELECT l_orderkey + 1000000000, l_linenumber, l_returnflag,
               l_extendedprice * 20
        FROM lineitem WHERE l_orderkey % 5000 = 0
    ),
    med AS (
        SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
        FROM li GROUP BY 1
    ),
    dev AS (
        SELECT l.l_returnflag,
               quantile_cont(abs(l.l_extendedprice - m.med), 0.5) AS mad
        FROM li l JOIN med m ON l.l_returnflag = m.l_returnflag
        GROUP BY 1
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
           round(l.l_extendedprice, 2) AS price,
           round(abs(l.l_extendedprice - m.med) / (1.4826 * d.mad), 4)
             AS robust_z
    FROM li l
    JOIN med m ON l.l_returnflag = m.l_returnflag
    JOIN dev d ON l.l_returnflag = d.l_returnflag
    WHERE abs(l.l_extendedprice - m.med) / (1.4826 * d.mad) > 3.5
    """,
)
def ext_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation — the
    heavy-tail-safe sibling of ext_outlier_zscore (mean/stddev break
    under the very outliers being hunted; median/MAD do not). Two
    grouped exact-median passes (median, then median of |x−median|),
    both |groups|-sized and broadcast back; the corpus itself is
    scanned twice but never shuffled — at 100 TB swap the exact
    medians for approx_percentile sketches and one scan. The 1.4826
    constant rescales MAD to σ-equivalents (normal consistency
    factor); both engines compute the identical doubles through the
    same interpolated-median path ext_percentiles already gates.
    Deterministic 20x-price outliers are injected (every 5000th order)
    so the detector provably fires on the uniform fixture, where the
    natural max robust-z is ~1.35."""
    base = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    inj = base.filter(F.col("l_orderkey") % 5000 == 0).select(
        (F.col("l_orderkey") + 1000000000).alias("l_orderkey"),
        "l_linenumber",
        "l_returnflag",
        (F.col("l_extendedprice") * 20).alias("l_extendedprice"),
    )
    li = base.unionByName(inj)
    # r11: both exact medians via aggregate.sorted_exact_percentiles
    # (bit-identical to the native percentile aggregate, ~8x cheaper
    # per task on near-unique prices — see ext_percentiles)
    med = agg_ops.sorted_exact_percentiles(
        li, ["l_returnflag"], "l_extendedprice", [0.5]
    ).select("l_returnflag", F.col("pcts")[0].alias("med"))
    dev = agg_ops.sorted_exact_percentiles(
        li.join(F.broadcast(med), "l_returnflag").withColumn(
            "_ad", F.abs(F.col("l_extendedprice") - F.col("med"))
        ),
        ["l_returnflag"],
        "_ad",
        [0.5],
    ).select("l_returnflag", F.col("pcts")[0].alias("mad"))
    rz = F.abs(F.col("l_extendedprice") - F.col("med")) / (1.4826 * F.col("mad"))
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .join(F.broadcast(dev), "l_returnflag")
        .filter(rz > 3.5)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.round("l_extendedprice", 2).alias("price"),
            F.round(rz, 4).alias("robust_z"),
        )
    )


@register(
    "ext_pit_join",
    """
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER w AS prev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    chg AS (
        SELECT * FROM ordered
        WHERE prev IS NULL OR prev <> event_type
    ),
    scd AS (
        SELECT user_id, event_type, ts AS valid_from,
               lead(ts) OVER w2 AS valid_to
        FROM chg
        WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    dim AS (
        SELECT * FROM scd
        WHERE valid_to IS NULL OR valid_to > valid_from
    ),
    fact AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
    )
    SELECT f.event_id, f.user_id, f.ts,
           d.event_type AS state_at_event,
           d.valid_from AS state_since
    FROM fact f JOIN dim d
      ON f.user_id = d.user_id
     AND d.valid_from <= f.ts
     AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    """,
)
def ext_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join — the feature-store primitive:
    attach to each fact row the dimension VERSION that was valid at
    the fact's event time. The dim is the SCD2 table ext_scd2_build
    produces (zero-width same-timestamp versions dropped: they carry
    no time); the lookup is NOT a range join but an as-of join on
    ``valid_from`` (``operators/joins.asof_join``: union + one keyed
    shuffle + forward fill — neither side needs to fit in memory, no
    range-state blowup, AQE handles skew like any shuffle). With a
    contiguous SCD2 history the greatest valid_from ≤ ts IS the
    containing version, so the as-of result equals the oracle's
    explicit BETWEEN join row for row."""
    from .operators import windows as win_ops

    ev = T(spark, sf_dir, "events")
    scd = win_ops.scd2_from_changes(ev, ["user_id"], ["ts", "event_id"], ["event_type"])
    dim = scd.filter(
        F.col("valid_to").isNull() | (F.col("valid_to") > F.col("valid_from"))
    )
    fact = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    out = join_ops.asof_join(
        fact,
        dim,
        on=["user_id"],
        left_ts="ts",
        right_ts="valid_from",
        right_cols={"event_type": "state_at_event"},
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "state_at_event",
        F.col("asof_ts").alias("state_since"),
    )


@register(
    "ext_entity_resolution",
    """
    WITH RECURSIVE b0 AS (
        SELECT p_partkey, p_name, p_type,
               regexp_extract(lower(p_name), '^[a-z0-9]+') AS fst,
               regexp_extract(lower(p_name), '[a-z0-9]+$') AS blk
        FROM part
    ),
    -- hard block-size quarantine (mirrors fuzzy_self_pairs
    -- max_block_size=1000): an oversize block emits NO pairs
    b AS (
        SELECT * FROM (
            SELECT b0.*, count(*) OVER (PARTITION BY blk, fst, p_type) AS __bn
            FROM b0
        ) WHERE __bn <= 1000
    ),
    pairs AS (
        SELECT a.p_partkey AS src, c.p_partkey AS dst
        FROM b a JOIN b c
          ON a.blk = c.blk AND a.fst = c.fst AND a.p_type = c.p_type
         AND a.p_partkey < c.p_partkey
        WHERE levenshtein(a.p_name, c.p_name) <= 3
    ),
    edges(a, e_b) AS (
        SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs
    ),
    walk(node, lab) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.e_b, w.lab FROM walk w JOIN edges e ON e.a = w.node
    ),
    cc AS (SELECT node, min(lab) AS cid FROM walk GROUP BY node),
    labels AS (
        SELECT p.p_partkey, p.p_name,
               CAST(coalesce(cc.cid, p.p_partkey) AS BIGINT) AS canonical_id
        FROM b0 p LEFT JOIN cc ON p.p_partkey = cc.node
    )
    SELECT p_partkey, p_name, canonical_id,
           CAST(count(*) OVER (PARTITION BY canonical_id) AS BIGINT)
             AS cluster_size
    FROM labels
    """,
)
def ext_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: blocked fuzzy matching
    (``joins.fuzzy_self_pairs``, per-block Levenshtein) → distributed
    connected components (``graph.connected_components``, min-label
    propagation) → every part labeled with a canonical entity id and
    its cluster size. The composition the reference's dedup pipelines
    stop short of: pair detection alone leaves A~B, B~C unresolved;
    the transitive closure is what yields one golden record per
    entity. The oracle closes the same edges with a recursive CTE —
    the declarative fixpoint checking the iterative propagation, same
    discipline as x16."""
    from .operators.graph import attach_clusters, connected_components

    # 3-key blocking (see ext_fuzzy_join): the 2-key similarity graph
    # was ~1.8M edges at sf0.1 and CC over it dominated build time.
    # max_block_size=1000 is the hard quadratic quarantine (VERDICT r5
    # #5): ~13x the fixture's largest block (78 at sf0.1), so it fires
    # only on pathology — one degenerate key (empty regex match, a
    # fixture regen artifact) can otherwise own the stage O(n²).
    # Quarantined rows keep their singleton label in the output; the
    # oracle applies the identical window-count filter before pairing.
    # The pair graph is the session memo shared with ext_fuzzy_join/x38.
    p, pairs = _fuzzy_part_pairs(spark, sf_dir)
    comps = connected_components(
        pairs.select(F.col("id_l").alias("doc_a"), F.col("id_r").alias("doc_b")),
        "doc_a",
        "doc_b",
    )
    labeled = attach_clusters(p.select("p_partkey", "p_name"), comps, "p_partkey")
    w = Window.partitionBy("cluster_id")
    return labeled.select(
        "p_partkey",
        "p_name",
        F.col("cluster_id").alias("canonical_id"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )


@register(
    "x38_triangle_count",
    """
    WITH b0 AS (
        SELECT p_partkey, p_name, p_type,
               regexp_extract(lower(p_name), '^[a-z0-9]+') AS fst,
               regexp_extract(lower(p_name), '[a-z0-9]+$') AS blk
        FROM part
    ),
    -- identical block-size quarantine as the engine's shared graph
    b AS (
        SELECT * FROM (
            SELECT b0.*, count(*) OVER (PARTITION BY blk, fst, p_type) AS __bn
            FROM b0
        ) WHERE __bn <= 1000
    ),
    e AS (
        SELECT a.p_partkey AS src, c.p_partkey AS dst
        FROM b a JOIN b c
          ON a.blk = c.blk AND a.fst = c.fst AND a.p_type = c.p_type
         AND a.p_partkey < c.p_partkey
        WHERE levenshtein(a.p_name, c.p_name) <= 3
    )
    SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT count(DISTINCT x) FROM
                 (SELECT src AS x FROM e UNION SELECT dst FROM e)) AS BIGINT)
             AS n_nodes,
           CAST((SELECT count(*)
                 FROM e e1 JOIN e e2 ON e1.dst = e2.src
                           JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst)
                AS BIGINT) AS n_triangles
    """,
)
def x38_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the fuzzy-similarity graph — the
    clustering-coefficient primitive (how clique-like are the
    near-duplicate neighborhoods?). The pair graph is the session memo
    shared with ext_fuzzy_join/ext_entity_resolution (one Levenshtein
    build per session, hard block quarantine included).

    Counting uses DEGREE ORIENTATION (compact-forward, Latapy 2008 —
    the refinement r5's verdict flagged as documented-but-not-done):
    every edge points from the lower-(degree, id) endpoint to the
    higher, so each triangle {u,v,w} is counted exactly once at its
    lowest vertex as an out-wedge (u→v, u→w) closed by the probe edge
    (v→w) — and no join key fans out beyond O(√|E|), because a node's
    OUT-degree under this orientation is at most √(2|E|) regardless of
    its raw degree (a hub's edges point INTO it). Triangle count is
    orientation-invariant, so the oracle's canonical src<dst two-hop
    counts the same triangles."""
    _, pairs = _fuzzy_part_pairs(spark, sf_dir)
    e0 = pairs.select(F.col("id_l").alias("src"), F.col("id_r").alias("dst"))
    deg = (
        e0.select(F.explode(F.array("src", "dst")).alias("x"))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient by (degree, id) total order: low endpoint -> high endpoint
    er = (
        e0.join(deg.select(F.col("x").alias("src"), F.col("d").alias("ds")), "src")
        .join(deg.select(F.col("x").alias("dst"), F.col("d").alias("dd")), "dst")
        .select(
            F.when(
                (F.col("ds") < F.col("dd"))
                | ((F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))),
                F.struct(F.col("src").alias("u"), F.col("dst").alias("v")),
            )
            .otherwise(F.struct(F.col("dst").alias("u"), F.col("src").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
        .localCheckpoint()
    )
    n_edges = er.count()
    n_nodes = (
        er.select(F.col("u").alias("x"))
        .unionByName(er.select(F.col("v").alias("x")))
        .distinct()
        .count()
    )
    w1 = er.select(F.col("u").alias("a"), F.col("v").alias("b"))
    w2 = er.select(F.col("u").alias("a"), F.col("v").alias("c"))
    probe = er.select(F.col("u").alias("b"), F.col("v").alias("c"))
    # out-wedge (a→b, a→c) closed by probe b→c: the b→c edge exists
    # only when b precedes c in the total order, so each unordered
    # wedge closes at most once — exactly-once triangle counting
    tri = w1.join(w2, "a").filter(F.col("b") != F.col("c")).join(probe, ["b", "c"]).count()
    from .io import local_rows

    return local_rows(
        spark, [(n_edges, n_nodes, tri)], "n_edges long, n_nodes long, n_triangles long"
    )


@register(
    "x83_cc_largestar",
    """
    WITH RECURSIVE b0 AS (
        SELECT p_partkey, p_name, p_type,
               regexp_extract(lower(p_name), '^[a-z0-9]+') AS fst,
               regexp_extract(lower(p_name), '[a-z0-9]+$') AS blk
        FROM part
    ),
    b AS (
        SELECT * FROM (
            SELECT b0.*, count(*) OVER (PARTITION BY blk, fst, p_type) AS __bn
            FROM b0
        ) WHERE __bn <= 1000
    ),
    pairs AS (
        SELECT a.p_partkey AS src, c.p_partkey AS dst
        FROM b a JOIN b c
          ON a.blk = c.blk AND a.fst = c.fst AND a.p_type = c.p_type
         AND a.p_partkey < c.p_partkey
        WHERE levenshtein(a.p_name, c.p_name) <= 3
    ),
    edges(a, e_b) AS (
        SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs
    ),
    walk(node, lab) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.e_b, w.lab FROM walk w JOIN edges e ON e.a = w.node
    ),
    cc AS (SELECT node, min(lab) AS cid FROM walk GROUP BY node)
    SELECT p.p_partkey,
           CAST(coalesce(cc.cid, p.p_partkey) AS BIGINT) AS canonical_id,
           CAST(count(*) OVER (PARTITION BY coalesce(cc.cid, p.p_partkey))
                AS BIGINT) AS cluster_size
    FROM b0 p LEFT JOIN cc ON p.p_partkey = cc.node
    """,
)
def x83_cc_largestar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components via LARGE-STAR/SMALL-STAR contraction
    (Kiveris et al., SoCC 2014; ``graph.connected_components_star``) —
    the web-scale CC algorithm, on the same fuzzy similarity graph as
    ext_entity_resolution. Min-label propagation (x16/ER) walks the
    component diameter, one round per hop; star contraction HALVES
    chain depth per round (O(log² n) worst case, ~4-5 rounds in
    practice) — at 100 TB, where a near-dup chain can thread thousands
    of documents, that is the difference between 5 shuffles and 5 000.
    Each half-round is one per-node MIN + one per-edge re-target; no
    neighbor lists are ever collected (hub fan-out stays join-shaped),
    nothing in any task scales with component size. The oracle's
    recursive-CTE closure — and ER's propagation output — pin the
    exact same (node → min id) labeling, so the driver gate checks the
    algorithm, not just the shapes."""
    from .operators.graph import attach_clusters, connected_components_star

    p, pairs = _fuzzy_part_pairs(spark, sf_dir)
    comps = connected_components_star(
        pairs.select(F.col("id_l").alias("doc_a"), F.col("id_r").alias("doc_b")),
        "doc_a",
        "doc_b",
    )
    labeled = attach_clusters(p.select("p_partkey"), comps, "p_partkey")
    w = Window.partitionBy("cluster_id")
    return labeled.select(
        "p_partkey",
        F.col("cluster_id").alias("canonical_id"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )


@register(
    "ext_session_paths",
    """
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800 * 1000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, event_type, ts, event_id,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sess_n
        FROM ordered
    ),
    paths AS (
        SELECT user_id, sess_n,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM sess GROUP BY user_id, sess_n
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
    FROM paths
    GROUP BY path
    HAVING count(*) >= 5
    """,
)
def ext_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path mining: sessionize (30-min idle gap), concatenate
    each session's ordered event types into a path string, count the
    frequent paths (support >= 5) — the "how do users actually move"
    table. One shuffle for the user window, one for the per-session
    ordered aggregation (array_sort over (ts, event_id)-keyed structs
    → deterministic '>' join, identical to the oracle's ORDER BY
    string_agg), one |paths|-sized count."""
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gap_us = (
        F.unix_micros(F.col("ts").cast("timestamp_ltz"))
        - F.unix_micros(F.lag("ts").over(w).cast("timestamp_ltz"))
    )
    sess = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull() | (gap_us >= 1800 * 1000000), 1
        ).otherwise(0).alias("new_sess"),
    ).select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("sess_n"),
    )
    paths = (
        sess.groupBy("user_id", "sess_n")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .filter(F.col("n_sessions") >= 5)
    )


@register(
    "ext_time_to_convert",
    """
    WITH tagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN event_type = 'view' THEN ts END AS v_ts
        FROM events WHERE event_type IN ('view', 'purchase')
    ),
    carried AS (
        SELECT user_id, ts, event_id, event_type,
               last_value(v_ts IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ts
        FROM tagged
    ),
    conv AS (
        SELECT (epoch_us(ts) - epoch_us(v_ts)) / 60000000.0 AS mins
        FROM carried
        WHERE event_type = 'purchase' AND v_ts IS NOT NULL
    )
    SELECT CAST(count(*) AS BIGINT) AS n_conversions,
           round(quantile_cont(mins, 0.5), 4)  AS p50_minutes,
           round(quantile_cont(mins, 0.9), 4)  AS p90_minutes,
           round(quantile_cont(mins, 0.99), 4) AS p99_minutes
    FROM conv
    """,
)
def ext_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for every purchase, minutes since
    the user's most recent view (same carry-forward machinery as
    ext_attribution), summarized as interpolated p50/p90/p99 — the
    funnel-latency health metric. One user-window shuffle + one 1-row
    percentile aggregate; µs-epoch arithmetic keeps both engines on
    identical doubles before the identical interpolation."""
    ev = T(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ev.select(
        "event_type",
        "ts",
        F.last(
            F.when(F.col("event_type") == "view", F.col("ts")), ignorenulls=True
        ).over(w).alias("v_ts"),
    )
    mins = (
        F.unix_micros(F.col("ts").cast("timestamp_ltz"))
        - F.unix_micros(F.col("v_ts").cast("timestamp_ltz"))
    ) / 60000000.0
    conv = carried.filter(
        (F.col("event_type") == "purchase") & F.col("v_ts").isNotNull()
    ).select(mins.alias("mins"))
    pct = F.expr("percentile(mins, array(0.5D, 0.9D, 0.99D))")
    return conv.agg(
        F.count(F.lit(1)).alias("n_conversions"), pct.alias("p")
    ).select(
        "n_conversions",
        *[
            F.round(F.col("p")[i], 4).alias(n)
            for i, n in enumerate(("p50_minutes", "p90_minutes", "p99_minutes"))
        ],
    )


@register(
    "ext_profile_table",
    """
    WITH s AS (
        SELECT count(*) AS n,
               count(o_custkey) AS nn_custkey,
               count(o_orderstatus) AS nn_status,
               count(o_totalprice) AS nn_price,
               count(DISTINCT o_orderstatus) AS nd_status,
               count(DISTINCT o_orderpriority) AS nd_priority,
               round(min(o_totalprice), 2) AS min_price,
               round(max(o_totalprice), 2) AS max_price
        FROM orders
    )
    SELECT col, n_rows, n_nulls, n_distinct, min_val, max_val FROM (
        SELECT 'o_orderstatus' AS col, CAST(n AS BIGINT) AS n_rows,
               CAST(n - nn_status AS BIGINT) AS n_nulls,
               CAST(nd_status AS BIGINT) AS n_distinct,
               NULL AS min_val, NULL AS max_val
        FROM s
        UNION ALL
        SELECT 'o_orderpriority', CAST(n AS BIGINT),
               CAST(0 AS BIGINT), CAST(nd_priority AS BIGINT), NULL, NULL
        FROM s
        UNION ALL
        SELECT 'o_totalprice', CAST(n AS BIGINT),
               CAST(n - nn_price AS BIGINT), CAST(NULL AS BIGINT),
               min_price, max_price
        FROM s
    )
    """,
)
def ext_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (ANALYZE-style column statistics as data):
    null counts, distinct counts, and min/max per column, computed in
    ONE aggregation pass over the table and unpivoted to a
    (column, stats) report — the input to both query planning
    (lake.analyze_table feeds the catalog) and data-quality review.
    At 100 TB exact count-distinct per column is the only shuffle-heavy
    piece; swap to approx_count_distinct per column (still one pass)
    and the whole profile is a scan + 1-row aggregate."""
    o = T(spark, sf_dir, "orders")
    s = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_orderstatus").alias("nn_status"),
        F.count("o_totalprice").alias("nn_price"),
        F.count_distinct("o_orderstatus").alias("nd_status"),
        F.count_distinct("o_orderpriority").alias("nd_priority"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    ).first()
    rows = [
        ("o_orderstatus", s["n"], s["n"] - s["nn_status"], s["nd_status"], None, None),
        ("o_orderpriority", s["n"], 0, s["nd_priority"], None, None),
        ("o_totalprice", s["n"], s["n"] - s["nn_price"], None, s["min_price"], s["max_price"]),
    ]
    from .io import local_rows

    return local_rows(
        spark,
        rows,
        "col string, n_rows long, n_nulls long, n_distinct long, "
        "min_val double, max_val double",
    )


@register(
    "ext_incremental_join_view",
    """
    SELECT o_orderkey, c_custkey, c_name, o_orderstatus,
           round(o_totalprice, 2) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def ext_incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN
    (``incremental.merge_join_view``): the orders⋈customer view is
    first materialized from 80% of each side, then the remaining 20%
    folds in via the delta rule ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB — and the result
    must equal the from-scratch join the oracle computes. The split is
    deterministic (key modulo), so the maintained view is value-equal,
    not just cardinality-equal. Delta joins broadcast the delta side;
    the full sides never reshuffle for maintenance."""
    from .operators.incremental import merge_join_view

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o_old = o.filter(F.col("o_orderkey") % 5 != 0)
    o_new = o.filter(F.col("o_orderkey") % 5 == 0)
    c_old = c.filter(F.col("c_custkey") % 5 != 0)
    c_new = c.filter(F.col("c_custkey") % 5 == 0)
    base = o_old.join(c_old, o_old.o_custkey == c_old.c_custkey).select(
        "o_orderkey", "c_custkey", "c_name", "o_orderstatus", "o_totalprice"
    )
    view = merge_join_view(
        base,
        o_old,
        c_old,
        F.broadcast(o_new),
        F.broadcast(c_new),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return view.select(
        "o_orderkey",
        "c_custkey",
        "c_name",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("total"),
    )


@register(
    "ext_incremental_quantiles",
    """
    WITH binned AS (
        SELECT o_orderpriority,
               least(63, greatest(0,
                   CAST(floor(o_totalprice / (600000.0 / 64)) AS INTEGER)))
                 AS bin,
               count(*) AS n
        FROM orders
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT o_orderpriority, bin, n,
               sum(n) OVER (PARTITION BY o_orderpriority ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(n) OVER (PARTITION BY o_orderpriority) AS total
        FROM binned
    ),
    est AS (
        SELECT o_orderpriority, min(bin) AS qbin
        FROM ranked
        WHERE cum >= ceil(0.5 * total)
        GROUP BY o_orderpriority
    )
    SELECT e.o_orderpriority,
           e.qbin * (600000.0 / 64) AS p50_est,
           round(x.p50_exact, 2) AS p50_exact,
           TRUE AS within_one_bin
    FROM est e
    JOIN (
        SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS p50_exact
        FROM orders GROUP BY 1
    ) x ON e.o_orderpriority = x.o_orderpriority
    """,
)
def ext_incremental_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally maintained QUANTILES: per-key equi-width histogram
    state (``incremental.partial_quantile_state``) — history binned
    once, the delta binned alone, merged with a groupBy-sum (exact,
    commutative; replay-safe like every mergeable state here). The
    binned p50 estimate is deterministic integer arithmetic, so the
    oracle value-checks the ESTIMATE itself (not just a bound) by
    recomputing the same bins declaratively; the accuracy contract —
    estimate within one bin width of the exact interpolated median —
    rides as the in-query boolean. At 100 TB this is the
    streaming-compatible percentile: O(keys × bins) state, no raw
    retention, arbitrary re-partitioning of history/delta."""
    from .operators.incremental import (
        estimate_quantile,
        merge_quantile_state,
        partial_quantile_state,
    )

    LO, HI, BINS = 0.0, 600000.0, 64
    o = T(spark, sf_dir, "orders")
    hist = o.filter(F.col("o_orderkey") % 5 != 0)
    delta = o.filter(F.col("o_orderkey") % 5 == 0)
    state = merge_quantile_state(
        partial_quantile_state(hist, ["o_orderpriority"], "o_totalprice", LO, HI, BINS),
        partial_quantile_state(delta, ["o_orderpriority"], "o_totalprice", LO, HI, BINS),
        ["o_orderpriority"],
    )
    est = estimate_quantile(state, ["o_orderpriority"], 0.5, LO, HI, BINS)
    # r11: exact median via sorted_exact_percentiles (bit-identical,
    # cheaper per task than the native percentile map — ext_percentiles)
    exact = agg_ops.sorted_exact_percentiles(
        o, ["o_orderpriority"], "o_totalprice", [0.5]
    ).select("o_orderpriority", F.col("pcts")[0].alias("p50_exact"))
    width = (HI - LO) / BINS
    return (
        est.join(exact, "o_orderpriority")
        .select(
            "o_orderpriority",
            F.col("q_est").alias("p50_est"),
            F.round("p50_exact", 2).alias("p50_exact"),
            (F.abs(F.col("q_est") - F.col("p50_exact")) <= width).alias(
                "within_one_bin"
            ),
        )
    )


# ---------------------------------------------------------------------------
# ext — per-group OLS trend (regression over exact integer sums)
# ---------------------------------------------------------------------------


@register(
    "ext_regression_slope",
    """
    WITH pts AS (
        SELECT o_orderpriority,
               date_diff('day', DATE '1995-01-01',
                         CAST(o_orderdate AS DATE))            AS x,
               CAST(round(o_totalprice * 100) AS BIGINT)       AS y
        FROM orders
    ),
    s AS (
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT)  AS n,
               CAST(sum(x) AS BIGINT)    AS sx,
               CAST(sum(y) AS BIGINT)    AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM pts GROUP BY 1
    )
    SELECT o_orderpriority, n AS n_orders,
           CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * 1e6) AS BIGINT) AS slope_micro_cents_per_day,
           CAST(floor((CAST(sy AS DOUBLE)
                       - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                         * CAST(sx AS DOUBLE))
                      / CAST(n AS DOUBLE)) AS BIGINT) AS intercept_cents
    FROM s
    """,
)
def ext_regression_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS trend line — "is spend in this segment trending
    up?" (the report family behind ``monthly_summary.py``'s totals,
    extended from level to slope). Cross-engine float determinism is
    handled the sanctioned way (verify notes): the five sufficient
    statistics (n, Σx, Σy, Σxy, Σx²) are EXACT BIGINT sums over
    integer day offsets and money cents — every one below 2^53, so
    their DOUBLE images are exact and the closed-form slope
    ``(nΣxy − ΣxΣy) / (nΣxx − ΣxΣx)`` is a single correctly-rounded
    IEEE expression, bit-identical on any engine; floors to
    micro-cents/day make the hash compare exact. Scale: one partial
    aggregate (map-side combine) + one |groups|-row exchange — the
    same plan shape as a1; regression over 100 TB costs exactly one
    scan, no matrix library, no driver math."""
    o = T(spark, sf_dir, "orders")
    d = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
    pts = o.select(
        "o_orderpriority",
        d.cast("long").alias("x"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
    )
    s = pts.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd, sxd = F.col("n").cast("double"), F.col("sx").cast("double")
    syd, sxyd, sxxd = (
        F.col("sy").cast("double"),
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
    )
    slope = (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
    intercept = (syd - slope * sxd) / nd
    return s.select(
        "o_orderpriority",
        F.col("n").alias("n_orders"),
        F.floor(slope * 1e6).cast("long").alias("slope_micro_cents_per_day"),
        F.floor(intercept).cast("long").alias("intercept_cents"),
    )


# ---------------------------------------------------------------------------
# ext — decile stats (ntile segmentation over customer spend)
# ---------------------------------------------------------------------------


@register(
    "ext_decile_stats",
    """
    WITH spend AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM orders GROUP BY 1
    ),
    tiled AS (
        SELECT o_custkey, cents,
               ntile(10) OVER (ORDER BY cents DESC, o_custkey) AS decile
        FROM spend
    )
    SELECT decile,
           CAST(count(*) AS BIGINT)   AS n_customers,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           min(cents)                 AS min_cents,
           max(cents)                 AS max_cents
    FROM tiled GROUP BY 1
    """,
)
def ext_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-value deciles — ntile(10) segmentation over lifetime
    spend (the "top decile drives N% of revenue" report). The rank
    order carries the unique ``o_custkey`` tie-break so the decile
    assignment is total and identical cross-engine; all outputs are
    exact integer cents. Scale note: a global ntile is a single-
    partition sort of the AGGREGATED per-customer table (|customers|
    rows, not |orders|) — at 100 TB the right plan is exactly this
    aggregate-then-rank shape, and if even |customers| outgrows one
    task the same query runs on ``approx_percentile`` cut points
    (ext_percentiles_approx) with no global sort at all."""
    o = T(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    w = Window.orderBy(F.col("cents").desc(), F.col("o_custkey"))
    tiled = spend.withColumn("decile", F.ntile(10).over(w))
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("total_cents"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
    )


# ---------------------------------------------------------------------------
# ext — CUSUM drift / changepoint statistic (prefix-sum drawup, exact ints)
# ---------------------------------------------------------------------------


@register(
    "ext_cusum_changepoint",
    """
    WITH daily AS (
        SELECT o_orderpriority,
               CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM orders GROUP BY 1, 2
    ),
    with_k AS (
        SELECT o_orderpriority, day, cents,
               CAST(sum(cents) OVER (PARTITION BY o_orderpriority) AS BIGINT)
                 // CAST(count(*) OVER (PARTITION BY o_orderpriority) AS BIGINT)
                 AS k
        FROM daily
    ),
    prefix AS (
        SELECT o_orderpriority, k, day,
               CAST(sum(cents - k) OVER (PARTITION BY o_orderpriority
                    ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p
        FROM with_k
    ),
    drawup AS (
        SELECT o_orderpriority, k,
               p - least(CAST(0 AS BIGINT),
                         CAST(min(p) OVER (PARTITION BY o_orderpriority
                              ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS BIGINT)) AS s
        FROM prefix
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_days,
           k                        AS target_cents,
           max(s)                   AS max_cusum_cents,
           max(s) > 20 * k          AS drifted
    FROM drawup GROUP BY o_orderpriority, k
    """,
)
def ext_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift statistic per segment — the classic sequential
    changepoint detector (Page 1954): the running max of
    ``s_i = max(0, s_{i-1} + (x_i − k))`` over the day-ordered daily
    series. The recurrence LOOKS sequential, but its maximum equals
    the prefix-sum drawup ``max_i (P_i − min(0, min_{j≤i} P_j))``
    with ``P_i = Σ(x_t − k)`` — so the whole statistic is two window
    functions (cumulative sum + running min) and a max: fully
    parallel within Spark's window machinery, no array fold, no UDF.
    Integer cents end to end; target k = floor mean daily cents;
    drift flag at 20× k. (A fold formulation was rejected: DuckDB
    1.0's ``list_reduce`` evaluates struct fields against the
    already-updated accumulator, so cross-engine fold determinism
    does not extend to multi-field states.)

    Scale: one shuffle to daily grains, one window partition per
    segment over |distinct days| rows (bounded ~10³ for years) —
    never raw orders. The drawup identity is also the mergeable form:
    (sum, min-prefix, max-drawup) per chunk combine associatively,
    which is how the same statistic runs incrementally/streaming."""
    o = T(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority", F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    g = Window.partitionBy("o_orderpriority")
    with_k = daily.withColumn(
        "k", F.expr("sum(cents) OVER (PARTITION BY o_orderpriority) DIV "
                    "count(*) OVER (PARTITION BY o_orderpriority)")
    )
    seq = g.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prefix = with_k.withColumn("p", F.sum(F.col("cents") - F.col("k")).over(seq))
    draw = prefix.withColumn(
        "s", F.col("p") - F.least(F.lit(0).cast("long"), F.min("p").over(seq))
    )
    return draw.groupBy("o_orderpriority", "k").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.max("s").alias("max_cusum_cents"),
        (F.max("s") > 20 * F.col("k")).alias("drifted"),
    ).select(
        "o_orderpriority",
        "n_days",
        F.col("k").alias("target_cents"),
        "max_cusum_cents",
        "drifted",
    )


@register(
    "ext_incremental_cusum",
    """
    WITH daily AS (
        SELECT o_orderpriority,
               CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 - 43000000 AS dev
        FROM orders GROUP BY 1, 2
    ),
    prefix AS (
        SELECT o_orderpriority, day,
               CAST(sum(dev) OVER (PARTITION BY o_orderpriority ORDER BY day
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p
        FROM daily
    ),
    drawup AS (
        SELECT o_orderpriority,
               p - least(CAST(0 AS BIGINT),
                         CAST(min(p) OVER (PARTITION BY o_orderpriority
                              ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS BIGINT)) AS s
        FROM prefix
    )
    SELECT o_orderpriority, max(s) AS max_cusum_cents
    FROM drawup GROUP BY 1
    """,
)
def ext_incremental_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally maintained CUSUM maximum — the drift statistic as
    MERGEABLE STATE: the drawup summary (chunk total, min/max prefix,
    best drawup) is a Kadane-style associative monoid-with-order, so
    history keeps a 4-number state per key and each day's delta folds
    in WITHOUT rescanning history (``operators/incremental.
    partial_drawup_state`` / ``merge_drawup_state``). Here history =
    days before 1999, delta = the rest; the oracle recomputes the
    statistic from scratch over the full series — merged state must
    equal from-scratch exactly (integer cents, fixed target k so the
    split point cannot leak into the statistic).

    Scale: state is 4 BIGINTs per key; the daily delta pass windows
    over |delta| rows only. This is the streaming form of
    ext_cusum_changepoint — same replay-safe mergeable-state family
    as ext_incremental_agg_merge / _distinct / _quantiles."""
    from .operators.incremental import merge_drawup_state, partial_drawup_state

    o = T(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority", F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            - F.lit(43000000)
        ).alias("dev")
    )
    hist = daily.filter(F.col("day") < F.lit("1999-01-01").cast("date"))
    delta = daily.filter(F.col("day") >= F.lit("1999-01-01").cast("date"))
    merged = merge_drawup_state(
        partial_drawup_state(hist, ["o_orderpriority"], "day", "dev"),
        partial_drawup_state(delta, ["o_orderpriority"], "day", "dev"),
        ["o_orderpriority"],
    )
    return merged.select(
        "o_orderpriority", F.col("du_d").alias("max_cusum_cents")
    )


@register(
    "ext_time_travel_read",
    """
    WITH t AS (
        SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-10'
        QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id ASC) = 1
    ),
    s AS (
        SELECT * FROM events
        WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-15'
        QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id ASC) = 1
    ),
    u AS (
        SELECT *, 0 AS sr FROM t
        UNION ALL
        SELECT *, 1 AS sr FROM s
    )
    SELECT event_id, ts, user_id, event_type, round(value, 2) AS value
    FROM u
    QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, sr ASC, event_id ASC) = 1
    """,
)
def ext_time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel under the value gate: commit three versions of the
    keyed-latest table (pre-01-10 seed, then two MERGE commits for the
    01-10→01-15 and post-01-15 slices) and read back **version 2** —
    NOT the head — via ``lake_tx.read_table(version=2)``. The oracle
    reconstructs what the table looked like after the second commit
    only; any manifest/versioning bug that leaks v3 rows (or loses v2
    ones) is a value mismatch. Delta ``versionAsOf`` / Iceberg
    snapshot-read semantics (reference merge lineage:
    ``datatrack_spark_utils.py:306-362``) over plain parquet +
    manifest swap. Scale: a version read is one manifest resolve then
    a normal pruned parquet scan of that version's immutable dir —
    time travel costs nothing at read time; retention is the
    ``expire_versions`` knob (D5)."""
    from . import lake_tx

    root = f"/tmp/fintrack_lake_tt_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(root, ignore_errors=True)

    ev = T(spark, sf_dir, "events")
    c1 = F.lit("2024-01-10").cast("timestamp")
    c2 = F.lit("2024-01-15").cast("timestamp")
    seed = win_ops.dedup_latest(
        ev.filter(F.col("ts") < c1), ["user_id", "event_type"], "ts", ["event_id"]
    )
    lake_tx.commit_table(seed, root)
    for lo, hi in ((c1, c2), (c2, None)):
        delta = ev.filter(F.col("ts") >= lo)
        if hi is not None:
            delta = delta.filter(F.col("ts") < hi)
        lake_tx.merge_latest_wins_versioned(
            spark, root, delta, ["user_id", "event_type"], "ts", ["event_id"]
        )
    assert lake_tx.current_version(root) == 3
    return lake_tx.read_table(spark, root, version=2).select(
        "event_id", "ts", "user_id", "event_type", F.round("value", 2).alias("value")
    )


def _cm_oracle(depth: int = 4, width: int = 64) -> str:
    def bucket(d: int, key: str) -> str:
        return (
            f"CAST(('0x' || substring(md5('{d}|' || CAST({key} AS VARCHAR)), "
            f"1, 8)) AS BIGINT) % {width}"
        )

    cells = "\n    UNION ALL\n    ".join(
        f"SELECT {d} AS sketch_row, {bucket(d, 'o_custkey')} AS bucket,\n"
        f"           CAST(count(*) AS BIGINT) AS cnt FROM orders GROUP BY 2"
        for d in range(depth)
    )
    joins = "\n".join(
        f"    LEFT JOIN cells c{d} ON c{d}.sketch_row = {d}\n"
        f"      AND c{d}.bucket = {bucket(d, 'e.o_custkey')}"
        for d in range(depth)
    )
    least = ", ".join(f"COALESCE(c{d}.cnt, 0)" for d in range(depth))
    return f"""
    WITH cells AS (
    {cells}
    ),
    exact AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS exact_n
        FROM orders GROUP BY 1
        ORDER BY exact_n DESC, o_custkey LIMIT 20
    )
    SELECT e.o_custkey, e.exact_n,
           least({least}) AS cm_estimate,
           least({least}) >= e.exact_n AS never_undercounts
    FROM exact e
{joins}
    """


@register("x51_countmin_sketch", _cm_oracle())
def x51_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation (Cormode & Muthukrishnan
    2005) as MERGEABLE STATE: history and delta order slices each build
    a depth×width integer grid (md5-derived buckets — deterministic
    and engine-portable), the grids merge by cell-wise addition, and
    the top-20 customers' frequencies are estimated as the min over
    their cells. Because the hash family is deterministic, the oracle
    value-checks the ESTIMATES THEMSELVES, not just a bound; the
    one-sided guarantee (never an undercount) rides as the in-query
    boolean. State is 4×64 BIGINTs regardless of cardinality — the
    100 TB shape is per-partition/per-day sketches unioned across any
    range with no rescan (``operators/incremental.count_min_state`` /
    ``merge_count_min_state`` / ``count_min_estimate``; associativity
    pinned in pytest). Probes broadcast-join the tiny grid — no
    corpus shuffle."""
    from .operators.incremental import (
        count_min_estimate,
        count_min_state,
        merge_count_min_state,
    )

    o = T(spark, sf_dir, "orders")
    hist = o.filter(F.col("o_orderkey") % 4 != 0)
    delta = o.filter(F.col("o_orderkey") % 4 == 0)
    state = merge_count_min_state(
        count_min_state(hist, "o_custkey"), count_min_state(delta, "o_custkey")
    )
    probes = (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "o_custkey")
        .limit(20)
    )
    est = count_min_estimate(probes, state, "o_custkey")
    return est.select(
        "o_custkey",
        "exact_n",
        "cm_estimate",
        (F.col("cm_estimate") >= F.col("exact_n")).alias("never_undercounts"),
    )
