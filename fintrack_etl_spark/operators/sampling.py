"""Deterministic sampling — stratified rates without randomness.

Engine extension for the training-data pipeline (no reference
counterpart): corpus curation constantly downsamples by stratum —
"keep 100% of lang='pt', 10% of lang='en', 1% of boilerplate" — and at
100 TB the sample must be (a) a pure map over the corpus (no shuffle,
no global state), (b) reproducible across runs, engines and cluster
sizes, and (c) consistent per KEY, so re-crawled copies of a document
land on the same side of the cut.

The uniform variate is the md5 hex prefix of the key compared against a
per-stratum threshold string — the same technique as the x17 train/eval
split (``queries_ext.py``), extended from one global cut to a
broadcast-joined rate per stratum. md5 is md5 everywhere, hex-string
ordering is byte ordering, so the DuckDB oracle reproduces the sample
EXACTLY — sampling stays value-checkable, not just "about the right
size".

``sampleBy``/``TABLESAMPLE`` can't give this: their variates come from
a seeded per-partition RNG, so membership changes with partitioning and
cannot be reproduced by another engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: Hex digits of the md5 prefix compared against the threshold.
#: 4 digits = 65536 distinct rate steps (resolution 0.0015%).
_HEX_DIGITS = 4


def rate_threshold_hex(rate: float, digits: int = _HEX_DIGITS) -> str:
    """Map a sampling rate in [0, 1] to the hex-string threshold such
    that ``md5_prefix < threshold`` keeps ≈rate of uniformly hashed
    keys (exactly ``round(rate * 16**digits)`` buckets).

    A POSITIVE rate below half a bucket (rate·16^digits rounding to 0)
    clamps to ONE bucket rather than underflowing to the keep-nothing
    threshold (ADVICE r10): callers asking to keep *something* — e.g.
    the sampled-Lloyd cap/n at extreme N — must never get an empty
    sample from resolution loss alone. rate == 0.0 still means
    keep-nothing exactly.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    buckets = round(rate * (1 << (4 * digits)))
    if buckets == 0 and rate > 0.0:
        buckets = 1
    if buckets >= (1 << (4 * digits)):
        # keep-everything: the comparison is LEXICOGRAPHIC, so the
        # natural "one past the top" value ("1" + zeros) would sort
        # BEFORE most prefixes; 'g' sorts after every hex digit.
        return "g"
    return format(buckets, f"0{digits}x")


def stratified_sample(
    df: DataFrame,
    spark: SparkSession,
    strata_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff ``md5(key)`` falls under its stratum's
    threshold. Plan shape: one broadcast hash join against the tiny
    rates table + a native string compare — the fact side is never
    shuffled, and the same predicate works as a pushable filter when
    the sample is materialized repeatedly.

    NULL handling: a NULL stratum falls back to ``default_rate`` (the
    join misses, the threshold coalesces); a NULL ``key_col`` row is
    ALWAYS dropped (md5(NULL) is NULL, the compare is unknown) — a
    keyless row has no stable sampling identity, so keeping it would
    break run-to-run reproducibility. Filter such rows beforehand if
    they must survive.
    """
    rows = [(s, rate_threshold_hex(r)) for s, r in rates.items()]
    thr = spark.createDataFrame(rows, [strata_col, "__thr"])
    default_thr = F.lit(rate_threshold_hex(default_rate))
    return (
        df.join(F.broadcast(thr), strata_col, "left")
        .filter(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, _HEX_DIGITS)
            < F.coalesce(F.col("__thr"), default_thr)
        )
        .select(*df.columns)  # drop __thr, restore input column order
    )


def _sql_str(s: str) -> str:
    """Render a value as a SQL string literal (embedded quotes doubled,
    per ANSI) — stratum names are data, not trusted SQL fragments."""
    return "'" + s.replace("'", "''") + "'"


def stratified_sample_sql_predicate(
    strata_expr: str, key_expr: str, rates: dict[str, float], default_rate: float = 0.0
) -> str:
    """The same membership predicate as ANSI SQL (DuckDB oracle twin)."""
    cases = " ".join(
        f"WHEN {strata_expr} = {_sql_str(s)} THEN '{rate_threshold_hex(r)}'"
        for s, r in rates.items()
    )
    thr = f"CASE {cases} ELSE '{rate_threshold_hex(default_rate)}' END"
    return f"substring(md5(CAST({key_expr} AS VARCHAR)), 1, {_HEX_DIGITS}) < ({thr})"


def sample_to_token_budget(
    df: DataFrame,
    spark: SparkSession,
    strata_col: str,
    token_col: str,
    key_col: str,
    budgets: dict[str, int],
) -> DataFrame:
    """Domain mixing to token budgets — the pretraining data-mixture
    op ("webtext 60%, code 20%, books 20% of a 1T-token budget"):
    derive each stratum's keep-rate from its OWN token mass
    (``rate = min(1, budget / total_tokens)``), then apply the
    deterministic md5-threshold sample at that rate.

    Everything stays engine-portable and exact: the totals are integer
    sums, the rate→threshold conversion is ``floor(rate * 16^4)``
    rendered as a 4-hex-digit string (IEEE double division is
    bit-identical across engines, so a DuckDB twin reproduces
    membership row for row). The totals aggregate is one shuffle of
    |strata| rows; the thresholds broadcast back — the corpus itself
    is never shuffled.

    Statistical, not a hard cap: kept tokens ≈ budget in expectation
    (md5 uniformity); a stratum under its budget keeps everything
    (rate clamps at 1).

    Drop-by-default: a stratum with NO entry in ``budgets`` (and any
    NULL-stratum row) is dropped entirely — a mixture spec is a closed
    list, so "not in the mixture" means rate 0, unlike
    :func:`stratified_sample` whose ``default_rate`` models an open
    catch-all. Pass ``rate=1`` strata explicitly to keep them.
    """
    budget_rows = [(s, int(b)) for s, b in budgets.items()]
    bdf = spark.createDataFrame(budget_rows, [strata_col, "__budget"])
    totals = df.groupBy(strata_col).agg(F.sum(token_col).alias("__tot"))
    space = 1 << (4 * _HEX_DIGITS)
    buckets = F.floor(
        F.least(F.col("__budget") / F.col("__tot"), F.lit(1.0)) * space
    )
    thr = (
        totals.join(F.broadcast(bdf), strata_col, "inner")
        .select(
            strata_col,
            F.when(buckets >= space, F.lit("g"))
            .otherwise(F.lpad(F.lower(F.hex(buckets)), _HEX_DIGITS, "0"))
            .alias("__thr"),
        )
    )
    return (
        df.join(F.broadcast(thr), strata_col, "inner")
        .filter(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, _HEX_DIGITS) < F.col("__thr")
        )
        .select(*df.columns)
    )


def token_budget_sql_cte(
    strata_expr: str, token_expr: str, key_expr: str, budgets: dict[str, int], source: str
) -> str:
    """DuckDB twin of :func:`sample_to_token_budget` as a CTE body:
    same totals, same floor(rate*16^4) threshold, same md5 compare."""
    cases = " ".join(
        f"WHEN {strata_expr} = {_sql_str(s)} THEN {int(b)}" for s, b in budgets.items()
    )
    space = 1 << (4 * _HEX_DIGITS)
    return f"""
    tot AS (
        SELECT {strata_expr} AS __s, sum({token_expr}) AS __tot
        FROM {source} GROUP BY 1
    ),
    thr AS (
        SELECT __s,
               CASE WHEN CAST(floor(least((CASE {cases} END) * 1.0 / __tot, 1.0) * {space}) AS BIGINT) >= {space}
                    THEN 'g'
                    ELSE printf('%0{_HEX_DIGITS}x', CAST(floor(least((CASE {cases} END) * 1.0 / __tot, 1.0) * {space}) AS BIGINT))
               END AS __thr
        FROM tot
        WHERE CASE {cases} END IS NOT NULL
    ),
    kept AS (
        SELECT t.*
        FROM {source} t
        JOIN thr ON {strata_expr} = thr.__s
        WHERE substring(md5(CAST({key_expr} AS VARCHAR)), 1, {_HEX_DIGITS}) < thr.__thr
    )
    """


def pps_systematic_sample(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    n_picks: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Systematic probability-proportional-to-size sampling: walk the
    ``order_col``-ordered corpus, pick every row whose cumulative
    ``weight_col`` mass crosses a multiple of ``step = total DIV
    n_picks`` — the classic PPS design (heavy rows are picked with
    probability ∝ weight, tiny rows proportionally rarely) and fully
    deterministic integer arithmetic: a row is selected iff
    ``cum DIV step > (cum - w) DIV step``.

    Output = the selected rows plus two documented extra columns:
    ``cum_weight`` (the row's global end-of-row cumulative mass — the
    audit trail for WHY it was picked) and ``is_certainty`` (true when
    ``weight >= step``, i.e. the row spans at least one full stride).
    Certainty rows are emitted ONCE even when their weight spans
    several step boundaries, so heavily skewed weights can yield fewer
    than ``n_picks`` selections — the classic "certainty unit"
    under-selection of systematic PPS. Callers needing exactly
    ``n_picks`` should pre-split certainty rows (or re-run on the
    remainder with the certainty mass removed); this operator keeps
    the one-pass deterministic design and FLAGS the units instead.

    Scale: the global cumulative sum uses the same two-phase
    distributed prefix sum as ``packing.pack_documents_by_tokens`` —
    per-range-partition local cumsum, one O(#partitions) driver
    collect of partition totals, broadcast offsets back. No global
    sort, no single-partition window."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    # explicit hash repartition on _pid so the cumsum window's per-task
    # sort stays caller-bounded — see packing.pack_documents_by_tokens
    # (the x80/r9 window-exchange lesson)
    ranged = ranged.repartition(parts, "_pid")
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # lazy: the totals collect below materializes the blocks in the
    # same pass (see packing.pack_documents_by_tokens)
    local = ranged.withColumn("_cum_local", F.sum(weight_col).over(w)).localCheckpoint(
        eager=False
    )
    totals = (
        local.groupBy("_pid").agg(F.max("_cum_local").alias("_t")).orderBy("_pid").collect()
    )
    offsets, acc = {}, 0
    for r in totals:
        offsets[r["_pid"]] = acc
        acc += r["_t"]
    step = max(acc // max(n_picks, 1), 1)
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], ["_pid", "_offset"]
    )
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(
            "cum_weight", (F.col("_offset") + F.col("_cum_local")).cast("long")
        )
        .filter(
            F.expr(
                f"cum_weight DIV {step} > (cum_weight - {weight_col}) DIV {step}"
            )
        )
        .withColumn("is_certainty", F.col(weight_col) >= F.lit(step))
        .drop("_pid", "_cum_local", "_offset")
    )
