"""Deterministic stratified sampling + incremental aggregate merge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fintrack_etl_spark.io import table
from fintrack_etl_spark.operators.incremental import (
    finalize_aggregate,
    merge_aggregate_state,
    partial_aggregate,
)
from fintrack_etl_spark.operators.sampling import (
    rate_threshold_hex,
    stratified_sample,
    stratified_sample_sql_predicate,
)

RATES = {"en": 0.25, "zh": 0.5, "de": 1.0}


def test_rate_threshold_endpoints():
    assert rate_threshold_hex(0.0) == "0000"
    assert rate_threshold_hex(1.0) == "g"  # sorts after every hex prefix
    assert rate_threshold_hex(0.5) == "8000"
    with pytest.raises(ValueError):
        rate_threshold_hex(1.5)


def test_rate_threshold_tiny_positive_clamps_to_one_bucket():
    """ADVICE r10 (medium): a POSITIVE rate must never underflow to the
    keep-nothing threshold — the sampled-Lloyd cap/n at extreme N
    (n > cap·2¹⁷ at 4 digits) previously got '0000' and trained on an
    EMPTY set. rate == 0.0 keeps meaning keep-nothing exactly."""
    assert rate_threshold_hex(1e-12) == "0001"  # clamped, not "0000"
    assert rate_threshold_hex(1e-12, digits=8) == "00000001"
    assert rate_threshold_hex(0.0) == "0000"  # exact zero unchanged
    assert rate_threshold_hex(0.0, digits=8) == "00000000"
    # the sampled-Lloyd regime: cap/n at n ≈ 537M × cap — 8 digits keep
    # a real, nonzero slice where 4 digits rounded to nothing
    rate = 4096 / (4096 * (1 << 17))
    assert rate_threshold_hex(rate, digits=8) > "00000000"


def test_stratified_sample_membership_is_deterministic(spark, sf_dir):
    docs = table(spark, "documents", sf_dir)
    a = stratified_sample(docs, spark, "lang", "doc_id", RATES, 0.1)
    b = stratified_sample(docs, spark, "lang", "doc_id", RATES, 0.1)
    ids_a = {r["doc_id"] for r in a.select("doc_id").collect()}
    ids_b = {r["doc_id"] for r in b.select("doc_id").collect()}
    assert ids_a == ids_b and ids_a


def test_stratified_sample_rates_and_schema(spark, sf_dir):
    docs = table(spark, "documents", sf_dir)
    kept = stratified_sample(docs, spark, "lang", "doc_id", RATES, 0.1)
    assert kept.columns == docs.columns  # threshold column dropped
    got = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    base = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got.get("de", 0) == base["de"]  # rate 1.0 keeps everything
    # md5 is uniform: realized rates land near targets (loose bounds at
    # fixture sizes)
    for lang, rate in (("en", 0.25), ("zh", 0.5)):
        realized = got.get(lang, 0) / base[lang]
        assert abs(realized - rate) < 0.25
    # strata not in the rate table fall back to the default
    assert got.get("fr", 0) <= 0.5 * base["fr"]


def test_stratified_sql_predicate_matches_engine(spark, sf_dir):
    import duckdb

    docs = table(spark, "documents", sf_dir)
    kept = stratified_sample(docs, spark, "lang", "doc_id", RATES, 0.1)
    spark_ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    pred = stratified_sample_sql_predicate("lang", "doc_id", RATES, 0.1)
    p = f"{sf_dir}/documents.parquet"
    duck_ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{p}') WHERE {pred} ORDER BY doc_id"
        ).fetchall()
    ]
    assert spark_ids == duck_ids


def _as_dict(df, keys=("event_type",)):
    return {tuple(r[k] for k in keys): (r["n"], round(r["total"], 2)) for r in df.collect()}


def test_merge_equals_from_scratch(spark, sf_dir):
    ev = table(spark, "events", sf_dir)
    history = ev.filter(F.col("event_id") % 5 != 0)
    delta = ev.filter(F.col("event_id") % 5 == 0)
    merged = merge_aggregate_state(
        partial_aggregate(history, ["event_type"], "value"),
        partial_aggregate(delta, ["event_type"], "value"),
        ["event_type"],
    )
    scratch = partial_aggregate(ev, ["event_type"], "value")
    assert _as_dict(finalize_aggregate(merged, ["event_type"])) == _as_dict(
        finalize_aggregate(scratch, ["event_type"])
    )


def test_merge_empty_delta_is_identity(spark, sf_dir):
    ev = table(spark, "events", sf_dir)
    state = partial_aggregate(ev, ["event_type"], "value")
    empty = partial_aggregate(ev.filter(F.lit(False)), ["event_type"], "value")
    merged = merge_aggregate_state(state, empty, ["event_type"])
    assert _as_dict(finalize_aggregate(merged, ["event_type"])) == _as_dict(
        finalize_aggregate(state, ["event_type"])
    )


def test_merge_introduces_new_keys(spark):
    state = partial_aggregate(
        spark.createDataFrame([("a", 1.0), ("a", 3.0)], ["k", "v"]), ["k"], "v"
    )
    delta = partial_aggregate(
        spark.createDataFrame([("b", 5.0)], ["k", "v"]), ["k"], "v"
    )
    merged = {r["k"]: (r["n"], r["total"], r["min_v"], r["max_v"])
              for r in merge_aggregate_state(state, delta, ["k"]).collect()}
    assert merged == {"a": (2, 4.0, 1.0, 3.0), "b": (1, 5.0, 5.0, 5.0)}


# ---------------------------------------------------------------------------
# Row-level quality expectations
# ---------------------------------------------------------------------------


def _exps():
    from fintrack_etl_spark.operators.quality import Expectation

    return [
        Expectation("value_nonneg", F.col("value").isNotNull() & (F.col("value") >= 0)),
        Expectation("known_type", F.col("event_type").isin("view", "click", "purchase", "signup")),
        Expectation("user_present", F.col("user_id").isNotNull()),
    ]


def test_quality_split_partitions_rows(spark, sf_dir):
    from fintrack_etl_spark.operators.quality import split_by_expectations

    ev = table(spark, "events", sf_dir)
    good, bad = split_by_expectations(ev, _exps())
    assert good.count() + bad.count() == ev.count()
    assert good.columns == ev.columns
    # every quarantined row names at least one violated rule
    assert bad.filter(F.size("violations") == 0).count() == 0
    # 'error' events are quarantined with the right tag
    err = bad.filter(F.col("event_type") == "error")
    assert err.count() > 0
    assert err.filter(~F.array_contains("violations", "known_type")).count() == 0


def test_quality_audit_counts_match_split(spark, sf_dir):
    from fintrack_etl_spark.operators.quality import quality_audit, split_by_expectations

    ev = table(spark, "events", sf_dir)
    audit = quality_audit(ev, _exps()).first()
    good, bad = split_by_expectations(ev, _exps())
    assert audit["n_rows"] == ev.count()
    assert audit["n_clean"] == good.count()
    assert audit["viol_known_type"] == ev.filter(
        ~F.col("event_type").isin("view", "click", "purchase", "signup")
        | F.col("event_type").isNull()
    ).count()


def test_quality_null_predicate_is_violation(spark):
    from fintrack_etl_spark.operators.quality import Expectation, drop_failed, quality_audit

    df = spark.createDataFrame([(1.0,), (None,), (-2.0,)], "v double")
    exps = [Expectation("nonneg", F.col("v") >= 0)]  # NULL -> NULL -> violation
    audit = quality_audit(df, exps).first()
    assert (audit["n_rows"], audit["n_clean"], audit["viol_nonneg"]) == (3, 1, 2)
    assert drop_failed(df, exps).count() == 1


# ---------------------------------------------------------------------------
# Schema-evolving MERGE
# ---------------------------------------------------------------------------


def test_merge_evolving_overlapping_keys_and_backfill(spark):
    from fintrack_etl_spark.operators.upsert import merge_latest_wins_evolving

    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10)], ["k", "v", "dt"]
    )
    source = spark.createDataFrame(
        [(2, "b2", 20, "extra2"), (3, "c", 20, "extra3")], ["k", "v", "dt", "new_col"]
    )
    out = {
        r["k"]: (r["v"], r["dt"], r["new_col"])
        for r in merge_latest_wins_evolving(target, source, ["k"], "dt").collect()
    }
    # fresher source wins key 2; untouched key 1 keeps NULL in the new
    # column (ALTER TABLE ADD COLUMN semantics); new key 3 inserts
    assert out == {1: ("a", 10, None), 2: ("b2", 20, "extra2"), 3: ("c", 20, "extra3")}
    # stale source must NOT overwrite (target wins ties and fresher rows)
    stale = spark.createDataFrame([(1, "a_stale", 5, "x")], ["k", "v", "dt", "new_col"])
    out2 = {
        r["k"]: r["v"]
        for r in merge_latest_wins_evolving(target, stale, ["k"], "dt").collect()
    }
    assert out2[1] == "a"


def test_cluster_write_partitioned_layout(spark, sf_dir, tmp_path):
    from fintrack_etl_spark.operators.layout import cluster_write

    li = table(spark, "lineitem", sf_dir).withColumn(
        "rf", F.col("l_returnflag")
    )
    path = str(tmp_path / "zpart")
    cluster_write(
        li, ["l_partkey", "l_suppkey"], path, n_files=8, partition_by=["rf"]
    )
    back = spark.read.parquet(path)
    assert back.count() == li.count()
    # hive-style partition dirs exist and partition pruning composes
    # with the clustered layout
    import glob as _glob

    assert _glob.glob(f"{path}/rf=*"), "expected hive-partitioned output"
    one = back.filter(F.col("rf") == "R").count()
    assert one == li.filter(F.col("l_returnflag") == "R").count()


# ---------------------------------------------------------------------------
# HLL incremental distinct + repetition filters
# ---------------------------------------------------------------------------


def test_distinct_state_merge_is_idempotent_and_accurate(spark, sf_dir):
    from fintrack_etl_spark.operators.incremental import (
        finalize_distinct,
        merge_distinct_state,
        partial_distinct_state,
    )

    ev = table(spark, "events", sf_dir)
    history = ev.filter(F.col("event_id") % 5 != 0)
    delta = ev.filter(F.col("event_id") % 5 == 0)
    d_state = partial_distinct_state(delta, ["event_type"], "user_id")
    merged = merge_distinct_state(
        partial_distinct_state(history, ["event_type"], "user_id"), d_state, ["event_type"]
    )
    # replaying the SAME delta must not move the estimate (register max
    # is idempotent) - the property the sum-merge state lacks
    replayed = merge_distinct_state(merged, d_state, ["event_type"])
    est = {r["event_type"]: r["approx_nd"] for r in finalize_distinct(merged, ["event_type"]).collect()}
    est2 = {r["event_type"]: r["approx_nd"] for r in finalize_distinct(replayed, ["event_type"]).collect()}
    assert est == est2
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    for k, v in exact.items():
        assert abs(est[k] - v) / v <= 0.05


def test_repetition_features_flags_constructed_docs(spark):
    from fintrack_etl_spark.textops import repetition_features

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),              # one bigram dominates
            (2, "line one\nline one\nline one\nline two"),     # duplicate lines
            (3, "a perfectly normal sentence with varied words here"),
            (4, "single"),                                     # degenerate: no bigrams
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repetition_features(docs).collect()}
    assert out[1]["repetitive"] and out[1]["top_bigram_ratio"] == 1.0
    assert out[2]["repetitive"] and out[2]["dup_line_ratio"] == 0.5
    assert not out[3]["repetitive"]
    assert out[4]["top_bigram_ratio"] == 0.0 and not out[4]["repetitive"]
    assert set(out) == {1, 2, 3, 4}  # degenerate docs are kept, not dropped


def test_merge_preserves_null_total_for_all_null_groups(spark):
    """sum() over only-NULL values is NULL; the merge must not
    manufacture 0.0 where from-scratch aggregation says NULL."""
    state = partial_aggregate(
        spark.createDataFrame([("a", None), ("a", None)], "k string, v double"), ["k"], "v"
    )
    delta = partial_aggregate(
        spark.createDataFrame([("a", None), ("b", 1.0)], "k string, v double"), ["k"], "v"
    )
    merged = {r["k"]: (r["n"], r["total"]) for r in merge_aggregate_state(state, delta, ["k"]).collect()}
    assert merged["a"] == (3, None)
    assert merged["b"] == (1, 1.0)


def test_sql_predicate_escapes_quoted_strata(spark):
    """Stratum names are data: an embedded single quote must render as a
    valid SQL literal (''), not truncate the oracle predicate."""
    import duckdb

    from fintrack_etl_spark.operators.sampling import (
        stratified_sample,
        stratified_sample_sql_predicate,
    )

    rates = {"o'brien": 0.5, "plain": 1.0}
    df = spark.createDataFrame(
        [(i, "o'brien" if i % 2 else "plain") for i in range(200)], ["k", "s"]
    )
    kept = {r.k for r in stratified_sample(df, spark, "s", "k", rates).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(range(200)) AS k")
    con.execute("UPDATE t SET k = k")  # no-op, table exists
    pred = stratified_sample_sql_predicate("s", "k", rates)
    oracle = {
        r[0]
        for r in con.execute(
            "SELECT k FROM (SELECT k, CASE WHEN k % 2 = 1 THEN 'o''brien' "
            f"ELSE 'plain' END AS s FROM t) WHERE {pred}"
        ).fetchall()
    }
    assert kept == oracle and len(kept) > 0


def test_drawup_state_merge_associative_and_exact(spark):
    """Random integer series, arbitrary 3-way chunking: chained merges
    must equal the from-scratch sequential drawup, for every split."""
    import random

    from fintrack_etl_spark.operators.incremental import (
        merge_drawup_state,
        partial_drawup_state,
    )

    rng = random.Random(13)
    xs = [rng.randint(-50, 60) for _ in range(40)]

    def seq_drawup(series):
        p = m = best = 0
        for x in series:
            p += x
            best = max(best, p - m)
            m = min(m, p)
        return best

    expect = seq_drawup(xs)
    rows = [("k", i, x) for i, x in enumerate(xs)]
    for a, b in ((7, 19), (1, 39), (20, 21), (13, 30)):
        chunks = [rows[:a], rows[a:b], rows[b:]]
        states = [
            partial_drawup_state(
                spark.createDataFrame(c, ["k", "i", "x"]), ["k"], "i", "x"
            )
            for c in chunks
            if c
        ]
        st = states[0]
        for s in states[1:]:
            st = merge_drawup_state(st, s, ["k"])
        got = st.collect()[0]
        assert got["du_d"] == expect, (a, b, got["du_d"], expect)
        assert got["du_s"] == sum(xs)


def test_drawup_state_empty_side_merge(spark):
    from fintrack_etl_spark.operators.incremental import (
        merge_drawup_state,
        partial_drawup_state,
    )

    full = partial_drawup_state(
        spark.createDataFrame([("k", 0, 5), ("k", 1, -9), ("k", 2, 7)], ["k", "i", "x"]),
        ["k"], "i", "x",
    )
    empty = partial_drawup_state(
        spark.createDataFrame([], "k string, i int, x long"), ["k"], "i", "x"
    )
    for merged in (
        merge_drawup_state(full, empty, ["k"]),
        merge_drawup_state(empty, full, ["k"]),
    ):
        r = merged.collect()[0]
        assert (r["du_s"], r["du_d"]) == (3, 7)


def test_pps_flags_certainty_units_and_documents_underselection(spark):
    """ADVICE r3: a row whose weight spans multiple step boundaries is
    emitted once (so skew can under-select vs n_picks) but must carry
    is_certainty=true; light rows carry false; cum_weight is public."""
    from fintrack_etl_spark.operators.sampling import pps_systematic_sample

    # total = 1000, n_picks = 10 -> step = 100; the 550-weight whale
    # spans 5 boundaries but is one row
    rows = [("whale", 550)] + [(f"d{i}", 45) for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    out = pps_systematic_sample(df, "doc_id", "w", n_picks=10).collect()
    assert 0 < len(out) < 10  # under-selection, documented behavior
    by_id = {r["doc_id"]: r for r in out}
    assert by_id["whale"]["is_certainty"] is True
    assert all(
        r["is_certainty"] is False for r in out if r["doc_id"] != "whale"
    )
    assert all(r["cum_weight"] >= r["w"] for r in out)


def test_count_min_merge_equals_single_pass_and_never_undercounts(spark):
    import random

    from fintrack_etl_spark.operators.incremental import (
        count_min_estimate,
        count_min_state,
        merge_count_min_state,
    )

    rng = random.Random(7)
    vals = [rng.randint(0, 30) for _ in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], ["k"])
    whole = count_min_state(df, "k")
    # arbitrary 3-way chunking merges to the SAME grid (commutative)
    a = spark.createDataFrame([(v,) for v in vals[:100]], ["k"])
    b = spark.createDataFrame([(v,) for v in vals[100:350]], ["k"])
    c = spark.createDataFrame([(v,) for v in vals[350:]], ["k"])
    merged = merge_count_min_state(
        merge_count_min_state(count_min_state(c, "k"), count_min_state(a, "k")),
        count_min_state(b, "k"),
    )
    key = lambda df_: sorted(tuple(r) for r in df_.collect())
    assert key(merged) == key(whole)

    from collections import Counter

    exact = Counter(vals)
    probes = spark.createDataFrame([(k,) for k in exact], ["k"])
    est = {r["k"]: r["cm_estimate"] for r in count_min_estimate(probes, merged, "k").collect()}
    for k, n in exact.items():
        assert est[k] >= n  # one-sided guarantee, always


def test_count_min_join_size_upper_bounds_true_size(spark):
    import random
    from collections import Counter

    from fintrack_etl_spark.operators.incremental import (
        count_min_join_size,
        count_min_state,
    )

    rng = random.Random(21)
    left = [rng.randint(0, 40) for _ in range(400)]
    right = [rng.randint(20, 60) for _ in range(300)]
    la, rb = Counter(left), Counter(right)
    true_size = sum(la[k] * rb[k] for k in la if k in rb)

    sa = count_min_state(spark.createDataFrame([(v,) for v in left], ["k"]), "k")
    sb = count_min_state(spark.createDataFrame([(v,) for v in right], ["k"]), "k")
    est = count_min_join_size(sa, sb)
    assert est >= true_size  # one-sided, always
    # and it is a USEFUL bound at this width (not the trivial |A|x|B|)
    assert est < len(left) * len(right) / 4

    # disjoint key ranges with disjoint buckets would estimate low;
    # verify the exact-join cross-check on a shared-key slice
    exact_join = (
        spark.createDataFrame([(v,) for v in left], ["k"])
        .join(spark.createDataFrame([(v,) for v in right], ["k"]), "k")
        .count()
    )
    assert exact_join == true_size


def test_count_min_guards_and_duplicates(spark):
    """Review regressions: mismatched grids must REFUSE (not silently
    undercount), duplicate probe keys pass through row for row, and
    disjoint inputs estimate a zero join size."""
    import pytest as _pytest

    from fintrack_etl_spark.operators.incremental import (
        count_min_estimate,
        count_min_join_size,
        count_min_state,
        merge_count_min_state,
    )

    df = spark.createDataFrame([(v,) for v in (1, 1, 2)], ["k"])
    s64 = count_min_state(df, "k", width=64)
    s128 = count_min_state(df, "k", width=128)
    # lazily validated (no job per merge): the refusal surfaces at
    # action time, raised from inside the merged plan
    with _pytest.raises(Exception, match="mixed Count-Min dimensions"):
        merge_count_min_state(s64, s128).collect()
    with _pytest.raises(ValueError, match="grids disagree|mixed"):
        count_min_join_size(s64, s128)

    # duplicate probes: one output row per input row, correct estimates
    probes = spark.createDataFrame([(1,), (1,), (2,)], ["k"])
    out = count_min_estimate(probes, s64, "k").collect()
    assert len(out) == 3
    assert sorted((r["k"], r["cm_estimate"] >= {1: 2, 2: 1}[r["k"]]) for r in out) == [
        (1, True), (1, True), (2, True)
    ]

    # disjoint keys whose buckets never collide: estimate must be 0
    # (zero-dot sketch rows participate in the min)
    a = count_min_state(spark.createDataFrame([(1,)], ["k"]), "k")
    b = count_min_state(spark.createDataFrame([(2,)], ["k"]), "k")
    est = count_min_join_size(a, b)
    exact = 0
    assert est >= exact
    # with one key per side and 4 rows of width 64, at least one row
    # separates them overwhelmingly often; accept either but demand
    # the zero-dot path works when buckets differ in ANY row
    rows_a = {(r["sketch_row"], r["bucket"]) for r in a.collect()}
    rows_b = {(r["sketch_row"], r["bucket"]) for r in b.collect()}
    if not (rows_a & rows_b):
        assert est == 0
