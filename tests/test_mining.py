"""Wave-8 mining/regression operators: line-level boilerplate dedup,
co-occurrence pair mining, exact-sufficient-statistics OLS, ntile
segmentation. The DuckDB oracle gate value-checks all four; these
tests pin the *semantic contracts* that the hash compare alone would
not explain on failure."""

from __future__ import annotations

from pyspark.sql import functions as F

from fintrack_etl_spark.queries import (
    T,
    ext_decile_stats,
    ext_regression_slope,
)
from fintrack_etl_spark.queries_ext import x40_line_dedup, x41_copurchase_pairs


def test_line_dedup_keeps_unique_drops_hot(spark, sf_dir):
    # Every doc: [text, footer, 'all rights reserved']. The two shared
    # footers + the universal line are hot (>=10% of docs) and must be
    # removed; the per-doc text and the %3==2 unique ref line survive.
    out = x40_line_dedup(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r["n_lines"] == 3
        expect = 2 if r["doc_id"] % 3 == 2 else 1
        assert r["n_kept"] == expect, (r["doc_id"], r["n_kept"])


def test_copurchase_pairs_counts_and_order(spark, sf_dir):
    rows = x41_copurchase_pairs(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    # canonical orientation + deterministic descending order
    counts = [r["n_orders_together"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r["part_a"] < r["part_b"] for r in rows)
    # recount the top pair straight from lineitem
    top = rows[0]
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n = (
        li.filter(F.col("l_partkey") == top["part_a"])
        .join(
            li.filter(F.col("l_partkey") == top["part_b"]),
            "l_orderkey",
        )
        .count()
    )
    assert n == top["n_orders_together"]


def test_regression_slope_matches_numpy_lstsq(spark, sf_dir):
    import numpy as np

    rows = ext_regression_slope(spark, sf_dir).collect()
    assert rows
    o = T(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).alias("x"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
    )
    pts = o.collect()
    for r in rows:
        xs = np.array([p["x"] for p in pts if p["o_orderpriority"] == r["o_orderpriority"]], dtype=float)
        ys = np.array([p["y"] for p in pts if p["o_orderpriority"] == r["o_orderpriority"]], dtype=float)
        slope, intercept = np.polyfit(xs, ys, 1)
        assert abs(r["slope_micro_cents_per_day"] / 1e6 - slope) < 1e-3
        assert abs(r["intercept_cents"] - intercept) < 2.0
        assert r["n_orders"] == len(xs)


def test_decile_stats_partition_is_total_and_ordered(spark, sf_dir):
    rows = {r["decile"]: r for r in ext_decile_stats(spark, sf_dir).collect()}
    assert set(rows) == set(range(1, 11))
    n_cust = T(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows.values()) == n_cust
    # ntile sizes differ by at most one; decile 1 holds the max spenders
    sizes = [rows[d]["n_customers"] for d in range(1, 11)]
    assert max(sizes) - min(sizes) <= 1
    for d in range(1, 10):
        assert rows[d]["min_cents"] >= rows[d + 1]["max_cents"]


def test_pagerank_integer_trajectory_invariants(spark, sf_dir):
    from fintrack_etl_spark.queries_ext import x42_pagerank

    rows = x42_pagerank(spark, sf_dir).collect()
    assert len(rows) == 20
    ranks = [r["rank_nano"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    # every rank >= the teleport floor; node ids carry the bipartite tag
    assert all(r["rank_nano"] >= 150000000 for r in rows)
    assert all(r["node"][0] in ("c", "s") for r in rows)
    # suppliers fan in from many customers -> the global hub is a supplier
    assert rows[0]["node"].startswith("s")


def test_canonical_pick_prefers_junk_free_original(spark, sf_dir):
    from fintrack_etl_spark.queries import T as table
    from fintrack_etl_spark.queries_ext import x43_canonical_pick

    rows = x43_canonical_pick(spark, sf_dir).collect()
    n_dupes = (
        table(spark, sf_dir, "documents").filter("doc_id % 5 = 0").count()
    )
    two = [r for r in rows if r["n_candidates"] == 2]
    assert len(two) == n_dupes
    # the junk-padded re-crawl (doc_id+100000) must never win
    assert all(r["keep_id"] < 100000 for r in two)
    assert all(r["n_candidates"] in (1, 2) for r in rows)


def test_span_coverage_recrawls_fully_covered(spark, sf_dir):
    from fintrack_etl_spark.queries_ext import x44_span_coverage

    rows = x44_span_coverage(spark, sf_dir).collect()
    assert rows
    by_id = {r["doc_id"]: r for r in rows}
    full = [r for r in rows if r["doc_id"] >= 100000]
    assert full
    for r in full:  # exact copies: every position covered
        assert r["n_covered"] == r["n_tokens"]
        assert r["covered_frac_nano"] == 1000000000
        orig = by_id[r["doc_id"] - 100000]
        assert orig["covered_frac_nano"] == 1000000000


def test_image_phash_locality_and_collision(spark, sf_dir):
    """dHash contract: exact re-crawl copies collide; a single-pixel
    perturbation flips at most 2 gradient bits (the two comparisons
    that touch the pixel)."""
    from fintrack_etl_spark.queries import T as table
    from fintrack_etl_spark.queries_ext import x45_image_phash_dedup

    rows = x45_image_phash_dedup(spark, sf_dir).collect()
    n_dupes = table(spark, sf_dir, "documents").filter("doc_id % 5 = 0").count()
    assert sum(r["n_copies"] - 1 for r in rows) >= n_dupes

    # locality: recompute two hashes by the same pixel rule in Python
    def dhash(s):
        px = [ord(c) % 256 for c in (s + "x" * 72)[:72]]
        return [
            sum(1 << c for c in range(8) if px[r * 9 + c] < px[r * 9 + c + 1])
            for r in range(8)
        ]

    base = "the quick brown fox jumps over the lazy dog again and again and again padpad"
    mut = base[:40] + chr(ord(base[40]) + 1) + base[41:]
    diff = sum(
        bin(a ^ b).count("1") for a, b in zip(dhash(base), dhash(mut))
    )
    assert diff <= 2


def test_bpe_merges_match_reference_trainer(spark, sf_dir):
    """Run classic dictionary BPE (Sennrich et al.) in plain Python on
    the same word-frequency dict and demand the identical 3 merges."""
    import re
    from collections import Counter

    from fintrack_etl_spark.queries import T as table
    from fintrack_etl_spark.queries_ext import x46_bpe_merges

    texts = [r["text"] for r in table(spark, sf_dir, "documents").select("text").collect()]
    words = Counter(
        w for t in texts for w in re.split(r"\s+", t.strip()) if len(w) >= 2
    )
    dic = {tuple(w): f for w, f in words.items()}
    expected = []
    for _ in range(3):
        pairs = Counter()
        for syms, f in dic.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((a, b, cnt))
        new = {}
        for syms, f in dic.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + "~" + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + f
        dic = new
    got = [
        (r["sym_a"], r["sym_b"], r["pair_count"])
        for r in x46_bpe_merges(spark, sf_dir).orderBy("round").collect()
    ]
    assert got == expected


def test_cusum_equals_sequential_recurrence(spark, sf_dir):
    """The drawup identity must reproduce Page's recurrence exactly."""
    from fintrack_etl_spark.queries import T as table
    from fintrack_etl_spark.queries import ext_cusum_changepoint

    daily = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority", F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r["o_orderpriority"], []).append((r["day"], r["cents"]))
    got = {r["o_orderpriority"]: r for r in ext_cusum_changepoint(spark, sf_dir).collect()}
    assert set(got) == set(series)
    for grp, pts in series.items():
        xs = [c for _, c in sorted(pts)]
        k = sum(xs) // len(xs)
        s = m = 0
        for x in xs:
            s = max(s + x - k, 0)
            m = max(m, s)
        assert got[grp]["max_cusum_cents"] == m
        assert got[grp]["target_cents"] == k
        assert got[grp]["n_days"] == len(xs)


def test_leakage_safe_split_never_straddles_duplicates(spark, sf_dir):
    from fintrack_etl_spark.queries_ext import x47_leakage_safe_split

    rows = {r["doc_id"]: r["split"] for r in x47_leakage_safe_split(spark, sf_dir).collect()}
    dupes = [d for d in rows if d >= 100000]
    assert dupes
    for d in dupes:  # exact copy must land with its original
        assert rows[d] == rows[d - 100000]
    assert {"train", "eval"} == set(rows.values())


def test_pps_sample_matches_sequential_walk(spark, sf_dir):
    """The distributed two-phase prefix sum must pick exactly the docs
    a sequential PPS walk picks."""
    from fintrack_etl_spark.queries import T as table
    from fintrack_etl_spark.queries_ext import ext_pps_token_sample

    toks = sorted(
        (r["doc_id"], r["n_tokens"])
        for r in table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
        )
        .collect()
    )
    total = sum(t for _, t in toks)
    step = max(total // 20, 1)
    cum, expect = 0, []
    for d, t in toks:
        cum += t
        if cum // step > (cum - t) // step:
            expect.append((d, t, cum))
    got = sorted(
        (r["doc_id"], r["n_tokens"], r["cum_tokens"])
        for r in ext_pps_token_sample(spark, sf_dir).collect()
    )
    assert got == expect
    # heavy docs are always picked when weight >= step
    for d, t in toks:
        if t >= step:
            assert d in {g[0] for g in got}


def test_corpus_datasheet_consistency(spark, sf_dir):
    from fintrack_etl_spark.queries import T as table
    from fintrack_etl_spark.queries_ext import x48_corpus_datasheet

    row = x48_corpus_datasheet(spark, sf_dir).collect()[0]
    n = table(spark, sf_dir, "documents").count()
    assert row["n_docs"] == n
    assert row["min_tokens"] <= row["p50_tokens"] <= row["max_tokens"]
    assert 0 <= row["dup_rate_nano"] <= 10**9
    assert 0 <= row["short_rate_nano"] <= 10**9
    assert row["total_chars"] >= row["total_tokens"]  # tokens are space-separated


def test_audio_segments_consistency(spark, sf_dir):
    from fintrack_etl_spark.queries import T as table
    from fintrack_etl_spark.queries_ext import x49_audio_segments

    rows = x49_audio_segments(spark, sf_dir).collect()
    n = table(spark, sf_dir, "documents").count()
    assert len(rows) == n
    for r in rows:
        assert 0 <= r["n_voiced"] <= r["n_samples"]
        # every segment needs at least one voiced sample; segments can't
        # outnumber voiced samples, and zero voiced means zero segments
        assert r["n_segments"] <= r["n_voiced"]
        assert (r["n_segments"] == 0) == (r["n_voiced"] == 0)
        assert r["duration_ms"] == r["n_samples"] * 1000 // 8000


def test_feature_hash_buckets_cover_all_features(spark, sf_dir):
    from fintrack_etl_spark.queries import T as table
    from fintrack_etl_spark.queries_ext import x50_feature_hash

    rows = x50_feature_hash(spark, sf_dir).collect()
    n_orders = table(spark, sf_dir, "orders").count()
    assert sum(r["n_rows"] for r in rows) == 2 * n_orders  # two features/row
    n_feats = sum(r["n_distinct_feats"] for r in rows)
    # 5 priorities + 3 statuses land in <= 8 buckets, no feature lost
    assert n_feats == 8
    assert all(0 <= r["bucket"] < 64 for r in rows)


def test_corpus_diff_partitions_docs(spark, sf_dir):
    from fintrack_etl_spark.queries import T as table
    from fintrack_etl_spark.queries_ext import ext_corpus_diff

    rows = {r["status"]: r["n_docs"] for r in ext_corpus_diff(spark, sf_dir).collect()}
    docs = [r["doc_id"] for r in table(spark, sf_dir, "documents").select("doc_id").collect()]
    in_a = {d for d in docs if d % 7 != 0}
    in_b = {d for d in docs if d % 5 != 1}
    assert rows.get("added", 0) == len(in_b - in_a)
    assert rows.get("removed", 0) == len(in_a - in_b)
    assert rows.get("changed", 0) == len({d for d in in_a & in_b if d % 11 == 0})
    assert rows.get("unchanged", 0) == len({d for d in in_a & in_b if d % 11 != 0})


def test_mixture_waterfill_invariants(spark, sf_dir):
    from fintrack_etl_spark.queries_ext import ext_mixture_waterfill

    rows = ext_mixture_waterfill(spark, sf_dir).collect()
    assert rows
    B = 30000
    total_avail = sum(r["avail_tokens"] for r in rows)
    got = sum(r["allocated_tokens"] for r in rows)
    assert got <= min(B, total_avail)
    for r in rows:
        assert 0 <= r["allocated_tokens"] <= r["avail_tokens"]
        assert r["monotone"]
        # a source thinner than its round-1 ask is fully consumed
        if r["want_tokens"] >= r["avail_tokens"]:
            assert r["allocated_tokens"] == r["avail_tokens"]
    # redistribution must move the leftover exactly per the two-round
    # spec: recompute round 2 sequentially and demand equality (no
    # "some growth" heuristic — integer flooring can legitimately
    # zero every extra when the leftover is tiny)
    leftover = max(
        B - sum(min(r["want_tokens"], r["avail_tokens"]) for r in rows), 0
    )
    unsat = sum(
        r["share_nano"] for r in rows if r["want_tokens"] < r["avail_tokens"]
    )
    for r in rows:
        got1 = min(r["want_tokens"], r["avail_tokens"])
        if got1 < r["avail_tokens"] and unsat > 0:
            expect = min(
                r["avail_tokens"], got1 + (r["share_nano"] * leftover) // unsat
            )
        else:
            expect = got1
        assert r["allocated_tokens"] == expect, (r["source"], r["allocated_tokens"], expect)


def test_association_rules_exact_metrics(spark):
    # 4 baskets: {a,b}, {a,b}, {a,c}, {b}
    # c_a=3, c_b=3, c_c=1, N=4; c(a→b)=2.
    from fintrack_etl_spark.operators.mining import association_rules

    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"),
    ]
    items = spark.createDataFrame(rows, ["basket", "item"])
    out = {
        (r["antecedent"], r["consequent"]): r
    for r in association_rules(items, "basket", "item").collect()}
    ab = out[("a", "b")]
    assert ab["pair_count"] == 2
    assert ab["support_ppm"] == 500000            # 2/4
    assert ab["confidence_milli"] == 666          # floor(2000/3)
    assert ab["lift_milli"] == 888                # floor(1000*2*4/9)
    ba = out[("b", "a")]
    assert ba["confidence_milli"] == 666 and ba["lift_milli"] == 888
    ac = out[("a", "c")]
    assert ac["confidence_milli"] == 333          # floor(1000/3)
    assert ac["lift_milli"] == 1333               # floor(1000*1*4/3)
    # directional universe only — no self-rules
    assert all(a != b for a, b in out)


def test_association_rules_min_count_and_dedup(spark):
    from fintrack_etl_spark.operators.mining import association_rules

    rows = [(1, "a"), (1, "a"), (1, "b")]  # duplicate (1,a) collapses
    items = spark.createDataFrame(rows, ["basket", "item"])
    out = association_rules(items, "basket", "item").collect()
    assert {r["pair_count"] for r in out} == {1}
    assert association_rules(items, "basket", "item", min_pair_count=2).count() == 0


def test_char_collision_arrow_matches_hof(spark):
    """x90's Arrow kernel must reproduce the original interpreted-HOF
    form exactly — including NULL text (NULL counts, ppm 1e6), empty
    text (0/0/1e6), repeated and astral characters."""
    rows = [
        (1, "aaabbc"),
        (2, ""),
        (3, None),
        (4, "x"),
        (5, "ababababab"),
        (6, "café \U0001f600\U0001f600"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    from fintrack_etl_spark.operators.quality import char_collision_batches
    from fintrack_etl_spark.similarity import _let

    got = {
        r["doc_id"]: (r["n_chars_counted"], r["n_distinct_chars"], r["collision_ppm"])
        for r in df.select("doc_id", "text")
        .mapInArrow(
            char_collision_batches,
            "doc_id long, n_chars_counted long, n_distinct_chars long, collision_ppm long",
        )
        .collect()
    }

    chars = F.expr("filter(split(text, ''), c -> c <> '')")

    def body(t):
        counts = F.transform(
            F.array_distinct(t),
            lambda c: F.size(F.filter(t, lambda x: x == c)).cast("long"),
        )
        return F.struct(
            F.size(t).cast("long").alias("n"),
            F.size(F.array_distinct(t)).cast("long").alias("nd"),
            F.aggregate(counts, F.lit(0).cast("long"), lambda a, x: a + x * x).alias("sq"),
        )

    want = {
        r["doc_id"]: (r["n"], r["nd"], r["ppm"])
        for r in df.select("doc_id", _let(chars, body).alias("s"))
        .select(
            "doc_id",
            F.col("s.n").alias("n"),
            F.col("s.nd").alias("nd"),
            F.when(
                F.col("s.n") > 0,
                F.expr(
                    "CAST(div(CAST(s.sq AS DECIMAL(38,0)) * 1000000, "
                    "CAST(s.n AS DECIMAL(38,0)) * s.n) AS BIGINT)"
                ),
            ).otherwise(F.lit(1000000)).alias("ppm"),
        )
        .collect()
    }
    assert got == want, (got, want)


def test_quality_counts_arrow_matches_jvm(spark):
    """x8's RE2 count kernel must reproduce textops.quality_features
    exactly — every Java-regex edge the docstring claims parity on:
    NULL/empty/whitespace-only text, leading/trailing separators
    (Java split keeps trailing empties), vertical tab (\\x0b is Java
    \\s but not RE2 \\s), punctuation-adjacent and hyphen-split
    stopwords (\\b at non-word chars), alternation-prefix words
    ("android" must not count), unicode letters and astral chars
    (codepoint length + non-word for \\b), and a 12-token doc that
    crosses the "good" label threshold."""
    rows = [
        (1, "the cat and the dog, in a box!"),
        (2, ""),
        (3, None),
        (4, "   "),
        (5, "\tx y\t"),
        (6, "a b\x0bc"),
        (7, "android is-land the,and"),
        (8, "café ÀÉ the \U0001f600"),
        (9, "the and of to in a is the and of to in"),
        (10, "word " * 9 + "the"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    from fintrack_etl_spark import textops as TX
    from fintrack_etl_spark.operators.quality import quality_count_batches

    counts = df.select("doc_id", "text").mapInArrow(
        quality_count_batches,
        "doc_id bigint, n_tokens bigint, n_stopwords bigint, "
        "n_punct bigint, n_nospace bigint, n_len bigint",
    )
    t = F.col("text")
    jvm_counts = df.select(
        "doc_id",
        TX.token_count(t).cast("long").alias("n_tokens"),
        TX.stopword_count(t, "en").cast("long").alias("n_stopwords"),
        TX.pattern_count(t, r"[^A-Za-z0-9\s]").cast("long").alias("n_punct"),
        F.length(F.regexp_replace(t, r"\s", "")).cast("long").alias("n_nospace"),
        F.length(t).cast("long").alias("n_len"),
    )
    got = {r["doc_id"]: tuple(r) for r in counts.collect()}
    want = {r["doc_id"]: tuple(r) for r in jvm_counts.collect()}
    assert got == want, (got, want)

    # Full-pipeline equality on the rows where the original is defined
    # (ANSI div by n_len/n_tokens=0 crashes BOTH forms identically on
    # empty text — the ratio stage is shared code either way).
    cols = [
        "doc_id", "n_tokens", "n_stopwords", "stop_ratio",
        "punct_ratio", "avg_token_len", "quality_label",
    ]
    safe = [1, 3, 4, 5, 6, 7, 8, 9, 10]  # all but the n_len=0 row
    got2 = {
        r["doc_id"]: tuple(r)
        for r in TX.quality_ratio_select(counts.filter(F.col("doc_id").isin(safe)))
        .select(*cols).collect()
    }
    want2 = {
        r["doc_id"]: tuple(r)
        for r in TX.quality_features(df.filter(F.col("doc_id").isin(safe)))
        .select(*cols).collect()
    }
    assert got2 == want2, (got2, want2)
