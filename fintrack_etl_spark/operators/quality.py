"""Row-level data-quality expectations — audit, drop, or quarantine.

Extends the reference's run-level auditing (``_summary.json`` status
per file, ``_ERROR.txt`` quarantine — ``extract_movimentacoes_folder
.py:318-343``; see SURVEY.md §5) down to row granularity, the way a
lakehouse expectations framework (Delta Live Tables' expect/
expect_or_drop/expect_or_fail) treats constraints as data, not asserts.

Scale design: every expectation is a native boolean Column; the audit
is ONE aggregate over sums of casts (map-side combined, no shuffle of
facts beyond the final 1-row reduce), and the good/bad split reuses a
single ``violations`` array column, so the corpus is scanned once
however many rules there are. Nothing ever collects rows to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """A named row-level constraint: the row PASSES iff ``predicate``
    evaluates true (NULL counts as a violation — unknown is not
    compliant, matching SQL CHECK semantics would instead pass NULLs;
    we choose the strict reading because quality rules exist to catch
    exactly the NULL-shaped rot)."""

    name: str
    predicate: Column


def _passes(e: Expectation) -> Column:
    return F.coalesce(e.predicate, F.lit(False))


def violations_column(expectations: list[Expectation], alias: str = "violations") -> Column:
    """Array of names of the expectations this row violates (empty
    array = clean row)."""
    tagged = [F.when(~_passes(e), F.lit(e.name)) for e in expectations]
    arr = F.array(*tagged)
    return F.filter(arr, lambda x: x.isNotNull()).alias(alias)


def quality_audit(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """One-row audit: total rows, clean rows, and one violation count
    per expectation — a single aggregate pass (the row-level analog of
    the reference's per-run ``_summary.json``)."""
    viol_counts = [
        F.sum(F.when(~_passes(e), 1).otherwise(0)).cast("long").alias(f"viol_{e.name}")
        for e in expectations
    ]
    all_pass = F.lit(True)
    for e in expectations:
        all_pass = all_pass & _passes(e)
    clean = F.sum(F.when(all_pass, 1).otherwise(0)).cast("long")
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        clean.alias("n_clean"),
        *viol_counts,
    )


def split_by_expectations(
    df: DataFrame, expectations: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """(clean rows, quarantined rows + ``violations`` array) — the
    expect_or_quarantine action. Both sides derive from one plan over
    one scan; write the bad side next to the good table the way the
    reference lands ``.bad`` quarantine files."""
    tagged = df.withColumn("violations", violations_column(expectations))
    good = tagged.filter(F.size("violations") == 0).drop("violations")
    bad = tagged.filter(F.size("violations") > 0)
    return good, bad


def drop_failed(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """expect_or_drop: keep only rows passing every expectation."""
    cond = None
    for e in expectations:
        p = _passes(e)
        cond = p if cond is None else (cond & p)
    return df.filter(cond) if cond is not None else df


def winsorize(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    p_low: float = 0.05,
    p_high: float = 0.95,
) -> DataFrame:
    """Per-group winsorization: clamp ``value_col`` into the group's
    [p_low, p_high] exact interpolated percentile band — the standard
    outlier treatment before averaging noisy metrics. Returns the
    input rows plus ``w_lo``/``w_hi`` (the group's clamp bounds,
    floor/ceil to integers so downstream sums stay exact) and
    ``w_value`` (the clamped value).

    Integer discipline: bounds come from exact percentiles of the raw
    values but are floored/ceiled to whole units, so the clamped
    column is integer-valued whenever the input is — BIGINT sums of
    winsorized values are then bit-identical across engines (the
    ext_percentiles/x24 stance: never aggregate engine-divergent
    floats).

    Scale: one grouped percentile pass (a grouped sort by
    construction — swap in approx_percentile for the sketch path at
    100 TB, same plan shape) producing a |groups|-row bounds table
    that BROADCASTS back onto the facts; the clamp itself is a map.
    """
    pct = F.expr(f"percentile({value_col}, array({p_low}D, {p_high}D))")
    bounds = df.groupBy(*keys).agg(
        F.floor(pct[0]).cast("long").alias("w_lo"),
        F.ceil(pct[1]).cast("long").alias("w_hi"),
    )
    return df.join(F.broadcast(bounds), keys).withColumn(
        "w_value",
        F.least(F.greatest(F.col(value_col), F.col("w_lo")), F.col("w_hi")).cast(
            "long"
        ),
    )


def distribution_drift_tvd(
    df: DataFrame,
    part_col: str,
    bucket: Column,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Distribution drift per partition value: total variation
    distance between each partition's bucket histogram and the
    GLOBAL histogram, in exact integer ``scale`` units — the
    corpus-monitoring table ("which source drifted this snapshot")
    a training-data pipeline alerts on.

    TVD = ½ Σ_i |p_i − q_i| with p_i = c_i/N_part, q_i = g_i/N_glob
    is computed as ``Σ|c_i·N_glob − g_i·N_part| · scale DIV
    (2·N_part·N_glob)`` — all-integer cross-multiplication, no float
    division until never: engines agree bit-for-bit. (The cross
    products need BIGINT headroom: fine through ~1e9 rows per side;
    beyond that pre-scale the histograms.)

    Buckets missing from a partition contribute |0·N_g − g_i·N_p|;
    the dense part x global-bucket grid (broadcast cross join with
    the |buckets|-row global histogram, zero-filled left join) keeps
    them. Unlike PSI/KL there is no log —
    TVD is bounded [0, 1], metric, and exactly portable.

    Scale: one (part, bucket) groupBy, one |buckets|-row global
    aggregate broadcast back, one per-part reduce. Nothing touches
    row data twice."""
    binned = df.select(F.col(part_col).alias("part"), bucket.alias("bucket"))
    per = binned.groupBy("part", "bucket").agg(F.count(F.lit(1)).alias("c"))
    glob = binned.groupBy("bucket").agg(F.count(F.lit(1)).alias("g"))
    n_part = per.groupBy("part").agg(F.sum("c").alias("n_part"))
    n_glob = glob.agg(F.sum("g").alias("n_glob"))
    # every (part, bucket-in-global) cell, zero-filled
    cells = (
        n_part.crossJoin(F.broadcast(glob))
        .join(per, ["part", "bucket"], "left")
        .withColumn("c", F.coalesce("c", F.lit(0)))
        .crossJoin(F.broadcast(n_glob))
    )
    return (
        cells.groupBy("part", "n_part", "n_glob")
        .agg(
            F.sum(
                F.abs(F.col("c") * F.col("n_glob") - F.col("g") * F.col("n_part"))
            ).alias("num")
        )
        .select(
            F.col("part"),
            F.col("n_part").cast("long").alias("n_rows"),
            F.expr(f"(num * CAST({scale} AS BIGINT)) DIV (2 * n_part * n_glob)")
            .cast("long")
            .alias("tvd_nano"),
        )
    )


def discover_fds(df: DataFrame, cols: list[str]) -> DataFrame:
    """Extension — pairwise functional-dependency discovery (the
    profiling primitive behind key detection and normalization
    advice): for every ordered column pair (A, B), does A -> B hold,
    and how many A-groups violate it?

    ONE scan, one shuffle: each row explodes into |pairs| tagged
    (lhs, rhs, a_value, b_value) tuples, the distinct-B count per
    (pair, a_value) is a map-side-combined aggregate, and the verdict
    per pair is a second tiny aggregate over group counts. Values are
    cast to string so the exploded array is uniformly typed (the
    casts are injective for the integer/string columns this is meant
    for — don't feed doubles). The |pairs|-x fanout is the documented
    cost: at very wide tables, refute cheap on a sample first and
    re-verify only the surviving pairs with this exact pass.

    Output: (lhs, rhs, n_groups, n_violating, holds) — ``holds`` iff
    no lhs-group maps to two distinct rhs values.
    """
    pairs = [(a, b) for a in cols for b in cols if a != b]
    tagged = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("lhs"),
                        F.lit(b).alias("rhs"),
                        F.col(a).cast("string").alias("av"),
                        F.col(b).cast("string").alias("bv"),
                    )
                    for a, b in pairs
                ]
            )
        ).alias("p")
    ).select("p.*")
    per_group = tagged.groupBy("lhs", "rhs", "av").agg(
        F.countDistinct("bv").alias("_d")
    )
    return per_group.groupBy("lhs", "rhs").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("_d") > 1, 1).otherwise(0)).alias("n_violating"),
    ).withColumn("holds", F.col("n_violating") == 0)


def quality_count_batches(batches):
    """x8 kernel — the five integer quality counts over Arrow batches.

    Replaces five JVM regex passes per row (token split,
    stopword/punct ``regexp_extract_all``, whitespace
    ``regexp_replace``) with RE2-backed vectorized
    ``pyarrow.compute.count_substring_regex`` calls — one C++ pass per
    count over the whole batch, no per-row regex-machinery re-entry.
    Emits EXACTLY the integers ``textops.quality_features`` derives;
    the ratio/label arithmetic stays in native Columns on top, so the
    downstream math is bit-identical by construction.

    Java-regex parity notes (pinned by
    ``test_quality_counts_arrow_matches_jvm``):

    - Java ``\\s`` is ASCII ``[ \\t\\n\\x0b\\f\\r]`` while RE2's ``\\s``
      lacks ``\\x0b`` — every class below spells the six chars out.
    - ``n_tokens`` replicates ``size(split(trim(text), '\\s+'))`` with
      Java ``split(..., -1)`` semantics (leading separator emits a
      leading empty token, trailing empties are KEPT):
      #non-ws runs + leading-ws + trailing-ws, with the empty-trimmed
      string pinned to 1 (``"".split`` → ``[""]``).
    - ``\\b`` is ASCII-word-boundary in both engines (Java default
      ``\\w`` and RE2 ``\\b`` are both ``[0-9A-Za-z_]``), and both
      count non-overlapping leftmost matches, so the stopword
      alternation (kept in the exact original order) matches the same
      word set.
    - KNOWN LIMIT (ADVICE r11): the stopword count lowercases with
      pyarrow's utf8proc (``pc.utf8_lower``) while the JVM form uses
      Java ``toLowerCase``; the two case mappings disagree on a few
      locale-sensitive/special codepoints (e.g. U+0130 LATIN CAPITAL
      LETTER I WITH DOT ABOVE — utf8proc maps it to a single 'i',
      Java to "i̇" with a combining dot), which can shift an ASCII
      ``\\b`` boundary adjacent to such a codepoint and change the
      count on exotic Unicode text. The stopword alternation and both
      fixtures are pure ASCII, where the mappings agree exactly; the
      parity pytest pins that class.
    - NULL text propagates NULL counts through every ``pc`` call,
      matching the JVM NULL flow (ratios NULL, label "low_quality"
      via the CASE fall-through downstream).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    ws = " \\t\\n\\x0b\\f\\r"  # Java \s, spelled out for RE2
    for b in batches:
        t = b.column("text")
        trimmed = pc.utf8_trim(t, " ")  # Spark trim strips spaces only
        runs = pc.count_substring_regex(trimmed, f"[^{ws}]+")
        lead = pc.match_substring_regex(trimmed, f"^[{ws}]")
        trail = pc.match_substring_regex(trimmed, f"[{ws}]$")
        n_tokens = pc.add_checked(
            runs,
            pc.add_checked(
                pc.cast(lead, pa.int32()), pc.cast(trail, pa.int32())
            ),
        )
        n_tokens = pc.if_else(
            pc.equal(pc.utf8_length(trimmed), 0), pa.scalar(1, pa.int32()), n_tokens
        )
        n_stop = pc.count_substring_regex(
            pc.utf8_lower(t), r"\b(the|and|of|to|in|a|is)\b"
        )
        n_punct = pc.count_substring_regex(t, f"[^A-Za-z0-9{ws}]")
        n_len = pc.utf8_length(t)
        n_nospace = pc.subtract_checked(
            n_len, pc.count_substring_regex(t, f"[{ws}]")
        )
        yield pa.record_batch(
            [
                b.column("doc_id"),
                pc.cast(n_tokens, pa.int64()),
                pc.cast(n_stop, pa.int64()),
                pc.cast(n_punct, pa.int64()),
                pc.cast(n_nospace, pa.int64()),
                pc.cast(n_len, pa.int64()),
            ],
            names=["doc_id", "n_tokens", "n_stopwords", "n_punct", "n_nospace", "n_len"],
        )


def char_collision_batches(batches):
    """x90 kernel — per-doc character Simpson index over Arrow batches.

    Replaces the interpreted array-HOF form (``array_distinct`` +
    per-distinct ``filter`` = O(alphabet x len) lambda evaluations per
    row; Spark higher-order functions have no codegen) with ONE
    vectorized pass per batch: all texts concatenate into a single
    UTF-32 codepoint array, ``np.unique`` counts (doc, codepoint) pairs
    via a packed key, and two ``bincount``s recover per-doc distinct
    counts and sum(c_i^2). Measured at sf0.1: 0.71 -> 0.20 s
    same-session (1.64 s in the calm r11 baseline bench).

    Guide §4 discipline: called via ``mapInArrow`` over exactly
    (doc_id, text) — still map-only, no shuffle, construction-free
    per batch; the collision_ppm arithmetic stays exact int64
    (len <= ~3e6 chars before (n^2 * 1e6) would near int64 range —
    the fixture max is 577; the JVM form kept DECIMAL(38) headroom,
    document-scale texts should chunk long docs upstream anyway).

    NULL text parity with the HOF form: n_chars/n_distinct NULL,
    collision_ppm 1000000 (size(NULL)=NULL, CASE falls through).
    """
    import numpy as np
    import pyarrow as pa

    for b in batches:
        doc_ids = b.column("doc_id")
        texts = b.column("text").to_pylist()
        nrow = len(texts)
        lens = np.fromiter(
            (len(t) if t is not None else 0 for t in texts),
            dtype=np.int64, count=nrow,
        )
        isnull = np.fromiter((t is None for t in texts), dtype=bool, count=nrow)
        blob = "".join(t for t in texts if t is not None)
        codes = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
        doc_idx = np.repeat(np.arange(nrow, dtype=np.int64), lens)
        key = doc_idx << 21 | codes  # Unicode codepoints < 2^21
        uniq, counts = np.unique(key, return_counts=True)
        udoc = (uniq >> 21).astype(np.int64)
        nd = np.bincount(udoc, minlength=nrow)
        sq = np.bincount(
            udoc, weights=(counts * counts).astype(np.float64), minlength=nrow
        ).astype(np.int64)
        ppm = np.full(nrow, 1000000, dtype=np.int64)
        nz = lens > 0
        ppm[nz] = (sq[nz] * 1000000) // (lens[nz] * lens[nz])
        n_out = lens.astype(object)
        nd_out = nd.astype(object)
        n_out[isnull] = None
        nd_out[isnull] = None
        yield pa.record_batch(
            [
                doc_ids,
                pa.array(n_out.tolist(), type=pa.int64()),
                pa.array(nd_out.tolist(), type=pa.int64()),
                pa.array(ppm.tolist(), type=pa.int64()),
            ],
            names=["doc_id", "n_chars_counted", "n_distinct_chars", "collision_ppm"],
        )
