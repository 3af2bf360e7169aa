"""Property-based tests (SURVEY §5) — the scalar library against
generated pt-BR inputs, batched through ONE Spark job per property.

Hypothesis drives the value generation; each property collects its
examples first and evaluates them in a single DataFrame pass (a
per-example Spark job would take minutes)."""

from __future__ import annotations

from datetime import date

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fintrack_etl_spark import functions as FX

_SETTINGS = dict(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _eval(spark, values, expr):
    df = spark.createDataFrame([(v,) for v in values], ["c"])
    return [r[0] for r in df.select(expr(F.col("c")).alias("out")).collect()]


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.decimals(
                min_value=-99_999_999, max_value=99_999_999, places=2, allow_nan=False
            ),
            st.booleans(),  # prefix with R$?
            st.booleans(),  # thousands separators?
        ),
        min_size=1,
        max_size=50,
    )
)
def test_brl_to_double_roundtrip(spark, cases):
    """Formatting any 2-dp amount the pt-BR way then parsing it returns
    the amount exactly (floats with 2 dp are exactly representable in
    the tested range)."""
    rendered, expected = [], []
    for amount, with_prefix, with_thousands in cases:
        txt = f"{amount:,.2f}"  # 1,234,567.89
        if with_thousands:
            txt = txt.replace(",", "\x00").replace(".", ",").replace("\x00", ".")
        else:
            txt = txt.replace(",", "").replace(".", ",")
        if with_prefix:
            txt = ("R$ " if amount >= 0 else "R$ -") + txt.lstrip("-")
        rendered.append(txt)
        expected.append(float(amount))
    got = _eval(spark, rendered, FX.brl_to_double)
    assert got == expected, list(zip(rendered, got, expected))[:3]


@settings(**_SETTINGS)
@given(st.lists(st.text(max_size=30), min_size=1, max_size=50))
def test_brl_to_double_never_throws_on_garbage(spark, texts):
    """ANSI mode is on; the parser must still map unparseable input to
    NULL (try_cast semantics), never raise."""
    got = _eval(spark, texts, FX.brl_to_double)
    assert len(got) == len(texts)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.dates(min_value=date(1950, 1, 2), max_value=date(2049, 12, 31)),
            st.sampled_from(["%Y-%m-%d", "%d/%m/%Y", "%Y%m%d", "%d%m%Y"]),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_to_date_multi_parses_all_reference_formats(spark, cases):
    rendered = [d.strftime(fmt) for d, fmt in cases]
    got = _eval(spark, rendered, FX.to_date_multi)
    assert got == [d for d, _ in cases], list(zip(rendered, got))[:3]


@settings(**_SETTINGS)
@given(
    st.lists(
        st.integers(min_value=0, max_value=99_999_999_999),
        min_size=1,
        max_size=50,
    )
)
def test_normalize_cpf_idempotent_and_11_digits(spark, nums):
    """Any digit string ≤11 long, with or without ./-/space noise,
    normalizes to exactly 11 left-padded digits; normalizing twice is
    the same as once."""
    noisy = [f"{n:011d}"[:3] + "." + f"{n:011d}"[3:9] + "-" + f"{n:011d}"[9:] for n in nums]
    once = _eval(spark, noisy, FX.normalize_cpf)
    assert all(len(v) == 11 and v.isdigit() for v in once)
    assert once == [f"{n:011d}" for n in nums]
    twice = _eval(spark, once, FX.normalize_cpf)
    assert twice == once


@settings(**_SETTINGS)
@given(st.lists(st.text(alphabet=" \tab-xyz_.", max_size=25), min_size=1, max_size=50))
def test_slugify_output_alphabet_and_idempotence(spark, texts):
    out = _eval(spark, texts, FX.slugify)
    for v in out:
        assert v is None or all(ch.islower() or ch.isdigit() or ch in "-_." for ch in v), v
    assert _eval(spark, out, FX.slugify) == out


@settings(**_SETTINGS)
@given(st.lists(st.text(alphabet=" \ta b\tc", max_size=25), min_size=1, max_size=50))
def test_normalize_space_idempotent_no_runs(spark, texts):
    out = _eval(spark, texts, FX.normalize_space)
    for v in out:
        assert "  " not in v and "\t" not in v and v == v.strip(), repr(v)
    assert _eval(spark, out, FX.normalize_space) == out


# ---------------------------------------------------------------------------
# Round-2 curation operators: sampling thresholds + z-order interleave
# ---------------------------------------------------------------------------


@settings(**_SETTINGS)
@given(
    r1=st.floats(min_value=0.0, max_value=1.0),
    r2=st.floats(min_value=0.0, max_value=1.0),
)
def test_rate_threshold_is_monotone(r1, r2):
    """A higher sampling rate can never keep fewer keys: thresholds are
    ordered the same way as rates ('g' sentinel sorts after all hex)."""
    from fintrack_etl_spark.operators.sampling import rate_threshold_hex

    lo, hi = sorted([r1, r2])
    assert rate_threshold_hex(lo) <= rate_threshold_hex(hi)


@settings(**{**_SETTINGS, "max_examples": 10})  # one Spark job per example
@given(
    bins=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=20,
    )
)
def test_zvalue_matches_python_interleave(spark, bins):
    """The native-Column Morton key equals the reference bit
    interleave, and distinct bin tuples yield distinct keys
    (injectivity on the bin lattice)."""
    from pyspark.sql import functions as F

    from fintrack_etl_spark.operators.layout import zvalue

    def py_z(t):
        return sum(((t[i] >> j) & 1) << (j * len(t) + i) for i in range(len(t)) for j in range(4))

    df = spark.createDataFrame(bins, ["a", "b", "c"])
    got = [
        r["z"]
        for r in df.select(
            zvalue([F.col("a"), F.col("b"), F.col("c")], 4).alias("z"), "a", "b", "c"
        ).collect()
    ]
    expect = [py_z(t) for t in [(r, g, b) for r, g, b in bins]]
    assert sorted(got) == sorted(expect)
    assert len(set(py_z(t) for t in set(bins))) == len(set(bins))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),    # key
            st.integers(min_value=0, max_value=99),   # payload
            st.booleans(),                            # is delete
        ),
        min_size=0,
        max_size=25,
    )
)
def test_apply_changes_matches_reference_fold(spark, ops):
    """CDC fold property: for ANY change log (unique seqs assigned by
    position), apply_changes over an empty snapshot equals the obvious
    sequential Python fold — last op per key wins, deletes remove."""
    from fintrack_etl_spark.operators.upsert import apply_changes

    state: dict[int, int] = {}
    for k, v, is_del in ops:           # reference: fold in seq order
        if is_del:
            state.pop(k, None)
        else:
            state[k] = v

    snap = spark.createDataFrame([], "k int, v int")
    if ops:
        changes = spark.createDataFrame(
            [(k, v, i, "D" if d else "U") for i, (k, v, d) in enumerate(ops)],
            ["k", "v", "seq", "op"],
        )
        folded = apply_changes(snap, changes, ["k"], "seq", "op")
    else:
        folded = snap
    got = {r["k"]: r["v"] for r in folded.collect()}
    assert got == state, (got, state)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)), max_size=15),  # left (key, t)
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)), max_size=15),  # right (key, t)
)
def test_asof_join_matches_reference_scan(spark, lrows, rrows):
    """As-of join property: for ANY left/right tables, each left row
    gets the right row with the greatest right_ts <= left_ts per key
    (ties allowed: equal right_ts at the left's time IS visible),
    matching a quadratic reference scan."""
    from fintrack_etl_spark.operators.joins import asof_join

    # unique right timestamps per key so "the" matched row is well
    # defined (the operator's tie rule among identical right_ts rows is
    # unspecified, as in every as-of engine)
    rseen = {}
    for k, t in rrows:
        rseen.setdefault((k, t), (k, t))
    rrows = list(rseen.values())

    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)], "k int, t int, lid int"
    )
    right = spark.createDataFrame(
        [(k, t, t * 1000 + k) for (k, t) in rrows], "k int, t int, payload int"
    )
    out = asof_join(
        left, right, on=["k"], left_ts="t", right_ts="t",
        right_cols={"payload": "asof_payload"},
    )
    got = {r["lid"]: r["asof_payload"] for r in out.collect()}

    want = {}
    for i, (k, t) in enumerate(lrows):
        best = None
        for rk, rt in rrows:
            if rk == k and rt <= t and (best is None or rt > best):
                best = rt
        want[i] = None if best is None else best * 1000 + k
    assert got == want, (got, want)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 500)),  # (user, t seconds)
        min_size=1,
        max_size=20,
        unique=True,
    )
)
def test_sessionize_matches_reference_gap_rule(spark, rows):
    """Sessionize property: for ANY keyed event times, two consecutive
    events share a session iff their gap is under the threshold —
    checked against a sequential per-key reference fold."""
    from fintrack_etl_spark.operators.windows import sessionize

    df = spark.createDataFrame(
        [(u, t, i) for i, (u, t) in enumerate(rows)], "u int, t int, id int"
    ).select("u", F.col("t").cast("timestamp").alias("t"), "id")
    out = sessionize(df, "t", ["u"], gap_minutes=1, tie_breakers=["id"])
    got = {r["id"]: (r["u"], r["session_id"]) for r in out.collect()}

    # reference: sort per key by (t, id), new session when gap >= 60 s
    want_session = {}
    for u in {u for u, _ in rows}:
        evs = sorted(
            [(t, i) for i, (uu, t) in enumerate(rows) if uu == u]
        )
        sess = 0
        prev = None
        for t, i in evs:
            if prev is not None and t - prev >= 60:
                sess += 1
            want_session[i] = sess
            prev = t
    # compare PARTITIONS (session ids may be numbered differently):
    # same-key rows grouped identically
    from collections import defaultdict

    got_groups = defaultdict(set)
    for i, (u, s) in got.items():
        got_groups[(u, s)].add(i)
    want_groups = defaultdict(set)
    for i, s in want_session.items():
        u = rows[i][0]
        want_groups[(u, s)].add(i)
    assert set(map(frozenset, got_groups.values())) == set(
        map(frozenset, want_groups.values())
    )


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(  # corpora
        st.lists(  # docs: token lists over a tiny vocab (high overlap)
            st.sampled_from([f"t{i}" for i in range(6)]),
            min_size=0,
            max_size=12,
        ),
        min_size=4,
        max_size=10,
    ),
    st.sampled_from([0.34, 0.5, 0.6, 0.75]),
)
def test_prefix_filter_equals_unfiltered_on_random_corpora(spark, docs, threshold):
    """PPJoin completeness property (round-7 path: exact-set collapse +
    length/positional filters + asymmetric prefixes): on ANY corpus —
    including empty docs, sub-n docs, exact duplicates and heavy
    overlap from a 6-token vocabulary — the filtered join equals the
    unfiltered exact join at the same threshold, pair for pair and
    jaccard for jaccard."""
    from fintrack_etl_spark.operators import dedup_text as DD

    rows = [
        (i, " ".join(toks)) for i, toks in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    want = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in DD.ngram_jaccard_pairs(
            df, "doc_id", "text", 3, threshold
        ).collect()
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in DD.prefix_filter_pairs(
            df, "doc_id", "text", 3, threshold
        ).collect()
    }
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=1,
        max_size=60,
    )
)
def test_connected_components_match_union_find(spark, edges):
    """Both CC operators against an independent pure-Python union-find
    ground truth on random multigraphs WITH self-loops and parallel
    edges — label-equality between the two Spark implementations alone
    could not catch both being wrong the same way (the star operator's
    convergence probe and self-loop handling are the risk surface)."""
    from fintrack_etl_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {n: find(n) for n in parent}
    # min-label normalization: find() path above always roots at min
    want = {n: find(n) for n in parent}  # second pass after compressions

    df = spark.createDataFrame(edges, ["src", "dst"])
    prop = {r["node"]: r["cluster_id"] for r in connected_components(df).collect()}
    star = {
        r["node"]: r["cluster_id"] for r in connected_components_star(df).collect()
    }
    assert prop == want
    assert star == want
