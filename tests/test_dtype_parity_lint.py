"""Standing lint for the round-6 blind class (VERDICT r6 #2): the
driver canonicalizes through pandas, so an oracle whose integer
aggregate comes back HUGEINT→float64 hashes differently from Spark's
int64 even when every value is exact, and a raw array/struct emission
crashes the canonicalizer outright. ``tools/oracle_check.py`` is now
dtype-faithful; these tests pin (a) the lint machinery itself, (b) the
five entries that shipped red in round 6, now fixed, and (c) the
NULL-coercion boundary that must NOT be "fixed" (int columns WITH
NULLs coerce to float64 on BOTH sides and legitimately hash green).
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from oracle_check import dtype_parity_problems, row_hashes  # noqa: E402

R6_RED_ENTRIES = [
    "x19_repetition_filter",
    "ext_array_agg",
    "ext_stratified_sample",
    "ext_data_quality",
    "ext_merge_evolving",
]
NULL_COERCION_ENTRIES = ["x74_rrf_fusion", "ext_profile_table"]


# ---------------------------------------------------------------- machinery


def test_lint_flags_int_vs_float_on_null_free_column():
    s = pd.DataFrame({"k": ["a", "b"], "n": pd.array([1, 2], dtype="int64")})
    d = pd.DataFrame({"k": ["a", "b"], "n": pd.array([1.0, 2.0], dtype="float64")})
    probs = dtype_parity_problems(s, d)
    assert any("dtype divergence" in p and "'n'" in p for p in probs)


def test_lint_accepts_null_coerced_float_on_both_sides():
    s = pd.DataFrame({"n": pd.array([1.0, np.nan], dtype="float64")})
    d = pd.DataFrame({"n": pd.array([1.0, np.nan], dtype="float64")})
    assert dtype_parity_problems(s, d) == []


def test_lint_tolerates_int_float_mismatch_when_nulls_present():
    # int-vs-float where a side carries NULLs is the pandas coercion
    # boundary — the driver sees float on both sides there; the lint
    # must not fire (x74 ranks / ext_profile_table n_distinct class).
    s = pd.DataFrame({"n": pd.array([1.0, np.nan], dtype="float64")})
    d = pd.DataFrame({"n": pd.array([1, 2], dtype="int64")})
    assert dtype_parity_problems(s, d) == []


def test_lint_flags_array_emission():
    s = pd.DataFrame({"a": [[1, 2], [3]]})
    d = pd.DataFrame({"a": ["1,2", "3"]})
    probs = dtype_parity_problems(s, d)
    assert any("array/struct emission" in p and "spark" in p for p in probs)


def test_row_hashes_are_dtype_sensitive():
    ints = pd.DataFrame({"n": pd.array([3, 4], dtype="int64")})
    floats = pd.DataFrame({"n": pd.array([3.0, 4.0], dtype="float64")})
    assert row_hashes(ints) != row_hashes(floats)


def test_row_hashes_order_insensitive_and_exact():
    a = pd.DataFrame({"x": [1.5, 2.5], "y": ["p", "q"]})
    b = pd.DataFrame({"x": [2.5, 1.5], "y": ["q", "p"]})
    assert row_hashes(a) == row_hashes(b)
    c = pd.DataFrame({"x": [1.5 + 1e-12, 2.5], "y": ["p", "q"]})
    assert row_hashes(a) != row_hashes(c)  # no tolerance — exact floats


def test_row_hashes_crash_on_raw_array_column():
    with pytest.raises(TypeError):
        row_hashes(pd.DataFrame({"a": [[1, 2], [3]]}))


# ------------------------------------------------- the five r6 reds, fixed


@pytest.fixture(scope="module")
def duck(sf_dir):
    from fintrack_etl_spark.io import FIXTURE_TABLES

    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


def _driver_faithful_check(spark, duck, sf_dir, name):
    import __spark_entry__ as entry

    spdf = entry.queries()[name](spark, sf_dir).toPandas()
    dpdf = duck.execute(entry.oracle_sql()[name]).fetchdf()
    assert len(spdf) == len(dpdf), f"{name}: rowcount"
    assert sorted(spdf.columns) == sorted(dpdf.columns), f"{name}: schema"
    assert dtype_parity_problems(spdf, dpdf) == [], f"{name}: dtype lint"
    assert row_hashes(spdf) == row_hashes(dpdf), f"{name}: exact hash"


@pytest.mark.parametrize("name", R6_RED_ENTRIES)
def test_r6_red_entries_now_driver_green(spark, duck, sf_dir, name):
    _driver_faithful_check(spark, duck, sf_dir, name)


@pytest.mark.parametrize("name", NULL_COERCION_ENTRIES)
def test_null_coercion_entries_stay_green(spark, duck, sf_dir, name):
    _driver_faithful_check(spark, duck, sf_dir, name)
