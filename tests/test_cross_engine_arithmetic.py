"""Cross-engine arithmetic contracts — the axioms under the r6 sweep.

Every exact-integer rewrite in the registry leans on a small set of
claims about how Spark and DuckDB evaluate the SAME expression. This
test pins each claim directly, over adversarial values (negatives,
exact halfway points, power-of-two fractions), so a Spark or DuckDB
upgrade that changes semantics fails HERE with a named axiom instead
of as an unexplained driver hash mismatch:

1. integer division: Spark ``div`` and DuckDB ``//`` both truncate
   toward zero (NOT floor) for signed integers;
2. ``floor(CAST(a AS DOUBLE) / b)`` agrees cross-engine (identical
   correctly-rounded IEEE division, identical floor);
3. ``round(x, 0)`` agrees cross-engine even on exact ``.5`` doubles
   (both round half away from zero; no 10^n scaling multiply) — the
   x29 quantizer safety claim;
4. ``floor(sqrt(CAST(n AS DOUBLE)))`` is an exact isqrt for n < 2^52
   (the x84 claim), verified against Python's math.isqrt;
5. exact decimal halfway points ARE reachable by binary doubles when
   5^n divides the odd numerator (0.03125, 0.0078125) — the reason
   ``round(x, n>0)`` stays banned for rational emissions.
"""

from __future__ import annotations

import math

import duckdb
import pytest


CASES_DIV = [
    (7, 2), (-7, 2), (7, -2), (-7, -2), (0, 5), (1, 3), (-1, 3),
    (10**15 + 7, 97), (-(10**15 + 7), 97), (999999, 1000000),
]

CASES_HALF = [0.5, 1.5, 2.5, -0.5, -1.5, -2.5, 63.5, -63.5, 0.03125 * 32]


def test_integer_division_truncates_identically(spark):
    con = duckdb.connect()
    for a, b in CASES_DIV:
        s = spark.sql(f"SELECT div(CAST({a} AS BIGINT), CAST({b} AS BIGINT)) v").first()["v"]
        d = con.execute(f"SELECT CAST({a} AS BIGINT) // CAST({b} AS BIGINT)").fetchone()[0]
        py_trunc = int(a / b) if b else None  # trunc toward zero
        assert s == d == py_trunc, (a, b, s, d, py_trunc)


def test_floor_of_double_division_agrees(spark):
    con = duckdb.connect()
    for a, b in CASES_DIV:
        s = spark.sql(
            f"SELECT floor(CAST({a} AS DOUBLE) / CAST({b} AS DOUBLE)) v"
        ).first()["v"]
        d = con.execute(
            f"SELECT floor(CAST({a} AS DOUBLE) / CAST({b} AS DOUBLE))"
        ).fetchone()[0]
        assert float(s) == float(d), (a, b, s, d)


def test_round_scale_zero_agrees_on_exact_halves(spark):
    con = duckdb.connect()
    for x in CASES_HALF:
        s = spark.sql(f"SELECT round(CAST({x!r} AS DOUBLE), 0) v").first()["v"]
        d = con.execute(f"SELECT round(CAST({x!r} AS DOUBLE), 0)").fetchone()[0]
        assert float(s) == float(d), (x, s, d)
        # both are half-away-from-zero
        assert float(s) == math.floor(abs(x) + 0.5) * (1 if x >= 0 else -1), (x, s)


def test_floor_sqrt_is_exact_isqrt(spark):
    con = duckdb.connect()
    ns = [0, 1, 2, 3, 4, 24, 25, 26, 10**6, 10**12 - 1, 10**12, 4503599627370495]
    ns += [k * k for k in (3, 10**3, 10**6, 67108863)]
    ns += [k * k - 1 for k in (10**3, 10**6, 67108863)]
    for n in ns:
        want = math.isqrt(n)
        s = spark.sql(f"SELECT CAST(floor(sqrt(CAST({n} AS DOUBLE))) AS BIGINT) v").first()["v"]
        d = con.execute(f"SELECT CAST(floor(sqrt(CAST({n} AS DOUBLE))) AS BIGINT)").fetchone()[0]
        assert s == d == want, (n, s, d, want)


def test_binary_fractions_reach_decimal_halfway_points():
    """The danger that justifies the round(x, n>0) ban: a double CAN
    equal an exact n-decimal halfway point (so rounding direction is a
    pure convention choice), exactly when 5^n divides the odd
    numerator of the binary fraction."""
    assert 0.03125 == 3125 / 10**5  # 2^-5: halfway at 4 decimals
    assert 0.0078125 == 78125 / 10**7  # 2^-7: halfway at 6 decimals
    # and the conventions genuinely disagree there: banker's (python)
    # vs half-up — the cross-engine trap this repo engineers around
    assert round(0.03125, 4) == 0.0312  # banker's rounds to even
