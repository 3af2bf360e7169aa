"""Local replica of the driver's correctness gate — dtype-faithful.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares the way the driver does:
both results go through pandas (``toPandas()`` / ``fetchdf()``), columns
are sorted by name, and the row multiset is compared via dtype-sensitive
per-row hashes (``pandas.util.hash_pandas_object``) with NO float
tolerance.  int64 ``3`` vs float64 ``3.0`` therefore FAILS here exactly
as it fails driver-side (DuckDB returns HUGEINT for un-CAST integer
``sum()``; ``fetchdf()`` maps HUGEINT to float64 — the class that shipped
5 blind reds in round 6 because the old replica rounded floats to 6 dp).
Unhashable emissions (raw array/struct columns) also FAIL, as they crash
the driver's canonicalizer.

When the hash compare fails, a tolerant value compare (1e-9) runs as a
DIAGNOSTIC only and the failure is labelled ``dtype-only`` vs
``value-divergent`` — the verdict stays red either way.

A dtype-parity lint runs on every entry regardless of verdict: per
column, the pandas dtype *kind* must match between Spark and the oracle
(int vs float on a NULL-free column is the blind class; any cell holding
a list/dict/ndarray is an array emission the driver cannot hash).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
Env: ORACLE_VANILLA=1 runs Spark on a PLAIN builder (no engine confs,
like the grading driver's session) — the de-risk sweep for entries
whose correctness might silently depend on session.py's conf posture
(UTC timezone, Arrow, AQE knobs).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

from __spark_entry__ import oracle_sql, queries
from fintrack_etl_spark.io import FIXTURE_TABLES
from fintrack_etl_spark.session import get_spark


def _canon_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name; normalize only what the driver's own
    conversion makes incomparable across engines (datetime unit, tz)."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        k = pdf[c].dtype.kind
        if k == "M":  # datetime64[us] vs [ns] hash differently; str form doesn't
            if getattr(pdf[c].dtype, "tz", None) is not None:
                # tz-aware (DatetimeTZDtype also has kind 'M'): a bare
                # astype to a naive unit raises in pandas 2 — go
                # through UTC so the wall-clock value is canonical
                pdf[c] = pdf[c].dt.tz_convert("UTC").dt.tz_localize(None)
            pdf[c] = pdf[c].astype("datetime64[us]").astype(str)
        elif k == "m":
            pdf[c] = pdf[c].astype(str)
        elif k == "O":
            # date / Decimal objects are hashable and deterministic; leave
            # them alone.  Lists/dicts/ndarrays are NOT — let the hash
            # raise, exactly as the driver's canonicalizer does.
            pass
    return pdf


def row_hashes(pdf: pd.DataFrame):
    """Dtype-sensitive, order-insensitive row fingerprint multiset."""
    pdf = _canon_frame(pdf)
    if len(pdf) == 0:
        return []
    h = pd.util.hash_pandas_object(pdf, index=False)
    return sorted(h.tolist())


def _kind(dtype) -> str:
    k = dtype.kind
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "object"


def dtype_parity_problems(spdf: pd.DataFrame, dpdf: pd.DataFrame):
    """The standing lint: int-vs-float kind mismatch on NULL-free columns,
    and any unhashable (array/map/struct) cell emission, on either side."""
    problems = []
    if len(spdf) == 0 and len(dpdf) == 0:
        # driver-faithful: the row-hash multiset of two empty frames
        # compares equal regardless of dtypes — don't out-red the gate
        return problems
    for c in sorted(set(spdf.columns) & set(dpdf.columns)):
        sk, dk = _kind(spdf[c].dtype), _kind(dpdf[c].dtype)
        if {sk, dk} == {"int", "float"}:
            s_nulls = bool(spdf[c].isna().any())
            d_nulls = bool(dpdf[c].isna().any())
            if not (s_nulls or d_nulls):
                problems.append(
                    f"dtype divergence on NULL-free column {c!r}: "
                    f"spark={spdf[c].dtype} oracle={dpdf[c].dtype} "
                    f"(un-CAST integer sum in the oracle?)"
                )
        for side, frame in (("spark", spdf), ("oracle", dpdf)):
            col = frame[c]
            if col.dtype.kind == "O" and len(col):
                # probe the first NON-NULL cell (ADVICE r7): a column
                # whose first row is None but whose later cells hold
                # lists would escape the lint (the gate still reds via
                # the row-hash TypeError, but the standalone lint and
                # the tests built on it would report clean)
                nn = col.dropna()
                v = nn.iloc[0] if len(nn) else None
                if isinstance(v, (list, dict, set, np.ndarray)):
                    problems.append(
                        f"array/struct emission on {side} column {c!r} "
                        f"({type(v).__name__}) — driver canonicalizer cannot hash it"
                    )
    return problems


def _tolerant_rows(pdf: pd.DataFrame):
    """The OLD replica compare — now a diagnostic only."""
    pdf = pdf[sorted(pdf.columns)]
    out = []
    for r in pdf.itertuples(index=False, name=None):
        vals = []
        for v in r:
            if isinstance(v, (float, np.floating)):
                v = float(v)
                v = "NaN" if math.isnan(v) else round(v, 6) + 0.0
            elif isinstance(v, (int, np.integer)):
                v = int(v)
            elif isinstance(v, (list, np.ndarray)):
                v = str(list(v))
            else:
                v = str(v) if v is not None else None
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if os.environ.get("ORACLE_VANILLA") == "1":
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        spark = get_spark("oracle_check")
    # ORACLE_PARTITIONS=N reruns the whole sweep at a hostile shuffle
    # partition count (e.g. a prime like 7): any entry whose VALUES
    # depend on partitioning — undeterministic tie-breaks, first()-in-
    # partition assumptions, accumulator misuse — goes red against the
    # partition-independent DuckDB oracle. Partition-invariance
    # insurance over the full registry, not just the ops
    # test_partition_invariance samples.
    parts = os.environ.get("ORACLE_PARTITIONS")
    if parts:
        spark.conf.set("spark.sql.shuffle.partitions", parts)
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = queries()
    oracles = oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            n_rows_only += 1
            print(f"ROWS  {name}: {len(spdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            dpdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            continue

        problems = []
        if len(spdf) != len(dpdf):
            problems.append(f"rowcount spark={len(spdf)} duckdb={len(dpdf)}")
        if sorted(spdf.columns) != sorted(dpdf.columns):
            problems.append(
                f"schema spark={sorted(spdf.columns)} duckdb={sorted(dpdf.columns)}"
            )
        lint = dtype_parity_problems(spdf, dpdf) if not problems else []
        problems.extend(lint)
        if not problems:
            try:
                sh = row_hashes(spdf)
                dh = row_hashes(dpdf)
            except TypeError as e:
                problems.append(f"canonicalizer crash (driver-red): {e}")
            else:
                if sh != dh:
                    # Diagnostic: is this dtype/last-bit or a real value gap?
                    label = (
                        "dtype-only (values match at 1e-9)"
                        if _tolerant_rows(spdf) == _tolerant_rows(dpdf)
                        else "value-divergent"
                    )
                    n_diff = sum(1 for a, b in zip(sh, dh) if a != b)
                    problems.append(f"hash mismatch [{label}]; {n_diff} row-hash diffs")
        if problems:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            n_pass += 1
            print(f"PASS  {name}: {len(spdf)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if failures:
        print("failures:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
