"""Source lint: keep the cross-engine float-determinism class closed.

Rounds 4–6 each burned a driver-red on the same defect family —
``round()`` applied to a float average / rational ratio whose exact
value can land on a decimal halfway point, where Spark's
BigDecimal-HALF-UP-on-shortest-string and DuckDB's scaled-double
rounding disagree (r4 ext_correlation, r5 x19, plus ~35 latent sites
swept in r6). The engine-wide rule is now: driver-hashed emissions are
derived from EXACT integers (cents / basis points / micro-units,
``div``-scaled once at the end); thresholds are cross-multiplied
integer compares. This lint fails the build if a new fragile site
appears, so the class cannot silently reopen.

Safe-by-analysis patterns that stay allowed:
- ``round(x, 0)``: no 10^n scaling multiply on either engine, and both
  round exact halves away from zero — identical on identical doubles;
- rounding of CONTINUOUS values (outputs of log/pow/sqrt/cosine, or a
  division by an inexact product): a binary double cannot land on an
  exact decimal halfway unless 5^n divides its odd numerator, and
  continuous pipelines reach such points with probability ~0 — these
  sites carry an explicit allowlist entry with the justification;
- engine-internal faces never compared against DuckDB.
"""

from __future__ import annotations

import glob
import os
import re

ROOT = os.path.join(os.path.dirname(__file__), "..", "fintrack_etl_spark")

#: (path suffix, line-substring) pairs reviewed as safe — see module
#: docstring. Adding to this list requires the same analysis.
ALLOWED = [
    # cosine of float vectors: norms are sqrt-inexact -> continuous
    ("operators/dedup_text.py", "F.round(dot / (F.col(\"a.nrm\")"),
    # engine-internal streaming/batch face, never oracle-compared
    ("operators/incremental.py", "F.round(F.col(\"total\") / F.col(\"n\"), 2)"),
    # round(x/scale, 0): scale-0 rounding is cross-engine exact (see
    # x29 docstring); the divide is by an inexact absmax/127 double
    ("queries_ext.py", "F.round(x / F.col(\"scale\"), 0)"),
    ("queries_ext.py", "round(x / scale, 0)"),
]

#: round() applied to an average — the exact x19/ext_correlation shape.
FORBIDDEN_AVG = re.compile(r"F\.round\(\s*F\.(avg|mean)\(|round\(\s*avg\(")
#: round(expr-containing-division, n>0) — the rational-ratio shape.
ROUND_DIV = re.compile(r"F\.round\([^\n]*/|round\([^\n]*/[^\n]*,\s*[1-9]\s*\)")


def _is_code(line: str) -> bool:
    s = line.strip()
    return bool(s) and not s.startswith("#") and not s.startswith("--")


def _allowed(path: str, line: str) -> bool:
    return any(path.endswith(sfx) and frag in line for sfx, frag in ALLOWED)


def _strings_stripped(src: str) -> list[str]:
    """Docstrings carry pedagogical 'round(a/b, 4)' examples — scan only
    lines outside triple-quoted blocks that are PURE documentation.
    Oracle SQL lives in triple-quoted strings too and MUST be scanned,
    so we keep strings whose content looks like SQL (SELECT/WITH)."""
    out: list[str] = []
    in_doc = False
    for line in src.splitlines():
        quotes = line.count('"""') + line.count("'''")
        if in_doc:
            if quotes % 2 == 1:
                in_doc = False
            continue
        if quotes % 2 == 1 and not re.search(r"(SELECT|WITH|FROM)\b", line):
            # opening a non-SQL (doc) string: skip until it closes
            stripped = line.split('"""')[0].split("'''")[0]
            out.append(stripped)
            in_doc = True
            continue
        out.append(line)
    return out


def test_no_new_fragile_round_sites():
    offenders = []
    for path in glob.glob(os.path.join(ROOT, "**", "*.py"), recursive=True):
        rel = os.path.relpath(path, os.path.dirname(ROOT))
        src = open(path).read()
        for i, line in enumerate(src.splitlines(), 1):
            if not _is_code(line) or _allowed(rel, line):
                continue
            if FORBIDDEN_AVG.search(line):
                offenders.append(f"{rel}:{i} round-of-average: {line.strip()[:90]}")
        # the division pattern needs docstring stripping (examples in
        # prose), but SQL strings must stay visible
        for line in _strings_stripped(src):
            if not _is_code(line) or _allowed(rel, line):
                continue
            if "round(" in line and ROUND_DIV.search(line) and "floor(" not in line:
                offenders.append(f"{rel}: round-of-ratio: {line.strip()[:90]}")
    assert not offenders, (
        "new cross-engine-fragile round() sites (see module docstring; "
        "derive from exact integers or allowlist with analysis):\n"
        + "\n".join(offenders)
    )
