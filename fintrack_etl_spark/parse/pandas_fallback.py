"""Grouped-map (``applyInPandas``) fallback for the document parsers.

The native parsers (``bb_statement.py`` etc.) are pure DataFrame
pipelines — classify, forward-fill, segment, aggregate — and that is
the preferred path: JVM-side, codegen-friendly, oracle-checkable in
SQL. This module keeps the SURVEY §2.11 escape hatch: the same
semantics as a stateful per-document Python loop behind Arrow batches,
for dialects whose line grammar outgrows regex-plus-windows (or for
parity-debugging the native path — see
``tests/test_parse.py::test_pandas_fallback_matches_native``).

Scale shape: ``groupBy(doc_id).applyInPandas`` shuffles once on the
document id (same key as the native path's windows), then parses each
document in a single Python pass. Arrow moves the batches; the loop
cost is per-line Python — measured 3.2× the native path on the p1
corpus at sf0.1 (0.38 s vs 1.22 s for 150 k launches, BASELINE.md §C),
widening with grammar complexity — which is why it is
the fallback, not the default (reference inverse:
``etls_raw/main.py:402-416`` parses on the DRIVER; here the loop at
least runs ON THE EXECUTORS, so it scales out even in fallback mode).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from .bb_statement import HEADER_LINES, KNOWN_GROUPS, LAUNCH_RE

_OUT_SCHEMA = (
    "doc_id long, line_no integer, data string, lote string, "
    "documento string, grupo string, historico string, complemento string, "
    "historico_full string, valor double, sinal string"
)

_WS = re.compile(r"[ \t]+")
_DATE_START = re.compile(r"^\d{2}/\d{2}/\d{4}\b")
_LETTER = re.compile(r"[A-Za-zÀ-ÿ]")
_DIGIT = re.compile(r"\d")
_LAUNCH = re.compile(LAUNCH_RE)


def _norm(s: str) -> str:
    return _WS.sub(" ", s).strip()


def _brl(s: str) -> float | None:
    try:
        return float(s.replace("R$", "").replace(" ", "").replace(".", "").replace(",", "."))
    except ValueError:
        return None


def _is_group(ln: str) -> bool:
    if _DATE_START.match(ln) or ln in HEADER_LINES:
        return False
    low = ln.lower()
    short_title = len(ln) <= 40 and _LETTER.search(ln) and not _DIGIT.search(ln)
    dashed = " - " in ln and len(ln) <= 60
    return bool(
        low.startswith("saldo do dia") or short_title or dashed or low in KNOWN_GROUPS
    )


def _parse_doc(doc_id: int, text: str) -> list[dict]:
    """The reference's stateful loop (``bb_statement.py:84-202``),
    verbatim semantics: group lines set context and close the open
    launch; launch lines open one; other lines are continuations of the
    open launch."""
    rows: list[dict] = []
    grupo: str | None = None
    open_launch: dict | None = None
    conts: list[str] = []

    def close() -> None:
        nonlocal open_launch, conts
        if open_launch is not None:
            comp = " ".join(conts)
            open_launch["complemento"] = comp
            open_launch["historico_full"] = (
                f"{open_launch['historico']} | {comp}" if comp else open_launch["historico"]
            )
            rows.append(open_launch)
        open_launch, conts = None, []

    for line_no, raw in enumerate(text.split("\n")):
        ln = _norm(raw)
        if not ln or ln in HEADER_LINES:
            continue
        if _is_group(ln):
            close()
            grupo = ln
            continue
        m = _LAUNCH.match(ln)
        if m:
            close()
            data, lote, documento, hist, valor, sinal = m.groups()
            amount = _brl(valor)
            open_launch = {
                "doc_id": doc_id,
                "line_no": line_no,
                "data": data,
                "lote": lote,
                "documento": documento,
                "grupo": grupo,
                "historico": _norm(hist),
                "valor": amount if sinal == "+" else (-amount if amount is not None else None),
                "sinal": sinal,
            }
        elif open_launch is not None:
            conts.append(ln)
    close()
    return rows


def parse_bb_statement_pandas(
    docs: DataFrame, doc_id: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Fallback twin of :func:`..bb_statement.parse_bb_statement` —
    identical output schema and values (equivalence-tested)."""
    import pandas as pd

    cols = [f.split(" ")[0] for f in _OUT_SCHEMA.split(", ")]

    def parse_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        out: list[dict] = []
        for _, row in pdf.iterrows():
            out.extend(_parse_doc(row[doc_id], row[text_col]))
        return pd.DataFrame(out, columns=cols)

    return docs.groupBy(doc_id).applyInPandas(parse_group, _OUT_SCHEMA)
