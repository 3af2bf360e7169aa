"""Real-%PDF decode path: the bundled pure-Python extractor
(``parse/minipdf.py``) closes the S1 codec gap — a real, valid PDF
(Flate-compressed content stream, Tj/TJ/T* text operators, xref +
trailer, written by ``build_pdf``) must flow through the SAME
distributed scan → decode → line-parser path as the fixtures.

Reference behavior being matched: ``extractors/bb_statement.py:28-31``
(pdfplumber page-text extraction joined by newlines).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fintrack_etl_spark.parse import parse_bb_statement
from fintrack_etl_spark.parse.minipdf import build_pdf, extract_pdf_text
from fintrack_etl_spark.parse.pdf_source import binary_docs_to_text, read_binary_docs

from test_parse import BB_STATEMENT


def test_extract_flate_and_uncompressed():
    text = "linha um\nlinha dois (parens) e \\barra"
    for compress in (True, False):
        assert extract_pdf_text(build_pdf(text, compress)) == text


def test_roundtrip_unicode_and_blank_lines():
    text = "Extrato — saldo €120\n\ncafé ção\n日本語テスト\n(a\\b)"
    assert extract_pdf_text(build_pdf(text)) == text


@settings(max_examples=50, deadline=None)
@given(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\r"),
        max_size=200,
    )
)
def test_roundtrip_property(text):
    """Any unicode text (modulo trailing newlines — extraction has no
    trailing-newline concept) survives build_pdf → extract_pdf_text."""
    assert extract_pdf_text(build_pdf(text)) == (text.rstrip("\n") or None)


def test_extract_tj_array_hex_and_octal_strings():
    """TJ arrays concatenate their strings (kerning numbers ignored);
    hex strings and octal escapes decode per spec."""
    content = (
        b"BT /F1 10 Tf 72 720 Td"
        b" [(Ca) -20 (f) 10 <e9>] TJ"  # "Caf" + hex e9 -> "Café"
        b" T* (\\101\\102\\103) Tj"  # octal ABC
        b" ET"
    )
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length "
        + str(len(content)).encode()
        + b" >>\nstream\n"
        + content
        + b"\nendstream\nendobj\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == "Caf\xe9\nABC"


def test_extract_skips_non_text_and_undecodable_streams():
    good = build_pdf("texto")
    # append a corrupt Flate stream object — must be skipped, not fatal
    bad = b"9 0 obj\n<< /Length 8 /Filter /FlateDecode >>\nstream\nnotzlib!\nendstream\nendobj\n"
    assert extract_pdf_text(good + bad) == "texto"
    assert extract_pdf_text(b"%PDF-1.4\nnothing here\n%%EOF") is None
    assert extract_pdf_text(b"not a pdf") is None


def test_real_pdf_through_distributed_scan_to_parser(spark, tmp_path):
    """End to end on REAL %PDF bytes: binaryFile scan → mapInPandas
    decode (minipdf fallback) → parse_bb_statement, matching the
    %FAKEPDF envelope path row for row."""
    (tmp_path / "stmt.pdf").write_bytes(build_pdf(BB_STATEMENT))
    decoded = binary_docs_to_text(read_binary_docs(spark, str(tmp_path)))
    row = decoded.collect()[0]
    assert row.decode_error is None
    # text extraction has no trailing-newline concept (pdfplumber same)
    assert row.text == BB_STATEMENT.rstrip("\n")

    rows = {
        r["line_no"]: r
        for r in parse_bb_statement(
            decoded.select(F.lit(1).alias("doc_id"), "text")
        ).collect()
    }
    assert len(rows) == 4
    assert rows[4]["historico"] == "Transferência enviada"
    assert rows[4]["valor"] == pytest.approx(-1234.56)
    assert rows[8]["grupo"] == "Saldo do dia"
