"""Real-%PDF decode path: the bundled pure-Python extractor
(``parse/minipdf.py``) closes the S1 codec gap — a real, valid PDF
written here from the spec (Flate-compressed content stream, Tj/TJ/T*
text operators, xref + trailer) must flow through the SAME distributed
scan → decode → line-parser path as the fixtures.

Reference behavior being matched: ``extractors/bb_statement.py:28-31``
(pdfplumber page-text extraction joined by newlines).
"""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from fintrack_etl_spark.parse import parse_bb_statement
from fintrack_etl_spark.parse.minipdf import extract_pdf_text
from fintrack_etl_spark.parse.pdf_source import binary_docs_to_text, read_binary_docs

from test_parse import BB_STATEMENT


def _pdf_escape(b: bytes) -> bytes:
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def make_minimal_pdf(text: str, compress: bool = True) -> bytes:
    """Build a small but VALID one-page PDF showing ``text`` line by line
    (Helvetica, Tj/T* operators, correct xref offsets and trailer)."""
    ops = [b"BT /F1 10 Tf 12 TL 72 720 Td"]
    for i, line in enumerate(text.split("\n")):
        if i:
            ops.append(b"T*")
        ops.append(b"(" + _pdf_escape(line.encode("latin-1")) + b") Tj")
    ops.append(b"ET")
    content = b"\n".join(ops)
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"

    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d%s >>\nstream\n%s\nendstream" % (len(content), filt, content),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = []
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objects) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_at)
    )
    return bytes(out)


def test_extract_flate_and_uncompressed():
    text = "linha um\nlinha dois (parens) e \\barra"
    for compress in (True, False):
        assert extract_pdf_text(make_minimal_pdf(text, compress)) == text


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
    good = make_minimal_pdf("texto")
    # append a corrupt Flate stream object — must be skipped, not fatal
    bad = b"9 0 obj\n<< /Length 8 /Filter /FlateDecode >>\nstream\nnotzlib!\nendstream\nendobj\n"
    assert extract_pdf_text(good + bad) == "texto"
    assert extract_pdf_text(b"%PDF-1.4\nnothing here\n%%EOF") is None
    assert extract_pdf_text(b"not a pdf") is None


def test_real_pdf_through_distributed_scan_to_parser(spark, tmp_path):
    """End to end on REAL %PDF bytes: binaryFile scan → mapInPandas
    decode (minipdf fallback) → parse_bb_statement, matching the
    %FAKEPDF envelope path row for row."""
    (tmp_path / "stmt.pdf").write_bytes(make_minimal_pdf(BB_STATEMENT))
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
