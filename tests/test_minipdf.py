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


def test_cid_pdf_roundtrip_all_modern_structures():
    """build_pdf_cid writes Type0/Identity-H text as order-of-first-
    appearance CIDs (meaningless without the CMap), with the page tree
    in an ObjStm and only an xref STREAM for cross-reference — so a
    correct round-trip proves the xref-stream parser, the ObjStm
    expansion, the font-table resolution, and the ToUnicode decode all
    work together."""
    from fintrack_etl_spark.parse.minipdf import build_pdf_cid

    texts = [
        "EXTRATO\nData  Histórico  Valor\n01/02/2024 PIX 1.234,56",
        "línea açaí — ñ ü 😀 中文",  # bfchar incl. surrogate-pair dst
        "abcdefg\nABCDEFG\n0123456789",  # bfrange runs
        "a\n\nb",  # interior blank line preserved
    ]
    for t in texts:
        assert extract_pdf_text(build_pdf_cid(t)) == t


def test_cid_text_is_unreadable_without_cmap():
    """The content stream's CID codes must NOT be recoverable by the
    dumb stream scan (codes are indexes, not codepoints) — guarding
    that the round-trip above actually proves font resolution."""
    from fintrack_etl_spark.parse.minipdf import (
        _iter_streams,
        _stream_to_text,
        build_pdf_cid,
    )

    blob = build_pdf_cid("hello world")
    raw = [
        _stream_to_text(s)
        for s in _iter_streams(blob)
        if b"BT" in s and b"Tj" in s
    ]
    assert raw and all("hello" not in x for x in raw)


def test_xref_stream_parser_locates_objects():
    """_xref_objects resolves the startxref chain through the xref
    STREAM (PNG Up predictor) to every top-level object."""
    from fintrack_etl_spark.parse.minipdf import _xref_objects, build_pdf_cid

    blob = build_pdf_cid("abc")
    objs = _xref_objects(blob)
    # top-level objects: 4 content, 7 CMap, 8 ObjStm, 9 XRef
    assert set(objs) == {4, 7, 8, 9}
    assert b"/ObjStm" in objs[8] and b"/XRef" in objs[9]


def test_objstm_expansion_exposes_members():
    from fintrack_etl_spark.parse.minipdf import _object_map, build_pdf_cid

    objs = _object_map(build_pdf_cid("abc"))
    assert b"/Catalog" in objs[1]
    assert b"/Type0" in objs[5]
    assert b"/CIDFontType2" in objs[6]


def test_tounicode_cmap_array_form_and_width():
    """bfrange explicit-array destinations and 1-byte codespace."""
    from fintrack_etl_spark.parse.minipdf import _parse_tounicode

    cmap, width = _parse_tounicode(
        b"1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        b"1 beginbfrange\n<01> <03> [<0041> <0058> <005A>]\nendbfrange\n"
        b"1 beginbfchar\n<05> <00470048>\nendbfchar\n"
    )
    assert width == 1
    assert cmap == {1: "A", 2: "X", 3: "Z", 5: "GH"}


def test_mixed_simple_and_cid_fonts_in_one_page():
    """Tf switches decoders mid-stream: /F1 simple latin-1, /F2 CID."""
    from fintrack_etl_spark.parse.minipdf import _stream_to_text

    fonts = {b"/F1": None, b"/F2": ({1: "O", 2: "K"}, 2)}
    s = b"BT /F1 10 Tf (plain) Tj T* /F2 10 Tf <00010002> Tj ET"
    assert _stream_to_text(s, fonts).rstrip("\n") == "plain\nOK"
