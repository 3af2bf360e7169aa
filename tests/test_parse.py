"""Distributed document-parser tests (SURVEY.md §2.11 / §7 Phase 2).

Handcrafted document texts encode the reference parsers' tricky cases
(reference: ``extractors/bb_statement.py:84-202``,
``bb_bill.py:169-229``, ``bradesco_bill.py:108-312``):
multi-line histórico continuation, group/section forward-fill,
PAGTO-before-card-block with mode backfill, contaminated lines,
sanitize tail-cuts, and the desc/city tail split.
"""

from __future__ import annotations

import pytest

from fintrack_etl_spark.parse import (
    parse_bb_bill,
    parse_bb_statement,
    parse_bradesco_bill,
)

BB_STATEMENT = """\
Extrato de Conta Corrente
Lançamentos
Dia Lote Documento Histórico Valor
Pix - Enviado
01/02/2024 12345 67890 Transferência enviada 1.234,56 (-)
CPF 123.456.789-00 conta 1111-2
02/02/2024 Pix QR code dinâmico 10,00 (-)
Saldo do dia
03/02/2024 S A L D O 5.000,00 (+)
Pix - Recebido
04/02/2024 99999 Pagamento recebido 2.000,00 (+)
ref 2024-02-04 id 777
"""


def test_bb_statement_parse(spark):
    docs = spark.createDataFrame([(1, BB_STATEMENT)], ["doc_id", "text"])
    rows = {r["line_no"]: r for r in parse_bb_statement(docs).collect()}
    assert len(rows) == 4

    r1 = rows[4]
    assert r1["data"] == "01/02/2024"
    assert r1["lote"] == "12345"
    assert r1["documento"] == "67890"
    assert r1["grupo"] == "Pix - Enviado"
    assert r1["historico"] == "Transferência enviada"
    assert r1["complemento"] == "CPF 123.456.789-00 conta 1111-2"
    assert r1["historico_full"] == "Transferência enviada | CPF 123.456.789-00 conta 1111-2"
    assert r1["valor"] == pytest.approx(-1234.56)
    assert r1["sinal"] == "-"

    r2 = rows[6]
    assert r2["lote"] is None and r2["documento"] is None
    assert r2["historico"] == "Pix QR code dinâmico"
    assert r2["complemento"] == ""
    assert r2["historico_full"] == "Pix QR code dinâmico"
    assert r2["valor"] == pytest.approx(-10.0)

    r3 = rows[8]
    assert r3["grupo"] == "Saldo do dia"
    assert r3["valor"] == pytest.approx(5000.0)

    r4 = rows[10]
    assert r4["grupo"] == "Pix - Recebido"
    assert r4["lote"] == "99999"
    assert r4["complemento"] == "ref 2024-02-04 id 777"
    assert r4["valor"] == pytest.approx(2000.0)


BB_BILL = """\
JOAO DA SILVA (Cartão 1234)
01/02 NETFLIX.COM BR R$ 55,90
05/02 RESTAURANTE FOGO ALTO R$ 123,45
MARIA DA SILVA (Cartão 5678)
10/02 PGTO DEBITO CONTA 1111 R$ -500,00
11/02 AMAZON MKTPLACE US R$ 1.050,00
"""


def test_bb_bill_parse(spark):
    docs = spark.createDataFrame([(7, BB_BILL)], ["doc_id", "text"])
    out = parse_bb_bill(docs)
    rows = {r["line_no"]: r for r in out.collect()}
    assert len(rows) == 4

    r1 = rows[1]
    assert r1["titular_cartao"] == "JOAO DA SILVA"
    assert r1["final_cartao"] == "1234"
    assert r1["data"] == "01/02"
    assert r1["pais"] == "BR"
    assert r1["descricao"] == "NETFLIX.COM"
    assert r1["valor"] == pytest.approx(55.90)

    r2 = rows[2]
    assert r2["pais"] is None
    assert r2["descricao"] == "RESTAURANTE FOGO ALTO"

    r3 = rows[4]
    assert r3["titular_cartao"] == "MARIA DA SILVA"
    assert r3["final_cartao"] == "5678"
    assert r3["valor"] == pytest.approx(-500.0)

    r4 = rows[5]
    assert r4["pais"] == "US"
    assert r4["valor"] == pytest.approx(1050.0)

    # category columns present and populated (F12 applied to every row)
    assert {"categoria", "subcategoria", "recorrente_suspeita", "parcelado_suspeito"} <= set(
        out.columns
    )
    assert all(r["categoria"] is not None for r in rows.values())


BRADESCO_BILL = """\
03/04 PAGTO. POR DEB EM C/C 1.500,00-
02/04 PAGTO. INTERNET 2.000,00-D
JOAO DA SILVA Cartão 4066 XXXX XXXX 9953
05/04 SUPERMERCADO BOM PRECO SAO PAULO 250,00
06/04 POSTO SHELL 1.000,00 SALDO ANTERIOR 2.000,00
07/04 ESTORNO COMPRA RIO JANEIRO -99,90
Página 2 de 3
Número do Cartão 4066 XXXX XXXX 0039
08/04 LIVRARIA BAIRRO CULTURA 80,00 Total para as próximas faturas 9.999,99
xx
"""


def test_bradesco_bill_parse(spark):
    docs = spark.createDataFrame([(3, BRADESCO_BILL)], ["doc_id", "text"])
    out = parse_bradesco_bill(docs)
    rows = {r["line_no"]: r for r in out.collect()}
    # contaminated (line 4), page marker, short junk all dropped
    assert len(rows) == 5

    pay = rows[0]
    assert pay["tipo"] == "pagamento"
    # reference quirk (bradesco_bill.py:156-159): the '\\b' after '-?'
    # rejects a trailing minus at end-of-line, so the sign is dropped —
    # Java regex reproduces Python's behavior exactly
    assert pay["valor"] == pytest.approx(1500.0)
    assert pay["descricao"] == "PAGTO. POR DEB EM C/C"
    assert pay["cidade"] is None
    assert pay["cartao_final"] is None  # payment precedes any card block
    # mode backfill: NULL titular filled from per-card mode — but card is
    # NULL here, so it stays NULL (faithful to reference fillna-by-map)
    assert pay["titular_cartao"] is None

    pay2 = rows[1]
    assert pay2["tipo"] == "pagamento"
    # minus followed by a word char IS captured → sign applied
    assert pay2["valor"] == pytest.approx(-2000.0)

    buy = rows[3]
    assert buy["titular_cartao"] == "JOAO DA SILVA"
    assert buy["cartao_final"] == "9953"
    assert buy["descricao"] == "SUPERMERCADO BOM"
    assert buy["cidade"] == "PRECO SAO PAULO"
    assert buy["tipo"] == "compra"
    assert buy["valor"] == pytest.approx(250.0)

    adj = rows[5]
    assert adj["tipo"] == "ajuste"
    assert adj["valor"] == pytest.approx(-99.90)
    # greedy 3-token city split, faithful to bradesco_bill.py:225-238
    assert adj["descricao"] == "ESTORNO"
    assert adj["cidade"] == "COMPRA RIO JANEIRO"

    cut = rows[8]  # sanitize cut " Total para as próximas faturas..." then parse
    assert cut["cartao_final"] == "0039"  # Número do Cartão switched card
    assert cut["titular_cartao"] == "JOAO DA SILVA"  # forward-filled holder
    assert cut["descricao"] == "LIVRARIA"
    assert cut["cidade"] == "BAIRRO CULTURA"
    assert cut["valor"] == pytest.approx(80.0)


def test_bradesco_mode_backfill(spark):
    # PAGTO before the card block but with a card set by "Número do
    # Cartão": titular NULL → backfilled from the per-card mode.
    text = """\
Número do Cartão 4066 XXXX XXXX 9953
03/04 PAGTO. POR DEB EM C/C 1.500,00-
JOAO DA SILVA Cartão 4066 XXXX XXXX 9953
05/04 SUPERMERCADO BOM PRECO SAO PAULO 250,00
06/04 FARMACIA CENTRAL RECIFE 50,00
"""
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = {r["line_no"]: r for r in parse_bradesco_bill(docs).collect()}
    assert rows[1]["titular_cartao"] == "JOAO DA SILVA"
    assert rows[1]["cartao_final"] == "9953"

    unfilled = parse_bradesco_bill(docs, backfill_titular=False)
    raw = {r["line_no"]: r for r in unfilled.collect()}
    assert raw[1]["titular_cartao"] is None


def test_parsers_scale_over_many_docs(spark):
    """The same parse is a single distributed plan over N docs."""
    docs = spark.createDataFrame(
        [(i, BB_STATEMENT) for i in range(50)], ["doc_id", "text"]
    ).repartition(8)
    out = parse_bb_statement(docs)
    assert out.count() == 50 * 4
    assert out.select("doc_id").distinct().count() == 50


def test_pandas_fallback_matches_native(spark):
    """The applyInPandas escape hatch must be value-identical to the
    native DataFrame parser on every tricky shape: orphan continuation
    (group opened, no launch), multi-line continuations, optional
    lote/documento groups, trailing open launch at EOF."""
    from fintrack_etl_spark.parse.bb_statement import parse_bb_statement
    from fintrack_etl_spark.parse.pandas_fallback import parse_bb_statement_pandas

    texts = [
        (
            1,
            "Extrato de Conta Corrente\nPix - Enviado\norphan continuation 77\n"
            "01/02/2024 000123 PAGAMENTO PIX 1.234,56 (-)\nREF 000123 OK\nmore detail\n"
            "Saldo do dia\n02/02/2024 TARIFA  BANCARIA 10,00 (-)\n",
        ),
        (2, "Recebimento de Proventos\n03/03/2024 0009 000111 SALARIO ACME 5.899,51 (+)\n"),
        (3, "no groups here\n04/04/2024 COMPRA PADARIA 33,00 (-)\ncont A\ncont B"),
    ]
    docs = spark.createDataFrame(texts, ["doc_id", "text"])
    native = parse_bb_statement(docs)
    fallback = parse_bb_statement_pandas(docs)
    assert native.columns == fallback.columns
    assert [str(f.dataType) for f in native.schema.fields] == [
        str(f.dataType) for f in fallback.schema.fields
    ]
    n = sorted(tuple(r) for r in native.collect())
    f = sorted(tuple(r) for r in fallback.collect())
    assert n == f
    assert len(n) == 4


def test_oversized_document_quarantined_not_parsed(spark):
    """One pathological multi-GB document must not serialize onto a
    single window task: past ``max_lines`` it is withheld from the
    parsers and surfaces as a quarantine row (same policy as a corrupt
    binary file)."""
    from fintrack_etl_spark.parse import parse_bb_statement
    from fintrack_etl_spark.parse.lines import explode_lines, split_oversized

    big = "\n".join(f"linha {i}" for i in range(51))
    docs = spark.createDataFrame(
        [(1, BB_STATEMENT), (2, big)], ["doc_id", "text"]
    )

    ok, bad = split_oversized(docs, max_lines=50)
    assert [r.doc_id for r in ok.collect()] == [1]
    q = bad.collect()
    assert len(q) == 1 and q[0].doc_id == 2 and q[0].n_lines == 51
    assert "oversized document" in q[0].quarantine_reason

    # the parser path itself enforces the same bound
    lines = explode_lines(docs, max_lines=50)
    assert lines.select("doc_id").distinct().collect() == [
        r for r in lines.select("doc_id").distinct().collect() if r.doc_id == 1
    ]
    parsed = parse_bb_statement(docs.filter("doc_id = 1"))
    assert parsed.count() == 4  # untouched docs parse exactly as before
