"""Resumo/header extraction tests (reference ``parse_resumo`` /
``parse_header`` semantics, one row per document)."""

from __future__ import annotations

import pytest

from fintrack_etl_spark.parse import (
    parse_bb_bill_resumo,
    parse_bb_statement_header,
    parse_bradesco_resumo,
)

BB_BILL_TEXT = """\
JOAO DA SILVA RUA DAS FLORES 100
AV BRASIL 1200, FORTALEZA CE - 60123456
OUROCARD VISA fatura de OUROCARD
Cartão de crédito ABRIL vencimento
Vencimento 10/05/2024
Valor R$ 5.899,51
Limite único R$ 20.000,00
Limite único utilizado R$ 6.797,51
Limite único disponível R$ 13.202,49
Saldo fatura anterior R$ 1.000,00
Pagamentos/Créditos R$ -1.000,00
Compras nacionais R$ 5.500,00
Compras internacionais R$ 399,51
Tarifas, encargos e multas R$ 0,00
Saldo parcelado em faturas futuras R$ 123,45
Pagamento mínimo R$ 589,95
Fatura fechada em 01/05/2024
Fechamento da próxima fatura 01/06/2024
Melhor data de compra 02/06/2024
"""


def test_bb_bill_resumo(spark):
    docs = spark.createDataFrame([(1, BB_BILL_TEXT)], ["doc_id", "text"])
    r = parse_bb_bill_resumo(docs).first()
    assert r["titular"] == "JOAO DA SILVA"
    assert r["endereco"] == "AV BRASIL 1200, FORTALEZA CE - 60123456"
    # 'fatura de OUROCARD' triggers the month-name fallback → ABRIL
    assert r["mes_referencia"] == "ABRIL"
    assert r["vencimento"] == "10/05/2024"
    assert r["valor_total"] == pytest.approx(5899.51)
    assert r["limite_unico"] == pytest.approx(20000.0)
    assert r["limite_utilizado"] == pytest.approx(6797.51)
    assert r["limite_disponivel"] == pytest.approx(13202.49)
    assert r["saldo_anterior"] == pytest.approx(1000.0)
    assert r["pagamentos_creditos"] == pytest.approx(-1000.0)
    assert r["compras_nacionais"] == pytest.approx(5500.0)
    assert r["compras_internacionais"] == pytest.approx(399.51)
    assert r["tarifas_encargos_multas"] == pytest.approx(0.0)
    assert r["saldo_parcelado_futuro"] == pytest.approx(123.45)
    assert r["pagamento_minimo"] == pytest.approx(589.95)
    assert r["fatura_fechada_em"] == "01/05/2024"
    assert r["fechamento_proxima_fatura"] == "01/06/2024"
    assert r["melhor_data_compra"] == "02/06/2024"


def test_bb_bill_resumo_fallbacks(spark):
    text = "algo\nTotal R$ 123,45\nVencimento\nem breve na pagina 2 dia 15/07/2024\nvalor mínimo de pagamento:\nR$ 12,34\n"
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = parse_bb_bill_resumo(docs).first()
    assert r["valor_total"] == pytest.approx(123.45)  # 3rd probe (Total)
    assert r["vencimento"] == "15/07/2024"  # date-after-keyword window
    assert r["pagamento_minimo"] == pytest.approx(12.34)  # DOTALL probe
    assert r["titular"] is None and r["mes_referencia"] is None


BB_STMT_TEXT = """\
Extrato de Conta Corrente
Cliente JOAO DA SILVA
Período: 01 a 30/11/2025
Agência: 4041-X Conta: 18506-7
"""


def test_bb_statement_header(spark):
    docs = spark.createDataFrame([(9, BB_STMT_TEXT)], ["doc_id", "text"])
    r = parse_bb_statement_header(docs).first()
    assert r["cliente"] == "JOAO DA SILVA"
    assert r["periodo_inicio"] == "01/11/2025"
    assert r["periodo_fim"] == "30/11/2025"
    assert r["competencia"] == "2025-11"
    assert r["agencia"] == "4041-X"
    assert r["conta"] == "18506-7"


BRADESCO_TEXT = """\
VISA INFINITE PRIME
bla
JOAO DA SILVA MAIA
CENTRO
Total da fatura ............. R$ 12.027,45 05/12/2025
Previsão de fechamento da próxima fatura: 28/12/2025
Limite de compras Limite de saque R$ 50.000,00 R$ 10.000,00
Pagamento mínimo R$ 1.202,74
Saldo anterior ........ R$ 2.000,00
(-) Créditos/Pagamentos ..... R$ 2.000,00
(+) Compras/Débitos ....... R$ 12.027,45
(=) Total ......... R$ 12.027,45
"""


def test_bradesco_resumo(spark):
    docs = spark.createDataFrame([(3, BRADESCO_TEXT)], ["doc_id", "text"])
    r = parse_bradesco_resumo(docs).first()
    assert r["titular"] == "JOAO DA SILVA MAIA"
    assert r["produto"] == "VISA INFINITE PRIME"
    assert r["total_fatura"] == pytest.approx(12027.45)
    assert r["vencimento"] == "05/12/2025"
    assert r["fechamento_proxima"] == "28/12/2025"
    assert r["limite_compras"] == pytest.approx(50000.0)
    assert r["limite_saque"] == pytest.approx(10000.0)
    assert r["pagamento_minimo"] == pytest.approx(1202.74)
    assert r["saldo_anterior"] == pytest.approx(2000.0)
    assert r["creditos_pagamentos"] == pytest.approx(2000.0)
    assert r["compras_debitos"] == pytest.approx(12027.45)
    assert r["total_resumo"] == pytest.approx(12027.45)


def test_bradesco_titular_fallback_from_card_block(spark):
    text = "VISA GOLD\nx\nMARIA DA SILVA Cartão 4066 XXXX XXXX 9953\n"
    docs = spark.createDataFrame([(4, text)], ["doc_id", "text"])
    r = parse_bradesco_resumo(docs).first()
    assert r["titular"] == "MARIA DA SILVA"
