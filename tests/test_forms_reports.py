"""Forms normalization + reports unit tests (SURVEY.md §7 Phase 2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fintrack_etl_spark.forms import FORM_COL_MAP, REQUIRED_COLUMNS, normalize_forms
from fintrack_etl_spark import reports


def test_normalize_forms_renames_backfills_and_parses(spark):
    messy = spark.createDataFrame(
        [("Alice", "R$ 1.234,56", "Mercado"), ("Bob", "abc", None)],
        ["LANÇAMENTO FEITO POR:", "Valor:\nExemplo: R$40,00", "CATEGORIA"],
    )
    out = normalize_forms(messy, "acme")
    assert out.columns == list(REQUIRED_COLUMNS) + ["client_slug"]
    rows = out.orderBy("lançamento feito por:").collect()
    assert rows[0]["valor"] == pytest.approx(1234.56)
    assert rows[0]["categoria"] == "Mercado"
    assert rows[0]["descricao"] is None  # missing column NULL-backfilled
    assert rows[0]["client_slug"] == "acme"
    assert rows[1]["valor"] is None  # garbage → NULL (reference F1 semantics)


def test_normalize_forms_idempotent_on_canonical(spark):
    # pt-BR input: '.' is a thousands separator, ',' the decimal mark
    canon = spark.createDataFrame([("x", "1.500,75")], ["descricao", "valor"])
    out = normalize_forms(canon, "c")
    assert out.count() == 1
    assert out.first()["valor"] == pytest.approx(1500.75)


def test_reports_pipeline(spark):
    lanc = spark.createDataFrame(
        [
            (1, "01/02/2024", "A", "Mercado", None, 100.0, False, True),
            (2, "02/02/2024", "B", "Mercado", None, -40.0, True, False),
            (3, "03/02/2024", "C", "Transporte", None, None, None, None),
        ],
        "lanc_id long, data string, descricao string, categoria string, "
        "subcategoria string, valor double, parcelado_suspeito boolean, "
        "recorrente_suspeita boolean",
    )
    norm = reports.normalize_lancamentos(lanc)
    by_cat = {r["categoria"]: r["total"] for r in reports.monthly_by_category(norm).collect()}
    assert by_cat == {"Mercado": 60.0, "Transporte": 0.0}

    rec = reports.recorrentes_by_category(norm).collect()
    assert len(rec) == 1 and rec[0]["total_recorrente_suspeito"] == pytest.approx(100.0)

    top = reports.top_gastos(norm, n=2)
    assert [r["descricao"] for r in top.collect()] == ["A", "B"]

    budget = spark.createDataFrame(
        [("Mercado", 50.0), ("Viagem", 10.0)], ["categoria", "orcado"]
    )
    cmp = {r["categoria"]: r for r in reports.compare_budget(norm, budget).collect()}
    assert cmp["Mercado"]["status"] == "ESTOURO"
    assert cmp["Mercado"]["diferenca"] == pytest.approx(10.0)
    assert cmp["Mercado"]["pct_esto"] == pytest.approx(20.0)
    assert cmp["Viagem"]["realizado"] == 0.0 and cmp["Viagem"]["status"] == "OK"
    assert cmp["Transporte"]["sem_orcamento"] is True


def test_form_col_map_covers_required():
    assert set(FORM_COL_MAP.values()) == set(REQUIRED_COLUMNS)
