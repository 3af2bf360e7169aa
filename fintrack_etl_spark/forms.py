"""Google-Forms expense-sheet normalization as DataFrame ops.

Reference: ``etls_raw/forms_main.py:207-276`` — messy Forms headers
(embedded newlines like ``"Valor:\\nExemplo: R$40,00"``) are renamed to
canonical names, required columns are guaranteed (NULL-backfilled),
the BRL value string is parsed to double, and a constant
``client_slug`` is attached. The reference does this in driver pandas;
here it is a logical-plan rewrite — zero data movement until an action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions import brl_to_double

#: ``forms_main.py:228-238`` — Forms header → canonical name
FORM_COL_MAP: dict[str, str] = {
    "Carimbo de data/hora": "carimbo de data/hora",
    "LANÇAMENTO FEITO POR:": "lançamento feito por:",
    "DATA DO PAGAMENTO": "data do pagamento",
    "VENCIMENTO\nColocar sempre o mês da prestação de conta": "vencimento",
    "DESCRIÇÃO": "descricao",
    "Valor:\nExemplo: R$40,00": "valor",
    "TIPO DE CUSTO": "tipo_de_custo",
    "CATEGORIA": "categoria",
}

#: ``forms_main.py:245-255`` — canonical RAW layout, in order
REQUIRED_COLUMNS: tuple[str, ...] = (
    "carimbo de data/hora",
    "lançamento feito por:",
    "data do pagamento",
    "vencimento",
    "descricao",
    "valor",
    "tipo_de_custo",
    "categoria",
)


def rename_present(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """P1 — rename only the columns that exist
    (``transform/helpers.py:9-14``)."""
    effective = {src: dst for src, dst in mapping.items() if src in df.columns}
    return df.withColumnsRenamed(effective)


def ensure_columns(df: DataFrame, required: tuple[str, ...], fill_type: str = "string") -> DataFrame:
    """NULL-backfill any missing required column
    (``forms_main.py:245-255``)."""
    missing = [c for c in required if c not in df.columns]
    if not missing:
        return df
    return df.withColumns({c: F.lit(None).cast(fill_type) for c in missing})


def normalize_forms(df: DataFrame, client_slug: str) -> DataFrame:
    """Full ``parse_forms_csv_to_pandas`` pipeline
    (``forms_main.py:207-276``): rename → backfill → BRL parse →
    client_slug → canonical column order."""
    out = rename_present(df, FORM_COL_MAP)
    out = ensure_columns(out, REQUIRED_COLUMNS)
    out = out.withColumn("valor", brl_to_double(F.col("valor").cast("string")))
    out = out.withColumn("client_slug", F.lit(client_slug))
    return out.select(*[F.col(f"`{c}`") for c in REQUIRED_COLUMNS], "client_slug")
