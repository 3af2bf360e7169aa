"""BB credit-card bill parser, distributed.

Reference semantics (``extractors/bb_bill.py:169-229``):

* ``... (Cartão NNNN)`` lines set the (holder, card) context;
* transactions are ``dd/MM desc [XX] R$ [-]valor`` (optional 2-letter
  country);
* every parsed row is enriched by the category rule engine (F12).

Re-expression: one regex dispatch + two forward-fills + the compiled
``categorize`` when-chain. No state, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import brl_to_double, normalize_space
from ..rules import DEFAULT_RULES, categorize
from .lines import explode_lines, running_last

#: ``bb_bill.py:172`` (case-insensitive)
CARD_RE = r"(?i)^(.*)\s+\(Cartão\s+(\d{4})\)\s*$"
#: ``bb_bill.py:174-176``
TXN_COUNTRY_RE = r"^(\d{2}/\d{2})\s+(.+?)\s+([A-Z]{2})\s+R\$\s*(-?[\d\.\,]+)\s*$"
#: ``bb_bill.py:178-180``
TXN_RE = r"^(\d{2}/\d{2})\s+(.+?)\s+R\$\s*(-?[\d\.\,]+)\s*$"


def parse_bb_bill(
    docs: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    rules=DEFAULT_RULES,
) -> DataFrame:
    """(doc_id, text) → categorized lançamentos (FIXTURES.md A2 schema)."""
    lines = explode_lines(docs, doc_id, text_col)
    ln = F.col("ln")

    classified = lines.select(
        doc_id,
        "line_no",
        "ln",
        ln.rlike(CARD_RE).alias("is_card"),
        ln.rlike(TXN_COUNTRY_RE).alias("is_txn_country"),
        ln.rlike(TXN_RE).alias("is_txn"),
    )

    with_ctx = classified.select(
        doc_id,
        "line_no",
        "ln",
        "is_card",
        "is_txn_country",
        "is_txn",
        running_last(
            F.when(F.col("is_card"), normalize_space(F.regexp_extract(ln, CARD_RE, 1))), doc_id
        ).alias("titular_cartao"),
        running_last(F.when(F.col("is_card"), F.regexp_extract(ln, CARD_RE, 2)), doc_id).alias(
            "final_cartao"
        ),
    )

    # country variant wins when both match (reference tries it first)
    txns = with_ctx.filter(~F.col("is_card") & (F.col("is_txn_country") | F.col("is_txn")))
    pat = F.when(F.col("is_txn_country"), F.lit(0)).otherwise(F.lit(1))
    data = F.when(pat == 0, F.regexp_extract(ln, TXN_COUNTRY_RE, 1)).otherwise(
        F.regexp_extract(ln, TXN_RE, 1)
    )
    desc = F.when(pat == 0, F.regexp_extract(ln, TXN_COUNTRY_RE, 2)).otherwise(
        F.regexp_extract(ln, TXN_RE, 2)
    )
    pais = F.when(pat == 0, F.regexp_extract(ln, TXN_COUNTRY_RE, 3))
    valor = F.when(pat == 0, brl_to_double(F.regexp_extract(ln, TXN_COUNTRY_RE, 4))).otherwise(
        brl_to_double(F.regexp_extract(ln, TXN_RE, 3))
    )

    parsed = txns.select(
        doc_id,
        "line_no",
        "titular_cartao",
        "final_cartao",
        data.alias("data"),
        pais.alias("pais"),
        normalize_space(desc).alias("descricao"),
        valor.alias("valor"),
    )

    cat = categorize(F.col("descricao"), rules)
    return parsed.select(
        "*",
        cat["categoria"].alias("categoria"),
        cat["subcategoria"].alias("subcategoria"),
        cat["recorrente_suspeita"].alias("recorrente_suspeita"),
        cat["parcelado_suspeito"].alias("parcelado_suspeito"),
    )
