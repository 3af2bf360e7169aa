"""Bradesco credit-card bill parser, distributed.

Reference semantics (``extractors/bradesco_bill.py:108-312``):

* two context line kinds — ``TITULAR Cartão NNNN XXXX XXXX FFFF``
  (sets holder+card, holder must be ≥2 words and not the "Número do
  Cartão" false-positive) and ``Número do Cartão ...`` (sets card
  only);
* noise filtering — short non-date lines, a 30-entry ignore-substring
  list, tail-cut sanitization, and contaminated lines (≥2 money
  tokens);
* ``PAGTO.`` payment rows (trailing-minus money) vs generic
  transactions (desc/city tail split, tipo compra/ajuste by sign);
* NULL holders backfilled with the per-card mode (J2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import brl_to_double, normalize_space
from ..operators.joins import mode_backfill
from .lines import explode_lines, extract_all_groups, group_template, running_last

#: ``bradesco_bill.py:112-115``
CARD_CTX_RE = r"(?i)^(.+?)\s+Cart[aã]o\s+\d{4}\s+X{4}\s+X{4}\s+(\d{4})$"
#: ``bradesco_bill.py:118-121``
CARD_NUMBER_RE = r"(?i)^N[uú]mero do Cart[aã]o\s+\d{4}\s+X{4}\s+X{4}\s+(\d{4})$"
#: ``bradesco_bill.py:156-159``
PAY_RE = r"(?i)^(\d{2}/\d{2})\s+(PAGTO\..*?)\s+([\d\.\,]+-?)\b"
#: ``bradesco_bill.py:162-164``
TXN_RE = r"^(\d{2}/\d{2})\s+(.+?)\s+(-?[\d\.\,]+)\s*$"
DATE_PREFIX_RE = r"^\d{2}/\d{2}\s"
MONEY_TOKEN_RE = r"\b\d{1,3}(?:\.\d{3})*,\d{2}-?\b"

#: ``bradesco_bill.py:166-196``
IGNORE_CONTAINS = (
    "página ",
    "número do cartão",
    "cotação",
    "data histórico",
    "do dólar",
    "central de atendimento",
    "mensagem importante",
    "programa de fidelidade",
    "pontos acumulados",
    "saldo de pontos",
    "associado",
    "para consultar",
    "juros",
    "iof",
    "valor em r$",
    "taxas mensais",
    "crédito rotativo",
    "pagamento de contas",
    "parcelamento fatura",
    "compras parceladas",
    "total da fatura em real",
    "total da fatura",
    "total utilizado",
    "disponível em",
    "limites",
    "limite de compras",
    "limite de saque",
    "compras r$",
    "saque r$",
)

#: ``bradesco_bill.py:206-218``
SANITIZE_CUTS = (
    " Total para as próximas faturas",
    " Compras R$",
    " Saque R$",
    " Total Utilizado",
    " Disponível em",
    " Taxas mensais",
    " Pagamento de Contas",
    " Parcelamento Fatura",
    " Compras Parceladas",
    " Crédito Rotativo",
)


def _valid_titular(titular: Column) -> Column:
    """``maybe_update_ctx`` validations (``bradesco_bill.py:259-281``)
    on an already-extracted, whitespace-normalized titular."""
    tl = F.lower(titular)
    return (
        ~tl.isin("número do", "numero do")
        & ~tl.contains("número do cartão")
        & ~tl.contains("numero do cartao")
        & (F.size(F.split(titular, r"\s+")) >= 2)
    )


def _is_ignored(ln: Column) -> Column:
    """``is_ignored`` (``bradesco_bill.py:200-204``)."""
    lower = F.lower(ln)
    short_junk = ~ln.rlike(DATE_PREFIX_RE) & (F.length(ln) < 8)
    contains_any = F.lit(False)
    for s in IGNORE_CONTAINS:
        contains_any = contains_any | lower.contains(s)
    return short_junk | contains_any


def _sanitize(ln: Column) -> Column:
    """``sanitize_line`` — truncate at the first occurrence of each cut
    marker, in order (``bradesco_bill.py:206-222``)."""
    out = ln
    for cut in SANITIZE_CUTS:
        out = F.trim(F.substring_index(out, cut, 1))
    return out


def split_desc_city(rest: Column) -> Column:
    """``split_desc_city`` (``bradesco_bill.py:225-238``): greedily try
    the last 3, 2, then 1 tokens as the city — accepted when the tail
    contains a letter, has no ``/``/``*``, and at least one head token
    remains. Returns ``struct(descricao, cidade)``."""
    toks = F.split(rest, " ")
    size = F.size(toks)

    def cand(n: int):
        city = F.array_join(F.slice(toks, -n, n), " ")
        head = F.array_join(F.slice(toks, 1, size - n), " ")
        ok = (size > n) & city.rlike("[A-Za-zÀ-ÿ]") & ~city.rlike(r"[/*]")
        return ok, head, city

    expr = None
    for n in (3, 2, 1):
        ok, head, city = cand(n)
        branch = F.struct(head.alias("descricao"), city.alias("cidade"))
        expr = F.when(ok, branch) if expr is None else expr.when(ok, branch)
    return expr.otherwise(F.struct(rest.alias("descricao"), F.lit(None).cast("string").alias("cidade")))


def parse_bradesco_bill(
    docs: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    backfill_titular: bool = True,
) -> DataFrame:
    """(doc_id, text) → typed lançamentos (FIXTURES.md A3 schema)."""
    lines = explode_lines(docs, doc_id, text_col)
    ln = F.col("ln")

    # All per-line work (context validation, ignore/sanitize, payment-vs-
    # transaction dispatch, group extraction, desc/city split) happens in
    # this pre-shuffle stage with single-pass group splits; only the two
    # context forward-fills need the per-document window.
    ctx = F.when(ln.rlike(CARD_CTX_RE), extract_all_groups(ln, CARD_CTX_RE, group_template(1, 2)))
    titular_raw = normalize_space(ctx[0])
    is_ctx = ctx.isNotNull() & _valid_titular(titular_raw)
    is_cardnum = ln.rlike(CARD_NUMBER_RE)

    s = _sanitize(ln)
    is_pay = s.rlike(PAY_RE)
    contaminated = (
        s.rlike(DATE_PREFIX_RE)
        & (F.size(F.regexp_extract_all(s, F.lit(MONEY_TOKEN_RE), F.lit(0))) >= 2)
    )
    is_txn = s.rlike(TXN_RE)

    # PAY_RE is not end-anchored — extend the replace pattern to eat the
    # tail so the single-pass split sees only the captured groups
    gp = F.when(is_pay, extract_all_groups(s, PAY_RE + r".*$", group_template(1, 2, 3)))
    gt = F.when(is_txn, extract_all_groups(s, TXN_RE, group_template(1, 2, 3)))

    pay_raw = gp[2]
    pay_val = F.when(
        pay_raw.endswith("-"), -brl_to_double(F.regexp_replace(pay_raw, "-$", ""))
    ).otherwise(brl_to_double(pay_raw))
    txn_val = brl_to_double(gt[2])
    dc = split_desc_city(normalize_space(gt[1]))

    classified = lines.select(
        doc_id,
        "line_no",
        is_ctx.alias("is_ctx"),
        is_cardnum.alias("is_cardnum"),
        F.when(is_ctx, F.upper(titular_raw)).alias("titular_ctx"),
        F.when(is_ctx, ctx[1])
        .when(is_cardnum, F.regexp_extract(ln, CARD_NUMBER_RE, 1))
        .alias("cartao_ctx"),
        (
            ~_is_ignored(ln)
            & (s != "")
            & (is_pay | (~contaminated & is_txn & txn_val.isNotNull()))
        ).alias("keep"),
        F.when(is_pay, gp[0]).otherwise(gt[0]).alias("data"),
        F.when(is_pay, normalize_space(gp[1])).otherwise(dc["descricao"]).alias("descricao"),
        F.when(is_pay, F.lit(None).cast("string")).otherwise(dc["cidade"]).alias("cidade"),
        F.when(is_pay, pay_val).otherwise(txn_val).alias("valor"),
        F.when(is_pay, F.lit("pagamento"))
        .when(txn_val >= 0, F.lit("compra"))
        .otherwise(F.lit("ajuste"))
        .alias("tipo"),
    )

    with_ctx = classified.select(
        doc_id,
        "line_no",
        "is_ctx",
        "is_cardnum",
        "keep",
        "data",
        "descricao",
        "cidade",
        "valor",
        "tipo",
        running_last(F.col("titular_ctx"), doc_id).alias("titular_cartao"),
        running_last(F.col("cartao_ctx"), doc_id).alias("cartao_final"),
    )

    parsed = with_ctx.filter(~F.col("is_ctx") & ~F.col("is_cardnum") & F.col("keep")).select(
        doc_id,
        "line_no",
        "titular_cartao",
        "cartao_final",
        "data",
        "descricao",
        "cidade",
        "valor",
        "tipo",
    )

    if backfill_titular:
        parsed = mode_backfill(parsed, "cartao_final", "titular_cartao")
    return parsed
