"""Oracle-checked round-trips for the distributed document parsers.

Strategy: render synthetic bank-document text deterministically FROM a
fixture table (pt-BR money via ``format_number``+``translate``,
SURVEY.md F18), feed it through the distributed parser
(``fintrack_etl_spark.parse``), and give DuckDB an oracle that computes
the *expected parse output* directly from the same fixture rows — so
the whole line-classify → forward-fill → regex-extract pipeline is
value-checked by the driver, not just unit-tested.

Reference parity targets: ``extractors/bb_statement.py:84-202``,
``bb_bill.py:169-229``, ``bradesco_bill.py:108-312``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import rules
from .parse import parse_bb_bill, parse_bb_statement, parse_bradesco_bill

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from .io import table

    return table(spark, name, sf_dir)


def _brl(col) -> F.Column:
    """F18 — ``1234.56 → '1.234,56'`` (``compare_budget.py:108-111``)."""
    return F.translate(F.format_number(col, 2), ",.", ".,")


def _doc_text(lines: DataFrame, doc_id: str, order: str, line: str, header: str | None = None):
    """Assemble per-doc text: order-stable array_sort over (order, line)
    structs then newline-join — deterministic under any partitioning."""
    body = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col(order), F.col(line)))),
            lambda s: s[line],
        ),
        "\n",
    )
    text = F.concat(F.lit(header + "\n"), body) if header else body
    return lines.groupBy(doc_id).agg(text.alias("text"))


# ---------------------------------------------------------------------------
# P-BB-STATEMENT — launch + continuation + group forward-fill round-trip
# ---------------------------------------------------------------------------


@register(
    "p1_bb_statement_roundtrip",
    """
    SELECT o_custkey % 50                                    AS doc_id,
           strftime(o_orderdate, '%d/%m/%Y')                 AS data,
           lpad(CAST(o_orderkey AS VARCHAR), 6, '0')         AS lote,
           CAST(NULL AS VARCHAR)                             AS documento,
           'Pix - Enviado'                                   AS grupo,
           o_orderpriority                                   AS historico,
           'REF ' || lpad(CAST(o_orderkey AS VARCHAR), 6, '0') || ' OK' AS complemento,
           o_orderpriority || ' | REF ' || lpad(CAST(o_orderkey AS VARCHAR), 6, '0') || ' OK'
                                                             AS historico_full,
           round(CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice ELSE -o_totalprice END, 2)
                                                             AS valor,
           CASE WHEN o_orderkey % 2 = 0 THEN '+' ELSE '-' END AS sinal
    FROM orders
    """,
)
def p1_bb_statement_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render each order as a BB-statement launch line + a continuation
    line, parse the assembled documents back, compare field-for-field.
    Exercises LAUNCH_RE capture, lote-vs-documento optional groups,
    group-context forward-fill (W2), and continuation merge."""
    o = T(spark, sf_dir, "orders")
    lote = F.lpad(F.col("o_orderkey").cast("string"), 6, "0")
    sinal = F.when(F.col("o_orderkey") % 2 == 0, "+").otherwise("-")
    launch = F.concat_ws(
        " ",
        F.date_format("o_orderdate", "dd/MM/yyyy"),
        lote,
        F.col("o_orderpriority"),
        _brl(F.col("o_totalprice")),
        F.concat(F.lit("("), sinal, F.lit(")")),
    )
    cont = F.concat(F.lit("REF "), lote, F.lit(" OK"))
    chunks = o.select(
        (F.col("o_custkey") % 50).alias("doc_id"),
        F.col("o_orderkey").alias("ord"),
        F.concat_ws("\n", launch, cont).alias("chunk"),
    )
    docs = _doc_text(chunks, "doc_id", "ord", "chunk", header="Pix - Enviado")
    parsed = parse_bb_statement(docs)
    return parsed.select(
        "doc_id",
        "data",
        "lote",
        "documento",
        "grupo",
        "historico",
        "complemento",
        "historico_full",
        F.round("valor", 2).alias("valor"),
        "sinal",
    )


# ---------------------------------------------------------------------------
# P-BB-BILL — card-context blocks + country variant + categorize round-trip
# ---------------------------------------------------------------------------

_BILL_DESC_SQL = """
    CASE CAST(p_partkey % 8 AS INT)
        WHEN 0 THEN 'POSTO IPIRANGA LTDA'
        WHEN 1 THEN 'SUPERMERCADO BOM PRECO'
        WHEN 2 THEN 'NETFLIX.COM MENSAL'
        WHEN 3 THEN 'LOJA DAS FABRICAS PARC 02/04'
        WHEN 4 THEN 'PAGTO DEBITO AUTOMATICO'
        WHEN 5 THEN 'BOUTIQUE CHIC FORTALEZA'
        WHEN 6 THEN 'UBER TRIP 123'
        ELSE 'XYZ DESCONHECIDO'
    END
"""


def _p2_oracle() -> str:
    cat = rules.categorize_sql_case(f"({_BILL_DESC_SQL})")
    return f"""
    SELECT p_partkey % 20                                   AS doc_id,
           CASE WHEN p_partkey % 2 = 0 THEN 'TITULAR ALFA' ELSE 'TITULAR BETA' END
                                                            AS titular_cartao,
           CASE WHEN p_partkey % 2 = 0 THEN '1111' ELSE '2222' END
                                                            AS final_cartao,
           lpad(CAST(p_partkey % 28 + 1 AS VARCHAR), 2, '0') || '/' ||
           lpad(CAST(p_partkey % 12 + 1 AS VARCHAR), 2, '0') AS data,
           CASE WHEN p_partkey % 3 = 0 THEN 'BR' END         AS pais,
           ({_BILL_DESC_SQL})                                AS descricao,
           round(CASE WHEN p_partkey % 7 = 0 THEN -p_retailprice ELSE p_retailprice END, 2)
                                                             AS valor,
           {cat["categoria"]}                                AS categoria,
           {cat["subcategoria"]}                             AS subcategoria,
           {cat["recorrente_suspeita"]}                      AS recorrente_suspeita,
           {cat["parcelado_suspeito"]}                       AS parcelado_suspeito
    FROM part
    """


@register("p2_bb_bill_roundtrip", None)  # oracle attached below (computed)
def p2_bb_bill_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render parts as BB-bill transactions under two card-context
    blocks per document, parse back. Exercises CARD_RE forward-fill,
    the country/no-country regex precedence, negative values, and the
    full F12 categorize chain on the parsed descriptions."""
    p = T(spark, sf_dir, "part")
    h = F.col("p_partkey") % 2
    desc = F.expr(_BILL_DESC_SQL)
    data = F.concat_ws(
        "/",
        F.lpad((F.col("p_partkey") % 28 + 1).cast("string"), 2, "0"),
        F.lpad((F.col("p_partkey") % 12 + 1).cast("string"), 2, "0"),
    )
    signed = F.when(F.col("p_partkey") % 7 == 0, F.concat(F.lit("-"), _brl("p_retailprice"))).otherwise(
        _brl("p_retailprice")
    )
    pais_tok = F.when(F.col("p_partkey") % 3 == 0, F.lit("BR"))
    line = F.concat_ws(" ", data, desc, pais_tok, F.lit("R$"), signed)

    txn = p.select(
        (F.col("p_partkey") % 20).alias("doc_id"),
        (h * F.lit(1_000_000_000) + F.col("p_partkey")).alias("ord"),
        line.alias("ln"),
    )
    ctx = (
        p.select((F.col("p_partkey") % 20).alias("doc_id"), h.alias("h"))
        .distinct()
        .select(
            "doc_id",
            (F.col("h") * F.lit(1_000_000_000) - 1).alias("ord"),
            F.concat(
                F.when(F.col("h") == 0, "TITULAR ALFA").otherwise("TITULAR BETA"),
                F.lit(" (Cartão "),
                F.when(F.col("h") == 0, "1111").otherwise("2222"),
                F.lit(")"),
            ).alias("ln"),
        )
    )
    docs = _doc_text(txn.unionByName(ctx), "doc_id", "ord", "ln")
    parsed = parse_bb_bill(docs)
    return parsed.select(
        "doc_id",
        "titular_cartao",
        "final_cartao",
        "data",
        "pais",
        "descricao",
        F.round("valor", 2).alias("valor"),
        "categoria",
        "subcategoria",
        "recorrente_suspeita",
        "parcelado_suspeito",
    )


ORACLES["p2_bb_bill_roundtrip"] = _p2_oracle()


# ---------------------------------------------------------------------------
# P-BRADESCO — payments vs transactions + city split round-trip
# ---------------------------------------------------------------------------


@register(
    "p3_bradesco_roundtrip",
    """
    SELECT c_custkey % 25                                    AS doc_id,
           'NOME DOIS'                                       AS titular_cartao,
           lpad(CAST(c_custkey % 25 AS VARCHAR), 4, '0')     AS cartao_final,
           lpad(CAST(c_custkey % 28 + 1 AS VARCHAR), 2, '0') || '/' ||
           lpad(CAST(c_custkey % 12 + 1 AS VARCHAR), 2, '0') AS data,
           CASE WHEN c_custkey % 5 = 0 THEN 'PAGTO. POR DEB EM C C'
                ELSE 'STORE' || CAST(c_custkey AS VARCHAR) END AS descricao,
           CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE 'SAO PAULO' END AS cidade,
           round(CASE WHEN c_custkey % 5 = 0 THEN abs(c_acctbal) ELSE c_acctbal END, 2)
                                                             AS valor,
           CASE WHEN c_custkey % 5 = 0 THEN 'pagamento'
                WHEN c_acctbal >= 0 THEN 'compra'
                ELSE 'ajuste' END                            AS tipo
    FROM customer
    """,
)
def p3_bradesco_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render customers as Bradesco bill lines — PAGTO payment rows for
    every 5th customer, generic transactions (3-token rest → 2-token
    city split) otherwise — under one holder-context line per document.
    Exercises PAY_RE vs TXN_RE precedence, is_ignored/sanitize
    pass-through, the desc/city greedy split, and signed values."""
    c = T(spark, sf_dir, "customer")
    doc = (F.col("c_custkey") % 25).alias("doc_id")
    data = F.concat_ws(
        "/",
        F.lpad((F.col("c_custkey") % 28 + 1).cast("string"), 2, "0"),
        F.lpad((F.col("c_custkey") % 12 + 1).cast("string"), 2, "0"),
    )
    is_pay = F.col("c_custkey") % 5 == 0
    signed = F.when(F.col("c_acctbal") < 0, F.concat(F.lit("-"), _brl(F.abs("c_acctbal")))).otherwise(
        _brl(F.col("c_acctbal"))
    )
    pay_line = F.concat_ws(" ", data, F.lit("PAGTO. POR DEB EM C C"), _brl(F.abs("c_acctbal")))
    txn_line = F.concat_ws(
        " ",
        data,
        F.concat(F.lit("STORE"), F.col("c_custkey").cast("string")),
        F.lit("SAO PAULO"),
        signed,
    )
    txn = c.select(
        doc,
        F.col("c_custkey").alias("ord"),
        F.when(is_pay, pay_line).otherwise(txn_line).alias("ln"),
    )
    ctx = (
        txn.select("doc_id")
        .distinct()
        .select(
            "doc_id",
            F.lit(-1).cast("long").alias("ord"),
            F.concat(
                F.lit("NOME DOIS Cartão 4066 XXXX XXXX "),
                F.lpad(F.col("doc_id").cast("string"), 4, "0"),
            ).alias("ln"),
        )
    )
    docs = _doc_text(txn.unionByName(ctx), "doc_id", "ord", "ln")
    parsed = parse_bradesco_bill(docs)
    return parsed.select(
        "doc_id",
        "titular_cartao",
        "cartao_final",
        "data",
        "descricao",
        "cidade",
        F.round("valor", 2).alias("valor"),
        "tipo",
    )
