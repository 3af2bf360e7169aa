"""BB checking-account statement parser, distributed.

Reference semantics (``extractors/bb_statement.py:84-202``):

* a *group* line ("Pix - Enviado", "Saldo do dia", short alpha-only
  titles) sets the section context for subsequent launches and closes
  any open launch;
* a *launch* line is ``dd/mm/aaaa [lote] [doc] histórico valor (+|-)``;
* every other non-header line is a *continuation* appended to the open
  launch's ``complemento`` (a continuation after a group line but
  before any launch belongs to nothing).

Re-expression: classify each line once, forward-fill the group
context, assign run-ids at (group|launch) boundaries, aggregate
continuation lines per run, join back to the launch that opened the
run. Two window passes + one groupBy, all keyed by document id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import brl_to_double, normalize_space
from .lines import (
    collect_joined,
    explode_lines,
    extract_all_groups,
    group_template,
    running_last,
    segment_id,
)

#: ``bb_statement.py:97-103`` — groups: data, lote, doc, hist, valor, sinal
LAUNCH_RE = r"^(\d{2}/\d{2}/\d{4})\s+(?:(\d{3,})\s+)?(?:(\d{3,})\s+)?(.*?)\s*([\d\.\,]+)\s+\(([+-])\)\s*$"

#: ``bb_statement.py:106-110`` — table headers to drop
HEADER_LINES = (
    "Lançamentos",
    "Dia Lote Documento Histórico Valor",
    "Extrato de Conta Corrente",
)

#: ``bb_statement.py:125-127`` — known section names
KNOWN_GROUPS = (
    "pix - enviado",
    "pix - recebido",
    "pagamento de boleto",
    "recebimento de proventos",
    "cobrança de juros",
    "cobrança de i.o.f.",
    "bb rende fácil",
)


def _is_group(ln) -> F.Column:
    """``is_group_line`` heuristic (``bb_statement.py:106-130``)."""
    starts_with_date = ln.rlike(r"^\d{2}/\d{2}/\d{4}\b")
    lower = F.lower(ln)
    short_title = (F.length(ln) <= 40) & ln.rlike("[A-Za-zÀ-ÿ]") & ~ln.rlike(r"\d")
    dashed = ln.contains(" - ") & (F.length(ln) <= 60)
    return (
        ~starts_with_date
        & ~ln.isin(*HEADER_LINES)
        & (
            lower.startswith("saldo do dia")
            | short_title
            | dashed
            | lower.isin(*KNOWN_GROUPS)
        )
    )


def parse_bb_statement(docs: DataFrame, doc_id: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, text) → typed lançamentos (FIXTURES.md A1 schema)."""
    lines = explode_lines(docs, doc_id, text_col).filter(~F.col("ln").isin(*HEADER_LINES))

    ln = F.col("ln")
    # classify AND extract in the pre-shuffle stage: one rlike + one
    # single-pass group split per launch line (vs 6 per-group extracts),
    # so the regex work parallelizes with the scan instead of running on
    # the (AQE-coalesced) post-window partitions
    classified = (
        lines.select(
            doc_id,
            "line_no",
            "ln",
            _is_group(ln).alias("is_group"),
            ln.rlike(LAUNCH_RE).alias("is_launch_raw"),
        )
        .withColumn("is_launch", F.col("is_launch_raw") & ~F.col("is_group"))
        .withColumn(
            "g",
            F.when(
                F.col("is_launch"),
                extract_all_groups(ln, LAUNCH_RE, group_template(1, 2, 3, 4, 5, 6)),
            ),
        )
    )

    with_ctx = classified.select(
        doc_id,
        "line_no",
        "ln",
        "is_group",
        "is_launch",
        "g",
        running_last(F.when(F.col("is_group"), ln), doc_id).alias("grupo"),
        segment_id(F.col("is_group") | F.col("is_launch"), doc_id).alias("seg"),
    )

    g = F.col("g")
    launches = with_ctx.filter("is_launch").select(
        doc_id,
        "line_no",
        "seg",
        "grupo",
        g[0].alias("data"),
        F.nullif(g[1], F.lit("")).alias("lote"),
        F.nullif(g[2], F.lit("")).alias("documento"),
        normalize_space(g[3]).alias("historico"),
        brl_to_double(g[4]).alias("valor_abs"),
        g[5].alias("sinal"),
    )

    conts = collect_joined(
        with_ctx.filter(~F.col("is_launch") & ~F.col("is_group") & (F.col("seg") > 0)),
        [doc_id, "seg"],
    ).withColumnRenamed("joined", "complemento")

    out = launches.join(conts, [doc_id, "seg"], "left").withColumn(
        "complemento", F.coalesce("complemento", F.lit(""))
    )
    return out.select(
        doc_id,
        "line_no",
        "data",
        "lote",
        "documento",
        "grupo",
        "historico",
        "complemento",
        F.when(F.col("complemento") != "", F.concat_ws(" | ", "historico", "complemento"))
        .otherwise(F.col("historico"))
        .alias("historico_full"),
        F.when(F.col("sinal") == "+", F.col("valor_abs")).otherwise(-F.col("valor_abs")).alias("valor"),
        "sinal",
    )
