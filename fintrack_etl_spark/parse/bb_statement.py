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
context, assign run-ids at (group|launch) boundaries, then ONE
(doc_id, run) aggregation that pairs each run's launch with its
order-joined continuations. One window pass + one groupBy, both keyed
by document id — no self-join, so the classify stage runs once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import brl_to_double, normalize_space
from .lines import (
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

    # Single aggregation replaces the old launches⋈continuations self-join:
    # every launch line is itself a ``seg`` boundary, so a segment holds at
    # most ONE launch plus its continuation lines. Grouping once on
    # (doc_id, seg) attaches the order-joined continuations to that launch
    # directly — the join form made Spark execute the whole
    # scan→classify→window subtree twice (DataFrame self-joins get no
    # cross-branch reuse). Group-opened segments aggregate to a NULL
    # launch struct and are dropped, which is exactly the old inner side.
    out = (
        with_ctx.filter(F.col("seg") > 0)
        .groupBy(doc_id, "seg")
        .agg(
            F.max(
                F.when(F.col("is_launch"), F.struct("line_no", "grupo", "g"))
            ).alias("L"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("is_launch") & ~F.col("is_group"),
                                F.struct(F.col("line_no"), F.col("ln")),
                            )
                        )
                    ),
                    lambda s: s["ln"],
                ),
                " ",
            ).alias("complemento"),
        )
        .filter(F.col("L").isNotNull())
    )
    g = F.col("L")["g"]
    hist = normalize_space(g[3])
    comp = F.col("complemento")
    valor_abs = brl_to_double(g[4])
    sinal = g[5]
    return out.select(
        doc_id,
        F.col("L")["line_no"].alias("line_no"),
        g[0].alias("data"),
        F.nullif(g[1], F.lit("")).alias("lote"),
        F.nullif(g[2], F.lit("")).alias("documento"),
        F.col("L")["grupo"].alias("grupo"),
        hist.alias("historico"),
        comp.alias("complemento"),
        F.when(comp != "", F.concat_ws(" | ", hist, comp)).otherwise(hist).alias("historico_full"),
        F.when(sinal == "+", valor_abs).otherwise(-valor_abs).alias("valor"),
        sinal.alias("sinal"),
    )
