"""Category rule engine (reference parity: F12, SURVEY.md §2.8).

The reference categorizes card-bill descriptions with a first-match
scan over an ordered rule table of regex patterns plus installment /
recurrence detectors and three fallbacks
(``rules/categories_bb.py:16-274``, entry ``categorize_bb`` at
``:223-274``). There it is a per-row Python function on the driver;
here the same rule table **compiles to a single native
``F.when``-chain Column expression** — codegen-friendly, zero Python in
the hot path, and identical first-match semantics.

Patterns must stay in the regex subset shared by Java (Spark) and RE2
(DuckDB oracles): no backrefs, no lookaround.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

from .functions import upper_squeeze


@dataclass(frozen=True)
class CategoryRule:
    """One ordered rule: first pattern hit wins (``categories_bb.py:9-14``)."""

    categoria: str
    subcategoria: str | None
    patterns: tuple[str, ...]
    force_recorrente: bool = False


# Representative default rule set with the reference's category taxonomy
# (Educação, Saúde, Assinaturas, Compras, Financeiro, Mercado,
# Transporte, Alimentação — ``categories_bb.py:16-215``). The engine is
# data-driven: callers pass their own table.
DEFAULT_RULES: tuple[CategoryRule, ...] = (
    CategoryRule("Educação", None, (r"\bCURSO\b", r"\bUNIVERSIDADE\b", r"\bESCOLA\b")),
    CategoryRule("Saúde", "Farmácia", (r"\bFARMACIA\b", r"\bDROGARIA\b")),
    CategoryRule("Saúde", "Academia/Bem-estar", (r"\bACADEMIA\b", r"\bGYM\b"), True),
    CategoryRule("Assinaturas", "Streaming", (r"\bNETFLIX\b", r"\bSPOTIFY\b", r"\bSTREAM\b"), True),
    CategoryRule("Assinaturas", "Software", (r"\bSOFTWARE\b", r"\bCLOUD\b", r"\bSAAS\b"), True),
    CategoryRule("Compras", "E-commerce", (r"\bMARKETPLACE\b", r"\bECOMMERCE\b", r"\bSHOP\b")),
    CategoryRule("Mercado", "Supermercado", (r"\bSUPERMERCADO\b", r"\bMERCADINHO\b", r"\bATACADO\b")),
    CategoryRule("Transporte", "Apps/Taxi", (r"\bUBER\b", r"\bTAXI\b", r"\bRIDE\b")),
    CategoryRule("Transporte", "Combustível", (r"\bPOSTO\b", r"\bCOMBUSTIVEL\b", r"\bGAS STATION\b")),
    CategoryRule("Alimentação", "Restaurante", (r"\bRESTAURANT\b", r"\bLANCHONETE\b", r"\bPIZZARIA\b", r"\bBAR\b")),
    CategoryRule("Financeiro", "Tarifas/Juros/IOF", (r"\bIOF\b", r"\bJUROS\b", r"\bTARIFA\b", r"\bANUIDADE\b", r"\bMULTA\b")),
)

#: Recurrence hints (``categories_bb.py:216``).
RECURRENCE_HINTS: tuple[str, ...] = (r"\bSUBSCR\b", r"\bASSINAT\b", r"\bMENSAL\b", r"\bMONTHLY\b")

#: Installment detector (``categories_bb.py:226``).
INSTALLMENT_PATTERN = r"\bPARC\s+\d{2}/\d{2}\b"

#: City-suffix + commerce-word fallback (``categories_bb.py:252-254``).
CITY_SUFFIX_PATTERN = r"\b(FORTALEZA|SAO PAULO|EUSEBIO|SALVADOR)\b$"
COMMERCE_WORD_PATTERN = r"\b(COMERCIO|VAREJO|BOUTIQUE|LOJA|DISTRIBUIDORA)\b"

#: Payment/credit fallback (``categories_bb.py:263``).
PAYMENT_PATTERN = r"\b(PAGAMENTO|PGTO|PAGTO|CREDITO|ESTORNO|CANCELAMENTO)\b"


def _any_match(d: Column, patterns: tuple[str, ...]) -> Column:
    expr = F.lit(False)
    for p in patterns:
        expr = expr | d.rlike(p)
    return expr


def categorize(
    desc: Column | str,
    rules: tuple[CategoryRule, ...] = DEFAULT_RULES,
) -> Column:
    """Compile the rule table into one struct-valued Column.

    Returns ``struct(categoria, subcategoria, recorrente_suspeita,
    parcelado_suspeito)`` with the reference's exact decision order
    (``categorize_bb``, ``categories_bb.py:223-274``):

    1. first matching rule (force_recorrente OR global hints),
    2. unmatched + installment → Compras/Parcelado,
    3. city-suffix + commerce word → Compras/Loja física,
    4. payment words → Financeiro,
    5. else Outros.
    """
    d = upper_squeeze(desc)
    parcelado = d.rlike(INSTALLMENT_PATTERN)
    rec_hint = _any_match(d, RECURRENCE_HINTS)

    cat: Column | None = None
    sub: Column | None = None
    rec: Column | None = None
    par: Column | None = None

    def chain(prev: Column | None, cond: Column, value: Column) -> Column:
        return F.when(cond, value) if prev is None else prev.when(cond, value)

    for rule in rules:
        hit = _any_match(d, rule.patterns)
        cat = chain(cat, hit, F.lit(rule.categoria))
        sub = chain(sub, hit, F.lit(rule.subcategoria))
        rec = chain(rec, hit, F.lit(True) if rule.force_recorrente else rec_hint)
        par = chain(par, hit, parcelado)

    # Fallback 2: installment purchase at an unmatched merchant.
    fb2 = parcelado
    cat = cat.when(fb2, F.lit("Compras"))
    sub = sub.when(fb2, F.lit("Parcelado (loja física)"))
    rec = rec.when(fb2, F.lit(False))
    par = par.when(fb2, F.lit(True))

    # Fallback 3: city-suffixed physical store.
    fb3 = d.rlike(CITY_SUFFIX_PATTERN) & d.rlike(COMMERCE_WORD_PATTERN)
    cat = cat.when(fb3, F.lit("Compras"))
    sub = sub.when(fb3, F.lit("Loja física"))
    rec = rec.when(fb3, F.lit(False))
    par = par.when(fb3, F.lit(False))

    # Fallback 4: payments / credits / refunds.
    fb4 = d.rlike(PAYMENT_PATTERN)
    cat = cat.when(fb4, F.lit("Financeiro"))
    sub = sub.when(fb4, F.lit("Pagamentos/Créditos/Estornos"))
    rec = rec.when(fb4, F.lit(False))
    par = par.when(fb4, parcelado)

    return F.struct(
        cat.otherwise(F.lit("Outros")).alias("categoria"),
        sub.otherwise(F.lit(None).cast("string")).alias("subcategoria"),
        rec.otherwise(rec_hint).alias("recorrente_suspeita"),
        par.otherwise(parcelado).alias("parcelado_suspeito"),
    )


def categorize_sql_case(
    desc_expr: str,
    rules: tuple[CategoryRule, ...] = DEFAULT_RULES,
) -> dict[str, str]:
    """Emit the same decision chain as ANSI-SQL CASE expressions (for
    DuckDB oracle twins). Returns ``{column_name: sql_expr}``.
    """
    d = f"regexp_replace(upper(trim({desc_expr})), '[ \t]+', ' ', 'g')"
    parcelado = rf"regexp_matches({d}, '{INSTALLMENT_PATTERN}')"
    rec_hint = " OR ".join(rf"regexp_matches({d}, '{p}')" for p in RECURRENCE_HINTS)

    def any_match(patterns: tuple[str, ...]) -> str:
        return "(" + " OR ".join(rf"regexp_matches({d}, '{p}')" for p in patterns) + ")"

    cat_cases, sub_cases, rec_cases, par_cases = [], [], [], []
    for r in rules:
        hit = any_match(r.patterns)
        cat_cases.append(f"WHEN {hit} THEN '{r.categoria}'")
        sub_val = "NULL" if r.subcategoria is None else f"'{r.subcategoria}'"
        sub_cases.append(f"WHEN {hit} THEN {sub_val}")
        rec_cases.append(f"WHEN {hit} THEN {'TRUE' if r.force_recorrente else '(' + rec_hint + ')'}")
        par_cases.append(f"WHEN {hit} THEN {parcelado}")

    fb2 = parcelado
    fb3 = rf"(regexp_matches({d}, '{CITY_SUFFIX_PATTERN}') AND regexp_matches({d}, '{COMMERCE_WORD_PATTERN}'))"
    fb4 = rf"regexp_matches({d}, '{PAYMENT_PATTERN}')"

    cat_cases += [f"WHEN {fb2} THEN 'Compras'", f"WHEN {fb3} THEN 'Compras'", f"WHEN {fb4} THEN 'Financeiro'"]
    sub_cases += [
        f"WHEN {fb2} THEN 'Parcelado (loja física)'",
        f"WHEN {fb3} THEN 'Loja física'",
        f"WHEN {fb4} THEN 'Pagamentos/Créditos/Estornos'",
    ]
    rec_cases += [f"WHEN {fb2} THEN FALSE", f"WHEN {fb3} THEN FALSE", f"WHEN {fb4} THEN FALSE"]
    par_cases += [f"WHEN {fb2} THEN TRUE", f"WHEN {fb3} THEN FALSE", f"WHEN {fb4} THEN {parcelado}"]

    return {
        "categoria": "CASE " + " ".join(cat_cases) + " ELSE 'Outros' END",
        "subcategoria": "CASE " + " ".join(sub_cases) + " ELSE NULL END",
        "recorrente_suspeita": "CASE " + " ".join(rec_cases) + f" ELSE ({rec_hint}) END",
        "parcelado_suspeito": "CASE " + " ".join(par_cases) + f" ELSE {parcelado} END",
    }
