"""Distributed document parsers (SURVEY.md §2.11 / §7 Phase 2).

The reference parses PDFs line-by-line in driver Python with mutable
state (``bb_statement.py:84-202``, ``bb_bill.py:169-229``,
``bradesco_bill.py:108-312``) — its single biggest non-scalable design.
Here each dialect is a pure DataFrame pipeline: posexplode lines →
regex dispatch (F22) → window forward-fill (W2) → run-id continuation
merge → typed rows. Parsing scales with executors; one shuffle per
window (keyed by document id).
"""

from .bb_statement import parse_bb_statement
from .bb_bill import parse_bb_bill
from .bradesco_bill import parse_bradesco_bill
from .resumo import (
    parse_bb_bill_resumo,
    parse_bb_statement_header,
    parse_bradesco_resumo,
)

__all__ = [
    "parse_bb_statement",
    "parse_bb_bill",
    "parse_bradesco_bill",
    "parse_bb_bill_resumo",
    "parse_bb_statement_header",
    "parse_bradesco_resumo",
]
