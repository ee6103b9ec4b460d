"""PII detection + redaction for training-data pipelines.

A pretraining corpus scrub: find and mask emails, IPv4 addresses,
phone numbers, SSN-shaped ids, and credit-card-shaped numbers before
the text reaches a tokenizer.  (The reference pipeline has no text
surface at all -- this extends SURVEY.md section 7's training-data
operator set, alongside dedup and quality scoring.)

Everything is native ``regexp_replace`` / ``rlike`` -- JVM-side,
whole-stage-codegen'd, a pure map with zero shuffles and zero Python,
so at 100 TB the scrub runs at scan speed and pipelines into the same
stage as quality scoring and fingerprinting.

Pattern dialect: the patterns below restrict themselves to the
intersection of Java ``java.util.regex`` (Spark) and RE2 (DuckDB) --
character classes, bounded repetition, alternation, non-capturing
groups, ``\\b`` word boundaries.  No backreferences, no lookaround
(RE2 has neither), so the DuckDB oracle can run the IDENTICAL pattern
and the redaction is cross-engine reproducible.

Matching order matters: credit-card before phone (a 16-digit card
with separators contains phone-shaped substrings), SSN before phone.
``redact_pii`` applies the chain in that fixed order; detection flags
are computed on the RAW text so they are order-independent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (name, pattern, replacement-token) in application order.
#: Kept RE2-and-Java compatible (see module docstring).
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ssn",
        r"\b\d{3}-\d{2}-\d{4}\b",
        "<SSN>",
    ),
    (
        "credit_card",
        r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
        "<CARD>",
    ),
    (
        "ipv4",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"\+?\d{1,3}[- ]\(?\d{3}\)?[- ]\d{3}[- ]?\d{4}\b",
        "<PHONE>",
    ),
]


def redact_pii(col: Column | str) -> Column:
    """Mask every PII span with its ``<TYPE>`` token, in the fixed
    chain order of :data:`PII_PATTERNS`.  One codegen'd expression
    tree -- Catalyst fuses the five replaces into a single projection.
    """
    c = F.col(col) if isinstance(col, str) else col
    for _name, pattern, token in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c


def pii_flags(col: Column | str) -> dict[str, Column]:
    """Per-type boolean detection flags on the RAW text (computed
    before any redaction, so flag semantics don't depend on chain
    order).  Returns ``{name: Column<boolean>}``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return {name: c.rlike(pattern) for name, pattern, _ in PII_PATTERNS}


def sql_redact_pii(expr: str) -> str:
    """The DuckDB mirror of :func:`redact_pii`: the same patterns in
    the same order, as nested ``regexp_replace(..., 'g')`` (DuckDB
    replaces only the first match without the 'g' flag; Spark's
    regexp_replace is always global)."""
    out = expr
    for _name, pattern, token in PII_PATTERNS:
        p = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{token}', 'g')"
    return out


def sql_pii_flag(expr: str, name: str) -> str:
    """DuckDB mirror of one :func:`pii_flags` entry."""
    for n, pattern, _ in PII_PATTERNS:
        if n == name:
            p = pattern.replace("'", "''")
            return f"regexp_matches({expr}, '{p}')"
    raise KeyError(name)
