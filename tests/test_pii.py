"""PII detection/redaction (functions/pii.py): per-type crafted
strings, chain-order interactions, idempotence, and clean-text
pass-through."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_co2_emission_analysis_spark.functions.pii import (
    PII_PATTERNS,
    pii_flags,
    redact_pii,
)


def _redact(spark, text: str) -> str:
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(redact_pii("t").alias("r")).collect()[0]["r"]


def _flags(spark, text: str) -> dict[str, bool]:
    df = spark.createDataFrame([(text,)], "t string")
    row = df.select(
        *[flag.alias(name) for name, flag in pii_flags("t").items()]
    ).collect()[0]
    return row.asDict()


CASES = [
    ("mail me at jane.doe+spam@sub.example.co.uk today", "email", "mail me at <EMAIL> today"),
    ("server at 192.168.0.1 is up", "ipv4", "server at <IP> is up"),
    ("ssn is 123-45-6789 ok", "ssn", "ssn is <SSN> ok"),
    ("card 4111 1111 1111 1111 charged", "credit_card", "card <CARD> charged"),
    ("call +1 555-123-4567 now", "phone", "call <PHONE> now"),
]


@pytest.mark.parametrize("text,kind,expect", CASES, ids=[c[1] for c in CASES])
def test_single_type_redaction(spark, text, kind, expect):
    assert _redact(spark, text) == expect
    flags = _flags(spark, text)
    assert flags[kind] is True


def test_clean_text_untouched(spark):
    clean = "the quick brown fox jumps over 42 lazy dogs."
    assert _redact(spark, clean) == clean
    assert not any(_flags(spark, clean).values())


def test_card_not_shredded_by_phone(spark):
    # chain order: the 16-digit card must become ONE <CARD>, not a
    # phone-shaped fragment salad
    out = _redact(spark, "pay with 4111-1111-1111-1111 please")
    assert out == "pay with <CARD> please"


def test_multiple_types_one_doc(spark):
    text = "a@b.io or 10.0.0.1 or 123-45-6789"
    assert _redact(spark, text) == "<EMAIL> or <IP> or <SSN>"


def test_redaction_idempotent(spark):
    text = "a@b.io or 10.0.0.1 or +44 123-456-7890"
    once = _redact(spark, text)
    df = spark.createDataFrame([(once,)], "t string")
    twice = df.select(redact_pii("t").alias("r")).collect()[0]["r"]
    assert once == twice


def test_patterns_are_re2_safe():
    # the DuckDB oracle runs these patterns verbatim: no lookaround, no
    # backreferences (RE2 supports neither)
    for _name, pattern, _tok in PII_PATTERNS:
        assert "(?=" not in pattern and "(?!" not in pattern and "(?<" not in pattern
        assert "\\1" not in pattern and "\\2" not in pattern


def test_duckdb_parity_on_crafted_rows(spark):
    """The exact cross-engine contract the oracle relies on: same
    pattern, same replacement, same output, row by row."""
    duckdb = pytest.importorskip("duckdb")
    from big_data_co2_emission_analysis_spark.functions.pii import sql_redact_pii

    texts = [c[0] for c in CASES] + [
        "clean text only",
        "edge a@b.cd 999.999.999.999 +1 (555) 123-4567",
        "nested user1@example.com user2@example.com",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    spark_out = [r["r"] for r in df.select(redact_pii("t").alias("r")).collect()]
    con = duckdb.connect()
    duck_out = [
        con.execute(f"SELECT {sql_redact_pii('?::VARCHAR')}", [t]).fetchone()[0]
        for t in texts
    ]
    assert spark_out == duck_out
