"""Rule-based data-quality validation with quarantine.

The ingest-side contract check a production pipeline runs before
letting rows near training or analytics: each rule is a named boolean
Column (True = pass), evaluated in ONE codegen'd projection -- no
Python, no shuffle, no second scan.  Rows annotate themselves with the
names of the rules they fail; splitting good/quarantined is then a
plain filter.

Scale notes (100 TB): `annotate` is a pure map fused into the scan
stage.  `validate` returns two lazily-filtered views of the annotated
frame -- consume both in one job via persist()/foreachBatch, or write
the annotated frame once and filter downstream; without a persist each
side re-scans (documented, deliberate: an implicit cache of a 100 TB
frame is worse than an explicit re-scan decision).  `rule_violation_
counts` aggregates with a single partial+final hash agg; rows failing
multiple rules count once per rule (explode AFTER the fail-filter, so
the exploded set is |violations|, not |rows| x |rules|).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: name of the annotation column
FAILED_COL = "failed_rules"


def annotate(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Add ``failed_rules: array<string>`` listing (in rule-dict
    order) every rule the row violates; empty array = clean row.

    A rule fails unless it is DEFINITIVELY true: under SQL
    three-valued logic a NULL input makes ``x > 0`` evaluate to NULL,
    and a bare ``~rule`` would let such rows slip through as clean --
    exactly the rows a DQ gate exists to catch."""
    tagged = F.array(
        *[
            F.when(~F.coalesce(rule, F.lit(False)), F.lit(name))
            for name, rule in rules.items()
        ]
    )
    return df.withColumn(
        FAILED_COL, F.filter(tagged, lambda x: x.isNotNull())
    )


def validate(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Split into (good, quarantined) views of the annotated frame.
    Quarantined rows keep their ``failed_rules`` annotation; good rows
    drop it.  See module docstring for the one-scan-per-side caveat."""
    annotated = annotate(df, rules)
    good = annotated.filter(F.size(FAILED_COL) == 0).drop(FAILED_COL)
    bad = annotated.filter(F.size(FAILED_COL) > 0)
    return good, bad


def rule_violation_counts(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Per-rule violation counts (the audit summary a DQ job emits):
    one row per rule that has at least one violation."""
    annotated = annotate(df, rules)
    return (
        annotated.filter(F.size(FAILED_COL) > 0)
        .select(F.explode(FAILED_COL).alias("rule"))
        .groupBy("rule")
        .agg(F.count("*").alias("n_violations"))
        .orderBy("rule")
    )
