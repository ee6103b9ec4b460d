"""Data-quality validation (operators/quality.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_co2_emission_analysis_spark.operators.quality import (
    FAILED_COL,
    annotate,
    rule_violation_counts,
    validate,
)

def _rules():
    # built lazily: Spark 4's functions dispatcher asserts if Column
    # expressions are created before any session exists (collection time)
    return {
        "positive": F.col("x") > 0,
        "small": F.col("x") < 100,
        "named": F.col("name").isNotNull(),
    }


def _df(spark):
    return spark.createDataFrame(
        [(1, "a"), (-5, "b"), (500, None), (42, "d")], "x int, name string"
    )


def test_annotate_lists_failed_rules_in_declaration_order(spark):
    rows = {r["x"]: r[FAILED_COL] for r in annotate(_df(spark), _rules()).collect()}
    assert rows[1] == []
    assert rows[-5] == ["positive"]
    assert rows[500] == ["small", "named"]  # declaration order, not alphabetical
    assert rows[42] == []


def test_validate_splits_good_and_quarantined(spark):
    good, bad = validate(_df(spark), _rules())
    assert sorted(r["x"] for r in good.collect()) == [1, 42]
    assert FAILED_COL not in good.columns
    assert sorted(r["x"] for r in bad.collect()) == [-5, 500]
    assert FAILED_COL in bad.columns


def test_violation_counts_count_per_rule_not_per_row(spark):
    counts = {
        r["rule"]: r["n_violations"]
        for r in rule_violation_counts(_df(spark), _rules()).collect()
    }
    # the 500-row fails two rules -> contributes to both counts
    assert counts == {"positive": 1, "small": 1, "named": 1}


def test_null_rule_input_counts_as_failure(spark):
    # SQL three-valued logic: NOT(null > 0) is null -> when() doesn't
    # fire... the annotate contract must still quarantine such rows
    df = spark.createDataFrame([(None, "a")], "x int, name string")
    rows = annotate(df, _rules()).collect()
    assert rows[0][FAILED_COL] == ["positive", "small"]


def test_all_clean_gives_empty_quarantine(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "x int, name string")
    good, bad = validate(df, _rules())
    assert good.count() == 2 and bad.count() == 0
