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


def test_distribution_psi_hand_computed(spark):
    import math

    from big_data_co2_emission_analysis_spark.operators.quality import (
        distribution_psi,
    )

    # group a: values in bin 0; group b: values in bin 9
    rows = [("a", 0.05)] * 4 + [("b", 0.95)] * 6
    df = spark.createDataFrame(rows, "src string, v double")
    out = {r.src: r for r in distribution_psi(df, "v", "src").collect()}

    def psi(counts_g, n_g, counts_all, n_all, bins=10, s=0.5):
        tot = 0.0
        for b in range(bins):
            pg = (counts_g.get(b, 0) + s) / (n_g + s * bins)
            p = (counts_all.get(b, 0) + s) / (n_all + s * bins)
            # mirror the 9-dp fixed-point quantization of each term
            t = (pg - p) * math.log(pg / p)
            tot += math.floor(abs(t) * 1e9 + 0.5) * (1 if t >= 0 else -1)
        return round(tot / 1e9, 6)

    exp_a = psi({0: 4}, 4, {0: 4, 9: 6}, 10)
    exp_b = psi({9: 6}, 6, {0: 4, 9: 6}, 10)
    assert out["a"].n_docs == 4 and out["b"].n_docs == 6
    assert out["a"].psi == exp_a
    assert out["b"].psi == exp_b


def test_distribution_psi_identical_distribution_is_near_zero(spark):
    from big_data_co2_emission_analysis_spark.operators.quality import (
        distribution_psi,
    )

    # identical per-group distributions; enough rows that the Laplace
    # pseudo-counts (0.5/bin, denominators n_g+5 vs n+5) wash out
    rows = [(g, v) for g in ("a", "b") for v in (0.1, 0.3, 0.5, 0.7, 0.9) * 40]
    df = spark.createDataFrame(rows, "src string, v double")
    for r in distribution_psi(df, "v", "src").collect():
        assert abs(r.psi) < 0.01


def test_distribution_psi_excludes_nulls_and_out_of_range(spark):
    from big_data_co2_emission_analysis_spark.operators.quality import (
        distribution_psi,
    )

    rows = [("a", 0.5), ("a", None), ("a", 1.5), ("a", -0.1)]
    df = spark.createDataFrame(rows, "src string, v double")
    out = distribution_psi(df, "v", "src").collect()
    assert out[0].n_docs == 1


def test_distribution_psi_boundary_value_lands_in_last_bin(spark):
    from big_data_co2_emission_analysis_spark.operators.quality import (
        distribution_psi,
    )

    df = spark.createDataFrame([("a", 1.0), ("a", 0.0)], "src string, v double")
    out = distribution_psi(df, "v", "src").collect()
    assert out[0].n_docs == 2  # 1.0 clamps into bin 9, 0.0 into bin 0
