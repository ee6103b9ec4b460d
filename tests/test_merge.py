"""MERGE INTO semantics (operators/merge.py): clause matrix, duplicate
source-key policies, schema guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_co2_emission_analysis_spark.operators.merge import (
    merge_source_col,
    merge_upsert,
)

SCHEMA = "k long, status string, amount double"


def _rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.fixture()
def tables(spark):
    target = spark.createDataFrame(
        [(1, "O", 10.0), (2, "O", 20.0), (3, "F", 30.0)], SCHEMA
    )
    source = spark.createDataFrame(
        [(2, "O", 99.0), (3, "F", 33.0), (4, "O", 40.0)], SCHEMA
    )
    return target, source


def test_update_insert_keep(tables):
    target, source = tables
    out = _rows(merge_upsert(target, source, ["k"]))
    assert out == {
        (1, "O", 10.0),  # target-only kept
        (2, "O", 99.0),  # matched -> source wins
        (3, "F", 33.0),  # matched -> source wins
        (4, "O", 40.0),  # source-only inserted
    }


def test_matched_delete_clause(tables):
    target, source = tables
    out = _rows(
        merge_upsert(
            target,
            source,
            ["k"],
            when_matched_delete=merge_source_col("status") == "F",
        )
    )
    # k=3 matched with source status F -> deleted; unmatched source
    # rows insert regardless of their status (Delta semantics)
    assert out == {(1, "O", 10.0), (2, "O", 99.0), (4, "O", 40.0)}


def test_no_insert_mode(tables):
    target, source = tables
    out = _rows(merge_upsert(target, source, ["k"], when_not_matched_insert=False))
    assert out == {(1, "O", 10.0), (2, "O", 99.0), (3, "F", 33.0)}


def test_no_update_mode(tables):
    target, source = tables
    out = _rows(merge_upsert(target, source, ["k"], when_matched_update=False))
    assert out == {(1, "O", 10.0), (2, "O", 20.0), (3, "F", 30.0), (4, "O", 40.0)}


def test_duplicate_source_keys_raise(spark, tables):
    target, _ = tables
    dup = spark.createDataFrame([(2, "O", 1.0), (2, "O", 2.0)], SCHEMA)
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    with pytest.raises((Py4JJavaError, PySparkException, Exception)) as e:
        merge_upsert(target, dup, ["k"]).collect()
    assert "multiple source rows" in str(e.value)


def test_duplicate_null_keys_do_not_raise(spark, tables):
    """Under null_safe_keys=False a NULL key never matches a target
    row, so duplicate NULL-key source rows are unambiguous (each
    inserts) -- the 'error' guard must NOT fire (Delta's error fires
    only for multiple source rows matching one TARGET row)."""
    target, _ = tables
    dup_null = spark.createDataFrame(
        [(None, "A", 1.0), (None, "B", 2.0), (4, "O", 40.0)], SCHEMA
    )
    out = _rows(merge_upsert(target, dup_null, ["k"]))
    assert (None, "A", 1.0) in out and (None, "B", 2.0) in out
    assert (4, "O", 40.0) in out


def test_duplicate_null_keys_raise_when_null_safe(spark, tables):
    """With null_safe_keys=True NULL is ONE joinable entity, so two
    NULL-key source rows ARE ambiguous and the guard fires."""
    target, _ = tables
    dup_null = spark.createDataFrame([(None, "A", 1.0), (None, "B", 2.0)], SCHEMA)
    with pytest.raises(Exception) as e:
        merge_upsert(target, dup_null, ["k"], null_safe_keys=True).collect()
    assert "multiple source rows" in str(e.value)


def test_duplicate_first_policy_deterministic(spark, tables):
    target, _ = tables
    dup = spark.createDataFrame(
        [(2, "O", 5.0), (2, "O", 1.0), (4, "O", 7.0)], SCHEMA
    )
    out = _rows(
        merge_upsert(
            target, dup, ["k"], on_duplicate_source="first", order_dups_by=["amount"]
        )
    )
    assert (2, "O", 1.0) in out  # smallest amount wins deterministically
    assert (2, "O", 5.0) not in out
    assert (4, "O", 7.0) in out


def test_first_policy_requires_order(tables):
    target, source = tables
    with pytest.raises(ValueError, match="order_dups_by"):
        merge_upsert(target, source, ["k"], on_duplicate_source="first")


def test_schema_mismatch_rejected(spark, tables):
    target, _ = tables
    bad = spark.createDataFrame([(1, "O")], "k long, status string")
    with pytest.raises(ValueError, match="columns"):
        merge_upsert(target, bad, ["k"])


def test_null_keys_default_sql_semantics(spark):
    """Default (SQL/Delta MERGE): NULL keys never match -- the NULL-key
    source row INSERTS alongside the persisting NULL-key target row."""
    t = spark.createDataFrame([(None, "O", 1.0), (1, "O", 2.0)], SCHEMA)
    s = spark.createDataFrame([(None, "X", 9.0)], SCHEMA)
    out = _rows(merge_upsert(t, s, ["k"]))
    assert out == {(None, "O", 1.0), (None, "X", 9.0), (1, "O", 2.0)}


def test_null_keys_opt_in_null_safe(spark):
    """null_safe_keys=True: a NULL key in both sides is ONE entity
    (updated), for entity-resolution style merges."""
    t = spark.createDataFrame([(None, "O", 1.0), (1, "O", 2.0)], SCHEMA)
    s = spark.createDataFrame([(None, "X", 9.0)], SCHEMA)
    out = _rows(merge_upsert(t, s, ["k"], null_safe_keys=True))
    assert out == {(None, "X", 9.0), (1, "O", 2.0)}


def test_merge_plan_no_cartesian(spark, tables):
    from big_data_co2_emission_analysis_spark.plans.inspect import explain_formatted

    target, source = tables
    plan = explain_formatted(merge_upsert(target, source, ["k"]))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_assume_unique_skips_guard_exchange(spark, tables):
    """'assume_unique' must produce a plan with exactly one exchange
    per join side (the SMJ's own) -- the guard's extra source-side
    exchange is gone."""
    from big_data_co2_emission_analysis_spark.plans.inspect import explain_formatted

    target, source = tables
    guarded = explain_formatted(merge_upsert(target, source, ["k"]))
    lean = explain_formatted(
        merge_upsert(target, source, ["k"], on_duplicate_source="assume_unique")
    )
    assert lean.count("Exchange") < guarded.count("Exchange")
    assert "Window" not in lean
    # semantics unchanged on a unique-key source
    out = _rows(merge_upsert(target, source, ["k"], on_duplicate_source="assume_unique"))
    assert out == _rows(merge_upsert(target, source, ["k"]))


# -- interval overlap join (operators/joins.py) ----------------------------


def test_interval_overlap_matches_naive(spark):
    """Banded result == naive theta-join filter, for intervals that
    span multiple cells, share boundaries exactly, or nest."""
    import random

    from big_data_co2_emission_analysis_spark.operators.joins import (
        interval_overlap_join,
    )

    rng = random.Random(3)
    lrows = [
        ("L%d" % i, "u%d" % (i % 3), float(s), float(s + rng.randint(0, 50)))
        for i, s in enumerate(rng.sample(range(0, 500), 40))
    ]
    rrows = [
        ("R%d" % i, "u%d" % (i % 3), float(s), float(s + rng.randint(0, 30)))
        for i, s in enumerate(rng.sample(range(0, 500), 40))
    ]
    left = spark.createDataFrame(lrows, "lid string, u string, ls double, le double")
    right = spark.createDataFrame(rrows, "rid string, u string, rs double, re double")

    got = {
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", band_width=16.0, by_cols=["u"]
        ).collect()
    }
    naive = {
        (r["lid"], r["rid"])
        for r in left.join(right, "u")
        .filter("ls <= re AND rs <= le")
        .collect()
    }
    assert got == naive and got  # equal and non-trivial


def test_interval_overlap_no_duplicate_pairs(spark):
    """A pair overlapping MANY shared cells must emit exactly once
    (canonical-cell dedup, no distinct)."""
    from big_data_co2_emission_analysis_spark.operators.joins import (
        interval_overlap_join,
    )

    left = spark.createDataFrame([("L", 0.0, 100.0)], "lid string, ls double, le double")
    right = spark.createDataFrame([("R", 10.0, 90.0)], "rid string, rs double, re double")
    rows = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", band_width=5.0
    ).collect()
    assert len(rows) == 1


def test_interval_overlap_plan_is_equi_join(spark):
    from big_data_co2_emission_analysis_spark.operators.joins import (
        interval_overlap_join,
    )
    from big_data_co2_emission_analysis_spark.plans.inspect import explain_formatted

    left = spark.createDataFrame([("L", "u", 0.0, 10.0)], "lid string, u string, ls double, le double")
    right = spark.createDataFrame([("R", "u", 5.0, 15.0)], "rid string, u string, rs double, re double")
    plan = explain_formatted(
        interval_overlap_join(left, right, "ls", "le", "rs", "re", 8.0, by_cols=["u"])
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    import pytest as _pt

    with _pt.raises(ValueError, match="band_width"):
        interval_overlap_join(left, right, "ls", "le", "rs", "re", 0)
