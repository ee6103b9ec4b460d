"""Distributed exact quantiles (operators/quantiles.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_co2_emission_analysis_spark.operators.quantiles import exact_quantiles


def _long_to_map(df):
    return {(r[0], r["q"]): r["value"] for r in df.collect()}


def test_matches_builtin_percentile(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = _long_to_map(
        exact_quantiles(li, "l_returnflag", "l_extendedprice", [0.0, 0.25, 0.5, 0.75, 1.0])
    )
    ref = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, array(0.0, 0.25, 0.5, 0.75, 1.0))").alias("p")
    )
    for r in ref.collect():
        for q, want in zip((0.0, 0.25, 0.5, 0.75, 1.0), r["p"]):
            assert got[(r["l_returnflag"], q)] == pytest.approx(want, abs=1e-9)


def test_partition_count_invariance(spark):
    rows = [("a", float(v)) for v in range(101)] + [("b", float(v * 3)) for v in range(7)]
    df = spark.createDataFrame(rows, "k string, v double")
    a = _long_to_map(exact_quantiles(df, "k", "v", [0.5], num_partitions=1))
    b = _long_to_map(exact_quantiles(df, "k", "v", [0.5], num_partitions=13))
    assert a == b
    assert a[("a", 0.5)] == 50.0
    assert a[("b", 0.5)] == 9.0


def test_interpolation_between_order_stats(spark):
    df = spark.createDataFrame([("k", 1.0), ("k", 2.0), ("k", 4.0), ("k", 8.0)], "k string, v double")
    got = _long_to_map(exact_quantiles(df, "k", "v", [0.5, 0.75]))
    # pos = 1.5 -> 2 + 0.5*(4-2) = 3 ; pos = 2.25 -> 4 + 0.25*(8-4) = 5
    assert got[("k", 0.5)] == pytest.approx(3.0)
    assert got[("k", 0.75)] == pytest.approx(5.0)


def test_single_row_group_and_nulls(spark):
    df = spark.createDataFrame(
        [("one", 7.0), ("two", None), ("two", 3.0)], "k string, v double"
    )
    got = _long_to_map(exact_quantiles(df, "k", "v", [0.0, 0.5, 1.0]))
    assert got[("one", 0.5)] == 7.0
    assert got[("two", 1.0)] == 3.0  # null ignored


def test_no_single_reducer_window(spark, sf_dir):
    """The plan must not contain a partition-less Window: the ranking
    runs per (pid, key)."""
    from big_data_co2_emission_analysis_spark.plans.inspect import explain_formatted

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plan = explain_formatted(
        exact_quantiles(li, "l_returnflag", "l_extendedprice", [0.5], materialize=False)
    )
    assert "SinglePartition" not in plan
    # the plan must be the real computation, not a checkpoint scan
    assert "Window" in plan


def test_materialized_result_survives_unpersist(spark):
    """The default (materialize=True) result must collect the same values
    twice -- its lineage is truncated, so the unpersisted range exchange
    can never silently re-run with different sampled boundaries."""
    rows = [("a", float(v)) for v in range(500)] + [("b", float(v)) for v in range(300)]
    df = spark.createDataFrame(rows, "k string, v double").repartition(16)
    out = exact_quantiles(df, "k", "v", [0.25, 0.5, 0.75], num_partitions=8)
    first = sorted(map(tuple, out.collect()))
    second = sorted(map(tuple, out.collect()))
    assert first == second
    assert ("a", 0.5, 249.5) in first
    # checkpointed: no exchange left in the physical plan of the result
    from big_data_co2_emission_analysis_spark.plans.inspect import explain_formatted

    assert "Exchange" not in explain_formatted(out)


def test_control_plane_guard_raises_on_high_cardinality_key(spark):
    """P*K control collect must RAISE past max_control_rows, not OOM
    the driver -- and must release the operator-internal persist."""
    rows = [(i, float(i)) for i in range(500)]  # 500 distinct keys
    df = spark.createDataFrame(rows, "k long, v double")
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    with pytest.raises(ValueError, match="max_control_rows"):
        exact_quantiles(df, "k", "v", [0.5], num_partitions=4, max_control_rows=100)
    # the failed call left nothing NEW pinned in the cache
    assert spark.sparkContext._jsc.sc().getPersistentRDDs().size() <= before
    # same data passes when the cap accommodates P*K
    out = exact_quantiles(df, "k", "v", [0.5], num_partitions=4, max_control_rows=5000)
    assert out.count() == 500


def test_slice_pruning_enters_window_with_target_slices_only(spark):
    """The r8 slice pruning: the rank window's input is semi-filtered
    to the target-containing (partition, key) slices, and values are
    still exactly percentile_cont.  The plan of the lazy mode must
    carry the LeftSemi pin; the materialized values must match Spark's
    built-in exact percentile."""
    from big_data_co2_emission_analysis_spark.plans.inspect import explain_formatted
    from pyspark.sql import functions as F

    rows = [("a", float(v)) for v in range(1000)] + [
        ("b", float(v) * 2.0) for v in range(700)
    ]
    df = spark.createDataFrame(rows, "k string, v double").repartition(16)
    lazy = exact_quantiles(df, "k", "v", [0.5], num_partitions=8, materialize=False)
    assert "LeftSemi" in explain_formatted(lazy)

    out = {
        (r.k, r.q): r.value
        for r in exact_quantiles(df, "k", "v", [0.25, 0.5, 0.75],
                                 num_partitions=8).collect()
    }
    want = df.groupBy("k").agg(
        F.expr("percentile(v, array(0.25, 0.5, 0.75))").alias("p")
    ).collect()
    for r in want:
        assert out[(r.k, 0.25)] == r.p[0]
        assert out[(r.k, 0.5)] == r.p[1]
        assert out[(r.k, 0.75)] == r.p[2]


def test_empty_qs_and_empty_input_edge_cases(spark):
    """ADVICE r8: qs=[] must fail with a clear error (not an obscure
    'can not infer schema from empty dataset'), and an empty / all-null
    input must return an empty, correctly-typed (key, q, value) frame."""
    import pytest

    from big_data_co2_emission_analysis_spark.operators.quantiles import exact_quantiles

    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    with pytest.raises(ValueError, match="at least one quantile"):
        exact_quantiles(df, "k", "v", [])

    empty = spark.createDataFrame([], "k string, v double")
    out = exact_quantiles(empty, "k", "v", [0.5])
    assert out.columns == ["k", "q", "value"]
    assert out.count() == 0

    all_null = spark.createDataFrame([("a", None), ("b", None)], "k string, v double")
    out2 = exact_quantiles(all_null, "k", "v", [0.25, 0.75])
    assert out2.count() == 0
    assert [f.dataType.simpleString() for f in out2.schema.fields] == [
        "string", "double", "double",
    ]
