"""Time-series operators (operators/timeseries.py): gap-fill spine,
LOCF / linear fills, time-weighted average."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from big_data_co2_emission_analysis_spark.operators.timeseries import (
    bucket_rollup,
    gap_fill,
    time_weighted_avg,
)


def _daily(spark, rows):
    """rows: (key, day-of-month, value|None present) -> bucketed frame."""
    data = [(k, datetime(2024, 1, d), float(v)) for k, d, v in rows]
    return spark.createDataFrame(data, "k string, bucket timestamp, v double")


def _fill_map(df):
    return {(r["k"], r["bucket"].day): (r["filled"], r["observed"]) for r in df.collect()}


def test_locf_fills_interior_gaps(spark):
    df = _daily(spark, [("a", 1, 10), ("a", 3, 30), ("a", 6, 60)])
    got = _fill_map(gap_fill(df, ["k"], "bucket", "1 DAY", "v", method="locf"))
    assert got[("a", 1)] == (10.0, True)
    assert got[("a", 2)] == (10.0, False)  # carried forward
    assert got[("a", 3)] == (30.0, True)
    assert got[("a", 4)] == (30.0, False)
    assert got[("a", 5)] == (30.0, False)
    assert got[("a", 6)] == (60.0, True)
    assert len(got) == 6  # spine covers every day in [first, last]


def test_linear_interpolates_and_leaves_edges_null(spark):
    df = _daily(spark, [("a", 1, 0), ("a", 4, 30)])
    got = _fill_map(gap_fill(df, ["k"], "bucket", "1 DAY", "v", method="linear"))
    assert got[("a", 1)] == (0.0, True)
    assert got[("a", 2)] == (10.0, False)
    assert got[("a", 3)] == (20.0, False)
    assert got[("a", 4)] == (30.0, True)


def test_none_method_keeps_gaps_null(spark):
    df = _daily(spark, [("a", 1, 1), ("a", 3, 3)])
    got = _fill_map(gap_fill(df, ["k"], "bucket", "1 DAY", "v", method="none"))
    assert got[("a", 2)] == (None, False)
    assert got[("a", 1)] == (1.0, True)


def test_keys_do_not_bleed(spark):
    """Each key's spine spans only its own [min, max]; fills never read
    another key's observations."""
    df = _daily(spark, [("a", 1, 5), ("a", 4, 8), ("b", 2, 100), ("b", 3, 200)])
    got = _fill_map(gap_fill(df, ["k"], "bucket", "1 DAY", "v", method="locf"))
    assert {d for (k, d) in got if k == "a"} == {1, 2, 3, 4}
    assert {d for (k, d) in got if k == "b"} == {2, 3}
    assert got[("a", 2)] == (5.0, False)  # not b's 100
    assert got[("b", 3)] == (200.0, True)


def test_invalid_method_raises(spark):
    df = _daily(spark, [("a", 1, 1)])
    with pytest.raises(ValueError, match="method"):
        gap_fill(df, ["k"], "bucket", "1 DAY", "v", method="cubic")


def test_gap_fill_partition_invariance(spark):
    rows = [("a", d, d * 2) for d in range(1, 20, 3)] + [("b", d, d) for d in range(2, 28, 5)]
    df = _daily(spark, rows)
    a = _fill_map(gap_fill(df.repartition(1), ["k"], "bucket", "1 DAY", "v", "linear"))
    b = _fill_map(gap_fill(df.repartition(17), ["k"], "bucket", "1 DAY", "v", "linear"))
    assert a == b


def test_bucket_rollup_day_grain(spark):
    df = spark.createDataFrame(
        [
            ("a", datetime(2024, 1, 1, 3, 15), 1.0),
            ("a", datetime(2024, 1, 1, 22, 59), 2.0),
            ("a", datetime(2024, 1, 2, 0, 0), 4.0),
        ],
        "k string, ts timestamp, v double",
    )
    out = bucket_rollup(df, ["k"], "ts", "day", [F.sum("v").alias("s")])
    got = {r["bucket"].day: r["s"] for r in out.collect()}
    assert got == {1: 3.0, 2: 4.0}


def test_time_weighted_avg_hand_computed(spark):
    # value 10 holds for 3600 s, then 20 for 1800 s -> twa = (10*3600 +
    # 20*1800) / 5400 = 13.3333...
    df = spark.createDataFrame(
        [
            ("u", datetime(2024, 1, 1, 0, 0, 0), 10.0),
            ("u", datetime(2024, 1, 1, 1, 0, 0), 20.0),
            ("u", datetime(2024, 1, 1, 1, 30, 0), 99.0),  # last value carries no area
            ("solo", datetime(2024, 1, 1), 5.0),  # single obs -> dropped (no span)
        ],
        "k string, ts timestamp, v double",
    )
    rows = time_weighted_avg(df, ["k"], "ts", "v").collect()
    got = {r["k"]: (r["twa"], r["n_obs"]) for r in rows}
    assert set(got) == {"u"}
    twa, n = got["u"]
    assert n == 3
    assert twa == pytest.approx((10 * 3600 + 20 * 1800) / 5400, abs=1e-9)


def test_gap_fill_plan_has_no_single_partition_window(spark):
    """The fill windows are per-key -- a partition-less window would
    serialize the whole series onto one reducer."""
    from big_data_co2_emission_analysis_spark.plans.inspect import explain_formatted

    df = _daily(spark, [("a", 1, 1), ("a", 9, 9)])
    plan = explain_formatted(gap_fill(df, ["k"], "bucket", "1 DAY", "v", "linear"))
    assert "SinglePartition" not in plan


# -- weighted sampling (operators/sampling.py weighted_sample_k) -----------


def test_weighted_sample_k_deterministic_and_bounded(spark):
    from big_data_co2_emission_analysis_spark.operators.sampling import weighted_sample_k

    rows = [(i, "g" if i % 2 else "h", float(1 + i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, grp string, w double")
    a = {(r["id"]) for r in weighted_sample_k(df, ["grp"], "id", "w", k=10).collect()}
    b = {(r["id"]) for r in weighted_sample_k(df.repartition(13), ["grp"], "id", "w", k=10).collect()}
    assert a == b  # partitioning-invariant (portable LCG, not Spark RNG)
    per_group = (
        weighted_sample_k(df, ["grp"], "id", "w", k=10)
        .groupBy("grp").count().collect()
    )
    assert all(r["count"] == 10 for r in per_group)


def test_weighted_sample_seed_sensitivity_and_weight_bias(spark):
    from big_data_co2_emission_analysis_spark.operators.sampling import weighted_sample_k

    rows = [(i, "g", 100.0 if i < 20 else 0.01) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, grp string, w double")
    picked = [r["id"] for r in weighted_sample_k(df, ["grp"], "id", "w", k=10).collect()]
    # heavy rows are 10,000x likelier: essentially all picks land there
    assert sum(1 for i in picked if i < 20) >= 8
    other = {r["id"] for r in weighted_sample_k(df, ["grp"], "id", "w", k=10, seed=7).collect()}
    assert other != set(picked)  # seed changes the draw


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from big_data_co2_emission_analysis_spark.operators.sampling import weighted_sample_k

    df = spark.createDataFrame(
        [(1, "g", 5.0), (2, "g", 0.0), (3, "g", -1.0), (4, "g", None)],
        "id long, grp string, w double",
    )
    got = {r["id"] for r in weighted_sample_k(df, ["grp"], "id", "w", k=10).collect()}
    assert got == {1}
    import pytest as _pt

    with _pt.raises(ValueError, match="k must be positive"):
        weighted_sample_k(df, ["grp"], "id", "w", k=0)


def test_weighted_sample_negative_ids_are_fair(spark):
    """Negative ids must draw a real uniform (pmod, not %): before the
    fix they produced u <= 0 -> NULL log -> NULL sample_key, which
    sorts NULLS FIRST and deterministically wins regardless of weight."""
    from big_data_co2_emission_analysis_spark.operators.sampling import weighted_sample_k

    # 5 negative-id rows with NEGLIGIBLE weight among 100 heavy rows:
    # if negative ids were privileged they would sweep the sample
    rows = [(-i, "g", 0.0001) for i in range(1, 6)] + [
        (i, "g", 100.0) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, w double")
    out = weighted_sample_k(df, ["grp"], "id", "w", k=10)
    assert out.filter(F.col("sample_key").isNull()).count() == 0
    picked = [r["id"] for r in out.collect()]
    assert sum(1 for i in picked if i < 0) <= 1  # not privileged
    # and still partitioning-invariant with negatives present
    again = [r["id"] for r in weighted_sample_k(df.repartition(7), ["grp"], "id", "w", k=10).collect()]
    assert sorted(picked) == sorted(again)
