"""Deterministic logistic regression (ml/deterministic.py): gradient
direction, partition invariance (the bit-exact claim), control-plane
guard, degenerate inputs."""

import pytest
from pyspark.sql import functions as F

from big_data_co2_emission_analysis_spark.ml.deterministic import (
    deterministic_logreg,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v array<float>, y int")


def test_separable_data_learns_direction(spark):
    # y == 1 iff feature positive: weight must go positive, and the
    # classifier must separate the training set perfectly
    rows = [(i, [1.0 if i % 2 == 0 else -1.0], 1 if i % 2 == 0 else 0) for i in range(20)]
    scores, w, b = deterministic_logreg(_df(spark, rows), "id", "v", "y", n_iter=20, lr=1.0)
    assert w[0] > 0.5
    got = {r.id: r.pred for r in scores.collect()}
    assert all(got[i] == (1 if i % 2 == 0 else 0) for i in range(20))


def test_partition_invariance_bit_exact(spark):
    rows = [
        (i, [float((i * 7) % 5) - 2.0, float((i * 3) % 4) - 1.5], int(i % 3 == 0))
        for i in range(60)
    ]
    _, w1, b1 = deterministic_logreg(
        _df(spark, rows).repartition(1), "id", "v", "y", n_iter=4
    )
    _, w8, b8 = deterministic_logreg(
        _df(spark, rows).repartition(8), "id", "v", "y", n_iter=4
    )
    assert w1 == w8  # exact double equality, not approx
    assert b1 == b8


def test_balanced_zero_signal_keeps_zero_weights(spark):
    # symmetric data with y independent of x: gradient of the
    # intercept is (mean p - mean y) = 0.5 - 0.5 = 0 at start
    rows = [(0, [1.0], 1), (1, [1.0], 0), (2, [-1.0], 1), (3, [-1.0], 0)]
    _, w, b = deterministic_logreg(_df(spark, rows), "id", "v", "y", n_iter=3)
    assert b == pytest.approx(0.0, abs=1e-12)
    assert w[0] == pytest.approx(0.0, abs=1e-12)


def test_control_plane_guard_raises(spark):
    rows = [(0, [0.0] * 8, 1), (1, [1.0] * 8, 0)]
    with pytest.raises(ValueError, match="max_control_rows"):
        deterministic_logreg(_df(spark, rows), "id", "v", "y", max_control_rows=4)


def test_empty_input_raises(spark):
    empty = _df(spark, []).filter("id > 0")
    with pytest.raises(ValueError):
        deterministic_logreg(empty, "id", "v", "y")
