"""observe() metrics (operators/metrics.py): observed values must
equal an independent aggregation of the same input, with no second
scan of the source."""

import pytest
from pyspark.sql import functions as F

from big_data_co2_emission_analysis_spark.operators.metrics import (
    observe_metrics,
    observe_row_health,
)


def test_observed_equals_independent_aggregate(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out, obs = observe_metrics(
        orders,
        "orders_obs",
        {
            "n": F.count(F.lit(1)),
            "total": F.sum("o_totalprice"),
            "n_urgent": F.sum((F.col("o_orderpriority") == "1-URGENT").cast("long")),
        },
    )
    n_out = out.filter(F.col("o_totalprice") > 0).count()  # any action
    got = obs.get
    ref = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_totalprice").alias("total"),
        F.sum((F.col("o_orderpriority") == "1-URGENT").cast("long")).alias("n_urgent"),
    ).head()
    assert got["n"] == ref.n
    assert got["total"] == pytest.approx(ref.total)
    assert got["n_urgent"] == ref.n_urgent
    assert n_out > 0


def test_row_health_null_counts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "c"), (None, None)],
        "k int, v string",
    )
    out, obs = observe_row_health(df, "health")
    out.count()
    got = obs.get
    assert got["n_rows"] == 4
    assert got["n_null_k"] == 2
    assert got["n_null_v"] == 2


def test_observe_requires_metrics(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        observe_metrics(df, "x", {})


def test_metrics_ride_the_same_action(spark):
    # the observation is attached to the plan, not a separate job:
    # observing must not change the result
    df = spark.range(100).selectExpr("id", "id % 7 AS g")
    out, obs = observe_metrics(df, "ride", {"n": F.count(F.lit(1))})
    agg = out.groupBy("g").count().orderBy("g").collect()
    assert obs.get["n"] == 100
    plain = df.groupBy("g").count().orderBy("g").collect()
    assert agg == plain


def test_streaming_observed_metrics(spark, tmp_path):
    """The streaming twin: observe() metrics surface per microbatch in
    StreamingQueryProgress.observedMetrics."""
    import os

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], "id long, v double"
    ).write.parquet(src)

    stream = spark.readStream.schema("id long, v double").parquet(src)
    observed, _none = observe_metrics(
        stream,
        "stream_health",
        {"n_rows": F.count(F.lit(1)), "n_null_v": F.sum(F.col("v").isNull().cast("long"))},
    )
    sink = f"obs_sink_{os.getpid()}"
    q = (
        observed.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = None
        for p in q.recentProgress:
            m = p["observedMetrics"].get("stream_health") if p["observedMetrics"] else None
            if m is not None:
                got = m
        assert got is not None, "no observedMetrics in any progress"
        assert got["n_rows"] == 3
        assert got["n_null_v"] == 1
    finally:
        q.stop()
