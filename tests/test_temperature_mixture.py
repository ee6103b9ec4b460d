"""temperature_mixture (operators/sampling.py): budget accounting,
temperature flattening, determinism, partition invariance, validation."""

import pytest
from pyspark.sql import functions as F

from big_data_co2_emission_analysis_spark.operators.sampling import (
    temperature_mixture,
)


def _corpus(spark):
    # source a: 10 docs x 100 tokens; source b: 10 docs x 10 tokens
    rows = [("a", i, 100) for i in range(10)] + [("b", 100 + i, 10) for i in range(10)]
    return spark.createDataFrame(rows, "source string, doc_id long, n_toks long")


def test_budget_respected_within_one_doc_overshoot(spark):
    df = _corpus(spark)
    out = temperature_mixture(df, "source", "n_toks", budget_tokens=300.0,
                              temperature=2.0)
    per = {
        r.source: r for r in out.groupBy("source")
        .agg(F.sum("tokens").alias("t"), F.max("tokens").alias("mx")).collect()
    }
    # share_a = 1000/1100, share_b = 100/1100; T=2 -> sqrt shares
    sa, sb = (1000 / 1100) ** 0.5, (100 / 1100) ** 0.5
    budget = {"a": round(sa / (sa + sb) * 300.0, 6), "b": round(sb / (sa + sb) * 300.0, 6)}
    for s, r in per.items():
        assert r.t - r.mx < budget[s]  # all but the last doc fit
        assert r.t > 0


def test_temperature_one_keeps_natural_proportions(spark):
    df = _corpus(spark)
    out = temperature_mixture(df, "source", "n_toks", budget_tokens=220.0,
                              temperature=1.0)
    per = {r.source: r.t for r in
           out.groupBy("source").agg(F.sum("tokens").alias("t")).collect()}
    # natural weights: a = 10/11 of budget = 200 tokens, b = 1/11 = 20
    assert per["a"] == 200  # two 100-token docs
    assert per["b"] == 20  # two 10-token docs


def test_high_temperature_flattens_toward_uniform(spark):
    df = _corpus(spark)
    out = temperature_mixture(df, "source", "n_toks", budget_tokens=200.0,
                              temperature=100.0)
    per = {r.source: r.t for r in
           out.groupBy("source").agg(F.sum("tokens").alias("t")).collect()}
    # ~uniform budgets (~100 each): the tail source contributes far
    # more than its natural 1/11 share
    assert per["b"] >= 90


def test_deterministic_and_partition_invariant(spark):
    df = _corpus(spark)
    a = sorted(temperature_mixture(df.repartition(1), "source", "n_toks",
                                   500.0).collect(), key=str)
    b = sorted(temperature_mixture(df.repartition(7), "source", "n_toks",
                                   500.0).collect(), key=str)
    assert a == b


def test_invalid_temperature_raises(spark):
    with pytest.raises(ValueError):
        temperature_mixture(_corpus(spark), "source", "n_toks", 100.0,
                            temperature=0.0)
