"""Deterministic embedder (functions/embedder.py): native expression
vs mapInPandas parity (the swap-in-a-model contract), value range,
determinism."""

import pytest
from pyspark.sql import functions as F

from big_data_co2_emission_analysis_spark.functions.embedder import (
    embed_map_in_pandas,
    hash_embedding,
    hash_embedding_py,
)


def test_native_matches_python_twin(spark):
    df = spark.createDataFrame([("hello world",), ("",), ("x",)], "t string")
    got = {r.t: r.e for r in df.select("t", hash_embedding("t", 4).alias("e")).collect()}
    for t in ("hello world", "", "x"):
        assert got[t] == hash_embedding_py(t, 4)  # exact double equality


def test_map_in_pandas_parity_with_native(spark):
    df = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(50)], "id long, t string"
    ).repartition(4)
    native = {r.id: r.e for r in df.select("id", hash_embedding("t", 8).alias("e")).collect()}
    arrow = {r.id: r.embedding for r in embed_map_in_pandas(df, "t", dim=8).collect()}
    assert native == arrow


def test_embedding_range_and_determinism(spark):
    df = spark.createDataFrame([(f"t{i}",) for i in range(100)], "t string")
    rows = df.select(hash_embedding("t", 8).alias("e")).collect()
    for r in rows:
        assert len(r.e) == 8
        assert all(-1.0 <= x < 1.0 for x in r.e)
    again = df.select(hash_embedding("t", 8).alias("e")).collect()
    assert [r.e for r in rows] == [r.e for r in again]


def test_different_texts_differ(spark):
    df = spark.createDataFrame([("a",), ("b",)], "t string")
    e = [r.e for r in df.select(hash_embedding("t", 8).alias("e")).collect()]
    assert e[0] != e[1]
