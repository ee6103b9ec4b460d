"""Deterministic k-means (ml/deterministic.py): the property that
justifies its existence is PARTITIONING INDEPENDENCE -- identical
assignments and bit-identical centroids under any physical layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_co2_emission_analysis_spark.ml.deterministic import deterministic_kmeans


def _run(df, **kw):
    out, cents = deterministic_kmeans(df, "vec_id", "embedding", **kw)
    rows = {r.vec_id: r.cluster for r in out.collect()}
    return rows, cents


def test_partitioning_invariance(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a1, c1 = _run(emb.repartition(1), k=4, n_iter=3)
    a2, c2 = _run(emb.repartition(13), k=4, n_iter=3)
    assert a1 == a2
    assert c1 == c2  # bit-identical doubles, not approx


def test_every_row_assigned_to_valid_cluster(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out, cents = deterministic_kmeans(emb, "vec_id", "embedding", k=4, n_iter=2)
    n_in = emb.count()
    got = out.agg(
        F.count("*").alias("n"),
        F.min("cluster").alias("lo"),
        F.max("cluster").alias("hi"),
    ).head()
    assert got.n == n_in and 0 <= got.lo and got.hi <= 3
    assert len(cents) == 4 and all(len(c) == len(cents[0]) for c in cents)


def test_k_exceeding_rows_raises(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="exceeds the number of rows"):
        deterministic_kmeans(df, "vec_id", "embedding", k=5, n_iter=1)


def test_control_plane_cap_raises(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with pytest.raises(ValueError, match="max_control_rows"):
        deterministic_kmeans(
            emb, "vec_id", "embedding", k=8, n_iter=1, max_control_rows=10
        )


def test_separated_clusters_recovered(spark):
    """Two tight blobs far apart -> k=2 splits them exactly."""
    pts = [(i, [0.0 + i * 0.01, 0.0]) for i in range(10)] + [
        (100 + i, [50.0 + i * 0.01, 50.0]) for i in range(10)
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    out, _ = deterministic_kmeans(df, "vec_id", "embedding", k=2, n_iter=4)
    rows = {r.vec_id: r.cluster for r in out.collect()}
    low = {rows[i] for i in range(10)}
    high = {rows[100 + i] for i in range(10)}
    assert len(low) == 1 and len(high) == 1 and low != high


def test_cached_assignments_equal_fresh(spark, tmp_path, monkeypatch):
    """The fingerprint-keyed cache in queries.mlops._det_kmeans must be
    value-transparent: cached assignments/centroids == a fresh train."""
    import big_data_co2_emission_analysis_spark.queries.mlops as mlops
    from big_data_co2_emission_analysis_spark.ml.deterministic import (
        deterministic_kmeans,
    )

    monkeypatch.setenv("SPARK_GRAFT_CACHE_DIR", str(tmp_path))
    sf_dir = "/root/testdata/sf0.001"
    a1, c1 = mlops._det_kmeans(spark, sf_dir)          # build + write
    a2, c2 = mlops._det_kmeans(spark, sf_dir)          # cache hit
    assert c1 == c2
    rows1 = sorted((r.vec_id, r.cluster) for r in a1.collect())
    rows2 = sorted((r.vec_id, r.cluster) for r in a2.collect())
    assert rows1 == rows2

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    fresh, cf = deterministic_kmeans(emb, "vec_id", "embedding", k=8, n_iter=5, seed=42)
    assert cf == c1
    assert sorted((r.vec_id, r.cluster) for r in fresh.collect()) == rows1
