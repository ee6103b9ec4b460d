"""Deterministic PQ (ml/deterministic.py deterministic_pq +
operators/similarity.py pq_search_coded): like the deterministic
k-means it is built on, the property that justifies its existence is
PARTITIONING INDEPENDENCE -- identical codes, bit-identical codebooks,
and an identical re-ranked top-k under any physical layout -- plus a
recall floor vs the exact search proving the compressed index is still
a useful retriever."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_co2_emission_analysis_spark.ml.deterministic import deterministic_pq
from big_data_co2_emission_analysis_spark.operators.similarity import (
    brute_force_topk,
    pq_search_coded,
)


def _codes_map(codes):
    return sorted((r.vec_id, r.sub, r.cid) for r in codes.collect())


def test_partitioning_invariance(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    c1, b1 = deterministic_pq(emb.repartition(1), "vec_id", "embedding", m=4, ks=4, n_iter=2)
    c2, b2 = deterministic_pq(emb.repartition(13), "vec_id", "embedding", m=4, ks=4, n_iter=2)
    assert _codes_map(c1) == _codes_map(c2)
    assert b1 == b2  # bit-identical doubles, not approx


def test_codes_shape_and_range(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    codes, books = deterministic_pq(emb, "vec_id", "embedding", m=4, ks=4, n_iter=1)
    n = emb.count()
    got = codes.agg(
        F.count("*").alias("rows"),
        F.countDistinct("sub").alias("subs"),
        F.min("cid").alias("lo"),
        F.max("cid").alias("hi"),
    ).head()
    assert got.rows == n * 4 and got.subs == 4
    assert 0 <= got.lo and got.hi <= 3
    assert len(books) == 4 and all(len(b) == 4 for b in books)
    dim = emb.select(F.size("embedding")).head()[0]
    assert all(len(c) == dim // 4 for b in books for c in b)


def test_dim_not_divisible_raises(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 1.0, 2.0]), (2, [1.0, 1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="not divisible"):
        deterministic_pq(df, "vec_id", "embedding", m=2, ks=2, n_iter=1)


def test_search_shape_and_recall_floor(spark, sf_dir):
    """pq_search_coded returns exactly k ranked rows per query, and the
    ADC short-list + exact re-rank recovers most of the exact top-10
    on the fixture corpus."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    codes, books = deterministic_pq(emb, "vec_id", "embedding", m=4, ks=16, n_iter=3)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    out = pq_search_coded(emb, codes, books, queries, k=10, refine=4).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r)
        assert -1.000001 <= r.cosine <= 1.000001
    assert set(per_q) == {0, 1, 2, 3, 4}
    for q, rows in per_q.items():
        assert sorted(r.rank for r in rows) == list(range(1, 11))

    exact = brute_force_topk(emb, queries, k=10, round_dp=6).collect()
    ex = {}
    for r in exact:
        ex.setdefault(r.query_id, set()).add(r.vec_id)
    ap = {q: {r.vec_id for r in rows} for q, rows in per_q.items()}
    recalls = [len(ex[q] & ap[q]) / 10 for q in ex]
    # random (structure-free) 64-dim fixture corpus: the hardest case
    # for any quantizer -- 0.3 is the same floor ann_ivf/ann_lsh use
    # on this corpus (observed ~0.42); the planted-cluster test below
    # holds the high bar on structured data
    assert sum(recalls) / len(recalls) >= 0.3


def test_planted_cluster_recall(spark):
    """On a corpus with real cluster structure (the test_similarity
    planted convention: 4 well-separated direction clusters), the
    ADC short-list + exact re-rank must recover nearly all of the
    exact top-10."""
    import random

    rng = random.Random(7)
    dim, n_clusters, per = 16, 4, 25
    centers = []
    for c in range(n_clusters):
        v = [0.0] * dim
        for i in range(dim // n_clusters * c, dim // n_clusters * (c + 1)):
            v[i] = 1.0
        centers.append(v)
    rows, vid = [], 0
    for c, center in enumerate(centers):
        for _ in range(per):
            rows.append((vid, [x + rng.gauss(0, 0.05) for x in center]))
            vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(c, centers[c]) for c in range(n_clusters)], "query_id long, qv array<float>"
    )
    codes, books = deterministic_pq(corpus, "vec_id", "embedding", m=4, ks=8, n_iter=3)
    out = pq_search_coded(corpus, codes, books, queries, k=10, refine=4).collect()
    exact = brute_force_topk(corpus, queries, k=10).collect()
    ex, ap = {}, {}
    for r in exact:
        ex.setdefault(r.query_id, set()).add(r.vec_id)
    for r in out:
        ap.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(ex[q] & ap.get(q, set())) / 10 for q in ex]
    assert sum(recalls) / len(recalls) >= 0.8


def test_cached_codes_equal_fresh(spark, tmp_path, monkeypatch):
    """The fingerprint-keyed cache in queries.mlops._det_pq must be
    value-transparent: cached codes/codebooks == a fresh train."""
    import big_data_co2_emission_analysis_spark.queries.mlops as mlops

    monkeypatch.setenv("SPARK_GRAFT_CACHE_DIR", str(tmp_path))
    sf_dir = "/root/testdata/sf0.001"
    c1, b1 = mlops._det_pq(spark, sf_dir)          # build + write
    c2, b2 = mlops._det_pq(spark, sf_dir)          # cache hit
    assert b1 == b2
    assert _codes_map(c1) == _codes_map(c2)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    fresh, bf = deterministic_pq(emb, "vec_id", "embedding", m=4, ks=16, n_iter=5, seed=42)
    assert bf == b1
    assert _codes_map(fresh) == _codes_map(c1)
