"""Recall tests for the three similarity-search strategies against a
corpus with known structure: LSH and IVF candidates must agree with the
brute-force baseline on clearly-separated neighbors."""

import math
import random

import pytest
from pyspark.sql import functions as F

from big_data_co2_emission_analysis_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)

DIM = 16
N_CLUSTERS = 4
PER_CLUSTER = 25


@pytest.fixture(scope="module")
def planted(spark):
    """4 well-separated direction clusters; within-cluster cosine >>
    cross-cluster cosine."""
    rng = random.Random(7)
    centers = []
    for c in range(N_CLUSTERS):
        v = [0.0] * DIM
        for i in range(DIM // N_CLUSTERS * c, DIM // N_CLUSTERS * (c + 1)):
            v[i] = 1.0
        centers.append(v)
    rows = []
    vid = 0
    for c, center in enumerate(centers):
        for _ in range(PER_CLUSTER):
            vec = [x + rng.gauss(0, 0.05) for x in center]
            rows.append((vid, c, vec))
            vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, cluster int, embedding array<float>")
    queries = spark.createDataFrame(
        [(c, centers[c]) for c in range(N_CLUSTERS)], "query_id long, qv array<float>"
    )
    return corpus, queries


def brute_ids(corpus, queries, k):
    out = {}
    for r in brute_force_topk(corpus, queries, k=k).collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def test_brute_force_finds_own_cluster(planted):
    corpus, queries = planted
    top = brute_force_topk(corpus, queries, k=10).collect()
    clusters = {r["vec_id"]: r["cluster"] for r in corpus.collect()}
    for r in top:
        assert clusters[r["vec_id"]] == r["query_id"]  # query c built from center c
        assert r["cosine"] > 0.9


def test_brute_force_rank_is_dense_and_ordered(planted):
    corpus, queries = planted
    rows = brute_force_topk(corpus, queries, k=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cosine"]))
    for ranks in by_q.values():
        ranks.sort()
        assert [x[0] for x in ranks] == [1, 2, 3, 4, 5]
        cos = [x[1] for x in ranks]
        assert cos == sorted(cos, reverse=True)


def test_lsh_recall_vs_brute_force(planted):
    corpus, queries = planted
    exact = brute_ids(corpus, queries, 10)
    approx = {}
    for r in lsh_topk(corpus, queries, k=10, num_hash_tables=8, bucket_length=2.0).collect():
        approx.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(exact[q] & approx.get(q, set())) / 10 for q in exact]
    assert sum(recalls) / len(recalls) >= 0.8


def test_ivf_recall_vs_brute_force(planted):
    corpus, queries = planted
    exact = brute_ids(corpus, queries, 10)
    approx = {}
    for r in ivf_topk(corpus, queries, k=10, n_cells=N_CLUSTERS, nprobe=2).collect():
        approx.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(exact[q] & approx.get(q, set())) / 10 for q in exact]
    assert sum(recalls) / len(recalls) >= 0.8


def test_cosine_math_known_values(spark):
    from pyspark.sql import functions as F

    from big_data_co2_emission_analysis_spark.operators.similarity import cosine

    df = spark.createDataFrame([([1.0, 0.0], [1.0, 1.0])], "a array<float>, b array<float>")
    got = df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()[0]["c"]
    assert got == pytest.approx(1 / math.sqrt(2), abs=1e-9)


def test_ivf_persisted_index_search_without_refit(planted, tmp_path, monkeypatch):
    """Build-once/search-many: after ivf_build_index, ivf_search must
    (a) match the one-shot ivf_topk result exactly, (b) never fit
    KMeans again (fit is monkeypatched to explode), and (c) lay the
    corpus out partitioned by cell so the probe filter prunes
    directories."""
    import pyspark.ml.clustering as km_mod

    from big_data_co2_emission_analysis_spark.operators.similarity import (
        ivf_build_index,
        ivf_search,
    )

    corpus, queries = planted
    spark = corpus.sparkSession
    idx = str(tmp_path / "ivf")
    ivf_build_index(corpus, idx, n_cells=N_CLUSTERS)

    cell_dirs = [p.name for p in (tmp_path / "ivf" / "cells").iterdir() if p.name.startswith("cell=")]
    assert len(cell_dirs) == N_CLUSTERS  # hive-partitioned layout

    def _no_fit(self, *a, **kw):
        raise AssertionError("search must not refit KMeans")

    monkeypatch.setattr(km_mod.KMeans, "fit", _no_fit)
    got = ivf_search(spark, idx, queries, k=10, nprobe=2)
    rows = {(r["query_id"], r["vec_id"], r["rank"]) for r in got.collect()}
    monkeypatch.undo()

    expect = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in ivf_topk(corpus, queries, k=10, n_cells=N_CLUSTERS, nprobe=2).collect()
    }
    assert rows == expect


def test_ann_recall_queries_self_validate(spark, sf_dir):
    """The registry recall queries return per-query recall@10 in [0,1];
    IVF/LSH on the fixture embeddings must clear a sane floor."""
    from big_data_co2_emission_analysis_spark.queries.mlops import (
        ann_ivf_recall,
        ann_lsh_recall,
    )

    for fn, floor in ((ann_ivf_recall, 0.3), (ann_lsh_recall, 0.3)):
        rows = fn(spark, sf_dir).collect()
        assert len(rows) == 5
        assert all(0.0 <= r["recall_at_10"] <= 1.0 for r in rows)
        avg = sum(r["recall_at_10"] for r in rows) / len(rows)
        assert avg >= floor, f"{fn.__name__} avg recall {avg}"


def test_pq_recall_on_planted_clusters(planted, tmp_path):
    from big_data_co2_emission_analysis_spark.operators.similarity import (
        pq_build_index,
        pq_search,
    )

    corpus, queries = planted
    path = str(tmp_path / "pq")
    pq_build_index(corpus, path, m=4, ks=16)
    exact = brute_ids(corpus, queries, 10)
    approx = {}
    res = pq_search(corpus.sparkSession, path, queries, k=10, refine=4).collect()
    for r in res:
        approx.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(exact[q] & approx.get(q, set())) / 10 for q in exact]
    assert sum(recalls) / len(recalls) >= 0.8
    # re-ranked cosines are exact: every reported neighbor of query c
    # sits in cluster c with near-1 cosine
    clusters = {r["vec_id"]: r["cluster"] for r in corpus.collect()}
    hits = [clusters[r["vec_id"]] == r["query_id"] for r in res]
    assert sum(hits) / len(hits) >= 0.8


def test_pq_search_never_refits_and_is_deterministic(planted, tmp_path):
    from big_data_co2_emission_analysis_spark.operators.similarity import (
        pq_build_index,
        pq_search,
    )

    corpus, queries = planted
    path = str(tmp_path / "pq2")
    pq_build_index(corpus, path, m=4, ks=16)
    spark = corpus.sparkSession
    a = [tuple(r) for r in pq_search(spark, path, queries, k=5).collect()]
    b = [tuple(r) for r in pq_search(spark, path, queries, k=5).collect()]
    assert a == b


def test_pq_search_caps_driver_side_query_collect(planted, tmp_path):
    """pq_search collects the query batch to the driver (for the ADC
    LUT broadcast); beyond max_queries it must refuse with a clear
    error, never silently collect an unbounded table."""
    import pytest

    from big_data_co2_emission_analysis_spark.operators.similarity import (
        pq_build_index,
        pq_search,
    )

    corpus, queries = planted
    path = str(tmp_path / "pq3")
    pq_build_index(corpus, path, m=4, ks=16)
    spark = corpus.sparkSession
    with pytest.raises(ValueError, match="max_queries"):
        pq_search(spark, path, queries, k=5, max_queries=2)
    # at the cap exactly, it runs
    n_queries = queries.count()
    assert pq_search(spark, path, queries, k=5, max_queries=n_queries).count() > 0


def test_pq_build_rejects_unbounded_train_sample(planted, tmp_path):
    import pytest

    from big_data_co2_emission_analysis_spark.operators.similarity import pq_build_index

    corpus, _ = planted
    with pytest.raises(ValueError, match="train_sample"):
        pq_build_index(corpus, str(tmp_path / "pq4"), m=4, ks=16, train_sample=2_000_000)


def test_pq_search_string_query_ids(planted, tmp_path):
    """The qmap schema derives the id type from the query table --
    string ids must work (regression: it was hardcoded `long`)."""
    from big_data_co2_emission_analysis_spark.operators.similarity import (
        pq_build_index,
        pq_search,
    )

    corpus, queries = planted
    squeries = queries.select(
        F.concat(F.lit("q-"), F.col("query_id").cast("string")).alias("query_id"), "qv"
    )
    path = str(tmp_path / "pq5")
    pq_build_index(corpus, path, m=4, ks=16)
    res = pq_search(corpus.sparkSession, path, squeries, k=5).collect()
    assert len(res) > 0
    assert all(r["query_id"].startswith("q-") for r in res)


def test_pq_registry_recall_floor(spark, sf_dir):
    from big_data_co2_emission_analysis_spark.queries.mlops import ann_pq_recall

    rows = ann_pq_recall(spark, sf_dir).collect()
    assert len(rows) == 5
    assert all(0.0 <= r["recall_at_10"] <= 1.0 for r in rows)
    avg = sum(r["recall_at_10"] for r in rows) / len(rows)
    assert avg >= 0.3, f"pq avg recall {avg}"


def test_ivf_search_assigned_matches_bruteforce_when_probing_all(spark):
    # nprobe = n_cells degenerates to exact search: results must equal
    # the brute-force baseline
    from big_data_co2_emission_analysis_spark.ml.deterministic import (
        deterministic_kmeans,
    )
    from big_data_co2_emission_analysis_spark.operators.similarity import (
        brute_force_topk,
        ivf_search_assigned,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(120)
    assignments, centroids = deterministic_kmeans(
        emb, "vec_id", "embedding", k=4, n_iter=3, seed=7
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    ivf = ivf_search_assigned(
        emb, assignments, centroids, queries, k=5, nprobe=4
    )
    bf = brute_force_topk(emb, queries, k=5, round_dp=6)
    got = {(r.query_id, r.rank): r.vec_id for r in ivf.collect()}
    exp = {(r.query_id, r.rank): r.vec_id for r in bf.collect()}
    assert got == exp


def test_ivf_search_assigned_scans_only_probed_cells(spark):
    # with nprobe=1, every result's corpus row must belong to the
    # query's nearest cell
    from big_data_co2_emission_analysis_spark.ml.deterministic import (
        deterministic_kmeans,
    )
    from big_data_co2_emission_analysis_spark.operators.similarity import (
        ivf_search_assigned,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(120)
    assignments, centroids = deterministic_kmeans(
        emb, "vec_id", "embedding", k=4, n_iter=3, seed=7
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    out = ivf_search_assigned(emb, assignments, centroids, queries, k=5, nprobe=1)
    asg = {r.vec_id: r.cluster for r in assignments.collect()}
    cells_per_query = {}
    for r in out.collect():
        cells_per_query.setdefault(r.query_id, set()).add(asg[r.vec_id])
    for cells in cells_per_query.values():
        assert len(cells) == 1  # exactly the one probed cell
