"""SemDeDup (operators/semdedup.py): planted-pair detection, survivor
rule, chain semantics, hot-cluster cap, and the documented
cross-cluster miss."""

import pytest
from pyspark.sql import functions as F

from big_data_co2_emission_analysis_spark.operators.semdedup import (
    semantic_cluster_stats,
    semantic_dedup_pairs,
    semantic_dedup_survivors,
)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _asg(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, cluster int")


def test_planted_pair_found_and_survivor_kept(spark):
    emb = _emb(
        spark,
        [
            (1, [1.0, 0.0]),
            (2, [0.999, 0.01]),   # near-dup of 1
            (3, [0.0, 1.0]),      # orthogonal
        ],
    )
    asg = _asg(spark, [(1, 0), (2, 0), (3, 0)])
    pairs = semantic_dedup_pairs(emb, asg, min_cosine=0.95).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]
    assert pairs[0].cosine >= 0.99
    kept = sorted(r.vec_id for r in semantic_dedup_survivors(emb, asg, min_cosine=0.95).collect())
    assert kept == [1, 3]


def test_chain_keeps_only_min(spark):
    # a ~ b and b ~ c with a !~ c: keep-min drops BOTH b and c
    emb = _emb(
        spark,
        [
            (1, [1.0, 0.0]),
            (2, [0.98, 0.199]),  # cos(1,2) ~ 0.98
            (3, [0.92, 0.392]),  # cos(2,3) ~ 0.98, cos(1,3) ~ 0.92
        ],
    )
    asg = _asg(spark, [(1, 0), (2, 0), (3, 0)])
    pairs = {(r.id_a, r.id_b) for r in semantic_dedup_pairs(emb, asg, min_cosine=0.95).collect()}
    assert pairs == {(1, 2), (2, 3)}
    kept = sorted(r.vec_id for r in semantic_dedup_survivors(emb, asg, min_cosine=0.95).collect())
    assert kept == [1]


def test_cross_cluster_pair_missed_by_design(spark):
    # identical vectors in DIFFERENT clusters are not paired -- the
    # SemDeDup approximation this module documents
    emb = _emb(spark, [(1, [1.0, 0.0]), (2, [1.0, 0.0])])
    asg = _asg(spark, [(1, 0), (2, 1)])
    assert semantic_dedup_pairs(emb, asg, min_cosine=0.95).count() == 0
    kept = sorted(r.vec_id for r in semantic_dedup_survivors(emb, asg, min_cosine=0.95).collect())
    assert kept == [1, 2]


def test_max_cluster_size_cap_and_stats(spark):
    # cluster 0 has 3 rows (over cap 2) -> skipped entirely; cluster 1
    # has a pair under the cap -> found
    emb = _emb(
        spark,
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.0]),
            (3, [1.0, 0.0]),
            (10, [0.0, 1.0]),
            (11, [0.0, 1.0]),
        ],
    )
    asg = _asg(spark, [(1, 0), (2, 0), (3, 0), (10, 1), (11, 1)])
    pairs = semantic_dedup_pairs(emb, asg, min_cosine=0.95, max_cluster_size=2).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(10, 11)]

    stats = semantic_cluster_stats(emb, asg, max_cluster_size=2).head()
    assert stats.n_clusters == 2
    assert stats.n_skipped_clusters == 1
    assert stats.n_skipped_rows == 3
    assert stats.max_cluster == 3
    assert stats.candidate_pairs == 1


def test_threshold_is_on_rounded_cosine(spark):
    # cosine rounds to 6 dp BEFORE thresholding: a pair at exactly the
    # rounded threshold is kept
    emb = _emb(spark, [(1, [1.0, 0.0]), (2, [1.0, 0.0])])
    asg = _asg(spark, [(1, 0), (2, 0)])
    pairs = semantic_dedup_pairs(emb, asg, min_cosine=1.0).collect()
    assert [(r.id_a, r.id_b, r.cosine) for r in pairs] == [(1, 2, 1.0)]


def test_gemm_and_native_backends_agree(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    from big_data_co2_emission_analysis_spark.ml.deterministic import (
        deterministic_kmeans,
    )

    asg, _ = deterministic_kmeans(emb, "vec_id", "embedding", k=4, n_iter=3, seed=7)
    a = sorted(
        (r.id_a, r.id_b, r.cluster, r.cosine)
        for r in semantic_dedup_pairs(emb, asg, min_cosine=0.3, backend="gemm").collect()
    )
    b = sorted(
        (r.id_a, r.id_b, r.cluster, r.cosine)
        for r in semantic_dedup_pairs(emb, asg, min_cosine=0.3, backend="native").collect()
    )
    assert a == b


def test_skipped_cluster_rows_survive_unexamined(spark):
    # over-cap clusters are excluded from the PAIR SEARCH only: their
    # rows must all remain in the survivor set (skip + monitor, never
    # silent deletion)
    emb = _emb(
        spark,
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.0]),
         (10, [0.0, 1.0]), (11, [0.0, 1.0])],
    )
    asg = _asg(spark, [(1, 0), (2, 0), (3, 0), (10, 1), (11, 1)])
    kept = sorted(
        r.vec_id
        for r in semantic_dedup_survivors(
            emb, asg, min_cosine=0.95, max_cluster_size=2
        ).collect()
    )
    # cluster 0 (3 rows, over cap): all survive; cluster 1: 11 drops
    assert kept == [1, 2, 3, 10]


def test_zero_norm_vectors_excluded_from_pairs_but_survive(spark):
    emb = _emb(
        spark,
        [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [1.0, 0.0]), (4, [1.0, 0.0])],
    )
    asg = _asg(spark, [(1, 0), (2, 0), (3, 0), (4, 0)])
    for backend in ("gemm", "native"):
        pairs = [
            (r.id_a, r.id_b)
            for r in semantic_dedup_pairs(
                emb, asg, min_cosine=0.95, backend=backend
            ).collect()
        ]
        assert pairs == [(3, 4)], backend
    kept = sorted(
        r.vec_id for r in semantic_dedup_survivors(emb, asg, min_cosine=0.95).collect()
    )
    assert kept == [1, 2, 3]  # zero-norm rows survive; 4 deduped


def test_broadcast_assignment_agrees_with_literal_path(spark, sf_dir):
    """The large-k broadcast-join quantizer must reproduce the
    literal-expression assignment of deterministic_kmeans row-for-row
    (same tie-break convention)."""
    from big_data_co2_emission_analysis_spark.ml.deterministic import (
        deterministic_kmeans,
    )
    from big_data_co2_emission_analysis_spark.operators.semdedup import (
        assign_by_broadcast_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(150)
    lit_asg, centroids = deterministic_kmeans(
        emb, "vec_id", "embedding", k=6, n_iter=3, seed=11
    )
    bc_asg = assign_by_broadcast_centroids(emb, centroids)
    a = sorted((r.vec_id, r.cluster) for r in lit_asg.collect())
    b = sorted((r.vec_id, r.cluster) for r in bc_asg.collect())
    assert a == b


def test_gemm_blocked_path_matches_native(spark, sf_dir):
    """Multi-block GEMM (block smaller than the cluster) must agree
    with the native twin pair-for-pair -- exercises the block-boundary
    triangle logic the default 1024 block hides at test scale."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(90)
    asg = emb.select("vec_id", (F.col("vec_id") % 2).cast("int").alias("cluster"))
    a = sorted(
        (r.id_a, r.id_b, r.cluster, r.cosine)
        for r in semantic_dedup_pairs(
            emb, asg, min_cosine=0.2, backend="gemm", gemm_block_rows=7
        ).collect()
    )
    b = sorted(
        (r.id_a, r.id_b, r.cluster, r.cosine)
        for r in semantic_dedup_pairs(
            emb, asg, min_cosine=0.2, backend="native"
        ).collect()
    )
    assert a and a == b


def test_gemm_string_ids_utf8_order(spark):
    """Non-ASCII string ids: pair orientation must follow UTF-8 byte
    order (Spark UTF8_BINARY), matching the native backend."""
    emb = spark.createDataFrame(
        [("å1", [1.0, 0.0]), ("z2", [1.0, 0.001]), ("a0", [0.999, 0.01])],
        "vec_id string, embedding array<float>",
    )
    asg = spark.createDataFrame(
        [("å1", 0), ("z2", 0), ("a0", 0)], "vec_id string, cluster int"
    )
    for backend in ("gemm", "native"):
        pairs = sorted(
            (r.id_a, r.id_b)
            for r in semantic_dedup_pairs(
                emb, asg, min_cosine=0.95, backend=backend
            ).collect()
        )
        # UTF-8 bytes: 'a0' < 'z2' < 'å1' (0xC3...)
        assert pairs == [("a0", "z2"), ("a0", "å1"), ("z2", "å1")], backend


def test_train_sampled_quantizer_deterministic_and_separating(spark):
    """The sampled numpy trainer: (a) same data + seed => identical
    centroids call-over-call, (b) on a corpus with two well-separated
    blobs and k=2 the broadcast assignment puts each blob in one
    cluster, (c) k above the sample size raises loudly."""
    import pytest as _pytest

    from big_data_co2_emission_analysis_spark.operators.semdedup import (
        assign_by_broadcast_centroids,
        train_sampled_quantizer,
    )

    rows = [(i, [10.0 + (i % 7) * 0.01, 0.0]) for i in range(40)] + [
        (100 + i, [0.0, 10.0 + (i % 7) * 0.01]) for i in range(40)
    ]
    emb = _emb(spark, rows)
    c1 = train_sampled_quantizer(emb, k=2, sample_rows=80, seed=7, n_iter=5)
    c2 = train_sampled_quantizer(emb, k=2, sample_rows=80, seed=7, n_iter=5)
    assert c1 == c2
    asg = {
        r.vec_id: r.cluster
        for r in assign_by_broadcast_centroids(emb, c1).collect()
    }
    blob_a = {asg[i] for i in range(40)}
    blob_b = {asg[100 + i] for i in range(40)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b
    with _pytest.raises(ValueError, match="exceeds the sample"):
        train_sampled_quantizer(emb, k=200, sample_rows=80)


def test_train_sampled_quantizer_sample_autoscales_with_k(spark):
    """The VERDICT-r6 k ceiling: k = sqrt(N) sizing used to hit a
    ValueError cliff when k outgrew the FIXED 20k (here: 50) sample.
    The sample now auto-scales to max(sample_rows, 40*k), so a k well
    past the configured sample trains fine as long as the corpus has
    >= k rows -- and returns exactly k centroids."""
    from big_data_co2_emission_analysis_spark.operators.semdedup import (
        train_sampled_quantizer,
    )

    n = 1200
    rows = [(i, [float(i % 31), float((i * 7) % 17)]) for i in range(n)]
    emb = _emb(spark, rows)
    # k=600 >> sample_rows=50: pre-fix this raised; now the effective
    # sample is 40*600=24k -> the whole 1200-row corpus, which is >= k
    cents = train_sampled_quantizer(emb, k=600, sample_rows=50, n_iter=2)
    assert len(cents) == 600 and all(len(c) == 2 for c in cents)


def test_bigk_query_matches_literal_path_at_fixture_scale(spark, sf_dir):
    """semdedup_pairs_bigk routes through assign_by_broadcast_centroids
    but must produce the EXACT same pair set as semdedup_pairs at
    fixture scale (same centroids, parity-pinned assignment) -- the
    property its shared DuckDB oracle checks end-to-end."""
    from big_data_co2_emission_analysis_spark.queries.mlops import (
        semdedup_pairs,
        semdedup_pairs_bigk,
    )

    a = sorted(map(tuple, semdedup_pairs(spark, sf_dir).collect()))
    b = sorted(map(tuple, semdedup_pairs_bigk(spark, sf_dir).collect()))
    assert a and a == b


def test_bigk_sqrt_routing_above_threshold(spark, sf_dir, monkeypatch, tmp_path):
    """Above _BIGK_DET_MAX_ROWS the bigk query must switch to the
    sqrt(N)-sized trained quantizer: clusters multiply (k ~ sqrt(N) >>
    8), nothing is skipped by the cap, and the pair search still finds
    pairs -- the sf10 configuration exercised at test scale by lowering
    the threshold."""
    from big_data_co2_emission_analysis_spark.queries import mlops

    monkeypatch.setattr(mlops, "_BIGK_DET_MAX_ROWS", 100)
    monkeypatch.setenv("SPARK_GRAFT_CACHE_DIR", str(tmp_path))
    stats = mlops.semdedup_bigk_cluster_stats(spark, sf_dir).collect()[0]
    n = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    )
    import math

    want_k = max(2, int(math.isqrt(n)))
    # trained quantizer: as many cells as sqrt(N) (empties may collapse
    # a few), none skipped, max cluster far under the cap
    assert stats.n_clusters > 8
    assert stats.n_clusters <= want_k
    assert stats.n_skipped_clusters == 0 and stats.n_skipped_rows == 0
    assert stats.max_cluster <= 10_000
    pairs = mlops.semdedup_pairs_bigk(spark, sf_dir)
    assert pairs.count() > 0


def test_assignment_gemm_backend_matches_native(spark, sf_dir):
    """The Arrow/GEMM assignment backend (the hot scale path) must
    agree with the exact-fold native pipeline row-for-row on the
    fixture -- same nearest centroid, same first-minimum tie-break."""
    from big_data_co2_emission_analysis_spark.ml.deterministic import (
        deterministic_kmeans,
    )
    from big_data_co2_emission_analysis_spark.operators.semdedup import (
        assign_by_broadcast_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _, centroids = deterministic_kmeans(
        emb.limit(200), "vec_id", "embedding", k=6, n_iter=3, seed=11
    )
    nat = sorted(
        (r.vec_id, r.cluster)
        for r in assign_by_broadcast_centroids(emb, centroids).collect()
    )
    gem = sorted(
        (r.vec_id, r.cluster)
        for r in assign_by_broadcast_centroids(
            emb, centroids, backend="gemm"
        ).collect()
    )
    assert nat and nat == gem
    with pytest.raises(ValueError, match="backend"):
        assign_by_broadcast_centroids(emb, centroids, backend="bogus")


def test_spark_round6_vec_matches_scalar_everywhere():
    """The vectorized Spark-rounding (r6 hot-path fix) must be
    bit-identical to the exact Decimal scalar on: uniform randoms,
    values planted within float-noise of 6-dp half boundaries (both
    sides, both signs), and exact decimal ties like 0.4000005 where
    HALF_UP and half-even disagree."""
    import numpy as np

    from big_data_co2_emission_analysis_spark.operators.semdedup import (
        spark_round6,
        spark_round6_vec,
    )

    rng = np.random.RandomState(7)
    uniform = rng.uniform(-1, 1, 20000)
    k = rng.randint(-1000000, 1000000, 2000)
    # exact ties and boundary-adjacent values on both sides
    ties = (k + 0.5) / 1e6
    eps = np.array([1e-13, -1e-13, 3e-11, -3e-11, 1e-8, -1e-8])
    adjacent = (ties[:, None] + eps[None, :]).ravel()
    for vals in (uniform, ties, adjacent, np.array([0.4000005, -0.4000005, 0.9999995])):
        got = spark_round6_vec(vals)
        want = np.array([spark_round6(float(x)) for x in vals])
        mismatch = np.nonzero(got != want)[0]
        assert mismatch.size == 0, (
            vals[mismatch[:5]],
            got[mismatch[:5]],
            want[mismatch[:5]],
        )
