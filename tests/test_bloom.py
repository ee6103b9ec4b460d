"""From-scratch distributed Bloom filter (operators/bloom.py): no
false negatives, bounded false positives, the bitmap-size guard, and
end-to-end parity of the bloom-prefiltered contamination check with
the broadcast-exact one."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_co2_emission_analysis_spark.operators.bloom import (
    bloom_prefilter,
    build_bloom_bitmap,
)


def _keys(spark, prefix, n):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("key")
    )


def test_no_false_negatives(spark):
    """Every inserted key MUST survive the prefilter -- the property
    that makes bloom-prune-then-exact-confirm lossless."""
    members = _keys(spark, "in-", 2000)
    bitmap, m, k = build_bloom_bitmap(members, "key")
    survivors = bloom_prefilter(members, "key", bitmap, m, k)
    assert survivors.count() == 2000


def test_false_positive_rate_bounded(spark):
    """Non-members mostly get pruned: with bits_per_key=10, k=6 the
    design fpp is ~1%; assert an order-of-magnitude bound (<10%)."""
    members = _keys(spark, "in-", 2000)
    others = _keys(spark, "out-", 5000)
    bitmap, m, k = build_bloom_bitmap(members, "key")
    fp = bloom_prefilter(others, "key", bitmap, m, k).count()
    assert fp / 5000 < 0.10


def test_bitmap_guard_raises(spark):
    members = _keys(spark, "in-", 5000)
    with pytest.raises(ValueError, match="max_bits"):
        build_bloom_bitmap(members, "key", max_bits=1 << 12)


def test_prefilter_preserves_other_columns_and_partitioning_invariance(spark):
    df = spark.range(1000).select(
        F.concat(F.lit("k"), (F.col("id") % 100).cast("string")).alias("key"),
        F.col("id").alias("payload"),
    )
    sub = df.filter(F.col("payload") < 500)
    bitmap, m, k = build_bloom_bitmap(sub, "key")
    out = bloom_prefilter(df.repartition(7), "key", bitmap, m, k)
    assert out.columns == ["key", "payload"]
    # keys k0..k99 all appear in sub (payload<500 covers every key mod
    # 100), so everything must survive regardless of partitioning
    assert out.count() == 1000


def test_bloom_contamination_matches_exact(spark, sf_dir):
    """End-to-end: the bloom-prefiltered contamination query must be
    row-identical to the broadcast-exact one (bloom only prunes; the
    exact-confirm join removes false positives)."""
    from big_data_co2_emission_analysis_spark.queries.text_queries import (
        contamination_check,
        contamination_check_bloom,
    )

    exact = {tuple(r) for r in contamination_check(spark, sf_dir).collect()}
    bloom = {tuple(r) for r in contamination_check_bloom(spark, sf_dir).collect()}
    assert bloom == exact and exact


def test_jvm_prefilter_parity_with_udf_variant(spark):
    """bloom_prefilter_jvm (broadcast array<long> + codegen bit test)
    must keep exactly the same survivors as the Pandas-UDF bitmap
    lookup -- same positions, same bitmap, different execution path."""
    from big_data_co2_emission_analysis_spark.operators.bloom import (
        bloom_prefilter_jvm,
    )

    members = _keys(spark, "in-", 1500)
    others = _keys(spark, "out-", 1500)
    both = members.unionByName(others)
    bitmap, m, k = build_bloom_bitmap(members, "key")
    udf_set = {r["key"] for r in bloom_prefilter(both, "key", bitmap, m, k).collect()}
    jvm_set = {r["key"] for r in bloom_prefilter_jvm(both, "key", bitmap, m, k).collect()}
    assert jvm_set == udf_set
    assert {f"in-{i}" for i in range(1500)} <= jvm_set  # no false negatives


def test_sparse_build_bit_identical_to_aggregate_build(spark):
    """build_bloom_bitmap_sparse (the shuffle-free per-batch delta
    build) must produce byte-for-byte the bitmap of the aggregate
    build at the same geometry -- the streaming snapshot ORs deltas
    from one onto bootstraps from the other."""
    from big_data_co2_emission_analysis_spark.operators.bloom import (
        build_bloom_bitmap,
        build_bloom_bitmap_sparse,
    )

    keys = spark.createDataFrame(
        [(f"doc-{i}",) for i in range(3000)], "key string"
    ).repartition(7)
    m = 1 << 15
    dense, m1, k1 = build_bloom_bitmap(keys, "key", m=m)
    sparse, m2, k2 = build_bloom_bitmap_sparse(keys, "key", m=m)
    assert (m1, k1) == (m2, k2)
    assert dense == sparse

    # empty input -> all-zero bitmap, not an error
    empty = spark.createDataFrame([], "key string")
    z, _, _ = build_bloom_bitmap_sparse(empty, "key", m=1 << 12)
    assert z == bytes(1 << 12 >> 3)
