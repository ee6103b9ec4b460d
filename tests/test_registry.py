"""Registry contract sanity: unique names, oracle keys subset, entry()
smoke, approximate-aggregate accuracy envelope."""

import pytest


def test_registry_shape():
    import __spark_entry__ as mod

    qs, os_ = mod.queries(), mod.oracle_sql()
    assert len(qs) >= 50
    assert set(os_) <= set(qs)
    # every oracle references a fixture table OR a committed expected
    # table (replication oracles for generator sources / seeded
    # pipelines read fixtures/expected_*/... parquet instead)
    tables = "region nation customer supplier part orders lineitem events documents embeddings".split()
    for name, sql in os_.items():
        assert any(t in sql for t in tables) or "fixtures/expected" in sql, name


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"l_returnflag", "sum_qty", "count_order"} <= set(df.columns)


def test_approx_count_distinct_envelope(spark, sf_dir):
    from big_data_co2_emission_analysis_spark.queries.relational import (
        approx_distinct_parts,
        distinct_parts_per_flag,
    )

    exact = {r["l_returnflag"]: r["n_parts"] for r in distinct_parts_per_flag(spark, sf_dir).collect()}
    approx = {r["l_returnflag"]: r["approx_parts"] for r in approx_distinct_parts(spark, sf_dir).collect()}
    for k, e in exact.items():
        assert approx[k] == pytest.approx(e, rel=0.05)


def test_sample_envelope(spark, sf_dir):
    from big_data_co2_emission_analysis_spark.queries.relational import sample_lineitem

    n_total = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    n_sample = sample_lineitem(spark, sf_dir).count()
    assert 0.05 * n_total < n_sample < 0.15 * n_total
    # seeded: stable across invocations on the same partitioning
    assert sample_lineitem(spark, sf_dir).count() == n_sample


def test_kmeans_invariants(spark, sf_dir):
    from big_data_co2_emission_analysis_spark.queries.mlops import kmeans_user_change

    assigned = kmeans_user_change(spark, sf_dir)
    rows = assigned.collect()
    assert all(r["cluster"] is not None for r in rows)
    n_clusters = len({r["cluster"] for r in rows})
    assert 1 < n_clusters <= 5


def test_elbow_sweep_monotone_trend(spark, sf_dir):
    """Cost at k=8 must be well below cost at k=2 (not strictly
    monotone per step, but the sweep must trend down)."""
    from big_data_co2_emission_analysis_spark.ml.clustering import assemble_features, elbow_sweep
    from big_data_co2_emission_analysis_spark.queries.co2_shaped import user_change_df

    base = assemble_features(user_change_df(spark, sf_dir), ["change", "is_reduced"])
    points = elbow_sweep(base, ks=range(2, 9, 2), sample_fraction=None)
    costs = [p.cost for p in points]
    assert costs[-1] < costs[0]


def test_percentile_approx_envelope(spark, sf_dir):
    """The sketch median must land within 1% (relative) of the exact
    interpolated median at the 10000-accuracy setting."""
    from big_data_co2_emission_analysis_spark.queries.advanced import (
        approx_quartiles_per_flag,
        quartiles_per_flag,
    )

    exact = {r["l_returnflag"]: r["median"] for r in quartiles_per_flag(spark, sf_dir).collect()}
    approx = {
        r["l_returnflag"]: r["approx_median"]
        for r in approx_quartiles_per_flag(spark, sf_dir).collect()
    }
    for k, e in exact.items():
        assert approx[k] == pytest.approx(e, rel=0.01)


def test_freq_items_superset_of_true_heavy_hitters(spark, sf_dir):
    """freqItems may over-report but must never MISS an item above the
    support threshold (the sketch's one-sided guarantee)."""
    from pyspark.sql import functions as F

    from big_data_co2_emission_analysis_spark.queries.advanced import freq_brands_sketch

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    n = part.count()
    true_heavy = {
        r["p_brand"]
        for r in part.groupBy("p_brand").count().filter(F.col("count") > 0.02 * n).collect()
    }
    reported = {r["brand"] for r in freq_brands_sketch(spark, sf_dir).collect()}
    assert true_heavy <= reported


def test_approx_distinct_calibration_within_rsd(spark, sf_dir):
    """approx_count_distinct at rsd=0.05 must land within ~3 rsd of the
    exact count on every group (the sketch's own error contract)."""
    from big_data_co2_emission_analysis_spark.queries.relational import (
        approx_distinct_calibration,
    )

    rows = approx_distinct_calibration(spark, sf_dir).collect()
    assert rows and all(r["rel_error"] <= 0.15 for r in rows)


def test_hll_sketch_union_within_error_envelope(spark, sf_dir):
    """Union-of-monthly-partial-sketches must estimate the whole-set
    cardinality within the HLL envelope (lgK=14 -> ~0.8% rsd; assert
    3 sigma)."""
    from big_data_co2_emission_analysis_spark.queries.advanced import (
        hll_sketch_union_estimate,
    )

    rows = hll_sketch_union_estimate(spark, sf_dir).collect()
    assert rows, "no priorities"
    for r in rows:
        assert r["rel_err"] <= 0.025, (r["o_orderpriority"], r["rel_err"])


def test_distinct_per_flag_scale_branch_excludes_null_keys(spark):
    """The repartition-first rollup must agree with COUNT(DISTINCT) on
    NULL-bearing keys: the inner groupBy keeps a NULL-key group, and
    counting groups with count(lit(1)) would inflate n_parts/n_supps by
    one per flag (the r9 ADVICE finding -- the byte gate means the
    fixture-scale oracle never exercises this branch, so pin it here)."""
    from pyspark.sql import functions as F

    from big_data_co2_emission_analysis_spark.queries.relational import (
        _distinct_per_flag_repartitioned,
    )

    li = spark.createDataFrame(
        [
            ("A", 1, 10), ("A", 1, None), ("A", None, 10), ("A", 2, 11),
            ("N", None, None), ("N", None, None),          # all-NULL flag group
            ("R", 5, 20), ("R", None, 20), ("R", 5, None),
        ],
        "l_returnflag string, l_partkey int, l_suppkey int",
    )
    stock = {
        r.l_returnflag: (r.n_parts, r.n_supps, r.n_lines)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count("*").alias("n_lines"),
        )
        .collect()
    }
    scaled = {
        r.l_returnflag: (r.n_parts, r.n_supps, r.n_lines)
        for r in _distinct_per_flag_repartitioned(li, 4).collect()
    }
    assert scaled == stock == {"A": (2, 2, 4), "N": (0, 0, 2), "R": (1, 1, 3)}
