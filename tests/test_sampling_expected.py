"""Pins the spec-Python replication behind the keyed train/test-split
oracle (tools/gen_sampling_expected.py): Spark's folded multi-arg
``xxhash64(key, lit(seed))`` is hashLong(key, 42) then hashInt(seed, .)
-- validated bit-for-bit here so the expected table is trustworthy."""

from __future__ import annotations

import os
import struct
import sys

import pandas as pd
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from gen_sampling_expected import MOD, SEED, TEST_FRACTION, side_of  # noqa: E402
from pyxxh64 import xxh64_signed  # noqa: E402

EXPECTED = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "expected_sampling",
    "custkey_side.parquet",
)


def test_folded_xxhash64_matches_spark(spark):
    """xxhash64(long_col, lit(int)) == xxh64(int4, seed=xxh64(long8, 42))
    for a spread of custkey-like values including boundaries."""
    vals = [0, 1, 2, 149999, 1 << 40, -1, -12345]
    df = spark.createDataFrame([(v,) for v in vals], "k long")
    rows = df.select("k", F.xxhash64("k", F.lit(SEED)).alias("h")).collect()
    for r in rows:
        inner = xxh64_signed(struct.pack("<q", r.k), 42)
        outer = xxh64_signed(struct.pack("<i", SEED), inner % (1 << 64))
        assert r.h == outer, f"fold mismatch at k={r.k}"


def test_side_of_matches_spark_bucketing(spark):
    """End-to-end: the replicated side equals the engine's bucket rule
    (pmod(h, 1e6)/1e6 < 0.25) for a 500-key sample."""
    keys = list(range(1, 400)) + [10_000, 14_999, 149_999, 1_499_999]
    df = spark.createDataFrame([(k,) for k in keys], "custkey long")
    bucket = F.pmod(F.xxhash64("custkey", F.lit(SEED)), F.lit(MOD)) / float(MOD)
    rows = df.select(
        "custkey",
        F.when(bucket < TEST_FRACTION, "test").otherwise("train").alias("side"),
    ).collect()
    for r in rows:
        assert side_of(r.custkey) == r.side, f"side mismatch at {r.custkey}"


def test_expected_table_covers_fixture_custkeys(sf_dir):
    """Every o_custkey in the fixture is present in the expected table
    (a missing key would silently drop oracle rows)."""
    exp = pd.read_parquet(EXPECTED)
    import duckdb

    got = {
        int(k)
        for (k,) in duckdb.sql(
            f"SELECT DISTINCT o_custkey FROM '{sf_dir}/orders.parquet'"
        ).fetchall()
    }
    assert got <= set(exp["custkey"]), "expected table misses fixture custkeys"


# -- r10 deterministic hash-threshold samplers ------------------------------


def test_hash_threshold_sample_partitioning_independent(spark):
    """The det sampler's row set must be IDENTICAL on any partitioning
    (the whole point vs df.sample's per-partition RNG streams) and the
    realized rate must sit in a Bernoulli envelope."""
    from pyspark.sql import functions as F

    from big_data_co2_emission_analysis_spark.operators.sampling import (
        hash_threshold_sample,
    )

    df = spark.range(20_000).withColumnRenamed("id", "k")
    a = {r.k for r in hash_threshold_sample(df, 0.2, F.col("k")).collect()}
    b = {
        r.k
        for r in hash_threshold_sample(df.repartition(17, "k"), 0.2, F.col("k")).collect()
    }
    assert a == b
    assert 0.17 < len(a) / 20_000 < 0.23
    # seed draws an (almost surely) different set
    c = {r.k for r in hash_threshold_sample(df, 0.2, F.col("k"), seed=7).collect()}
    assert c != a and 0.17 < len(c) / 20_000 < 0.23


def test_sql_portable_uniform_matches_python_twin(spark):
    """The SQL emitter next to _portable_uniform must replay the exact
    doubles DuckDB-side -- compare against Spark evaluating both the
    Column form and the emitted SQL string."""
    import duckdb

    from big_data_co2_emission_analysis_spark.operators.sampling import (
        _portable_uniform,
        sql_portable_uniform,
    )
    from pyspark.sql import functions as F

    keys = [0, 1, 2, 12345, 2**31 - 1, 2**31, 2**40, -5]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    spark_vals = [
        r.u for r in df.select(_portable_uniform(F.col("k"), 42).alias("u"))
        .collect()
    ]
    duck_vals = [
        duckdb.sql(f"SELECT {sql_portable_uniform(str(k), 42)}").fetchone()[0]
        for k in keys
    ]
    assert spark_vals == duck_vals  # bit-exact doubles
    assert all(0.0 < u <= 1.0 for u in spark_vals)


def test_stratified_hash_sample_contract(spark):
    """Unlisted strata drop entirely; listed strata keep ~their
    fraction; fraction 1.0 keeps everything; empty dict raises."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from big_data_co2_emission_analysis_spark.operators.sampling import (
        stratified_hash_sample,
    )

    df = spark.range(9_000).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("s")
    )
    out = stratified_hash_sample(df, "s", {"0": 1.0, "1": 0.25}, F.col("k"))
    counts = {r.s: r.n for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert counts["0"] == 3_000          # fraction 1.0: everything
    assert "2" not in counts             # unlisted stratum dropped
    assert 0.18 * 3_000 < counts["1"] < 0.32 * 3_000
    with _pytest.raises(ValueError):
        stratified_hash_sample(df, "s", {}, F.col("k"))


def test_mixture_hash_sample_semantics(spark):
    """Binding domain kept in full, realized proportions ~ target
    weights, domains absent from the weight dict dropped -- the
    mixture_sample contract, now partitioning-independent."""
    from pyspark.sql import functions as F

    from big_data_co2_emission_analysis_spark.operators.sampling import (
        mixture_hash_sample,
    )

    rows = (
        [("web", i) for i in range(8_000)]
        + [("books", 100_000 + i) for i in range(1_000)]
        + [("code", 200_000 + i) for i in range(3_000)]
        + [("junk", 300_000 + i) for i in range(500)]
    )
    df = spark.createDataFrame(rows, "dom string, k long")
    out = mixture_hash_sample(df, "dom", {"web": 0.5, "books": 0.25, "code": 0.25}, F.col("k"))
    counts = {r.dom: r.n for r in out.groupBy("dom").agg(F.count("*").alias("n")).collect()}
    assert "junk" not in counts
    # books binds (supply 1000 / weight .25 = 4000 is the min scale):
    # kept in full; web keeps .5*4000=2000 of 8000; code .25*4000=1000 of 3000
    assert counts["books"] == 1_000
    assert 0.8 * 2_000 < counts["web"] < 1.2 * 2_000
    assert 0.8 * 1_000 < counts["code"] < 1.2 * 1_000
    # partitioning independence of the whole pipeline
    again = {
        r.dom: r.n
        for r in mixture_hash_sample(
            df.repartition(13, "k"), "dom", {"web": 0.5, "books": 0.25, "code": 0.25}, F.col("k")
        ).groupBy("dom").agg(F.count("*").alias("n")).collect()
    }
    assert again == counts
