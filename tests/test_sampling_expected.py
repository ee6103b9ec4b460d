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
