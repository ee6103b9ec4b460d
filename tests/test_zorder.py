"""Z-order clustering: bit-interleave correctness, and the actual
data-skipping benefit -- per-file min-max ranges must shrink in BOTH
dimensions vs a single-column sort (where the second dimension's
per-file range stays ~global)."""

import pytest
from pyspark.sql import functions as F

from big_data_co2_emission_analysis_spark.functions.zorder import (
    add_zorder_key,
    interleave_bits,
    zorder_write,
)


def test_interleave_bits_known_values(spark):
    # x=0b11, y=0b00 -> bits of x land at even positions: 0b0101 = 5
    # x=0b00, y=0b11 -> odd positions: 0b1010 = 10
    # x=0b11, y=0b11 -> 0b1111 = 15
    df = spark.createDataFrame([(3, 0), (0, 3), (3, 3), (2, 1)], "x long, y long")
    got = df.select(
        "x", "y", interleave_bits([F.col("x"), F.col("y")], bits=2).alias("z")
    ).collect()
    expect = {(3, 0): 5, (0, 3): 10, (3, 3): 15, (2, 1): 0b0110}  # x bit1@2, y bit0@1
    assert {(r["x"], r["y"]): r["z"] for r in got} == expect


def test_zorder_key_orders_by_locality(spark):
    """Grid corners: z-keys of same-quadrant points must be closer than
    cross-quadrant points."""
    pts = [(i, x, y) for i, (x, y) in enumerate([(1, 1), (2, 2), (100, 100), (99, 99), (1, 100), (100, 1)])]
    df = spark.createDataFrame(pts, "i long, x long, y long")
    keyed = {r["i"]: r["__zkey"] for r in add_zorder_key(df, ["x", "y"], bits=8).collect()}
    assert abs(keyed[0] - keyed[1]) < abs(keyed[0] - keyed[2])  # near < far
    assert abs(keyed[2] - keyed[3]) < abs(keyed[2] - keyed[5])


def test_zorder_write_clusters_both_dimensions(spark, sf_dir, tmp_path):
    """The payoff: after zorder_write on (l_partkey, l_suppkey), every
    file covers a small slice of BOTH key ranges; after a plain
    single-column sort, the second column's per-file range stays near
    global.  (Per-file min-max is exactly what parquet footer pruning
    uses.)"""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_partkey", "l_suppkey")
    z_path, s_path = str(tmp_path / "z"), str(tmp_path / "s")
    zorder_write(li, z_path, ["l_partkey", "l_suppkey"], num_files=8)
    li.repartitionByRange(8, "l_partkey").sortWithinPartitions("l_partkey").write.parquet(s_path)

    def per_file_avg_range(path, col):
        import pyarrow.parquet as pq
        import pathlib

        spans = []
        for f in pathlib.Path(path).glob("*.parquet"):
            t = pq.read_table(f, columns=[col])[col]
            if len(t):
                spans.append(max(t.to_pylist()) - min(t.to_pylist()))
        return sum(spans) / len(spans)

    global_span = li.agg((F.max("l_suppkey") - F.min("l_suppkey")).alias("s")).collect()[0]["s"]
    z_supp = per_file_avg_range(z_path, "l_suppkey")
    s_supp = per_file_avg_range(s_path, "l_suppkey")
    # z-order: suppkey clustered too; partkey-sort: suppkey ~global per file
    assert z_supp < 0.8 * global_span
    assert s_supp > 0.9 * global_span
    assert z_supp < s_supp

    # and content survives the rewrite
    assert spark.read.parquet(z_path).count() == li.count()
