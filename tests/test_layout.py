"""Z-order layout: round-trip losslessness and the file-skipping
property that justifies it -- a 2-D box predicate must prune
substantially more files under the Z-curve layout than under a
single-column sort, measured from the same parquet footer min/max
stats a pruning reader uses."""

from pyspark.sql import functions as F

from big_data_co2_emission_analysis_spark.functions.zorder import (
    candidate_files,
    interleave_bits,
    zorder_write,
)



def test_zvalue_interleaves_bits(spark):
    # (b0=0b101, b1=0b011) -> interleaved from LSB: d0 bit i at 2i,
    # d1 bit i at 2i+1: 0b011011 -> 27... compute expected in python
    df = spark.range(1).select(F.lit(5).alias("a"), F.lit(3).alias("b"))
    got = df.select(interleave_bits([F.col("a"), F.col("b")], bits=3).alias("z")).collect()[0]["z"]
    expected = 0
    for i in range(3):
        expected |= ((5 >> i) & 1) << (2 * i)
        expected |= ((3 >> i) & 1) << (2 * i + 1)
    assert got == expected


def test_zorder_roundtrip_and_skipping(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    zpath, spath = str(tmp_path / "zorder"), str(tmp_path / "sorted")
    zorder_write(li, zpath, ["l_partkey", "l_suppkey"], bits=6, num_files=16, method="depth")
    # baseline: the best single-column layout (range-sorted on l_partkey)
    (
        li.repartitionByRange(16, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(spath)
    )

    # losslessness: layout rewrite must not change the data
    canon = lambda p: sorted(  # noqa: E731
        map(tuple, spark.read.parquet(p).select(sorted(li.columns)).collect())
    )
    assert canon(zpath) == canon(spath)

    # box over ~25% of each dimension -> ~6% of the 2-D space
    stats = li.agg(
        F.max("l_partkey").alias("mp"), F.max("l_suppkey").alias("ms")
    ).collect()[0]
    box = {
        "l_partkey": (0, stats["mp"] * 0.25),
        "l_suppkey": (0, stats["ms"] * 0.25),
    }
    z_cand, z_total = candidate_files(zpath, box)
    s_cand, s_total = candidate_files(spath, box)
    assert z_total == 16 and s_total == 16
    # single-column sort prunes on l_partkey only (~25% of files pass);
    # the second predicate prunes nothing there.  The z-layout must
    # beat it: strictly fewer candidates, and at most half the files.
    assert z_cand < s_cand, (z_cand, s_cand)
    assert z_cand <= z_total // 2, (z_cand, z_total)
