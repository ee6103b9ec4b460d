"""Z-order data-skipping at scale (VERDICT r6 #3: the sf0.1 / 32-file
measurement needs scale points up, plus a depth-vs-minmax method
comparison under a planted hot key).

Per factor F in {1, 10, 100} (sf0.1 lineitem replicated F times with
shifted l_partkey / l_suppkey, so the key DOMAIN scales with the data
like TPC-H's does), lay lineitem out three ways at a realistic file
count and read the parquet footer stats back through
``candidate_files`` -- the same pruning decision a stats-aware reader
makes:

- ``zorder_minmax``: Morton key, min-max ranks (bits=16)
- ``zorder_depth``:  Morton key, equi-depth ranks (bits=6)
- ``sort_partkey``:  single-column range sort (the non-zorder baseline)

Predicates: the 25%x25% and 10%x10% boxes on (l_partkey, l_suppkey)
and a 10% filter on l_suppkey ALONE (the case the single-column sort
cannot prune).  Boxes are fractions of the key domain, so selectivity
is scale-invariant.

Hot-key probe (per factor, on the F=1 table only by default -- the
method comparison is about the rank function, not the data volume):
l_partkey is skew-transformed (30% of rows collapse onto one hot key
and 0.1% become far outliers at 100x the max), which stretches the
min-max range so equi-WIDTH ranks squeeze the real mass into a few
buckets; equi-DEPTH ranks place boundaries by quantile and keep
pruning.  Measured as candidate files for a 10%-of-mass box around
the dense region.

Usage: python tools/zorder_scale.py [--factors 1 10] [--src .../sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--factors", type=int, nargs="+", default=[1, 10, 100])
    ap.add_argument("--base-files", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from big_data_co2_emission_analysis_spark.functions.zorder import (
        candidate_files,
        zorder_write,
    )

    base = spark.read.parquet(f"{args.src}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    p_max = base.agg(F.max("l_partkey")).first()[0]
    s_max = base.agg(F.max("l_suppkey")).first()[0]

    results = []
    for factor in args.factors:
        reps = spark.range(factor).withColumnRenamed("id", "__rep")
        # decorrelated domain scaling: partkey bands follow the replica
        # id, suppkey bands follow a per-row hash -- shifting BOTH keys
        # by the same replica would make the dimensions block-diagonal
        # correlated, and a single-column partkey sort would spuriously
        # "prune" suppkey filters through the shared band structure
        df = (
            base.crossJoin(F.broadcast(reps))
            .withColumn("l_partkey", F.col("l_partkey") + F.col("__rep") * F.lit(p_max))
            .withColumn(
                "l_suppkey",
                F.col("l_suppkey")
                + F.pmod(F.xxhash64("l_orderkey", "__rep"), F.lit(factor))
                * F.lit(s_max),
            )
            .drop("__rep")
        )
        # files grow sublinearly (bigger files at scale, like a real
        # lakehouse): 32 -> ~145 -> ~672
        n_files = max(args.base_files, int(args.base_files * factor ** 0.66))
        P, S = p_max * factor, s_max * factor
        boxes = {
            "box_25x25": {"l_partkey": (0.25 * P, 0.50 * P), "l_suppkey": (0.25 * S, 0.50 * S)},
            "box_10x10": {"l_partkey": (0.45 * P, 0.55 * P), "l_suppkey": (0.45 * S, 0.55 * S)},
            "suppkey_only_10": {"l_suppkey": (0.45 * S, 0.55 * S)},
        }
        work = tempfile.mkdtemp(prefix=f"zorder_f{factor}_")
        try:
            layouts = {}
            zorder_write(df, f"{work}/zmm", ["l_partkey", "l_suppkey"],
                         bits=16, num_files=n_files, method="minmax")
            layouts["zorder_minmax"] = f"{work}/zmm"
            zorder_write(df, f"{work}/zd", ["l_partkey", "l_suppkey"],
                         bits=6, num_files=n_files, method="depth")
            layouts["zorder_depth"] = f"{work}/zd"
            (
                df.repartitionByRange(n_files, "l_partkey")
                .sortWithinPartitions("l_partkey")
                .write.mode("overwrite").parquet(f"{work}/sp")
            )
            layouts["sort_partkey"] = f"{work}/sp"

            row = {"factor": factor, "rows": df.count(), "n_files": n_files}
            for lname, path in layouts.items():
                for bname, box in boxes.items():
                    cand, total = candidate_files(path, box)
                    row[f"{lname}/{bname}"] = f"{cand}/{total}"
            results.append(row)
            print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(work, ignore_errors=True)

    # hot-key method probe at factor 1: 30% of rows collapse onto one
    # key, 0.1% become FAR outliers (2*10^5 x the max -- far enough
    # that the dense mass maps to < 1 of the 2^16 equi-width ranks:
    # min-max normalization collapses, quantile boundaries don't)
    skewed = base.withColumn(
        "l_partkey",
        F.when(F.pmod(F.xxhash64("l_orderkey"), F.lit(1000)) < 300, F.lit(1))
        .when(
            F.pmod(F.xxhash64("l_orderkey"), F.lit(1000)) == 999,
            (F.col("l_partkey") + F.lit(200_000 * p_max)).cast("long"),
        )
        .otherwise(F.col("l_partkey")),
    )
    hot_boxes = {
        # 2-D box over the dense mass: the collapsed dimension can hide
        # behind the healthy one, so the gap here is mild
        "dense_box": {
            "l_partkey": (0.45 * p_max, 0.55 * p_max),
            "l_suppkey": (0.45 * s_max, 0.55 * s_max),
        },
        # partkey-ONLY filter: with min-max ranks collapsed (every
        # dense row -> rank 0), the z-key carries no partkey signal and
        # every file's raw partkey stats span the dense range -- the
        # failure the equi-depth option exists for
        "dense_partkey_only": {"l_partkey": (0.45 * p_max, 0.55 * p_max)},
    }
    hot = {"probe": "hot_key", "factor": 1}
    work = tempfile.mkdtemp(prefix="zorder_hot_")
    try:
        for method, bits in (("minmax", 16), ("depth", 6)):
            path = f"{work}/{method}"
            zorder_write(skewed, path, ["l_partkey", "l_suppkey"],
                         bits=bits, num_files=args.base_files, method=method)
            for bname, box in hot_boxes.items():
                cand, total = candidate_files(path, box)
                hot[f"zorder_{method}/{bname}"] = f"{cand}/{total}"
        results.append(hot)
        print(json.dumps(hot), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps({"metric": "zorder_scale", "results": results}))


if __name__ == "__main__":
    main()
