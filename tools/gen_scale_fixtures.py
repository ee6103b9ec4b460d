"""Scale up the driver fixtures by an integer factor for scale-up
benchmarking (VERDICT r3 #1: the 100 TB design claims need a measured
scale point beyond sf0.1).

Each scaling table is replicated ``factor`` times with keys shifted by
``replica * base_count`` so referential integrity holds exactly
(lineitem->orders/part/supplier, orders->customer, customer->nation,
events->user); the static dims (region, nation) copy through.  Replicas
are made distinguishable where identity matters:

- customer/supplier names are re-derived from the shifted key;
- document text gets a per-replica word-suffix rewrite
  (``$1xR``), so replicas share NO shingles with the original --
  the dedup/LSH workload scales exactly linearly (same planted
  near-dup structure within each replica, nothing across), instead
  of turning every doc into a 10-way near-dup cluster;
- embeddings get a small deterministic per-replica perturbation so
  no two vectors are bit-identical (ANN workload stays non-degenerate).

Everything else (dates, prices, flags, value distributions) carries
through unchanged, so per-query work should scale ~linearly with the
factor -- which is exactly the claim the sf1.0 bench run tests.

Usage: python tools/gen_scale_fixtures.py [--src /root/testdata/sf0.1]
           [--dest fixtures/sf1.0] [--factor 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

# (table, [(key_col, base_count_table)]) -- key shifted by replica * count(base table)
SHIFTS = {
    "customer": [("c_custkey", "customer")],
    "supplier": [("s_suppkey", "supplier")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [
        ("l_orderkey", "orders"),
        ("l_partkey", "part"),
        ("l_suppkey", "supplier"),
    ],
    "events": [("event_id", "events"), ("user_id", None)],  # user base computed below
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "embeddings")],
}
COPY_THROUGH = ["region", "nation"]
# output files per table at factor 10 (sf1.0): keep partitions ~8-64 MB;
# scaled proportionally for larger factors in main()
OUT_PARTS = {"lineitem": 16, "orders": 8, "events": 8, "documents": 4}


def replicate(df: DataFrame, factor: int, shifts: list[tuple[str, int]]) -> DataFrame:
    """Cross the table with replica ids 0..factor-1 and shift each key
    by ``replica * base``; dtypes are preserved."""
    dtypes = dict(df.dtypes)
    reps = df.sparkSession.range(factor).withColumnRenamed("id", "__rep")
    out = df.crossJoin(F.broadcast(reps))
    for col, base in shifts:
        out = out.withColumn(
            col, (F.col(col) + F.col("__rep") * F.lit(base)).cast(dtypes[col])
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dest", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "sf1.0"))
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    from big_data_co2_emission_analysis_spark.session import get_session

    spark = get_session("gen-scale-fixtures")
    # the driver's tables carry plain micros timestamps; match them
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    os.makedirs(args.dest, exist_ok=True)

    counts = {}
    tables = {}
    for t in list(SHIFTS) + COPY_THROUGH:
        tables[t] = spark.read.parquet(f"{args.src}/{t}.parquet")
        counts[t] = tables[t].count()
    user_base = (
        tables["events"].agg(F.max("user_id")).first()[0] + 1
    )  # dense 0..U-1 user ids

    for t in COPY_THROUGH:
        tables[t].write.mode("overwrite").parquet(f"{args.dest}/{t}.parquet")
        print(f"{t}: copied {counts[t]} rows")

    for t, shift_spec in SHIFTS.items():
        shifts = [
            (col, user_base if base is None else counts[base])
            for col, base in shift_spec
        ]
        # parallelize the expansion: the small-SF source files are 1-2
        # row groups, so without a source repartition the factor-N
        # crossJoin expansion (and the documents regex rewrite) runs on
        # 1-2 tasks -- measured at factor 300: lineitem stuck >10 min
        # single-task vs ~2 min across 32
        out = replicate(tables[t].repartition(32), args.factor, shifts)
        if t == "customer":
            out = out.withColumn("c_name", F.format_string("Customer#%09d", "c_custkey"))
        elif t == "supplier":
            out = out.withColumn("s_name", F.format_string("Supplier#%09d", "s_suppkey"))
        elif t == "documents":
            # per-replica word suffix: replica 0 is the original corpus,
            # replica R suffixes every word with xR -- no shared shingles
            # across replicas, identical dup structure within each
            out = out.withColumn(
                "text",
                F.when(F.col("__rep") == 0, F.col("text")).otherwise(
                    F.regexp_replace(
                        F.col("text"),
                        F.lit(r"(\w+)"),
                        F.concat(F.lit("$1x"), F.col("__rep").cast("string")),
                    )
                ),
            ).withColumn("n_chars", F.length("text").cast("long"))
        elif t == "embeddings":
            out = out.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, j: (
                        x
                        + F.sin((F.col("vec_id") * 131 + j).cast("double")) * 0.05 * F.col("__rep").cast("double")
                    ).cast("float"),
                ),
            )
        out = out.drop("__rep")
        n_parts = max(1, OUT_PARTS.get(t, 4) * args.factor // 10)
        out.repartition(n_parts).write.mode("overwrite").parquet(f"{args.dest}/{t}.parquet")
        got = spark.read.parquet(f"{args.dest}/{t}.parquet").count()
        want = counts[t] * args.factor
        if got != want:
            raise RuntimeError(f"{t}: wrote {got}, expected {want}")
        print(f"{t}: {got} rows ({args.factor}x)")

    print("done:", args.dest)


if __name__ == "__main__":
    main()
