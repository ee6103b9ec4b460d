"""A/B: does a SHARED shingle stream cut the combined minhash+ngram
block? (VERDICT r9 #6.)

Both ``minhash_banded_pairs`` and ``ngram_jaccard_pairs`` shingle the
same documents corpus with ``word_shingles(text, 3)``.  Arm A runs them
independently (the registry shape: each builds its own shingle map).
Arm B builds ONE ``(id, shingles)`` frame, persists it, materializes it
(counted in B's cost), and passes it to both via ``shingle_frame=``.

Costs are whole-action stage sums (collect_metrics_all_jobs): executor
run/CPU time, scan bytes, shuffle bytes -- the noisy-VM protocol; plus
wall per arm.  Value parity of both operators' results across arms is
asserted before any timing is trusted.

    python tools/shingle_share_ab.py [--sf fixtures/sf10] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="fixtures/sf10")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import time

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from big_data_co2_emission_analysis_spark.operators.dedup import (
        minhash_banded_pairs,
        ngram_jaccard_pairs,
        release_minhash_caches,
        word_shingles,
    )
    from big_data_co2_emission_analysis_spark.plans.metrics import (
        collect_metrics_all_jobs,
    )
    from big_data_co2_emission_analysis_spark.queries.text_queries import (
        _jaccard_agg_partitions,
    )
    from big_data_co2_emission_analysis_spark.session import get_session
    from big_data_co2_emission_analysis_spark.sources.readers import read_documents

    spark = get_session("shingle-ab")
    docs = read_documents(spark, args.sf)
    aggp = _jaccard_agg_partitions(spark, args.sf)
    big = _jaccard_agg_partitions(spark, args.sf, divisor_kib=512) is not None
    print(f"# sf={args.sf} agg_partitions={aggp} scale_shape={big}", file=sys.stderr)

    def sweep() -> None:
        release_minhash_caches()
        spark.catalog.clearCache()
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for rdd in list(jmap.values()):
                rdd.unpersist(False)
        except Exception:
            pass
        try:
            spark._jvm.System.gc()
        except Exception:
            pass

    def fetch(df):
        return sorted(tuple(r) for r in df.collect())

    def arm_a():
        m1 = collect_metrics_all_jobs(
            lambda: minhash_banded_pairs(
                docs, "doc_id", "text", min_jaccard=0.3,
                prune_verify=big, slim_postings=big,
            ),
            spark=spark,
        )
        m2 = collect_metrics_all_jobs(
            lambda: ngram_jaccard_pairs(
                docs, "doc_id", "text", min_jaccard=0.5, agg_partitions=aggp
            ),
            spark=spark,
        )
        return m1, m2

    def arm_b():
        sh = (
            docs.select(
                F.col("doc_id").alias("id"), word_shingles("text", 3).alias("shingles")
            )
            .filter(F.size("shingles") > 0)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )

        def run1():
            sh.count()  # shared-frame materialization: counted in B
            return minhash_banded_pairs(
                docs, "doc_id", "text", min_jaccard=0.3,
                prune_verify=big, slim_postings=big, shingle_frame=sh,
            )

        m1 = collect_metrics_all_jobs(run1, spark=spark)
        m2 = collect_metrics_all_jobs(
            lambda: ngram_jaccard_pairs(
                docs, "doc_id", "text", min_jaccard=0.5, agg_partitions=aggp,
                shingle_frame=sh,
            ),
            spark=spark,
        )
        sh.unpersist()
        return m1, m2

    # value parity first
    sweep()
    base_mh = fetch(
        minhash_banded_pairs(docs, "doc_id", "text", min_jaccard=0.3,
                             prune_verify=big, slim_postings=big)
    )
    base_ng = fetch(
        ngram_jaccard_pairs(docs, "doc_id", "text", min_jaccard=0.5, agg_partitions=aggp)
    )
    sweep()
    sh = (
        docs.select(F.col("doc_id").alias("id"), word_shingles("text", 3).alias("shingles"))
        .filter(F.size("shingles") > 0)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    shared_mh = fetch(
        minhash_banded_pairs(docs, "doc_id", "text", min_jaccard=0.3,
                             prune_verify=big, slim_postings=big, shingle_frame=sh)
    )
    shared_ng = fetch(
        ngram_jaccard_pairs(docs, "doc_id", "text", min_jaccard=0.5, agg_partitions=aggp,
                            shingle_frame=sh)
    )
    sh.unpersist()
    assert shared_mh == base_mh and base_mh, "minhash parity broke"
    assert shared_ng == base_ng and base_ng, "ngram parity broke"
    print(f"# parity OK: minhash {len(base_mh)} rows, ngram {len(base_ng)} rows",
          file=sys.stderr)

    results = {"A": [], "B": []}
    for rep in range(args.reps):
        for arm, fn in (("A", arm_a), ("B", arm_b)):
            sweep()
            t0 = time.monotonic()
            m1, m2 = fn()
            wall = round(time.monotonic() - t0, 3)
            tot = {
                k: m1.get(k, 0) + m2.get(k, 0)
                for k in ("executor_run_ms", "executor_cpu_ns",
                          "bytes_scanned", "shuffle_bytes_written", "spill_bytes")
            }
            tot["wall_s"] = wall
            results[arm].append(tot)
            print(f"# rep{rep} arm{arm}: wall={wall}s "
                  f"run={tot['executor_run_ms']/1e3:.1f}s "
                  f"cpu={tot['executor_cpu_ns']/1e9:.1f}s "
                  f"shuffle={tot['shuffle_bytes_written']/2**20:.0f}MiB",
                  file=sys.stderr)

    def med(arm, key):
        return statistics.median(r[key] for r in results[arm])

    print(json.dumps({
        "sf": args.sf,
        "reps": args.reps,
        "A_independent": {k: med("A", k) for k in results["A"][0]},
        "B_shared": {k: med("B", k) for k in results["B"][0]},
    }))


if __name__ == "__main__":
    main()
