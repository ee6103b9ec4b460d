"""Data profiling operators: per-column statistics, equi-width
histograms, and key-skew reports -- the ANALYZE TABLE / data-quality
reconnaissance surface.

At 100 TB these are the queries that RUN BEFORE everything else: the
column profile feeds CBO-style sizing decisions, the histogram shows
value distributions without collecting data, and the skew report is
how you decide a join needs salting (operators/joins.py) BEFORE the
3-hour job stalls on one reducer.

All single-pass aggregates: the column profile is one scan producing
every column's stats in parallel aggregate expressions (not one scan
per column); the histogram is two tiny jobs (min/max scalars, then a
one-shuffle bucket count); the skew report is one key aggregate
re-aggregated into scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(
    df: DataFrame, cols: list[str], approx_distinct: bool = False
) -> DataFrame:
    """One row per column: count, nulls, distinct, min/max (stringified
    so mixed-type columns stack into one long frame).  Single scan --
    all columns profile in ONE aggregate.

    ``approx_distinct=True`` is the 100 TB path: exact per-column
    ``count_distinct`` expands the input once per profiled column
    before the shuffle (Spark's multi-distinct rewrite), so K exact
    ndvs cost a K-fold Expand; ``approx_count_distinct`` (HLL++, 5%
    default error) keeps the aggregate a plain single-pass partial+
    final with O(K) sketch state.  The exact mode is the oracle-checked
    default at fixture scale."""
    ndv = F.approx_count_distinct if approx_distinct else F.count_distinct
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__n_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
            ndv(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"__n_{c}").alias("n_non_null"),
                        F.col(f"__nn_{c}").alias("n_null"),
                        F.col(f"__nd_{c}").alias("n_distinct"),
                        F.col(f"__mn_{c}").alias("min_value"),
                        F.col(f"__mx_{c}").alias("max_value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.*")


def numeric_histogram(df: DataFrame, col: str, n_buckets: int = 10) -> DataFrame:
    """Equi-width histogram: (bucket, lo, hi, n) with ``bucket`` in
    [0, n_buckets); the max value closes into the last bucket.  Two
    jobs: a min/max scalar aggregate (broadcast into the plan), then
    one bucket-count shuffle of n_buckets rows.  NULLs are excluded.
    Degenerate case min==max collapses to one bucket."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    base = df.select(F.col(col).cast("double").alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    bounds = base.agg(F.min("__v").alias("__lo"), F.max("__v").alias("__hi"))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_buckets))
    bucket = F.least(
        F.floor((F.col("__v") - F.col("__lo")) / width).cast("int"),
        F.lit(n_buckets - 1),
    )
    return (
        base.join(F.broadcast(bounds))
        .select(
            F.when(F.col("__hi") == F.col("__lo"), F.lit(0))
            .otherwise(bucket)
            .alias("bucket"),
            "__lo",
            "__hi",
        )
        .groupBy("bucket", "__lo", "__hi")
        .agg(F.count("*").alias("n"))
        .select(
            "bucket",
            (F.col("__lo") + F.col("bucket") * (F.col("__hi") - F.col("__lo")) / n_buckets).alias("lo"),
            (F.col("__lo") + (F.col("bucket") + 1) * (F.col("__hi") - F.col("__lo")) / n_buckets).alias("hi"),
            "n",
        )
        .orderBy("bucket")
    )


def key_skew_report(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """One summary row quantifying key skew: total rows, distinct keys,
    max/mean per-key count, the max key's share of all rows, and the
    top key itself (stringified).  max/mean >> 1 is the 'salt this
    join' signal.  Two aggregates: per-key counts (one shuffle), then
    a scalar re-aggregate."""
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("__c"))
    key_str = F.concat_ws("|", *[F.col(k).cast("string") for k in key_cols])
    return counts.agg(
        F.sum("__c").alias("total_rows"),
        F.count("*").alias("n_keys"),
        F.max("__c").alias("max_key_rows"),
        (F.sum("__c").cast("double") / F.count("*")).alias("mean_key_rows"),
        (F.max("__c").cast("double") * F.count("*") / F.sum("__c")).alias(
            "skew_ratio"
        ),
        # tie-break on the key string so the winner is deterministic
        # (mirrors the oracle's ARG_MAX over a (count, key) pair)
        F.max_by(key_str, F.struct(F.col("__c"), key_str)).alias("top_key"),
    )
