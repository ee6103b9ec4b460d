"""Data-profiling queries (operators/profiling.py): column statistics,
equi-width histograms, key-skew reconnaissance.  The ANALYZE-side
surface that runs before expensive jobs at 100 TB -- all single-pass
shapes, all DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register

_PROFILE_COLS = ("o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice")


@register(
    "orders_column_profile",
    oracle=f"""
    {" UNION ALL ".join(
        f'''SELECT '{c}' AS "column",
               COUNT({c}) AS n_non_null,
               SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS n_null,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM orders'''
        for c in _PROFILE_COLS
    )}
    ORDER BY "column"
    """,
    tags=("profiling", "agg"),
)
def orders_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column stats for four orders columns in ONE scan (the oracle
    unions four scans; Spark computes all columns' aggregates in a
    single pass -- the point of the long-format profile operator)."""
    from ..operators.profiling import column_profile

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return column_profile(orders, list(_PROFILE_COLS)).orderBy("column")


@register(
    "lineitem_price_histogram",
    oracle="""
    WITH base AS (
      SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
      WHERE l_extendedprice IS NOT NULL
    ),
    bounds AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM base),
    bucketed AS (
      SELECT CASE WHEN hi = lo THEN 0
                  ELSE LEAST(CAST(FLOOR((v - lo) / ((hi - lo) / 12.0)) AS INT), 11)
             END AS bucket, lo, hi
      FROM base CROSS JOIN bounds
    )
    SELECT bucket,
           lo + bucket * (hi - lo) / 12 AS lo,
           lo + (bucket + 1) * (hi - lo) / 12 AS hi,
           COUNT(*) AS n
    FROM bucketed
    GROUP BY bucket, lo, hi
    ORDER BY bucket
    """,
    tags=("profiling", "agg"),
)
def lineitem_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12-bucket equi-width histogram of l_extendedprice: a min/max
    scalar pass, then one bucket-count shuffle of 12 rows -- value
    distribution without collecting data."""
    from ..operators.profiling import numeric_histogram

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return numeric_histogram(li, "l_extendedprice", n_buckets=12)


@register(
    "lineitem_suppkey_skew",
    oracle="""
    WITH counts AS (
      SELECT l_suppkey, COUNT(*) AS c FROM lineitem GROUP BY l_suppkey
    ),
    tk AS (
      SELECT CAST(l_suppkey AS VARCHAR) AS k FROM counts
      WHERE c = (SELECT MAX(c) FROM counts)
      ORDER BY k DESC LIMIT 1
    )
    SELECT SUM(c) AS total_rows,
           COUNT(*) AS n_keys,
           MAX(c) AS max_key_rows,
           CAST(SUM(c) AS DOUBLE) / COUNT(*) AS mean_key_rows,
           CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c) AS skew_ratio,
           (SELECT k FROM tk) AS top_key
    FROM counts
    """,
    tags=("profiling", "skew", "agg"),
)
def lineitem_suppkey_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew report for the lineitem->supplier join key: skew_ratio
    (max/mean per-key rows) is the decide-to-salt signal the salted
    join (operators/joins.py) consumes."""
    from ..operators.profiling import key_skew_report

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return key_skew_report(li, ["l_suppkey"])
