"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``big_data_co2_emission_analysis_spark``;
this module only adapts the registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from big_data_co2_emission_analysis_spark.queries import all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q1-shaped pricing summary: parquet scan with pushed filter ->
    decimal-exact grouped aggregation -> ordered result (exercises
    S1/P1-P3/A1-A2/T2 from SURVEY.md section 2 in one plan).
    """
    from big_data_co2_emission_analysis_spark.queries.relational import pricing_summary

    return pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return {name: qd.fn for name, qd in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; queries
    without an oracle (ML / LSH / sampling / streaming) get the driver's
    rows-only check."""
    return {name: qd.oracle for name, qd in all_queries().items() if qd.oracle is not None}
