"""The reference CO2 pipeline's query semantics, re-expressed over the
`events` fixture so every step is oracle-checkable at sf0.01.

Mapping to the reference (SURVEY.md section 2):
- `change = 2014 - 2004` (project-co2.py:101)  ->  per-user change =
  late-window activity minus early-window activity (events span
  2024-01-01..2024-01-30; "early" = first week, "late" = last week).
- `isReduced = change <= 0` (project-co2.py:105)  ->  same boundary.
- reduced/increased counts (project-co2.py:204-211, with the
  submission-zip bug fix: increased counts the *increased* side).
- conditional sums (project-co2.py:218-222) in ONE pass, not the
  reference's three filter+agg passes.
- top-3 reducers / increasers (project-co2.py:191-200).
- per-group min/max + label string (project-co2.py:130-132) with the
  Python UDF replaced by a native decimal-format expression (X3).

The genuine CO2 CSV pipeline (exact reference semantics + golden
values) lives in big_data_co2_emission_analysis_spark.co2 and is
verified in tests/test_co2_golden.py against SURVEY.md section 5.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import read_events
from ._exact import dsum, sql_dsum
from .registry import register

EARLY_END = "2024-01-08"
LATE_START = "2024-01-24"

_CHANGE_CTE = f"""
    WITH user_change AS (
      SELECT user_id,
             {sql_dsum(f"CASE WHEN ts < TIMESTAMP '{EARLY_END}' THEN value ELSE 0 END")} AS early,
             {sql_dsum(f"CASE WHEN ts >= TIMESTAMP '{LATE_START}' THEN value ELSE 0 END")} AS late
      FROM events
      GROUP BY user_id
    ),
    derived AS (
      SELECT user_id, early, late,
             late - early AS change,
             late - early <= 0 AS is_reduced
      FROM user_change
    )
"""


def user_change_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared derive stage: per-user early/late sums -> change -> flag.

    This is the analog of the reference's preprocess+derive
    (project-co2.py:89-105): one aggregation pass, then two cheap
    derived columns.
    """
    events = read_events(spark, sf_dir)
    agg = events.groupBy("user_id").agg(
        dsum(F.when(F.col("ts") < EARLY_END, F.col("value")).otherwise(0.0)).alias("early"),
        dsum(F.when(F.col("ts") >= LATE_START, F.col("value")).otherwise(0.0)).alias("late"),
    )
    return agg.select(
        "user_id",
        "early",
        "late",
        (F.col("late") - F.col("early")).alias("change"),
        ((F.col("late") - F.col("early")) <= 0).alias("is_reduced"),
    )


@register(
    "user_change",
    oracle=_CHANGE_CTE + "SELECT * FROM derived ORDER BY user_id",
    tags=("co2", "agg"),
)
def user_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    return user_change_df(spark, sf_dir).orderBy("user_id")


@register(
    "change_flag_counts",
    oracle=_CHANGE_CTE
    + """
    SELECT is_reduced, COUNT(*) AS n_users
    FROM derived GROUP BY is_reduced ORDER BY is_reduced
    """,
    tags=("co2", "agg"),
)
def change_flag_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference project-co2.py:204-211 (count reduced / increased) as a
    single groupBy over the boolean flag."""
    return (
        user_change_df(spark, sf_dir)
        .groupBy("is_reduced")
        .agg(F.count("*").alias("n_users"))
        .orderBy("is_reduced")
    )


@register(
    "change_conditional_sums",
    oracle=_CHANGE_CTE
    + f"""
    SELECT
      {sql_dsum('CASE WHEN is_reduced THEN change ELSE 0 END')} AS sum_reduced,
      {sql_dsum('CASE WHEN NOT is_reduced THEN change ELSE 0 END')} AS sum_increased,
      {sql_dsum('change')} AS total_change
    FROM derived
    """,
    tags=("co2", "agg"),
)
def change_conditional_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference project-co2.py:218-222 (three separate filter+sum
    passes) fused into one aggregation -- one shuffle instead of three
    full lineage re-executions."""
    return user_change_df(spark, sf_dir).agg(
        dsum(F.when(F.col("is_reduced"), F.col("change")).otherwise(0.0)).alias("sum_reduced"),
        dsum(F.when(~F.col("is_reduced"), F.col("change")).otherwise(0.0)).alias("sum_increased"),
        dsum("change").alias("total_change"),
    )


@register(
    "top3_reducers",
    oracle=_CHANGE_CTE + "SELECT user_id, change FROM derived ORDER BY change ASC, user_id LIMIT 3",
    tags=("co2", "topk"),
)
def top3_reducers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference project-co2.py:191-192 (top-3 reduction)."""
    return (
        user_change_df(spark, sf_dir)
        .select("user_id", "change")
        .orderBy(F.asc("change"), F.asc("user_id"))
        .limit(3)
    )


@register(
    "top3_increasers",
    oracle=_CHANGE_CTE + "SELECT user_id, change FROM derived ORDER BY change DESC, user_id LIMIT 3",
    tags=("co2", "topk"),
)
def top3_increasers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference project-co2.py:196-200 (top-3 increase)."""
    return (
        user_change_df(spark, sf_dir)
        .select("user_id", "change")
        .orderBy(F.desc("change"), F.asc("user_id"))
        .limit(3)
    )


@register(
    "change_range_labels",
    oracle=_CHANGE_CTE
    + """
    SELECT is_reduced,
           CAST(MIN(change) AS DOUBLE) AS min_change,
           CAST(MAX(change) AS DOUBLE) AS max_change,
           CONCAT(CAST(CAST(MIN(change) AS DECIMAL(18,3)) AS VARCHAR), ' - ',
                  CAST(CAST(MAX(change) AS DECIMAL(18,3)) AS VARCHAR)) AS label
    FROM derived
    GROUP BY is_reduced
    ORDER BY is_reduced
    """,
    tags=("co2", "agg", "scalar"),
)
def change_range_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference project-co2.py:130-132: per-group min/max + label
    string.  The reference builds the label in a row-at-a-time Python
    UDF (U1); here it is a native expression (X3) -- no serialization
    boundary, Catalyst can optimize through it.  Decimal(18,3) casting
    gives identical half-up rounding + trailing-zero rendering in both
    engines."""
    mn = F.min("change").alias("min_change")
    mx = F.max("change").alias("max_change")
    return (
        user_change_df(spark, sf_dir)
        .groupBy("is_reduced")
        .agg(mn, mx)
        .select(
            "is_reduced",
            "min_change",
            "max_change",
            F.concat(
                F.col("min_change").cast("decimal(18,3)").cast("string"),
                F.lit(" - "),
                F.col("max_change").cast("decimal(18,3)").cast("string"),
            ).alias("label"),
        )
        .orderBy("is_reduced")
    )


# --------------------------------------------------------------------------
# The reference's geo join (project-co2.py:137-147): patch four broken
# '-99' ISO codes by name, then LEFT-join per-country results onto the
# world dimension so unmatched countries survive with nulls (grey on
# the reference's choropleth).  Here the fact side is per-nation
# revenue from the driver tables (mapped to iso_a3); the genuine CO2
# CSV variant of the same join lives in co2.pipeline.world_join and is
# golden-tested.
# --------------------------------------------------------------------------
def _world_geo_oracle() -> str:
    from ..co2.world_dim import FIXTURE_PATH, sql_iso_patches, sql_nation_iso

    return f"""
    WITH dim AS (
      SELECT {sql_iso_patches()} AS iso_a3, name, continent
      FROM read_parquet('{FIXTURE_PATH}')
    ),
    fact AS (
      SELECT {sql_nation_iso("n_name")} AS iso_a3,
             {sql_dsum("o_totalprice")} AS revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT d.iso_a3, d.name, d.continent, f.revenue,
           f.revenue IS NOT NULL AS matched
    FROM dim d LEFT JOIN fact f ON d.iso_a3 = f.iso_a3
    ORDER BY d.iso_a3, d.name
    """


@register("world_geo_revenue", oracle=_world_geo_oracle(), tags=("co2", "join", "geo"))
def world_geo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..co2.world_dim import FIXTURE_PATH, NATION_ISO, apply_iso_patches, geo_left_join

    dim = apply_iso_patches(spark.read.parquet(FIXTURE_PATH))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    iso_map = F.create_map(
        *[lit for kv in NATION_ISO.items() for lit in (F.lit(kv[0]), F.lit(kv[1]))]
    )
    fact = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(dsum("o_totalprice").alias("revenue"))
        .select(iso_map[F.col("n_name")].alias("iso_a3"), "revenue")
    )
    return (
        geo_left_join(dim, fact)
        .select(
            "iso_a3",
            "name",
            "continent",
            "revenue",
            F.col("revenue").isNotNull().alias("matched"),
        )
        .orderBy("iso_a3", "name")
    )
