"""Advanced relational coverage: as-of join, banded range join,
GROUPING SETS (via the SQL API), exact percentiles, array aggregation,
equi+range predicate joins.  All oracle-checked.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves string type hints in module globals
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import datetime
import os as _os

from ..operators.joins import as_of_join
from ..sources.readers import read_events
from ._exact import dsum, spark_sql_fx, sql_dsum, sql_fx
from .registry import register

#: expected side-per-custkey for the keyed train/test split: a pure
#: function of the custkey value, precomputed by the independent
#: pure-Python xxHash64 replication (tools/gen_sampling_expected.py)
_SAMPLING_EXPECTED = _os.path.abspath(
    _os.path.join(_os.path.dirname(__file__), "..", "..", "fixtures", "expected_sampling")
)


# --------------------------------------------------------------------------
# As-of join: for each purchase event, the user's most recent prior
# click.  DuckDB's native ASOF JOIN is the oracle; the Spark side uses
# the union+window implementation (single shuffle -- see
# operators/joins.py).
# --------------------------------------------------------------------------
@register(
    "asof_click_before_purchase",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           c.value AS click_value,
           STRFTIME(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
    tags=("join", "asof"),
)
def asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_events(spark, sf_dir)
    purchases = events.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = as_of_join(purchases, clicks, ts_col="ts", by_cols=["user_id"], value_cols=["value"])
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("value_right").alias("click_value"),
        F.date_format("ts_right", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# Banded range join: parts into price bands.  The band dim is tiny and
# inlined on both sides; the Spark operator buckets + equi-joins rather
# than nested-looping.
# --------------------------------------------------------------------------
# fixture prices span [900, 1000); 25-wide bands give 4 populated groups
PRICE_BANDS = [(0, 900.0, 925.0), (1, 925.0, 950.0), (2, 950.0, 975.0), (3, 975.0, 1000.0)]
_BANDS_SQL = ", ".join(f"({i}, {lo}, {hi})" for i, lo, hi in PRICE_BANDS)


@register(
    "range_join_price_bands",
    oracle=f"""
    SELECT b.band_id, COUNT(*) AS n_parts, {sql_dsum('p.p_retailprice')} AS total_price
    FROM part p
    JOIN (VALUES {_BANDS_SQL}) b(band_id, lo, hi)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band_id
    ORDER BY b.band_id
    """,
    tags=("join", "range"),
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import range_join_banded

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    bands = spark.createDataFrame(PRICE_BANDS, "band_id int, lo double, hi double")
    joined = range_join_banded(part, bands, "p_retailprice", "lo", "hi", band_width=25.0)
    return (
        joined.groupBy("band_id")
        .agg(F.count("*").alias("n_parts"), dsum("p_retailprice").alias("total_price"))
        .orderBy("band_id")
    )


# --------------------------------------------------------------------------
# GROUPING SETS through the SQL API (same Catalyst plan as the
# DataFrame rollup/cube; exposes the engine's SQL surface).  The
# fixed-point quantizer spells differently per dialect (Spark's TRUNC
# is date-only), so the shared template takes the dsum rendering.
# --------------------------------------------------------------------------
def _grouping_sets_sql(dsum_sql: str) -> str:
    return f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql} AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
"""


@register(
    "grouping_sets_qty",
    oracle=_grouping_sets_sql(sql_dsum("l_quantity")),
    tags=("agg", "sql"),
)
def grouping_sets_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView("lineitem")
    return spark.sql(
        _grouping_sets_sql(
            f"CAST(SUM({spark_sql_fx('l_quantity')}) AS DOUBLE) / 1e6"
        )
    )


# --------------------------------------------------------------------------
# Exact percentiles (interpolated), rounded to 6 dp to absorb the
# engines' different interpolation arithmetic order.
# --------------------------------------------------------------------------
@register(
    "quartiles_per_flag",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS q1,
           ROUND(quantile_cont(l_extendedprice, 0.50), 6) AS median,
           ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS q3
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def quartiles_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # ONE array-percentile aggregate, not three scalar ones: each
    # percentile() call buffers the group's values independently, so
    # the fused form does a third of the buffering/sorting (2.8x
    # measured at sf0.1)
    return (
        li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").alias("__qs"))
        .select(
            "l_returnflag",
            F.round(F.col("__qs")[0], 6).alias("q1"),
            F.round(F.col("__qs")[1], 6).alias("median"),
            F.round(F.col("__qs")[2], 6).alias("q3"),
        )
        .orderBy("l_returnflag")
    )


@register("approx_quartiles_per_flag", oracle=None, tags=("agg", "percentile", "approx"))
def approx_quartiles_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (t-digest-style sketch): the single-pass
    mergeable variant for 100 TB; accuracy envelope unit-tested."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Array aggregation: collect per-order line numbers (sorted for
# determinism) + array functions over the result.
# --------------------------------------------------------------------------
@register(
    "order_line_arrays",
    # The array aggregation itself happens Spark-side (sort_array over
    # collect_list); the checked output serializes it to a comma-joined
    # string because the driver's canonicalizer sorts a pandas frame and
    # Python lists aren't hashable/orderable there.
    oracle="""
    SELECT l_orderkey,
           ARRAY_TO_STRING(LIST(l_linenumber ORDER BY l_linenumber), ',') AS line_numbers,
           CAST(LEN(LIST(l_linenumber)) AS BIGINT) AS n_lines,
           CAST(LIST_CONTAINS(LIST(l_linenumber), 1) AS BOOLEAN) AS has_first
    FROM lineitem
    GROUP BY l_orderkey
    ORDER BY l_orderkey
    """,
    tags=("agg", "array"),
)
def order_line_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.sort_array(F.collect_list("l_linenumber")).alias("lines_arr"),
            F.count("*").alias("n_lines"),
        )
        .select(
            "l_orderkey",
            F.array_join("lines_arr", ",").alias("line_numbers"),
            "n_lines",
            F.array_contains("lines_arr", 1).alias("has_first"),
        )
        .orderBy("l_orderkey")
    )


# --------------------------------------------------------------------------
# Stratified sampling + keyed train/test split (training-pipeline
# primitives; operators/sampling.py).  RNG streams are engine-specific
# -> rows-only; per-stratum fractions and leak-freedom are unit-tested.
# --------------------------------------------------------------------------
@register("stratified_sample_counts", oracle=None, tags=("sample",))
def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import stratified_sample

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sampled = stratified_sample(li, "l_returnflag", {"A": 0.5, "N": 0.1, "R": 0.25}, seed=42)
    return sampled.groupBy("l_returnflag").count().orderBy("l_returnflag")


_STRATA_FRACTIONS = {"A": 0.5, "N": 0.1, "R": 0.25}


def _stratified_det_oracle() -> str:
    from ..operators.sampling import sql_portable_uniform

    u = sql_portable_uniform("CAST(l_orderkey AS BIGINT) * 8 + l_linenumber", seed=42)
    case = " ".join(
        f"WHEN '{v}' THEN {p!r}e0" for v, p in sorted(_STRATA_FRACTIONS.items())
    )
    return f"""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           {sql_dsum("l_quantity")} AS sum_qty
    FROM lineitem
    WHERE {u} <= CASE l_returnflag {case} ELSE -1.0e0 END
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """


@register("stratified_sample_det", oracle=_stratified_det_oracle(), tags=("sample",))
def stratified_sample_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic twin of stratified_sample_counts: per-stratum
    hash-threshold sampling (operators/sampling.py
    stratified_hash_sample) with the SAME fractions contract as
    sampleBy, but a partitioning-independent row set -- so the
    per-stratum counts AND a fixed-point quantity checksum over the
    exact selected rows are value-verified by full SQL replay."""
    from ..operators.sampling import stratified_hash_sample

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    key = F.col("l_orderkey").cast("long") * 8 + F.col("l_linenumber")
    sampled = stratified_hash_sample(li, "l_returnflag", _STRATA_FRACTIONS, key, seed=42)
    return (
        sampled.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_rows"), dsum("l_quantity").alias("sum_qty"))
        .orderBy("l_returnflag")
    )


@register(
    "train_test_split_summary",
    oracle=f"""
    SELECT e.side,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT o.o_custkey) AS n_customers
    FROM orders o
    JOIN read_parquet('{_SAMPLING_EXPECTED}/custkey_side.parquet') e
      ON o.o_custkey = e.custkey
    GROUP BY e.side
    ORDER BY e.side
    """,
    tags=("sample",),
)
def train_test_split_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed split summary: per-side row/customer counts (hash-based ->
    deterministic for a given seed, partitioning-independent).  Oracle:
    the side of each custkey is precomputed by the spec-Python xxHash64
    replication (tools/gen_sampling_expected.py) -- a genuinely
    cross-implementation check of the keyed-split hash chain."""
    from ..operators.sampling import train_test_split

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    train, test = train_test_split(orders, 0.25, key_col="o_custkey", seed=7)
    summarize = lambda df, side: df.agg(  # noqa: E731
        F.lit(side).alias("side"),
        F.count("*").alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )
    return summarize(train, "train").unionByName(summarize(test, "test")).orderBy("side")


# --------------------------------------------------------------------------
# Null-handling scalars: the fixture is null-free, so NULLIF
# manufactures nulls and COALESCE / null-safe comparison consume them.
# --------------------------------------------------------------------------
@register(
    "null_handling_scalars",
    oracle="""
    SELECT p_partkey,
           NULLIF(p_size, 5) AS size_or_null,
           COALESCE(NULLIF(p_size, 5), -1) AS size_defaulted,
           (NULLIF(p_size, 5) IS NOT DISTINCT FROM NULLIF(p_size, 5)) AS nsafe_self,
           (NULLIF(p_size, 5) IS NOT DISTINCT FROM p_size) AS nsafe_mixed
    FROM part
    ORDER BY p_partkey
    """,
    tags=("scalar", "nulls"),
)
def null_handling_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    maybe_null = F.nullif(F.col("p_size"), F.lit(5))
    return part.select(
        "p_partkey",
        maybe_null.alias("size_or_null"),
        F.coalesce(maybe_null, F.lit(-1)).alias("size_defaulted"),
        maybe_null.eqNullSafe(maybe_null).alias("nsafe_self"),
        maybe_null.eqNullSafe(F.col("p_size")).alias("nsafe_mixed"),
    ).orderBy("p_partkey")


# --------------------------------------------------------------------------
# Date arithmetic beyond extraction: add/diff/truncate-to-boundary.
# --------------------------------------------------------------------------
@register(
    "order_date_arithmetic",
    # NB: only ONE timestamp+INTERVAL expression may appear in the
    # oracle -- DuckDB 1.0 CSE-merges distinct interval additions on the
    # same column into the first one's value (repro: SELECT t+INTERVAL
    # 90 DAY, t+INTERVAL 3 MONTH returns the 90-day result twice).
    # due_date therefore uses date+int arithmetic instead.
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) + 90 AS due_date,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS review_date,
           LAST_DAY(o_orderdate) AS month_end,
           CAST((1998 - DATE_PART('year', o_orderdate)) * 12
                + (1 - DATE_PART('month', o_orderdate)) AS BIGINT) AS calendar_months_to_98
    FROM orders
    ORDER BY o_orderkey
    """,
    tags=("scalar", "datetime"),
)
def order_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.date_add(d, 90).alias("due_date"),
        F.add_months(d, 3).alias("review_date"),
        F.last_day(d).alias("month_end"),
        ((F.lit(1998) - F.year(d)) * 12 + (F.lit(1) - F.month(d)))
        .cast("long")
        .alias("calendar_months_to_98"),
    ).orderBy("o_orderkey")


# --------------------------------------------------------------------------
# Grouped-map Pandas UDF (applyInPandas): per-supplier z-score
# normalization.  The one extension-point shape not covered elsewhere
# (scalar pandas_udf: functions/text.py; mapInPandas: multimodal;
# applyInPandasWithState: streaming).  1000 supplier groups keep it
# parallel at scale -- never group-map on a 3-value key.  The oracle
# recomputes the same z with window aggregates; 4 dp rounding absorbs
# pandas-vs-SQL accumulation ULPs.
# --------------------------------------------------------------------------
@register(
    "supplier_price_zscores",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           ROUND((l_extendedprice - AVG(l_extendedprice) OVER w)
                 / STDDEV_SAMP(l_extendedprice) OVER w, 4) AS z
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey)
    ORDER BY l_suppkey, l_orderkey, l_linenumber, z
    """,
    tags=("udf", "pandas", "window"),
)
def supplier_price_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf["l_extendedprice"].std(ddof=1)
        mean = pdf["l_extendedprice"].mean()
        z = (pdf["l_extendedprice"] - mean) / sd
        return pd.DataFrame(
            {
                "l_suppkey": pdf["l_suppkey"],
                "l_orderkey": pdf["l_orderkey"],
                "l_linenumber": pdf["l_linenumber"],
                # single-row groups: sd NaN -> null (matches SQL NULL)
                "z": z.round(4).where(pd.notna(z), None),
            }
        )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    return (
        li.groupBy("l_suppkey")
        .applyInPandas(_z, "l_suppkey long, l_orderkey long, l_linenumber long, z double")
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "z")
    )


# --------------------------------------------------------------------------
# SCD2 / CDC history (operators/scd2.py): the Spark side builds the
# dimension from pre-1997 orders, then APPLIES the 1997+ orders as a
# CDC batch; the oracle builds the whole history in one window pass.
# Equality proves replay consistency (build(prefix) + apply(suffix)
# == build(all)) -- the MERGE INTO emulation contract.
# --------------------------------------------------------------------------
_SCD2_CUTOFF = "1997-01-01"


@register(
    "scd2_customer_order_history",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER w AS valid_to,
           (LEAD(o_orderdate) OVER w IS NULL) AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, valid_from, o_orderkey
    """,
    tags=("scd2", "cdc", "window"),
)
def scd2_customer_order_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scd2 import scd2_apply, scd2_build

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderkey", "o_totalprice", "o_orderdate"
    )
    cutoff = F.lit(_SCD2_CUTOFF).cast(orders.schema["o_orderdate"].dataType)
    initial = orders.filter(F.col("o_orderdate") < cutoff)
    updates = orders.filter(F.col("o_orderdate") >= cutoff)
    # persist the built dimension: scd2_apply branches it six ways
    # (closed/open/late-key splits), and without a materialization each
    # branch re-runs the build window -- 2x measured at sf0.1.  In
    # production the dim IS a stored table, so this mirrors reality.
    dim = scd2_build(initial, ["o_custkey"], "o_orderdate", order_cols=["o_orderkey"]).persist()
    merged = scd2_apply(dim, updates, ["o_custkey"], "o_orderdate", order_cols=["o_orderkey"])
    return merged.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    ).orderBy("o_custkey", "valid_from", "o_orderkey")


# --------------------------------------------------------------------------
# Correlated scalar subquery: parts priced above their own brand's
# average.  Catalyst decorrelates this into an aggregate + equi-join
# (no per-row subquery execution) -- the optimizer behavior SURVEY.md
# section 4 lists as built-in; expressed through the SQL API to cover
# that surface.
# --------------------------------------------------------------------------
_CORR_SUBQ_SQL = """
    SELECT p_partkey, p_brand, p_retailprice
    FROM part p
    WHERE p_retailprice > (SELECT AVG(p2.p_retailprice) FROM part p2
                           WHERE p2.p_brand = p.p_brand)
    ORDER BY p_partkey
"""


@register("parts_above_brand_avg", oracle=_CORR_SUBQ_SQL, tags=("subquery", "sql"))
def parts_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/part.parquet").createOrReplaceTempView("part")
    return spark.sql(_CORR_SUBQ_SQL)


# --------------------------------------------------------------------------
# Frequent items sketch (approximate heavy hitters, Karp et al.) --
# the third mergeable-sketch family exposed by the engine after HLL
# (approx_count_distinct) and t-digest-ish (percentile_approx).
# Support-based and approximate -> rows-only; exactness of the
# candidate set is unit-checked against true counts in the query
# itself (freqItems may over-report, never under-report, items above
# the support threshold).
# --------------------------------------------------------------------------
@register("freq_brands_sketch", oracle=None, tags=("agg", "approx", "sketch"))
def freq_brands_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    freq = part.freqItems(["p_brand"], support=0.02)
    return freq.select(F.explode("p_brand_freqItems").alias("brand")).orderBy("brand")


# --------------------------------------------------------------------------
# Map-typed column surface: build, size, key/value extraction.  (The
# reference's data model is flat -- SURVEY.md section 1 notes no
# map/array types anywhere -- so this covers the engine's type-system
# extension.)  DuckDB's MAP[key] yields a single-element LIST, hence
# the [1] subscript in the oracle.
# --------------------------------------------------------------------------
@register(
    "part_attr_map",
    oracle="""
    SELECT p_partkey,
           MAP(['brand', 'type'], [p_brand, p_type])['brand'][1] AS brand_v,
           MAP(['brand', 'type'], [p_brand, p_type])['type'][1] AS type_v,
           CAST(CARDINALITY(MAP(['brand', 'type'], [p_brand, p_type])) AS INT) AS n_attrs
    FROM part
    ORDER BY p_partkey
    """,
    tags=("map", "types"),
)
def part_attr_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    m = F.create_map(F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type"))
    return part.select(
        "p_partkey",
        F.element_at(m, "brand").alias("brand_v"),
        F.element_at(m, "type").alias("type_v"),
        F.size(m).alias("n_attrs"),
    ).orderBy("p_partkey")


# --------------------------------------------------------------------------
# Duplicate-preserving set ops: EXCEPT ALL / INTERSECT ALL (bag
# semantics -- a custkey with 3 orders total and 1 urgent order
# survives EXCEPT ALL twice).
# --------------------------------------------------------------------------
@register(
    "set_except_all_custkeys",
    oracle="""
    SELECT o_custkey FROM orders
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ORDER BY o_custkey
    """,
    tags=("set",),
)
def set_except_all_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    all_keys = orders.select("o_custkey")
    urgent_keys = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return all_keys.exceptAll(urgent_keys).orderBy("o_custkey")


# --------------------------------------------------------------------------
# Positional window values: first/last/nth over an explicit full-frame
# (default frame ends at CURRENT ROW, which silently breaks last_value
# -- the full-frame spec is the correctness-critical part).
# --------------------------------------------------------------------------
@register(
    "supplier_positional_window",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           FIRST_VALUE(s_name) OVER w AS first_name,
           LAST_VALUE(s_name) OVER w AS last_name,
           NTH_VALUE(s_name, 2) OVER w AS second_name
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY s_suppkey
    """,
    tags=("window",),
)
def supplier_positional_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    w = (
        W.partitionBy("s_nationkey")
        .orderBy("s_suppkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return supp.select(
        "s_suppkey",
        "s_nationkey",
        F.first("s_name").over(w).alias("first_name"),
        F.last("s_name").over(w).alias("last_name"),
        F.nth_value("s_name", 2).over(w).alias("second_name"),
    ).orderBy("s_suppkey")


# --------------------------------------------------------------------------
# Statistical aggregates: stddev/variance/correlation/covariance.
# Each engine's native moment aggregate accumulates doubles in its own
# order, so the pre-round values can differ by an ULP and a 6-dp round
# AMPLIFIES a near-tie difference to 1e-6 (seen at sf0.001).  Instead
# both sides aggregate exact DECIMAL sums (n, Sx, Sxx, Sy, Syy, Sxy --
# single-pass, mergeable, partial+final hash agg, so still the scale
# plan) and derive the moments with the identical double expression
# tree; identical inputs + identical IEEE op order = bit-equal output.
# --------------------------------------------------------------------------
_MOMENT_SUMS_SQL = """
      SELECT p_brand,
             COUNT(*) AS n,
             CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(p_size AS DECIMAL(9,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(p_size AS DECIMAL(9,0)) * CAST(p_size AS DECIMAL(9,0))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(p_size AS DECIMAL(9,0))) AS DOUBLE) AS sxy
      FROM part GROUP BY p_brand
"""


@register(
    "brand_price_stats",
    oracle=f"""
    WITH s AS ({_MOMENT_SUMS_SQL})
    SELECT p_brand,
           n,
           ROUND(SQRT((sxx - sx * sx / n) / (n - 1)), 6) AS sd_price,
           ROUND((sxx - sx * sx / n) / (n - 1), 6) AS var_price,
           ROUND((sxy - sx * sy / n) / SQRT((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS corr_price_size,
           ROUND((sxy - sx * sy / n) / (n - 1), 6) AS covar_price_size,
           ROUND((sxy - sx * sy / n) / n, 6) AS covar_pop_price_size
    FROM s
    ORDER BY p_brand
    """,
    tags=("agg", "stats"),
)
def brand_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._exact import dec

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    px = dec("p_retailprice", 2, 18)
    sz = dec("p_size", 0, 9)
    sums = part.groupBy("p_brand").agg(
        F.count("*").alias("n"),
        F.sum(px).cast("double").alias("sx"),
        F.sum(px * px).cast("double").alias("sxx"),
        F.sum(sz).cast("double").alias("sy"),
        F.sum(sz * sz).cast("double").alias("syy"),
        F.sum(px * sz).cast("double").alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    cov_n = sxy - sx * sy / n
    return sums.select(
        "p_brand",
        "n",
        F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 6).alias("sd_price"),
        F.round((sxx - sx * sx / n) / (n - 1), 6).alias("var_price"),
        F.round(
            cov_n / F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6
        ).alias("corr_price_size"),
        F.round(cov_n / (n - 1), 6).alias("covar_price_size"),
        F.round(cov_n / n, 6).alias("covar_pop_price_size"),
    ).orderBy("p_brand")


# --------------------------------------------------------------------------
# Distribution-rank windows: ntile / percent_rank / cume_dist,
# partitioned by market segment (a global un-partitioned window is a
# single-task bottleneck at scale; the segment key keeps it parallel).
# Ties broken by c_custkey for cross-engine determinism.
# --------------------------------------------------------------------------
@register(
    "customer_balance_ntiles",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    ORDER BY c_custkey
    """,
    tags=("window",),
)
def customer_balance_ntiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    ).orderBy("c_custkey")


# --------------------------------------------------------------------------
# RANGE-frame window: trailing-30-day revenue per order priority.  RANGE
# frames include all peer rows at equal order keys, so the result is
# deterministic under date ties (a ROWS frame would not be); the sum
# accumulates in fixed-point for order-independence (_exact.py).
# --------------------------------------------------------------------------
@register(
    "trailing_priority_revenue",
    oracle=f"""
    SELECT o_orderkey, o_orderpriority, o_orderdate,
           CAST(SUM({sql_fx('o_totalprice', 2)}) OVER (
             PARTITION BY o_orderpriority ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 1e2 AS trailing_30d_revenue
    FROM orders
    ORDER BY o_orderkey
    """,
    tags=("window", "range"),
)
def trailing_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        SELECT o_orderkey, o_orderpriority, o_orderdate,
               CAST(SUM({spark_sql_fx('o_totalprice', 2)}) OVER (
                 PARTITION BY o_orderpriority ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
               ) AS DOUBLE) / 1e2 AS trailing_30d_revenue
        FROM orders
        ORDER BY o_orderkey
        """
    )


# --------------------------------------------------------------------------
# Equi + range predicate join: same-brand part pairs within 50.0 of
# each other's price.  The brand equi-key does the blocking (hash
# join); the price band is a residual filter -- the scalable way to
# express "similar items" joins.
# --------------------------------------------------------------------------
@register(
    "brand_price_pairs",
    oracle="""
    SELECT a.p_brand, COUNT(*) AS n_pairs
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand
     AND a.p_partkey < b.p_partkey
     AND ABS(a.p_retailprice - b.p_retailprice) <= 50.0
    GROUP BY a.p_brand
    ORDER BY a.p_brand
    """,
    tags=("join", "range"),
)
def brand_price_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    a = part.select(
        F.col("p_brand"), F.col("p_partkey").alias("ka"), F.col("p_retailprice").alias("pa")
    )
    b = part.select(
        F.col("p_brand").alias("brand_b"), F.col("p_partkey").alias("kb"), F.col("p_retailprice").alias("pb")
    )
    pairs = a.join(
        b,
        (a["p_brand"] == b["brand_b"]) & (a["ka"] < b["kb"]) & (F.abs(a["pa"] - b["pb"]) <= 50.0),
    )
    return pairs.groupBy("p_brand").agg(F.count("*").alias("n_pairs")).orderBy("p_brand")


# --------------------------------------------------------------------------
# Bucketed co-located join: the pay-shuffle-once primitive.  Both
# tables are bucketed on the join key at write time (sources/writers.
# write_bucketed), so the join runs with NO Exchange on either side --
# at 100 TB this converts every repeat join on the key from a full
# fact-table shuffle into a local sort-merge.  Bucketing doesn't change
# query semantics, so the DuckDB oracle runs the same join on the raw
# views and the CORRECTNESS row is a real value check.
# --------------------------------------------------------------------------
def ensure_bucketed_tables(
    spark: SparkSession, sf_dir: str, num_buckets: int | None = None
) -> tuple[str, str]:
    """Create per-scale-factor bucketed copies of orders/lineitem once
    (idempotent); returns the two table names.

    ``num_buckets`` defaults to a byte-sized count (one bucket per
    ~8 MiB of compressed lineitem, floored at 16): a FIXED 16 meant
    3.75M-row per-bucket sorts at sf10 and 1 GiB of spill in the
    "exchange-free" join this table exists to showcase.  The count is
    part of the table name, so a session that re-derives a different
    count builds a fresh layout instead of silently reusing a stale
    one."""
    import os
    import shutil
    from urllib.parse import urlparse

    from ..sources.writers import write_bucketed

    if num_buckets is None:
        from ..sources.readers import table_nbytes

        nbytes = table_nbytes(os.path.join(sf_dir, "lineitem.parquet")) or 0
        num_buckets = max(16, int(nbytes // (8 * 1024 * 1024)))

    sf_name = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_").replace("-", "_")
    ot = f"orders_bkt_{sf_name}_{num_buckets}"
    lt = f"lineitem_bkt_{sf_name}_{num_buckets}"
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")).path

    def _ensure(name: str, src: str, key: str) -> None:
        if spark.catalog.tableExists(name):
            return
        # bucketing metadata lives in the session catalog (in-memory
        # here): a stale location from a previous session must go, the
        # table is rewritten under THIS session's catalog
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
        df = spark.read.parquet(f"{sf_dir}/{src}.parquet")
        write_bucketed(df, name, [key], num_buckets=num_buckets, sort_cols=[key])

    _ensure(ot, "orders", "o_orderkey")
    _ensure(lt, "lineitem", "l_orderkey")
    return ot, lt


@register(
    "bucketed_priority_revenue",
    oracle=f"""
    SELECT o_orderpriority,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_lines
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("join", "bucketed", "agg"),
)
def bucketed_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders x lineitem revenue by priority over BUCKETED tables: the
    orderkey join itself is exchange-free (both sides pre-hashed and
    pre-sorted into the same byte-sized bucket count); only the tiny
    5-row priority
    aggregate shuffles."""
    ot, lt = ensure_bucketed_tables(spark, sf_dir)
    orders = spark.table(ot)
    li = spark.table(lt)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            dsum(revenue).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Blocked fuzzy matching (operators/fuzzy.py): plant deterministic
# typos in part names (every 11th key gets a trailing char), then mine
# them back as levenshtein<=2 pairs within first-token blocks.  Exact
# duplicates (distance 0 -- ~31k pairs in this corpus) are excluded so
# the result is precisely the typo pairs the operator exists to find.
# --------------------------------------------------------------------------
@register(
    "fuzzy_part_name_pairs",
    oracle="""
    WITH named AS (
      SELECT p_partkey,
             CASE WHEN p_partkey % 11 = 0 THEN p_name || 'x' ELSE p_name END AS p_name
      FROM part
    ), b AS (
      SELECT p_partkey, p_name, LOWER(SPLIT_PART(p_name, ' ', 1)) AS blk
      FROM named WHERE LOWER(SPLIT_PART(p_name, ' ', 1)) <> ''
    )
    SELECT a.p_partkey AS p_partkey_a, c.p_partkey AS p_partkey_b,
           a.p_name AS p_name_a, c.p_name AS p_name_b,
           LEVENSHTEIN(a.p_name, c.p_name) AS distance
    FROM b a JOIN b c ON a.blk = c.blk AND a.p_partkey < c.p_partkey
    WHERE LEVENSHTEIN(a.p_name, c.p_name) BETWEEN 1 AND 2
    ORDER BY p_partkey_a, p_partkey_b
    """,
    tags=("fuzzy", "dedup", "join"),
)
def fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.fuzzy import fuzzy_match_pairs

    named = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey",
        F.when(
            F.col("p_partkey") % 11 == 0, F.concat(F.col("p_name"), F.lit("x"))
        )
        .otherwise(F.col("p_name"))
        .alias("p_name"),
    )
    return (
        fuzzy_match_pairs(named, "p_partkey", "p_name", max_distance=2)
        .filter(F.col("distance") >= 1)
        .withColumn("distance", F.col("distance").cast("long"))
        .orderBy("p_partkey_a", "p_partkey_b")
    )


# --------------------------------------------------------------------------
# Snapshot reconciliation (operators/diff.py): two deterministic
# "loads" of orders (old drops keys %10==7; new drops %10==3 and
# reprices every 5th key), diffed on the key.  Both engines compute the
# same IEEE double multiply, so raw repriced values compare bit-exact.
# --------------------------------------------------------------------------
_DIFF_OLD_SQL = "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 <> 7"
_DIFF_NEW_SQL = """SELECT o_orderkey,
       CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 1.1 ELSE o_totalprice END
         AS o_totalprice
     FROM orders WHERE o_orderkey % 10 <> 3"""


def _diff_snapshots(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    old = orders.filter(F.col("o_orderkey") % 10 != 7).select("o_orderkey", "o_totalprice")
    new = orders.filter(F.col("o_orderkey") % 10 != 3).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") * 1.1
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return old, new


@register(
    "orders_snapshot_diff",
    oracle=f"""
    WITH old AS ({_DIFF_OLD_SQL}), new AS ({_DIFF_NEW_SQL})
    SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
           CASE WHEN old.o_orderkey IS NULL THEN 'added'
                WHEN new.o_orderkey IS NULL THEN 'removed'
                WHEN old.o_totalprice IS NOT DISTINCT FROM new.o_totalprice
                  THEN 'unchanged'
                ELSE 'changed' END AS diff_status,
           old.o_totalprice AS o_totalprice_old,
           new.o_totalprice AS o_totalprice_new
    FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
    WHERE NOT (old.o_orderkey IS NOT NULL AND new.o_orderkey IS NOT NULL
               AND old.o_totalprice IS NOT DISTINCT FROM new.o_totalprice)
    ORDER BY o_orderkey
    """,
    tags=("diff", "join"),
)
def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.diff import snapshot_diff

    old, new = _diff_snapshots(spark, sf_dir)
    return (
        snapshot_diff(old, new, ["o_orderkey"], ["o_totalprice"])
        .filter(F.col("diff_status") != "unchanged")
        .orderBy("o_orderkey")
    )


@register(
    "orders_snapshot_diff_summary",
    oracle=f"""
    WITH old AS ({_DIFF_OLD_SQL}), new AS ({_DIFF_NEW_SQL})
    SELECT CASE WHEN old.o_orderkey IS NULL THEN 'added'
                WHEN new.o_orderkey IS NULL THEN 'removed'
                WHEN old.o_totalprice IS NOT DISTINCT FROM new.o_totalprice
                  THEN 'unchanged'
                ELSE 'changed' END AS diff_status,
           COUNT(*) AS n_rows
    FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
    GROUP BY 1
    ORDER BY diff_status
    """,
    tags=("diff", "agg"),
)
def orders_snapshot_diff_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.diff import snapshot_diff_summary

    old, new = _diff_snapshots(spark, sf_dir)
    return snapshot_diff_summary(old, new, ["o_orderkey"], ["o_totalprice"])


# --------------------------------------------------------------------------
# MERGE INTO semantics (operators/merge.py): Delta-style upsert as one
# full-outer key join + codegen'd CASE.  The scenario exercises all
# three clauses at once -- matched+delete (source status 'F'), matched
# update (price restated), not-matched insert -- and the oracle replays
# them as explicit SQL set logic.
# --------------------------------------------------------------------------
@register(
    "merge_orders_upsert",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 4 <> 0
    ),
    s AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             o_totalprice * 1.1 AS o_totalprice
      FROM orders WHERE o_orderkey % 2 = 0
    )
    SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey
                ELSE t.o_custkey END AS o_custkey,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
                ELSE t.o_orderstatus END AS o_orderstatus,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
                ELSE t.o_totalprice END AS o_totalprice
    FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey
    WHERE NOT (t.o_orderkey IS NOT NULL AND s.o_orderkey IS NOT NULL
               AND s.o_orderstatus = 'F')
    ORDER BY o_orderkey
    """,
    tags=("merge", "join"),
)
def merge_orders_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert a restated order feed (even keys, +10% price) into a
    stale target (keys not divisible by 4): matched 'F'-status source
    rows DELETE their target row, other matches UPDATE to source
    values, unmatched source rows INSERT, untouched target rows pass
    through."""
    from ..operators.merge import merge_source_col, merge_upsert

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    target = orders.filter(F.col("o_orderkey") % 4 != 0)
    source = orders.filter(F.col("o_orderkey") % 2 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 1.1
    )
    merged = merge_upsert(
        target,
        source,
        keys=["o_orderkey"],
        when_matched_delete=merge_source_col("o_orderstatus") == "F",
    )
    return merged.orderBy("o_orderkey")


# --------------------------------------------------------------------------
# Skew-salted join (operators/joins.py): semantically a plain equi-join
# -- the oracle proves exactly that -- while the physical plan spreads
# each key over num_salts reducers.  This is the explicit-salting tool
# for the case AQE cannot fix (ONE key bigger than an executor).
# --------------------------------------------------------------------------
@register(
    "salted_event_segment_revenue",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_events,
           {sql_dsum("e.value")} AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    tags=("join", "skew"),
)
def salted_event_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import salted_join

    events = read_events(spark, sf_dir).select("user_id", "value")
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    return (
        salted_join(events, cust, on=["user_id"], num_salts=8)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Broadcast as-of join (operators/joins.py): same semantics as
# asof_click_before_purchase (same DuckDB ASOF oracle) but via the
# collapse-right-to-sorted-series + broadcast formulation -- the big
# left side never shuffles.  Oracle equality proves the two as-of
# implementations agree.
# --------------------------------------------------------------------------
@register(
    "asof_broadcast_click_before_purchase",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           c.value AS click_value,
           STRFTIME(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
    tags=("join", "asof", "broadcast"),
)
def asof_broadcast_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import as_of_join_broadcast

    events = read_events(spark, sf_dir)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    return (
        as_of_join_broadcast(
            purchases, clicks, ts_col="ts", by_cols=["user_id"], value_cols=["value"]
        )
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.col("value_right").alias("click_value"),
            F.date_format("ts_right", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Spark 4 SQL pipe syntax (|>): the same logical plan as the classic
# form -- Catalyst sees no difference -- registered to pin the surface.
# The oracle is the classic-SQL equivalent.
# --------------------------------------------------------------------------
@register(
    "pipe_syntax_flag_stats",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n,
           {sql_dsum("l_quantity")} AS sum_qty
    FROM lineitem
    WHERE l_quantity > 45
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("sql", "pipe"),
)
def pipe_syntax_flag_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView("lineitem")
    qty_sum = f"CAST(SUM({spark_sql_fx('l_quantity')}) AS DOUBLE) / 1e6"
    return spark.sql(
        f"""
        FROM lineitem
        |> WHERE l_quantity > 45
        |> AGGREGATE COUNT(*) AS n, {qty_sum} AS sum_qty GROUP BY l_returnflag
        |> ORDER BY l_returnflag
        """
    )


# --------------------------------------------------------------------------
# Spark 4 recursive CTE (WITH RECURSIVE): a month spine generated by
# recursion, left-joined to order counts -- gap-fill without a
# sequence() helper.  Both engines run the SAME recursive SQL shape.
# --------------------------------------------------------------------------
_RECURSIVE_MONTHS_SQL = """
    WITH RECURSIVE m(ms, me) AS (
      SELECT DATE_TRUNC('month', MIN(o_orderdate)),
             DATE_TRUNC('month', MAX(o_orderdate))
      FROM orders
      UNION ALL
      SELECT ms + INTERVAL '1' MONTH, me FROM m WHERE ms < me
    )
    SELECT {month_expr} AS month, COUNT(o.o_orderkey) AS n_orders
    FROM m LEFT JOIN orders o ON DATE_TRUNC('month', o.o_orderdate) = m.ms
    GROUP BY m.ms
    ORDER BY m.ms
"""


@register(
    "recursive_month_order_counts",
    oracle=_RECURSIVE_MONTHS_SQL.replace(
        "INTERVAL '1' MONTH", "INTERVAL 1 MONTH"
    ).format(month_expr="STRFTIME(m.ms, '%Y-%m')"),
    tags=("sql", "recursive"),
)
def recursive_month_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView("orders")
    return spark.sql(_RECURSIVE_MONTHS_SQL.format(month_expr="DATE_FORMAT(m.ms, 'yyyy-MM')"))


# --------------------------------------------------------------------------
# Domain-mixture resampling (operators/sampling.py): realized per-source
# counts after resampling the documents corpus toward a 50/30/20 mix.
# Rows-only (seeded Bernoulli differs across engines); tests pin the
# realized proportions.
# --------------------------------------------------------------------------
@register(
    "temperature_mixture_manifest",
    # Deterministic temperature-mixed data recipe: per-source token
    # shares flattened by share^(1/T) (T=2), normalized weights split a
    # budget of 25% of corpus tokens, each source greedily fills its
    # budget in the seeded md5(seed:id) order.  Budgets round to 6 dp
    # before the cumulative comparison (pow ULP guard); everything else
    # is integer arithmetic, so the manifest replays row-for-row.
    oracle=r"""
    WITH d AS (
      SELECT source, doc_id,
             CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS BIGINT) AS tokens
      FROM documents
    ),
    tot AS (SELECT source, SUM(tokens) AS dt FROM d GROUP BY 1),
    g AS (SELECT SUM(dt) AS t FROM tot),
    wr AS (SELECT source, POW(CAST(dt AS DOUBLE) / g.t, 0.5) AS w_raw FROM tot, g),
    ws AS (SELECT SUM(w_raw) AS s FROM wr),
    b AS (
      SELECT source, ROUND(w_raw / ws.s * (SELECT 0.25 * t FROM g), 6) AS budget
      FROM wr, ws
    ),
    r AS (
      SELECT d.*,
             SUM(tokens) OVER (
               PARTITION BY source
               ORDER BY MD5(CONCAT('42:', CAST(doc_id AS VARCHAR))), doc_id
               ROWS UNBOUNDED PRECEDING) - tokens AS cum_prev
      FROM d
    )
    SELECT r.source, r.doc_id, r.tokens
    FROM r JOIN b USING (source)
    WHERE r.cum_prev < b.budget
    ORDER BY source, doc_id
    """,
    tags=("sample", "mixture", "tokens"),
)
def temperature_mixture_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (T=2) corpus mix under a token budget (25% of
    corpus tokens): the deterministic pretraining data-recipe manifest
    -- tail sources upweighted by share^(1/T), each source greedily
    filled in a seeded portable shuffle order.  Fully SQL-replayable,
    unlike the Bernoulli ``mixture_sample`` (rows-only by contract)."""
    from ..operators.sampling import temperature_mixture

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source",
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_toks"),
    )
    total = docs.agg(F.sum("n_toks")).collect()[0][0]  # 1-row control plane
    return temperature_mixture(
        docs, "source", "n_toks", budget_tokens=0.25 * total, temperature=2.0
    ).select(
        "source", "doc_id", F.col("tokens")
    ).orderBy("source", "doc_id")


@register("mixture_sample_counts", oracle=None, tags=("sample", "mixture"))
def mixture_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import mixture_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sources = [r["source"] for r in docs.select("source").distinct().collect()]
    weights = dict(zip(sorted(sources), [0.5, 0.3, 0.2][: len(sources)]))
    mixed = mixture_sample(docs, "source", weights, seed=42)
    return (
        mixed.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source")
    )


#: exactly-representable dyadic weights (sum is EXACTLY 1.0 in ieee754,
#: so mixture_hash_sample's normalization is a bit-exact no-op and the
#: oracle can use the raw values) over the 4 lexicographically-first
#: sources -- rank-addressed so the same SQL replays at every SF
_MIXTURE_DET_WEIGHTS = [0.5, 0.25, 0.125, 0.125]


def _mixture_det_oracle() -> str:
    from ..operators.sampling import sql_portable_uniform

    u = sql_portable_uniform("d.doc_id", seed=42)
    case = " ".join(
        f"WHEN {i + 1} THEN {w!r}e0" for i, w in enumerate(_MIXTURE_DET_WEIGHTS)
    )
    return f"""
    WITH src AS (
      SELECT source, COUNT(*) AS n,
             ROW_NUMBER() OVER (ORDER BY source) AS rn
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, n, CASE rn {case} END AS w
      FROM src WHERE rn <= {len(_MIXTURE_DET_WEIGHTS)}
    ),
    s AS (SELECT MIN(CAST(n AS DOUBLE) / w) AS scale FROM w WHERE w > 0),
    f AS (SELECT source, ROUND(LEAST(1.0e0, w * s.scale / n), 6) AS frac FROM w, s)
    SELECT d.source, COUNT(*) AS n_docs
    FROM documents d JOIN f USING (source)
    WHERE {u} <= f.frac
    GROUP BY d.source
    ORDER BY d.source
    """


@register("mixture_sample_det", oracle=_mixture_det_oracle(), tags=("sample", "mixture"))
def mixture_sample_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic twin of mixture_sample_counts: target weights over
    the 4 lexicographically-first sources, keep-fractions computed IN
    THE PLAN (no driver collect) and selection by the portable keyed
    hash threshold (operators/sampling.py mixture_hash_sample) -- the
    realized per-source document counts are exact functions of the
    data and replay as SQL CTEs.  The source->weight map is
    rank-addressed (sorted source order) so Spark and the oracle bind
    weights identically at every SF; the one control-plane collect
    here only DISCOVERS the source names for the weight dict (tiny
    distinct), it does not move sample data."""
    from ..operators.sampling import mixture_hash_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sources = sorted(r["source"] for r in docs.select("source").distinct().collect())
    if len(sources) < len(_MIXTURE_DET_WEIGHTS):
        # zip would silently truncate the weight list; the sum would then
        # be < 1.0 and mixture_hash_sample would NORMALIZE while the
        # oracle uses raw weights -- breaking the bit-exact "dyadic sum
        # == 1.0, normalization is a no-op" premise. Fail loudly.
        raise ValueError(
            f"mixture_sample_det needs >= {len(_MIXTURE_DET_WEIGHTS)} distinct "
            f"sources, corpus has {len(sources)}: {sources}"
        )
    weights = dict(zip(sources, _MIXTURE_DET_WEIGHTS))
    mixed = mixture_hash_sample(docs, "source", weights, F.col("doc_id"), seed=42)
    return (
        mixed.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Incremental aggregate maintenance (operators/incremental.py): history
# (orders before 1998) is folded to mergeable state, the 1998+ delta is
# folded separately, and the two states MERGE -- no re-scan of history.
# The oracle aggregates the whole table in one pass: a hash match
# proves merge(partial(A), partial(B)) == partial(A ∪ B).
# --------------------------------------------------------------------------
@register(
    "incremental_priority_rollup",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(o_totalprice) AS o_totalprice_count,
           {sql_dsum("o_totalprice")} AS o_totalprice_sum,
           MIN(o_totalprice) AS o_totalprice_min,
           MAX(o_totalprice) AS o_totalprice_max,
           {sql_dsum("o_totalprice")} / COUNT(o_totalprice) AS o_totalprice_avg
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("agg", "incremental"),
)
def incremental_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import finalize, merge_partials, partial_agg

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    history = orders.filter(F.col("o_orderdate") < "1998-01-01")
    delta = orders.filter(F.col("o_orderdate") >= "1998-01-01")
    keys, measures = ["o_orderpriority"], ["o_totalprice"]
    merged = merge_partials(
        [partial_agg(history, keys, measures), partial_agg(delta, keys, measures)],
        keys,
    )
    return finalize(merged, measures).orderBy("o_orderpriority")


# --------------------------------------------------------------------------
# Dynamic partition pruning (DPP): the scan-side optimization that
# makes star joins viable at 100 TB when the fact table is
# date/priority-partitioned.  The dim's `urgent` filter can't be
# pushed statically (it's on a dim attribute, not on partition
# values), so Catalyst injects a runtime subquery that evaluates the
# filtered dim FIRST and prunes fact partitions before the scan --
# tests/test_plans.py asserts `dynamicpruning` in the plan, and at
# scale this is the difference between reading 2 of 5 partitions and
# reading all of them.
# --------------------------------------------------------------------------
_PRIORITY_DIM = [
    ("1-URGENT", "urgent"),
    ("2-HIGH", "urgent"),
    ("3-MEDIUM", "normal"),
    ("4-NOT SPECIFIED", "normal"),
    ("5-LOW", "normal"),
]


def ensure_partitioned_orders(spark: SparkSession, sf_dir: str) -> str:
    """Write a priority-partitioned copy of orders once per scale
    factor (idempotent; like ensure_bucketed_tables this is the
    one-time ingest job, not part of any timed query)."""
    import os
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")).path
    sf_name = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_").replace("-", "_")
    path = f"{warehouse}/orders_part_{sf_name}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            # cluster by the partition column first: without this every
            # one of the 32 write tasks emits a file into every
            # partition directory (160 small files); with it each
            # partition is one file, and the DPP-pruned scan opens 2
            # footers instead of 64
            .repartition("o_orderpriority")
            .write.mode("overwrite")
            .partitionBy("o_orderpriority")
            .parquet(path)
        )
    return path


@register(
    "dpp_urgent_order_revenue",
    oracle=f"""
    WITH dim AS (
      SELECT * FROM (VALUES {", ".join(f"('{p}', '{c}')" for p, c in _PRIORITY_DIM)})
        AS t(o_orderpriority, priority_class)
    )
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum('o.o_totalprice', scale=2)} AS total_price
    FROM orders o JOIN dim USING (o_orderpriority)
    WHERE dim.priority_class = 'urgent'
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    tags=("join", "dpp", "agg"),
)
def dpp_urgent_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders revenue for urgent priorities over the PARTITIONED copy:
    the broadcast dim's runtime filter prunes fact partitions before
    the scan (3 of 5 directories never open)."""
    path = ensure_partitioned_orders(spark, sf_dir)
    orders = spark.read.parquet(path)
    dim = spark.createDataFrame(
        _PRIORITY_DIM, "o_orderpriority string, priority_class string"
    )
    return (
        orders.join(F.broadcast(dim), "o_orderpriority")
        # an explicit comparison (not a bare boolean attribute): the
        # PartitionPruning rule only plants the runtime subquery behind
        # predicates it judges "likely selective"
        .filter(F.col("priority_class") == "urgent")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice"), scale=2).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Data-quality validation (operators/quality.py): named boolean rules
# evaluated in one codegen'd projection; rows carry the names of the
# rules they fail.  The `price_le_300k` rule is deliberately violated
# by ~6% of the fixture so the quarantine path is actually exercised.
# --------------------------------------------------------------------------
def _order_dq_rules():
    return {
        "positive_price": F.col("o_totalprice") > 0,
        "price_le_300k": F.col("o_totalprice") <= 300000,
        "known_status": F.col("o_orderstatus").isin("O", "F", "P"),
        "priority_format": F.col("o_orderpriority").rlike("^[1-5]-"),
        "custkey_positive": F.col("o_custkey") > 0,
    }


_ORDER_DQ_SQL = {
    "positive_price": "o_totalprice > 0",
    "price_le_300k": "o_totalprice <= 300000",
    "known_status": "o_orderstatus IN ('O', 'F', 'P')",
    "priority_format": "regexp_matches(o_orderpriority, '^[1-5]-')",
    "custkey_positive": "o_custkey > 0",
}


@register(
    "dq_rule_violation_counts",
    oracle=f"""
    SELECT rule, CAST(n_violations AS BIGINT) AS n_violations FROM (
      {" UNION ALL ".join(
          f"SELECT '{name}' AS rule, COUNT(*) FILTER (WHERE NOT ({cond})) AS n_violations FROM orders"
          for name, cond in _ORDER_DQ_SQL.items()
      )}
    ) WHERE n_violations > 0 ORDER BY rule
    """,
    tags=("quality", "agg"),
)
def dq_rule_violation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule violation counts over orders: the audit summary a DQ
    gate emits.  Single scan, single partial+final hash agg."""
    from ..operators.quality import rule_violation_counts

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return rule_violation_counts(orders, _order_dq_rules())


@register(
    "dq_quarantined_orders",
    oracle=f"""
    SELECT o_orderkey,
           CONCAT_WS(',', {", ".join(
               f"CASE WHEN NOT ({cond}) THEN '{name}' END"
               for name, cond in _ORDER_DQ_SQL.items()
           )}) AS failed
    FROM orders
    WHERE {" OR ".join(f"NOT ({cond})" for cond in _ORDER_DQ_SQL.values())}
    ORDER BY o_orderkey
    """,
    tags=("quality",),
)
def dq_quarantined_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quarantine side of validate(): each failing order with the
    comma-joined names of the rules it violates (array order = rule
    declaration order on both engines)."""
    from ..operators.quality import FAILED_COL, validate

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    _good, bad = validate(orders, _order_dq_rules())
    return (
        bad.select(
            "o_orderkey", F.array_join(F.col(FAILED_COL), ",").alias("failed")
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Distributed exact quantiles (operators/quantiles.py): same oracle as
# quartiles_per_flag, but computed with the distributed-scan ranking
# instead of the single-reducer-per-group percentile buffer -- the
# exact-quantile path that survives a hot group at 100 TB.
# --------------------------------------------------------------------------
@register(
    "quartiles_per_flag_distributed",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS q1,
           ROUND(quantile_cont(l_extendedprice, 0.50), 6) AS median,
           ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS q3
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "percentile", "distributed"),
)
def quartiles_per_flag_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantiles import exact_quantiles

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    long = exact_quantiles(li, "l_returnflag", "l_extendedprice", [0.25, 0.5, 0.75])
    return (
        long.groupBy("l_returnflag")
        .agg(
            F.round(F.min(F.when(F.col("q") == 0.25, F.col("value"))), 6).alias("q1"),
            F.round(F.min(F.when(F.col("q") == 0.50, F.col("value"))), 6).alias("median"),
            F.round(F.min(F.when(F.col("q") == 0.75, F.col("value"))), 6).alias("q3"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Deterministic exact-k-per-group sampling (operators/sampling.py):
# md5-keyed order makes the drawn subset a pure function of (seed, id)
# -- reproducible across partitionings AND engines, so the oracle
# replays the identical selection.
# --------------------------------------------------------------------------
@register(
    "deterministic_lang_sample",
    oracle="""
    SELECT lang, doc_id FROM (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY MD5('42:' || CAST(doc_id AS VARCHAR))
             ) AS rk
      FROM documents
    ) WHERE rk <= 5
    ORDER BY lang, doc_id
    """,
    tags=("sample", "deterministic"),
)
def deterministic_lang_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import deterministic_group_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        deterministic_group_sample(docs, "lang", "doc_id", k=5, seed=42)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    )


# --------------------------------------------------------------------------
# LATERAL correlated subquery (SQL surface): per-nation top-2 suppliers
# by account balance.  Catalyst plans the LATERAL as a decorrelated
# join (no per-row re-execution); DuckDB runs the identical SQL shape.
# --------------------------------------------------------------------------
_LATERAL_SQL = """
    SELECT n.n_name, s.s_name, s.s_acctbal
    FROM nation n,
    LATERAL (
      SELECT s_name, s_acctbal FROM supplier
      WHERE s_nationkey = n.n_nationkey
      ORDER BY s_acctbal DESC, s_name
      LIMIT 2
    ) s
    ORDER BY n.n_name, s.s_acctbal DESC, s.s_name
"""


@register("lateral_top_suppliers", oracle=_LATERAL_SQL, tags=("join", "sql", "lateral"))
def lateral_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("nation", "supplier"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    return spark.sql(_LATERAL_SQL)


# --------------------------------------------------------------------------
# Spark 4 VariantType: the semi-structured column type (binary-encoded
# JSON with typed path extraction).  Each order serializes to a JSON
# document, parses to VARIANT, and the aggregation reads fields back
# out with variant_get typed paths; the oracle aggregates the raw
# columns directly, so a green check proves the variant round-trip is
# LOSSLESS (string and double survive bit-exact through
# to_json -> parse_json -> variant_get).
# --------------------------------------------------------------------------
@register(
    "variant_order_stats",
    oracle=f"""
    SELECT o_orderstatus AS status,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price,
           MAX(o_orderkey) AS max_key
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY status
    """,
    tags=("variant", "semistructured"),
)
def variant_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    v = orders.select(
        F.parse_json(
            F.to_json(F.struct("o_orderkey", "o_orderstatus", "o_totalprice"))
        ).alias("v")
    )
    fields = v.select(
        F.expr("variant_get(v, '$.o_orderstatus', 'string')").alias("status"),
        F.expr("variant_get(v, '$.o_totalprice', 'double')").alias("price"),
        F.expr("variant_get(v, '$.o_orderkey', 'long')").alias("okey"),
    )
    return (
        fields.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("price").alias("total_price"),
            F.max("okey").alias("max_key"),
        )
        .orderBy("status")
    )


# --------------------------------------------------------------------------
# SQL PIVOT clause (the DataFrame .pivot() twin, exercising the SQL
# parser path).  DuckDB's PIVOT dialect differs, so the oracle states
# the same contract as conditional aggregation.
# --------------------------------------------------------------------------
@register(
    "sql_pivot_status_qty",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END")} AS F,
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END")} AS O
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("pivot", "sql"),
)
def sql_pivot_status_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView("lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, coalesce(F, 0.0) AS F, coalesce(O, 0.0) AS O
        FROM (SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem)
        PIVOT (
          CAST(SUM({spark_sql_fx('l_quantity')}) AS DOUBLE) / 1e6
          FOR l_linestatus IN ('F', 'O')
        )
        ORDER BY l_returnflag
        """
    )


# --------------------------------------------------------------------------
# Grouped-AGGREGATE Pandas UDF (Series -> scalar): the last cell of the
# Python-UDF taxonomy (scalar pandas_udf, grouped-map applyInPandas,
# UDTF, mapInPandas/mapInArrow, applyInPandasWithState are covered
# elsewhere).  Weighted mean is the canonical example the built-ins
# can't spell as one aggregate.  Arrow ships each group's columns once;
# NOTE the scale contract: unlike native aggregates there is NO partial
# aggregation -- the whole group's values cross to Python, so this is
# for moderate group sizes; a 100 TB hot group belongs in native
# sum(w*x)/sum(w) (the oracle's own formulation).
# --------------------------------------------------------------------------
@register(
    "weighted_avg_price_udaf",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS w_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "udf"),
)
def weighted_avg_price_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(wavg("l_extendedprice", "l_quantity"), 4).alias("w_avg_price"))
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Mergeable HLL sketch state (Datasketches, Spark 3.5+): the
# COUNT-DISTINCT twin of operators/incremental.py's monoid rollups.
# Partial sketches are built per (month, priority) group, persisted as
# BINARY, and rolled up later with hll_union_agg -- re-aggregating the
# raw 100 TB is never needed.  The query proves the merge property AS
# DATA: union-of-partials vs direct whole-set sketch vs exact distinct.
# --------------------------------------------------------------------------
@register(
    "hll_sketch_rollup",
    oracle="""
    WITH per_month AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderpriority,
             COUNT(DISTINCT o_custkey) AS nd
      FROM orders GROUP BY 1, 2
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_months,
           CAST(SUM(nd) AS BIGINT) AS sum_monthly_distinct
    FROM per_month
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("agg", "sketch", "incremental"),
)
def hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact frame of the sketch demo: per-month distinct-customer
    counts rolled up by priority (what the sketches must reproduce).
    The sketch path itself lives in hll_sketch_union_estimate, whose
    OUTPUT carries the merged estimate next to the exact value -- kept
    separate so Catalyst can't prune the sketch work out of the
    checked query (the vacuous-measurement trap)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"), "o_orderpriority"
    ).agg(F.count_distinct("o_custkey").alias("nd"))
    return (
        monthly.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_months"),
            F.sum("nd").alias("sum_monthly_distinct"),
        )
        .orderBy("o_orderpriority")
    )


@register("hll_sketch_union_estimate", oracle=None, tags=("agg", "sketch", "incremental"))
def hll_sketch_union_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-sketch path, self-validating: per-priority, the
    estimate from UNIONING the twelve monthly partial sketches next to
    the exact distinct over the whole set, plus the relative error.
    merge(sketch(Jan), ..., sketch(Dec)) must land within the HLL
    error envelope of distinct(Jan..Dec) -- the property that makes
    persisted partial sketches safe to roll up at 100 TB without
    touching raw data.  Floor-asserted in tests/test_registry.py."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"), "o_orderpriority"
    ).agg(F.hll_sketch_agg("o_custkey", 14).alias("sketch"))
    merged = monthly.groupBy("o_orderpriority").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("merged_estimate")
    )
    exact = orders.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("exact_distinct")
    )
    return (
        merged.join(exact, "o_orderpriority")
        .select(
            "o_orderpriority",
            "merged_estimate",
            "exact_distinct",
            F.round(
                F.abs(F.col("merged_estimate") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                5,
            ).alias("rel_err"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# ANSI-mode safety valves: Spark 4 runs ANSI SQL by default, where a
# plain division by zero THROWS mid-job.  try_divide returns NULL
# instead -- the posture a 100 TB pipeline wants (quarantine bad rows,
# never lose 6 hours of work to one of them).  DuckDB's `/` already
# yields NULL on zero denominators, so the oracle is the plain form.
# --------------------------------------------------------------------------
@register(
    "try_divide_tax_ratio",
    oracle=f"""
    SELECT l_returnflag,
           CAST(COUNT(*) FILTER (WHERE l_discount = 0) AS BIGINT) AS n_zero_discount,
           {sql_dsum('l_tax / l_discount')} AS sum_tax_ratio
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "ansi"),
)
def try_divide_tax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.when(F.col("l_discount") == 0, 1)).alias("n_zero_discount"),
            dsum(F.try_divide("l_tax", "l_discount")).alias("sum_tax_ratio"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Interval x interval overlap join (operators/joins.py
# interval_overlap_join): both sides are time RANGES (purchase
# lookback windows x click attention windows), banded onto a grid so
# the physical plan is a hash equi-join on (user, cell) with the exact
# overlap predicate as a residual -- the oracle is the plain theta
# join producing identical pairs.
# --------------------------------------------------------------------------
@register(
    "interval_overlap_attribution",
    oracle="""
    SELECT p.event_id AS p_event_id, c.event_id AS c_event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND epoch_us(p.ts) - 3600000000 <= epoch_us(c.ts) + 600000000
     AND epoch_us(c.ts) <= epoch_us(p.ts)
    ORDER BY p_event_id, c_event_id
    """,
    tags=("join", "interval"),
)
def interval_overlap_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-style overlap: each purchase's 1-hour lookback
    interval joined to each click's 10-minute attention interval for
    the same user; a pair matches when the intervals overlap."""
    from ..operators.joins import interval_overlap_join
    from ..sources.readers import read_events

    ev = read_events(spark, sf_dir)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        "user_id",
        (us - F.lit(3_600_000_000)).alias("p_start"),
        us.alias("p_end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"),
        "user_id",
        us.alias("c_start"),
        (us + F.lit(600_000_000)).alias("c_end"),
    )
    pairs = interval_overlap_join(
        purchases,
        clicks,
        "p_start",
        "p_end",
        "c_start",
        "c_end",
        band_width=3_600_000_000,  # W ~ the longer interval: ~2x replication
        by_cols=["user_id"],
    )
    return pairs.select("p_event_id", "c_event_id").orderBy("p_event_id", "c_event_id")


# --------------------------------------------------------------------------
# Spark 4 SQL UDF (CREATE TEMPORARY FUNCTION ... RETURN <expr>): the
# catalog-registered, pure-SQL scalar function -- unlike a Python UDF
# it inlines into the Catalyst plan (codegen'd, pushdown-transparent),
# so it is the 100 TB-safe way to share business expressions.  The
# oracle inlines the identical CASE expression.
# --------------------------------------------------------------------------
@register(
    "sql_udf_price_bands",
    oracle="""
    WITH banded AS (
      SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                  WHEN o_totalprice < 150000 THEN 'mid'
                  ELSE 'high' END AS band,
             o_totalprice
      FROM orders
    )
    SELECT band, COUNT(*) AS n_orders,
           (CAST(SUM(CAST(TRUNC(o_totalprice * 1e2 + SIGN(o_totalprice * 1e2) * 0.5) AS BIGINT)) AS DOUBLE) / 1e2) AS total_price
    FROM banded
    GROUP BY band
    ORDER BY band
    """,
    tags=("sql", "udf"),
)
def sql_udf_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-price bands via a catalog SQL UDF; grouped rollup over the
    band label the UDF computes."""
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView("orders")
    spark.sql("DROP TEMPORARY FUNCTION IF EXISTS price_band")
    spark.sql(
        """
        CREATE TEMPORARY FUNCTION price_band(price DOUBLE) RETURNS STRING
        RETURN CASE WHEN price < 50000 THEN 'low'
                    WHEN price < 150000 THEN 'mid'
                    ELSE 'high' END
        """
    )
    return spark.sql(
        f"""
        SELECT price_band(o_totalprice) AS band,
               COUNT(*) AS n_orders,
               CAST(SUM({spark_sql_fx('o_totalprice', 2)}) AS DOUBLE) / 1e2 AS total_price
        FROM orders
        GROUP BY price_band(o_totalprice)
        ORDER BY band
        """
    )


# --------------------------------------------------------------------------
# Spark 4 string collation: case-insensitive comparison semantics as a
# TYPE property (collate(x, 'UNICODE_CI')) instead of lower() calls
# scattered through every predicate.  The query manufactures a
# case-diverse column from the fixture, then proves CI distinct-count
# folds the variants; the oracle replays with LOWER().
# --------------------------------------------------------------------------
@register(
    "collation_ci_distinct",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN p_partkey % 2 = 0 THEN UPPER(p_brand) ELSE LOWER(p_brand) END AS brand_mixed
      FROM part
    )
    SELECT COUNT(DISTINCT brand_mixed) AS n_case_sensitive,
           COUNT(DISTINCT LOWER(brand_mixed)) AS n_case_insensitive
    FROM mixed
    """,
    tags=("sql",),
)
def collation_ci_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct brand count under binary vs UNICODE_CI collation: the
    CI count folds the manufactured case variants (25 real brands from
    50 case-mixed spellings)."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    mixed = part.select(
        F.when(F.col("p_partkey") % 2 == 0, F.upper("p_brand"))
        .otherwise(F.lower("p_brand"))
        .alias("brand_mixed")
    )
    return mixed.agg(
        F.count_distinct(F.col("brand_mixed")).alias("n_case_sensitive"),
        F.count_distinct(
            F.collate(F.col("brand_mixed"), "UNICODE_CI")
        ).alias("n_case_insensitive"),
    )


# --------------------------------------------------------------------------
# Spark 4 / modern-SQL ergonomics, each oracle-checked: GROUP BY ALL +
# ORDER BY ALL (grouping keys inferred from the select list), lateral
# column aliases (reference an alias later in the same SELECT), and
# parameterized SQL (spark.sql(sql, args) -- injection-safe literals
# through the parser, not string formatting).
# --------------------------------------------------------------------------
@register(
    "group_by_all_status_flag",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           (CAST(SUM({sql_fx('l_quantity', 2)}) AS DOUBLE) / 1e2) AS total_qty
    FROM lineitem
    GROUP BY ALL
    ORDER BY ALL
    """,
    tags=("sql",),
)
def group_by_all_status_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL: same Catalyst aggregate as the
    explicit form -- pure parser sugar, proven by the oracle hash."""
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView("lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               CAST(SUM({spark_sql_fx('l_quantity', 2)}) AS DOUBLE) / 1e2 AS total_qty
        FROM lineitem
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@register(
    "lateral_alias_price_tiers",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             o_totalprice * 0.9 AS discounted,
             CASE WHEN o_totalprice * 0.9 > 150000 THEN 'big' ELSE 'small' END AS tier
      FROM orders
    )
    SELECT tier, COUNT(*) AS n_orders
    FROM t GROUP BY tier ORDER BY tier
    """,
    tags=("sql",),
)
def lateral_alias_price_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column alias: ``discounted`` defined and then REUSED in
    the same SELECT list (no subquery, no repetition) -- resolves to
    the identical plan as the expanded form the oracle runs."""
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT tier, COUNT(*) AS n_orders
        FROM (
          SELECT o_orderkey,
                 o_totalprice * 0.9 AS discounted,
                 CASE WHEN discounted > 150000 THEN 'big' ELSE 'small' END AS tier
          FROM orders
        )
        GROUP BY tier ORDER BY tier
        """
    )


@register(
    "parameterized_sql_priority_count",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01' AND o_totalprice > 50000.0
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("sql",),
)
def parameterized_sql_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (spark.sql(sql, args)): the cutoff values
    travel as typed parameters through the parser (injection-safe),
    not string interpolation."""
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n
        FROM orders
        WHERE o_orderdate >= :cutoff AND o_totalprice > :min_price
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        args={"cutoff": datetime.date(1995, 1, 1), "min_price": 50000.0},
    )


# --------------------------------------------------------------------------
# Distribution-based outlier detection -- the two standard data-quality
# fences, both oracle-checked.  Cross-engine determinism: the quartile/
# median/MAD statistics are ROUNDED to 6 dp first and the fences are
# derived from the rounded values, so both engines compare every row
# against bit-identical thresholds (the engines' percentile
# interpolation differs in the last ULPs; deriving fences from raw
# quantiles would make boundary rows engine-dependent).
# --------------------------------------------------------------------------
@register(
    "iqr_outlier_counts",
    oracle="""
    WITH q AS (
      SELECT l_returnflag,
             ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS q1,
             ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS q3
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN l.l_extendedprice < q.q1 - 1.5 * (q.q3 - q.q1)
                           OR l.l_extendedprice > q.q3 + 1.5 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM lineitem l JOIN q USING (l_returnflag)
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    tags=("agg", "percentile", "quality"),
)
def iqr_outlier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR fences per group: rows outside
    [q1 - 1.5*IQR, q3 + 1.5*IQR] counted as outliers."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = (
        li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, array(0.25, 0.75))").alias("__qs"))
        .select(
            "l_returnflag",
            F.round(F.col("__qs")[0], 6).alias("q1"),
            F.round(F.col("__qs")[1], 6).alias("q3"),
        )
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("l_extendedprice") < F.col("q1") - 1.5 * iqr) | (
        F.col("l_extendedprice") > F.col("q3") + 1.5 * iqr
    )
    return (
        li.join(F.broadcast(q), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(is_out.cast("long")).alias("n_outliers"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "robust_zscore_outliers",
    oracle="""
    WITH med AS (
      SELECT l_returnflag,
             ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS med
      FROM lineitem GROUP BY l_returnflag
    ),
    mad AS (
      SELECT l.l_returnflag,
             ROUND(quantile_cont(ABS(l.l_extendedprice - m.med), 0.5), 6) AS mad
      FROM lineitem l JOIN med m USING (l_returnflag)
      GROUP BY l.l_returnflag
    )
    SELECT l.l_returnflag, m.med, d.mad,
           CAST(SUM(CASE WHEN ABS(l.l_extendedprice - m.med) > 3 * 1.4826 * d.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM lineitem l
    JOIN med m USING (l_returnflag)
    JOIN mad d USING (l_returnflag)
    GROUP BY l.l_returnflag, m.med, d.mad
    ORDER BY l.l_returnflag
    """,
    tags=("agg", "percentile", "quality"),
)
def robust_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust z-score: rows with |x - median| > 3 sigma-hat
    (sigma-hat = 1.4826 * MAD) counted per group -- the outlier fence
    that survives the outliers it hunts, unlike mean/stddev."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    med = (
        li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, 0.5)").alias("__m"))
        .select("l_returnflag", F.round("__m", 6).alias("med"))
    )
    with_med = li.join(F.broadcast(med), "l_returnflag")
    mad = (
        with_med.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(abs(l_extendedprice - med), 0.5)").alias("__d")
        )
        .select("l_returnflag", F.round("__d", 6).alias("mad"))
    )
    return (
        with_med.join(F.broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag", "med", "mad")
        .agg(
            F.sum(
                (
                    F.abs(F.col("l_extendedprice") - F.col("med"))
                    > 3 * 1.4826 * F.col("mad")
                ).cast("long")
            ).alias("n_outliers")
        )
        .orderBy("l_returnflag")
    )


@register(
    "zorder_lineitem_roundtrip",
    # Layout-only invariant: the Z-order rewrite (Morton interleave of
    # equi-depth bucket ranks, repartitionByRange + local sort) must be
    # LOSSLESS -- the grouped totals of the rewritten table equal the
    # source's.  The skipping benefit the layout buys (a 2-D box
    # predicate pruning files via parquet footer stats) is asserted in
    # tests/test_layout.py::test_zorder_roundtrip_and_skipping.
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           {{dsum}} AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """.format(dsum=sql_dsum("l_quantity")),
    tags=("layout", "sink"),
)
def zorder_lineitem_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout rewrite of lineitem on (l_partkey, l_suppkey),
    read back and re-aggregated: proves the multi-dimensional
    file-skipping layout (functions/zorder.py) rewrites files, not
    data."""
    import tempfile

    from ..functions.zorder import zorder_write

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = tempfile.mkdtemp(prefix="zorder_li_") + "/data"
    zorder_write(
        li.select(
            "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
            "l_returnflag", "l_linestatus",
        ),
        out,
        ["l_partkey", "l_suppkey"],
        bits=6,
        num_files=16,
        method="depth",
    )
    return (
        spark.read.parquet(out)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    )
