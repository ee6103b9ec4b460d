"""Relational operator queries (SURVEY.md section 2.1-2.9) over the
TPC-H-ish fixture tables, each with a DuckDB oracle.

Coverage map (reference file:line cited per query):
- scans/projection/filter/derived cols: S1, P1-P3, F1-F2 (reference
  project-co2.py:87,89,101,105,226)
- null handling: N1-N3 (reference project-co2.py:25-29)
- aggregation: A1-A4 (reference project-co2.py:131,218-222)
- sort/top-k: T1-T2 (reference project-co2.py:187-226)
- joins: J1 generalized to inner/left/semi/anti (reference
  project-co2.py:146-147 does its one join in pandas; here it is Spark)
- window/rollup/cube/set-ops/pivot: engine extensions (SURVEY.md 2.6-2.7)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.readers import read_events
from ._exact import davg, dsum, fx, sql_davg, sql_dsum, sql_fx, unfx
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return read_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _distinct_agg_partitions(
    spark: SparkSession, sf_dir: str, table: str = "lineitem", divisor_mib: int = 8
) -> int | None:
    """Partition count for the repartition-first exact-distinct shape
    (see distinct_parts_per_flag): one partition per ``divisor_mib``
    of compressed table bytes -- filesystem metadata only, no probe
    job (the _jaccard_agg_partitions sizing discipline,
    operators/dedup.py).  Returns None at or under the session
    default: small inputs keep the stock Expand multi-distinct plan,
    whose one-scan/one-pass shape wins while the distinct-key hash
    state still fits task memory (measured at sf0.1: stock 0.6 s vs
    1.1 s repartition-first; the crossover is where the partial agg
    starts spilling)."""
    import os

    from ..sources.readers import table_nbytes

    default = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    nbytes = table_nbytes(os.path.join(sf_dir, f"{table}.parquet"))
    if nbytes is None:
        return None
    n = int(nbytes // (divisor_mib * 1024 * 1024))
    return n if n > default else None


# --------------------------------------------------------------------------
# Scan + filter + grouped aggregation (TPC-H Q1 shape; flagship query).
# Exercises S1/P1/P2/A1/A2/T2 in one plan: parquet scan with pushed
# filter, decimal-exact partial+final hash aggregation, small sort.
# --------------------------------------------------------------------------
@register(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount', scale=4)} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '2000-01-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "scan", "flagship"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # the products have <= 6 true decimal digits (2+2+2), so the
    # scale-6 fixed-point quantization is lossless; both engines build
    # the identical double product before quantizing (_exact.py)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") < "2000-01-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", scale=4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Top-k: orderBy + limit -> TakeOrderedAndProject (per-partition heap +
# driver merge, no global sort shuffle).  Reference T1
# (project-co2.py:187-200, six top/bottom-3 queries).
# --------------------------------------------------------------------------
@register(
    "top_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("topk",),
)
def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# isin filter + projection (reference F2, project-co2.py:226: 5-way OR on
# Country Name).  Both predicates reach the parquet scan as PushedFilters.
# --------------------------------------------------------------------------
@register(
    "part_filter_isin",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size, p_retailprice
    FROM part
    WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3') AND p_size >= 5
    """,
    tags=("filter",),
)
def part_filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") & (F.col("p_size") >= 5))
        .select("p_partkey", "p_name", "p_brand", "p_size", "p_retailprice")
    )


# --------------------------------------------------------------------------
# Null-drop matrix (reference N1-N3, project-co2.py:25-29).  The fixture
# has no nulls, so this is surface coverage here; the null semantics
# matrix (all/any/subset) is exercised on crafted frames in
# tests/test_rowops.py.
# --------------------------------------------------------------------------
@register(
    "null_drop_any",
    oracle=f"""
    SELECT COUNT(*) AS n_rows, {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
    """,
    tags=("nulls",),
)
def null_drop_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").na.drop(how="any", subset=["l_quantity", "l_discount"])
    return li.agg(F.count("*").alias("n_rows"), dsum("l_quantity").alias("sum_qty"))


# --------------------------------------------------------------------------
# Star join + aggregate: orders -> customer -> nation -> region.
# nation/region are broadcast explicitly (tiny dims); customer joins are
# left to AQE which converts to broadcast under the threshold.
# Generalizes reference J1 (project-co2.py:146-147) into Spark.
# --------------------------------------------------------------------------
@register(
    "region_revenue",
    oracle=f"""
    SELECT r.r_name,
           COUNT(*) AS n_orders,
           {sql_dsum('o.o_totalprice')} AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
    tags=("join", "agg"),
)
def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    cust_dim = customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey).join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    return (
        orders.join(cust_dim, orders.o_custkey == cust_dim.c_custkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("revenue"))
        .orderBy("r_name")
    )


# --------------------------------------------------------------------------
# Fact-fact join (orders x lineitem on orderkey) + aggregate with a
# distinct count.  At scale this is the shuffle-heavy join; both sides
# hash-partition on the key once and the aggregation reuses it.
# --------------------------------------------------------------------------
@register(
    "priority_revenue",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           COUNT(DISTINCT o.o_orderkey) AS n_orders,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    tags=("join", "agg"),
)
def priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r9 shape at scale: lineitem pre-aggregates per order BEFORE the
    join, so (a) the countDistinct(o_orderkey) disappears -- each order
    surfaces exactly once, so n_orders is a plain count and the Expand
    + near-unique-key partial agg (2.25 GiB spill at sf10) never
    exists -- and (b) the orders join probes one row per order instead
    of one per line.  The per-order revenue sums quantized fx units
    (longs), so the two-level sum equals dsum's single-level sum
    exactly (associative by construction).  Small inputs keep the
    stock one-pass join+agg (None-means-stock gate)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    n = _distinct_agg_partitions(spark, sf_dir)
    if n is None:
        return (
            orders.join(li, orders.o_orderkey == li.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_lines"),
                F.countDistinct("o_orderkey").alias("n_orders"),
                dsum(revenue).alias("revenue"),
            )
            .orderBy("o_orderpriority")
        )
    per_order = (
        li.select("l_orderkey", fx(revenue).alias("__rfx"))
        .repartition(n, "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("__nl"), F.sum("__rfx").alias("__r"))
    )
    return (
        orders.select("o_orderkey", "o_orderpriority")
        .repartition(n, "o_orderkey")
        .join(per_order, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.sum("__nl").alias("n_lines"),
            F.count(F.lit(1)).alias("n_orders"),
            unfx(F.sum("__r")).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Semi / anti joins (EXISTS / NOT EXISTS).  The reference has no Spark
# join at all; these are the standard variants SURVEY.md section 2.3
# commits to exposing.
# --------------------------------------------------------------------------
@register(
    "semi_join_segments",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("join",),
)
def semi_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    f_orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        customer.join(f_orders, customer.c_custkey == f_orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@register(
    "anti_join_no_urgent",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
    tags=("join",),
)
def anti_join_no_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# Left outer join preserving the left side (reference J1 semantics:
# pandas left join keeps the world dim, unmatched -> null).
# --------------------------------------------------------------------------
@register(
    "customer_order_counts",
    oracle=f"""
    SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS n_orders,
           {sql_dsum('COALESCE(o.o_totalprice, 0)')} AS spent
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
    tags=("join", "agg"),
)
def customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))).alias("spent"),
        )
    )


# --------------------------------------------------------------------------
# Window functions (SURVEY.md section 2.7 -- absent in the reference,
# exposed by the engine): top-k per group via row_number.
# --------------------------------------------------------------------------
@register(
    "top_customers_per_segment",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rn
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    )
    WHERE rn <= 3
    ORDER BY c_mktsegment, rn
    """,
    tags=("window",),
)
def top_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        _t(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    )


@register(
    "supplier_rank_in_nation",
    oracle="""
    SELECT s_nationkey, s_suppkey, s_acctbal,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           LAG(s_acctbal) OVER w AS prev_bal,
           LEAD(s_acctbal) OVER w AS next_bal
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    ORDER BY s_nationkey, rnk, s_suppkey
    """,
    tags=("window",),
)
def supplier_rank_in_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        _t(spark, sf_dir, "supplier")
        .select(
            "s_nationkey",
            "s_suppkey",
            "s_acctbal",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.lag("s_acctbal").over(w).alias("prev_bal"),
            F.lead("s_acctbal").over(w).alias("next_bal"),
        )
        .orderBy("s_nationkey", "rnk", "s_suppkey")
    )


# --------------------------------------------------------------------------
# Running (cumulative) sum with a fully deterministic frame order; the
# fixed-point accumulator keeps per-row prefix sums bit-stable.
# --------------------------------------------------------------------------
@register(
    "running_supplier_qty",
    oracle=f"""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM({sql_fx('l_quantity', 2)}) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 1e2 AS running_qty
    FROM lineitem
    """,
    tags=("window",),
)
def running_supplier_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        # l_quantity completes the order: the synthetic fixture has
        # duplicate (l_orderkey, l_linenumber) pairs, and a prefix sum is
        # only multiset-deterministic when tied rows contribute equally
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    li = _t(spark, sf_dir, "lineitem")
    # size the window's exchange for the corpus: at the session default
    # each task sorts rows/32 (1.9M rows -> 2.75 GiB spilled at sf10);
    # an explicit supplier-keyed repartition satisfies the window's
    # required distribution (no second exchange) with per-task sort
    # state that fits memory.  None-means-stock at small inputs.
    n = _distinct_agg_partitions(spark, sf_dir)
    if n is not None:
        li = li.repartition(n, "l_suppkey")
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        unfx(F.sum(fx("l_quantity", 2)).over(w), 2).alias("running_qty"),
    )


# --------------------------------------------------------------------------
# Rollup / cube (SURVEY.md section 2.4: absent in reference, built into
# Spark, exposed for surface completeness).
# --------------------------------------------------------------------------
@register(
    "rollup_flag_status",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n"))
    )


@register(
    "cube_flag_status",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# Distinct aggregates (exact).  The approximate variant
# (approx_count_distinct) is registered separately as rows-only since an
# HLL sketch can't hash-match an exact oracle.
# --------------------------------------------------------------------------
@register(
    "distinct_parts_per_flag",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg",),
)
def distinct_parts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column distinct counts, spill-free at scale.

    NOT the stock ``countDistinct(a), countDistinct(b)`` form: Spark
    plans that as Expand (3x row duplication) + a map-side partial
    aggregate whose hash table keys on the HIGH-CARDINALITY distinct
    columns -- at sf10 (60M rows) that partial agg finds almost
    nothing to combine and spills 9.2 GiB while writing only 407 MiB
    of shuffle (measured, VERDICT r8 #4).  Instead each distinct
    column gets an explicit repartition on (flag, key) followed by a
    co-located two-step rollup: the shuffle carries raw pairs
    (866 MiB -- ~2x the bytes) but the aggregation happens once,
    post-exchange, over ~rows/partitions keys per task: 0 spill and
    ~2x faster wall (12-17 -> 5.5-8.4 s).  The partition count scales
    with input bytes (``_distinct_agg_partitions``), the same sizing
    discipline as the substring family's ``agg_partitions`` -- and
    like that family, ``None`` (small input) keeps the stock plan,
    which wins while the distinct-key state fits task memory."""
    n = _distinct_agg_partitions(spark, sf_dir)
    li = _t(spark, sf_dir, "lineitem")
    if n is None:
        return (
            li.groupBy("l_returnflag")
            .agg(
                F.countDistinct("l_partkey").alias("n_parts"),
                F.countDistinct("l_suppkey").alias("n_supps"),
                F.count("*").alias("n_lines"),
            )
            .orderBy("l_returnflag")
        )
    return _distinct_per_flag_repartitioned(li, n)


def _distinct_per_flag_repartitioned(li: DataFrame, n: int) -> DataFrame:
    """The scale branch of ``distinct_parts_per_flag``, extracted so
    NULL-key semantics are unit-testable on synthetic data (the byte
    gate keeps fixture-scale oracles on the stock plan).  The outer
    rollups count NON-NULL group keys only -- the inner groupBy keeps a
    NULL l_partkey/l_suppkey as a group, but COUNT(DISTINCT) (and the
    DuckDB oracle) excludes NULLs, so ``F.count(key)`` rather than
    ``F.count(lit(1))`` over the group rows; ``n_lines`` still sums
    every row including NULL-key ones."""
    parts = (
        li.select("l_returnflag", "l_partkey")
        .repartition(n, "l_returnflag", "l_partkey")
        .groupBy("l_returnflag", "l_partkey")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("l_returnflag")
        .agg(
            F.count("l_partkey").alias("n_parts"),
            F.sum("_c").alias("n_lines"),
        )
    )
    supps = (
        li.select("l_returnflag", "l_suppkey")
        .repartition(n, "l_returnflag", "l_suppkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count("l_suppkey").alias("n_supps"))
    )
    return (
        parts.join(supps, "l_returnflag")
        .select("l_returnflag", "n_parts", "n_supps", "n_lines")
        .orderBy("l_returnflag")
    )


@register("approx_distinct_parts", oracle=None, tags=("agg", "approx"))
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++): sketch-based, so rows-only check;
    tests assert relative error < 5% against the exact count."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey").alias("approx_parts"))
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Set operations (SURVEY.md section 2.6).
# --------------------------------------------------------------------------
@register(
    "set_intersect_urgent_low",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    ORDER BY o_custkey
    """,
    tags=("setop",),
)
def set_intersect_urgent_low(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return urgent.intersect(low).orderBy("o_custkey")


@register(
    "set_intersect_all_custkeys",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    ORDER BY o_custkey
    """,
    tags=("setop",),
)
def set_intersect_all_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics intersection: a custkey with 3 urgent and 2 low
    orders appears min(3,2)=2 times."""
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return urgent.intersectAll(low).orderBy("o_custkey")


@register(
    "set_except_urgent_low",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    ORDER BY o_custkey
    """,
    tags=("setop",),
)
def set_except_urgent_low(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return urgent.subtract(low).orderBy("o_custkey")  # EXCEPT = set semantics


@register(
    "set_union_keys",
    oracle="""
    SELECT DISTINCT k FROM (
      SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'P'
      UNION ALL
      SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0
    )
    ORDER BY k
    """,
    tags=("setop",),
)
def set_union_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    a = orders.filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("k"))
    b = customer.filter(F.col("c_acctbal") < 0).select(F.col("c_custkey").alias("k"))
    return a.unionByName(b).distinct().orderBy("k")


# --------------------------------------------------------------------------
# Conditional aggregation in one pass (reference A4: the split-sum the
# reference expresses as two filter+agg passes, project-co2.py:218-220).
# --------------------------------------------------------------------------
@register(
    "conditional_agg_status",
    oracle=f"""
    SELECT o_orderpriority,
           {sql_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END")} AS sum_f,
           {sql_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END")} AS sum_o,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("agg",),
)
def conditional_agg_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            dsum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(0.0)).alias("sum_f"),
            dsum(F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice")).otherwise(0.0)).alias("sum_o"),
            F.count(F.when(F.col("o_orderstatus") == "P", F.lit(1))).alias("n_p"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# HAVING (post-aggregation filter).
# --------------------------------------------------------------------------
@register(
    "having_hot_parts",
    oracle=f"""
    SELECT l_partkey, {sql_dsum('l_quantity')} AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY l_partkey
    HAVING {sql_dsum('l_quantity')} > 800
    ORDER BY l_partkey
    """,
    tags=("agg",),
)
def having_hot_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n"))
        .filter(F.col("sum_qty") > 800)
        .orderBy("l_partkey")
    )


# --------------------------------------------------------------------------
# Scalar subquery: customers above the global average balance.  The
# average is computed exactly (decimal sum / count) so the comparison
# boundary is identical in both engines, then broadcast to the filter.
# --------------------------------------------------------------------------
@register(
    "above_avg_balance",
    oracle=f"""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT {sql_davg('c_acctbal')} FROM customer)
    ORDER BY c_custkey
    """,
    tags=("subquery",),
)
def above_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    avg_df = customer.agg(davg("c_acctbal").alias("avg_bal"))
    return (
        customer.crossJoin(F.broadcast(avg_df))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# Scalar string functions (SURVEY.md section 2.8 -- engine exposes the
# standard library the reference never needed).
# --------------------------------------------------------------------------
@register(
    "part_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           CAST(LENGTH(p_name) AS BIGINT) AS name_len,
           SUBSTR(p_name, 1, 5) AS prefix5,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           REPLACE(p_name, ' ', '_') AS snake,
           CAST(LEN(STRING_SPLIT(p_name, ' ')) AS BIGINT) AS n_tokens
    FROM part
    ORDER BY p_partkey
    """,
    tags=("scalar",),
)
def part_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.length("p_name").cast("long").alias("name_len"),
            F.substring("p_name", 1, 5).alias("prefix5"),
            F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
            F.regexp_replace("p_name", " ", "_").alias("snake"),
            F.size(F.split(F.col("p_name"), " ")).cast("long").alias("n_tokens"),
        )
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# Date/time functions over the orders timeline.  Timestamp-derived
# outputs are cast to strings (session TZ pinned UTC) for engine-neutral
# comparison.
# --------------------------------------------------------------------------
@register(
    "order_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
           CAST(MONTH(o_orderdate) AS BIGINT) AS mth,
           STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS order_month,
           CAST(DATE_DIFF('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since
    FROM orders
    ORDER BY o_orderkey
    """,
    tags=("scalar", "datetime"),
)
def order_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mth"),
            F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias("order_month"),
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
            .cast("long")
            .alias("days_since"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# JSON extraction from the events props payload.
# --------------------------------------------------------------------------
@register(
    "events_json_extract",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
           {sql_davg('value')} AS avg_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("json", "agg"),
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
            davg("value").alias("avg_value"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Schema-on-read JSON: from_json with an explicit struct schema (typed
# extraction in one parse, vs get_json_object's per-path re-parse --
# the right call when several fields come out of the same payload).
# --------------------------------------------------------------------------
@register(
    "events_json_typed",
    oracle="""
    SELECT event_id,
           CAST(JSON_EXTRACT(props, '$.k') AS BIGINT) AS k_typed,
           CAST(JSON_VALID(props) AS BOOLEAN) AS parsed_ok
    FROM events
    ORDER BY event_id
    """,
    tags=("json",),
)
def events_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = F.from_json("props", "k bigint")
    return (
        _t(spark, sf_dir, "events")
        .select(
            "event_id",
            parsed.getField("k").alias("k_typed"),
            parsed.isNotNull().alias("parsed_ok"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Semi-structured VARIANT path (Spark 4): parse once into the binary
# variant encoding, extract typed fields with variant_get.  Unlike
# from_json this needs no up-front schema and keeps the full document
# queryable -- the modern lake pattern for heterogeneous JSON at scale
# (parse cost is paid once per row, extraction is a cheap binary walk).
# --------------------------------------------------------------------------
@register(
    "events_variant_extract",
    oracle=f"""
    SELECT CAST(JSON_EXTRACT(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("json", "variant", "agg"),
)
def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = F.parse_json("props")
    return (
        _t(spark, sf_dir, "events")
        .select((F.try_variant_get(v, "$.k", "bigint") % 10).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .orderBy("k_bucket")
    )


# --------------------------------------------------------------------------
# Batch tumbling-window aggregation over the event stream table (the
# streaming module runs the same logic incrementally with a watermark).
# --------------------------------------------------------------------------
@register(
    "events_hourly_counts",
    oracle=f"""
    SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type,
           COUNT(*) AS n,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("datetime", "agg"),
)
def events_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .orderBy("hour_start", "event_type")
    )


# --------------------------------------------------------------------------
# Time-series gap-fill (hypertable-rollup shape): aggregate a sparse
# event slice to hourly grain, then left-join it onto a generated hour
# spine so empty hours surface as zero rows.  The spine derives from a
# scalar min/max aggregate and sequence()+explode -- at 100 TB the big
# side is reduced FIRST (partial+final hash agg), and the spine join
# touches only the tiny post-agg result, so the fill step is O(hours).
# --------------------------------------------------------------------------
@register(
    "events_hourly_gapfill",
    oracle=f"""
    WITH f AS (
      SELECT date_trunc('hour', ts) AS h, value FROM events
      WHERE event_type = 'purchase' AND value > 250
    ),
    b AS (
      SELECT h, COUNT(*) AS n, {sql_dsum('value')} AS sum_value
      FROM f GROUP BY h
    ),
    s AS (
      SELECT UNNEST(generate_series((SELECT MIN(h) FROM b),
                                    (SELECT MAX(h) FROM b),
                                    INTERVAL 1 HOUR)) AS h
    )
    SELECT STRFTIME(s.h, '%Y-%m-%d %H:%M:%S') AS hour_start,
           COALESCE(b.n, 0) AS n,
           COALESCE(b.sum_value, 0.0) AS sum_value
    FROM s LEFT JOIN b ON s.h = b.h
    ORDER BY 1
    """,
    tags=("datetime", "agg", "gapfill"),
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = (
        _t(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & (F.col("value") > 250))
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
    )
    spine = (
        hourly.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("h")
        )
    )
    return (
        spine.join(hourly, "h", "left")
        .select(
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
        .orderBy("hour_start")
    )


# --------------------------------------------------------------------------
# Sessionization: gap > 30 min starts a new session (lag + cumulative
# flag sum -- the batch shape; streaming uses session_window).
# --------------------------------------------------------------------------
@register(
    "user_session_counts",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, SUM(new_session) AS n_sessions
    FROM gaps GROUP BY user_id ORDER BY user_id
    """,
    tags=("window", "datetime"),
)
def user_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    events = _t(spark, sf_dir, "events")
    # full microsecond precision: cast('long') truncates to whole
    # seconds, and a sub-second-offset gap straddling the 1800 s
    # boundary would then disagree with the oracle's exact INTERVAL
    # comparison (and the session_window streaming parity).  Native
    # timestamp subtraction yields a DayTimeInterval -- exact micros,
    # and works for both TIMESTAMP and TIMESTAMP_NTZ inputs (the
    # fixture's micros encoding surfaces as NTZ; unix_micros rejects it)
    gap = F.col("ts") - F.lag("ts").over(w)
    flagged = events.select(
        "user_id",
        F.when(
            F.lag("ts").over(w).isNull() | (gap > F.expr("INTERVAL 30 MINUTES")), 1
        )
        .otherwise(0)
        .alias("new_session"),
    )
    return (
        flagged.groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"))
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Pivot / unpivot (SURVEY.md section 2: wide<->long reshaping, the shape
# of the reference's year-as-columns source table).
# --------------------------------------------------------------------------
@register(
    "pivot_status_qty",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END")} AS F,
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END")} AS O
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("pivot",),
)
def pivot_status_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.coalesce(dsum("l_quantity"), F.lit(0.0)))
        .orderBy("l_returnflag")
    )


@register(
    "unpivot_part_attrs",
    oracle="""
    SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val FROM part
    ORDER BY p_partkey, attr
    """,
    tags=("pivot",),
)
def unpivot_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "part")
        .selectExpr(
            "p_partkey",
            "stack(2, 'size', CAST(p_size AS DOUBLE), 'retailprice', p_retailprice) AS (attr, val)",
        )
        .orderBy("p_partkey", "attr")
    )


# --------------------------------------------------------------------------
# Seeded Bernoulli sample (reference R1, project-co2.py:48).  The exact
# row set is partition-dependent by design (documented in SURVEY.md), so
# the check is rows-only; tests assert the statistical envelope.
# --------------------------------------------------------------------------
@register("sample_lineitem", oracle=None, tags=("sample",))
def sample_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .sample(withReplacement=False, fraction=0.1, seed=42)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


def _sample_det_oracle() -> str:
    from ..operators.sampling import sql_portable_uniform

    u = sql_portable_uniform("CAST(l_orderkey AS BIGINT) * 8 + l_linenumber", seed=42)
    return f"""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE {u} <= 0.1e0
    """


@register("sample_lineitem_det", oracle=_sample_det_oracle(), tags=("sample",))
def sample_lineitem_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic twin of sample_lineitem (VERDICT r9 #4): the
    hash-threshold Bernoulli sampler (operators/sampling.py
    hash_threshold_sample -- portable Lehmer-LCG uniform on the packed
    (orderkey, linenumber) row key) draws the SAME 10% row set on any
    partitioning, any cluster size, any engine, so the full sample
    manifest is value-verified by an exact SQL replay -- unlike the
    stock per-partition-RNG sample, which is rows-only by contract.
    linenumber is 1..7 (TPC-H), so ``l_orderkey * 8 + l_linenumber``
    is collision-free in exact BIGINT arithmetic.

    No sort: the manifest is corpus-sized (10% of lineitem) and the
    correctness contract compares order-insensitively -- a cosmetic
    global orderBy would add a range-partitioner SAMPLING pass that
    re-reads the whole input (the profiler's whole-action attribution
    made that visible: 2x scan rows) plus a corpus-scale exchange."""
    from ..operators.sampling import hash_threshold_sample

    li = _t(spark, sf_dir, "lineitem")
    key = F.col("l_orderkey").cast("long") * 8 + F.col("l_linenumber")
    return hash_threshold_sample(li, 0.1, key, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register("approx_distinct_calibration", oracle=None, tags=("agg", "approx", "metric"))
def approx_distinct_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ error surfaced AS DATA: exact distinct, approx
    distinct (rsd=0.05), and the relative error per group, so sketch
    accuracy is tracked round over round (and floor-asserted in tests).
    Sketch values are engine-specific -> rows-only."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_nd"),
            F.approx_count_distinct("l_partkey", 0.05).alias("approx_nd"),
        )
        .select(
            "l_returnflag",
            "exact_nd",
            "approx_nd",
            F.round(F.abs(F.col("approx_nd") - F.col("exact_nd")) / F.col("exact_nd"), 6).alias(
                "rel_error"
            ),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Product-analytics shapes over events: ordered funnel + retention
# cohorts.  Both are pure join/agg compositions (no new operator) but
# pin the ORDERED-progression and cohort-bucket semantics that ad-hoc
# SQL gets subtly wrong (a funnel stage must happen AFTER the previous
# stage's first occurrence, not merely co-exist).
# --------------------------------------------------------------------------
@register(
    "event_funnel_counts",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM s1) AS n_view,
           (SELECT COUNT(*) FROM s2) AS n_view_click,
           (SELECT COUNT(*) FROM s3) AS n_view_click_purchase
    """,
    tags=("funnel", "datetime", "agg"),
)
def event_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered 3-stage funnel (view -> click -> purchase):
    each stage counts users whose stage event happened AFTER their
    first previous-stage event.  Three key-shuffled aggregates, each
    over a shrinking user set."""
    ev = _t(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count("*").alias("n_view"))
        .join(s2.agg(F.count("*").alias("n_view_click")))
        .join(s3.agg(F.count("*").alias("n_view_click_purchase")))
    )


@register(
    "weekly_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
    )
    SELECT STRFTIME(f.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST((epoch(a.week) - epoch(f.cohort_week)) / 604800 AS BIGINT)
             AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_active
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("cohort", "datetime", "agg"),
)
def weekly_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week,
    counted as active per subsequent week offset.  Two aggregates +
    one user-keyed join; the matrix is |cohorts| x |weeks| rows."""
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            # cast("timestamp") first: a micros-encoded fixture surfaces
            # ts as TIMESTAMP_NTZ, which unix_timestamp rejects; the cast
            # is a no-op under the pinned-UTC session (see read_events)
            (
                (
                    F.unix_timestamp(F.col("week").cast("timestamp"))
                    - F.unix_timestamp(F.col("cohort_week").cast("timestamp"))
                ) / 604800
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )
