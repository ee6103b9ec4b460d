"""The remaining TPC-H query archetypes (Q2/Q4/Q6-Q9/Q11-Q17/Q19/Q20/
Q22), adapted to the fixture schema, completing the 22-archetype suite
(Q1 = ``pricing_summary``; Q3/Q5/Q10/Q18/Q21 live in
``tpch_shapes.py``).

The fixture has no ``partsupp`` table and lacks
``l_shipmode``/``l_commitdate``/``l_receiptdate``, ``p_container``,
``c_phone`` -- queries that reference those are ADAPTED, preserving the
archetype (the optimizer/execution pattern that makes the query
interesting) while substituting available columns:

- Q2   min-cost-supplier  -> min-acctbal supplier among shippers of a part
- Q4   commit<receipt late flag -> shipped > 60 days after order date
- Q9   ps_supplycost profit -> retailprice-based cost model
- Q11  partsupp value -> lineitem revenue per part, same HAVING-over-
       scalar-subquery shape
- Q12  l_shipmode group -> l_linestatus group, same two-way conditional
       count
- Q16  partsupp supplier_cnt -> distinct shipping suppliers per part
       attribute group, same NOT IN exclusion
- Q20  partsupp availqty -> shipped-quantity HAVING threshold
- Q22  c_phone country code -> c_nationkey as country code

Scale posture: nation/region are broadcast explicitly; filtered
part/supplier subsets are left to AQE (they grow with SF, so a
hard-coded broadcast would be wrong at 100 TB); every grouped
aggregation keys on the natural shuffle key of its fact chain; scalar
subqueries (Q11/Q15/Q17) become one-row broadcast joins, never a
driver collect.

Determinism: every double aggregate goes through the fixed-point path
(``_exact.py``); min/max/avg-of-integral and raw-value comparisons are
exact selections identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._exact import dsum, sql_dsum
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_REVENUE_SQL = sql_dsum("l_extendedprice * (1 - l_discount)")


def _revenue() -> F.Column:
    return dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))


# -- Q2: min-cost supplier (correlated MIN subquery) ------------------------
@register(
    "q2_min_acctbal_supplier",
    oracle="""
    WITH eligible AS (
      SELECT DISTINCT l.l_partkey AS partkey,
             s.s_suppkey, s.s_acctbal, s.s_name, n.n_name
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_name
    FROM part p
    JOIN eligible e ON p.p_partkey = e.partkey
    WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
      AND e.s_acctbal = (SELECT MIN(e2.s_acctbal) FROM eligible e2
                         WHERE e2.partkey = p.p_partkey)
    ORDER BY e.s_acctbal DESC, p.p_partkey, e.s_name
    LIMIT 20
    """,
    tags=("join", "subquery", "tpch"),
)
def q2_min_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 archetype: for each qualifying part, the supplier
    minimizing a per-part correlated MIN (here s_acctbal among European
    suppliers that shipped the part; the fixture has no partsupp/
    supplycost).  The correlated subquery decorrelates into a window
    MIN over the per-part supplier set -- one shuffle on partkey, no
    re-join of the aggregate."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal", "s_name", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select("r_regionkey")
    part = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_name")
    )
    eligible = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("l_partkey", "s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    return (
        part.join(eligible, part.p_partkey == eligible.l_partkey)
        .withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.desc("s_acctbal"), F.asc("p_partkey"), F.asc("s_name"))
        .limit(20)
    )


# -- Q4: order priority checking (EXISTS -> semi join) ----------------------
@register(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    tags=("semi", "agg", "tpch"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 archetype: EXISTS correlated on the fact table becomes a
    LEFT SEMI join with an extra non-equi residual (late := shipped
    > 60 days after order date; the fixture has no commit/receipt
    dates).  Hash-semi on l_orderkey -- the probe stops at first match,
    never materializing the multiplicity."""
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.date_add(orders.o_orderdate, 60)),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# -- Q6: forecast revenue change (pure scan-filter-agg) ---------------------
@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum("l_extendedprice * l_discount")} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("filter", "agg", "tpch"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the canonical pushdown probe -- all four predicates
    must reach the parquet scan (asserted in tests/test_plans.py) and
    the plan is a single map-side partial sum + 1-row exchange."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


# -- Q7: volume shipping between two nations --------------------------------
@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_dsum("volume")} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(YEAR FROM l.l_shipdate) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg", "tpch"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bidirectional nation-pair filter over a 6-way join.
    Both nation copies broadcast; the disjunctive pair predicate is a
    residual after the dim lookups, so the fact chain still shuffles
    only on its natural keys."""
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") <= "1997-12-31")
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum("volume").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# -- Q8: national market share ----------------------------------------------
@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           {sql_dsum("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END")}
             / {sql_dsum("volume")} AS mkt_share
    FROM (
      SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'AMERICA'
        AND p.p_type = 'ECONOMY'
        AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("join", "agg", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: 8-way join + conditional-share aggregate.  The share is
    a ratio of two fixed-point sums computed in the same groupBy pass
    (identical int64 sums on both engines make the double division
    bit-exact).  Part is filtered before the join and left to AQE --
    it grows with SF, so no hard-coded broadcast."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") <= "1997-12-31")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA").select("r_regionkey")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            (
                dsum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / dsum("volume")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# -- Q9: product-type profit (adapted cost model) ---------------------------
@register(
    "q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, {sql_dsum("amount")} AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.5 * p.p_retailprice * l.l_quantity AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%gear%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("join", "agg", "tpch"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 archetype: profit per (supplier nation, order year) for
    parts matching a name pattern.  The fixture has no ps_supplycost,
    so cost := 0.5 * p_retailprice * l_quantity (same expression shape:
    a dim attribute times a fact measure).  LIKE filter prunes part
    before the join; profit has <= 4 decimal digits (prices 2dp,
    quantity integral), so scale-6 fixed point is lossless."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount", "l_quantity"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "nation",
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("amount").alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


# -- Q11: important parts (HAVING over a scalar subquery) -------------------
@register(
    "q11_important_parts",
    oracle=f"""
    SELECT l.l_partkey, {_REVENUE_SQL} AS value
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_7'
    GROUP BY l.l_partkey
    HAVING {_REVENUE_SQL} > (
      SELECT {_REVENUE_SQL} * 0.001
      FROM lineitem l2
      JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
      JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
      WHERE n2.n_name = 'NATION_7'
    )
    ORDER BY value DESC, l.l_partkey
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 archetype: per-part value with a HAVING threshold that
    is a scalar subquery over the same filtered fact (no partsupp, so
    value := lineitem revenue via NATION_7 suppliers).  The scalar
    becomes a 1-row broadcast cross join -- no driver collect, both
    sides share the identical fixed-point total so the > compare is
    bit-exact."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_7")
        .select("n_nationkey")
    )
    base = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    per_part = base.groupBy("l_partkey").agg(_revenue().alias("value"))
    total = base.agg((_revenue() * F.lit(0.001)).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", "value")
        .orderBy(F.desc("value"), F.asc("l_partkey"))
    )


# -- Q12: shipping priority split (two-way conditional count) ---------------
@register(
    "q12_late_lines_by_status",
    oracle="""
    SELECT l.l_linestatus,
           SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
    tags=("join", "agg", "tpch"),
)
def q12_late_lines_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 archetype: the two-way conditional count over a
    fact-fact join (no l_shipmode in the fixture -> group by
    l_linestatus; late := shipped > 90 days after order date).  Both
    counts come from one pass -- sum(when) -- not two scans."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01"))
        .select("l_orderkey", "l_shipdate", "l_linestatus")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# -- Q13: customer order-count distribution (double aggregation) ------------
@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "agg", "tpch"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: LEFT OUTER join with an ON-clause-only filter (the
    priority predicate must NOT drop customers -- it belongs to the
    join condition, not a WHERE), then the double aggregation:
    count-per-customer, then histogram of counts.  The second groupBy
    keys on c_count -- tiny cardinality, so the second shuffle is
    negligible at any SF."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "5-LOW")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# -- Q14: promotion effect (conditional-share over a month) -----------------
@register(
    "q14_promo_effect",
    oracle=f"""
    SELECT 100.0 * {sql_dsum(
        "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END"
    )} / {_REVENUE_SQL} AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01'
    """,
    tags=("join", "agg", "tpch"),
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percentage-of-total conditional aggregate over one
    month of shipments.  One groupBy-less pass; the ratio divides two
    fixed-point sums (bit-exact cross-engine)."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01"))
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(p, li.l_partkey == p.p_partkey).agg(
        (
            F.lit(100.0)
            * dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / dsum(rev)
        ).alias("promo_revenue")
    )


# -- Q15: top supplier (scalar MAX subquery over a derived view) ------------
@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no, {_REVENUE_SQL} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue0 r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    ORDER BY s.s_suppkey
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: derived revenue view consumed twice -- once for the
    per-supplier rows, once for the scalar MAX.  The view is computed
    once and the MAX becomes a 1-row broadcast join (ties preserved,
    per spec).  MAX over quantized doubles is an exact selection, so
    the equality compare is engine-stable."""
    rev = (
        _t(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01"))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_revenue().alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# -- Q16: supplier count by part attributes (NOT IN -> anti join) -----------
@register(
    "q16_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 15, 19, 25, 35, 45)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    tags=("join", "anti", "agg", "tpch"),
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 archetype: distinct-supplier counts per part-attribute
    group with a NOT IN exclusion list (no partsupp -> suppliers that
    shipped the part; excluded set := negative-balance suppliers,
    standing in for the complaints LIKE filter).  NOT IN over a
    provably non-null key is a LEFT ANTI join; the excluded set is tiny
    and broadcasts."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 9, 15, 19, 25, 35, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("bad_suppkey"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == F.col("bad_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# -- Q17: small-quantity-order revenue (correlated AVG subquery) ------------
@register(
    "q17_small_qty_revenue",
    oracle=f"""
    SELECT {sql_dsum("l.l_extendedprice")} / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated AVG-per-part subquery, decorrelated into a
    groupBy-partkey aggregate joined back to the fact.  Brand is a
    part attribute, so restricting the AVG input to the brand's parts
    is semantics-preserving and prunes the aggregate's input 25x.
    AVG of integral quantities is exact in double on both engines, so
    the 0.2*avg threshold compare is engine-stable."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    brand_li = li.join(p, li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_qty = brand_li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        brand_li.join(avg_qty, F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


# -- Q19: disjunctive multi-attribute join predicate ------------------------
@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {_REVENUE_SQL} AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "filter", "agg", "tpch"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: the disjunction mixes part and lineitem attributes,
    so it cannot be pushed below the join wholesale -- but each
    single-table implicant CAN: Catalyst extracts
    brand IN (...) / size <= 15 / quantity ranges to the scans while
    the full OR stays as the join residual.  The join itself remains
    a plain equi hash join on partkey."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#14") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(_revenue().alias("revenue"))
    )


# -- Q20: potential part promotion (nested IN subqueries) -------------------
@register(
    "q20_promotion_suppliers",
    oracle="""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_name LIKE 'red%'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l.l_suppkey
      HAVING SUM(l.l_quantity) > 300
    )
    AND s.s_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_name IN ('NATION_3', 'NATION_11', 'NATION_19'))
    ORDER BY s.s_name
    """,
    tags=("semi", "agg", "subquery", "tpch"),
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 archetype: two nested IN subqueries -> two LEFT SEMI
    joins (no partsupp availqty, so the inner threshold is shipped
    quantity > 300 of 'red%' parts in 1997).  The heavy subquery
    aggregates BEFORE the semi join, so the supplier probe sees one
    row per qualifying supplier.  SUM of integral quantities is exact
    on both engines."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01"))
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    heavy = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_suppkey")
    )
    nat = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_3", "NATION_11", "NATION_19"))
        .select("n_nationkey")
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(nat), s.s_nationkey == F.col("n_nationkey"), "left_semi")
        .join(heavy, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# -- Q22: global sales opportunity (anti join + scalar AVG) -----------------
@register(
    "q22_sales_opportunity",
    oracle=f"""
    WITH pool AS (
      SELECT CAST(c_nationkey AS VARCHAR) AS cntrycode, c_custkey, c_acctbal
      FROM customer
      WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    )
    SELECT cntrycode, COUNT(*) AS numcust, {sql_dsum("c_acctbal", 2)} AS totacctbal
    FROM pool c
    WHERE c.c_acctbal > (
        SELECT {sql_dsum("c_acctbal", 2)} / COUNT(*) FROM pool WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
    tags=("anti", "agg", "subquery", "tpch"),
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 archetype: customers from selected country codes
    (c_nationkey stands in for the missing c_phone prefix) with
    above-average balances and no recent orders.  The scalar AVG is a
    fixed-point sum / count broadcast as one row; NOT EXISTS is a LEFT
    ANTI join against 2.5 years of orders.  acctbal is a 2dp money
    column, so scale-2 quantization is lossless."""
    pool = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
        .select(
            F.col("c_nationkey").cast("string").alias("cntrycode"),
            "c_custkey",
            "c_acctbal",
        )
    )
    avg_bal = pool.filter(F.col("c_acctbal") > 0.0).agg(
        (dsum("c_acctbal", scale=2) / F.count(F.lit(1))).alias("avg_bal")
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "1999-01-01")
        .select("o_custkey")
    )
    return (
        pool.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, pool.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", scale=2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
