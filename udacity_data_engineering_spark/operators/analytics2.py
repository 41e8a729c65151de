"""TPC-H depth batch 2 — the remaining classic analytic shapes, adapted
to the driver testdata (no ``partsupp`` table; lineitem carries no
shipmode/commitdate/receiptdate, so those predicates are re-expressed
over the columns that exist, keeping each query's *plan shape* intact).

Shapes covered here (reference analog: the single star join at
etl.py:164-168 generalized): single-pass range-filter aggregate (Q6),
nation-pair theta join (Q7), market-share ratio over a 7-table join
(Q8), profit rollup (Q9), outer-join histogram (Q13), scalar-subquery
top-supplier (Q15), NOT-IN distinct-count (Q16), correlated-average
filter (Q17), disjunctive multi-column predicates (Q19), EXISTS /
NOT-EXISTS self-correlation (Q21), anti-join + scalar subquery (Q22).

Scale notes: every dim that can broadcast is broadcast; fact filters
are applied before joins so pushdown reaches the scan; the only
unavoidable shuffles are the aggregate boundaries and the lineitem
self-correlations (Q17/Q21), which shuffle on the natural key
(l_partkey / l_orderkey) once and reuse it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


def _rev() -> Column:
    # lazily built: module-level Columns would need a JVM at import time
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q_forecast_revenue",
    oracle="""
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: single-table range-predicate aggregate — the "
    "pure scan-throughput query. All three predicates push into the "
    "parquet scan (row-group min/max pruning at scale); the aggregate "
    "is a one-row partial+final, no shuffle of data rows at all.",
    tags=("analytics", "E1"),
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q_volume_shipping",
    oracle="""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INT) AS l_year,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1995-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY n1.n_name, n2.n_name, CAST(year(l.l_shipdate) AS INT)
    """,
    doc="TPC-H Q7 shape: bilateral trade volume between a nation pair — "
    "a 6-table join whose cross-table disjunction ((n1,n2) in either "
    "order) cannot be pushed into any single scan, so it runs as a "
    "post-join filter over two broadcast nation copies. Year extraction "
    "feeds the grouping; DuckDB year() is BIGINT, cast to Spark's INT.",
    tags=("analytics",),
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    nat = table(spark, sf_dir, "nation")
    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


@register(
    "q_market_share",
    oracle="""
        SELECT o_year,
               round(sum(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END)
                     / sum(volume), 4) AS mkt_share
        FROM (
            SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
                   l.l_extendedprice * (1 - l.l_discount) AS volume,
                   n2.n_name AS nation
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n1.n_regionkey
            JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
            WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
        ) all_nations
        GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: one nation's market share of a part type "
    "within a region, per order year — an 8-table snowflake where the "
    "numerator is a conditional aggregate over the same rows as the "
    "denominator (one pass, no self-join). Region/nation/part/supplier "
    "all broadcast; the fact shuffles once for the group-by.",
    tags=("analytics",),
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    nat = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vol = _rev().alias("volume")
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("n1_key") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n1_region"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("s_nationkey"))
        .select(F.year("o_orderdate").alias("o_year"), vol, "nation")
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
    )


@register(
    "q_product_profit",
    oracle="""
        SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
               round(sum(l.l_extendedprice * (1 - l.l_discount)
                         - 0.5 * p.p_retailprice * l.l_quantity), 2) AS profit
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE p.p_type = 'STANDARD'
        GROUP BY n.n_name, CAST(year(o.o_orderdate) AS INT)
    """,
    doc="TPC-H Q9 shape: profit per supplier nation per year. The "
    "reference schema has no partsupp, so supply cost is proxied as "
    "0.5*p_retailprice*l_quantity — same expression tree (two-table "
    "arithmetic inside a sum), same join/aggregate shape as Q9.",
    tags=("analytics",),
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    profit = _rev() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), n.n_nationkey == F.col("s_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).alias("profit"))
    )


@register(
    "q_cust_order_distribution",
    oracle="""
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM (
            SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
            FROM customer c
            LEFT OUTER JOIN orders o
              ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        ) c_orders
        GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: distribution of customers by order count — a "
    "left outer join (customers with zero orders must survive as "
    "c_count=0) feeding two stacked aggregations. count(o_orderkey) "
    "counts only matched rows, the outer-join-aware idiom; the second "
    "group-by is tiny (distinct counts), so its shuffle is negligible.",
    tags=("analytics", "E7"),
)
def q_cust_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q_top_supplier",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s
        JOIN revenue r ON r.supplier_no = s.s_suppkey
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 shape: the quarter's top-revenue supplier — a CTE "
    "aggregate reused twice (once as join input, once under max()). "
    "Spark evaluates the scalar max as a one-row subquery broadcast "
    "into the filter; the revenue aggregate is computed per use (at "
    "scale, .cache() it — noted, not done, to keep the plan declarative).",
    tags=("analytics", "E1"),
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(_rev()), 2).alias("total_revenue"))
    )
    s = table(spark, sf_dir, "supplier")
    top = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        s.join(revenue, revenue.supplier_no == s.s_suppkey)
        .join(F.broadcast(top), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q_parts_supplier_cnt",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
          AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                  WHERE s_acctbal < 0)
        GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape: distinct suppliers per part class, excluding "
    "flagged suppliers via NOT IN (null-safe here: s_suppkey is a "
    "non-null key, so the anti-join rewrite is exact). The reference "
    "schema has no partsupp/s_comment, so lineitem supplies the "
    "part-supplier pairs and a negative account balance is the flag.",
    tags=("analytics", "E2", "E7"),
)
def q_parts_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q_small_qty_revenue",
    oracle="""
        SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN (SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg
              FROM lineitem GROUP BY l_partkey) t
          ON t.l_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#3' AND l.l_quantity < t.half_avg
    """,
    doc="TPC-H Q17 shape: revenue lost by banning small-quantity orders "
    "— each lineitem compared against half the average quantity of its "
    "own part. Written as an explicit pre-aggregated self-join (the "
    "decorrelation Catalyst would produce from the correlated scalar "
    "subquery), shuffling lineitem once on l_partkey for both sides.",
    tags=("analytics", "E1"),
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    half_avg = (
        l.groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg((0.5 * F.avg("l_quantity")).alias("half_avg"))
    )
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .join(half_avg, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q_disjunctive_pred",
    oracle="""
        SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 20)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
               AND l.l_quantity BETWEEN 10 AND 30)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
               AND l.l_quantity BETWEEN 20 AND 40)
    """,
    doc="TPC-H Q19 shape: disjunction of conjunctive predicates "
    "spanning both join sides. Catalyst factors the single-table parts "
    "of the OR into scan-level filters (brand IN (...) on part, "
    "quantity range on lineitem) and evaluates the full disjunction "
    "post-join — the standard OR-decomposition test.",
    tags=("analytics",),
)
def q_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .filter(cond)
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


@register(
    "q_waiting_suppliers",
    oracle="""
        SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND n.n_name = 'NATION_1'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 20
    """,
    doc="TPC-H Q21 shape: the sole-blamed supplier — EXISTS plus "
    "NOT EXISTS, both correlated on the same key with an inequality on "
    "another column. The returnflag='R' line stands in for the "
    "missing receiptdate>commitdate delay predicate; the correlation "
    "structure (multi-supplier order, no other supplier also flagged) "
    "is Q21's verbatim. Runs as identical SQL on both engines — "
    "Catalyst plans the EXISTS as left-semi and the NOT EXISTS as "
    "left-anti over one l_orderkey-shuffled lineitem.",
    tags=("analytics", "E7"),
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = table(spark, sf_dir, "lineitem")
    l1 = l.filter(F.col("l_returnflag") == "R")
    others = l.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    flagged_others = l.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    base = (
        l1.join(F.broadcast(s), s.s_suppkey == l1.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == F.col("s_nationkey"))
        .join(o, o.o_orderkey == F.col("l_orderkey"), "left_semi")
    )
    with_other = base.join(
        others,
        (F.col("x_orderkey") == F.col("l_orderkey"))
        & (F.col("x_suppkey") != F.col("l_suppkey")),
        "left_semi",
    )
    sole_blame = with_other.join(
        flagged_others,
        (F.col("x_orderkey") == F.col("l_orderkey"))
        & (F.col("x_suppkey") != F.col("l_suppkey")),
        "left_anti",
    )
    return (
        sole_blame.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


@register(
    "q_idle_customers",
    oracle="""
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer c
        WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer
                             WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c_mktsegment
    """,
    doc="TPC-H Q22 shape: wealthy customers with no recent order — an "
    "uncorrelated scalar subquery (broadcast once as a literal filter) "
    "plus a NOT EXISTS anti-join, grouped by segment (standing in for "
    "the phone country code the schema lacks). The anti-join needs "
    "only orders' o_custkey column — column pruning makes the probe "
    "side a single-int scan.",
    tags=("analytics", "E7"),
)
def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, o.o_custkey == c.c_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
