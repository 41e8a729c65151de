"""Multi-join analytical pipelines — TPC-H-shaped depth queries.

The reference's single star join (etl.py:164-168) generalizes to these
classic shapes: selective fact filter -> multi-dim join -> aggregate ->
top-k. They exercise join ordering, broadcast selection and partial
aggregation together; at 100 TB these are the plans where Catalyst's
choices matter most (dims broadcast, fact never shuffles before the
filter, aggregate is partial+final around the single required shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


def _revenue() -> Column:
    # built lazily: module-level Column objects would require a live JVM
    # at import time, which breaks Python workers re-importing this
    # package inside Pandas-UDF tasks
    return F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))


@register(
    "q_shipping_priority",
    oracle="""
        SELECT l.l_orderkey,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               o.o_orderdate
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
          AND l.l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
    """,
    doc="TPC-H Q3 shape: selective dim filter + 3-way join + grouped "
    "revenue + top-10. The segment filter prunes customer before the "
    "join; TakeOrderedAndProject caps the result without a global sort.",
    tags=("analytics",),
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(_revenue(), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


_LOCAL_SUPPLIER_SQL = """
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
"""


@register(
    "q_local_supplier_volume",
    oracle=_LOCAL_SUPPLIER_SQL,
    doc="TPC-H Q5 shape: 6-table snowflake join with a cross-dimension "
    "equality (supplier nation == customer nation) and a region filter "
    "that prunes the whole tree. Identical SQL text on both engines.",
    tags=("analytics",),
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    for name in ("region", "nation", "customer", "orders", "lineitem", "supplier"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_LOCAL_SUPPLIER_SQL)


@register(
    "q_returned_items",
    oracle="""
        SELECT c.c_custkey, c.c_name, n.n_name AS nation,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue per customer, 4-way "
    "join + aggregate + top-20. The returnflag filter is pushed into "
    "the lineitem scan.",
    tags=("analytics",),
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.round(_revenue(), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q_order_priority",
    oracle="""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > TIMESTAMP '1997-06-01')
        GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: order counts per priority for orders with at "
    "least one late-shipped line. The correlated EXISTS plans as a "
    "left-semi join (never duplicates orders, never materializes the "
    "match), with the date filters pushed into both scans.",
    tags=("analytics", "E7"),
)
def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    late = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-06-01")
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q_promo_revenue",
    oracle="""
        SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                      THEN l.l_extendedprice * (1 - l.l_discount)
                                      ELSE 0 END)
                     / sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                   AS promo_pct
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-02-01'
    """,
    doc="TPC-H Q14 shape: promo revenue share for one ship month — a "
    "fact ⋈ broadcast-dim join feeding a single conditional-aggregate "
    "ratio. The month predicate prunes lineitem before the join; part "
    "is explicitly broadcast so the fact never shuffles.",
    tags=("analytics",),
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-02-01")
    )
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_pct")
        )
    )


@register(
    "q_large_orders",
    oracle="""
        SELECT c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
               round(sum(l.l_quantity), 2) AS total_qty
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                               GROUP BY l_orderkey
                               HAVING sum(l_quantity) > 200)
        GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 20
    """,
    doc="TPC-H Q18 shape: large-quantity orders — an IN-subquery over a "
    "grouped HAVING feeding a 3-way join + re-aggregation + top-20. "
    "Catalyst rewrites the IN to a left-semi join against the "
    "pre-aggregated keys; only qualifying orders reach the wide join.",
    tags=("analytics", "E1"),
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 200)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "big_key"),
               F.col("o_orderkey") == F.col("big_key"), "left_semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )
