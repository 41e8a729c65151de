"""Join matrix + set operations — E6/E7 (SURVEY.md §2B).

The reference's only join is the single inner equi-join (etl.py:164-168;
covered by q_join_multikey / q_sql_entry in relational.py). This module
adds the rest of the matrix: semi / anti / outer joins and set ops.
Catalyst broadcast-hashes the dimension side under the threshold; at
100 TB the same plans become sort-merge with AQE skew splitting — nothing
here pins a strategy, so the optimizer stays free to choose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


@register(
    "q_join_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="E7: left-semi join (EXISTS) — customers with at least one order. "
    "Semi joins never duplicate the left side, so the output stays "
    "customer-sized regardless of order fan-out.",
    tags=("E7",),
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "q_join_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="E7: left-anti join (NOT EXISTS) — customers with no orders.",
    tags=("E7",),
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "q_join_outer",
    oracle="""
        SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
    doc="E7: left-outer join — order rows with nulls preserved for "
    "orderless customers.",
    tags=("E7",),
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_mktsegment", "o_orderkey", "o_totalprice"
    )


@register(
    "q_join_broadcast_agg",
    oracle="""
        SELECT n.n_name AS nation, count(*) AS n_cust,
               round(sum(c.c_acctbal), 2) AS sum_bal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    doc="E7: explicit broadcast-hint join (fact ⋈ tiny dim) + aggregate — "
    "the canonical star-join shape at scale: the 25-row nation dim ships "
    "to every executor, no shuffle of the fact side for the join.",
    tags=("E7",),
)
def q_join_broadcast_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
    )


@register(
    "q_setops",
    oracle="""
        SELECT nationkey, 'intersect' AS op FROM (
            SELECT c_nationkey AS nationkey FROM customer
            INTERSECT
            SELECT s_nationkey FROM supplier)
        UNION ALL
        SELECT nationkey, 'except' AS op FROM (
            SELECT c_nationkey AS nationkey FROM customer
            EXCEPT
            SELECT s_nationkey FROM supplier)
    """,
    doc="E6: set operations — INTERSECT and EXCEPT of two key projections, "
    "tagged and unioned into one result.",
    tags=("E6",),
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    both = c.intersect(s).withColumn("op", F.lit("intersect"))
    only_c = c.distinct().exceptAll(s.distinct()).withColumn("op", F.lit("except"))
    return both.unionByName(only_c)
