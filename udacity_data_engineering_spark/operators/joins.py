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


def bloom_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "inner",
    m_bits: int = 1 << 19,
    k: int = 5,
) -> DataFrame:
    """Bloom-prefiltered equi-join — the classic shuffle-reduction lever
    for fact ⋈ selective-dim joins where the dim is too big to broadcast
    but its KEY SET compresses into an m-bit bitmap (the runtime-filter
    idea Spark applies to DPP, made an explicit operator): build a Bloom
    bitmap of the dim's join keys distributed-side (bit_or over 64-bit
    words, ≤ m/64 rows regardless of key count, contamination.py:126),
    prefilter the fact MAP-SIDE with all k bit probes in one filter
    expression (zero false negatives — a dropped fact row provably has
    no dim partner), then run the exact join on the survivors. At 100 TB
    the win is the shuffle: only the surviving fraction of the fact
    (true matches + the filter's fp rate) is exchanged, instead of every
    fact row. The result is BIT-IDENTICAL to the plain join — false
    positives are eliminated by the exact join itself. ``how`` must be a
    match-only join type (inner/left_semi): preserving types (outer/
    anti) would need the dropped rows the prefilter exists to drop."""
    if how not in ("inner", "left_semi", "semi", "leftsemi"):
        raise ValueError(
            f"bloom_join supports match-only join types, got {how!r}: an "
            "outer/anti join needs exactly the rows the prefilter drops"
        )
    from udacity_data_engineering_spark.operators.contamination import (
        bloom_prefilter,
        build_shingle_bloom,
    )

    bitmap = build_shingle_bloom(dim.select(key), key, m_bits, k)
    survivors = bloom_prefilter(fact, bitmap, key, m_bits, k)
    return survivors.join(dim, key, how)


@register(
    "q_bloom_join",
    oracle="""
        SELECT o.o_orderstatus,
               count(*) AS n_orders,
               round(sum(o.o_totalprice), 2) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 7500
        GROUP BY o.o_orderstatus
    """,
    doc="Bloom-prefiltered equi-join: orders joined to a SELECTIVE "
    "customer slice (one segment, high balance — ~4% of customers) "
    "through a Bloom bitmap of the dim keys consulted map-side, so only "
    "fact rows that can match are shuffled; the exact join then removes "
    "the filter's false positives, making the answer bit-identical to "
    "the plain join (which is exactly what the oracle runs). The "
    "explicit form of the runtime-filter/DPP idea, for the fact ⋈ "
    "selective-dim shape where the dim is broadcast-too-big but its key "
    "set bitmap-compresses.",
    tags=("E7", "physical", "llm-pipeline"),
)
def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    cust = (
        table(spark, sf_dir, "customer")
        .filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 7500))
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    joined = bloom_join(orders, cust, "o_custkey")
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@register(
    "q_setops_all",
    oracle="""
        SELECT 'intersect_all' AS op, o_custkey
        FROM (
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
            INTERSECT ALL
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        )
        UNION ALL
        SELECT 'except_all', o_custkey
        FROM (
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
            EXCEPT ALL
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        )
    """,
    doc="E6 bag semantics: INTERSECT ALL / EXCEPT ALL — multiplicity-"
    "preserving set ops (a key appearing 3x left and 2x right intersects "
    "2x and excepts 1x), the variant dedup accounting and reconciliation "
    "queries actually need; Spark plans both as a single aggregate over "
    "tagged counts (min/difference of multiplicities), never a "
    "row-pairing join. Tagged and unioned into one result like q_setops.",
    tags=("E6", "sql-surface"),
)
def q_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    inter = f.intersectAll(o).select(
        F.lit("intersect_all").alias("op"), "o_custkey"
    )
    exc = f.exceptAll(o).select(F.lit("except_all").alias("op"), "o_custkey")
    return inter.unionByName(exc)
