"""SQL-surface breadth, part 3: multi-dimensional grouping (CUBE /
GROUPING SETS), HAVING, and correlated scalar subqueries.

The reference's SQL surface is a single SELECT..JOIN (etl.py:152-169);
these are the standard analytical extensions on top of it. All four are
pure Catalyst built-ins: CUBE/GROUPING SETS compile to one Expand + one
hash aggregate, HAVING is a post-aggregation filter, and the correlated
scalar subquery is decorrelated into an aggregate + equi-join — no
per-row re-execution survives optimization, which is what makes the
shape viable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


@register(
    "q_cube",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_extendedprice), 2) AS sum_price,
               count(*) AS cnt
        FROM lineitem
        GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    doc="E3: full cube — all 2^k grouping sets in one Expand + one hash "
    "aggregate. The Expand multiplies shuffle rows by the number of "
    "grouping sets (4 here), never the scan; at scale prefer rollup or "
    "explicit sets when the full lattice isn't needed.",
    tags=("E3",),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "q_grouping_sets",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    doc="E3: explicit grouping sets — only the requested granularities "
    "(by returnflag, by linestatus), skipping the combined and grand "
    "totals a cube would add. Identical SQL text runs on both engines.",
    tags=("E3", "sql-surface"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "q_having",
    oracle="""
        SELECT o_custkey,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_spend
        FROM orders
        GROUP BY o_custkey
        HAVING count(*) >= 20
    """,
    doc="HAVING: post-aggregation predicate. In the DataFrame API this is "
    "a filter over aggregate output columns — Catalyst keeps it after the "
    "final aggregate (it cannot be pushed below the group-by), so the "
    "full aggregate still shuffles; selectivity pays off downstream only.",
    tags=("sql-surface", "E1"),
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
        .filter(F.col("n_orders") >= 20)
    )


@register(
    "q_correlated_subquery",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
                                  FROM orders o2
                                  WHERE o2.o_custkey = o.o_custkey)
    """,
    doc="Correlated scalar subquery: orders more than twice their "
    "customer's average. Catalyst decorrelates it into a per-custkey "
    "aggregate joined back on the correlation key — one extra shuffle, "
    "not a per-row subquery execution, so the shape is linear at scale.",
    tags=("sql-surface",),
)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_corr")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders_corr o
        WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
                                  FROM orders_corr o2
                                  WHERE o2.o_custkey = o.o_custkey)
        """
    )


@register(
    "q_higher_order_funcs",
    oracle="""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
        SELECT doc_id,
               array_to_string(list_transform(words, w -> length(w))[1:5], ',')
                   AS first5_lengths,
               CAST(len(list_filter(words, w -> length(w) > 6)) AS INT)
                   AS n_long_words,
               CAST(len(list_filter(words, w -> w = 'the')) > 0 AS BOOLEAN)
                   AS has_the,
               CAST(list_sum(list_transform(words, w -> length(w))) AS BIGINT)
                   AS total_chars
        FROM t
    """,
    doc="Higher-order array functions — transform/filter/exists/"
    "aggregate with lambda expressions. These run inside codegen on the "
    "JVM (Catalyst compiles the lambdas), which is why array-heavy "
    "pipelines never need a Python UDF. DuckDB's list_* lambdas mirror "
    "them one-to-one.",
    tags=("sql-surface", "E10"),
)
def q_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    lengths = F.transform(words, F.length)
    return docs.select(
        "doc_id",
        # joined to a scalar so row canonicalizers never see list cells
        F.array_join(F.slice(lengths, 1, 5).cast("array<string>"), ",").alias(
            "first5_lengths"
        ),
        F.size(F.filter(words, lambda w: F.length(w) > 6)).alias("n_long_words"),
        F.exists(words, lambda w: w == "the").alias("has_the"),
        F.aggregate(
            lengths, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("total_chars"),
    )


@register(
    "q_map_funcs",
    oracle="""
        SELECT doc_id, 'lang' AS k, lang AS v FROM documents
        UNION ALL
        SELECT doc_id, 'source' AS k, source AS v FROM documents
    """,
    doc="Map column construction + explosion: map_from_arrays -> "
    "map_keys/map_values -> explode into (key, value) rows. The oracle "
    "is the equivalent row expansion (DuckDB maps exist but the "
    "contract under test is Spark's map type round-tripping to rows). "
    "Map explode is the standard shape for attribute tables at scale — "
    "rows, not ever-wider columns.",
    tags=("sql-surface",),
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    m = F.map_from_arrays(
        F.array(F.lit("lang"), F.lit("source")),
        F.array(F.col("lang"), F.col("source")),
    )
    return docs.select("doc_id", F.explode(m).alias("k", "v"))
