"""Scalar-function and SQL-shape coverage — extensions beyond the
reference's minimal surface (SURVEY.md §2A notes the reference uses *no*
string/math/conditional functions at all; a drop-in engine needs them).

Every query here is pure Catalyst expressions with a DuckDB oracle.
Cross-engine alignment notes are on each query (return-type widths,
regex dialects, ceil/floor typing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


@register(
    "q_string_funcs",
    oracle="""
        SELECT c_custkey,
               upper(c_name) AS name_upper,
               substring(c_name, 1, 8) AS name_prefix,
               concat(c_mktsegment, ':', c_name) AS tagged,
               replace(c_name, '#', '-') AS dashed,
               CAST(length(c_name) AS INT) AS name_len,
               trim(c_mktsegment) AS seg_trim
        FROM customer
    """,
    doc="String scalar functions: upper/substring/concat/replace/length/"
    "trim. 1-based substring in both engines; DuckDB length is BIGINT, "
    "cast to Spark's INT.",
    tags=("sql-surface",),
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws(":", "c_mktsegment", "c_name").alias("tagged"),
        F.replace("c_name", F.lit("#"), F.lit("-")).alias("dashed"),
        F.length("c_name").alias("name_len"),
        F.trim("c_mktsegment").alias("seg_trim"),
    )


@register(
    "q_math_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(abs(l_extendedprice - l_quantity * 1000), 2) AS adiff,
               CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
               CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct_floor,
               round(sqrt(l_quantity), 6) AS root_qty,
               round(ln(l_extendedprice), 6) AS log_price,
               round(pow(1 + l_discount, 2), 6) AS growth
        FROM lineitem
    """,
    doc="Math scalar functions: abs/ceil/floor/sqrt/ln/pow. Spark "
    "ceil/floor on double return LONG while DuckDB returns DOUBLE — "
    "oracle casts to BIGINT.",
    tags=("sql-surface",),
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000), 2).alias(
            "adiff"
        ),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.floor(F.col("l_tax") * 100).alias("tax_pct_floor"),
        F.round(F.sqrt("l_quantity"), 6).alias("root_qty"),
        F.round(F.log("l_extendedprice"), 6).alias("log_price"),
        F.round(F.pow(F.lit(1) + F.col("l_discount"), 2), 6).alias("growth"),
    )


@register(
    "q_case_when",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice >= 200000 THEN 'high'
                    WHEN o_totalprice >= 100000 THEN 'mid'
                    ELSE 'low' END AS price_band,
               CASE o_orderstatus WHEN 'F' THEN 'finished'
                                  WHEN 'O' THEN 'open'
                                  ELSE 'partial' END AS status_word
        FROM orders
    """,
    doc="Conditional expressions: searched CASE and simple CASE.",
    tags=("sql-surface",),
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 200000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
        .alias("status_word"),
    )


@register(
    "q_null_handling",
    oracle="""
        SELECT c_custkey,
               coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
               CAST(c_acctbal IS NULL AS BOOLEAN) AS bal_is_null,
               coalesce(c_acctbal, 0.0) AS bal_filled
        FROM customer
    """,
    doc="Null semantics: coalesce/nullif/IS NULL — three-valued logic "
    "agrees across engines.",
    tags=("sql-surface",),
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.col("c_acctbal").isNull().alias("bal_is_null"),
        F.coalesce("c_acctbal", F.lit(0.0)).alias("bal_filled"),
    )


@register(
    "q_pivot",
    oracle="""
        SELECT l_returnflag,
               round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O,
               round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="Pivot (wide aggregation): Spark's groupBy().pivot() with pinned "
    "values == conditional-sum columns in ANSI SQL. Pinning the pivot "
    "values keeps it one pass (unpinned pivot needs a distinct-scan "
    "first — avoid at scale).",
    tags=("sql-surface",),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


@register(
    "q_in_subquery",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
    doc="IN subquery — Catalyst rewrites to a left-semi join.",
    tags=("sql-surface",),
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    for name in ("orders", "customer"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        """
    )


@register(
    "q_scalar_subquery",
    oracle="""
        SELECT o_orderkey, round(o_totalprice, 2) AS price
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    """,
    doc="Uncorrelated scalar subquery — planned once, broadcast as a "
    "literal into the filter.",
    tags=("sql-surface",),
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS price
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        """
    )


_CTE_SQL = """
    WITH big_cust AS (
        SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
        FROM orders GROUP BY o_custkey
    )
    SELECT c.c_mktsegment, count(*) AS n_big,
           round(sum(b.spend), 2) AS seg_spend
    FROM big_cust b JOIN customer c ON b.o_custkey = c.c_custkey
    WHERE b.spend > 500000
    GROUP BY c.c_mktsegment
"""


@register(
    "q_cte",
    oracle=_CTE_SQL,
    doc="Common table expression feeding a join + aggregate — identical "
    "SQL text runs on both engines.",
    tags=("sql-surface",),
)
def q_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    for name in ("orders", "customer"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_CTE_SQL)


@register(
    "q_json_extract",
    oracle="SELECT event_id, CAST(props ->> 'k' AS INT) AS k FROM events",
    doc="E9: JSON scalar extraction from events.props "
    "(get_json_object / ->> are path-equivalent for flat keys).",
    tags=("E9",),
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.get_json_object("props", "$.k").cast("int").alias("k")
    )
