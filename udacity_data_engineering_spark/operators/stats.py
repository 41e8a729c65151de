"""Statistical aggregates + remaining window-function matrix + reshape
ops (unpivot, ordered string agg, histogram bucketing).

All pure Catalyst expressions with DuckDB oracles; FP results rounded on
both sides (engine summation orders differ).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


@register(
    "q_stats_agg",
    oracle="""
        SELECT l_returnflag,
               round(stddev_samp(l_quantity), 6) AS sd_qty,
               round(var_samp(l_quantity), 6) AS var_qty,
               round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
               round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
               round(skewness(l_quantity), 6) AS skew_qty
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="Statistical aggregates: stddev/variance/correlation/covariance/"
    "skewness — single-pass decomposable moments, partial+final like any "
    "hash aggregate. Spark's skewness is the population g1; DuckDB's is "
    "the bias-corrected G1 = g1*sqrt(n(n-1))/(n-2) — the Spark side "
    "applies the correction so both report G1.",
    tags=("E1", "stats"),
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "covar_qty_price"
        ),
        F.round(
            F.skewness("l_quantity")
            * F.sqrt(F.count(F.lit(1)) * (F.count(F.lit(1)) - 1))
            / (F.count(F.lit(1)) - 2),
            6,
        ).alias("skew_qty"),
    )


@register(
    "q_window_navigation",
    oracle="""
        SELECT o_orderkey, o_custkey,
               first_value(o_orderkey) OVER w AS first_order,
               last_value(o_orderkey) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS last_order,
               nth_value(o_orderkey, 2) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS second_order,
               CAST(ntile(4) OVER w AS INT) AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="Window navigation/distribution matrix: first/last/nth_value "
    "(full-partition frames so last/nth are well-defined), ntile, "
    "percent_rank, cume_dist.",
    tags=("E5",),
)
def q_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(full).alias("second_order"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "q_unpivot",
    oracle="""
        SELECT c_custkey, metric, round(val, 2) AS val
        FROM (
            UNPIVOT (SELECT c_custkey, c_acctbal,
                            CAST(c_nationkey AS DOUBLE) AS c_nationkey
                     FROM customer)
            ON c_acctbal, c_nationkey
            INTO NAME metric VALUE val)
    """,
    doc="Unpivot/melt: wide numeric columns to (key, metric, value) "
    "rows — the inverse of q_pivot. Spark unpivot == SQL UNPIVOT.",
    tags=("sql-surface",),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", F.col("c_nationkey").cast("double").alias("c_nationkey")
    )
    return c.unpivot(
        "c_custkey", ["c_acctbal", "c_nationkey"], "metric", "val"
    ).select("c_custkey", "metric", F.round("val", 2).alias("val"))


@register(
    "q_string_agg",
    oracle="""
        SELECT n_regionkey,
               string_agg(n_name, ',' ORDER BY n_name) AS nations
        FROM nation GROUP BY n_regionkey
    """,
    doc="Ordered string aggregation: collect + sort + join == "
    "string_agg(... ORDER BY). The explicit sort makes the result "
    "deterministic — unordered listagg is engine-arbitrary.",
    tags=("E1", "sql-surface"),
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations")
    )


@register(
    "q_histogram",
    oracle="""
        SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                         WHEN o_totalprice >= 600000 THEN 13
                         ELSE floor(o_totalprice / 50000) + 1 END AS INT)
                   AS bucket,
               count(*) AS n
        FROM orders GROUP BY 1
    """,
    doc="Histogram via width_bucket: fixed-range bucketing + count — "
    "the single-pass distribution sketch. DuckDB 1.0 lacks "
    "width_bucket, so the oracle spells out the same formula "
    "(floor((v-lo)/w)+1 with under/overflow buckets 0 and n+1).",
    tags=("E1", "stats"),
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy(
        F.width_bucket("o_totalprice", F.lit(0), F.lit(600000), F.lit(12))
        .cast("int")
        .alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
