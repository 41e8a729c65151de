"""Scalar-function breadth, part 2: arrays, datetime arithmetic,
regex, argmin/argmax and conditional aggregates.

Notable parity item: ``date_format`` is imported by the reference but
never used (etl.py:6, SURVEY §2A) — q_date_format implements the intent
(formatting start_time for presentation) with a strftime oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


@register(
    "q_array_funcs",
    oracle="""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
        SELECT doc_id,
               array_to_string(list_sort(list_distinct(words))[1:5], ',')
                   AS first5_sorted,
               CAST(list_contains(words, 'data') AS BOOLEAN) AS has_data,
               words[1] AS first_word,
               list_reverse(words)[1] AS last_word
        FROM t
    """,
    doc="Array functions over tokenized text: sort/distinct/slice/"
    "contains/indexing. DuckDB list ops mirror Spark array ops "
    "one-to-one (both 1-based element_at).",
    tags=("sql-surface",),
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return docs.select(
        "doc_id",
        # joined to a scalar so row canonicalizers (driver-side pandas)
        # never see list cells; the array ops under test are unchanged
        F.array_join(
            F.slice(F.sort_array(F.array_distinct(words)), 1, 5), ","
        ).alias("first5_sorted"),
        F.array_contains(words, "data").alias("has_data"),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(F.reverse(words), 1).alias("last_word"),
    )


@register(
    "q_date_arithmetic",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
               CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT)
                   AS days_since_epoch_start,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
               CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end
        FROM orders
    """,
    doc="Date arithmetic: interval add, datediff, trunc, last_day. "
    "Spark date_add/datediff operate in days on DATE — both sides cast "
    "timestamps down to DATE so the day math is identical.",
    tags=("sql-surface",),
)
def q_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_add(d, 30).alias("due_date"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.trunc(d, "month").alias("order_month"),
        F.last_day(d).alias("month_end"),
    )


@register(
    "q_date_format",
    oracle="""
        SELECT event_id,
               strftime(ts, '%Y-%m-%d %H:%M') AS ts_minute,
               strftime(ts, '%Y-%m') AS ts_month
        FROM events
    """,
    doc="date_format — imported but never used by the reference "
    "(etl.py:6, dead import); implemented as intended. Java pattern "
    "'yyyy-MM-dd HH:mm' == strftime '%Y-%m-%d %H:%M'.",
    tags=("2A", "sql-surface"),
)
def q_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("ts_minute"),
        F.date_format("ts", "yyyy-MM").alias("ts_month"),
    )


@register(
    "q_regex_funcs",
    oracle="""
        SELECT doc_id,
               regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled,
               regexp_extract(text, '([a-z]+)', 1) AS first_token,
               CAST(regexp_matches(text, 'data|table') AS BOOLEAN) AS mentions_data
        FROM documents
    """,
    doc="Regex scalar functions. Spark regexp_replace is global by "
    "default == DuckDB with the 'g' flag; rlike == regexp_matches "
    "(substring search in both).",
    tags=("sql-surface",),
)
def q_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_replace("text", "[aeiou]", "_").alias("devoweled"),
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_token"),
        F.col("text").rlike("data|table").alias("mentions_data"),
    )


@register(
    "q_minmax_by",
    oracle="""
        SELECT o_orderstatus,
               max_by(o_orderkey, o_totalprice) AS priciest_order,
               min_by(o_orderkey, o_totalprice) AS cheapest_order,
               round(max(o_totalprice), 2) AS max_price
        FROM orders GROUP BY o_orderstatus
    """,
    doc="Argmax/argmin aggregates (max_by/min_by exist in both engines). "
    "o_totalprice values are distinct in practice; ties would be "
    "engine-arbitrary and need a deterministic tiebreak instead.",
    tags=("sql-surface", "E1"),
)
def q_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@register(
    "q_conditional_agg",
    oracle="""
        SELECT l_returnflag,
               count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
               round(sum(l_extendedprice) FILTER (WHERE l_tax > 0.04), 2)
                   AS taxed_price,
               CAST(count(*) AS BIGINT) AS n_total
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="Conditional aggregation: count_if / sum(CASE) == SQL FILTER "
    "clauses — one pass, no pre-filtering subqueries.",
    tags=("sql-surface", "E1"),
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.round(
            F.sum(F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice"))), 2
        ).alias("taxed_price"),
        F.count(F.lit(1)).alias("n_total"),
    )


@register(
    "q_sample",
    doc="Seeded Bernoulli sampling — RNG streams differ across engines "
    "by construction, so rows-only (deterministic within Spark for a "
    "fixed seed+partitioning; tests pin the row count).",
    tags=("sql-surface",),
)
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "lineitem").sample(0.1, seed=42).select(
        "l_orderkey", "l_linenumber"
    )
