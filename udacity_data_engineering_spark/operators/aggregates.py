"""Aggregation operators — extension inventory E1-E4 (SURVEY.md §2B).

The reference itself never calls groupBy/agg (its only aggregation-like ops
are count() at etl.py:188 and dropDuplicates at etl.py:69); these are the
charter-mandated extensions. All are single-shuffle hash aggregates:
Catalyst plans partial (map-side) + final aggregation automatically, which
is the property that matters at 100 TB — the shuffle carries one row per
(partition, group), not per input row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


@register(
    "q_groupby_agg",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS cnt
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="E1: multi-measure hash aggregate (TPC-H Q1 shape). Float sums are "
    "rounded on both sides — summation order differs across engines.",
    tags=("E1",),
)
def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "q_count_distinct",
    oracle="""
        SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust
        FROM orders GROUP BY o_orderstatus
    """,
    doc="E2: exact distinct aggregation per group. Catalyst expands this to "
    "a two-stage aggregate (distinct on (status, custkey), then count); the "
    "approximate variant (approx_count_distinct / HLL) is exposed in "
    "tests for the 100 TB path where exactness isn't required.",
    tags=("E2",),
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n_cust"))
    )


@register(
    "q_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS cnt
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    doc="E3: hierarchical rollup (grouping sets). One Expand + one hash "
    "aggregate — grouping-set rows multiply the shuffle, not the scan.",
    tags=("E3",),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "q_topn",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    doc="E4: global top-k. Spark plans TakeOrderedAndProject: per-partition "
    "heaps + a k-row driver merge, never a full global sort — the only "
    "top-k shape that survives 100 TB.",
    tags=("E4",),
)
def q_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "q_approx_distinct",
    doc="E2 scale path: approx_count_distinct (HyperLogLog++) per order "
    "status — constant memory per group vs the exact variant's "
    "per-group key set, the only distinct-count that fits at 100 TB. "
    "Sketch values are algorithm-specific => rows-only; the <=5% "
    "relative-error contract vs exact is asserted in tests.",
    tags=("E2",),
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.approx_count_distinct("o_custkey", rsd=0.02).alias("n_cust_approx"))
    )


def sketch_rollup(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """(group_cols..., sketch): per-group HyperLogLog sketch state
    (Flajolet et al. 2007; Spark's builtin is the Apache DataSketches
    HLL) — the PERSISTABLE form of a distinct count. At 100 TB the warehouse
    pattern is a sketch rollup table: compute per-day (or per-partition)
    sketches once, store the ~2^lg_k-byte binaries, and answer every
    coarser-grain distinct question by MERGING stored sketches — no
    rescan of the fact data, and (unlike stored exact counts) distinct
    counts compose across groups without double-counting."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")
    )


def sketch_merge_estimate(
    sketches: DataFrame,
    group_cols: list[str],
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Merge persisted sketches up to a coarser grain and estimate:
    HLL union takes per-register maxima, so merging per-day sketches is
    EXACTLY the sketch of the concatenated data (deterministic — pinned
    in tests), and the estimate inherits the single-sketch error bound
    (~1.04/sqrt(2^lg_k), ~1.6% at lg_k=12)."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(out_col)
    )


@register(
    "q_sketch_rollup",
    doc="E2 at warehouse scale: per-(day, event_type) HLL sketches of "
    "user_id rolled up ONCE, then merged per event_type for the "
    "whole-corpus distinct-user estimate — the sketch rollup table "
    "pattern that answers coarser-grain distinct questions from stored "
    "state instead of rescanning 100 TB of facts. Sketch binaries are "
    "engine-specific -> rows-only; exactness is pinned in pytest: "
    "merged-sketch estimate == direct whole-corpus sketch estimate "
    "(HLL union is exact per-register maxima), and both within the "
    "published error bound of the exact distinct count.",
    tags=("E2", "llm-pipeline"),
)
def q_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type", "user_id"
    )
    daily = sketch_rollup(ev, ["day", "event_type"], "user_id")
    return sketch_merge_estimate(daily, ["event_type"]).orderBy("event_type")


def mode_deterministic(
    df: DataFrame, value_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Exact per-group MODE with a pinned tie-break (smallest value
    wins): counts per (group, value), then one window over the distinct
    values of each group picks (cnt DESC, value ASC) rank 1. SQL's
    mode()/Spark's F.mode leave ties engine- and partition-order-
    dependent — useless for replication checks; the explicit tie-break
    makes the answer a FACT both engines agree on. Window input is the
    distinct-value frame (bounded by value cardinality), never the raw
    rows."""
    from pyspark.sql import Window

    g = list(group_cols or [])
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*g, value_col)
        .agg(F.count(F.lit(1)).alias("mode_count"))
    )
    w = Window.partitionBy(*g).orderBy(
        F.col("mode_count").desc(), F.col(value_col).asc()
    )
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*g, F.col(value_col).alias("mode_value"), "mode_count")
    )


@register(
    "q_mode_deterministic",
    oracle="""
        WITH c AS (
            SELECT o_orderstatus, o_orderpriority, count(*) AS mode_count
            FROM orders
            WHERE o_orderpriority IS NOT NULL
            GROUP BY o_orderstatus, o_orderpriority
        ), r AS (
            SELECT *, row_number() OVER (
                       PARTITION BY o_orderstatus
                       ORDER BY mode_count DESC, o_orderpriority ASC
                   ) AS rn
            FROM c
        )
        SELECT o_orderstatus, o_orderpriority AS mode_value, mode_count
        FROM r WHERE rn = 1
    """,
    doc="Deterministic per-group MODE: the most frequent order priority "
    "per status, ties broken to the smallest value — the pinned-tie-"
    "break variant of SQL mode() (whose tie winner is engine-dependent "
    "and thus unverifiable). One hash aggregate + one window over the "
    "distinct-value frame (bounded by value cardinality, never rows).",
    tags=("E1", "sql-surface"),
)
def q_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mode_deterministic(
        table(spark, sf_dir, "orders"),
        "o_orderpriority",
        ["o_orderstatus"],
    )
