"""TPC-H depth batch 3 — the last four classic shapes (Q2, Q11, Q12,
Q20), completing the 22-query coverage matrix started in analytics.py /
analytics2.py.

The driver testdata has no ``partsupp`` table and lineitem carries no
shipmode/commitdate/receiptdate, so the supply-cost and shipping-mode
predicates are re-expressed over the columns that exist (unit price
observed in lineitem stands in for ps_supplycost; l_returnflag stands
in for l_shipmode; o_orderpriority for the commit/receipt lateness
test). Each query keeps the *plan shape* that makes the original
interesting: correlated min (Q2), global-scalar HAVING (Q11),
conditional aggregation (Q12), nested semi-joins with a correlated
share threshold (Q20).

Reference analog: the reference's single star join (etl.py:164-168)
generalized to the full analytic join/subquery matrix.

Scale notes: dims (part, supplier, nation, region) broadcast; the
per-(part, supplier) offer aggregation shuffles lineitem once on its
natural key and every later step (window min, share window) reuses
that partitioning, so each query is a single fact shuffle end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


@register(
    "q_min_cost_supplier",
    oracle="""
        WITH offers AS (
            SELECT l_partkey, l_suppkey,
                   min(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem
            GROUP BY l_partkey, l_suppkey
        ), ranked AS (
            SELECT p.p_partkey, p.p_name, s.s_name, n.n_name,
                   CAST(floor(s.s_acctbal * 100 + 0.5) AS BIGINT)
                       AS s_acctbal_cents,
                   CAST(floor(o.unit_cost * 100 + 0.5) AS BIGINT)
                       AS unit_cost_cents,
                   row_number() OVER (PARTITION BY p.p_partkey
                                      ORDER BY o.unit_cost, s.s_name) AS rn
            FROM part p
            JOIN offers o ON o.l_partkey = p.p_partkey
            JOIN supplier s ON s.s_suppkey = o.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            WHERE r.r_name = 'EUROPE'
              AND p.p_type = 'STANDARD' AND p.p_size < 20
        )
        SELECT p_partkey, p_name, s_name, n_name,
               s_acctbal_cents, unit_cost_cents
        FROM ranked WHERE rn = 1
    """,
    doc="TPC-H Q2 shape: cheapest qualifying supplier per part within a "
    "region — the correlated-min lookup. Without partsupp, the observed "
    "unit price min(l_extendedprice/l_quantity) per (part, supplier) "
    "stands in for ps_supplycost. The min-per-part is a row_number "
    "window (deterministic tie-break on s_name) rather than a "
    "re-aggregated scalar subquery: one shuffle on l_partkey for the "
    "offer agg, and the window reuses that partitioning. All four dims "
    "broadcast under the fact. Money outputs are integer cents via "
    "explicit floor(x*100+0.5) — round(x, 2) diverges between engines "
    "at representation-boundary values (found at sf0.1: a unit_cost "
    "whose double sits on the .005 edge rounded 256.22 in Spark's "
    "HALF_UP-on-decimal vs 256.21 in DuckDB).",
    tags=("analytics", "E7"),
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    offers = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") < 20)
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    euro_supp = F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
            F.broadcast(r), n.n_regionkey == r.r_regionkey
        )
    )
    joined = (
        offers.join(F.broadcast(p), offers.l_partkey == p.p_partkey)
        .join(euro_supp, offers.l_suppkey == F.col("s_suppkey"))
    )
    w = Window.partitionBy("p_partkey").orderBy("unit_cost", "s_name")

    def cents(col: str):
        return F.floor(F.col(col) * 100 + F.lit(0.5)).cast("bigint")

    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            cents("s_acctbal").alias("s_acctbal_cents"),
            cents("unit_cost").alias("unit_cost_cents"),
        )
    )


@register(
    "q_important_parts",
    oracle="""
        WITH natval AS (
            SELECT l.l_partkey, sum(l.l_extendedprice) AS raw_value
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            WHERE n.n_name IN ('NATION_3', 'NATION_7')
            GROUP BY l.l_partkey
        )
        SELECT l_partkey AS p_partkey, round(raw_value, 2) AS part_value
        FROM natval
        WHERE raw_value > (SELECT avg(raw_value) * 3 FROM natval)
    """,
    doc="TPC-H Q11 shape: parts representing a significant share of a "
    "nation group's traded value — a grouped aggregate filtered against "
    "a scalar subquery over the SAME aggregate (HAVING sum > "
    "3 x the average part value, a threshold that stays meaningful as "
    "the part count scales). The per-part aggregate is .cache()d — it is "
    "|parts| rows, thousands of times smaller than the fact — so the "
    "threshold's second consumer reads the in-memory aggregate instead "
    "of recomputing the lineitem scan+shuffle (without the cache, "
    "Catalyst duplicates the whole subtree into both branches). The "
    "one-row threshold broadcast-nested-loop joins back.",
    tags=("analytics", "E1"),
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    natval = (
        l.join(
            F.broadcast(
                s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
                    "s_suppkey"
                )
            ),
            l.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("raw_value"))
        .cache()
    )
    threshold = natval.agg(
        (F.avg("raw_value") * F.lit(3)).alias("threshold")
    )
    return (
        natval.join(F.broadcast(threshold))
        .filter(F.col("raw_value") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("raw_value", 2).alias("part_value"),
        )
    )


@register(
    "q_priority_shipclass",
    oracle="""
        SELECT l.l_returnflag AS ship_class,
               count(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                          THEN 1 END) AS high_line_count,
               count(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                          THEN 1 END) AS low_line_count
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l.l_returnflag
    """,
    doc="TPC-H Q12 shape: conditional aggregation — one pass producing "
    "two mutually exclusive counts via CASE inside the aggregate, "
    "grouped by shipping class (l_returnflag stands in for l_shipmode; "
    "o_orderpriority for the commit/receipt lateness test). The "
    "date-range predicate pushes into the lineitem scan before the "
    "join; the conditional counts are partial-aggregated map-side, so "
    "the final shuffle carries 3 groups x 2 longs, not rows.",
    tags=("analytics", "E1"),
)
def q_priority_shipclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@register(
    "q_excess_share_suppliers",
    oracle="""
        WITH shipped AS (
            SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty,
                   sum(sum(l_quantity)) OVER (PARTITION BY l_partkey)
                       AS part_total,
                   count(*) OVER (PARTITION BY l_partkey) AS n_suppliers
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_name LIKE 'large %')
            GROUP BY l_partkey, l_suppkey
        )
        SELECT DISTINCT s.s_name, round(s.s_acctbal, 2) AS s_acctbal
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA'
          AND s.s_suppkey IN (SELECT l_suppkey FROM shipped
                              WHERE qty > 2.5 * part_total / n_suppliers)
    """,
    doc="TPC-H Q20 shape: suppliers holding an outsized share of a "
    "part family's flow — nested IN-subqueries (part-name family -> "
    "qualifying (part, supplier) volumes -> suppliers) with a "
    "correlated threshold. Without ps_availqty, 'excess' is shipping "
    ">2.5x a supplier's fair share of the part's volume (scale-robust: "
    "the fair share adapts as supplier count grows); the correlated "
    "per-part total is a window over the grouped volumes, reusing the group "
    "shuffle's partitioning. Spark plans the two INs as broadcast "
    "left-semi joins; the DISTINCT collapses a supplier qualifying via "
    "several parts.",
    tags=("analytics", "E7"),
)
def q_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("large %"))
    shipped = (
        l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .withColumn(
            "part_total",
            F.sum("qty").over(Window.partitionBy("l_partkey")),
        )
        .withColumn(
            "n_suppliers",
            F.count(F.lit(1)).over(Window.partitionBy("l_partkey")),
        )
    )
    qualifying = shipped.filter(
        F.col("qty") > F.lit(2.5) * F.col("part_total") / F.col("n_suppliers")
    ).select("l_suppkey")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(qualifying, s.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .distinct()
    )
