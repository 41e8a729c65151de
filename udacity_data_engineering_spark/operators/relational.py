"""Core relational operators — the reference's own surface (SURVEY.md §2A).

Each declared query re-expresses one operator the reference exercises
(citations are to /root/reference/etl.py) on the driver's TPC-H-ish
testdata. All plans are plain DataFrame/SQL so Catalyst handles pushdown,
pruning and join selection; nothing here drops to RDDs or Python UDFs
(the one deliberate UDF lives in functions/datetime_fns.py for parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


@register(
    "q_scan_count",
    oracle="SELECT count(*) AS cnt FROM lineitem",
    doc="Full parquet scan + count(*) (etl.py:185,188). Catalyst answers "
    "count(*) from parquet footer statistics — no row materialization.",
    tags=("2A.6", "2A.22"),
)
def q_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "q_count",
    oracle="SELECT count(*) AS cnt FROM customer",
    doc="count() action analog (etl.py:188) on a second table.",
    tags=("2A.22",),
)
def q_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "customer").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "q_project",
    oracle="SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    doc="Column-subset projection (etl.py:65-69). Column pruning reaches "
    "the parquet scan: ReadSchema carries only the 3 columns.",
    tags=("2A.7",),
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "q_project_rename",
    oracle=(
        "SELECT c_custkey AS user_id, c_name AS full_name, "
        "c_mktsegment AS segment FROM customer"
    ),
    doc="Projection + rename via selectExpr (etl.py:112-116 users table).",
    tags=("2A.8",),
)
def q_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS user_id", "c_name AS full_name", "c_mktsegment AS segment"
    )


@register(
    "q_filter_eq",
    oracle=(
        "SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem "
        "WHERE l_returnflag = 'R'"
    ),
    doc="Equality-predicate filter (etl.py:109 page == 'NextSong'). The "
    "literal predicate is pushed into the parquet scan (PushedFilters).",
    tags=("2A.9",),
)
def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )


@register(
    "q_limit",
    oracle=(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 5"
    ),
    doc="Row fetch with deterministic total order (etl.py:187 head(1) "
    "analog). Spark plans TakeOrderedAndProject — no global sort.",
    tags=("2A.21",),
)
def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(5)
    )


@register(
    "q_dedup_key",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
            SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders) t
        WHERE rn = 1
    """,
    doc="Deterministic key-subset dedup — the *intended* semantics of the "
    "reference's dropDuplicates (etl.py:69,82,116,135; bug B7 in SURVEY "
    "§3.4): keep the latest row per key under an explicit total order, "
    "expressed as a ranking window so both engines agree. Compiles to one "
    "shuffle on the key, same cost class as dropDuplicates.",
    tags=("2A.10",),
)
def q_dedup_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


@register(
    "q_dedup_any",
    doc="Reference-parity nondeterministic dedup: dropDuplicates([key]) "
    "keeps an arbitrary row per key (etl.py:69). Values are not "
    "oracle-comparable; the driver records a rows-only check (the row "
    "count — one survivor per distinct key — is deterministic).",
    tags=("2A.10",),
)
def q_dedup_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "orders").dropDuplicates(["o_custkey"])


@register(
    "q_dedup_fullrow",
    oracle="""
        SELECT DISTINCT o_custkey, o_orderstatus, o_orderpriority
        FROM (SELECT o_custkey, o_orderstatus, o_orderpriority FROM orders
              UNION ALL
              SELECT o_custkey, o_orderstatus, o_orderpriority FROM orders)
    """,
    doc="Full-row dropDuplicates() — same operator family as the "
    "reference's key-subset dedup (etl.py:69, 2A.10) but hash-provable: "
    "with no key subset every duplicate group is a set of identical rows, "
    "so the survivor set is deterministic (== SELECT DISTINCT *). The "
    "self-union guarantees real duplicates exist. Same physical shape as "
    "dropDuplicates([key]): one shuffle on all columns.",
    tags=("2A.10",),
)
def q_dedup_fullrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    proj = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus", "o_orderpriority"
    )
    return proj.unionAll(proj).dropDuplicates()


@register(
    "q_dateparts",
    oracle="""
        SELECT event_id,
               CAST(hour(ts) AS INT) AS hour,
               CAST(day(ts) AS INT) AS day,
               CAST(weekofyear(ts) AS INT) AS week,
               CAST(month(ts) AS INT) AS month,
               CAST(year(ts) AS INT) AS year,
               CAST(dayofweek(ts) + 1 AS INT) AS weekday
        FROM events
    """,
    doc="Datetime part extraction (etl.py:128-133 time table). Oracle "
    "mapping: Spark dayofweek is 1=Sunday..7 while DuckDB is 0=Sunday..6, "
    "hence the +1; weekofyear is ISO week in both engines.",
    tags=("2A.14", "2A.11"),
)
def q_dateparts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.hour("ts").alias("hour"),
        F.dayofmonth("ts").alias("day"),
        F.weekofyear("ts").alias("week"),
        F.month("ts").alias("month"),
        F.year("ts").alias("year"),
        F.dayofweek("ts").alias("weekday"),
    )


@register(
    "q_synthetic_id",
    doc="monotonically_increasing_id surrogate key (etl.py:70,153). Values "
    "are partition-dependent by design — rows-only check (count must equal "
    "the orders count; uniqueness asserted in tests/).",
    tags=("2A.12",),
)
def q_synthetic_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "orders").select(
        F.monotonically_increasing_id().alias("songplay_id"), "o_orderkey"
    )


@register(
    "q_synthetic_id_props",
    oracle="""
        SELECT count(*) AS n_rows, count(*) AS n_distinct_ids,
               count(*) AS n_distinct_pairs
        FROM orders
    """,
    doc="Hash-provable property check for the synthetic surrogate key "
    "(etl.py:70,153, 2A.12): the id values are partition-dependent by "
    "design, but their PROPERTIES are exact — one id per row, all ids "
    "distinct, and ids stay distinct when paired with the natural key. "
    "The oracle asserts n_rows == n_distinct_ids == n_distinct_pairs == "
    "count(orders); any id collision breaks the hash.",
    tags=("2A.12",),
)
def q_synthetic_id_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ids = table(spark, sf_dir, "orders").select(
        F.monotonically_increasing_id().alias("songplay_id"), "o_orderkey"
    )
    return ids.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("songplay_id").alias("n_distinct_ids"),
        F.countDistinct("songplay_id", "o_orderkey").alias("n_distinct_pairs"),
    )


@register(
    "q_join_multikey",
    oracle="""
        SELECT a.c_custkey, a.c_name, a.c_acctbal
        FROM customer a JOIN customer b
          ON a.c_custkey = b.c_custkey
         AND a.c_acctbal = b.c_acctbal
         AND a.c_name = b.c_name
    """,
    doc="Inner equi-join on a 3-column composite key including a "
    "double-typed equality — the shape of the reference's songplays join "
    "(etl.py:164-168: song=title AND length=duration AND "
    "artist=artist_name). Exact float equality is preserved deliberately "
    "(SURVEY §7.3); Catalyst picks broadcast-hash under the threshold.",
    tags=("2A.17",),
)
def q_join_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = table(spark, sf_dir, "customer").alias("a")
    b = table(spark, sf_dir, "customer").alias("b")
    cond = (
        (F.col("a.c_custkey") == F.col("b.c_custkey"))
        & (F.col("a.c_acctbal") == F.col("b.c_acctbal"))
        & (F.col("a.c_name") == F.col("b.c_name"))
    )
    return a.join(b, cond, "inner").select("a.c_custkey", "a.c_name", "a.c_acctbal")


_SQL_ENTRY = """
    SELECT o.o_orderkey AS order_id,
           {year_expr} AS year,
           {month_expr} AS month,
           c.c_custkey AS user_id,
           c.c_mktsegment AS level,
           o.o_totalprice AS amount,
           n.n_name AS location
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
"""


@register(
    "q_sql_entry",
    oracle=_SQL_ENTRY.format(
        year_expr="CAST(year(o.o_orderdate) AS INT)",
        month_expr="CAST(month(o.o_orderdate) AS INT)",
    ),
    doc="SQL entry point over temp views — the songplays star join "
    "(etl.py:149-169): fact ⋈ two dimensions with computed year/month and "
    "select-list aliases. nation/customer are broadcast by Catalyst; only "
    "orders streams.",
    tags=("2A.15", "2A.16", "2A.18"),
)
def q_sql_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    for name in ("orders", "customer", "nation"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(
        _SQL_ENTRY.format(
            year_expr="year(o.o_orderdate)", month_expr="month(o.o_orderdate)"
        )
    )
