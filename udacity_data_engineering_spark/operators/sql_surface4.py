"""SQL-surface batch 4 — modern Spark 4 features and generator/lateral
shapes: VARIANT semi-structured access, JSON construction round-trips,
positional explode, LATERAL correlated subqueries, and the ANSI-mode
``try_*`` error-safe function family.

Reference analog: the reference's only semi-structured handling is the
inferred-schema JSON scan (etl.py:105); these queries cover what a
production lake does instead — keep raw payloads as strings/VARIANT and
project typed values at query time, erroring to NULL not to failure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


@register(
    "q_posexplode",
    oracle="""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS words
                   FROM documents WHERE doc_id < 20)
        SELECT doc_id, CAST(i - 1 AS INT) AS pos, words[i] AS tok
        FROM t, unnest(generate_series(1, len(words))) AS u(i)
    """,
    doc="Positional explode: each token with its 0-based offset — the "
    "generator that preserves token order through the row expansion "
    "(plain explode loses it). DuckDB has no WITH ORDINALITY, so the "
    "oracle indexes the list by a generated subscript. At scale the "
    "generate runs inside codegen, one output partition per input "
    "partition — no shuffle.",
    tags=("sql-surface", "E10"),
)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )


_LATERAL_SQL = """
    SELECT n.n_name, s.s_name, s.s_acctbal
    FROM nation n, LATERAL (SELECT s_name, s_acctbal FROM supplier s
                            WHERE s.s_nationkey = n.n_nationkey
                            ORDER BY s_acctbal DESC, s_name
                            LIMIT 2) s
"""


@register(
    "q_lateral_join",
    oracle=_LATERAL_SQL,
    doc="LATERAL correlated subquery: per-nation top-2 suppliers by "
    "account balance — the per-group top-k expressed as a lateral "
    "(identical SQL text runs on both engines; Spark supports LATERAL "
    "since 3.2). Catalyst decorrelates the limit into a ranked window "
    "over one shuffle rather than running the subquery per outer row.",
    tags=("sql-surface", "E7"),
)
def q_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    for name in ("nation", "supplier"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_LATERAL_SQL)


@register(
    "q_variant_extract",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS INT) AS k,
               CAST(json_extract(props, '$.missing') AS INT) AS missing
        FROM events
        WHERE event_type = 'purchase'
    """,
    doc="VARIANT semi-structured access (Spark 4): parse_json once into "
    "the binary VARIANT encoding, then typed path extraction with "
    "variant_get — the open-schema payload pattern that replaces "
    "per-query JSON string re-parsing. A missing path yields NULL, not "
    "an error. Oracle is DuckDB json_extract over the same strings.",
    tags=("sql-surface", "E9"),
)
def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k"),
        F.variant_get(v, "$.missing", "int").alias("missing"),
    )


@register(
    "q_json_construct",
    oracle="""
        SELECT o_orderkey,
               o_orderstatus AS status,
               round(o_totalprice, 2) AS price
        FROM orders
        WHERE o_orderkey < 100
    """,
    doc="JSON construction round-trip: struct -> to_json -> "
    "json_tuple/from_json -> typed columns. The oracle recomputes the "
    "projected values directly — the contract under test is that "
    "Spark's serialize/reparse cycle is lossless for the typed values "
    "(string formatting of doubles is normalized by the round). "
    "to_json/from_json are codegen'd JVM ops — this is the wire format "
    "for event buses, no Python in the path.",
    tags=("sql-surface", "E9"),
)
def q_json_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    payload = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("key"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("price"),
        )
    )
    schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("status", T.StringType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    parsed = F.from_json(payload, schema)
    return o.select(
        parsed["key"].alias("o_orderkey"),
        parsed["status"].alias("status"),
        F.round(parsed["price"], 2).alias("price"),
    )


@register(
    "q_try_funcs",
    oracle="""
        SELECT o_orderkey,
               round(o_totalprice / NULLIF(o_custkey % 3, 0), 4) AS per_unit,
               TRY_CAST(o_orderpriority AS INT) AS prio_num,
               TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_digit
        FROM orders
        WHERE o_orderkey < 200
    """,
    doc="ANSI error-safe functions: Spark 4 runs ANSI mode by default "
    "(division by zero / bad casts are runtime ERRORS), so pipelines "
    "use try_divide/try_cast to degrade to NULL per-row instead of "
    "failing the job on one poison record. DuckDB mirrors with "
    "NULLIF-guarded division and TRY_CAST.",
    tags=("sql-surface",),
)
def q_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return o.select(
        "o_orderkey",
        F.round(F.try_divide("o_totalprice", F.col("o_custkey") % 3), 4).alias(
            "per_unit"
        ),
        F.col("o_orderpriority").try_cast("int").alias("prio_num"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_digit"),
    )


@register(
    "q_union_missing_cols",
    oracle="""
        SELECT n_nationkey, n_name, NULL AS iso_code FROM nation
        UNION ALL
        SELECT n_nationkey, n_name, upper(substr(n_name, 1, 3)) AS iso_code
        FROM nation
    """,
    doc="unionByName(allowMissingColumns=True): schema-widening union — "
    "the old batch lacks the new column and surfaces NULL. This is the "
    "DataFrame-level twin of q_schema_evolution's on-read merge; at "
    "scale it's how backfill jobs append old and new extract versions "
    "in one pass.",
    tags=("sql-surface", "E6"),
)
def q_union_missing_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    new = nat.withColumn("iso_code", F.upper(F.substring("n_name", 1, 3)))
    return nat.unionByName(new, allowMissingColumns=True).select(
        "n_nationkey", "n_name", "iso_code"
    )


@register(
    "q_recursive_cte",
    oracle="""
        WITH RECURSIVE h(c_custkey, anc, depth) AS (
            SELECT c_custkey, c_custkey // 10, 1
            FROM customer WHERE c_custkey > 0
            UNION ALL
            SELECT c_custkey, anc // 10, depth + 1
            FROM h WHERE anc > 0
        )
        SELECT c_custkey,
               CAST(max(depth) AS INT) AS depth,
               CAST(count(*) AS BIGINT) AS n_ancestors,
               CAST(sum(anc) AS BIGINT) AS anc_sum
        FROM h GROUP BY c_custkey
    """,
    doc="RECURSIVE CTE (Spark 4's WITH RECURSIVE): ancestor chains in "
    "the decimal key hierarchy (parent = key div 10 — a forest rooted "
    "at 0, strictly decreasing so the recursion provably terminates in "
    "ceil(log10(max key)) rounds): per customer its hierarchy depth, "
    "ancestor count, and ancestor-key checksum. Each recursion round is "
    "one join-free projection over the previous frontier — the "
    "iterative-frontier shape (org charts, BOM explosions, reachability) "
    "that previously required driver-side loop unrolling (pagerank's "
    "pattern); the engine now expresses it declaratively and the same "
    "recursion runs on DuckDB (// == DIV spelling aside).",
    tags=("sql-surface", "E1"),
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql("""
        WITH RECURSIVE h(c_custkey, anc, depth) AS (
            SELECT c_custkey, c_custkey DIV 10, 1
            FROM customer WHERE c_custkey > 0
            UNION ALL
            SELECT c_custkey, anc DIV 10, depth + 1
            FROM h WHERE anc > 0
        )
        SELECT c_custkey,
               CAST(max(depth) AS INT) AS depth,
               count(*) AS n_ancestors,
               CAST(sum(anc) AS BIGINT) AS anc_sum
        FROM h GROUP BY c_custkey
    """)
