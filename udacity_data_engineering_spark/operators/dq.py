"""Declarative data-quality constraint checks (the Deequ/expectations
surface).

A pipeline that ingests 100 TB/day gates promotion on constraint checks:
key uniqueness, completeness, value domains, referential integrity. The
naive implementation runs one job per constraint — N scans of the fact
table. Here every single-table constraint compiles into ONE conditional
aggregate over ONE scan (count/sum(CASE) columns computed together in
the same partial-agg pass), unpivoted to a (check, violations, passed)
report frame; cross-table referential checks add one anti-join count
each. N constraints ≈ 1 scan + one tiny shuffle per referenced table.

``check_suite`` is the reusable operator: pass any DataFrame and a list
of (name, violation_predicate) pairs, plus optional uniqueness keys and
referential (fk_frame-free) checks built by the caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


def check_suite(
    df: DataFrame,
    predicates: list[tuple[str, F.Column]],
    unique_keys: list[tuple[str, list[str]]] | None = None,
) -> DataFrame:
    """Violation counts for a set of constraints over ``df`` in one scan.

    ``predicates``: (check_name, violation_condition) — a row matching
    the condition VIOLATES the check. ``unique_keys``: (check_name,
    key_cols) — violations = rows beyond the first per key value
    (count - count_distinct, exact). Returns (check, violations,
    passed) with one row per constraint.
    """
    # coalesce: sum() over an EMPTY frame is NULL, but a gate over zero
    # rows has zero violations (and must report passed, not unknown)
    aggs = [
        F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias(name)
        for name, cond in predicates
    ]
    for name, keys in unique_keys or ():
        aggs.append(
            (
                F.count(F.lit(1))
                - F.count_distinct(*[F.col(k) for k in keys])
            ).alias(name)
        )
    wide = df.agg(*aggs)
    names = [name for name, _ in predicates] + [
        name for name, _ in (unique_keys or ())
    ]
    # unpivot the single wide row into the report frame
    stack = F.expr(
        "stack({}, {}) as (check, violations)".format(
            len(names),
            ", ".join(f"'{n}', `{n}`" for n in names),
        )
    )
    return wide.select(stack).withColumn(
        "passed", F.col("violations") == 0
    )


def referential_check(
    name: str, child: DataFrame, parent: DataFrame, fk: str, pk: str
) -> DataFrame:
    """Orphan count: child rows whose ``fk`` has no matching ``pk``.
    One anti-join (broadcast when the parent key column is dim-sized;
    AQE picks for fact-fact)."""
    orphans = child.select(F.col(fk).alias(pk)).join(
        parent.select(pk), pk, "left_anti"
    )
    return orphans.agg(
        F.lit(name).alias("check"),
        F.count(F.lit(1)).alias("violations"),
    ).withColumn("passed", F.col("violations") == 0)


@register(
    "q_dq_checks",
    oracle="""
        SELECT 'orders_key_unique' AS check,
               CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
                   AS violations,
               count(*) - count(DISTINCT o_orderkey) = 0 AS passed
        FROM orders
        UNION ALL
        SELECT 'orders_custkey_complete',
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT),
               sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0
        FROM orders
        UNION ALL
        SELECT 'orders_totalprice_positive',
               CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                    AS BIGINT),
               sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) = 0
        FROM orders
        UNION ALL
        SELECT 'orders_status_domain',
               CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                        THEN 1 ELSE 0 END) AS BIGINT),
               sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                        THEN 1 ELSE 0 END) = 0
        FROM orders
        UNION ALL
        SELECT 'lineitem_orderkey_refs_orders',
               CAST((SELECT count(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey))
                    AS BIGINT),
               (SELECT count(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey)) = 0
    """,
    doc="Declarative data-quality gate (the Deequ/expectations shape): "
    "key uniqueness, completeness, positivity, and value-domain checks "
    "over orders compiled into ONE conditional aggregate over ONE scan "
    "(never a job per constraint), plus lineitem->orders referential "
    "integrity as one anti-join count — N constraints at the cost of "
    "one table pass. Hash-proven: DuckDB recomputes every violation "
    "count and pass flag.",
    tags=("E1", "sql-surface", "llm-pipeline"),
)
def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    single = check_suite(
        orders,
        predicates=[
            ("orders_custkey_complete", F.col("o_custkey").isNull()),
            ("orders_totalprice_positive", F.col("o_totalprice") <= 0),
            (
                "orders_status_domain",
                ~F.col("o_orderstatus").isin("O", "F", "P"),
            ),
        ],
        unique_keys=[("orders_key_unique", ["o_orderkey"])],
    )
    ref = referential_check(
        "lineitem_orderkey_refs_orders",
        lineitem,
        orders,
        fk="l_orderkey",
        pk="o_orderkey",
    )
    return single.unionByName(ref)


def observed_write(
    df: DataFrame,
    path: str,
    predicates: list[tuple[str, F.Column]],
    fmt: str = "parquet",
) -> DataFrame:
    """Write ``df`` while collecting DQ violation metrics IN THE SAME
    JOB via the Observation API — the zero-extra-pass monitoring shape:
    ``check_suite`` costs one dedicated scan; ``df.observe(...)``
    piggybacks the conditional aggregates onto the write's own pass, so
    a 100 TB promotion job gets its quality report for free.

    Returns the (check, violations, passed) report frame (tiny,
    driver-built from the observed metrics after the write completes).
    """
    from pyspark.sql import Observation

    obs = Observation()
    aggs = [
        F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias(name)
        for name, cond in predicates
    ]
    df.observe(obs, *aggs).write.mode("overwrite").format(fmt).save(path)
    got = obs.get  # blocks until the action's metrics arrive
    spark = df.sparkSession
    return spark.createDataFrame(
        [(name, got[name], got[name] == 0) for name, _ in predicates],
        "check string, violations long, passed boolean",
    )


@register(
    "q_dq_observed_write",
    oracle="""
        SELECT 'custkey_complete' AS check,
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS violations,
               sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0 AS passed
        FROM orders
        UNION ALL
        SELECT 'totalprice_positive',
               CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                    AS BIGINT),
               sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) = 0
        FROM orders
        UNION ALL
        SELECT 'priority_domain',
               CAST(sum(CASE WHEN o_orderpriority NOT IN
                   ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
                   THEN 1 ELSE 0 END) AS BIGINT),
               sum(CASE WHEN o_orderpriority NOT IN
                   ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
                   THEN 1 ELSE 0 END) = 0
        FROM orders
    """,
    doc="DQ metrics collected DURING the write via df.observe (the "
    "Observation API): the orders table is written to the lake and its "
    "completeness / positivity / domain violation counts arrive as "
    "observed metrics of the write job itself — zero extra scans, the "
    "pattern that makes per-promotion quality reports free at 100 TB "
    "(check_suite's dedicated-scan shape remains for gate-without-write "
    "uses). Hash-proven: DuckDB recomputes the same three aggregates.",
    tags=("E1", "sql-surface", "llm-pipeline"),
)
def q_dq_observed_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    from udacity_data_engineering_spark.sources.parquet_source import (
        scratch_dir,
    )

    orders = table(spark, sf_dir, "orders")
    return observed_write(
        orders,
        scratch_dir("dq_observed_out"),
        predicates=[
            ("custkey_complete", F.col("o_custkey").isNull()),
            ("totalprice_positive", F.col("o_totalprice") <= 0),
            (
                "priority_domain",
                ~F.col("o_orderpriority").isin(
                    "1-URGENT", "2-HIGH", "3-MEDIUM",
                    "4-NOT SPECIFIED", "5-LOW",
                ),
            ),
        ],
    )
