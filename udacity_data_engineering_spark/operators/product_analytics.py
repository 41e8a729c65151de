"""Event-stream product analytics: funnel conversion and retention
cohorts — the standard activity-log workloads for an events table (the
reference's log dataset is exactly this shape, README.md:33; it only ever
filters it, etl.py:109 — these are the analyses a drop-in engine owes).

Both are two-phase aggregations over one table: groupBy-min to anchor
each user (signup time / cohort week), then a join back and a second
aggregate. Anchors are user-cardinality (small); Catalyst broadcasts
them, so the events fact streams through exactly once per phase.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


@register(
    "q_funnel",
    oracle="""
        WITH s AS (
            SELECT user_id, min(ts) AS signup_ts
            FROM events WHERE event_type = 'signup' GROUP BY user_id
        ), p AS (
            SELECT e.user_id, min(e.ts) AS first_purchase_ts
            FROM events e JOIN s ON e.user_id = s.user_id
                               AND e.ts >= s.signup_ts
            WHERE e.event_type = 'purchase'
            GROUP BY e.user_id
        )
        SELECT s.user_id, s.signup_ts, p.first_purchase_ts,
               CAST(p.user_id IS NOT NULL AS BOOLEAN) AS converted
        FROM s LEFT JOIN p ON s.user_id = p.user_id
    """,
    doc="Funnel: signup -> first subsequent purchase per user, with a "
    "conversion flag. Two min-aggregations + a broadcast-able left join.",
    tags=("analytics", "events"),
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(signups, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    return (
        signups.join(purchases, "user_id", "left")
        .select(
            "user_id",
            "signup_ts",
            "first_purchase_ts",
            F.col("first_purchase_ts").isNotNull().alias("converted"),
        )
    )


@register(
    "q_retention_cohorts",
    oracle="""
        WITH first AS (
            SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
            FROM events GROUP BY user_id
        ), act AS (
            SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
            FROM events
        )
        SELECT f.cohort_week,
               CAST(date_diff('day', f.cohort_week, a.active_week) / 7 AS INT)
                   AS week_offset,
               count(DISTINCT a.user_id) AS n_users
        FROM act a JOIN first f ON a.user_id = f.user_id
        GROUP BY 1, 2
    """,
    doc="Retention triangle: users bucketed by first-activity week "
    "(cohort), counted per subsequent active week. Both engines truncate "
    "weeks to ISO Monday, so offsets are exact multiples of 7 days.",
    tags=("analytics", "events"),
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # cast to DATE: Spark date_trunc yields timestamp, DuckDB yields DATE
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("active_week")
    ).distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def attribute_touches(
    events: DataFrame,
    conversion_type: str = "purchase",
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    type_col: str = "event_type",
    measure_col: str = "value",
) -> DataFrame:
    """Per-conversion first/last-touch attribution: every conversion
    event gets the FIRST and the most recent (LAST) non-conversion
    event type strictly before it in the key's (ts, tiebreak) stream —
    the two canonical marketing-attribution models. Conversions with no
    prior touch attribute to NULL ('direct').

    The full column contract is parametric (ADVICE r13 closed the
    hardcoded event_type/value gap): ``type_col`` names the channel/
    event-type column, ``measure_col`` the per-conversion measure
    carried through for downstream revenue rollups — so non-events
    schemas (orders, ad impressions) attribute without renaming.

    One window per key with a [unbounded, -1] frame carrying
    first/last non-conversion types forward — the same single-shuffle
    cost class as sessionization; never a self-join of conversions
    against touches (O(conversions x touches) per key).
    """
    w = (
        Window.partitionBy(key)
        .orderBy(ts, tiebreak)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col(type_col) != conversion_type, F.col(type_col))
    with_touches = events.select(
        key,
        ts,
        tiebreak,
        type_col,
        measure_col,
        F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
    )
    return with_touches.filter(F.col(type_col) == conversion_type)


@register(
    "q_attribution",
    oracle="""
        WITH t AS (
            SELECT event_type, value,
                   first_value(CASE WHEN event_type <> 'purchase'
                                    THEN event_type END IGNORE NULLS)
                       OVER w AS first_touch,
                   last_value(CASE WHEN event_type <> 'purchase'
                                   THEN event_type END IGNORE NULLS)
                       OVER w AS last_touch
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        )
        SELECT coalesce(first_touch, 'direct') AS first_touch,
               coalesce(last_touch, 'direct') AS last_touch,
               count(*) AS n_conversions,
               round(sum(value), 2) AS revenue
        FROM t WHERE event_type = 'purchase'
        GROUP BY 1, 2
    """,
    doc="First/last-touch conversion attribution: each purchase is "
    "credited to the first and the most recent non-purchase event type "
    "strictly before it in the user's stream (no prior touch = "
    "'direct'), rolled up to (first_touch, last_touch) conversion "
    "counts and revenue. One per-user window with an [unbounded, -1] "
    "frame — single shuffle, never a conversions x touches self-join. "
    "Both engines evaluate the identical IGNORE NULLS frame.",
    tags=("E5", "analytics", "llm-pipeline"),
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    conv = attribute_touches(ev)
    return conv.groupBy(
        F.coalesce("first_touch", F.lit("direct")).alias("first_touch"),
        F.coalesce("last_touch", F.lit("direct")).alias("last_touch"),
    ).agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.round(F.sum("value"), 2).alias("revenue"),
    )
