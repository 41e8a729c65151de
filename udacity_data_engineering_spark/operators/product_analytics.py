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


def funnel_ordered(
    events: DataFrame,
    steps: list[str],
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered multi-step funnel: per key, step i+1 counts only when an
    event of its type occurs STRICTLY AFTER the key's chosen (earliest
    valid) step-i event — the N-step generalization of q_funnel's
    signup->purchase pair, and the semantics a naive "has all N types"
    check gets wrong (purchase BEFORE view must not convert).

    Returns one row per step: (step, n_users), n monotonically
    non-increasing down the funnel. Plan shape: each step's anchor
    timestamp is a per-key window aggregate conditioned on the previous
    anchor — N chained Window operators over the SAME partitioning, so
    Catalyst plans ONE shuffle on the key for all of them, then a single
    bounded global rollup (1 row per step). Never a step-vs-step
    self-join (O(N x events) rescans) and never a per-key collect.
    """
    if len(steps) < 2:
        raise ValueError(f"a funnel needs >= 2 steps, got {steps}")
    w = Window.partitionBy(key)
    df = events.select(key, ts, type_col)
    prev: str | None = None
    labels = []
    for i, s in enumerate(steps):
        c = f"__t{i}"
        cond = F.col(type_col) == s
        if prev is not None:
            cond = cond & (F.col(ts) > F.col(prev))
        df = df.withColumn(c, F.min(F.when(cond, F.col(ts))).over(w))
        labels.append((c, f"{i + 1}_{s}"))
        prev = c
    per_key = df.groupBy(key).agg(
        *[F.min(c).alias(c) for c, _ in labels]
    )
    counts = per_key.agg(
        *[F.count(F.col(c)).alias(lab) for c, lab in labels]
    )
    return counts.unpivot(
        [], [lab for _, lab in labels], "step", "n_users"
    )


@register(
    "q_funnel_ordered",
    oracle="""
        WITH t1 AS (
            SELECT user_id, min(ts) AS ts1
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ), t2 AS (
            SELECT e.user_id, min(e.ts) AS ts2
            FROM events e JOIN t1 USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > t1.ts1
            GROUP BY e.user_id
        ), t3 AS (
            SELECT e.user_id, min(e.ts) AS ts3
            FROM events e JOIN t2 USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
            GROUP BY e.user_id
        )
        SELECT '1_view' AS step, count(*) AS n_users FROM t1
        UNION ALL SELECT '2_click', count(*) FROM t2
        UNION ALL SELECT '3_purchase', count(*) FROM t3
    """,
    doc="Ordered 3-step funnel view -> click -> purchase: each step "
    "counts a user only when it happens strictly after their chosen "
    "earliest previous-step event (a purchase before the first view "
    "does NOT convert — the ordering constraint ad-hoc type-set checks "
    "miss). Chained conditional min-windows over one partitioning = ONE "
    "shuffle for all steps; DuckDB recomputes via nested anchor CTEs.",
    tags=("E5", "analytics", "events"),
)
def q_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return funnel_ordered(ev, ["view", "click", "purchase"])


def event_paths(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-key ordered event-type PATH: (key, n_events, path) where path
    is the '->'-joined event-type sequence in (ts, tiebreak) order — the
    MATCH_RECOGNIZE-lite substrate: any sequence question (did the user
    ever view->...->purchase? how many error loops?) becomes a regex/
    string question on one row per key.

    Deterministic by construction: collect_list order is undefined, so
    the types are collected as (ts, tiebreak, type) structs and
    sort_array imposes the total order before joining — one hash
    aggregate, no window, no per-key collect to the driver. Path length
    is bounded by the per-key event count; for keys with millions of
    events cap upstream (events are already session-windowed in any
    real path analysis).

    Rows with a NULL ts or tiebreak are dropped: an event with no
    ordering key has no defined position in the path, and engines
    disagree on NULL placement (Spark's sort_array sorts NULL struct
    fields first, SQL ORDER BY defaults them last), so the contract is
    made explicit instead of engine-dependent (ADVICE r14).
    """
    triple = F.struct(
        F.col(ts).alias("t"), F.col(tiebreak).alias("tb"),
        F.col(type_col).alias("ty"),
    )
    return (
        events.filter(F.col(ts).isNotNull() & F.col(tiebreak).isNotNull())
        .groupBy(key)
        .agg(F.sort_array(F.collect_list(triple)).alias("__seq"))
        .select(
            key,
            F.size("__seq").alias("n_events"),
            F.array_join(
                F.transform("__seq", lambda s: s["ty"]), "->"
            ).alias("path"),
        )
    )


@register(
    "q_event_paths",
    oracle="""
        SELECT user_id,
               count(*) AS n_events,
               string_agg(event_type, '->' ORDER BY ts, event_id) AS path,
               CAST(regexp_matches(
                   string_agg(event_type, '->' ORDER BY ts, event_id),
                   'view.*click.*purchase') AS BOOLEAN) AS has_funnel
        FROM events
        WHERE ts IS NOT NULL AND event_id IS NOT NULL
        GROUP BY user_id
    """,
    doc="MATCH_RECOGNIZE-lite sequence analysis: each user's full "
    "event-type path in (ts, event_id) order as one string, plus a "
    "regex verdict (a view later followed by a click then a purchase, "
    "any gaps). Order imposed by sort_array over (ts, tiebreak, type) "
    "structs inside the aggregate — deterministic without a window, "
    "one shuffle. DuckDB rebuilds the identical paths with ordered "
    "string_agg and the same regex.",
    tags=("E5", "E10", "analytics", "events"),
)
def q_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    paths = event_paths(ev)
    return paths.select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        "path",
        F.col("path").rlike("view.*click.*purchase").alias("has_funnel"),
    )
