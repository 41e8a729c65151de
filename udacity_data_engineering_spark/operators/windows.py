"""Window functions + event-time windows — E5 and E13 (SURVEY.md §2B).

Ranking/analytic windows are stock ``Window`` specs (one shuffle on the
partition key, sort within partitions). Event-time tumbling/session windows
use ``F.window`` / ``F.session_window`` in *batch* mode on the ``events``
table — the exact same expressions run under Structured Streaming (see
streaming/), which is how batch/stream parity is kept by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


@register(
    "q_window_rank",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
            FROM orders) t
        WHERE rnk <= 3
    """,
    doc="E5a: ranking window — top-3 orders per customer via row_number "
    "with a deterministic tie-break.",
    tags=("E5",),
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@register(
    "q_window_running",
    oracle="""
        SELECT event_id, user_id,
               round(sum(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS running_value,
               lag(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        FROM events
    """,
    doc="E5b: analytic window — running sum with an explicit ROWS frame "
    "plus lag(), per user ordered by event time.",
    tags=("E5",),
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(frame), 2).alias("running_value"),
        F.lag("value").over(w).alias("prev_value"),
    )


@register(
    "q_tumbling_agg",
    oracle="""
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(*) AS cnt, round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    doc="E13a: tumbling 1-hour event-time window aggregate. F.window "
    "buckets are epoch-aligned, so a 1h tumble == date_trunc('hour') in "
    "the oracle. Plain hash aggregate on (bucket, type) — identical "
    "expression runs under readStream + watermark in streaming/.",
    tags=("E13",),
)
def q_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt", "sum_value")
    )


@register(
    "q_sliding_window",
    oracle="""
        SELECT window_start, event_type, count(*) AS cnt,
               round(sum(value), 2) AS sum_value
        FROM (
            SELECT make_timestamp(
                       ((CAST(floor(epoch(ts) / 900) AS BIGINT) - k) * 900)
                       * 1000000) AS window_start,
                   event_type, value
            FROM events
            CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) shifts
        ) t
        GROUP BY 1, 2
    """,
    doc="E13c: sliding event-time window — 1-hour window every 15 minutes. "
    "Each event lands in window/slide = 4 overlapping buckets; Spark's "
    "Expand node materializes the 4 (bucket, row) copies before one hash "
    "aggregate, so the shuffle carries 4x rows of (bucket, type) partials "
    "— still bounded by cardinality, never by corpus size. Oracle "
    "reproduces the epoch-aligned bucket set by shifting the 15-minute "
    "tumble k=0..3 slides back. Same expression runs under readStream "
    "(streaming/event_stream.py windowed_counts with slide=).",
    tags=("E13",),
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt", "sum_value")
    )


@register(
    "q_session_window",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            -- sid only feeds GROUP BY, but cast anyway: DuckDB windowed
            -- sum() widens to HUGEINT and one refactor away from the
            -- output column it would hash-fail the driver (VERDICT r11).
            SELECT user_id, ts,
                   CAST(sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS sid
            FROM flagged
        )
        SELECT user_id, min(ts) AS session_start, count(*) AS n_events
        FROM sess GROUP BY user_id, sid
    """,
    doc="E13b: session window with a 30-minute gap. Spark side uses the "
    "native session_window operator (merging-interval aggregate); the "
    "oracle reproduces the semantics as a gaps-and-islands window query — "
    "events merge while each starts strictly within (prev start + gap).",
    tags=("E13",),
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n_events"
        )
    )


@register(
    "q_gap_sessionize",
    oracle="""
        WITH flagged AS (
            SELECT event_id, user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT event_id, user_id, ts,
               CAST(sum(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_seq
        FROM flagged
    """,
    doc="Gaps-and-islands sessionization: assigns each EVENT its session "
    "ordinal per user (30-minute inactivity gap) via lag + running sum — "
    "the per-event labeling q_session_window's merged aggregate cannot "
    "give you. One shuffle on user_id; both window passes reuse the same "
    "partitioning. Oracle is the identical window query in DuckDB.",
    tags=("E5", "E13"),
)
def q_gap_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    new_sess = (
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") > F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0)
    )
    return ev.withColumn("new_sess", new_sess).withColumn(
        "session_seq",
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    ).drop("new_sess")
