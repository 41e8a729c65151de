"""As-of (point-in-time) join — E8 (SURVEY.md §2B).

Spark has no native ASOF JOIN; the naive formulation (non-equi join on
``ts >= p_ts`` + keep-latest) explodes to O(events × matches) pairs before
pruning, which is fatal at scale. We instead use the union-merge technique:
tag both streams, union them, and carry the latest right-side row forward
with a ``last(..., ignorenulls=True)`` running window per key. Cost: one
shuffle on the key + one sort — the same cost class as a single window
function, independent of match fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...] = (),
    right_tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row at-or-before
    (``direction='backward'``, default: latest ``right.ts <= left.ts``)
    or at-or-after (``direction='forward'``: earliest ``right.ts >=
    left.ts``) with the same ``on`` key — both inclusive.

    Scales as one shuffle on ``on`` + per-partition sort; no pairwise
    blow-up. Forward is the same union-merge with the traversal
    reversed (descending timestamps), so the carried value is the
    smallest right timestamp at or after each left row. Right-side ties
    on (key, ts) are partition-order-dependent unless ``right_tiebreak``
    names a right column: then one tiebreak winner is picked
    deterministically on every run (ADVICE r1 — required whenever right
    timestamps are not unique per key).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    rcols = list(right_cols)
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        (F.col(right_tiebreak) if right_tiebreak else F.lit(0)).alias("__tb"),
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(f"__l_{c}")
            for c in left.columns
            if c != on
        ],
    )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None)
        .cast(dict(right.dtypes)[right_tiebreak] if right_tiebreak else "int")
        .alias("__tb"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in rcols],
        *[F.col(c).alias(f"__l_{c}") for c in left.columns if c != on],
    )
    ts_order = (
        F.asc("__ts") if direction == "backward" else F.desc("__ts")
    )
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, "__side", F.asc_nulls_first("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).select(
        "*", *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}") for c in rcols]
    )
    out = carried.filter(F.col("__side") == 1).select(
        F.col(on),
        *[F.col(f"__l_{c}").alias(c) for c in left.columns if c != on],
        *[F.col(f"__m_{c}").alias(f"{c}_matched") for c in rcols],
    )
    return out


@register(
    "q_asof_join",
    oracle="""
        SELECT e.event_id, e.user_id, e.ts,
               p.event_id AS purchase_event_id, p.ts AS purchase_ts
        FROM events e
        ASOF LEFT JOIN (
            SELECT user_id, ts, event_id FROM events
            WHERE event_type = 'purchase') p
          ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
    doc="E8: as-of join — each event matched to the latest 'purchase' by "
    "the same user at or before its timestamp. Implemented via the "
    "union-merge pattern (no pairwise explosion); the DuckDB oracle uses "
    "its native ASOF LEFT JOIN, which has identical inclusive semantics.",
    tags=("E8",),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    left = ev.select("user_id", "ts", "event_id")
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(left, right, on="user_id", right_cols=("event_id", "ts"))
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("event_id_matched").alias("purchase_event_id"),
        F.col("ts_matched").alias("purchase_ts"),
    )


@register(
    "q_asof_forward",
    oracle="""
        SELECT e.event_id, e.user_id, e.ts,
               p.event_id AS next_purchase_event_id, p.ts AS next_purchase_ts
        FROM events e
        ASOF LEFT JOIN (
            SELECT user_id, ts, event_id FROM events
            WHERE event_type = 'purchase') p
          ON e.user_id = p.user_id AND e.ts <= p.ts
    """,
    doc="E8: forward as-of join — each event matched to the EARLIEST "
    "'purchase' by the same user at or after its timestamp (time-to-"
    "conversion shape). Same union-merge cost class as the backward "
    "variant: one shuffle + one sort, traversed in descending time; "
    "the DuckDB oracle is native forward ASOF (ts <= p.ts).",
    tags=("E8",),
)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    left = ev.select("user_id", "ts", "event_id")
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(
        left, right, on="user_id", right_cols=("event_id", "ts"),
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("event_id_matched").alias("next_purchase_event_id"),
        F.col("ts_matched").alias("next_purchase_ts"),
    )
