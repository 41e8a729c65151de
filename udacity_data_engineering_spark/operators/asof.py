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
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` and the same ``on`` key (inclusive as-of).

    Scales as one shuffle on ``on`` + per-partition sort; no pairwise
    blow-up. Right-side ties on (key, ts) are partition-order-dependent
    unless ``right_tiebreak`` names a right column: then the greatest
    tiebreak value wins deterministically on every run (ADVICE r1 —
    required whenever right timestamps are not unique per key).
    """
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
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side", F.asc_nulls_first("__tb"))
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
