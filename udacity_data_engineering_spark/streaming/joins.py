"""Stream-stream joins (E14): watermarked interval join between two
event streams.

Both sides carry a watermark and the join condition bounds the time
skew, so the state store can evict rows once the other side's watermark
passes — the only way a stream-stream join runs with bounded state.
Unbounded-condition stream joins are rejected by Spark for exactly the
reason they'd die at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchases_after_signup(
    events: DataFrame, within: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Join each purchase to the same user's signup that happened at most
    ``within`` before it — the streaming form of the funnel join
    (operators/product_analytics.q_funnel anchors on the batch side).

    State bound: signups are kept only until purchase-side watermark
    passes signup_ts + within.
    """
    signups = (
        events.filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("s_user_id"),
            F.col("ts").alias("signup_ts"),
        )
        .withWatermark("signup_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("purchase_ts"), "value")
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        signups,
        (F.col("user_id") == F.col("s_user_id"))
        & (F.col("purchase_ts") >= F.col("signup_ts"))
        & (F.col("purchase_ts") <= F.col("signup_ts") + F.expr(f"INTERVAL {within}")),
        "inner",
    ).select("user_id", "signup_ts", "purchase_ts", "value")


def signups_with_conversion(
    events: DataFrame, within: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """LEFT OUTER watermarked stream-stream join: every signup, with the
    user's first-hour purchase columns null if they did not convert —
    the canonical conversion-tracking shape.

    Outer stream joins are the subtle case: a null (no-conversion) row
    can only be emitted once the GLOBAL watermark — the MIN of the two
    sides' watermarks under Spark's default multipleWatermarkPolicy —
    has passed ``signup_ts + within``; before that, a matching purchase
    could still arrive. So non-conversions emit with a delay of
    ``within + watermark``, and signups newer than (min side max event
    time - watermark - within) at shutdown have emitted nothing yet: an
    availableNow replay reports them in NEITHER branch (exactly-once,
    late-complete — the batch-parity test pins this boundary). State
    stays bounded for the same reason as the inner join: both sides
    evict once the global watermark passes their join bound."""
    signups = (
        events.filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("s_user_id"),
            F.col("ts").alias("signup_ts"),
        )
        .withWatermark("signup_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("purchase_ts"), "value")
        .withWatermark("purchase_ts", watermark)
    )
    return signups.join(
        purchases,
        (F.col("s_user_id") == F.col("user_id"))
        & (F.col("purchase_ts") >= F.col("signup_ts"))
        & (F.col("purchase_ts") <= F.col("signup_ts") + F.expr(f"INTERVAL {within}")),
        "leftOuter",
    ).select(
        F.col("s_user_id").alias("user_id"), "signup_ts", "purchase_ts", "value"
    )
