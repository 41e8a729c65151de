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
