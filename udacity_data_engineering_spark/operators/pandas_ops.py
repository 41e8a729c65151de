"""Custom operators on the Pandas-UDF slow path — the charter's pattern
for semantics the built-ins can't express (SURVEY.md §2B, 'custom
operators' tier b). Everything here is Arrow-batched (``applyInPandas`` /
``pandas_udf``), never row-at-a-time Python.

q_group_zscore is deliberately *also* expressible with window functions —
that equivalence is what makes the Pandas machinery oracle-checkable:
the DuckDB oracle computes the same z-scores with avg/stddev windows.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table

ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("zscore", T.DoubleType()),
    ]
)


def group_zscore(events: DataFrame) -> DataFrame:
    """Per-event-type z-score of ``value`` via applyInPandas: one shuffle
    on the group key, then vectorized numpy math per group partition.
    Sample (ddof=1) standard deviation, matching SQL stddev_samp."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=1)
        z = (pdf["value"] - mu) / sd if sd and sd > 0 else pdf["value"] * 0.0
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "zscore": z.round(4),
            }
        )

    return events.select("event_id", "event_type", "value").groupBy(
        "event_type"
    ).applyInPandas(kernel, ZSCORE_SCHEMA)


@register(
    "q_group_zscore",
    oracle="""
        SELECT event_id, event_type,
               round((value - avg(value) OVER w) / stddev_samp(value) OVER w, 4)
                   AS zscore
        FROM events
        WINDOW w AS (PARTITION BY event_type)
    """,
    doc="Custom grouped-normalization operator on the applyInPandas path "
    "(Arrow batches, numpy kernel). Oracle: identical z-scores via SQL "
    "window avg/stddev_samp — proving the Pandas machinery end-to-end.",
    tags=("pandas", "E10"),
)
def q_group_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    return group_zscore(table(spark, sf_dir, "events"))
