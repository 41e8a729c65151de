"""UDF-surface completion: Python UDTF (table function), Pandas
grouped-aggregate UDAF, exact percentiles, and range-frame windows.

The reference's entire UDF surface is one scalar UDF (etl.py:124);
SURVEY.md §2A notes UDAF/UDTF are explicitly absent. A drop-in engine
needs the full ladder, each at the right performance tier:
scalar builtin < pandas UDAF (Arrow) < Python UDTF (row generator —
use only where output cardinality varies per row).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.window import Window

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


class NGramUDTF:
    """Word n-gram generator as a Python UDTF — one input row fans out to
    a variable number of output rows. (The JVM-side equivalent for this
    particular task is shingles() in similarity.py; the UDTF exists to
    cover the table-function surface with a genuinely generative op.)

    The udtf()/pandas_udf() decorators in this module are applied inside
    the query functions, not at module scope: both parse their DDL type
    strings eagerly and need a live session, which Python UDF workers
    (re-importing this package) and pre-session imports don't have.
    """

    def eval(self, text: str, n: int):
        words = (text or "").split(" ")
        for i in range(max(len(words) - n + 1, 0)):
            yield " ".join(words[i : i + n]), i


@register(
    "q_udtf_ngrams",
    oracle="""
        SELECT doc_id,
               array_to_string(words[i:i+2], ' ') AS ngram,
               CAST(i - 1 AS INT) AS pos
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
             LATERAL (SELECT unnest(range(1, greatest(len(words) - 2, 0) + 1)) AS i)
    """,
    doc="Python UDTF producing word 3-grams with positions, lateral-"
    "joined per document. Oracle: the same expansion via DuckDB list "
    "slicing (1-based, hence pos = i-1).",
    tags=("udf",),
)
def q_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("ngrams", udtf(NGramUDTF, returnType="ngram: string, pos: int"))
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        "SELECT d.doc_id, ng.ngram, ng.pos "
        "FROM documents d, LATERAL ngrams(d.text, 3) AS ng"
    )


def make_median_udaf():
    """Grouped-aggregate Pandas UDAF: exact median (interpolated), the
    canonical non-decomposable aggregate the builtin hash agg can't do
    in one pass. Arrow ships each group's column once. Built lazily —
    see NGramUDTF docstring."""

    @pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(v.median())

    return median_udaf


@register(
    "q_pandas_udaf_median",
    oracle="""
        SELECT event_type, round(median(value), 6) AS med_value
        FROM events GROUP BY event_type
    """,
    doc="Pandas grouped-agg UDAF (exact median) vs DuckDB median — both "
    "linear-interpolated, so values oracle-match.",
    tags=("udf",),
)
def q_pandas_udaf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(make_median_udaf()("value"), 6).alias("med_value")
    )


@register(
    "q_percentiles",
    oracle="""
        SELECT event_type,
               round(quantile_cont(value, 0.25), 6) AS p25,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.75), 6) AS p75
        FROM events GROUP BY event_type
    """,
    doc="Exact interpolated percentiles per group (Spark percentile == "
    "DuckDB quantile_cont). The approx_percentile variant is the 100 TB "
    "path (t-digest, mergeable) — exact percentile requires a per-group "
    "sort and is the deliberate small-data tier.",
    tags=("udf", "E1"),
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        *[
            F.round(F.expr(f"percentile(value, {p})"), 6).alias(f"p{int(p*100)}")
            for p in (0.25, 0.5, 0.75)
        ]
    )


@register(
    "q_window_range_frame",
    oracle="""
        SELECT event_id, user_id,
               round(sum(value) OVER (
                   PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                   RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW), 2)
                   AS rolling_1h
        FROM events
    """,
    doc="RANGE-frame window: per-user rolling 1-hour sum keyed on epoch "
    "seconds — a value-based frame (all rows within 3599s), not a row "
    "count. Both engines floor ts to whole seconds so frame membership "
    "is identical.",
    tags=("E5",),
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").withColumn(
        "sec", F.col("ts").cast("timestamp").cast("long")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3599, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("rolling_1h"),
    )
