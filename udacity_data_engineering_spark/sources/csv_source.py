"""CSV source/sink — beyond the reference's JSON+parquet matrix.

Same reader discipline as JSON: declared schema, explicit mode; header
round-trips. CSV is the interchange fallback, not a lake format — no
column pruning or predicate pushdown exists for it, which is why the
lake stays parquet (SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table
from udacity_data_engineering_spark.sources.parquet_source import scratch_dir


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").csv(path)


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    return spark.read.schema(schema).option("header", "true").csv(path)


@register(
    "q_csv_roundtrip",
    oracle="SELECT * FROM nation",
    doc="CSV sink + declared-schema re-scan of the nation dim; the "
    "text round-trip must reproduce the table exactly, so the oracle "
    "is the table itself.",
    tags=("sources",),
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = scratch_dir("csv_roundtrip")
    nat = table(spark, sf_dir, "nation")
    write_csv(nat, out)
    return read_csv(spark, out, nat.schema)
