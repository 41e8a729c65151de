"""CSV source/sink — beyond the reference's JSON+parquet matrix.

Same reader discipline as JSON: declared schema, explicit mode; header
round-trips. CSV is the interchange fallback, not a lake format — no
column pruning or predicate pushdown exists for it, which is why the
lake stays parquet (SCALE.md).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").csv(path)


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    return spark.read.schema(schema).option("header", "true").csv(path)


@register(
    "q_csv_roundtrip",
    doc="CSV sink + declared-schema re-scan of the nation dim. "
    "Rows-only (CSV fixtures live outside the oracle's parquet views); "
    "value fidelity asserted in tests/test_sources.py.",
    tags=("sources",),
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = tempfile.mkdtemp(prefix="uds_csv_")
    nat = table(spark, sf_dir, "nation")
    write_csv(nat, out)
    return read_csv(spark, out, nat.schema)
