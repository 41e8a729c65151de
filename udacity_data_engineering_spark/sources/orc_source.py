"""ORC source/sink — the second columnar lake format Spark supports
natively.

Same capabilities as the parquet path (predicate pushdown, column
pruning, vectorized read, hive partitioning) via the JVM ORC reader;
the lake default stays parquet, ORC is interchange with Hive-era
estates. Rows-only check: the oracle's DuckDB views are parquet, so
value fidelity is asserted in tests/test_sources.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table
from udacity_data_engineering_spark.sources.parquet_source import scratch_dir


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


@register(
    "q_orc_roundtrip",
    oracle="SELECT * FROM supplier WHERE s_acctbal > 0",
    doc="ORC sink + re-scan of the supplier dim, with a pushed filter on "
    "the re-read (s_acctbal > 0 reaches the ORC reader as a search "
    "argument). Value-hash proven against filtering the source table.",
    tags=("sources",),
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = scratch_dir("orc_roundtrip")
    sup = table(spark, sf_dir, "supplier")
    write_orc(sup, out)
    return read_orc(spark, out).filter(F.col("s_acctbal") > 0)
