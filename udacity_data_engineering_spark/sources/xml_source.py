"""XML source/sink — Spark 4's built-in XML data source (the former
spark-xml package, merged upstream; no external jar needed).

Same discipline as CSV/JSON: declared schema on re-read (XML infers
everything as string otherwise), explicit rowTag. XML is interchange
only — no pushdown, no pruning — so it never backs the lake; the
round-trip query proves fidelity through writer escaping and reader
parsing, which is exactly what matters when ingesting third-party XML
feeds at the lake edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table
from udacity_data_engineering_spark.sources.parquet_source import scratch_dir

ROW_TAG = "row"


def write_xml(df: DataFrame, path: str) -> None:
    df.write.format("xml").option("rowTag", ROW_TAG).mode("overwrite").save(path)


def read_xml(spark: SparkSession, path: str, schema) -> DataFrame:
    return (
        spark.read.format("xml").option("rowTag", ROW_TAG).schema(schema).load(path)
    )


@register(
    "q_xml_roundtrip",
    oracle="SELECT * FROM nation",
    doc="XML sink + declared-schema re-scan of the nation dim via Spark "
    "4's native XML source. The round-trip must reproduce the table "
    "exactly (writer escaping + reader parsing + explicit schema), so "
    "the oracle is the table itself.",
    tags=("sources",),
)
def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = scratch_dir("xml_roundtrip")
    nat = table(spark, sf_dir, "nation")
    write_xml(nat, out)
    return read_xml(spark, out, nat.schema)
