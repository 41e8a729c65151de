"""Custom Python data source — Spark 4's ``pyspark.sql.datasource`` API
(SPARK-44076 lineage), the sanctioned way to plug a new source into the
DataFrame reader without JVM code.

``synthdocs`` is a deterministic corpus-shaped load generator (the
dsdgen/dbgen role for pipeline testing): every column is pure integer
arithmetic on ``doc_id``, so any engine can reproduce the rows exactly —
the batch query is value-hash-proven against DuckDB ``generate_series``.

Scale shape: the batch reader splits the id range into ``parts``
partitions read independently (embarrassingly parallel, no driver
bottleneck, no files); generation cost is O(rows/partitions) per task.
The streaming reader is a rate-source analogue over the same rows:
offsets are plain row counts, each micro-batch materializes only its
[start, end) slice, and replay of any offset range regenerates identical
rows (deterministic => exactly-once under retries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from udacity_data_engineering_spark.plans.registry import register

#: Knuth multiplicative constant — same public arithmetic as sampling.py.
KNUTH = 2654435761
MOD32 = 4294967296

SCHEMA = "doc_id long, skey long, n_tokens long, lang string"

LANGS = ("en", "de", "fr", "es")


def _row(doc_id: int) -> tuple:
    h = (doc_id * KNUTH) % MOD32
    return (doc_id, h, h % 491 + 10, LANGS[h % 4])


class _SynthBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        i = partition.value
        lo = i * self.n // self.parts
        hi = (i + 1) * self.n // self.parts
        for doc_id in range(lo, hi):
            yield _row(doc_id)


class _SynthStreamReader(SimpleDataSourceStreamReader):
    """Rate-like stream over the same deterministic rows: each ``read``
    advances the offset by ``rows_per_batch``; ``readBetweenOffsets``
    regenerates any slice identically for replay."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        # unbounded by default (a rate source); tests and bounded loads
        # set max_rows so availableNow/processAllAvailable terminates
        self.max_rows = int(options.get("max_rows", -1))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        lo = start["pos"]
        hi = lo + self.rows_per_batch
        if self.max_rows >= 0:
            hi = min(hi, self.max_rows)
        if hi <= lo:
            return iter([]), {"pos": lo}
        return iter([_row(i) for i in range(lo, hi)]), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i) for i in range(start["pos"], end["pos"])])

    def commit(self, end: dict) -> None:
        pass


class SynthDocsSource(DataSource):
    """``spark.read.format("synthdocs").option("n", ...).load()`` after
    ``spark.dataSource.register(SynthDocsSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _SynthBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _SynthStreamReader(self.options)


def register_synth_source(spark: SparkSession) -> None:
    """Idempotent per-session registration of the custom source."""
    registered = getattr(spark, "_synthdocs_registered", False)
    if not registered:
        spark.dataSource.register(SynthDocsSource)
        spark._synthdocs_registered = True


@register(
    "q_python_datasource",
    oracle="""
        SELECT i AS doc_id,
               (i * 2654435761) % 4294967296 AS skey,
               (i * 2654435761) % 4294967296 % 491 + 10 AS n_tokens,
               CASE (i * 2654435761) % 4294967296 % 4
                    WHEN 0 THEN 'en' WHEN 1 THEN 'de'
                    WHEN 2 THEN 'fr' ELSE 'es' END AS lang
        FROM generate_series(0, 999) AS t(i)
    """,
    doc="Spark 4 custom Python data source (pyspark.sql.datasource): a "
    "deterministic corpus-shaped generator read through the DataFrame "
    "reader in parallel partitions — no files, no driver loop. Pure "
    "integer arithmetic per row makes the source value-hash provable "
    "against DuckDB generate_series.",
    tags=("sources", "llm-pipeline"),
)
def q_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_synth_source(spark)
    return spark.read.format("synthdocs").option("n", 1000).option("parts", 8).load()
