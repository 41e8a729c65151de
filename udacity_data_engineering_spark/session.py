"""Session factory + testdata table loading.

Reference parity: session bootstrap (etl.py:26-29) is a plain
``SparkSession.builder...getOrCreate()``; we add the configs a fresh context
needs for the driver's testdata (see SURVEY.md §7.2):

- ``spark.sql.legacy.parquet.nanosAsLong=true``: ``events.parquet`` stores
  ``ts`` as parquet TIMESTAMP(NANOS) which stock Spark refuses to read.
  With the flag the column arrives as int64 nanoseconds and we rebuild the
  timestamp with integer arithmetic (``ts DIV 1000`` — *integer* division;
  nanos ~1.7e18 exceed double's 2^53 exact-integer range, so float division
  would corrupt microseconds).
- UTC session timezone everywhere (deterministic date parts, oracle parity).
- AQE on (runtime coalesce / skew-join handling — the 100 TB posture).

All confs are runtime-settable so they also work on a session we did not
build (the driver hands us its own ``SparkSession``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Tables the driver generates at /root/testdata/sf*/ (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Confs that are safe (and necessary) to set on an already-running session.
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Arrow-batched transfer for scalar Python UDFs (Spark 4): same
    # semantics, ~row-at-a-time pickling removed. The parity UDF path
    # (functions/datetime_fns.py) benefits; builtins remain the fast path.
    "spark.sql.execution.pythonUDF.arrow.enabled": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime confs needed to read the testdata; idempotent."""
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:  # pragma: no cover - conf locked down by host
            pass
    return spark


def build_session(
    app_name: str = "udacity-data-engineering-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Create a local session tuned for this box (reference: etl.py:26-29).

    ``shuffle_partitions`` defaults to the core count: at local scale the
    stock 200 partitions just add task-scheduling overhead; on a real
    cluster this knob (and AQE coalesce) is sized to the data instead.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 8
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # catalog-table writes (bucketed tables) land in /tmp, not the
        # repo; per-process dir so stale files from a previous session
        # can't collide with managed-table locations
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_WAREHOUSE_DIR", f"/tmp/uds_warehouse_{os.getpid()}"
            ),
        )
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return configure(spark)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing ``events.ts`` to timestamp_ntz.

    The nanos->timestamp rebuild uses integer DIV (exact); the cast to
    TIMESTAMP_NTZ under the UTC session timezone matches how DuckDB (the
    correctness oracle) sees the column, and how the other tables'
    MILLIS/NTZ timestamps already arrive.
    """
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)")
        )
    return df


def load_tables(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load every testdata table; optionally register temp views.

    Temp-view registration mirrors the reference's SQL entry point setup
    (etl.py:149-150 ``createOrReplaceTempView``).
    """
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
