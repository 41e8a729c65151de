"""Datetime scalar functions — reference rows 13/14 (SURVEY.md §2A).

The reference converts epoch-milliseconds with a row-at-a-time Python UDF
(etl.py:124-125: ``udf(lambda x: datetime.utcfromtimestamp(int(x)/1000),
TimestampType())``). We keep that exact shape as the *parity* path —
and make the builtin ``timestamp_millis`` the primary path, which stays
inside whole-stage codegen (no JVM→Python worker hop; the ~10-100×
difference the charter calls out).
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import configure


def epoch_ms_to_ts(ms: Column) -> Column:
    """Primary path: builtin, vectorized, codegen'd (etl.py:124 intent)."""
    return F.timestamp_millis(ms.cast("long"))


#: Parity path: scalar Python UDF, exact integer arithmetic (timedelta on
#: int milliseconds — no float seconds, so no sub-ms rounding drift).
epoch_ms_to_ts_udf = F.udf(
    lambda ms: None if ms is None else datetime(1970, 1, 1) + timedelta(milliseconds=int(ms)),
    TimestampType(),
)

_ORACLE = "SELECT event_id, epoch_ms(epoch_us(ts) // 1000) AS start_time FROM events"


def events_ms_expr(raw: DataFrame) -> Column:
    """Epoch-millis expression over a raw ``events`` read, whatever the
    testdata vintage stored ``ts`` as:

    - int64 *nanoseconds* (nanosAsLong shim, SURVEY §7.2) — integer DIV
      because nanos ~1.7e18 exceed double's 2^53 exact range;
    - parquet TIMESTAMP(MICROS), surfacing as timestamp or timestamp_ntz —
      ``unix_millis`` under the pinned UTC session timezone, so the
      NTZ→LTZ cast is the identity.

    Any other dtype is an unknown vintage: fail loudly rather than
    silently mis-convert (a string or double ts would otherwise fall
    into the cast branch and shift or truncate values).
    """
    dtype = dict(raw.dtypes).get("ts")
    if dtype == "bigint":
        # FLOOR division, not DIV: DIV truncates toward zero, which
        # disagrees with unix_millis (and DuckDB's //, both floor) for
        # pre-1970 sub-millisecond values — e.g. nanos -1500999000 must
        # map to ms -2, not -1. Integer-only arithmetic (nanos ~1.7e18
        # exceed double's exact range).
        return F.expr(
            "ts DIV 1000000 + CASE WHEN ts % 1000000 < 0 THEN -1 ELSE 0 END"
        )
    if dtype in ("timestamp", "timestamp_ntz"):
        return F.expr("unix_millis(CAST(ts AS TIMESTAMP))")
    raise TypeError(
        f"events.ts has unexpected dtype {dtype!r}; known vintages are "
        "int64 nanos (bigint via nanosAsLong) and timestamp[us]"
    )


def _events_with_ms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw events read, normalized to an epoch-millis column (both
    testdata vintages — see events_ms_expr)."""
    configure(spark)
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return raw.select("event_id", events_ms_expr(raw).alias("ms"))


@register(
    "q_epoch_to_ts",
    oracle=_ORACLE,
    doc="Epoch-millis → timestamp via the builtin timestamp_millis "
    "(primary path for etl.py:124-125; stays JVM-side).",
    tags=("2A.13",),
)
def q_epoch_to_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events_with_ms(spark, sf_dir)
    return df.select(
        "event_id",
        epoch_ms_to_ts(F.col("ms")).cast("timestamp_ntz").alias("start_time"),
    )


@register(
    "q_epoch_to_ts_udf",
    oracle=_ORACLE,
    doc="Reference-parity scalar Python UDF for the same conversion "
    "(etl.py:124-125 shape — BatchEvalPython node, the deliberate slow "
    "path kept for API parity; same oracle as the builtin).",
    tags=("2A.13",),
)
def q_epoch_to_ts_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events_with_ms(spark, sf_dir)
    return df.select(
        "event_id",
        epoch_ms_to_ts_udf(F.col("ms")).cast("timestamp_ntz").alias("start_time"),
    )
