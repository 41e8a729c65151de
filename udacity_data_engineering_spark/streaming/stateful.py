"""Custom stateful streaming operators — applyInPandasWithState (E14).

For semantics the built-in windowed aggregations can't express (running
per-key accumulators, custom eviction, cross-batch logic), Structured
Streaming's arbitrary-state API is the tool: state lives in the state
store per group, each micro-batch's rows arrive as Arrow-backed pandas
frames, and the kernel decides what to emit and what to keep.

``running_user_totals`` is deliberately simple (cumulative count/sum per
user) so its single-replay result is exactly checkable against a batch
groupBy — the same batch/stream parity discipline as event_stream.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n long, s double"


def _totals_kernel(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 2)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Cumulative per-user event count + value sum across micro-batches.
    Emits the updated totals for every user seen in the batch (update
    output mode); state is one (long, double) pair per user — constant
    per key, no growth over time."""
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _totals_kernel,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: transformWithState requires the RocksDB state store provider (the
#: default HDFS-backed provider does not implement the new operator's
#: multi-state / timer API). Session conf, read at query start.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def ensure_tws_runtime(spark) -> bool:
    """Make ``google.protobuf`` importable in the DRIVER and the Python
    WORKERS of an already-running session — the self-provisioning twin
    of tests/conftest.py's pre-JVM PYTHONPATH wiring. Under the external
    driver the JVM is up before any of this repo's code runs, so
    PYTHONPATH mutation can't reach the workers; instead:

    - driver: vendor/protobuf_shim goes on sys.path (bridges to the
      Cloud SDK's bundled pure-Python runtime; no-op where a real
      protobuf is installed);
    - workers: the shim is zipped once and shipped via
      ``sc.addPyFile`` — python-includes land on every worker's
      sys.path at task start, JVM-start-independent;
    - both: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python (os.environ
      for the driver, ``sc.environment`` for workers — the env map new
      PythonFunctions capture) so the SDK's possibly-foreign-ABI C
      extension is never loaded.

    Returns False when even the shim has no runtime to bridge to (no
    SDK install) — callers surface that as an actionable error.
    """
    import os
    import sys
    import tempfile
    import zipfile
    from pathlib import Path

    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    shim_root = Path(__file__).resolve().parents[2] / "vendor" / "protobuf_shim"
    shim_init = shim_root / "google" / "__init__.py"
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        if not shim_init.exists():
            return False
        sys.path.insert(0, str(shim_root))
        try:
            import google.protobuf  # noqa: F401
        except ImportError:
            return False

    sc = spark.sparkContext
    sc.environment["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
    if shim_init.exists():
        # TWS also spawns a DRIVER-side python worker (the state-schema
        # exchange server) that never sees addPyFile includes; its
        # PythonWorkerFactory merges the function's envVars PYTHONPATH,
        # which sc.environment feeds — so the shim path must ride there
        # too (same-host in local mode; a real cluster ships the zip via
        # --py-files at submit time instead)
        existing = sc.environment.get("PYTHONPATH", "")
        if str(shim_root) not in existing.split(os.pathsep):
            sc.environment["PYTHONPATH"] = str(shim_root) + (
                os.pathsep + existing if existing else ""
            )
    if shim_init.exists() and not getattr(sc, "_tws_shim_shipped", False):
        zpath = os.path.join(
            tempfile.gettempdir(), f"protobuf_shim_{os.getpid()}.zip"
        )
        with zipfile.ZipFile(zpath, "w") as z:
            z.write(shim_init, "google/__init__.py")
        sc.addPyFile(zpath)
        sc._tws_shim_shipped = True  # addPyFile twice would warn/fail
    return True


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Same cumulative totals on Spark 4's ``transformWithStateInPandas``
    — the successor arbitrary-state API (SPARK-45939 lineage): named
    state variables on a handle (value/list/map), timers, TTL, and
    initial-state support, over the RocksDB store. One ValueState per
    user here, so state size is constant per key, and the result is
    exactly checkable against the batch groupBy (same parity discipline
    as applyInPandasWithState above).

    Caller must set ``spark.sql.streaming.stateStore.providerClass`` to
    ``ROCKSDB_PROVIDER`` before starting the query. The TWS state-server
    protocol needs ``google.protobuf`` in driver and worker Python envs;
    this container has no protobuf package, so the test env bridges to
    the Cloud SDK's bundled pure-Python runtime (vendor/protobuf_shim,
    wired in tests/conftest.py) and the parity test runs for real.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, s = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._totals.update((n, s))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 2)]}
            )

        def close(self) -> None:
            pass

    return events.select("user_id", "value").groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=TotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def write_stream_parquet(
    stream_df: DataFrame, out_path: str, checkpoint: str
) -> None:
    """foreachBatch parquet sink, idempotent under replay: each batch
    writes into its own batch_id= partition with dynamic partition
    overwrite, so a batch re-delivered after a crash-before-checkpoint
    replaces its partition instead of appending duplicates. The pattern
    for sinks Spark lacks a native streaming writer for (JDBC, upsert
    targets, ...)."""
    import pyspark.sql.functions as F

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "overwrite"
            ).partitionBy("batch_id").parquet(out_path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_merge_into(
    stream_df: DataFrame,
    target_path: str,
    key_cols: list[str],
    checkpoint: str,
    order_col: str | None = None,
) -> None:
    """Streaming CDC upsert: foreachBatch + etl.upsert.merge_into.

    Each micro-batch merges last-writer-wins into the parquet target
    (anti-join + union + staged swap). With ``order_col`` naming a
    monotonically increasing change column, updates already older than
    the target row are dropped BEFORE merging — so a re-delivered or
    out-of-order batch can never regress a key, and replaying any subset
    of batches in any order converges to the same target (true CDC
    idempotency, not just in-order replay). The parquet-native stand-in
    for MERGE INTO a transactional table — at scale, partition the
    target and merge only affected partitions (see etl/upsert.py).
    """
    from pyspark.sql import functions as F

    from udacity_data_engineering_spark.etl.upsert import merge_into

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        updates = batch_df
        if order_col is not None:
            current = (
                batch_df.sparkSession.read.parquet(target_path)
                .groupBy(*key_cols)
                .agg(F.max(order_col).alias("__cur"))
            )
            updates = (
                updates.join(current, key_cols, "left")
                .filter(F.col("__cur").isNull() | (F.col(order_col) >= F.col("__cur")))
                .drop("__cur")
            )
            if updates.isEmpty():
                return
        merge_into(
            updates.sparkSession,
            target_path,
            updates,
            key_cols,
            order_col=order_col,
        )

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
