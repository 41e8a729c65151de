"""Task-retry determinism: results (and sink contents) must be identical
when tasks fail and are recomputed — the everyday failure mode at 100 TB
(preemption, OOM-kills, node loss). Runs in a subprocess because retries
need a dedicated ``local[8, 2]`` master (maxFailures=2) and one JVM per
process is a Spark invariant.

The injected failure (testing.chaos_fail_first_attempt) kills the first
attempt of partition 0 in a final mapInPandas stage; Spark must retry it
and converge on exactly the multiset a clean run produces — including
through a parquet write, whose task-commit protocol must not leave the
aborted attempt's output behind.
"""

import subprocess
import sys
from pathlib import Path

import pytest

# round 16 driver-budget tier: task-retry chaos suite (~90 s) — kills
# tasks mid-query to prove idempotence; depth tier, the sinks it drives
# are also oracle-gated
pytestmark = pytest.mark.slow

CHILD = r"""
import tempfile

from pyspark.sql import SparkSession

from udacity_data_engineering_spark.session import configure
from udacity_data_engineering_spark.plans.registry import all_queries
from udacity_data_engineering_spark.testing import (
    chaos_fail_first_attempt,
    row_multiset,
)

spark = (
    SparkSession.builder.master("local[8, 2]")  # maxFailures=2: one retry
    .appName("chaos-retry")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
configure(spark)

sf = "/root/testdata/sf0.001"
m = all_queries()
q = m["q_gopher_rules"].fn  # Arrow-kernel quality pipeline over documents

clean = q(spark, sf)
cols = clean.columns
want = row_multiset([tuple(r) for r in clean.collect()], cols)
assert want, "clean run returned no rows"

# 1) collect path: retried task must reproduce its partition exactly
chaos = chaos_fail_first_attempt(q(spark, sf))
got = row_multiset([tuple(r) for r in chaos.collect()], cols)
assert got == want, "retry changed collect() results"

# 2) write path: the aborted first attempt must leave nothing behind
out = tempfile.mkdtemp(prefix="chaos_retry_") + "/w"
chaos_fail_first_attempt(q(spark, sf)).write.mode("overwrite").parquet(out)
back = spark.read.parquet(out)
got2 = row_multiset([tuple(r) for r in back.collect()], back.columns)
assert got2 == want, "retry changed written parquet contents"

print("CHAOS_OK", len(want))
"""


def test_results_identical_under_task_retry():
    out = subprocess.run(
        [sys.executable, "-c", CHILD],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(Path(__file__).resolve().parents[1]),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "CHAOS_OK" in out.stdout
    # the injection really fired: the retry path, not the happy path, ran
    assert "chaos: injected first-attempt failure" in out.stderr


CHILD_STREAMING = r"""
import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from udacity_data_engineering_spark.session import configure, table
from udacity_data_engineering_spark.streaming.event_stream import stream_events
from udacity_data_engineering_spark.streaming.joins import (
    purchases_after_signup,
)
from udacity_data_engineering_spark.streaming.stream_queries import (
    _dq_monitor_predicates,
    dq_log_gate,
    dq_log_totals,
    enrich_with_dim,
    lake_upsert_gate,
)
from udacity_data_engineering_spark.testing import (
    chaos_fail_first_attempt,
    row_multiset,
)

spark = (
    SparkSession.builder.master("local[8, 2]")  # maxFailures=2: one retry
    .appName("chaos-streaming")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
configure(spark)
sf = "/root/testdata/sf0.001"
ev = table(spark, sf, "events")
root = tempfile.mkdtemp(prefix="chaos_stream_")


def run_foreach(feed_df, gate, tag, files=4, per_trigger=1):
    feed_dir = os.path.join(root, tag, "feed")
    feed_df.coalesce(files).write.mode("overwrite").parquet(feed_dir)
    q = (
        stream_events(spark, feed_dir, max_files_per_trigger=per_trigger)
        .writeStream.foreachBatch(gate)
        .option("checkpointLocation", os.path.join(root, tag, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def chaos_gate(gate):
    return lambda df, bid: gate(chaos_fail_first_attempt(df), bid)


def ms(df):
    return row_multiset([tuple(r) for r in df.collect()], df.columns)


# ---- sink 1: DQ log gate (per-batch overwrite log) ----
dirty = ev.withColumn(
    "user_id",
    F.when(F.col("event_id") % 13 == 0, F.lit(None)).otherwise(F.col("user_id")),
)
run_foreach(dirty, dq_log_gate(os.path.join(root, "dq_clean", "log"),
                               _dq_monitor_predicates()), "dq_clean")
want_dq = ms(dq_log_totals(spark, os.path.join(root, "dq_clean", "log")))
run_foreach(dirty, chaos_gate(dq_log_gate(os.path.join(root, "dq_chaos", "log"),
                                          _dq_monitor_predicates())), "dq_chaos")
got_dq = ms(dq_log_totals(spark, os.path.join(root, "dq_chaos", "log")))
assert got_dq == want_dq, "DQ log sink changed under task retry"
print("SINK_DQ_OK")

# ---- sink 2: lake MERGE upsert ----
feed = ev.unionAll(ev.where(F.col("event_id") % 7 == 0))
clean_lake = os.path.join(root, "lake_clean", "lake")
run_foreach(feed, lake_upsert_gate(clean_lake), "lake_clean")
want_lake = ms(spark.read.schema(ev.schema).parquet(clean_lake))
chaos_lake = os.path.join(root, "lake_chaos", "lake")
run_foreach(feed, chaos_gate(lake_upsert_gate(chaos_lake)), "lake_chaos")
got_lake = ms(spark.read.schema(ev.schema).parquet(chaos_lake))
assert got_lake == want_lake, "lake upsert sink changed under task retry"
print("SINK_LAKE_OK")


# ---- sinks 3+4: stream-static and stream-stream joins (memory sink) ----
def run_mem(stream_df, tag):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(tag)
        .option("checkpointLocation", os.path.join(root, tag, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(tag)


feed_dir = os.path.join(root, "join_feed")
ev.coalesce(4).write.mode("overwrite").parquet(feed_dir)
dim = table(spark, sf, "customer").select("c_custkey", "c_mktsegment")


def static_join_stream():
    return enrich_with_dim(
        stream_events(spark, feed_dir).select(
            "event_id", "user_id", "event_type", "value"
        ),
        dim,
        F.col("user_id") == F.col("c_custkey"),
    ).select("event_id", "user_id", "event_type", "c_mktsegment", "value")


want_sj = ms(run_mem(static_join_stream(), "sj_clean"))
got_sj = ms(run_mem(chaos_fail_first_attempt(static_join_stream()), "sj_chaos"))
assert got_sj == want_sj, "stream-static join changed under task retry"
print("SINK_STATIC_JOIN_OK")


def stream_join_stream():
    return purchases_after_signup(
        stream_events(spark, feed_dir), within="48 hours", watermark="96 hours"
    ).select(
        "user_id",
        F.col("signup_ts").cast("timestamp_ntz").alias("signup_ts"),
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
        "value",
    )


want_ss = ms(run_mem(stream_join_stream(), "ss_clean"))
got_ss = ms(run_mem(chaos_fail_first_attempt(stream_join_stream()), "ss_chaos"))
assert got_ss == want_ss, "stream-stream join changed under task retry"
print("SINK_STREAM_JOIN_OK")
"""


def test_streaming_sinks_stable_under_task_retry():
    """The round-10 driver flake proved builder-local green != driver
    green for streaming sinks. All four foreachBatch/memory sinks (DQ
    log, lake MERGE upsert, stream-static join, stream-stream join)
    must emit identical state with a first-attempt task failure
    injected into every micro-batch."""
    out = subprocess.run(
        [sys.executable, "-c", CHILD_STREAMING],
        capture_output=True,
        text=True,
        timeout=540,
        cwd=str(Path(__file__).resolve().parents[1]),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    for marker in (
        "SINK_DQ_OK",
        "SINK_LAKE_OK",
        "SINK_STATIC_JOIN_OK",
        "SINK_STREAM_JOIN_OK",
    ):
        assert marker in out.stdout, f"missing {marker}: {out.stdout[-500:]}"
    assert "chaos: injected first-attempt failure" in out.stderr
