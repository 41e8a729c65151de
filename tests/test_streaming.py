"""E14: batch/stream parity. The streaming execution of the event-time
windows must produce exactly the batch results when replaying the same
files (availableNow trigger, no late data)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import all_queries
from udacity_data_engineering_spark.streaming import (
    run_available_now,
    sessionized_counts,
    stream_events,
    windowed_counts,
)

MANIFEST = all_queries()


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Stage the events table as a 4-file directory so the stream sees
    multiple input splits."""
    out = str(tmp_path_factory.mktemp("events_stream_in"))
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw.repartition(4).write.mode("overwrite").parquet(out)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def _norm(rows):
    return sorted(tuple(r) for r in rows)


def test_tumbling_stream_matches_batch(spark, sf_dir, events_dir, tmp_path):
    stream = windowed_counts(stream_events(spark, events_dir))
    assert stream.isStreaming
    run_available_now(stream, "tumbling_sink", str(tmp_path / "ckpt1"))
    got = spark.sql("SELECT * FROM tumbling_sink").collect()
    want = MANIFEST["q_tumbling_agg"].fn(spark, sf_dir).collect()
    assert _norm(got) == _norm(want)


def test_sliding_stream_matches_batch(spark, sf_dir, events_dir, tmp_path):
    stream = windowed_counts(
        stream_events(spark, events_dir), window="1 hour", slide="15 minutes"
    )
    run_available_now(stream, "sliding_sink", str(tmp_path / "ckpt_slide"))
    got = spark.sql("SELECT * FROM sliding_sink").collect()
    want = MANIFEST["q_sliding_window"].fn(spark, sf_dir).collect()
    assert _norm(got) == _norm(want)


def test_session_stream_matches_batch(spark, sf_dir, events_dir, tmp_path):
    stream = sessionized_counts(stream_events(spark, events_dir))
    run_available_now(stream, "session_sink", str(tmp_path / "ckpt2"))
    got = spark.sql("SELECT * FROM session_sink").collect()
    want = MANIFEST["q_session_window"].fn(spark, sf_dir).collect()
    assert _norm(got) == _norm(want)


def test_watermark_present_in_plan(spark, events_dir):
    stream = windowed_counts(stream_events(spark, events_dir), watermark="45 minutes")
    assert "45 minutes" in stream._jdf.queryExecution().analyzed().toString()


def test_stream_dedup_within_watermark(spark, sf_dir, tmp_path):
    """Redelivered events (same event_id, same micro-batch window) are
    dropped exactly once; survivors match batch distinct-by-key."""
    from udacity_data_engineering_spark.streaming import deduped_events

    src = str(tmp_path / "dup_in")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw.write.mode("overwrite").parquet(src)
    # simulate at-least-once redelivery: a second file with 20% of rows
    raw.sample(0.2, seed=1).write.mode("append").parquet(src)

    stream = deduped_events(stream_events(spark, src))
    assert stream.isStreaming
    run_available_now(
        stream, "dedup_sink", str(tmp_path / "ckpt"), output_mode="append"
    )
    got = spark.table("dedup_sink")
    assert got.count() == raw.count()
    assert got.select("event_id").distinct().count() == raw.count()


def test_max_files_per_trigger_bounds_microbatches(spark, sf_dir, events_dir, tmp_path):
    """Ingestion rate control: a 4-file backlog replayed with
    maxFilesPerTrigger=1 must arrive as 4 bounded micro-batches (the
    100 TB backfill posture — state pressure stays shuffle-sized), and
    the aggregated result must be identical to the unbounded replay."""
    stream = windowed_counts(stream_events(spark, events_dir, max_files_per_trigger=1))
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_limited_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_rate"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = q.lastProgress["batchId"] + 1
    assert n_batches >= 4, f"expected >=4 bounded micro-batches, got {n_batches}"
    got = spark.sql("SELECT * FROM rate_limited_sink").collect()
    want = MANIFEST["q_tumbling_agg"].fn(spark, sf_dir).collect()
    assert _norm(got) == _norm(want)
