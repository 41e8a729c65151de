"""Stream-stream join PEAK STATE growth law (round-11, VERDICT r10 #8).

The claim under test: the watermarked interval join's state is bounded
by the WATERMARK HORIZON (watermark + join interval) x event RATE —
never by total stream length. SCALE.md already pins eviction
*correctness* (tests/test_stream_join.py) and flat state for tumbling
dedup; this probe measures peak ``stateOperators.numRowsTotal`` while
the stream gets LONGER at a fixed rate — the axis on which unbounded
state would actually show.

Construction: span-replicas of sf0.1 events — block k shifts every
timestamp by k x 31 days and remaps event ids, so a 10x replica has
10x the rows, 10x the event-time span, and the SAME rows/hour. Files
are staged one per block in chronological order and consumed with
maxFilesPerTrigger=1, so the watermark advances block by block and
state for past blocks is evicted. PASS = peak state roughly FLAT
(bounded by one block's horizon) while total rows grow 10x.

Usage: python scripts/stream_join_state_probe.py [spans...]  (default 1 10)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from udacity_data_engineering_spark.session import build_session, table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def stage_span_replica(spark, n_blocks: int) -> str:
    root = tempfile.mkdtemp(prefix=f"sj_span_{n_blocks}x_")
    ev = table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    for k in range(n_blocks):
        block = ev.select(
            (F.col("event_id") + F.lit(k * 100_000_000)).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {k * 31} DAYS")).alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
        # one file per block, zero-padded name => chronological arrival
        block.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(root, f"block_{k:04d}")
        )
    # flatten: the file source wants one directory of files
    import glob
    import shutil

    flat = os.path.join(root, "feed")
    os.makedirs(flat, exist_ok=True)
    for k in range(n_blocks):
        src = glob.glob(os.path.join(root, f"block_{k:04d}", "part-*.parquet"))
        assert len(src) == 1
        shutil.copy(src[0], os.path.join(flat, f"block_{k:04d}.parquet"))
        shutil.rmtree(os.path.join(root, f"block_{k:04d}"))
    return flat


def probe(spark, feed_dir: str) -> dict:
    from udacity_data_engineering_spark.streaming.joins import (
        purchases_after_signup,
    )

    schema = (
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    joined = purchases_after_signup(stream, within="48 hours", watermark="96 hours")
    ckpt = tempfile.mkdtemp(prefix="sj_ckpt_")
    t0 = time.perf_counter()
    q = (
        joined.writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    progs = q.recentProgress
    rows = sum(p["numInputRows"] for p in progs)
    state = [
        op["numRowsTotal"]
        for p in progs
        if p.get("stateOperators")
        for op in p["stateOperators"]
    ]
    return {
        "rows": rows,
        "batches": sum(1 for p in progs if p["numInputRows"] > 0),
        "sec": round(wall, 2),
        "peak_state_rows": max(state) if state else 0,
        "final_state_rows": state[-1] if state else 0,
    }


def main() -> None:
    spans = [int(x) for x in (sys.argv[1:] or ["1", "10"])]
    spark = build_session(
        app_name="stream-join-state-probe", cpus=32, shuffle_partitions=32
    )
    out = {}
    for n in spans:
        feed = stage_span_replica(spark, n)
        out[f"{n}x_span"] = probe(spark, feed)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
