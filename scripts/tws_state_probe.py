"""transformWithState PEAK STATE growth law (round 15).

The claim under test: the TWS session operators' state (MapState of
per-type counters + session ValueState + one timer per key) is bounded
by CURRENTLY-ACTIVE keys within the TTL horizon — never by total stream
length. tests/test_stateful_streaming.py pins eviction *correctness*
(timers clear quiet keys' state); this probe MEASURES peak
``stateOperators.numRowsTotal`` while the stream gets LONGER at a fixed
rate — the axis on which unevicted arbitrary state would actually show.

Construction (the stream_join_state_probe recipe): span-replicas of
sf0.1 events — block k shifts every timestamp by k x 31 days and remaps
event ids, so a 10x replica has 10x the rows, 10x the event-time span,
the SAME user population and the same rows/hour. Blocks are staged one
file each in chronological mtime order and consumed with
maxFilesPerTrigger=1, so the watermark advances block by block; with a
1-day TTL every session from past blocks is closed and EVICTED long
before the stream ends. PASS = peak state roughly FLAT (bounded by one
block's active users x their in-session type sets) while total rows
grow 10x.

Usage: python scripts/tws_state_probe.py [spans...]   (default 1 10)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from udacity_data_engineering_spark.session import build_session, table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TTL_SECONDS = 86_400


def stage_span_replica(spark, n_blocks: int) -> str:
    root = tempfile.mkdtemp(prefix=f"tws_span_{n_blocks}x_")
    ev = (
        table(spark, SF_DIR, "events")
        .filter(
            F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("value").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    flat = os.path.join(root, "feed")
    os.makedirs(flat, exist_ok=True)
    for k in range(n_blocks):
        block = ev.select(
            (F.col("event_id") + F.lit(k * 100_000_000)).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {k * 31} DAYS")).alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
        blk_dir = os.path.join(root, f"block_{k:04d}")
        block.coalesce(1).write.mode("overwrite").parquet(blk_dir)
        src = glob.glob(os.path.join(blk_dir, "part-*.parquet"))
        assert len(src) == 1
        dst = os.path.join(flat, f"block_{k:04d}.parquet")
        shutil.copy(src[0], dst)
        # strictly increasing mtimes: the file source consumes
        # oldest-mtime first, so arrival order == event-time order
        os.utime(dst, (1_000_000_000 + k, 1_000_000_000 + k))
        shutil.rmtree(blk_dir)
    return flat


def probe(spark, feed_dir: str) -> dict:
    from udacity_data_engineering_spark.streaming.stateful import (
        ROCKSDB_PROVIDER,
        ensure_tws_runtime,
        per_type_session_totals_tws,
    )

    assert ensure_tws_runtime(spark)
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed_dir)
        .withWatermark("ts", "0 seconds")
    )
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    ckpt = tempfile.mkdtemp(prefix="tws_ckpt_")
    try:
        t0 = time.perf_counter()
        q = (
            per_type_session_totals_tws(stream, TTL_SECONDS)
            .writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        progs = q.recentProgress
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
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
        app_name="tws-state-probe", cpus=32, shuffle_partitions=32
    )
    out = {}
    for n in spans:
        feed = stage_span_replica(spark, n)
        out[f"{n}x_span"] = probe(spark, feed)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
