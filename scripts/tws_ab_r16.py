"""Same-session alternating A/B for the round-16 TWS kernel work.

This host shows heavy bursty CPU steal, so cross-process wall clocks are
meaningless; the only credible design (OPTIMIZATION_r15.md) is old vs
new code alternating inside ONE session, medians over >=3 rounds.

Legs per query:
  A  r15 kernel  + r15 batching (6 time buckets, maxFilesPerTrigger=1)
  B  r16 kernel  + r15 batching          -> isolates the RPC-folding win
  C  r16 kernel  + r16 batching (3 buckets) -> the shipping config

The r15 kernels are loaded from a git snapshot (/tmp/old_stateful_r15.py,
`git show <r15>:...stateful.py`); the r16 kernels from the working tree.
Reported per run: wall, addBatch total, stateOperators allUpdatesTimeMs.

Usage: python scripts/tws_ab_r16.py [--rounds 3] [--queries ttl,mapstate,liststate]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import shutil
import sys
import tempfile
import time
import uuid

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "vendor", "protobuf_shim"))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

from pyspark.sql import functions as F  # noqa: E402


def load_old_stateful():
    spec = importlib.util.spec_from_file_location(
        "old_stateful_r15", "/tmp/old_stateful_r15.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["old_stateful_r15"] = mod
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--queries", default="ttl,mapstate,liststate")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--out", default="/tmp/tws_ab_r16.json")
    args = ap.parse_args()

    from udacity_data_engineering_spark.session import build_session, table
    from udacity_data_engineering_spark.streaming import (
        event_stream,
        stateful as new_stateful,
    )
    from udacity_data_engineering_spark.streaming.event_stream import (
        run_available_now,
        stream_events,
    )
    from udacity_data_engineering_spark.streaming.stream_queries import (
        write_time_ordered_feed,
    )

    old_stateful = load_old_stateful()
    spark = build_session(app_name="tws-ab-r16")
    spark.sparkContext.setLogLevel("ERROR")
    assert new_stateful.ensure_tws_runtime(spark)
    ttl_seconds = 86_400

    base_ev = (
        table(spark, args.sf, "events")
        .filter(
            F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("value").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("event_id").isNotNull()
        )
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )

    def op(mod, which):
        if which == "ttl":
            return lambda s: mod.expiring_user_sessions_tws(s, ttl_seconds)
        if which == "mapstate":
            return lambda s: mod.per_type_session_totals_tws(s, ttl_seconds)
        if which == "liststate":
            return lambda s: mod.session_first_k_tws(s, ttl_seconds, k=3)
        raise ValueError(which)

    def run_leg(which, mod, n_buckets, mfpt):
        run_id = uuid.uuid4().hex[:12]
        tmp = tempfile.mkdtemp(prefix=f"ab_{which}_{run_id}_")
        t0 = time.perf_counter()
        feed_dir = write_time_ordered_feed(
            base_ev, tmp, ttl_seconds, n_buckets=n_buckets
        )
        sink = f"ab_sink_{run_id}"
        with new_stateful.rocksdb_state_scope(spark):
            stream = stream_events(
                spark, feed_dir, max_files_per_trigger=mfpt
            ).withWatermark("ts", "0 seconds")
            run_available_now(
                op(mod, which)(stream),
                sink,
                os.path.join(tmp, "ckpt"),
                output_mode="update",
            )
        wall = time.perf_counter() - t0
        n_out = spark.table(sink).count()
        q = event_stream.LAST_QUERY
        prog = [json.loads(p.json) for p in q.recentProgress]
        add = sum((p.get("durationMs") or {}).get("addBatch") or 0 for p in prog)
        upd = sum(
            (p.get("stateOperators") or [{}])[0].get("allUpdatesTimeMs") or 0
            for p in prog
        )
        spark.catalog.dropTempView(sink)
        shutil.rmtree(tmp, ignore_errors=True)
        return {
            "wall_s": round(wall, 2),
            "n_batches": len(prog),
            "addBatch_ms": add,
            "stateUpd_ms": upd,
            "rows_out": n_out,
        }

    legs = {
        "A_old_kernel_old_batching": (old_stateful, 6, 1),
        "B_new_kernel_old_batching": (new_stateful, 6, 1),
        "C_new_kernel_new_batching": (new_stateful, 3, 1),
    }
    results: dict = {}
    for rnd in range(args.rounds):
        for which in args.queries.split(","):
            for leg, (mod, nb, mfpt) in legs.items():
                spark.sparkContext.setJobDescription(
                    f"ab {which} {leg} round{rnd}"
                )
                r = run_leg(which, mod, nb, mfpt)
                results.setdefault(which, {}).setdefault(leg, []).append(r)
                print(
                    f"{which} {leg} round{rnd}: wall {r['wall_s']}s "
                    f"batches {r['n_batches']} addBatch {r['addBatch_ms']}ms "
                    f"stateUpd {r['stateUpd_ms']}ms rows {r['rows_out']}",
                    flush=True,
                )
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    # medians
    import statistics

    for which, legmap in results.items():
        for leg, runs in legmap.items():
            med = statistics.median(r["wall_s"] for r in runs)
            meda = statistics.median(r["addBatch_ms"] for r in runs)
            print(f"MEDIAN {which} {leg}: wall {med}s addBatch {meda}ms")


if __name__ == "__main__":
    main()
