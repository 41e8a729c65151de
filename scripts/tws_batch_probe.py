"""Per-micro-batch cost probe for the TWS (transformWithState) query
family — optimization round 16, guide §1 "measure first".

Runs named declared streaming queries at $SPARK_GRAFT_SF_DIR and, for
each repetition, records:
- wall-clock of the whole declared query (feed staging + stream + read
  back, the bench's number);
- the per-batch breakdown from StreamingQuery.recentProgress via the
  event_stream.LAST_QUERY hook: batchId, numInputRows,
  durationMs (addBatch / triggerExecution / commitOffsets), and the
  state operator's allUpdatesTimeMs / commitTimeMs / numRowsUpdated.

VERDICT r15 item 1's "done" criterion reads per-batch progress time, so
this is the before/after instrument for the TWS kernel RPC work.

Usage:
    python scripts/tws_batch_probe.py [--reps 3] [q_streaming_stateful_ttl ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the TWS state-server protocol needs google.protobuf before the JVM is up
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "vendor",
        "protobuf_shim",
    ),
)
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

DEFAULT_QUERIES = [
    "q_streaming_stateful_ttl",
    "q_streaming_stateful_mapstate",
    "q_streaming_stateful_liststate",
    "q_streaming_stateful_totals_tws",
    "q_streaming_stateful_warmstart",
    "q_streaming_outer_join",
]


def batch_rows(progress: list[dict]) -> list[dict]:
    rows = []
    for p in progress:
        op = (p.get("stateOperators") or [{}])[0]
        rows.append(
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "addBatch_ms": (p.get("durationMs") or {}).get("addBatch"),
                "trigger_ms": (p.get("durationMs") or {}).get(
                    "triggerExecution"
                ),
                "stateUpdates_ms": op.get("allUpdatesTimeMs"),
                "stateCommit_ms": op.get("commitTimeMs"),
                "rowsUpdated": op.get("numRowsUpdated"),
            }
        )
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    names = args.names or DEFAULT_QUERIES

    from udacity_data_engineering_spark.plans.registry import all_queries
    from udacity_data_engineering_spark.session import build_session
    from udacity_data_engineering_spark.streaming import event_stream

    spark = build_session(app_name="tws-batch-probe")
    spark.sparkContext.setLogLevel("ERROR")
    manifest = all_queries()

    report: dict = {"sf": args.sf, "queries": {}}
    for name in names:
        runs = []
        for rep in range(args.reps):
            event_stream.LAST_QUERY = None
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            df = manifest[name].fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            q = event_stream.LAST_QUERY
            prog = (
                [json.loads(p.json) for p in q.recentProgress]
                if q is not None
                else []
            )
            runs.append({"wall_s": round(wall, 2), "batches": batch_rows(prog)})
            total_add = sum(b["addBatch_ms"] or 0 for b in runs[-1]["batches"])
            print(
                f"{name} rep{rep}: wall {wall:.2f}s, "
                f"{len(runs[-1]['batches'])} batches, "
                f"addBatch total {total_add} ms",
                flush=True,
            )
        report["queries"][name] = runs
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    print(json.dumps({k: [r["wall_s"] for r in v] for k, v in report["queries"].items()}))


if __name__ == "__main__":
    main()
