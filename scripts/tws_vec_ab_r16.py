"""Same-session alternating A/B for the vectorized TWS serializer patch
(round 16, part 2): stock pyspark per-row deserialization vs the sliced
implementation in streaming/uds_tws_serializer_patch.py.

Legs alternate inside ONE session via the patch's runtime kill-switch:
SPARK_GRAFT_TWS_VECTORIZED is toggled in ``sc.environment`` between
legs — Python worker pools are keyed by their env vars, so each leg's
freshly-built UDFs run in workers that see the right value, and the
patched ``load_stream`` routes to the stock implementation when it
reads "0". Each leg runs the DECLARED query function end-to-end (feed
staging + stream + final aggregate), so the reported wall is the bench's
wall; addBatch/allUpdatesTimeMs isolate the stream's state operator.

Usage: python scripts/tws_vec_ab_r16.py [--rounds 3] [--queries ...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "vendor", "protobuf_shim"))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

DEFAULT_QUERIES = (
    "q_streaming_stateful_ttl,q_streaming_stateful_mapstate,"
    "q_streaming_stateful_liststate,q_streaming_stateful_totals_tws,"
    "q_streaming_stateful_warmstart"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--queries", default=DEFAULT_QUERIES)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--out", default="/tmp/tws_vec_ab_r16.json")
    args = ap.parse_args()

    from udacity_data_engineering_spark.plans.registry import all_queries
    from udacity_data_engineering_spark.session import build_session
    from udacity_data_engineering_spark.streaming import event_stream

    registry = all_queries()
    spark = build_session(app_name="tws-vec-ab-r16")
    spark.sparkContext.setLogLevel("ERROR")

    def run_leg(qname: str, vectorized: bool, coalesce: bool) -> dict:
        sc = spark.sparkContext
        sc.environment["SPARK_GRAFT_TWS_VECTORIZED"] = (
            "1" if vectorized else "0"
        )
        sc.environment["SPARK_GRAFT_TWS_COALESCE"] = "1" if coalesce else "0"
        t0 = time.perf_counter()
        df = registry[qname].fn(spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        n_out = df.count()
        q = event_stream.LAST_QUERY
        prog = [json.loads(p.json) for p in q.recentProgress] if q else []
        add = sum((p.get("durationMs") or {}).get("addBatch") or 0 for p in prog)
        upd = sum(
            (p.get("stateOperators") or [{}])[0].get("allUpdatesTimeMs") or 0
            for p in prog
        )
        return {
            "wall_s": round(wall, 2),
            "n_batches": len(prog),
            "addBatch_ms": add,
            "stateUpd_ms": upd,
            "rows_out": n_out,
        }

    legs = (
        ("stock", False, False),
        ("load_vec", True, False),
        ("load_vec+dump_coalesce", True, True),
    )
    results: dict = {}
    for rnd in range(args.rounds):
        for qname in args.queries.split(","):
            for leg, vec, coal in legs:
                spark.sparkContext.setJobDescription(
                    f"vec-ab {qname} {leg} round{rnd}"
                )
                r = run_leg(qname, vec, coal)
                results.setdefault(qname, {}).setdefault(leg, []).append(r)
                print(
                    f"{qname} {leg} round{rnd}: wall {r['wall_s']}s "
                    f"batches {r['n_batches']} addBatch {r['addBatch_ms']}ms "
                    f"stateUpd {r['stateUpd_ms']}ms rows {r['rows_out']}",
                    flush=True,
                )
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)

    for qname, legmap in results.items():
        rows = {
            leg: sorted(r["rows_out"] for r in runs)
            for leg, runs in legmap.items()
        }
        assert len({tuple(v) for v in rows.values()}) == 1, (qname, rows)
        for leg, runs in legmap.items():
            med = statistics.median(r["wall_s"] for r in runs)
            meda = statistics.median(r["addBatch_ms"] for r in runs)
            medu = statistics.median(r["stateUpd_ms"] for r in runs)
            print(
                f"MEDIAN {qname} {leg}: wall {med}s addBatch {meda}ms "
                f"stateUpd {medu}ms"
            )


if __name__ == "__main__":
    main()
