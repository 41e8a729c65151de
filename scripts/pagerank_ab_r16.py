"""Same-session alternating A/B: r14 pagerank (per-round anti-join +
eager cut every 2 rounds) vs the current implementation (static has_out
flag + per-round lazy cuts, r15; loop_checkpoint wrapper, r16).

VERDICT r15 item 7: the r15 structural win (one join+Exchange removed
per iteration, 97->89 scheduled jobs) never got a clean wall number —
every cross-window measurement was steal-contaminated. This script runs
OLD and NEW alternating inside ONE session, medians of >=3 reps per
leg, timing the noop-sink execution of the full q_pagerank shape
(click-edge extraction + 8 rounds + rounding) at $SPARK_GRAFT_SF_DIR.

The OLD leg is the verbatim r14 `pagerank` body (git show 0ed9ad2^),
exec'd into a namespace so the r14 module's @register calls never run.

Usage: python scripts/pagerank_ab_r16.py [--reps 4]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402


def load_old_pagerank():
    """Extract the r14 pagerank function body from git history and exec
    it with just the globals it needs (F, constants)."""
    src = subprocess.run(
        [
            "git",
            "-C",
            HERE,
            "show",
            "0ed9ad2^:udacity_data_engineering_spark/operators/graph.py",
        ],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    start = src.index("def pagerank(")
    end = src.index("def _pagerank_oracle(")
    from pyspark.sql import DataFrame

    ns = {
        "F": F,
        "DataFrame": DataFrame,
        "DAMPING_NUM": "0.85",
        "TELEPORT_NUM": "0.15",
        "PAGERANK_ITERS": 8,
    }
    exec(src[start:end], ns)  # noqa: S102 — our own committed history
    return ns["pagerank"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from udacity_data_engineering_spark.operators.graph import (
        click_edges,
        pagerank as new_pagerank,
    )
    from udacity_data_engineering_spark.session import build_session, table

    old_pagerank = load_old_pagerank()
    spark = build_session(app_name="pagerank-ab-r16")
    spark.sparkContext.setLogLevel("ERROR")

    def run(leg_fn) -> float:
        # exactly q_pagerank's construction (operators/graph.py)
        ev = table(spark, args.sf, "events")
        page = F.get_json_object("props", "$.k").cast("long")
        nodes = ev.select(page.alias("page")).distinct()
        edges = click_edges(ev)
        t0 = time.perf_counter()
        out = (
            leg_fn(edges, nodes)
            .select("page", F.round("pr", 6).alias("pr"))
            .orderBy("page")
        )
        out.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    results = {"old": [], "new": []}
    # warm-up once (file listing, codegen caches) outside the timed legs
    run(new_pagerank)
    for rep in range(args.reps):
        for leg, fn in (("old", old_pagerank), ("new", new_pagerank)):
            spark.sparkContext.setJobDescription(f"pagerank {leg} rep{rep}")
            w = run(fn)
            results[leg].append(round(w, 2))
            print(f"pagerank {leg} rep{rep}: {w:.2f}s", flush=True)
    print(
        json.dumps(
            {
                "sf": args.sf,
                "runs": results,
                "median_old_s": statistics.median(results["old"]),
                "median_new_s": statistics.median(results["new"]),
            }
        )
    )


if __name__ == "__main__":
    main()
