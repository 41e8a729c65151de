"""Per-query profiler for optimization rounds (guide §1: measure first).

For each named query:
- times the noop-sink execution (the bench's own methodology), twice
  (cold + warm), with ``setJobDescription(<name>)`` so jobs are
  attributable;
- writes ``.explain('formatted')`` to ``plans/r15/<name>_<tag>.txt``;
- after the run, parses the Spark event log into a per-query job
  breakdown: job count, total job wall-clock, and the top jobs by
  duration — the local-scale stand-in for the UI's Jobs page.

Usage:
    python scripts/profile_queries.py [--tag before] [--sf DIR] q1 q2 ...
    python scripts/profile_queries.py --top N   # N most expensive from BENCH_DETAIL
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default="profile")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--no-eventlog",
        action="store_true",
        help="skip the event log (it measurably inflates task-heavy "
        "streaming runs); walls only",
    )
    ap.add_argument("--plans-dir", default=os.path.join(HERE, "plans", "r15"))
    args = ap.parse_args()

    names = list(args.names)
    if args.top:
        detail = json.load(open(os.path.join(HERE, "BENCH_DETAIL.json")))
        ranked = sorted(detail["extensions_median"].items(), key=lambda kv: -kv[1])
        names += [k for k, _ in ranked[: args.top] if k not in names]

    evdir = f"/tmp/profile_events_{os.getpid()}"
    os.makedirs(evdir, exist_ok=True)

    from pyspark.sql import SparkSession

    from udacity_data_engineering_spark.session import configure

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 16)))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.warehouse.dir", f"/tmp/uds_warehouse_{os.getpid()}")
    )
    if not args.no_eventlog:
        builder = (
            builder.config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.dir", f"file://{evdir}")
            .config("spark.eventLog.compress", "false")
            .config("spark.eventLog.rolling.enabled", "false")
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    configure(spark)

    from udacity_data_engineering_spark.plans.registry import all_queries

    manifest = all_queries()
    os.makedirs(args.plans_dir, exist_ok=True)

    # warm-up
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()

    walls: dict[str, list[float]] = {}
    for name in names:
        q = manifest[name]
        sc = spark.sparkContext
        walls[name] = []
        for rep in range(args.reps):
            sc.setJobDescription(f"{name}#rep{rep}")
            t0 = time.perf_counter()
            df = q.fn(spark, args.sf)
            t_build = time.perf_counter() - t0
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            walls[name].append(wall)
            sc.setJobDescription(None)
            print(f"{name} rep{rep}: wall {wall:.3f}s (build {t_build:.3f}s)",
                  flush=True)
        # formatted plan of the (already computed) last frame
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        with open(os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
            f.write(plan)

    spark.stop()

    # ---- parse event log: per-description job stats -------------------
    logfiles: list[str] = []
    for dirpath, _dirnames, filenames in os.walk(evdir):
        logfiles += [
            os.path.join(dirpath, fn)
            for fn in filenames
            if "events" in fn or fn.startswith("local-")
        ]
    jobs: dict[str, list[tuple[int, float]]] = {}
    for path in logfiles:
        starts: dict[int, tuple[str, int]] = {}
        with open(path, errors="ignore") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerJobStart":
                    desc = ev.get("Properties", {}).get(
                        "spark.job.description", "<none>"
                    )
                    starts[ev["Job ID"]] = (desc, ev["Submission Time"])
                elif ev.get("Event") == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in starts:
                        desc, t0 = starts[jid]
                        dur = (ev["Completion Time"] - t0) / 1000.0
                        jobs.setdefault(desc, []).append((jid, dur))

    report = {}
    for desc, js in sorted(jobs.items()):
        report[desc] = {
            "n_jobs": len(js),
            "job_total_s": round(sum(d for _, d in js), 3),
            "top_jobs_s": [round(d, 3) for d in sorted((d for _, d in js), reverse=True)[:8]],
        }
    out = {
        "walls": {k: [round(x, 3) for x in v] for k, v in walls.items()},
        "jobs_by_description": report,
    }
    rpt = os.path.join(HERE, f"PROFILE_{args.tag}.json")
    with open(rpt, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"\nwrote {rpt}")
    for name in names:
        w = walls[name]
        j = report.get(f"{name}#rep1") or report.get(f"{name}#rep0") or {}
        print(
            f"{name:45s} cold {w[0]:7.3f}s warm {min(w):7.3f}s "
            f"jobs {j.get('n_jobs', '?'):>4} jobtot {j.get('job_total_s', '?')}"
        )


if __name__ == "__main__":
    main()
