"""Capture round-16 before/after plan evidence into plans/r16/.

Two kinds of artifact, per VERDICT r15 item 8:
- batch queries (charlm family): `.explain('formatted')` of the declared
  DataFrame — the standard evidence;
- streaming queries: the LAST MICRO-BATCH physical plan via
  `capture_streaming_plans` + each query's `record_streaming_plan` hook
  (explainInternal), NOT the post-localCheckpoint `Scan ExistingRDD` of
  the returned frame, which r15's files showed and which proves nothing.

Run from the repo snapshot whose plans you want (the r15 git archive for
"before", the working tree for "after"):

    python scripts/capture_plans_r16.py --tag before --plans-dir /root/repo/plans/r16
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "vendor", "protobuf_shim"))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

BATCH = ["q_charlm_score", "q_charlm_by_lang", "q_charlm_lang_filter"]
STREAMING = [
    "q_streaming_stateful_ttl",
    "q_streaming_stateful_mapstate",
    "q_streaming_stateful_liststate",
    "q_streaming_stateful_totals_tws",
    "q_streaming_stateful_warmstart",
    "q_streaming_outer_join",
    "q_streaming_stateful_totals",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--plans-dir", required=True)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    )
    ap.add_argument("--queries", default="")
    args = ap.parse_args()
    os.makedirs(args.plans_dir, exist_ok=True)

    from udacity_data_engineering_spark.plans.registry import all_queries
    from udacity_data_engineering_spark.session import build_session
    from udacity_data_engineering_spark.streaming.event_stream import (
        capture_streaming_plans,
    )

    spark = build_session(app_name=f"plan-capture-{args.tag}")
    spark.sparkContext.setLogLevel("ERROR")
    manifest = all_queries()
    wanted = set(args.queries.split(",")) if args.queries else None

    # Spark 4: instances are pyspark.sql.classic.dataframe.DataFrame,
    # which overrides the base class' methods — patch the classic class
    from pyspark.sql.classic.dataframe import DataFrame

    def explain_to(df, path, header=""):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(path, "w") as f:
            if header:
                f.write(header)
            f.write(buf.getvalue())
        print(f"wrote {path}", flush=True)

    for name in BATCH:
        if wanted and name not in wanted:
            continue
        explain_to(
            manifest[name].fn(spark, args.sf),
            os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"),
        )
        # The r16 charlm plan cuts lineage at the doc-sized per_doc
        # frame (localCheckpoint), so the final frame's explain shows a
        # Scan ExistingRDD past the cut — which hides the explosion
        # subtree the optimization is about. Capture a second artifact
        # with lineage cuts DISABLED: it shows the true operator tree;
        # note the per_doc subtree then prints under BOTH consumers
        # (totals + output join) while the executed plan runs it once
        # (that is what the cut is for).
        real_lc = DataFrame.localCheckpoint
        DataFrame.localCheckpoint = lambda self, *a, **k: self  # type: ignore
        try:
            explain_to(
                manifest[name].fn(spark, args.sf),
                os.path.join(
                    args.plans_dir, f"{name}_{args.tag}_nocut.txt"
                ),
                header=(
                    "# Captured with DataFrame.localCheckpoint disabled "
                    "so the operator tree is visible.\n# The executed "
                    "plan cuts at the doc-sized per_doc aggregate, so "
                    "the subtree printed under both consumers below "
                    "runs ONCE.\n",
                )[0],
            )
        finally:
            DataFrame.localCheckpoint = real_lc

    for name in STREAMING:
        if wanted and name not in wanted:
            continue
        with capture_streaming_plans() as plans:
            manifest[name].fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
        path = os.path.join(args.plans_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            for label, plan in plans:
                f.write(f"=== micro-batch plan: {label} ===\n{plan}\n")
        print(f"wrote {path} ({len(plans)} plans)", flush=True)


if __name__ == "__main__":
    main()
