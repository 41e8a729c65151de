"""Stage-attribution probe for q_substring_scrub (round 16, guide §1):
time the span/decision prefix vs the full pipeline with the noop sink in
ONE session, so the word-level tail (posexplode + word join + ordered
collect_list) cost is the difference.

Usage: python scripts/scrub_profile_r16.py [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from udacity_data_engineering_spark.operators.substrings import (
        SPAN_WORDS,
        scrub_duplicate_spans,
        span_position_fingerprints,
    )
    from udacity_data_engineering_spark.session import build_session, table

    spark = build_session(app_name="scrub-profile-r16")
    spark.sparkContext.setLogLevel("ERROR")
    docs = table(spark, args.sf, "documents")

    def spans_only():
        return span_position_fingerprints(docs)

    def decision_only():
        spans = span_position_fingerprints(docs)
        keepers = (
            spans.groupBy("fp")
            .agg(
                F.min("doc_id").alias("__keeper"),
                F.countDistinct("doc_id").alias("__nd"),
            )
            .filter(F.col("__nd") >= 2)
        )
        return (
            spans.join(keepers, "fp")
            .filter(F.col("doc_id") != F.col("__keeper"))
            .select("doc_id", "pos")
        )

    def full():
        return scrub_duplicate_spans(docs)

    legs = {"spans": spans_only, "decision": decision_only, "full": full}
    walls: dict = {k: [] for k in legs}
    for rep in range(args.reps):
        for name, fn in legs.items():
            spark.sparkContext.setJobDescription(f"scrub {name} rep{rep}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            walls[name].append(round(time.perf_counter() - t0, 2))
            print(f"{name} rep{rep}: {walls[name][-1]}s", flush=True)
    for name, ws in walls.items():
        print(f"MEDIAN {name}: {statistics.median(ws)}s  runs {ws}")


if __name__ == "__main__":
    main()
