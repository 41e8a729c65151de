#!/usr/bin/env python
"""Skewed-data probe: prove the salted paths are NECESSARY, not merely
result-equivalent (the oracle tests prove equivalence; this measures the
win on data where one key dominates).

Builds a zipf-hot-key events replica in /tmp: FACTOR x sf0.1 events
(default 40 x 100k = 4M rows) where HOT_FRAC of all rows share ONE
user_id and the rest keep their original keys; plus a mid-size users
dim too large to broadcast comfortably and not broadcast by config.

Measures a join-heavy shape (events JOIN users ON user_id, then
aggregate) three ways:
  1. unsalted  — sort-merge join, AQE skew-split OFF: the hot key's
     entire fan-out lands on one reducer (the 100 TB failure mode)
  2. aqe_skew  — AQE skew-join ON with thresholds low enough to fire
     at probe scale (defaults are 256 MB-sized, production-tuned)
  3. salted    — salted_join(n_salts=32): hot key spread across 32
     reducers by construction
and a window shape (row_number over the hot partition key) unsalted vs
pre-aggregated, since AQE cannot split a window partition.

Each timing is best-of-2 (JIT/page-cache warm). Results go to SCALE.md.

Usage: python scripts/skew_probe.py [factor] [hot_frac]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from udacity_data_engineering_spark.operators.physical import salted_join
from udacity_data_engineering_spark.session import build_session, table

SF_DIR = "/root/testdata/sf0.1"
FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 40
HOT_FRAC = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
HOT_KEY = 424242
BASE = f"/tmp/skew_probe_v2_x{FACTOR}_{int(HOT_FRAC * 100)}"


def build(spark) -> None:
    if os.path.exists(f"{BASE}/_done"):
        return
    ev = table(spark, SF_DIR, "events")
    parts = []
    for i in range(FACTOR):
        parts.append(
            ev.withColumn("event_id", F.col("event_id") + F.lit(i * 10_000_000))
            .withColumn(
                "user_id",
                # deterministic zipf-ish head: HOT_FRAC of rows collapse
                # onto one key, the tail keeps distinct (replica-shifted)
                # keys so dim matching stays realistic
                # tail keys stay UNSHIFTED so the users dim stays
                # mid-size (tens of k rows) — the regime where
                # broadcast is borderline and skew handling matters
                F.when(
                    F.pmod(F.xxhash64("event_id"), F.lit(1000))
                    < F.lit(int(HOT_FRAC * 1000)),
                    F.lit(HOT_KEY),
                ).otherwise(F.col("user_id")),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{BASE}/events")
    # mid-size dim: every user_id present incl. the hot key
    (
        spark.read.parquet(f"{BASE}/events")
        .select("user_id")
        .distinct()
        .withColumn("segment", F.pmod(F.col("user_id"), F.lit(7)))
        .withColumn("weight", (F.pmod(F.col("user_id"), F.lit(1000)) / 1000.0))
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{BASE}/users")
    )
    Path(f"{BASE}/_done").touch()


def timed(fn, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 2)


def main() -> None:
    spark = build_session(app_name="skew-probe", cpus=32)
    build(spark)
    ev = spark.read.parquet(f"{BASE}/events")
    users = spark.read.parquet(f"{BASE}/users")
    n = ev.count()

    # never broadcast: the probe models the mid-size-dim regime where
    # broadcast is off the table and the only choices are SMJ/AQE/salt
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    def consumed(df):
        # carries value + props through the join so the shuffled fact
        # rows have realistic width — with only the join key selected,
        # the hot partition (9M identical bigints) lz4-compresses to
        # almost nothing and AQE's BYTE-based skew detection never
        # fires even though the single-task join is the bottleneck
        # (measured; recorded in SCALE.md)
        return df.groupBy("segment").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("v"),
            F.sum(F.length("props")).alias("p"),
        )

    def consume(df):
        return consumed(df).collect()

    def set_skew(enabled: bool):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(enabled).lower())
        # defaults (5x / 256 MB) never fire at probe scale; size to it
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")

    results = {"rows": n, "hot_frac": HOT_FRAC, "hot_key": HOT_KEY}

    set_skew(False)
    results["join_unsalted"] = timed(lambda: consume(ev.join(users, "user_id")))
    set_skew(True)
    results["join_aqe_skew"] = timed(
        lambda: consume(ev.join(users, "user_id"))
    )
    # the marker must be read from the EXECUTED plan of the very
    # DataFrame that was collected (a fresh plan has no AQE runtime info)
    probe = consumed(ev.join(users, "user_id"))
    probe.collect()
    results["aqe_skew_fired"] = (
        "skew=true" in probe._jdf.queryExecution().executedPlan().toString()
    )
    set_skew(False)
    results["join_salted"] = timed(
        lambda: consume(salted_join(ev, users, "user_id", n_salts=32))
    )

    # narrow-row variant: only the join key survives column pruning, so
    # the hot partition is 9M IDENTICAL bigints that lz4-compress to
    # under the byte threshold — AQE's size-based skew detection misses
    # the (CPU-bound) single-task join, while salting still spreads it.
    def consume_narrow(df):
        return df.groupBy("segment").agg(F.count(F.lit(1)).alias("n")).collect()

    set_skew(False)
    results["narrow_join_unsalted"] = timed(
        lambda: consume_narrow(ev.join(users, "user_id"))
    )
    set_skew(True)
    results["narrow_join_aqe"] = timed(
        lambda: consume_narrow(ev.join(users, "user_id"))
    )
    nprobe = ev.join(users, "user_id").groupBy("segment").agg(F.count(F.lit(1)))
    nprobe.collect()
    results["narrow_aqe_fired"] = (
        "skew=true" in nprobe._jdf.queryExecution().executedPlan().toString()
    )
    set_skew(False)
    results["narrow_join_salted"] = timed(
        lambda: consume_narrow(salted_join(ev, users, "user_id", n_salts=32))
    )

    # window over the hot partition key: AQE cannot split a window
    # partition — the fix is shape change (pre-aggregate), not config
    from pyspark.sql.window import Window

    def window_hot():
        w = Window.partitionBy("user_id").orderBy(F.col("ts").desc())
        return (
            ev.withColumn("rn", F.row_number().over(w)).filter("rn = 1").count()
        )

    def window_preagg():
        # top-1-by-ts via max_by: partial-aggregates map-side, no
        # single-reducer hot partition
        return (
            ev.groupBy("user_id")
            .agg(F.max_by("event_id", "ts").alias("event_id"))
            .count()
        )

    results["window_hot_unsalted"] = timed(window_hot)
    results["window_preagg"] = timed(window_preagg)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
