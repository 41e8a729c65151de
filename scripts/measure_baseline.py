"""Re-runnable STOCK-PySpark baseline measurement (BASELINE.md recipe).

Runs the exact ten headline queries from BASELINE.md / bench.py with plain
PySpark — none of this repo's code paths — so bench ratios compare like for
like. Parameterized by core count so the baseline can be measured at the
same parallelism bench.py runs at (VERDICT r1: the r1 comparison was
local[32] engine vs local[8] baseline, flattering the engine ~unknown×).

Usage: python scripts/measure_baseline.py [--cpus 32] [--shuffle 32]
Prints one JSON line: {"queries": {...}, "total": ..., "cpus": ..., ...}
"""

from __future__ import annotations

import argparse
import json
import shutil
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"
#: best-of-5, matching bench.py's HEADLINE_REPS: sub-second queries on a
#: 32-core box carry enough scheduler jitter that best-of-3 leaves the
#: engine/stock ratio in a 0.58-0.82 band across identical runs (r12).
REPS = 5


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--shuffle", type=int, default=None)
    ap.add_argument("--sf", default=SF_DIR)
    args = ap.parse_args()
    shuffle = args.shuffle or max(args.cpus, 16)

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("stock-baseline")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    # dual-vintage: events.ts arrives as int64 nanos (nanosAsLong shim)
    # or as a true parquet timestamp[us] column (current testdata)
    events_ts_is_nanos = (
        dict(spark.read.parquet(f"{args.sf}/events.parquet").dtypes).get("ts")
        == "bigint"
    )
    t = {}
    for name in ("lineitem", "orders", "customer", "events"):
        df = spark.read.parquet(f"{args.sf}/{name}.parquet")
        if name == "events" and events_ts_is_nanos:
            df = df.withColumn(
                "ts", F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)")
            )
        t[name] = df
        df.createOrReplaceTempView(name)
    raw_events = spark.read.parquet(f"{args.sf}/events.parquet")
    raw_events_ms = (
        F.expr("ts DIV 1000000")
        if events_ts_is_nanos
        else F.expr("unix_millis(CAST(ts AS TIMESTAMP))")
    )
    tmp = tempfile.mkdtemp(prefix="baseline_out_")

    from pyspark.sql.types import TimestampType
    from datetime import datetime, timezone

    @F.udf(TimestampType())
    def epoch_ms_to_ts_stock(ms):
        return (
            None
            if ms is None
            else datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc).replace(tzinfo=None)
        )

    benches = {
        "scan_count_lineitem": lambda: t["lineitem"].count(),
        "filter_project": lambda: (
            t["lineitem"].filter(F.col("l_shipdate") < "1996-01-01")
            .select("l_orderkey", "l_extendedprice").count()
        ),
        "dedup_dropDuplicates": lambda: t["orders"].dropDuplicates(["o_custkey"]).count(),
        "hashagg_groupby": lambda: (
            t["lineitem"].groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.sum("l_extendedprice"),
                 F.avg("l_discount"), F.count(F.lit(1))).collect()
        ),
        "equijoin_agg": lambda: (
            t["orders"].join(t["customer"],
                             t["orders"].o_custkey == t["customer"].c_custkey)
            .groupBy("c_mktsegment").agg(F.sum("o_totalprice")).collect()
        ),
        "multicond_join_count": lambda: spark.sql("""
            SELECT monotonically_increasing_id() AS id,
                   year(o.o_orderdate) AS y, month(o.o_orderdate) AS m,
                   o.o_orderkey, c.c_custkey
            FROM orders o JOIN customer c
              ON o.o_custkey = c.c_custkey AND o.o_totalprice > c.c_acctbal
        """).count(),
        "timetable_dateparts_dedup": lambda: (
            t["events"].select(
                "ts", F.hour("ts"), F.dayofmonth("ts"), F.weekofyear("ts"),
                F.month("ts"), F.year("ts"), F.dayofweek("ts"))
            .dropDuplicates(["ts"]).count()
        ),
        "python_udf_epochms_to_ts": lambda: (
            raw_events.select(
                epoch_ms_to_ts_stock(raw_events_ms).alias("st")
            ).count()
        ),
        "parquet_write_partitioned": lambda: (
            t["orders"]
            .withColumns({"year": F.year("o_orderdate"),
                          "month": F.month("o_orderdate")})
            .write.mode("overwrite").partitionBy("year", "month")
            .parquet(f"{tmp}/orders_part")
        ),
        "etl_join_write_end2end": lambda: spark.sql("""
            SELECT monotonically_increasing_id() AS songplay_id,
                   o.o_orderkey, year(o.o_orderdate) AS year,
                   month(o.o_orderdate) AS month, c.c_custkey AS user_id,
                   c.c_mktsegment AS level, o.o_totalprice AS amount
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        """).write.mode("overwrite").partitionBy("year", "month").parquet(
            f"{tmp}/songplays"),
    }

    t["lineitem"].count()
    t["events"].count()

    results = {}
    for name, fn in benches.items():
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        results[name] = round(best, 3)
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({
        "queries": results,
        "total": round(sum(results.values()), 3),
        "cpus": args.cpus,
        "shuffle_partitions": shuffle,
        "sf": args.sf.rstrip("/").rsplit("sf", 1)[-1],
        "engine": "stock pyspark " + spark.version,
    }))


if __name__ == "__main__":
    main()
