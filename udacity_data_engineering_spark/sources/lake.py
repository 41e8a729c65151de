"""Lake maintenance: MERGE-style upsert into a hive-partitioned parquet
lake via dynamic partition overwrite.

The reference's sinks are full-table overwrites (reference etl.py:86,120)
— correct for a rebuild, ruinous for the production cadence of "apply
today's updates to a 100 TB lake". Without a table format (Delta/Iceberg)
the parquet-native MERGE is the dynamic-partition-overwrite pattern every
warehouse job on plain parquet uses:

1. find the partitions the update batch touches (batch-sized distinct);
2. read ONLY those partitions back (a broadcast semi-join the scan
   planner turns into partition pruning — the lake's untouched
   partitions are never opened);
3. anti-join the touched partitions' current rows against the update
   keys, union the updates in;
4. write with ``partitionOverwriteMode=dynamic``, which replaces exactly
   the partition directories present in the written frame and leaves
   every other directory byte-identical (tests/test_lake.py pins the
   untouched files by name+mtime).

Cost scales with the touched partitions + the batch, never the lake.
The overwrite option is set per-WRITE (DataFrameWriter option), never a
session-wide conf leak — same posture as the per-relation ingest policy
in sources/parquet_source.read_parquet_robust.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table
from udacity_data_engineering_spark.sources.parquet_source import (
    scratch_dir,
    write_partitioned,
)


def merge_upsert(
    spark: SparkSession,
    lake_dir: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str,
) -> None:
    """Upsert ``updates`` into the partitioned parquet lake at
    ``lake_dir``: rows matching on ``key_cols`` are replaced, new keys
    are inserted. Requires each update row to carry its (unchanged)
    ``partition_col`` value — a key that MOVES partitions needs the old
    partition in the touched set too, which is a table-format (Delta
    MERGE) job, and this function is documented as the parquet-native
    subset.

    The merged frame is localCheckpointed before the write: Spark
    (correctly) refuses a plan that reads and overwrites the same path,
    and the checkpoint materializes only the touched partitions + batch
    — batch-scale state, not lake-scale. A cluster deployment would use
    a staging write + rename for the same lineage cut.

    The touched-partition values are collected driver-side — bounded by
    contract (a batch touches few partitions; the PQ-codebook posture)
    and REQUIRED for pruning: a broadcast semi-join on the partition
    column does NOT trigger partition pruning on a plain parquet scan
    (measured: PartitionFilters stays [isnotnull] and every directory
    is read), while the literal ``isin`` filter prunes statically
    (tests/test_lake.py pins the plan).
    """
    affected = sorted(
        r[0] for r in updates.select(partition_col).distinct().collect()
    )
    current = spark.read.parquet(lake_dir).filter(
        F.col(partition_col).isin(affected)
    )
    merged = current.join(
        F.broadcast(updates.select(*key_cols)), key_cols, "left_anti"
    ).unionByName(updates)
    staged = merged.localCheckpoint(eager=True)
    (
        staged.repartition(partition_col)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(lake_dir)
    )


def merge_delete(
    spark: SparkSession,
    lake_dir: str,
    keys: DataFrame,
    key_cols: list[str],
    partition_col: str,
) -> None:
    """Delete every lake row matching ``keys`` on ``key_cols`` — the
    right-to-be-forgotten / retention-expiry lake op. Unlike
    ``merge_upsert``'s batch, a deletion key set usually does NOT carry
    the partition column (you know the user ids, not where they live),
    so locating the touched partitions takes one column-pruned scan of
    (key_cols, partition_col) over the lake — the unavoidable lookup
    cost when no key→partition index exists; everything after is
    touched-partitions + keys sized.

    The edge dynamic overwrite silently gets wrong: a partition whose
    EVERY row is deleted contributes no rows to the rewrite, so dynamic
    overwrite never touches its directory and the "deleted" rows
    survive. Those fully-emptied partitions are detected (touched minus
    surviving, a tiny driver-side set) and their directories removed
    explicitly. tests/test_lake.py pins both the edge and the pruning.
    """
    lake = spark.read.parquet(lake_dir)
    touched = sorted(
        r[0]
        for r in lake.join(F.broadcast(keys), key_cols, "left_semi")
        .select(partition_col)
        .distinct()
        .collect()
    )
    if not touched:
        return
    current = lake.filter(F.col(partition_col).isin(touched))
    remaining = current.join(F.broadcast(keys), key_cols, "left_anti")
    staged = remaining.localCheckpoint(eager=True)
    surviving = {
        r[0] for r in staged.select(partition_col).distinct().collect()
    }
    (
        staged.repartition(partition_col)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(lake_dir)
    )
    emptied = [p for p in touched if p not in surviving]
    if emptied:
        jvm = spark._jvm
        jroot = jvm.org.apache.hadoop.fs.Path(lake_dir)
        fs = jroot.getFileSystem(spark._jsc.hadoopConfiguration())
        for p in emptied:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(
                    lake_dir, f"{partition_col}={p}"
                ),
                True,
            )


@register(
    "q_merge_delete",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderpriority,
               round(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE o_custkey % 50 <> 3
    """,
    doc="GDPR-style lake deletion: scrub every order belonging to a set "
    "of customers (o_custkey % 50 = 3) from the priority-partitioned "
    "parquet lake. The key set carries no partition column, so one "
    "column-pruned scan locates the touched partitions; only those are "
    "anti-joined and rewritten (dynamic overwrite), with fully-emptied "
    "partition directories removed explicitly — the edge dynamic "
    "overwrite alone silently leaves behind. Hash-proven: the "
    "re-scanned lake equals orders minus the scrubbed customers.",
    tags=("sources", "2A.20"),
)
def q_merge_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    lake_dir = scratch_dir("delete_lake")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )
    write_partitioned(orders, lake_dir, ["o_orderpriority"])
    keys = (
        orders.filter(F.col("o_custkey") % 50 == 3)
        .select("o_custkey")
        .distinct()
    )
    merge_delete(spark, lake_dir, keys, ["o_custkey"], "o_orderpriority")
    back = spark.read.schema(orders.schema).parquet(lake_dir)
    return back.select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


@register(
    "q_merge_upsert",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderpriority,
               round(CASE WHEN o_orderkey % 10 = 0
                           AND o_orderpriority IN ('1-URGENT', '2-HIGH')
                          THEN o_totalprice + 1000.0
                          ELSE o_totalprice END, 2) AS o_totalprice
        FROM orders
    """,
    doc="MERGE-style upsert into a hive-partitioned parquet lake via "
    "dynamic partition overwrite: build the lake from orders partitioned "
    "by o_orderpriority, upsert a batch (every 10th key in the URGENT/"
    "HIGH partitions, price +1000), re-scan the whole lake. Only the two "
    "touched partition directories are read or rewritten — the other "
    "three are never opened (pruned scan) nor replaced (dynamic "
    "overwrite; file-level untouched-ness pinned in tests/test_lake.py). "
    "Hash-proven: the re-scanned lake equals the oracle's CASE-patched "
    "orders table.",
    tags=("sources", "2A.20"),
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    lake_dir = scratch_dir("merge_lake")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )
    # static overwrite resets the lake to base state each invocation,
    # so repeated runs in one process stay deterministic
    write_partitioned(orders, lake_dir, ["o_orderpriority"])
    updates = orders.filter(
        (F.col("o_orderkey") % 10 == 0)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1000.0))
    merge_upsert(
        spark, lake_dir, updates, ["o_orderkey"], "o_orderpriority"
    )
    back = spark.read.schema(orders.schema).parquet(lake_dir)
    return back.select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
