"""Manifest-based data skipping — the lakehouse file-stats index
(Delta/Iceberg's min-max manifests, parquet-native; charter extension,
SURVEY.md §2B physical/W+ — the reference reads whole directories,
etl.py:31,104).

Partition pruning only skips whole directory subtrees; WITHIN a
partition, a predicate on a non-partition column still lists and opens
every file (parquet row-group stats prune IO, but the footer of every
file is still fetched — on an object store that is one GET per file, the
real 100 TB listing tax). A file-stats MANIFEST fixes this: one tiny
table of per-file (min, max, null_count, n_rows) per indexed column,
built in a single scan, stored beside the data, consulted BEFORE the
read so the plan's file list never contains a file the predicate can't
match. The win scales with layout quality: data written sorted/z-ordered
on the indexed column (physical.py sorted_layout / zorder_layout) gives
near-disjoint per-file ranges, so a point/range predicate keeps O(result)
files instead of O(all).

Driver state: the pruned FILE LIST (one string per kept file) — the same
bounded manifest read every table format's planner performs; the stats
build and the data read stay fully distributed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


def build_file_stats(
    spark: SparkSession, path: str, cols: Sequence[str]
) -> DataFrame:
    """Per-file stats manifest for ``cols``: one scan, grouped by
    input_file_name — (file, n_rows, min_/max_/nulls_ per column). At
    most one output row per FILE; write it beside the data and refresh
    incrementally on append (new files only — the manifest is additive
    because files are immutable once committed)."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"),
        ]
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)


def refresh_file_stats(
    spark: SparkSession, path: str, cols: Sequence[str], stats: DataFrame
) -> DataFrame:
    """Incremental manifest refresh after an APPEND: stat only the files
    the manifest hasn't seen (files are immutable once committed, so old
    rows never change — the manifest is additive). The new-file discovery
    is a DIRECTORY LISTING (Hadoop FS, one round per directory level),
    never a table scan; only genuinely-new files are read. Rows for files
    that vanished (compaction, retention) are dropped so the manifest
    never names unreadable files. File identities compare on normalized
    URIs — input_file_name and FS listings spell the scheme differently
    (file:/// vs file:/)."""

    def _norm(p: str) -> str:
        if p.startswith("file:"):
            p = p[5:]
            while p.startswith("//"):
                p = p[1:]
        return p

    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    listed: dict[str, str] = {}
    stack = [jpath]
    while stack:
        for s in fs.listStatus(stack.pop()):
            name = s.getPath().getName()
            if name.startswith(("_", ".")):
                continue
            if s.isFile():
                if name.endswith(".parquet"):
                    full = s.getPath().toString()
                    listed[_norm(full)] = full
            else:
                stack.append(s.getPath())
    known = {_norm(r["file"]): r["file"] for r in stats.select("file").collect()}
    new = sorted(listed[k] for k in listed.keys() - known.keys())
    kept = stats.filter(
        F.col("file").isin([known[k] for k in known.keys() & listed.keys()])
    )
    if not new:
        return kept
    df = spark.read.parquet(*new)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"),
        ]
    fresh = df.groupBy(F.input_file_name().alias("file")).agg(*aggs)
    return kept.unionByName(fresh)


def prune_files(
    stats: DataFrame, col: str, lo, hi
) -> tuple[list[str], int]:
    """Consult the manifest for a closed-range predicate ``lo <= col <=
    hi``: keep files whose [min, max] envelope intersects the range.
    NULLs never match a range predicate, and a null-only file has NULL
    min/max — the comparison is NULL, not True, so it is skipped (the
    correct call, pinned in tests). Returns (kept files, total files) —
    kept is the driver-side file list handed to the reader, bounded by
    the file count like any table-format manifest read."""
    rows = stats.select(
        "file",
        (
            (F.col(f"max_{col}") >= F.lit(lo))
            & (F.col(f"min_{col}") <= F.lit(hi))
        ).alias("keep"),
    ).collect()
    kept = sorted(r["file"] for r in rows if r["keep"])
    return kept, len(rows)


def read_with_skipping(
    spark: SparkSession,
    stats: DataFrame,
    col: str,
    lo,
    hi,
    schema=None,
) -> tuple[DataFrame, int, int]:
    """Range read through the manifest: prune the file list, read ONLY
    the kept files, and re-apply the predicate exactly (stats prune at
    file granularity; rows inside a kept file still need the filter).
    Returns (frame, kept_files, total_files) so callers can assert the
    index actually pruned. ``schema`` (DDL string or StructType) is
    REQUIRED to build the empty frame when the predicate prunes every
    file — a pruned-to-zero read is routine (a range past the newest
    data), not an error."""
    kept, total = prune_files(stats, col, lo, hi)
    if not kept:
        if schema is None:
            raise ValueError(
                "predicate prunes every file; pass an explicit schema to "
                "build the empty frame"
            )
        empty = spark.createDataFrame([], schema)
        return empty, 0, total
    reader = spark.read.schema(schema) if schema else spark.read
    df = reader.parquet(*kept).filter(
        (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    )
    return df, len(kept), total


@register(
    "q_file_skipping",
    oracle="""
        SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
          AND CAST(o_orderdate AS DATE) <= DATE '1996-06-30'
        GROUP BY 1
    """,
    doc="Manifest-based DATA SKIPPING: orders rewritten date-sorted into "
    "16 files (near-disjoint per-file date envelopes), a per-file "
    "min/max stats manifest built in one scan, then a 6-month range "
    "read consults the manifest FIRST — the plan's file list never "
    "contains a file the predicate can't match (enforced in-query: "
    "raises unless kept < total), and the predicate is re-applied "
    "exactly inside kept files. The Delta/Iceberg manifest mechanic, "
    "parquet-native; hash-proven against the plain full-scan filter.",
    tags=("physical", "sources", "W+"),
)
def q_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from udacity_data_engineering_spark.sources.parquet_source import (
        scratch_dir,
    )

    orders = table(spark, sf_dir, "orders").withColumn(
        "o_orderdate", F.to_date("o_orderdate")
    )
    root = scratch_dir("file_skipping")
    path = os.path.join(root, "orders_sorted")
    # sorted layout: repartitionByRange gives each file a tight,
    # near-disjoint o_orderdate envelope — the layout data skipping pays
    # for itself on (a random layout's envelopes all span the full range)
    orders.repartitionByRange(16, "o_orderdate").sortWithinPartitions(
        "o_orderdate"
    ).write.mode("overwrite").parquet(path)

    stats = build_file_stats(spark, path, ["o_orderdate"])
    import datetime
    lo = datetime.date(1996, 1, 1)
    hi = datetime.date(1996, 6, 30)
    # schema makes the everything-pruned case (an EMPTY orders table
    # writes one row-less file whose stats prune) a valid empty result
    df, kept, total = read_with_skipping(
        spark, stats, "o_orderdate", lo, hi, schema=orders.schema
    )
    if total >= 4 and not kept < total:
        # not assert: the skipping invariant must hold under -O too
        raise RuntimeError(
            f"file skipping kept {kept}/{total} files for a 6-month range "
            "over ~7 years of sorted data — the manifest pruned nothing"
        )
    return df.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )
