"""Upsert (MERGE) into a parquet lake — last-writer-wins by key.

The reference's lake is overwrite-only (etl.py:74,86,120). Real pipelines
need incremental upserts; without a transactional table format the
parquet-native equivalent is: anti-join the target against the update
keys, union the updates, stage to a fresh directory, swap. Each rename
is atomic on posix/HDFS, but the swap is TWO renames (target->old,
staged->target): a crash exactly between them leaves no directory at
the target until the recovery below restores the old one. Readers
concurrent with the swap can also see the gap. On object stores or for
concurrent writers use a transactional format (Delta/Iceberg) — this
module is the dependency-free fallback with the same logical semantics
as MERGE ... WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


def merge_into(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    order_col: str | None = None,
) -> int:
    """Upsert ``updates`` into the parquet directory at ``target_path``
    keyed on ``key_cols``; returns the new row count.

    Duplicate keys within ``updates`` (a normal CDC batch): pass
    ``order_col`` and the greatest value wins per key; without it,
    duplicate keys raise — silently keeping both would break the
    one-row-per-key merge contract.

    Plan shape: one anti-join (broadcast when updates are small — the
    normal incremental case) + union + full rewrite of the target. The
    rewrite cost is the honest price of parquet immutability; partition
    the target and merge only affected partitions to bound it at scale.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    if order_col is not None:
        w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
        updates = (
            updates.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:
        n, nk = updates.count(), updates.select(*key_cols).distinct().count()
        if n != nk:
            raise ValueError(
                f"updates contain {n - nk} duplicate-key rows; pass "
                "order_col to pick a winner per key"
            )
    staged = f"{target_path}__stage_{int(time.time() * 1000)}"
    target = spark.read.parquet(target_path)
    merged = target.join(updates, key_cols, "left_anti").unionByName(updates)
    try:
        merged.write.mode("overwrite").parquet(staged)
        n = spark.read.parquet(staged).count()
    except BaseException:
        shutil.rmtree(staged, ignore_errors=True)
        raise
    old = f"{target_path}__old_{int(time.time() * 1000)}"
    os.rename(target_path, old)
    try:
        os.rename(staged, target_path)
    except BaseException:
        # restore the pre-merge target so a failed swap never leaves the
        # path empty; the staged dir is removed, not promoted
        os.rename(old, target_path)
        shutil.rmtree(staged, ignore_errors=True)
        raise
    shutil.rmtree(old, ignore_errors=True)
    return n
