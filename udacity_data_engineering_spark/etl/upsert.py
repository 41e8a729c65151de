"""Upsert (MERGE) into a parquet lake — last-writer-wins by key.

The reference's lake is overwrite-only (etl.py:74,86,120). Real pipelines
need incremental upserts; without a transactional table format the
parquet-native equivalent is: anti-join the target against the update
keys, union the updates, stage to a fresh directory, swap. The swap is
atomic per-directory rename on posix/HDFS; on object stores or for
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
) -> int:
    """Upsert ``updates`` into the parquet directory at ``target_path``
    keyed on ``key_cols``; returns the new row count.

    Plan shape: one anti-join (broadcast when updates are small — the
    normal incremental case) + union + full rewrite of the target. The
    rewrite cost is the honest price of parquet immutability; partition
    the target and merge only affected partitions to bound it at scale.
    """
    staged = f"{target_path}__stage_{int(time.time() * 1000)}"
    target = spark.read.parquet(target_path)
    merged = target.join(updates, key_cols, "left_anti").unionByName(updates)
    merged.write.mode("overwrite").parquet(staged)
    n = spark.read.parquet(staged).count()
    old = f"{target_path}__old_{int(time.time() * 1000)}"
    os.rename(target_path, old)
    os.rename(staged, target_path)
    shutil.rmtree(old, ignore_errors=True)
    return n
