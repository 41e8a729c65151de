"""Corrupt-parquet ingest policy: strict default fails loudly, opt-in
skip-and-continue is scoped to the one relation."""

from __future__ import annotations

import pytest
from py4j.protocol import Py4JJavaError

from udacity_data_engineering_spark.sources.parquet_source import (
    read_parquet_robust,
)


@pytest.fixture()
def mixed_dir(spark, tmp_path):
    good = spark.createDataFrame(
        [(i, f"r{i}") for i in range(10)], "id long, s string"
    )
    out = str(tmp_path / "lake")
    good.coalesce(1).write.mode("overwrite").parquet(out)
    # a torn write: valid magic so it is picked up as parquet, garbage body
    (tmp_path / "lake" / "part-corrupt.parquet").write_bytes(
        b"PAR1" + b"\x00" * 64
    )
    return out


def test_strict_default_fails_loudly(spark, mixed_dir):
    with pytest.raises(Py4JJavaError):
        read_parquet_robust(spark, mixed_dir).count()


def test_opt_in_skips_corrupt_file_only(spark, mixed_dir):
    df = read_parquet_robust(spark, mixed_dir, ignore_corrupt=True)
    assert df.count() == 10
    assert {r.id for r in df.collect()} == set(range(10))


def test_policy_does_not_leak_to_other_reads(spark, mixed_dir):
    # the robust read succeeds...
    assert read_parquet_robust(spark, mixed_dir, ignore_corrupt=True).count() == 10
    # ...and a plain read of the same dir still fails: the option was
    # per-relation, not a session conf mutation
    with pytest.raises(Py4JJavaError):
        spark.read.parquet(mixed_dir).count()


def _two_file_lake(spark, tmp_path):
    import glob
    import os

    out = str(tmp_path / "lake2")
    spark.createDataFrame(
        [(i, f"r{i}") for i in range(10)], "id long, s string"
    ).repartition(2).write.mode("overwrite").parquet(out)
    parts = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(parts) == 2
    return out, parts


def test_missing_file_fails_loudly_by_default(spark, tmp_path):
    import os

    out, parts = _two_file_lake(spark, tmp_path)
    df = read_parquet_robust(spark, out)  # listing happens here
    os.remove(parts[0])  # compactor races the reader
    with pytest.raises(Py4JJavaError):
        df.count()


def test_opt_in_tolerates_deleted_file(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    out, parts = _two_file_lake(spark, tmp_path)
    df = read_parquet_robust(spark, out, ignore_missing=True)
    total = df.count()
    assert total == 10
    os.remove(parts[0])
    remaining = read_parquet_robust(
        spark, out, ignore_missing=True
    ).count()
    # re-list sees one file; the in-flight df (stale listing) also
    # finishes, returning only the surviving file's rows
    survived = df.count()
    assert remaining == survived
    assert 0 < survived < total
