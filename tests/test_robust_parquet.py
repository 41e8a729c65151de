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


def test_streaming_ingest_corrupt_file_policy(spark, tmp_path):
    """The stream source honors the same per-relation corrupt-file
    policy: strict availableNow run dies on a torn file; the opt-in run
    completes with exactly the good rows."""
    import pyspark.sql.functions as F

    from udacity_data_engineering_spark.session import table
    from udacity_data_engineering_spark.streaming.event_stream import (
        run_available_now,
        stream_events,
    )

    src = tmp_path / "stream_src"
    src.mkdir()
    table(spark, "/root/testdata/sf0.001", "events").limit(50).coalesce(
        1
    ).write.mode("overwrite").parquet(str(src / "good"))
    import glob
    import shutil

    good = glob.glob(f"{src}/good/part-*.parquet")[0]
    shutil.move(good, src / "events-good.parquet")
    shutil.rmtree(src / "good")
    (src / "events-torn.parquet").write_bytes(b"PAR1" + b"\x00" * 64)

    counts = stream_events(
        spark, str(src), ignore_corrupt=True
    ).groupBy().agg(F.count(F.lit(1)).alias("n"))
    run_available_now(
        counts, "robust_stream_sink", str(tmp_path / "ckpt_ok")
    )
    assert spark.table("robust_stream_sink").collect()[0].n == 50

    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    strict = stream_events(spark, str(src)).groupBy().agg(
        F.count(F.lit(1)).alias("n")
    )
    with pytest.raises(StreamingQueryException):
        run_available_now(
            strict, "robust_stream_sink_strict", str(tmp_path / "ckpt_bad")
        )
