"""Manifest-based data skipping: the pruned read must equal the full
scan exactly while reading strictly fewer files on a sorted layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_data_engineering_spark.sources.skipping import (
    build_file_stats,
    prune_files,
    read_with_skipping,
)


def _sorted_layout(spark, path, n_files=8):
    df = spark.createDataFrame([(i, i % 7) for i in range(800)], "k long, v long")
    df.repartitionByRange(n_files, "k").sortWithinPartitions("k").write.mode(
        "overwrite"
    ).parquet(path)
    return df


def test_skipping_equals_full_scan_and_prunes(spark, tmp_path):
    path = str(tmp_path / "t")
    _sorted_layout(spark, path)
    stats = build_file_stats(spark, path, ["k"])
    assert stats.count() == 8
    out, kept, total = read_with_skipping(spark, stats, "k", 100, 199)
    assert total == 8 and 1 <= kept <= 2  # 100 ids per file, sorted
    got = sorted((r.k, r.v) for r in out.collect())
    want = [(k, k % 7) for k in range(100, 200)]
    assert got == want


def test_skipping_envelope_boundaries_inclusive(spark, tmp_path):
    """A file whose envelope merely TOUCHES the range boundary must be
    kept (closed-range semantics on both sides)."""
    path = str(tmp_path / "t")
    _sorted_layout(spark, path)
    stats = build_file_stats(spark, path, ["k"])
    # file 0 covers [0, 99]; a range starting exactly at 99 must keep it
    kept, total = prune_files(stats, "k", 99, 99)
    assert len(kept) == 1
    out, _, _ = read_with_skipping(spark, stats, "k", 99, 99)
    assert [r.k for r in out.collect()] == [99]


def test_skipping_null_only_file_is_skipped(spark, tmp_path):
    """NULLs never match a range predicate; a null-only file has NULL
    min/max and must be pruned, and kept-file NULL rows must be filtered."""
    path = str(tmp_path / "t")
    spark.createDataFrame([(None,)] * 10, "k long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    spark.createDataFrame([(5,), (None,), (9,)], "k long").coalesce(1).write.mode(
        "append"
    ).parquet(path)
    stats = build_file_stats(spark, path, ["k"])
    out, kept, total = read_with_skipping(spark, stats, "k", 0, 100)
    assert total == 2 and kept == 1
    assert sorted(r.k for r in out.collect()) == [5, 9]


def test_skipping_empty_prune_needs_schema(spark, tmp_path):
    import pytest

    path = str(tmp_path / "t")
    _sorted_layout(spark, path)
    stats = build_file_stats(spark, path, ["k"])
    with pytest.raises(ValueError, match="schema"):
        read_with_skipping(spark, stats, "k", 10_000, 20_000)
    out, kept, total = read_with_skipping(
        spark, stats, "k", 10_000, 20_000, schema="k long, v long"
    )
    assert kept == 0 and total == 8 and out.count() == 0
    assert out.columns == ["k", "v"]
