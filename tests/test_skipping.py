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


def test_refresh_stats_incremental_append_and_vacuum(spark, tmp_path):
    """Refresh after an append must stat ONLY the new files (manifest is
    additive over immutable files) and drop rows for vanished files."""
    import os

    from udacity_data_engineering_spark.sources.skipping import (
        refresh_file_stats,
    )

    path = str(tmp_path / "t")
    spark.createDataFrame([(i,) for i in range(100)], "k long").coalesce(
        2
    ).write.mode("overwrite").parquet(path)
    stats0 = build_file_stats(spark, path, ["k"]).localCheckpoint(eager=True)
    n0 = stats0.count()

    # append a new file covering a fresh key range
    spark.createDataFrame([(i,) for i in range(1000, 1100)], "k long").coalesce(
        1
    ).write.mode("append").parquet(path)
    stats1 = refresh_file_stats(spark, path, ["k"], stats0).localCheckpoint(
        eager=True
    )
    assert stats1.count() == n0 + 1
    # old rows are byte-identical (not re-scanned/reordered semantics)
    old = {tuple(r) for r in stats0.collect()}
    assert old <= {tuple(r) for r in stats1.collect()}
    # and the refreshed manifest prunes the new range to the new file
    kept, total = prune_files(stats1, "k", 1000, 1099)
    assert total == n0 + 1 and len(kept) == 1

    # vanish a file (retention/compaction): its manifest row must go
    victim = [
        f for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ][0]
    os.remove(os.path.join(path, victim))
    stats2 = refresh_file_stats(spark, path, ["k"], stats1)
    assert stats2.count() == n0
    assert not any(victim in r["file"] for r in stats2.collect())


def test_bloom_index_no_false_negatives_and_prunes(spark, tmp_path):
    """Every present key's lookup must keep its file (false negatives
    impossible); most lookups on a hash-clustered layout keep a strict
    subset of files."""
    from udacity_data_engineering_spark.sources.skipping import (
        build_file_blooms,
        prune_files_bloom,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(k, k % 5) for k in range(400)], "k long, v long"
    )
    df.repartition(8, "k").write.mode("overwrite").parquet(path)
    blooms = build_file_blooms(spark, path, "k")
    # no false negatives: every key's true file is in the kept list
    truth = {
        r["k"]: r["f"]
        for r in spark.read.parquet(path)
        .select("k", F.input_file_name().alias("f"))
        .collect()
    }
    pruned_any = False
    for k in (0, 17, 123, 399):
        kept, total = prune_files_bloom(
            spark, blooms, "k", k, value_type="bigint"
        )
        assert total == 8
        assert truth[k] in kept, f"false negative for key {k}"
        pruned_any = pruned_any or len(kept) < total
    assert pruned_any  # 8192 bits over ~50 keys/file: fp ~0


def test_bloom_index_absent_key_prunes_everything_usually(spark, tmp_path):
    from udacity_data_engineering_spark.sources.skipping import (
        build_file_blooms,
        prune_files_bloom,
    )

    path = str(tmp_path / "t")
    spark.createDataFrame([(k,) for k in range(100)], "k long").repartition(
        4, "k"
    ).write.mode("overwrite").parquet(path)
    blooms = build_file_blooms(spark, path, "k")
    kept, total = prune_files_bloom(
        spark, blooms, "k", 10_000_000, value_type="bigint"
    )
    # false positives are possible in principle but vanishingly unlikely
    # at this load factor; the invariant that matters: a kept file is a
    # candidate only, and the exact filter downstream yields 0 rows
    assert total == 4
    if kept:
        got = (
            spark.read.parquet(*kept)
            .filter(F.col("k") == 10_000_000)
            .count()
        )
        assert got == 0


def test_combined_skipping_no_false_negatives_and_beats_each_leg(
    spark, tmp_path
):
    """The conjunctive prune must (a) never lose a matching row, (b) keep
    a subset of BOTH legs' survivors, (c) with a bucket x range layout,
    keep strictly fewer files than either leg alone."""
    from udacity_data_engineering_spark.sources.skipping import (
        build_file_blooms,
        build_file_stats,
        prune_files,
        prune_files_bloom,
        read_with_combined_skipping,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(k, v) for k in range(40) for v in range(100)], "k long, v long"
    )
    # 16 files clustered on (k%4, v range quartile): both indexes bite
    df.repartition(
        16, F.pmod(F.col("k"), F.lit(4)), F.floor(F.col("v") / 25)
    ).write.mode("overwrite").parquet(path)
    stats = build_file_stats(spark, path, ["v"])
    blooms = build_file_blooms(spark, path, "k")

    out, kept, total, detail = read_with_combined_skipping(
        spark, stats, blooms, "v", 10, 20, "k", 7, eq_type="bigint",
        schema="k long, v long",
    )
    rows = sorted((r.k, r.v) for r in out.collect())
    assert rows == [(7, v) for v in range(10, 21)]  # no false negatives
    kept_r, _ = prune_files(stats, "v", 10, 20)
    kept_b, _ = prune_files_bloom(spark, blooms, "k", 7, value_type="bigint")
    assert kept <= min(len(kept_r), len(kept_b))
    assert kept < total
    # the layout makes the intersection strictly better than either leg
    assert kept < len(kept_r) and kept < len(kept_b)


def test_combined_skipping_empty_result_needs_schema(spark, tmp_path):
    from udacity_data_engineering_spark.sources.skipping import (
        build_file_blooms,
        build_file_stats,
        read_with_combined_skipping,
    )

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(k, k) for k in range(50)], "k long, v long"
    ).repartition(4, "k").write.mode("overwrite").parquet(path)
    stats = build_file_stats(spark, path, ["v"])
    blooms = build_file_blooms(spark, path, "k")
    out, kept, total, _ = read_with_combined_skipping(
        spark, stats, blooms, "v", 1000, 2000, "k", 7, eq_type="bigint",
        schema="k long, v long",
    )
    assert kept == 0 and total == 4 and out.count() == 0


def test_size_bloom_bits_scaling_and_floor():
    from udacity_data_engineering_spark.sources.skipping import size_bloom_bits

    assert size_bloom_bits(1000, 16) == 8192  # small tables: the floor
    m = size_bloom_bits(150_000, 16)  # the sf1 saturation case
    assert m >= 150_000 // 16 * 12 and m % 64 == 0
    assert size_bloom_bits(0, 16) == 8192
    assert size_bloom_bits(100, 0) >= 100 * 12  # degenerate file count
