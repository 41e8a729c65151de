"""MERGE-style upsert via dynamic partition overwrite (sources/lake.py).

Beyond row fidelity (the registered query's hash proof), the scale
contract is FILE-level: partitions the update batch does not touch must
come out of the merge byte-identical — same files, same mtimes — because
dynamic overwrite only replaces directories present in the written
frame. That is what bounds the job at touched-partitions + batch instead
of lake size.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from udacity_data_engineering_spark.sources.lake import merge_upsert


def _files(root: str) -> dict[str, tuple[str, ...]]:
    """partition dir -> sorted (name, mtime_ns) of its data files."""
    out = {}
    for d in sorted(os.listdir(root)):
        full = os.path.join(root, d)
        if not os.path.isdir(full) or d.startswith(("_", ".")):
            continue
        out[d] = tuple(
            sorted(
                (f, os.stat(os.path.join(full, f)).st_mtime_ns)
                for f in os.listdir(full)
                if f.endswith(".parquet")
            )
        )
    return out


def test_merge_rewrites_only_touched_partitions(spark, tmp_path):
    lake = str(tmp_path / "lake")
    base = spark.createDataFrame(
        [(i, f"p{i % 3}", float(i)) for i in range(30)],
        "id long, part string, val double",
    )
    base.repartition("part").write.partitionBy("part").parquet(lake)
    before = _files(lake)
    assert set(before) == {"part=p0", "part=p1", "part=p2"}

    updates = spark.createDataFrame(
        [(0, "p0", 100.0), (33, "p0", 133.0)], "id long, part string, val double"
    )
    merge_upsert(spark, lake, updates, ["id"], "part")

    after = _files(lake)
    # untouched partitions: identical files, identical mtimes
    assert after["part=p1"] == before["part=p1"]
    assert after["part=p2"] == before["part=p2"]
    # touched partition: actually rewritten
    assert after["part=p0"] != before["part=p0"]

    got = {
        (r.id, r.part, r.val)
        for r in spark.read.parquet(lake).collect()
    }
    want = {(i, f"p{i % 3}", float(i)) for i in range(30) if i != 0}
    want |= {(0, "p0", 100.0), (33, "p0", 133.0)}
    assert got == want


def test_merge_scan_prunes_untouched_partitions(spark, tmp_path):
    """The touched-partition read must PRUNE at the scan: the literal
    isin filter over the collected batch partition values reaches the
    parquet source as a static PartitionFilter, so untouched directories
    are never opened. (A broadcast semi-join on the partition column
    does NOT prune — measured; that is why merge_upsert collects.)"""
    lake = str(tmp_path / "lake2")
    base = spark.createDataFrame(
        [(i, f"p{i % 5}", float(i)) for i in range(50)],
        "id long, part string, val double",
    )
    base.repartition("part").write.partitionBy("part").parquet(lake)
    current = spark.read.parquet(lake).filter(F.col("part").isin(["p1"]))
    rows = current.collect()
    assert {r.part for r in rows} == {"p1"}
    assert len(rows) == 10
    plan = current._jdf.queryExecution().executedPlan().toString()
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "part" in pf[0] and "p1" in pf[0].split("PartitionFilters")[1]


def test_merge_delete_removes_keys_and_emptied_partitions(spark, tmp_path):
    from udacity_data_engineering_spark.sources.lake import merge_delete

    lake = str(tmp_path / "lake3")
    # partition p9 holds ONLY rows for key 9 — deleting key 9 must
    # remove the p9 directory itself, not leave it behind because
    # dynamic overwrite had no rows to write there
    rows = [(i, f"p{i % 3}", float(i)) for i in range(30)] + [
        (9, "p9", 999.0),
        (9, "p9", 998.0),
    ]
    base = spark.createDataFrame(rows, "id long, part string, val double")
    base.repartition("part").write.partitionBy("part").parquet(lake)
    before = _files(lake)
    assert "part=p9" in before

    keys = spark.createDataFrame([(9,), (3,)], "id long")
    merge_delete(spark, lake, keys, ["id"], "part")

    after = _files(lake)
    assert "part=p9" not in after  # emptied directory actually gone
    # partition p1 (ids 1,4,..,28) held neither key: byte-identical
    assert after["part=p1"] == before["part=p1"]
    got = {(r.id, r.part, r.val) for r in spark.read.parquet(lake).collect()}
    want = {
        (i, f"p{i % 3}", float(i)) for i in range(30) if i not in (3, 9)
    }
    assert got == want


def test_merge_delete_noop_on_absent_keys(spark, tmp_path):
    from udacity_data_engineering_spark.sources.lake import merge_delete

    lake = str(tmp_path / "lake4")
    base = spark.createDataFrame(
        [(i, f"p{i % 2}", float(i)) for i in range(10)],
        "id long, part string, val double",
    )
    base.repartition("part").write.partitionBy("part").parquet(lake)
    before = _files(lake)
    merge_delete(
        spark,
        lake,
        spark.createDataFrame([(777,)], "id long"),
        ["id"],
        "part",
    )
    assert _files(lake) == before  # nothing touched at the file level


def _diff_map(df):
    return {tuple(r[:-1]): r.change_type for r in df.collect()}


def test_snapshot_diff_classifies_and_is_nullsafe(spark):
    from udacity_data_engineering_spark.sources.lake import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, None, 3.0), (4, "d", 4.0)],
        "id long, s string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 1.0),     # unchanged -> not emitted
            (2, "b", 2.0),     # NULL -> value: changed
            (3, None, 3.0),    # NULL == NULL per column: unchanged
            (5, "e", 5.0),     # added
        ],
        "id long, s string, v double",
    )
    d = _diff_map(snapshot_diff(old, new, ["id"]))
    assert d == {(2,): "changed", (4,): "removed", (5,): "added"}
    # direction symmetry: swapping the snapshots maps added <-> removed
    # and keeps changed — the invariant an audit log relies on
    rev = _diff_map(snapshot_diff(new, old, ["id"]))
    assert rev == {(2,): "changed", (4,): "added", (5,): "removed"}


def test_lake_diff_prune_skips_identical_partitions(spark, tmp_path):
    """Only partition p1 differs between the snapshots: the digest pass
    must shrink the row-level join to p1 via a literal isin that
    statically prunes BOTH scans, and the pruned result must equal the
    exact prune=False diff."""
    from udacity_data_engineering_spark.sources.lake import lake_diff

    old_dir, new_dir = str(tmp_path / "old"), str(tmp_path / "new")
    base = spark.createDataFrame(
        [(i, f"p{i % 4}", float(i)) for i in range(40)],
        "id long, part string, val double",
    )
    base.repartition("part").write.partitionBy("part").parquet(old_dir)
    new = base.withColumn(
        "val",
        F.when(
            (F.col("part") == "p1") & (F.col("id") == 1), F.lit(-1.0)
        ).otherwise(F.col("val")),
    ).filter(~((F.col("part") == "p1") & (F.col("id") == 5)))
    new.repartition("part").write.partitionBy("part").parquet(new_dir)

    pruned = lake_diff(spark, old_dir, new_dir, ["id"], "part")
    exact = lake_diff(spark, old_dir, new_dir, ["id"], "part", prune=False)
    assert _diff_map(pruned) == _diff_map(exact) == {
        (1,): "changed",
        (5,): "removed",
    }
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert len(pf) >= 2  # both snapshot scans carry the filter
    for line in pf:
        tail = line.split("PartitionFilters")[1]
        assert "p1" in tail and "p2" not in tail


def test_lake_diff_partition_only_on_one_side(spark, tmp_path):
    """A partition present only in the new snapshot (or only in the old)
    must surface as added/removed rows, not be skipped by the digest
    full-outer comparison."""
    from udacity_data_engineering_spark.sources.lake import lake_diff

    old_dir, new_dir = str(tmp_path / "o2"), str(tmp_path / "n2")
    old = spark.createDataFrame(
        [(1, "pa", 1.0), (2, "pb", 2.0)], "id long, part string, val double"
    )
    new = spark.createDataFrame(
        [(1, "pa", 1.0), (3, "pc", 3.0)], "id long, part string, val double"
    )
    old.write.partitionBy("part").parquet(old_dir)
    new.write.partitionBy("part").parquet(new_dir)
    d = _diff_map(lake_diff(spark, old_dir, new_dir, ["id"], "part"))
    assert d == {(2,): "removed", (3,): "added"}


def test_lake_diff_identical_snapshots_empty(spark, tmp_path):
    from udacity_data_engineering_spark.sources.lake import lake_diff

    old_dir, new_dir = str(tmp_path / "o3"), str(tmp_path / "n3")
    base = spark.createDataFrame(
        [(1, "pa", 1.0), (2, "pb", 2.0)], "id long, part string, val double"
    )
    base.write.partitionBy("part").parquet(old_dir)
    base.write.partitionBy("part").parquet(new_dir)
    out = lake_diff(spark, old_dir, new_dir, ["id"], "part")
    assert out.count() == 0
    assert out.columns == ["id", "change_type"]


def test_lake_diff_file_prune_on_snapshot_copy(spark, tmp_path):
    """The production snapshot flow: metadata-preserving copy of the
    lake, then MERGE on the copy. Untouched partition directories keep
    identical (path, size, mtime) file sets, so prune='files' must skip
    them from one listing — and all three prune levels must agree."""
    import shutil

    from udacity_data_engineering_spark.sources.lake import (
        lake_diff,
        merge_upsert,
    )

    old_dir, new_dir = str(tmp_path / "snap_old"), str(tmp_path / "snap_new")
    base = spark.createDataFrame(
        [(i, f"p{i % 4}", float(i)) for i in range(40)],
        "id long, part string, val double",
    )
    base.repartition("part").write.partitionBy("part").parquet(old_dir)
    shutil.copytree(old_dir, new_dir, copy_function=shutil.copy2)
    updates = spark.createDataFrame(
        [(1, "p1", -1.0), (101, "p1", 101.0)],
        "id long, part string, val double",
    )
    merge_upsert(spark, new_dir, updates, ["id"], "part")

    expected = {(1,): "changed", (101,): "added"}
    for prune in ("files", "digest", "none"):
        d = _diff_map(
            lake_diff(spark, old_dir, new_dir, ["id"], "part", prune=prune)
        )
        assert d == expected, prune


def test_lake_diff_file_prune_identical_copies_empty(spark, tmp_path):
    import shutil

    from udacity_data_engineering_spark.sources.lake import lake_diff

    old_dir, new_dir = str(tmp_path / "c_old"), str(tmp_path / "c_new")
    base = spark.createDataFrame(
        [(1, "pa", 1.0), (2, "pb", 2.0)], "id long, part string, val double"
    )
    base.write.partitionBy("part").parquet(old_dir)
    shutil.copytree(old_dir, new_dir, copy_function=shutil.copy2)
    out = lake_diff(spark, old_dir, new_dir, ["id"], "part", prune="files")
    assert out.count() == 0


def test_lake_diff_file_prune_rewritten_equal_partition_digest_skipped(
    spark, tmp_path
):
    """A partition rewritten with the SAME rows (fresh mtimes) fails the
    file-level triple but must be caught by the digest refinement —
    never reach the row join as spurious changes."""
    import shutil

    from udacity_data_engineering_spark.sources.lake import lake_diff

    old_dir, new_dir = str(tmp_path / "r_old"), str(tmp_path / "r_new")
    base = spark.createDataFrame(
        [(1, "pa", 1.0), (2, "pb", 2.0)], "id long, part string, val double"
    )
    base.write.partitionBy("part").parquet(old_dir)
    shutil.copytree(old_dir, new_dir, copy_function=shutil.copy2)
    # rewrite pa with identical rows via dynamic overwrite
    (
        spark.createDataFrame([(1, "pa", 1.0)], "id long, part string, val double")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("part")
        .parquet(new_dir)
    )
    out = lake_diff(spark, old_dir, new_dir, ["id"], "part", prune="files")
    assert out.count() == 0


def test_lake_diff_file_prune_numeric_partition_values(spark, tmp_path):
    """Directory names are strings; a LONG partition column must still
    filter correctly after the listing-derived values are cast back."""
    import shutil

    from udacity_data_engineering_spark.sources.lake import (
        lake_diff,
        merge_upsert,
    )

    old_dir, new_dir = str(tmp_path / "n_old"), str(tmp_path / "n_new")
    base = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)],
        "id long, bucket long, val double",
    )
    base.repartition("bucket").write.partitionBy("bucket").parquet(old_dir)
    shutil.copytree(old_dir, new_dir, copy_function=shutil.copy2)
    updates = spark.createDataFrame(
        [(3, 0, -3.0)], "id long, bucket long, val double"
    )
    merge_upsert(spark, new_dir, updates, ["id"], "bucket")
    d = _diff_map(
        lake_diff(spark, old_dir, new_dir, ["id"], "bucket", prune="files")
    )
    assert d == {(3,): "changed"}


def test_retention_expire_drops_dirs_listing_only(spark, tmp_path):
    import os

    from udacity_data_engineering_spark.sources.lake import retention_expire

    lake = str(tmp_path / "ttl")
    base = spark.createDataFrame(
        [(i, f"2024-01-{(i % 4) + 1:02d}", float(i)) for i in range(40)],
        "id long, d string, val double",
    )
    base.repartition("d").write.partitionBy("d").parquet(lake)
    dropped = retention_expire(spark, lake, "d", lambda v: v < "2024-01-03")
    assert dropped == ["2024-01-01", "2024-01-02"]
    left = sorted(
        e for e in os.listdir(lake) if e.startswith("d=")
    )
    assert left == ["d=2024-01-03", "d=2024-01-04"]
    back = spark.read.parquet(lake)
    assert back.count() == 20
    # partition-value inference types the read-back column as DATE
    assert {str(r.d) for r in back.select("d").distinct().collect()} == {
        "2024-01-03",
        "2024-01-04",
    }
    # noop pass: nothing left to expire, nothing touched
    assert retention_expire(spark, lake, "d", lambda v: v < "2024-01-03") == []
    assert back.count() == 20


def test_lake_ops_handle_null_partition_values(spark, tmp_path):
    """A NULL partition value is routine when upstream extractors emit
    nulls: merge_delete must locate and rewrite the hive default
    partition (isin alone never matches NULL), remove it when emptied,
    and lake_diff must surface changes inside it at every prune level."""
    import shutil

    from udacity_data_engineering_spark.sources.lake import (
        lake_diff,
        merge_delete,
        merge_upsert,
    )

    old_dir, new_dir = str(tmp_path / "np_old"), str(tmp_path / "np_new")
    base = spark.createDataFrame(
        [(1, "pa", 1.0), (2, None, 2.0), (3, None, 3.0), (4, "pb", 4.0)],
        "id long, part string, val double",
    )
    base.repartition(2).write.partitionBy("part").parquet(old_dir)
    shutil.copytree(old_dir, new_dir, copy_function=shutil.copy2)
    # change one row INSIDE the null partition
    merge_upsert(
        spark,
        new_dir,
        spark.createDataFrame(
            [(2, None, -2.0)], "id long, part string, val double"
        ),
        ["id"],
        "part",
    )
    for prune in ("files", "digest", "none"):
        d = _diff_map(
            lake_diff(spark, old_dir, new_dir, ["id"], "part", prune=prune)
        )
        assert d == {(2,): "changed"}, prune

    # delete every null-partition row: the directory must be emptied away
    keys = spark.createDataFrame([(2,), (3,)], "id long")
    merge_delete(spark, new_dir, keys, ["id"], "part")
    back = spark.read.parquet(new_dir)
    assert sorted(r.id for r in back.collect()) == [1, 4]
    import os

    assert not os.path.isdir(
        os.path.join(new_dir, "part=__HIVE_DEFAULT_PARTITION__")
    )


def test_partition_file_index_branches_agree(spark, tmp_path):
    """The local os.scandir fast path and the generic Hadoop-FS path
    must build the IDENTICAL index (same relpaths, sizes, exact-ms
    mtimes) — the Hadoop branch is otherwise untested locally, and a
    ±1ms float-rounding drift between branches would make equal
    snapshots look changed."""
    from udacity_data_engineering_spark.sources.lake import (
        _partition_file_index,
    )

    lake = str(tmp_path / "ix")
    spark.createDataFrame(
        [(1, "pa", 1.0), (2, "pb", 2.0)], "id long, part string, val double"
    ).write.partitionBy("part").parquet(lake)
    fast = _partition_file_index(spark, lake, "part")
    # 'file:/...' (no '://') skips the local fast path -> Hadoop branch
    hadoop = _partition_file_index(spark, "file:" + lake, "part")
    assert fast == hadoop and set(fast) == {"pa", "pb"}


def test_lake_ops_handle_escaped_partition_values(spark, tmp_path):
    """Writers hive-escape special characters in partition directory
    names (':' -> %3A, '%' -> %25 — measured): the files-prune isin,
    merge_delete's emptied-dir removal, and retention's predicate must
    all operate on the UNESCAPED value, never the %XX directory name."""
    import os
    import shutil

    from udacity_data_engineering_spark.sources.lake import (
        lake_diff,
        merge_delete,
        merge_upsert,
        retention_expire,
    )

    old_dir, new_dir = str(tmp_path / "e_old"), str(tmp_path / "e_new")
    base = spark.createDataFrame(
        [(1, "a:b", 1.0), (2, "a:b", 2.0), (3, "c%d", 3.0), (4, "plain", 4.0)],
        "id long, part string, val double",
    )
    base.repartition(2).write.partitionBy("part").parquet(old_dir)
    assert "part=a%3Ab" in os.listdir(old_dir)  # escaping is real
    shutil.copytree(old_dir, new_dir, copy_function=shutil.copy2)
    merge_upsert(
        spark,
        new_dir,
        spark.createDataFrame(
            [(1, "a:b", -1.0)], "id long, part string, val double"
        ),
        ["id"],
        "part",
    )
    for prune in ("files", "digest", "none"):
        d = _diff_map(
            lake_diff(spark, old_dir, new_dir, ["id"], "part", prune=prune)
        )
        assert d == {(1,): "changed"}, prune

    # delete every row of the ':' partition: its escaped dir must go
    merge_delete(
        spark,
        new_dir,
        spark.createDataFrame([(1,), (2,)], "id long"),
        ["id"],
        "part",
    )
    assert "part=a%3Ab" not in os.listdir(new_dir)
    assert sorted(r.id for r in spark.read.parquet(new_dir).collect()) == [3, 4]

    # retention predicate must see 'c%d', not 'c%25d'
    seen = []
    retention_expire(
        spark, new_dir, "part", lambda v: seen.append(v) or v == "c%d"
    )
    assert "c%d" in seen and "c%25d" not in seen
    assert "part=c%25d" not in os.listdir(new_dir)


def test_lake_lifecycle_directory_state_between_steps(spark, sf_dir, tmp_path, monkeypatch):
    """The composed lifecycle's cross-operator contract: after expiry only
    cutoff-or-later day directories remain, and the diff carries all three
    change types (upsert, delete and TTL each left a visible mark)."""
    import os

    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(tmp_path))
    from udacity_data_engineering_spark.sources.lake import q_lake_lifecycle

    diff = q_lake_lifecycle(spark, sf_dir)
    kinds = {r["change_type"] for r in diff.select("change_type").distinct().collect()}
    assert kinds == {"added", "removed", "changed"}

    lake_dir = str(tmp_path / "lifecycle_lake")
    days = sorted(
        d.split("=", 1)[1]
        for d in os.listdir(lake_dir)
        if d.startswith("event_date=")
    )
    assert days and days[0] >= "2024-01-06", days
    # the lifecycle never resurrects an expired day
    assert all(d >= "2024-01-06" for d in days)
