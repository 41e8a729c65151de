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
