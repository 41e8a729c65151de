from __future__ import annotations

from udacity_data_engineering_spark.etl.upsert import merge_into


def test_merge_updates_and_inserts(spark, tmp_path):
    target = str(tmp_path / "users")
    spark.createDataFrame(
        [(1, "ann", "free"), (2, "bo", "free"), (3, "cy", "paid")],
        "user_id long, name string, level string",
    ).write.parquet(target)

    updates = spark.createDataFrame(
        [(2, "bo", "paid"), (4, "di", "free")],
        "user_id long, name string, level string",
    )
    n = merge_into(spark, target, updates, ["user_id"])
    assert n == 4
    rows = {r.user_id: (r.name, r.level) for r in spark.read.parquet(target).collect()}
    assert rows == {
        1: ("ann", "free"),
        2: ("bo", "paid"),  # updated
        3: ("cy", "paid"),
        4: ("di", "free"),  # inserted
    }


def test_merge_duplicate_keys_require_order_col(spark, tmp_path):
    import pytest

    target = str(tmp_path / "d")
    spark.createDataFrame([(1, "x", 0)], "k long, v string, seq long").write.parquet(
        target
    )
    dup = spark.createDataFrame(
        [(1, "first", 1), (1, "second", 2)], "k long, v string, seq long"
    )
    with pytest.raises(ValueError):
        merge_into(spark, target, dup, ["k"])
    # with an order column the greatest value wins
    assert merge_into(spark, target, dup, ["k"], order_col="seq") == 1
    assert spark.read.parquet(target).collect()[0].v == "second"


def test_merge_is_idempotent(spark, tmp_path):
    target = str(tmp_path / "t")
    spark.createDataFrame([(1, "x")], "k long, v string").write.parquet(target)
    up = spark.createDataFrame([(1, "y")], "k long, v string")
    assert merge_into(spark, target, up, ["k"]) == 1
    assert merge_into(spark, target, up, ["k"]) == 1
    assert spark.read.parquet(target).collect()[0].v == "y"


def test_failed_swap_restores_target(spark, tmp_path, monkeypatch):
    """A crash between the two swap renames must not leave the target
    path empty (ADVICE r1): the old directory is restored."""
    import os as _os

    import pytest

    from udacity_data_engineering_spark.etl.upsert import merge_into

    target = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], "k long, v string").write.parquet(target)
    real_rename = _os.rename
    calls = {"n": 0}

    def flaky_rename(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:  # the staged->target promotion
            raise OSError("simulated crash mid-swap")
        real_rename(src, dst)

    monkeypatch.setattr("udacity_data_engineering_spark.etl.upsert.os.rename", flaky_rename)
    up = spark.createDataFrame([(1, "b")], "k long, v string")
    with pytest.raises(OSError, match="mid-swap"):
        merge_into(spark, target, up, ["k"])
    monkeypatch.undo()
    # target restored with the PRE-merge contents; no stage/old leftovers
    assert [tuple(r) for r in spark.read.parquet(target).collect()] == [(1, "a")]
    leftovers = [p for p in _os.listdir(tmp_path) if p != "t"]
    assert leftovers == [], leftovers
