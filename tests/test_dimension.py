"""Surrogate-key service: stability, replay idempotence, determinism,
and the distributed rank it rides on."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.dimension import (
    assign_surrogate_keys,
    global_rank_orderable,
)


def test_global_rank_orderable_matches_sorted_enumerate(spark):
    vals = [f"v{i:04d}" for i in range(0, 500, 7)]
    import random

    shuffled = vals[:]
    random.Random(3).shuffle(shuffled)
    df = spark.createDataFrame([(v,) for v in shuffled], "x string")
    got = {r["x"]: r["rn"] for r in global_rank_orderable(df, "x").collect()}
    want = {v: i + 1 for i, v in enumerate(sorted(vals))}
    assert got == want
    # empty input: no crash, no rows
    empty = spark.createDataFrame([], "x string")
    assert global_rank_orderable(empty, "x").count() == 0


def test_surrogate_keys_stable_idempotent_deterministic(spark, tmp_path):
    d = str(tmp_path / "dict")
    b0 = spark.createDataFrame(
        [("cherry",), ("apple",), ("banana",), (None,)], "v string"
    )
    m0 = {r["v"]: r["sk"] for r in assign_surrogate_keys(spark, d, b0, "v").collect()}
    assert m0 == {"apple": 1, "banana": 2, "cherry": 3}  # lexicographic

    # replay: nothing changes (at-least-once orchestration)
    m0b = {r["v"]: r["sk"] for r in assign_surrogate_keys(spark, d, b0, "v").collect()}
    assert m0b == m0

    # batch 1: overlap keeps old keys, new values extend past max
    b1 = spark.createDataFrame(
        [("banana",), ("apricot",), ("date",)], "v string"
    )
    m1 = {r["v"]: r["sk"] for r in assign_surrogate_keys(spark, d, b1, "v").collect()}
    assert m1["banana"] == 2  # stable forever
    assert m1["apricot"] == 4 and m1["date"] == 5  # lexicographic among NEW
    assert len(m1) == 5

    # determinism: a fresh dictionary fed the same batches reproduces
    # the identical mapping
    d2 = str(tmp_path / "dict2")
    assign_surrogate_keys(spark, d2, b0, "v")
    m2 = {r["v"]: r["sk"] for r in assign_surrogate_keys(spark, d2, b1, "v").collect()}
    assert m2 == m1


def test_surrogate_keys_empty_batch_is_noop(spark, tmp_path):
    d = str(tmp_path / "dict")
    b0 = spark.createDataFrame([("x",)], "v string")
    assign_surrogate_keys(spark, d, b0, "v")
    empty = spark.createDataFrame([], "v string")
    m = {r["v"]: r["sk"] for r in assign_surrogate_keys(spark, d, empty, "v").collect()}
    assert m == {"x": 1}
