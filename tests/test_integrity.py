"""Table content fingerprints (operators/integrity.py).

Contracts: (1) fingerprints are order-insensitive — a shuffled copy of
the table matches; (2) partition fingerprints MERGE to the whole-table
fingerprint (xor of xors, sum of sums, count of counts) without a
rescan; (3) the canonicalization closes the aliasing classes — NULL vs
the string "NULL", value shifted across the column boundary; (4) the
(count, xor, sum) triple catches what xor alone cannot: a row inserted
twice; (5) any single-value change moves the fingerprint.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.integrity import (
    table_fingerprint,
)


def _fp(df, cols):
    r = table_fingerprint(df, cols).collect()[0]
    return (r["n_rows"], r["fp_xor"], r["fp_sum"])


def test_order_insensitive(spark):
    rows = [(i, f"v{i % 7}") for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v string")
    shuffled = spark.createDataFrame(rows[::-1], "k long, v string").repartition(7)
    assert _fp(df, ["k", "v"]) == _fp(shuffled, ["k", "v"])


def test_partition_fingerprints_merge(spark):
    rows = [(i, f"v{i}") for i in range(300)]
    df = spark.createDataFrame(rows, "k long, v string")
    whole = _fp(df, ["k", "v"])
    parts = [
        _fp(df.filter(F.col("k") % 3 == i), ["k", "v"]) for i in range(3)
    ]
    merged = (
        sum(p[0] for p in parts),
        reduce(lambda a, b: a ^ b, (p[1] for p in parts)),
        sum(p[2] for p in parts),
    )
    assert merged == whole


def test_null_distinct_from_null_string_and_empty(spark):
    a = spark.createDataFrame([(1, None)], "k long, v string")
    b = spark.createDataFrame([(1, "NULL")], "k long, v string")
    c = spark.createDataFrame([(1, "")], "k long, v string")
    fps = {_fp(x, ["k", "v"]) for x in (a, b, c)}
    assert len(fps) == 3


def test_column_shift_does_not_alias(spark):
    a = spark.createDataFrame([("ab", "c")], "x string, y string")
    b = spark.createDataFrame([("a", "bc")], "x string, y string")
    assert _fp(a, ["x", "y"]) != _fp(b, ["x", "y"])


def test_duplicated_row_pair_caught_by_sum(spark):
    # xor is blind to inserting the same row twice; sum and count are not
    base = [(i,) for i in range(10)]
    a = spark.createDataFrame(base, "k long")
    b = spark.createDataFrame(base + [(3,), (3,)], "k long")
    na, xa, sa = _fp(a, ["k"])
    nb, xb, sb = _fp(b, ["k"])
    assert xa == xb  # the blind spot, by construction
    assert (na, sa) != (nb, sb)  # closed by the other accumulators


def test_single_value_change_moves_fingerprint(spark):
    a = spark.createDataFrame([(i, i * 2) for i in range(100)], "k long, v long")
    b = spark.createDataFrame(
        [(i, i * 2 if i != 57 else 999) for i in range(100)], "k long, v long"
    )
    assert _fp(a, ["k", "v"]) != _fp(b, ["k", "v"])


def test_grouped_fingerprint_rows(spark, sf_dir):
    from udacity_data_engineering_spark.operators.integrity import (
        q_table_fingerprint,
    )

    rows = q_table_fingerprint(spark, sf_dir).collect()
    assert len(rows) == 3  # one per order status
    assert sum(r["n_rows"] for r in rows) > 0


def test_keyed_diff_labels_and_silence(spark):
    from udacity_data_engineering_spark.operators.integrity import (
        keyed_table_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0)], "k long, v string, x double"
    )
    new = spark.createDataFrame(
        [(2, "b", None), (3, "C", 3.0), (4, "d", 4.0)], "k long, v string, x double"
    )
    got = {r.k: r.diff for r in keyed_table_diff(old, new, ["k"], ["v", "x"]).collect()}
    # 1 removed, 2 identical incl. NULL==NULL (silent), 3 changed, 4 added
    assert got == {1: "removed", 3: "changed", 4: "added"}
