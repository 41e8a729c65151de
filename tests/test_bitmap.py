"""Bitmap exact-distinct sketch: merge algebra (idempotent OR), exactness
vs countDistinct, and the int64 edge cases (bit 63, negative ids)."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.bitmap import (
    bitmap_distinct_counts,
    bitmap_distinct_sketch,
    merge_bitmap_sketches,
)


def _counts(sketch, groups=()):
    return {
        tuple(r[g] for g in groups) if groups else (): r["n_distinct"]
        for r in bitmap_distinct_counts(sketch, groups).collect()
    }


def test_sketch_counts_equal_count_distinct(spark, sf_dir):
    from udacity_data_engineering_spark.session import table

    orders = table(spark, sf_dir, "orders")
    sk = bitmap_distinct_sketch(orders, "o_custkey", ("o_orderstatus",))
    got = _counts(sk, ("o_orderstatus",))
    want = {
        (r["o_orderstatus"],): r["n"]
        for r in orders.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert got == want


def test_merge_is_idempotent_and_split_invariant(spark):
    df = spark.createDataFrame([(i % 97,) for i in range(500)], "id long")
    whole = bitmap_distinct_sketch(df, "id")
    halves = [
        bitmap_distinct_sketch(df.filter(F.col("id") % 2 == i), "id")
        for i in (0, 1)
    ]
    # split-invariance: merged halves == whole-table sketch
    merged = merge_bitmap_sketches(*halves)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    # idempotence: merging the SAME sketch again changes nothing
    remerged = merge_bitmap_sketches(merged, halves[0], halves[0])
    assert _counts(remerged) == _counts(whole) == {(): 97}


def test_bit63_and_negative_ids_roundtrip(spark):
    # ids hitting bit 63 of a word, negative ids, and word boundaries
    ids = [63, 64, 127, 128, -1, -64, -65, 0, 9_223_372_036_854_775_807 - 63]
    df = spark.createDataFrame([(i,) for i in ids for _ in range(2)], "id long")
    sk = bitmap_distinct_sketch(df, "id")
    assert _counts(sk) == {(): len(set(ids))}
    # every cell is a single shuffle row per 64-id word: no duplicates
    words = [r["word_idx"] for r in sk.collect()]
    assert len(words) == len(set(words))


def test_empty_and_all_null_inputs(spark):
    empty = spark.createDataFrame([], "id long")
    assert bitmap_distinct_sketch(empty, "id").count() == 0
    nulls = spark.createDataFrame([(None,), (5,)], "id long")
    assert _counts(bitmap_distinct_sketch(nulls, "id")) == {(): 1}


def test_sparse_domain_counts_and_replay(spark, tmp_path):
    """Dictionary-encoded sparse bitmap: popcounts equal exact distinct
    over the STRING domain, replaying a slice changes nothing, and cells
    built against the same dictionary in different calls stay mergeable."""
    from udacity_data_engineering_spark.operators.bitmap import (
        bitmap_distinct_sparse,
    )
    from udacity_data_engineering_spark.operators.dimension import (
        assign_surrogate_keys,
    )

    rows = [(f"user-{i % 37:04d}", "g%d" % (i % 3)) for i in range(400)]
    df = spark.createDataFrame(rows, "name string, grp string")
    dictionary = assign_surrogate_keys(
        spark, str(tmp_path / "dict"), df, "name"
    )
    whole = bitmap_distinct_sparse(df, dictionary, "name", ("grp",))
    want = {
        (r["grp"],): r["n"]
        for r in df.groupBy("grp")
        .agg(F.countDistinct("name").alias("n"))
        .collect()
    }
    assert _counts(whole, ("grp",)) == want
    # slice 0 replayed: OR-merge is idempotent through the encoding too
    halves = [
        bitmap_distinct_sparse(
            df.filter(F.crc32("name") % 2 == i), dictionary, "name", ("grp",)
        )
        for i in (0, 1, 0)
    ]
    merged = merge_bitmap_sketches(*halves)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
