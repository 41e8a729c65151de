"""Balanced shard writer (operators/sharding.py): assignment semantics,
balance guarantee, hive-layout round trip, distributed plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.sharding import (
    shard_by_token_budget,
    write_sharded,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_round_robin_over_desc_token_order(spark):
    # token counts: d1=4, d2=3, d3=2, d4=1 -> ranks 1..4 -> shards 0,1,0,1
    docs = _docs(
        spark,
        [(1, "a b c d"), (2, "a b c"), (3, "a b"), (4, "a")],
    )
    got = {r.doc_id: (r.n_tokens, r.shard) for r in shard_by_token_budget(docs, 2).collect()}
    assert got == {1: (4, 0), 2: (3, 1), 3: (2, 0), 4: (1, 1)}


def test_tiebreak_is_doc_id(spark):
    # equal token counts -> ascending doc_id order decides the round-robin
    docs = _docs(spark, [(10, "a b"), (11, "c d"), (12, "e f")])
    got = {r.doc_id: r.shard for r in shard_by_token_budget(docs, 3).collect()}
    assert got == {10: 0, 11: 1, 12: 2}


def test_doc_counts_within_one(spark):
    docs = _docs(spark, [(i, "w " * (i % 17 + 1)) for i in range(103)])
    counts = [
        r.n
        for r in shard_by_token_budget(docs, 8)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(counts) == 8
    assert max(counts) - min(counts) <= 1


def test_token_totals_balanced(spark, sf_dir):
    from udacity_data_engineering_spark.session import table

    docs = table(spark, sf_dir, "documents")
    manifest = (
        shard_by_token_budget(docs, 8)
        .groupBy("shard")
        .agg(F.sum("n_tokens").alias("tot"))
        .collect()
    )
    tots = [r.tot for r in manifest]
    assert len(tots) == 8
    # round-robin over the size-sorted order keeps totals tight: on the
    # synthetic corpus the spread is far under 5% of the mean
    assert (max(tots) - min(tots)) / (sum(tots) / len(tots)) < 0.05


def test_write_sharded_round_trip(spark, tmp_path):
    docs = _docs(spark, [(i, f"w{i} x y z") for i in range(40)])
    sharded = shard_by_token_budget(docs, 4)
    out = str(tmp_path / "shards")
    write_sharded(sharded, out)
    back = spark.read.parquet(out)
    assert back.count() == 40
    # hive layout: shard is a partition column readable back as int
    assert dict(back.dtypes)["shard"] == "int"
    assert back.select("shard").distinct().count() == 4
    # partition pruning: reading one shard touches only its directory
    one = spark.read.parquet(out).filter(F.col("shard") == 2)
    assert one.count() == 10


def test_no_single_partition_exchange(spark):
    docs = _docs(spark, [(i, "a b c") for i in range(100)])
    plan = (
        shard_by_token_budget(docs, 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan


def test_rejects_bad_n_shards(spark):
    docs = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        shard_by_token_budget(docs, 0)


def test_export_pipeline_composition(spark, sf_dir):
    # the composed plan must agree with composing the operators by hand
    from udacity_data_engineering_spark.operators.contamination import (
        decontaminate_bloom,
    )
    from udacity_data_engineering_spark.operators.dedup import dedup_exact
    from udacity_data_engineering_spark.operators.quality import gopher_signals
    from udacity_data_engineering_spark.operators.sharding import q_export_pipeline
    from udacity_data_engineering_spark.session import table

    got = {r.shard: (r.n_docs, r.tot_tokens) for r in q_export_pipeline(spark, sf_dir).collect()}
    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 100 == 7)
    corpus = docs.filter(F.col("doc_id") % 100 != 7)
    kept = gopher_signals(corpus, carry=("text",)).filter(F.col("keep")).select("doc_id", "text")
    survivors = dedup_exact(kept, "text", ["doc_id"])
    contaminated = decontaminate_bloom(survivors, bench, n=4).select("doc_id")
    clean = survivors.join(contaminated, "doc_id", "left_anti")
    expect = {
        r.shard: (r.n_docs, r.tot)
        for r in shard_by_token_budget(clean, 8)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").cast("long").alias("tot"))
        .collect()
    }
    assert got == expect
    assert set(got) <= set(range(8))
    # contaminated docs really are gone: no clean doc shares a 4-gram with bench
    n_contam = contaminated.count()
    assert clean.join(contaminated, "doc_id", "inner").count() == 0
    assert n_contam > 0  # the synthetic corpus does contain overlaps


def test_null_text_excluded(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "d e")], "doc_id long, text string"
    )
    got = {r.doc_id for r in shard_by_token_budget(docs, 2).collect()}
    assert got == {1, 3}
