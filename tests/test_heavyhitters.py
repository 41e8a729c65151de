"""Exact heavy hitters (operators/heavyhitters.py).

The claim is exactness-with-bounded-shuffle: the two-pass result must
equal the naive full group-by on ANY input and partitioning — the
pigeonhole candidate pass may only ever over-select, never miss.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.heavyhitters import (
    heavy_hitters,
    token_stream,
)


def _naive(docs, k):
    toks = token_stream(docs)
    n = toks.count()
    return {
        (r.w, r.cnt)
        for r in toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * k > F.lit(n))
        .collect()
    }


def test_equals_naive_groupby_on_skewed_corpus(spark):
    # one dominant token, a mid token straddling the threshold, and a
    # long tail — spread over many partitions so the pigeonhole pass
    # must recover a hitter that no single partition sees as dominant
    rows = (
        [(i, "the " * 50 + f"tail{i}") for i in range(40)]
        + [(100 + i, "mid " * 12 + f"rare{i} " * 3) for i in range(40)]
        + [(200 + i, " ".join(f"u{i}_{j}" for j in range(60))) for i in range(20)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(16)
    for k in (5, 50, 500):
        got = {(r.w, r.cnt) for r in heavy_hitters(docs, k=k).collect()}
        assert got == _naive(docs, k), f"k={k}"


def test_equals_naive_on_real_corpus_sample(spark, sf_dir):
    from udacity_data_engineering_spark.session import table

    docs = table(spark, sf_dir, "documents")
    got = {(r.w, r.cnt) for r in heavy_hitters(docs, k=100).collect()}
    assert got == _naive(docs, 100)
    assert got  # non-degenerate: the corpus does have >1% tokens


def test_candidate_pass_never_misses_under_adversarial_partitioning(spark):
    # a token that is exactly at 1/k in every partition ALONE but above
    # 1/k globally must still be found: craft partitions where 'hot' is
    # locally strictly above the local threshold in only SOME batches
    docs = spark.createDataFrame(
        [(i, ("hot " * 3 + f"f{i}a f{i}b f{i}c " * 3)) for i in range(30)],
        "doc_id long, text string",
    ).repartition(8)
    k = 10
    got = {r.w for r in heavy_hitters(docs, k=k).collect()}
    naive = {w for (w, _) in _naive(docs, k)}
    assert got == naive and "hot" in got


def test_empty_and_null_texts(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a a a b")], "doc_id long, text string"
    )
    got = {(r.w, r.cnt) for r in heavy_hitters(docs, k=3).collect()}
    assert got == {("a", 3)}  # 3*3 > 4; b: 1*3 < 4
