"""Chunking + sequence-packing invariants (operators/packing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.packing import (
    chunk_documents,
    pack_by_offset,
    pack_greedy,
)
from udacity_data_engineering_spark.session import table

BUDGET = 256


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return table(spark, sf_dir, "documents")


def test_chunks_cover_every_token_once_per_stride(spark, docs):
    """Chunk starts tile the doc at stride 24; total chunk tokens =
    n + overlap-covered repeats, and reassembling stride-prefixes
    reproduces the document exactly."""
    out = chunk_documents(docs, chunk_size=32, overlap=8)
    rebuilt = (
        out.withColumn(
            "prefix",
            F.when(
                F.col("n_tokens") <= 24, F.col("chunk_text")
            ).otherwise(F.array_join(F.slice(F.split("chunk_text", " "), 1, 24), " ")),
        )
        .groupBy("doc_id")
        .agg(F.array_join(F.array_sort(F.collect_list(F.struct("chunk_id", "prefix"))).getField("prefix"), " ").alias("rebuilt"))
    )
    joined = rebuilt.join(docs.select("doc_id", "text"), "doc_id")
    assert joined.filter(F.col("rebuilt") != F.col("text")).count() == 0


def test_chunk_sizes(docs):
    out = chunk_documents(docs, chunk_size=32, overlap=8)
    # every chunk is at most 32 tokens; a short chunk can only be one of
    # the last two per doc (the doc end falls inside a 32-token window
    # that spans up to two stride starts)
    assert out.filter(F.col("n_tokens") > 32).count() == 0
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id")
    short_interior = out.withColumn("max_chunk", F.max("chunk_id").over(w)).filter(
        (F.col("n_tokens") < 32) & (F.col("chunk_id") < F.col("max_chunk") - 1)
    )
    assert short_interior.count() == 0


def test_offset_packing_is_contiguous(docs):
    out = pack_by_offset(docs, budget=BUDGET)
    # offsets are a prefix-sum: start_offset + n_tokens == next start_offset
    from pyspark.sql.window import Window

    w = Window.partitionBy("pack_group").orderBy("doc_id")
    bad = out.withColumn("nxt", F.lead("start_offset").over(w)).filter(
        F.col("nxt").isNotNull()
        & (F.col("start_offset") + F.col("n_tokens") != F.col("nxt"))
    )
    assert bad.count() == 0
    # bin_id is exactly start_offset // budget
    assert out.filter(F.col("bin_id") != (F.col("start_offset") / BUDGET).cast("long")).count() == 0


def test_greedy_packing_invariants(docs):
    out = pack_greedy(docs, budget=BUDGET).cache()
    n_docs = docs.count()
    # exhaustive and exactly-once
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs
    # no bin exceeds the budget unless it holds a single oversized doc
    per_bin = out.groupBy("pack_group", "bin_id").agg(
        F.sum("n_tokens").alias("tot"), F.count("*").alias("n")
    )
    assert per_bin.filter((F.col("tot") > BUDGET) & (F.col("n") > 1)).count() == 0
    # bin ids are dense per group (0..max with no gaps)
    dense = per_bin.groupBy("pack_group").agg(
        F.count("*").alias("n_bins"), F.max("bin_id").alias("max_bin")
    )
    assert dense.filter(F.col("n_bins") != F.col("max_bin") + 1).count() == 0
    out.unpersist()


def test_greedy_packing_deterministic_under_repartition(docs):
    a = pack_greedy(docs, budget=BUDGET).collect()
    b = pack_greedy(docs.repartition(7), budget=BUDGET).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_greedy_tighter_or_equal_to_offset_cuts(docs):
    """Greedy never opens more bins than tokens//budget + n_docs (sanity
    upper bound) and wastes less than one doc per bin on average."""
    greedy_bins = (
        pack_greedy(docs, budget=BUDGET).groupBy("pack_group", "bin_id").count().count()
    )
    toks = pack_by_offset(docs, budget=BUDGET).groupBy().agg(F.sum("n_tokens")).head()[0]
    lower = -(-int(toks) // BUDGET)  # ceil: fewer bins than this is impossible
    assert greedy_bins >= lower


def test_length_bucket_batches_invariants(spark):
    """Padding-waste bound (< width per doc), batch-size cap, full
    coverage (padded - wasted == corpus tokens), and partitioning
    invariance of the deterministic assignment."""
    import random

    from pyspark.sql import functions as F

    from udacity_data_engineering_spark.operators.packing import (
        length_bucket_batches,
    )

    rng = random.Random(3)
    rows = [
        (i, " ".join(["w"] * rng.randint(1, 60))) for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    width, bsz = 8, 16
    out = length_bucket_batches(docs, width=width, batch_size=bsz).collect()
    total_tokens = sum(len(t.split()) for _, t in rows)
    assert sum(r.n_docs for r in out) == 200
    assert sum(r.padded_tokens - r.wasted_tokens for r in out) == total_tokens
    for r in out:
        assert 1 <= r.n_docs <= bsz
        assert r.wasted_tokens <= (width - 1) * r.n_docs
        assert r.max_tokens // width == r.bucket_id
    again = length_bucket_batches(
        docs.repartition(9), width=width, batch_size=bsz
    ).collect()
    key = lambda r: (r.bucket_id, r.batch_id)
    assert sorted(map(lambda r: r.asDict(), again), key=lambda d: (d["bucket_id"], d["batch_id"])) == \
           sorted(map(lambda r: r.asDict(), out), key=lambda d: (d["bucket_id"], d["batch_id"]))
