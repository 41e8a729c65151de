"""Distributed exact global rank (operators/ranking.py).

The contract under test: exact_global_rank / sql_ntile are row-identical
to the single-partition ORDER-BY window they replace, while the physical
plan contains NO Exchange SinglePartition (the 100 TB cliff the module
exists to remove).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from udacity_data_engineering_spark.operators.ranking import (
    exact_global_rank,
    sql_ntile,
    with_total_count,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _window_rank(df, key, tiebreak):
    w = Window.orderBy(F.col(key).asc(), F.col(tiebreak).asc())
    return df.withColumn("rn_ref", F.row_number().over(w))


def test_rank_matches_global_window(docs):
    got = exact_global_rank(docs, "n_chars", "doc_id", out="rn")
    ref = _window_rank(docs, "n_chars", "doc_id")
    merged = got.select("doc_id", "rn").join(
        ref.select("doc_id", "rn_ref"), "doc_id"
    )
    assert merged.filter(F.col("rn") != F.col("rn_ref")).count() == 0
    assert got.count() == docs.count()


def test_rank_duplicate_keys_bucket_together(spark):
    # every row shares one of two key values: buckets must still produce
    # a correct dense 1..n assignment via the tiebreak order
    rows = [(i, i % 2) for i in range(200)]
    df = spark.createDataFrame(rows, "id int, k int")
    got = {
        r["id"]: r["rn"]
        for r in exact_global_rank(df, "k", "id", out="rn").collect()
    }
    evens = sorted(i for i in range(200) if i % 2 == 0)
    odds = sorted(i for i in range(200) if i % 2 == 1)
    expect = {i: rank + 1 for rank, i in enumerate(evens)}
    expect.update({i: 100 + rank + 1 for rank, i in enumerate(odds)})
    assert got == expect


def test_rank_single_bucket_degenerate(spark):
    # buckets=1 -> one window partition; still correct, just not parallel
    df = spark.createDataFrame([(i, float(i % 7)) for i in range(50)], "id int, v double")
    got = exact_global_rank(df, "v", "id", out="rn", buckets=1)
    ref = _window_rank(df, "v", "id")
    merged = got.join(ref.select("id", "rn_ref"), "id")
    assert merged.filter(F.col("rn") != F.col("rn_ref")).count() == 0


@pytest.mark.parametrize("k", [3, 7, 10])
def test_ntile_matches_sql_semantics(docs, k):
    # n=500; k=3 and k=7 exercise the uneven-bucket remainder path
    got = sql_ntile(docs, "n_chars", "doc_id", k, out="tile")
    w = Window.orderBy(F.col("n_chars").asc(), F.col("doc_id").asc())
    ref = docs.withColumn("tile_ref", F.ntile(k).over(w))
    merged = got.select("doc_id", "tile").join(
        ref.select("doc_id", "tile_ref"), "doc_id"
    )
    assert merged.filter(F.col("tile") != F.col("tile_ref")).count() == 0


def _windows_all_partitioned(plan: str) -> bool:
    # every physical Window must carry the __bkt partition spec — a
    # global ORDER-BY window would read "windowspecdefinition(<key> ASC"
    return all(
        "__bkt" in line for line in plan.splitlines() if "Window [" in line
    )


def test_no_single_partition_window(docs):
    got = exact_global_rank(docs, "n_chars", "doc_id", out="rn")
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the rank path has NO single-partition exchange at all
    assert "Exchange SinglePartition" not in plan
    assert _windows_all_partitioned(plan)

    tiles = sql_ntile(docs, "n_chars", "doc_id", 10, out="tile")
    plan2 = tiles._jdf.queryExecution().executedPlan().toString()
    assert _windows_all_partitioned(plan2)
    # the ntile path adds with_total_count: its ONLY SinglePartition
    # exchange is the final 1-row count(*) merge of per-partition
    # partial counts (B tiny rows move, never the corpus)
    assert plan2.count("Exchange SinglePartition") <= 1
    assert "partial_count" in plan2


def test_with_total_count_broadcasts(docs):
    out = with_total_count(docs, out="__n")
    assert out.select(F.min("__n"), F.max("__n")).first() == (500, 500)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# ---------------------------------------------------------------------------
# negative sampling (built on the dense rank)


def test_negative_samples_properties(docs):
    from udacity_data_engineering_spark.operators.ranking import (
        negative_samples,
    )

    out = negative_samples(docs, "doc_id", m=4)
    rows = out.collect()
    n_docs = docs.count()
    assert len(rows) == 4 * n_docs                      # exactly m per row
    assert all(r["neg_id"] != r["doc_id"] for r in rows)  # never self
    # deterministic: a second run is row-identical
    again = {(r["doc_id"], r["draw"]): r["neg_id"] for r in rows}
    for r in negative_samples(docs, "doc_id", m=4).collect():
        assert again[(r["doc_id"], r["draw"])] == r["neg_id"]


def test_negative_samples_survive_repartition(docs):
    from udacity_data_engineering_spark.operators.ranking import (
        negative_samples,
    )

    base = {
        (r["doc_id"], r["draw"]): r["neg_id"]
        for r in negative_samples(docs, "doc_id", m=2).collect()
    }
    shuffled = docs.repartition(13)
    for r in negative_samples(shuffled, "doc_id", m=2).collect():
        assert base[(r["doc_id"], r["draw"])] == r["neg_id"]


def test_rank_null_keys_match_window_nulls_first(spark):
    # Spark ORDER BY ASC is NULLS FIRST; null keys fail every `> bound`
    # comparison so they all land in bucket 0, where the local
    # ASC order again puts them first — global semantics preserved
    rows = [(i, None if i % 5 == 0 else float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "id int, v double")
    got = exact_global_rank(df, "v", "id", out="rn")
    ref = _window_rank(df, "v", "id")
    merged = got.join(ref.select("id", "rn_ref"), "id")
    assert merged.filter(F.col("rn") != F.col("rn_ref")).count() == 0


def test_exact_global_rank_large_bucket_count_depth_safe(spark):
    """B-deep CASE chains hit Catalyst recursion limits; the HOF bucket
    expr + broadcast offset join must analyze and run at B in the
    thousands (ADVICE r10)."""
    from udacity_data_engineering_spark.operators.ranking import (
        exact_global_rank,
    )

    df = spark.range(500).select(
        (F.col("id") * 37 % 211).alias("v"), F.col("id")
    )
    got = exact_global_rank(df, "v", "id", out="rn", buckets=2048)
    rows = got.orderBy("rn").collect()
    assert [r["rn"] for r in rows] == list(range(1, 501))
    want = sorted((r["v"], r["id"]) for r in df.collect())
    assert [(r["v"], r["id"]) for r in rows] == want
