"""Decontamination semantics + plan shape (operators/contamination.py)."""

from __future__ import annotations

from udacity_data_engineering_spark.operators.contamination import decontaminate


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_overlap_counts(spark):
    bench = _docs(spark, [(100, "a b c d e f g h")])
    corpus = _docs(
        spark,
        [
            (1, "x x a b c d e f x"),   # two distinct benchmark 4-grams? a b c d / b c d e / c d e f
            (2, "no overlap here at all"),
            (3, "a b c d"),              # exactly one 4-gram
        ],
    )
    got = {r.doc_id: r.n_hits for r in decontaminate(corpus, bench, n=4).collect()}
    # doc 1 contains token 4-grams: "a b c d", "b c d e", "c d e f" -> 3 hits
    assert got == {1: 3, 3: 1}


def test_short_docs_never_match(spark):
    bench = _docs(spark, [(100, "a b c d e")])
    corpus = _docs(spark, [(1, "a b c")])  # shorter than n
    assert decontaminate(corpus, bench, n=4).count() == 0


def test_benchmark_side_is_broadcast(spark):
    bench = _docs(spark, [(100, "a b c d e")])
    corpus = _docs(spark, [(1, "a b c d e f")])
    plan = decontaminate(corpus, bench, n=4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# Bloom-prefiltered path (decontaminate_bloom) — must be answer-identical to
# the exact operator under ANY filter parameters (no false negatives; false
# positives removed by the exact verify join).
# ---------------------------------------------------------------------------

from udacity_data_engineering_spark.operators.contamination import (
    bloom_prefilter,
    build_shingle_bloom,
    decontaminate_bloom,
)
from pyspark.sql import functions as F


def _sorted_rows(df):
    return sorted((r.doc_id, r.n_hits) for r in df.collect())


def test_bloom_equals_exact(spark):
    bench = _docs(spark, [(100, "a b c d e f g h"), (101, "q r s t u v")])
    corpus = _docs(
        spark,
        [
            (1, "x x a b c d e f x"),
            (2, "no overlap here at all"),
            (3, "a b c d"),
            (4, "zz q r s t yy"),
        ],
    )
    exact = _sorted_rows(decontaminate(corpus, bench, n=4))
    got = _sorted_rows(decontaminate_bloom(corpus, bench, n=4))
    assert got == exact == [(1, 3), (3, 1), (4, 1)]


def test_bloom_fp_heavy_filter_still_exact(spark):
    # m_bits=64 with k=2 over dozens of shingles: nearly every probe is a
    # bloom hit — the exact verify join must strip every false positive.
    bench = _docs(spark, [(100, "a b c d e f g h")])
    corpus = _docs(
        spark,
        [(i, f"w{i} x{i} y{i} z{i} v{i}") for i in range(1, 30)]
        + [(99, "a b c d zz")],
    )
    exact = _sorted_rows(decontaminate(corpus, bench, n=4))
    got = _sorted_rows(decontaminate_bloom(corpus, bench, n=4, m_bits=64, k=2))
    assert got == exact == [(99, 1)]


def test_bitmap_is_bounded_and_key_free(spark):
    # 1000 distinct keys, m_bits=512 -> at most 8 words; no string column.
    keys = spark.range(1000).select(F.concat(F.lit("k"), F.col("id")).alias("shingle"))
    bm = build_shingle_bloom(keys, m_bits=512, k=3)
    assert bm.count() <= 8
    assert [f.name for f in bm.schema.fields] == ["word_idx", "bits"]
    assert all(f.dataType.simpleString() == "bigint" for f in bm.schema.fields)


def test_bloom_no_false_negatives(spark):
    # every inserted key must survive the prefilter
    keys = spark.range(500).select(F.concat(F.lit("key"), F.col("id")).alias("shingle"))
    bm = build_shingle_bloom(keys, m_bits=1 << 12, k=4)
    survivors = bloom_prefilter(keys, bm, m_bits=1 << 12, k=4).count()
    assert survivors == 500


def test_bloom_rejects_most_non_members(spark):
    # sized filter (16 bits/key, k=5): fp rate should be well under 5%
    keys = spark.range(1000).select(F.concat(F.lit("in"), F.col("id")).alias("shingle"))
    bm = build_shingle_bloom(keys, m_bits=1 << 14, k=5)
    probes = spark.range(2000).select(F.concat(F.lit("out"), F.col("id")).alias("shingle"))
    fps = bloom_prefilter(probes, bm, m_bits=1 << 14, k=5).count()
    assert fps < 100


def test_bloom_probe_side_never_shuffles(spark):
    # the prefilter is ONE broadcast of the packed 1-row bitmap map plus a
    # map-side filter testing all k bits — a single nested-loop join with
    # fan-out exactly 1, never k join stages, never an Exchange on the
    # probe side (ADVICE r12 rework)
    keys = spark.range(100).select(F.concat(F.lit("k"), F.col("id")).alias("shingle"))
    bm = build_shingle_bloom(keys, m_bits=1 << 10, k=3)
    plan = (
        bloom_prefilter(spark.range(100).select(F.concat(F.lit("p"), F.col("id")).alias("shingle")), bm, m_bits=1 << 10, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "BroadcastHashJoin" not in plan  # no per-probe join stages
    assert "SortMergeJoin" not in plan
    # the only Exchange anywhere is the bitmap build's own word-group
    # aggregate + its broadcast — the probe side reads straight through
    assert "Exchange hashpartitioning(shingle" not in plan


def test_bloom_rejects_bad_m_bits(spark):
    import pytest

    keys = spark.range(10).select(F.concat(F.lit("k"), F.col("id")).alias("shingle"))
    with pytest.raises(ValueError):
        build_shingle_bloom(keys, m_bits=100)
