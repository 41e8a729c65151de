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
