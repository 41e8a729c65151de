"""Incremental corpus dedup: hand-built fixture covering the three
cases (already-in-corpus, duplicate-within-batch, genuinely new), the
oracle query at fixture scale, and the plan contract (anti-join on
digests, bodies never shuffle)."""

from __future__ import annotations

from udacity_data_engineering_spark.operators.incremental import (
    corpus_fingerprints,
    incremental_dedup,
)
from udacity_data_engineering_spark.plans.registry import all_queries


def _mk(spark):
    corpus = spark.createDataFrame(
        [(0, "seen before"), (2, "also seen")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (1, "seen before"),   # exists in corpus -> dropped
            (3, "brand new"),     # unique -> survives
            (5, "twin text"),     # first of an in-batch pair -> survives
            (7, "twin text"),     # in-batch duplicate -> dropped
            (9, "also seen"),     # exists in corpus -> dropped
        ],
        "doc_id long, text string",
    )
    return corpus, batch


def test_incremental_dedup_cases(spark):
    corpus, batch = _mk(spark)
    out = incremental_dedup(batch, corpus_fingerprints(corpus))
    assert {r.doc_id for r in out.collect()} == {3, 5}


def test_incremental_dedup_idempotent(spark):
    """Feeding the survivors back against corpus+batch fingerprints
    removes everything — the lake-accumulation invariant."""
    corpus, batch = _mk(spark)
    fps = corpus_fingerprints(corpus.select("text").union(batch.select("text")))
    again = incremental_dedup(batch, fps)
    assert again.count() == 0


def test_plan_anti_join_on_digest(spark, sf_dir):
    """The declared query's plan must anti-join on the 32-byte digest
    with no Python eval nodes; bodies stay out of the join keys."""
    q = all_queries()["q_incremental_dedup"]
    plan = q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
