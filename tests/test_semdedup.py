"""Semantic dedup tests: planted paraphrase pairs (near-identical
embeddings) must lose exactly one member per pair, noise must survive,
and the survivor set must be deterministic across runs."""

from __future__ import annotations

import random

from udacity_data_engineering_spark.operators.semdedup import (
    semantic_dedup,
    semantic_pairs,
)


def _corpus(spark, n_pairs=10, n_noise=60, seed=11):
    rng = random.Random(seed)
    rows, pairs, vid = [], [], 0
    for _ in range(n_pairs):
        v = [rng.gauss(0, 1) for _ in range(64)]
        w = [x + rng.gauss(0, 0.02) for x in v]
        rows += [(vid, v), (vid + 1, w)]
        pairs.append((vid, vid + 1))
        vid += 2
    for _ in range(n_noise):
        rows.append((vid, [rng.gauss(0, 1) for _ in range(64)]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, pairs


def test_planted_pairs_are_found(spark):
    """Near-identical vectors co-cluster under spherical k-means, so
    every planted pair appears in the within-cluster pair graph."""
    df, pairs = _corpus(spark)
    found = {
        (r.vec_a, r.vec_b)
        for r in semantic_pairs(df, threshold=0.9).collect()
    }
    for a, b in pairs:
        assert (a, b) in found
        assert a in {p[0] for p in found}


def test_survivors_keep_min_id_per_pair(spark):
    """Each planted pair loses its higher vec_id; unpaired noise
    survives untouched."""
    df, pairs = _corpus(spark)
    survivors = {r.vec_id for r in semantic_dedup(df, threshold=0.9).collect()}
    for a, b in pairs:
        assert a in survivors
        assert b not in survivors
    paired = {x for p in pairs for x in p}
    noise = {r.vec_id for r in df.select("vec_id").collect()} - paired
    assert noise <= survivors


def test_survivor_set_deterministic(spark):
    """Seeded clustering + min-label components: two runs over the same
    input produce the identical survivor set."""
    df, _ = _corpus(spark)
    s1 = [r.vec_id for r in semantic_dedup(df, threshold=0.9).collect()]
    s2 = [r.vec_id for r in semantic_dedup(df, threshold=0.9).collect()]
    assert s1 == s2
