"""MMR re-ranking: exactness against a pure-Python greedy, diversity
behavior (near-duplicates of a picked doc are deferred), negative-
similarity bonus, multi-query grouping, and k > candidates."""

from __future__ import annotations

import numpy as np

from udacity_data_engineering_spark.operators.mmr import mmr_rerank


def _py_mmr(ids, rel, X, k, lam=0.5):
    U = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = np.round(U @ U.T, 6)
    remaining = set(range(len(ids)))
    max_sim = None
    out = []
    for step in range(min(k, len(ids))):
        div = max_sim if max_sim is not None else np.zeros(len(ids))
        score = lam * np.asarray(rel) - (1 - lam) * div
        j = min(remaining, key=lambda i: (-score[i], ids[i]))
        out.append((step + 1, ids[j], round(float(score[j]), 7)))
        remaining.discard(j)
        max_sim = S[:, j] if max_sim is None else np.maximum(max_sim, S[:, j])
    return out


def _cands_df(spark, ids, rel, X, qid=0):
    return spark.createDataFrame(
        [
            (qid, int(i), float(r), [float(v) for v in x])
            for i, r, x in zip(ids, rel, X)
        ],
        "query_id long, doc_id long, rel double, v array<double>",
    )


def test_mmr_matches_python_reference(spark):
    rng = np.random.RandomState(3)
    ids = list(range(100, 120))
    X = rng.randn(20, 8)
    rel = [round(float(x), 6) for x in rng.uniform(0, 1, 20)]
    want = _py_mmr(ids, rel, X, k=10)
    got = [
        (r.rank, r.doc_id, r.mmr)
        for r in mmr_rerank(_cands_df(spark, ids, rel, X), k=10)
        .orderBy("rank")
        .collect()
    ]
    assert got == want


def test_mmr_defers_near_duplicate_of_pick(spark):
    # doc 2 is a near-copy of doc 1 (the top pick) with almost the same
    # relevance; doc 3 is orthogonal with lower relevance. Plain top-k
    # would return (1, 2); MMR must pick the orthogonal doc 3 second.
    X = np.array([[1.0, 0.0], [0.999, 0.001], [0.0, 1.0]])
    got = (
        mmr_rerank(_cands_df(spark, [1, 2, 3], [0.9, 0.89, 0.5], X), k=2)
        .orderBy("rank")
        .collect()
    )
    assert [r.doc_id for r in got] == [1, 3]


def test_mmr_negative_similarity_is_a_bonus(spark):
    # doc 3 points AWAY from the pick (cos = -1): its score must EXCEED
    # pure relevance/2 — no clamping of negative sims to zero
    X = np.array([[1.0, 0.0], [-1.0, 0.0]])
    got = (
        mmr_rerank(_cands_df(spark, [1, 3], [0.8, 0.1], X), k=2)
        .orderBy("rank")
        .collect()
    )
    assert got[1].doc_id == 3
    assert got[1].mmr == round(0.5 * 0.1 - 0.5 * (-1.0), 7)


def test_mmr_groups_are_independent(spark):
    X = np.eye(3)
    a = _cands_df(spark, [1, 2, 3], [0.9, 0.8, 0.7], X, qid=10)
    b = _cands_df(spark, [1, 2, 3], [0.1, 0.2, 0.9], X, qid=20)
    got = mmr_rerank(a.unionByName(b), k=1).collect()
    by_q = {r.query_id: r.doc_id for r in got}
    assert by_q == {10: 1, 20: 3}


def test_mmr_k_exceeding_candidates_returns_all(spark):
    X = np.eye(2)
    got = mmr_rerank(_cands_df(spark, [5, 6], [0.5, 0.4], X), k=10).collect()
    assert sorted(r.rank for r in got) == [1, 2]
