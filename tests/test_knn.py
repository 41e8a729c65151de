"""k-NN similarity join: exactness vs a numpy brute force (the
mergeable-top-k two-phase plan must be indistinguishable from all-pairs),
multi-partition merges, self-exclusion, and tie handling."""

from __future__ import annotations

import numpy as np

from udacity_data_engineering_spark.operators.knn import knn_join


def _brute(ids, mat, queries, k):
    unit = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
    want = {}
    for qid, qv in queries:
        qu = np.asarray(qv) / max(np.linalg.norm(qv), 1e-300)
        sims = unit @ qu
        sims[ids == qid] = -np.inf
        order = np.lexsort((ids, -sims))
        want[qid] = [
            (int(ids[j]), round(float(sims[j]), 6))
            for j in order[:k]
            if sims[j] > -np.inf
        ]
    return want


def test_knn_join_matches_bruteforce_across_partitions(spark):
    """120 random vectors spread over 8 partitions (so the per-partition
    partial top-k genuinely merges) must reproduce the brute-force
    ranking exactly for every query."""
    rng = np.random.default_rng(5)
    n, d, k = 120, 16, 7
    mat = rng.normal(size=(n, d))
    ids = np.arange(n, dtype=np.int64)
    rows = [(int(i), [float(x) for x in mat[i]]) for i in ids]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(8)
    # float32 storage: brute-force on the same down-cast values
    mat32 = mat.astype(np.float32).astype(np.float64)
    queries = [(int(i), [float(x) for x in mat32[i]]) for i in (0, 17, 55)]
    want = _brute(ids, mat32, queries, k)
    got: dict = {}
    for r in knn_join(emb, queries, k=k).collect():
        got.setdefault(r.query_id, []).append((r.vec_id, r.cos_sim))
    # rows arrive unordered per query; order by rank = (sim desc, id)
    for qid in got:
        got[qid].sort(key=lambda t: (-t[1], t[0]))
    assert set(got) == set(want)
    for qid in want:
        assert [v for v, _ in got[qid]] == [v for v, _ in want[qid]], qid
        for (gv, gs), (wv, ws) in zip(got[qid], want[qid]):
            assert abs(gs - ws) <= 1e-6


def test_knn_join_ties_break_on_vec_id(spark):
    """Duplicate vectors (cosine 1.0 ties) must rank by vec_id."""
    v = [1.0, 0.0, 0.0, 0.0]
    rows = [(i, v) for i in range(6)] + [(9, [0.0, 1.0, 0.0, 0.0])]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(3)
    got = [
        (r.vec_id, r.cos_sim)
        for r in knn_join(emb, [(0, v)], k=3)
        .orderBy("cos_sim", ascending=False)
        .collect()
    ]
    got.sort(key=lambda t: (-t[1], t[0]))
    assert got == [(1, 1.0), (2, 1.0), (3, 1.0)]  # 0 self-excluded


def test_knn_join_empty_queries_and_null_vectors(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, None)], "vec_id long, embedding array<float>"
    )
    assert knn_join(emb, [], k=3).count() == 0
    rows = knn_join(emb, [(7, [1.0, 0.0])], k=3).collect()
    assert [(r.vec_id, r.cos_sim) for r in rows] == [(0, 1.0)]
