"""Lloyd's k-means trainer: exactness against a pure-numpy reference,
empty-cluster carry-over, sub-k corpora, and empty input."""

from __future__ import annotations

import numpy as np

from udacity_data_engineering_spark.operators.kmeans import kmeans_train


def _py_lloyd(X, k, iters):
    """Reference: deterministic lowest-id init, argmin-first ties,
    empty clusters keep their centroid."""
    C = X[:k].astype(np.float64).copy()
    assign = None
    for _ in range(iters):
        d = np.sqrt(((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2))
        assign = d.argmin(axis=1)
        for c in range(len(C)):
            pts = X[assign == c]
            if len(pts):
                C[c] = pts.mean(axis=0)
    return assign, C


def _emb_df(spark, X):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )


def test_kmeans_matches_numpy_reference(spark):
    rng = np.random.RandomState(7)
    X = rng.randn(120, 6)
    want_assign, want_C = _py_lloyd(X, k=5, iters=3)
    got, centers = kmeans_train(_emb_df(spark, X), k=5, iters=3)
    got_map = {r.vec_id: r.cluster for r in got.collect()}
    assert got_map == {i: int(c) for i, c in enumerate(want_assign)}
    np.testing.assert_allclose(np.asarray(centers), want_C, rtol=0, atol=1e-12)


def test_kmeans_separated_blobs_recover_clusters(spark):
    rng = np.random.RandomState(0)
    # interleaved ids (id % 3 = blob) so the lowest-id init spans all
    # three blobs — with 90 ids from one blob first, Lloyd's provably
    # never escapes it (deterministic init is honest about that)
    X = np.vstack(
        [rng.randn(4) * 0.05 + 10 * (i % 3) for i in range(90)]
    )
    got, _ = kmeans_train(_emb_df(spark, X), k=3, iters=4)
    rows = got.collect()
    # each blob lands in exactly one cluster, and blobs don't mix
    labels = {}
    for r in rows:
        labels.setdefault(r.vec_id % 3, set()).add(r.cluster)
    assert all(len(s) == 1 for s in labels.values())
    assert len(set().union(*labels.values())) == 3


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # 3 identical points, k=2: init centroids equal, every point ties to
    # cluster 0 (argmin-first), cluster 1 goes empty and must keep its
    # (identical) centroid rather than crash or NaN
    X = np.ones((3, 2))
    got, centers = kmeans_train(_emb_df(spark, X), k=2, iters=2)
    assert {r.cluster for r in got.collect()} == {0}
    assert centers[1] == [1.0, 1.0]


def test_kmeans_fewer_vectors_than_k(spark):
    X = np.arange(6, dtype=float).reshape(3, 2)
    got, centers = kmeans_train(_emb_df(spark, X), k=8, iters=2)
    assert len(centers) == 3
    assert got.count() == 3


def test_kmeans_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    got, centers = kmeans_train(df, k=4, iters=2)
    assert got.count() == 0 and centers == []
    assert [f.name for f in got.schema.fields] == ["vec_id", "cluster"]


def test_kmeans_assign_matches_driver_argmin(spark):
    """kmeans_assign against frozen centroids == the plain euclidean
    argmin (lowest-id tie rule), checked against a driver-side numpy
    recomputation. (Note: re-assigning the TRAINING set against the
    RETURNED centroids is one Lloyd step ahead of the final training
    assignment — kmeans_train updates centers after its last assign —
    so that is deliberately NOT the contract tested here.)"""
    import numpy as np

    from udacity_data_engineering_spark.operators.kmeans import (
        kmeans_assign,
        kmeans_train,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    _, centers = kmeans_train(emb, k=4, iters=3)
    got = {r.vec_id: r.cluster for r in kmeans_assign(emb, centers).collect()}
    C = np.asarray(centers)
    for r in emb.collect():
        x = np.asarray([float(v) for v in r.embedding])
        expect = int(((x[None, :] - C) ** 2).sum(axis=1).argmin())
        assert got[r.vec_id] == expect


def test_kmeans_assign_empty_model(spark):
    from udacity_data_engineering_spark.operators.kmeans import kmeans_assign

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = kmeans_assign(emb, [])
    assert out.count() == 0
    assert out.columns == ["vec_id", "cluster"]


def test_kmeans_drops_null_embeddings(spark):
    """Null embeddings (routine upstream-extractor dirt) must be dropped,
    never reach the Arrow kernel's np.stack (round-11 nulls probe)."""
    from udacity_data_engineering_spark.operators.kmeans import (
        kmeans_assign,
        kmeans_train,
    )

    rows = [(i, [float(i % 4), float(i % 3)]) for i in range(20)]
    rows += [(100, None), (101, None)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned, centers = kmeans_train(emb, k=3, iters=2)
    got = assigned.collect()
    assert len(got) == 20  # the two null rows dropped
    assert {r.vec_id for r in got} == set(range(20))
    out = kmeans_assign(emb, centers)
    assert out.count() == 20


def test_kmeans_update_sufficient_stats_additive(spark):
    """Folding a batch in two pieces must equal folding it at once —
    the additivity that makes the refresh schedule-independent."""
    import math

    from pyspark.sql import functions as F

    from udacity_data_engineering_spark.operators.kmeans import (
        kmeans_assign,
        kmeans_train,
        kmeans_update,
    )

    emb = spark.createDataFrame(
        [(i, [float((i * 7) % 5), float((i * 3) % 4)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    lake = emb.filter("vec_id % 2 = 0")
    _, centers = kmeans_train(lake, k=3, iters=2)
    sizes = {
        r.cluster: r.n
        for r in kmeans_assign(lake, centers)
        .groupBy("cluster").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    batch = emb.filter("vec_id % 2 = 1")
    once = kmeans_update(batch, centers, sizes)

    # two pieces: update with piece 1, roll sizes forward, then piece 2
    p1 = batch.filter("vec_id % 4 = 1")
    p2 = batch.filter("vec_id % 4 = 3")
    mid = kmeans_update(p1, centers, sizes)
    # sizes grow by piece-1 members per ORIGINAL assignment (frozen model)
    grow1 = {
        r.cluster: r.n
        for r in kmeans_assign(p1, centers)
        .groupBy("cluster").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    sizes2 = {c: sizes.get(c, 0) + grow1.get(c, 0) for c in set(sizes) | set(grow1)}
    twice = kmeans_update(p2, mid, sizes2)
    # NOTE: piece-2 assignment runs against the MID model — additivity
    # holds exactly only if assignments are frozen; freeze them by
    # asserting the mid model assigns piece 2 the same as the original
    a_orig = sorted(tuple(r) for r in kmeans_assign(p2, centers).collect())
    a_mid = sorted(tuple(r) for r in kmeans_assign(p2, mid).collect())
    if a_orig == a_mid:
        for c in range(len(once)):
            for p in range(len(once[c])):
                assert math.isclose(once[c][p], twice[c][p], rel_tol=1e-9), (
                    c, p, once[c][p], twice[c][p]
                )
    # regardless: the single-shot update matches the hand formula
    bsum = {}
    for r in kmeans_assign(batch, centers).join(
        batch.selectExpr("vec_id", "embedding as v"), "vec_id"
    ).collect():
        s, m = bsum.setdefault(r.cluster, ([0.0] * 2, 0))
        bsum[r.cluster] = ([s[i] + r.v[i] for i in range(2)], m + 1)
    for c, old in enumerate(centers):
        if c not in bsum:
            assert once[c] == list(old)
            continue
        s, m = bsum[c]
        n = sizes.get(c, 0)
        for p in range(2):
            want = (n * old[p] + s[p]) / (n + m)
            assert math.isclose(once[c][p], want, rel_tol=1e-9)
