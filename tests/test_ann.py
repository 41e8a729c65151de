"""IVF ANN tests: exact recovery of planted near-neighbours (the
operating regime), measured overlap vs brute force on the driver's
uniform-random embeddings (out-of-regime floor), and the pruning
contract (only nprobe of k inverted lists are scanned)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.ann import (
    _probe_ids,
    ivf_assign,
    ivf_topk,
)
from udacity_data_engineering_spark.plans.registry import all_queries


def _planted_corpus(spark, n_planted=15, n_noise=70, seed=3):
    rng = random.Random(seed)
    rows, planted, vid = [], [], 0
    for _ in range(n_planted):
        v = [rng.gauss(0, 1) for _ in range(64)]
        w = [x + rng.gauss(0, 0.02) for x in v]
        rows += [(vid, v), (vid + 1, w)]
        planted.append((vid, vid + 1))
        vid += 2
    for _ in range(n_noise):
        rows.append((vid, [rng.gauss(0, 1) for _ in range(64)]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, planted


def test_ivf_finds_planted_neighbor_as_top1(spark):
    """A cosine-0.99 near-duplicate must be the top-1 IVF result: near-
    identical vectors assign to the same inverted list, so probing the
    query's own list always covers them."""
    df, planted = _planted_corpus(spark)
    qid, expect = planted[0]
    qvec = [
        float(x)
        for x in df.filter(F.col("vec_id") == qid).head().embedding
    ]
    top = ivf_topk(df, qvec, k_neighbors=3, exclude_vec_id=qid).collect()
    assert top[0].vec_id == expect
    assert top[0].cos_sim > 0.99


def test_ivf_overlap_vs_brute_force(spark, sf_dir):
    """Uniform-random embeddings are IVF's worst case (nearest neighbour
    cosine ~0.5, clusters weak); still expect most of the exact top-10
    inside 4/16 probed lists."""
    qs = all_queries()
    exact = {r.vec_id for r in qs["q_cosine_topk"].fn(spark, sf_dir).collect()}
    approx = {r.vec_id for r in qs["q_ivf_topk"].fn(spark, sf_dir).collect()}
    assert len(exact & approx) >= 5


def test_ivf_scans_only_probed_lists(spark):
    """The pruning contract: candidates come from exactly the probed
    clusters, and every corpus row is assigned to exactly one of k."""
    df, _ = _planted_corpus(spark)
    assigned, centers = ivf_assign(df, k=8)
    assert len(centers) == 8 and len(centers[0]) == 64
    assert assigned.count() == df.count()
    n_clusters = assigned.select("cluster").distinct().count()
    assert n_clusters <= 8
    qvec = [float(x) for x in df.head().embedding]
    probes = _probe_ids(qvec, centers, nprobe=3)
    assert len(probes) == 3 and len(set(probes)) == 3
    scanned = assigned.filter(F.col("cluster").isin(probes))
    assert 0 < scanned.count() < df.count()


def test_probe_ids_rank_by_cosine():
    centers = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.7, 0.7]]
    assert _probe_ids([1.0, 0.1], centers, 2) == [0, 3]
