"""Embedding housekeeping operators: centroid pooling and quantization.

Oracle equivalence is covered by verify_local; these pin numeric
contracts the hash can't show (centroid == numpy mean, quantization
error bound vs the theoretical scale/2 ceiling).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.embeddings_ops import (
    group_centroids,
    quantize_error,
)
from udacity_data_engineering_spark.session import table


def test_centroids_match_numpy(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    rows = emb.select("label", "embedding").collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r.embedding)
    want = {
        (lab, pos): round(float(m), 6)
        for lab, vecs in by_label.items()
        for pos, m in enumerate(np.mean(np.array(vecs, dtype=np.float64), axis=0))
    }
    got = {
        (r.label, r.pos): r.centroid
        for r in group_centroids(emb).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) <= 1e-6


def test_quantize_error_below_half_scale(spark, sf_dir):
    """Symmetric rounding error is bounded by scale/2 per element, so
    the mean abs error must be too; and scale must reconstruct the
    absmax element exactly to <= scale/2."""
    emb = table(spark, sf_dir, "embeddings")
    out = quantize_error(emb).select("vec_id", "scale", "mean_abs_err")
    bad = out.filter(
        (F.col("mean_abs_err") > F.col("scale") / 2) | (F.col("scale") <= 0)
    ).count()
    assert bad == 0
    # spot-check one vector against numpy
    r = emb.select("vec_id", "embedding").first()
    vec = np.array(r.embedding, dtype=np.float64)
    scale = float(np.max(np.abs(vec))) / 127
    err = float(np.mean(np.abs(vec - np.round(vec / scale) * scale)))
    got = out.filter(F.col("vec_id") == r.vec_id).first()
    assert abs(got.scale - round(scale, 9)) <= 1e-9
    assert abs(got.mean_abs_err - round(err, 9)) <= 1e-8


# ---------------------------------------------------------------------------
# JL random projection (random_projection)
# ---------------------------------------------------------------------------

from udacity_data_engineering_spark.operators.embeddings_ops import (
    _rademacher,
    random_projection,
)


def test_projection_matches_numpy(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    r = 8
    rows = emb.select("vec_id", "embedding").limit(5).collect()
    got = {
        (x.vec_id, x.j): x.comp
        for x in random_projection(emb, r=r)
        .filter(F.col("vec_id").isin([row.vec_id for row in rows]))
        .collect()
    }
    d = len(rows[0].embedding)
    W = np.array([[_rademacher(i, j) for j in range(r)] for i in range(d)])
    for row in rows:
        expect = np.array(row.embedding, dtype=np.float64) @ W
        for j in range(r):
            assert abs(got[(row.vec_id, j)] - round(float(expect[j]), 6)) <= 1e-6


def test_rademacher_is_balanced():
    # the +-1 matrix must be near-balanced per output direction, or the
    # projection correlates with the all-ones direction
    for j in range(16):
        s = sum(_rademacher(i, j) for i in range(256))
        assert abs(s) < 64


def test_jl_distance_preservation(spark, sf_dir):
    # JL property (loose): mean pairwise squared-distance ratio between
    # projected (scaled by 1/r) and original (scaled by 1/d) spaces is
    # near 1 over a sample
    emb = table(spark, sf_dir, "embeddings")
    r = 16
    sample = emb.select("vec_id", "embedding").limit(30).collect()
    d = len(sample[0].embedding)
    W = np.array([[_rademacher(i, j) for j in range(r)] for i in range(d)])
    X = np.array([row.embedding for row in sample], dtype=np.float64)
    P = X @ W
    ratios = []
    for a in range(len(sample)):
        for b in range(a + 1, len(sample)):
            d_orig = float(np.sum((X[a] - X[b]) ** 2)) / d
            d_proj = float(np.sum((P[a] - P[b]) ** 2)) / (r * d)
            if d_orig > 0:
                ratios.append(d_proj / d_orig)
    m = float(np.mean(ratios))
    assert 0.6 < m < 1.6


def test_projection_is_map_only(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    plan = (
        random_projection(emb, r=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_projection_skips_null_vectors(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None)], "vec_id long, embedding array<double>"
    )
    out = random_projection(df, r=3)
    assert out.select("vec_id").distinct().count() == 1
    assert out.count() == 3


def test_projection_rejects_bad_r(spark):
    import pytest

    df = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        random_projection(df, r=0)
