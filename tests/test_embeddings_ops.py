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
