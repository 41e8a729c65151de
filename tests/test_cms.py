"""Count-min sketch (operators/cms.py): overestimate-only guarantee,
bounded sketch size, mergeability, probe plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.cms import (
    CMS_D,
    CMS_W,
    cms_estimate,
    cms_sketch,
    q_cms_estimates,
)


def _terms(spark, words):
    return spark.createDataFrame([(w,) for w in words], "term string")


def test_sketch_size_bounded(spark):
    terms = _terms(spark, [f"tok{i}" for i in range(5000)])
    sk = cms_sketch(terms)
    assert sk.count() <= CMS_D * CMS_W
    # every row id present, total count per row == number of input terms
    per_row = {r.row: r.tot for r in sk.groupBy("row").agg(F.sum("cnt").alias("tot")).collect()}
    assert set(per_row) == set(range(CMS_D))
    assert all(v == 5000 for v in per_row.values())


def test_estimates_never_underestimate(spark, sf_dir):
    rows = q_cms_estimates(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r.cms_est >= r.exact_cnt for r in rows)


def test_exact_on_sparse_input(spark):
    # far fewer distinct terms than cells -> collisions are unlikely and
    # the known-heavy term must estimate close to exactly
    words = ["alpha"] * 50 + ["beta"] * 7 + [f"x{i}" for i in range(20)]
    sk = cms_sketch(_terms(spark, words))
    est = {
        r.term: r.cms_est
        for r in cms_estimate(_terms(spark, ["alpha", "beta", "absent"]), sk).collect()
    }
    assert est["alpha"] >= 50 and est["beta"] >= 7
    # absent term: bounded by whatever collides into its D cells
    assert est["absent"] <= 50 + 7 + 20


def test_sketches_merge_by_summing(spark):
    a = _terms(spark, ["x"] * 3 + ["y"] * 2)
    b = _terms(spark, ["x"] * 4 + ["z"] * 5)
    merged = (
        cms_sketch(a).unionByName(cms_sketch(b))
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_sketch(a.unionByName(b))
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_probe_side_broadcasts_the_sketch(spark):
    sk = cms_sketch(_terms(spark, [f"t{i}" for i in range(100)]))
    plan = (
        cms_estimate(_terms(spark, ["t1", "t2"]), sk)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
