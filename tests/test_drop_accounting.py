"""Drop accounting for every capped candidate path (the round-4 verdict's
last silent failure mode): candidate_stats arithmetic, the per-path stats
companions on crafted hot-bucket inputs, and the registered audit query.

Contract (SCALE.md "Drop accounting"): any operator that drops over-cap
groups must report — via its stats companion — exactly how many groups,
member rows, and candidate pairs the cap removed. Nothing is lost
silently: a user who sees n_capped == 0 has full candidate coverage.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.neardup import (
    embedding_neardup_lsh,
    embedding_neardup_lsh_stats,
    simhash_candidate_stats,
    simhash_candidates,
)
from udacity_data_engineering_spark.operators.semdedup import (
    semantic_pairs,
    semantic_pairs_stats,
)
from udacity_data_engineering_spark.operators.similarity import (
    bucket_pairs,
    candidate_stats,
    minhash_candidate_stats,
    minhash_candidates,
)


def test_candidate_stats_exact_arithmetic(spark):
    # groups: a=5 members (over cap 3), b=3 (at cap), c=1, d=4 (over)
    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1 + [("d",)] * 4
    df = spark.createDataFrame(rows, "g string")
    got = candidate_stats(df, ["g"], cap=3, path="x").first().asDict()
    assert got == {
        "path": "x",
        "units": "rows",
        "n_groups": 4,
        "n_capped": 2,
        "dropped_rows": 9,  # 5 + 4
        "dropped_pairs": 16,  # C(5,2)=10 + C(4,2)=6
        "max_group": 5,
    }


def test_candidate_stats_empty_input_is_all_zero(spark):
    df = spark.createDataFrame([], "g string")
    got = candidate_stats(df, ["g"], cap=3).first().asDict()
    assert got == {
        "n_groups": 0,
        "n_capped": 0,
        "dropped_rows": 0,
        "dropped_pairs": 0,
        "max_group": 0,
    }


def test_bucket_pairs_drop_matches_candidate_stats(spark):
    """What bucket_pairs drops is exactly what candidate_stats reports:
    total pairs produced + dropped_pairs == triangular pairs of all
    multi-member buckets."""
    rows = (
        [("hot", i) for i in range(7)]
        + [("warm", i) for i in range(3)]
        + [("cold", 0)]
    )
    df = spark.createDataFrame(rows, "g string, doc_id long")
    produced = bucket_pairs(df, ["g"], F.col("doc_id"), cap=5).count()
    stats = candidate_stats(df, ["g"], cap=5).first()
    assert produced == 3  # C(3,2) from 'warm' only
    assert stats.n_capped == 1 and stats.dropped_rows == 7
    assert produced + stats.dropped_pairs == 21 + 3  # C(7,2) + C(3,2)


def _hot_docs(spark, n=8):
    """n identical docs — every band of every hash scheme collides."""
    return spark.createDataFrame(
        [(i, "the same exact document text repeated verbatim") for i in range(n)],
        "doc_id long, text string",
    )


def _neardup_distinct_docs(spark):
    """8 DISTINCT near-identical docs (one word of a 40-word base swapped
    per variant) — high pairwise Jaccard, so their distinct signatures
    co-band heavily. The minhash cap's remaining frontier after the
    round-7 identical-content collapse: content GROUPS sharing a band."""
    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu one two three four five "
        "six seven eight nine ten eleven twelve thirteen fourteen"
    )
    words = base.split()
    rows = [(0, base)]
    for i in range(1, 8):
        w = list(words)
        w[i * 3] = f"variant{i}"
        rows.append((i, " ".join(w)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_identical_docs_can_never_be_dropped(spark):
    """Round 7 structural clique-proofing: identical docs collapse to ONE
    banded representative, so every band bucket they once flooded is a
    singleton — no cap can drop them — and the C(8,2) intra pairs are
    emitted directly at ANY cap (the pre-collapse path dropped all 28 at
    cap=5 and accounted them; now there is nothing to account)."""
    docs = _hot_docs(spark, 8)
    stats = minhash_candidate_stats(docs, cap=5).first()
    assert stats.path == "minhash_lsh"
    assert stats.units == "content_groups"
    assert stats.n_groups == 8  # 8 band buckets, each holding the one rep
    assert stats.max_group == 1
    assert stats.n_capped == 0 and stats.dropped_pairs == 0
    assert minhash_candidates(docs, cap=5).count() == 28
    assert minhash_candidates(docs).count() == 28


def test_minhash_stats_report_distinct_neardup_bucket(spark):
    """The cap frontier that REMAINS after the collapse: distinct
    contents whose signatures share a band. Values are seed-pinned
    (MinHash params seed=42, deterministic xxhash64) — observed once,
    asserted exactly, like the simhash tok-fixture tests."""
    docs = _neardup_distinct_docs(spark)
    stats = minhash_candidate_stats(docs, cap=3).first()
    assert stats.path == "minhash_lsh"
    assert stats.n_groups == 37
    assert stats.n_capped == 8
    assert stats.dropped_rows == 35
    assert stats.dropped_pairs == 60
    assert stats.max_group == 5
    assert minhash_candidates(docs, cap=3).count() == 0  # dropped, accounted
    # production cap covers the corpus: all candidates, zero drops
    ok = minhash_candidate_stats(docs, cap=100).first()
    assert ok.n_capped == 0 and ok.dropped_pairs == 0
    assert minhash_candidates(docs, cap=100).count() == 23


def test_simhash_stats_report_crafted_hot_bucket(spark):
    """8 identical docs are ONE signature clique (identical sigs are
    collapsed before banding), so the cap frontier is the clique itself:
    over-cap -> the clique's 8 docs and C(8,2) pairs are reported
    dropped (simhash_clique row), and the candidate path emits nothing.
    With no other signatures there is no cross-band exposure, so the
    xband and band rows are all-zero."""
    docs = _hot_docs(spark, 8)
    rows = {r.path: r for r in simhash_candidate_stats(docs, cap=5).collect()}
    assert set(rows) == {"simhash_clique", "simhash_clique_xband", "simhash_band"}
    clique = rows["simhash_clique"]
    assert clique.units == "docs"
    assert clique.n_capped == 1  # the 8-doc clique, not 4 band buckets
    assert clique.dropped_rows == 8
    assert clique.dropped_pairs == 28
    assert clique.max_group == 8
    assert rows["simhash_clique_xband"].n_capped == 0
    assert rows["simhash_clique_xband"].dropped_pairs == 0
    assert rows["simhash_band"].n_capped == 0
    assert simhash_candidates(docs, cap=5).count() == 0  # dropped, accounted
    ok = {r.path: r for r in simhash_candidate_stats(docs, cap=100).collect()}
    assert all(r.n_capped == 0 and r.dropped_pairs == 0 for r in ok.values())
    assert simhash_candidates(docs).count() == 28  # production cap covers it


def test_simhash_xband_exposure_of_dropped_clique(spark):
    """The second loss surface of the clique cap (the round-5 audit gap):
    a dropped clique's signature also vanishes from banding, losing its
    band collisions with OTHER signatures. Crafted fixture: single-token
    docs have signature == the token's own hash bits, and the tokens
    'tok0' / 'tok130511' were searched (one-off xxhash64 scan over 200k
    candidate tokens) to share a 16-bit band while having distinct
    signatures. An over-cap 'tok0' clique must surface its collision
    with the surviving 'tok130511' clique in the simhash_clique_xband
    row instead of losing it silently."""
    docs = spark.createDataFrame(
        [(i, "tok0") for i in range(8)]
        + [(100, "tok130511"), (101, "tok130511")],
        "doc_id long, text string",
    )
    rows = {r.path: r for r in simhash_candidate_stats(docs, cap=5).collect()}
    x = rows["simhash_clique_xband"]
    assert x.units == "sig_group_pairs"
    assert x.n_groups == 1 and x.n_capped == 1  # one dropped clique, exposed
    assert x.dropped_pairs == 1  # its (distinct) co-banded signature pair
    assert x.max_group == 1
    # the clique frontier still accounts the intra loss in doc units
    assert rows["simhash_clique"].dropped_rows == 8
    # and the surviving 2-doc clique still emits its Hamming-0 pair
    got = simhash_candidates(docs, cap=5).collect()
    assert {(r.doc_a, r.doc_b) for r in got} == {(100, 101)}


def test_simhash_xband_dropped_dropped_pair_counted_once(spark):
    """Both co-banded cliques over the cap: the (A,B) collision appears
    in both orientations of the over x all join, but it is ONE lost
    signature-group pair — dropped_pairs must canonicalize, while
    n_groups/n_capped still report both cliques as exposed (round-6
    review finding: the ordered-tuple distinct counted it twice)."""
    docs = spark.createDataFrame(
        [(i, "tok0") for i in range(8)]
        + [(100 + i, "tok130511") for i in range(8)],
        "doc_id long, text string",
    )
    rows = {r.path: r for r in simhash_candidate_stats(docs, cap=5).collect()}
    x = rows["simhash_clique_xband"]
    assert x.n_groups == 2 and x.n_capped == 2  # both cliques exposed
    assert x.dropped_pairs == 1  # one unordered signature pair lost
    assert x.max_group == 1
    assert rows["simhash_clique"].n_capped == 2
    assert rows["simhash_clique"].dropped_rows == 16
    assert simhash_candidates(docs, cap=5).count() == 0


def _planted_identical_embeddings(spark, n=10, dim=64):
    vec = [0.5] * dim
    return spark.createDataFrame(
        [(i, vec) for i in range(n)], "vec_id long, embedding array<float>"
    )


def test_embedding_lsh_stats_and_drop_are_consistent(spark):
    emb = _planted_identical_embeddings(spark, 10)
    # cap below the bucket size: every table's single bucket is capped,
    # the operator yields NO pairs — and the stats say exactly that.
    assert embedding_neardup_lsh(emb, cap=5).count() == 0
    stats = embedding_neardup_lsh_stats(emb, cap=5).first()
    assert stats.path == "embedding_lsh"
    assert stats.n_groups == 12  # one bucket per table
    assert stats.n_capped == 12
    assert stats.dropped_rows == 120
    assert stats.dropped_pairs == 12 * 45  # per-table upper bound
    assert stats.max_group == 10
    # production cap: all pairs produced, zero drops reported
    assert embedding_neardup_lsh(emb).count() == 45
    ok = embedding_neardup_lsh_stats(emb).first()
    assert ok.n_capped == 0 and ok.dropped_pairs == 0


def test_semdedup_stats_report_hot_cluster(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    e1 = rng.normal(size=64)
    e2 = rng.normal(size=64)
    rows = [
        (i, [float(x) for x in (e1 + rng.normal(scale=0.01, size=64))])
        for i in range(7)
    ] + [
        (100 + i, [float(x) for x in (e2 + rng.normal(scale=0.01, size=64))])
        for i in range(3)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    stats = semantic_pairs_stats(emb, k=2, cap=4, seed=7).first()
    assert stats.path == "semdedup"
    assert stats.n_groups == 2
    assert stats.n_capped == 1
    assert stats.dropped_rows == 7
    assert stats.dropped_pairs == 21
    assert stats.max_group == 7
    # the capped cluster contributes no pairs; the small one still does
    pairs = semantic_pairs(emb, k=2, cap=4, seed=7).count()
    assert pairs == 3  # C(3,2) within the under-cap cluster
    ok = semantic_pairs_stats(emb, k=2, cap=4000, seed=7).first()
    assert ok.n_capped == 0 and ok.dropped_pairs == 0


def test_registered_audit_query_covers_all_paths(spark, sf_dir):
    from udacity_data_engineering_spark.plans.registry import all_queries

    q = all_queries()["q_neardup_drop_accounting"]
    rows = q.fn(spark, sf_dir).collect()
    assert [r.path for r in rows] == [
        "embedding_lsh",
        "minhash_lsh",
        "semdedup",
        "simhash_band",
        "simhash_clique",
        "simhash_clique_xband",
    ]
    for r in rows:
        assert 0 <= r.n_capped <= max(r.n_groups, 1)
        assert r.dropped_rows >= 0 and r.dropped_pairs >= 0
        if r.path not in ("simhash_clique_xband",):
            # real frontiers over real data are populated; the xband row
            # is zero whenever no clique was dropped (the normal state)
            assert r.n_groups > 0 and r.max_group > 0
            assert r.units in ("docs", "vecs", "sig_groups", "content_groups")


def test_fail_on_drops_enforces_the_contract(spark):
    """fail_on_drops=True converts observable truncation into a raised
    error on every capped path — and stays silent when nothing drops."""
    import numpy as np

    docs = _hot_docs(spark, 8)
    # identical docs can no longer trip the cap (round-7 collapse) —
    # the contract holds silently at ANY cap for them
    assert minhash_candidates(docs, cap=5, fail_on_drops=True).count() == 28
    # the remaining frontier (distinct near-identical contents) still
    # raises when capped, and passes clean at the production cap
    near = _neardup_distinct_docs(spark)
    with pytest.raises(ValueError, match="minhash_candidates.*n_capped"):
        minhash_candidates(near, cap=3, fail_on_drops=True)
    assert minhash_candidates(near, cap=100, fail_on_drops=True).count() == 23

    with pytest.raises(ValueError, match="simhash_candidates.*simhash_clique"):
        simhash_candidates(docs, cap=5, fail_on_drops=True)
    assert simhash_candidates(docs, cap=100, fail_on_drops=True).count() == 28

    emb = _planted_identical_embeddings(spark, 10)
    with pytest.raises(ValueError, match="embedding_neardup_lsh.*n_capped"):
        embedding_neardup_lsh(emb, cap=5, fail_on_drops=True)
    assert embedding_neardup_lsh(emb, fail_on_drops=True).count() == 45

    rng = np.random.default_rng(3)
    e1, e2 = rng.normal(size=64), rng.normal(size=64)
    rows = [
        (i, [float(x) for x in (e1 + rng.normal(scale=0.01, size=64))])
        for i in range(7)
    ] + [
        (100 + i, [float(x) for x in (e2 + rng.normal(scale=0.01, size=64))])
        for i in range(3)
    ]
    hot = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="semantic_pairs.*semdedup"):
        semantic_pairs(hot, k=2, cap=4, seed=7, fail_on_drops=True)
    assert (
        semantic_pairs(hot, k=2, cap=4000, seed=7, fail_on_drops=True).count()
        == 24  # C(7,2) + C(3,2)
    )
