"""Recall floors for the approximate paths that had none (RECALL.md
records the measured sf0.1 numbers; these pin them with slack at test
scale so a regression fails pytest, not a production run).

Existing floors elsewhere: minhash planted pairs (test_similarity.py),
embedding-LSH planted + measured >=0.6 (test_neardup.py), IVF / PQ
top-10 overlap >=5 (test_ann.py / test_pq.py).
"""

from __future__ import annotations

from udacity_data_engineering_spark.operators.neardup import (
    exact_hamming_pairs,
    simhash_candidates,
)
from udacity_data_engineering_spark.operators.semdedup import semantic_pairs
from udacity_data_engineering_spark.plans.registry import all_queries
from udacity_data_engineering_spark.session import table


def test_simhash_recall_is_exactly_one(spark, sf_dir):
    """Pigeonhole guarantee: 4 bands, Hamming<=3 => one identical band,
    so with the band-keyspace-sized production cap every true pair is a
    candidate — recall is an EQUALITY, not a floor. (With the old
    minhash-sized cap of 100 this was 0.081 at sf0.1 — the measured
    silent-cap loss that drop accounting now reports; see RECALL.md.)"""
    docs = table(spark, sf_dir, "documents")
    truth = exact_hamming_pairs(docs)
    got = {(r.doc_a, r.doc_b) for r in simhash_candidates(docs).collect()}
    assert truth, "degenerate fixture: no Hamming<=3 pairs"
    assert got == truth  # exhaustive AND exact (verified Hamming)


def test_semdedup_pair_recall_floor(spark, sf_dir):
    """SemDeDup misses cross-cluster pairs by design; on uniform-random
    embeddings (its worst case — no real cluster structure) the within-
    cluster share of cosine>=0.4 pairs still stays above this floor.
    Seeds pinned (k-means seed=7), so the measured value is stable for
    a given testdata vintage: 0.333 at sf0.001 (round 5)."""
    emb = table(spark, sf_dir, "embeddings")
    truth = {
        (r.vec_a, r.vec_b)
        for r in all_queries()["q_embedding_neardup"].fn(spark, sf_dir).collect()
    }
    got = {(r.vec_a, r.vec_b) for r in semantic_pairs(emb).collect()}
    assert got <= truth  # within-cluster pairs are exact-cosine verified
    recall = len(got & truth) / len(truth)
    assert recall >= 0.2, f"semdedup pair recall {recall:.3f} below floor"


def test_ensemble_recall_dominates_every_leg(spark, sf_dir):
    """The ensemble's pair set is a superset of each leg's, so its
    semantic recall vs the cosine>=0.4 truth must dominate both the
    embedding-LSH and SemDeDup legs (the round-5 coverage hole: SemDeDup
    standalone reads 0.300 and nothing pointed users at the union) —
    and every semantically-surfaced pair is exact-verified, so the
    semantic side ships precision 1.0 against the truth set."""
    from udacity_data_engineering_spark.operators.ensemble import (
        neardup_ensemble,
    )
    from udacity_data_engineering_spark.operators.neardup import (
        embedding_neardup_lsh,
    )

    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    truth = {
        (r.vec_a, r.vec_b)
        for r in all_queries()["q_embedding_neardup"].fn(spark, sf_dir).collect()
    }
    ens = neardup_ensemble(docs, emb).collect()
    got_sem = {(r.doc_a, r.doc_b) for r in ens if r.cos_sim is not None}
    lsh = {
        (r.vec_a, r.vec_b) for r in embedding_neardup_lsh(emb).collect()
    }
    sem = {(r.vec_a, r.vec_b) for r in semantic_pairs(emb).collect()}

    assert got_sem <= truth  # exact-verified: precision 1.0
    assert got_sem >= lsh and got_sem >= sem  # union dominates each leg
    recall = len(got_sem & truth) / len(truth)
    lsh_recall = len(lsh & truth) / len(truth)
    assert recall >= max(lsh_recall, 0.6), (
        f"ensemble semantic recall {recall:.3f} below best leg"
    )
    # the lexical leg rides along with its own exact verification
    lex = {(r.doc_a, r.doc_b) for r in ens if r.jaccard is not None}
    assert lex, "lexical leg empty on fixture data"


def test_ensemble_leg_knobs(spark, sf_dir):
    """Round-7 knobs: a text-only corpus runs the lexical leg alone
    (embeddings=None) through both the pair union and the survivor
    decision; disabling every leg, or enabling an embedding leg without
    an embeddings frame, fails loudly."""
    import pytest

    from udacity_data_engineering_spark.operators.ensemble import (
        ensemble_survivors,
        neardup_ensemble,
    )

    docs = table(spark, sf_dir, "documents")
    lex_only = neardup_ensemble(
        docs, None, embedding_lsh=False, semdedup=False
    ).collect()
    assert lex_only
    assert all(r.methods == "minhash_jaccard" for r in lex_only)
    assert all(r.cos_sim is None for r in lex_only)
    surv = ensemble_survivors(
        docs, None, embedding_lsh=False, semdedup=False
    )
    assert 0 < surv.count() <= docs.count()
    with pytest.raises(ValueError, match="every leg is disabled"):
        neardup_ensemble(
            docs, None, lexical=False, embedding_lsh=False, semdedup=False
        )
    with pytest.raises(ValueError, match="no embeddings"):
        neardup_ensemble(docs, None)
    # embeddings-only corpus: semantic legs alone
    emb = table(spark, sf_dir, "embeddings")
    emb_only = neardup_ensemble(None, emb, lexical=False).collect()
    assert emb_only and all(r.jaccard is None for r in emb_only)
    with pytest.raises(ValueError, match="no documents"):
        neardup_ensemble(None, emb)


def test_ensemble_survivors_partition_the_corpus(spark, sf_dir):
    """The ensemble dedup decision: survivors = one min-id doc per
    component of the union pair graph, every non-paired doc kept. The
    survivor count must equal n_docs - (paired docs - components), and
    every pair in the ensemble must have at most one surviving end
    UNLESS the two ends sit in different components (impossible by
    construction — so: no surviving pair at all)."""
    from udacity_data_engineering_spark.operators.ensemble import (
        ensemble_survivors,
        neardup_ensemble,
    )

    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    pairs = {
        (r.doc_a, r.doc_b) for r in neardup_ensemble(docs, emb).collect()
    }
    survivors = {r.doc_id for r in ensemble_survivors(docs, emb).collect()}
    n_docs = docs.count()

    # union-find ground truth over the collected pair set
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    paired = set(parent)
    comps = {find(x) for x in paired}
    assert len(survivors) == n_docs - len(paired) + len(comps)
    # no verified pair survives intact
    assert not any(a in survivors and b in survivors for a, b in pairs)
    # the survivor of each component is its min id
    assert comps <= survivors
