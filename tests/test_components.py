"""Connected components + survivor selection: algorithmic ground truth
via union-find, chain topologies (worst case for label propagation), and
survivor-set equality for the full minhash dedup pipeline."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.components import (
    NEARDUP_JACCARD,
    connected_components,
    neardup_survivors,
)
from udacity_data_engineering_spark.session import table


class UnionFind:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def _min_labels(edges):
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    # min vertex id per component
    comp_min = {}
    for v in list(uf.p):
        r = uf.find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return {v: comp_min[uf.find(v)] for v in uf.p}


def test_components_on_chain_and_forest(spark):
    """A 40-node path graph (diameter 39 — the label-propagation worst
    case) plus disjoint stars and singleton pairs."""
    edges = [(i, i + 1) for i in range(100, 140)]          # long chain
    edges += [(500, x) for x in (501, 502, 503)]           # star
    edges += [(900, 901)]                                  # pair
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.comp for r in connected_components(df, max_iter=50).collect()}
    assert got == _min_labels(edges)


def test_components_raise_instead_of_wrong_labels(spark):
    """Exhausting max_iter before the fixpoint must raise — returning
    half-propagated labels silently splits components (keeps multiple
    'survivors' from one duplicate cluster)."""
    import pytest

    edges = [(i, i + 1) for i in range(100, 140)]  # diameter 39
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=5)


def test_components_match_union_find_on_corpus(spark, sf_dir):
    """The registered exact-pair components equal union-find over the
    same pair set."""
    from udacity_data_engineering_spark.plans.registry import all_queries

    edges_df = all_queries()["q_ngram_jaccard"].fn(spark, sf_dir)
    edges = [(r.doc_a, r.doc_b) for r in edges_df.collect()]
    got = {
        r.id: r.comp
        for r in all_queries()["q_dedup_components"].fn(spark, sf_dir).collect()
    }
    # the registered query uses jaccard >= 0.7; q_ngram_jaccard >= 0.5 —
    # recompute ground truth from the 0.7-filtered subset
    strong = [
        (r.doc_a, r.doc_b) for r in edges_df.filter(F.col("jaccard") >= NEARDUP_JACCARD).collect()
    ]
    assert got == _min_labels(strong), (len(got), len(_min_labels(strong)))
    assert edges  # sanity: corpus does contain near-dup pairs


def test_minhash_survivors_equal_exact_survivors(spark, sf_dir):
    """Scale-path survivors == survivors computed from the exact pair
    graph (LSH recall is 100% on the planted near-dups of this corpus)."""
    from udacity_data_engineering_spark.plans.registry import all_queries

    docs = table(spark, sf_dir, "documents")
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    exact = [
        (r.doc_a, r.doc_b)
        for r in all_queries()["q_ngram_jaccard"]
        .fn(spark, sf_dir)
        .filter(F.col("jaccard") >= NEARDUP_JACCARD)
        .collect()
    ]
    labels = _min_labels(exact)
    expect = {v for v in all_ids if v not in labels or labels[v] == v}
    got = {r.doc_id for r in neardup_survivors(docs).collect()}
    assert got == expect


def test_best_row_survivors_keeps_quality_not_min_id(spark):
    """Quality-aware survivor rule: highest quality wins its component
    (NOT the min id), ties break on id, unpaired rows survive."""
    from pyspark.sql import functions as F

    from udacity_data_engineering_spark.operators.components import (
        best_row_survivors,
    )

    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3)], "id long, comp long"
    )
    rows = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 7), (4, 7), (9, 1)], "doc_id long, q int"
    )
    got = {
        r.doc_id
        for r in best_row_survivors(
            rows, comp, "doc_id", F.col("q").desc(), F.col("doc_id")
        ).collect()
    }
    assert got == {2, 3, 9}


def test_components_convergence_sum_is_overflow_proof(spark):
    """Vertex ids near 2^62: a plain long SUM of six labels already
    exceeds max-long mid-aggregation (ANSI mode would abort the round;
    legacy mode could in principle wrap successive sums onto equal
    values and declare a false fixpoint). The decimal(38,0) convergence
    sum (components.py round-7 hardening) handles them exactly."""
    base = 1 << 62
    edges = [(base + i, base + i + 1) for i in range(5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.comp for r in connected_components(df).collect()}
    assert got == {base + i: base for i in range(6)}


def test_simhash_survivors_equal_exact_survivors(spark, sf_dir):
    """SimHash decision path == union-find over the exact all-pairs
    Hamming<=3 ground truth (pigeonhole recall is exactly 1.0 at the
    production cap, and every candidate is Hamming-verified, so the
    group graph's connectivity equals the truth graph's)."""
    from udacity_data_engineering_spark.operators.neardup import (
        exact_hamming_pairs,
        simhash_survivors,
    )

    docs = table(spark, sf_dir, "documents")
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    labels = _min_labels(list(exact_hamming_pairs(docs)))
    expect = {v for v in all_ids if v not in labels or labels[v] == v}
    got = {
        r.doc_id
        for r in simhash_survivors(
            docs, "doc_id", "text", 3, 5000, "lang"
        ).collect()
    }
    assert got == expect


def test_long_chain_converges_fast_via_pointer_jumping(spark):
    """A 200-vertex path graph has diameter 199 — pure min-label
    propagation needs ~199 rounds and would trip the max_iter=25
    fail-loud; pointer jumping converges it in O(log d). All vertices
    must label to the chain's minimum."""
    from udacity_data_engineering_spark.operators.components import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "src long, dst long"
    )
    got = connected_components(edges, "src", "dst")  # default max_iter=25
    rows = got.collect()
    assert len(rows) == 200
    assert {r.comp for r in rows} == {0}


def test_reliable_checkpoint_flag_cuts_via_checkpoint_dir(
    spark, tmp_path, monkeypatch
):
    """SPARK_GRAFT_RELIABLE_CHECKPOINT switches the loop lineage cuts
    from executor-local localCheckpoint blocks to reliable checkpoints
    in the named directory (cluster fault posture, round 16): the loop
    must still converge to the same labels AND the checkpoint directory
    must actually receive data."""
    import os

    from udacity_data_engineering_spark.operators.checkpointing import (
        RELIABLE_CHECKPOINT_ENV,
    )

    ckpt = str(tmp_path / "reliable_ckpt")
    monkeypatch.setenv(RELIABLE_CHECKPOINT_ENV, ckpt)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (5, 5)], "src long, dst long"
    )
    got = {
        (r.id, r.comp)
        for r in connected_components(edges, "src", "dst").collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (5, 5)}
    # the reliable path really went through the checkpoint dir
    written = [
        os.path.join(dp, f)
        for dp, _dn, fn in os.walk(ckpt)
        for f in fn
    ]
    assert written, "no checkpoint data written to the reliable dir"
