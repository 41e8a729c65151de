"""Connected components + dedup survivor selection — the transitive-
closure step of near-duplicate deduplication (charter: dedup family).

Near-dup pairs form a graph; a dedup pipeline must keep ONE survivor per
connected component (pair-at-a-time removal either under-deletes or
cascades). This module provides:

- ``connected_components``: iterative min-label propagation with
  pointer jumping over a DataFrame edge list. Each iteration is one
  edge join + one min-aggregate (both decomposable, map-side
  combinable) plus one label self-join (the comp := comp(comp) jump);
  lineage is cut per iteration with localCheckpoint. Label reach grows
  exponentially per round, so max_iter=25 covers astronomically long
  chains — round 6 measured the ensemble pair graph at 23 PLAIN rounds
  against that ceiling, which is what motivated the jump — while never
  materializing a neighbor list (no collect_list hot-node blowup).
- ``q_dedup_components``: components over the EXACT Jaccard pair graph,
  value-hash-proven against a DuckDB recursive-CTE transitive closure —
  the hard proof that the iterative algorithm labels every vertex with
  its component minimum. Exact pair generation is the quadratic oracle
  shape, so this query is guarded + tagged oracle_only like
  q_ngram_jaccard.
- ``q_minhash_dedup_survivors``: the 100 TB path — identical-content
  collapse (round 7: structural, not a caller-side ordering
  discipline) -> MinHash-LSH candidates over distinct content ->
  exact-Jaccard verification on candidates only -> components over
  verified pairs plus linear rep—member star edges -> keep the min
  doc_id per component. Deterministic (seeded signatures) but not
  SQL-reproducible -> rows-only; pytest asserts survivor-set equality
  against a union-find ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.guards import oracle_scale_guard
from udacity_data_engineering_spark.operators.similarity import (
    shingle_sets,
    spread,
)
from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table

#: Verification threshold for the survivor pipeline (matches
#: q_neardup_pipeline's confirmed-pair threshold).
NEARDUP_JACCARD = 0.7


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """Label every vertex of the (undirected) edge list with the minimum
    vertex id of its connected component. Returns (id, comp).

    TWO-PHASE alternating-star algorithm (Kiveris, Lattanzi, Mirrokni,
    Rastogi & Vassilvitskii, "Connected Components in MapReduce and
    Beyond", SoCC 2014): each round rewrites the EDGE LIST rather than
    propagating labels —

    - large-star: every edge's larger endpoint reattaches to the
      minimum of the smaller endpoint's closed neighborhood, leaving
      all edges pointing big -> small;
    - small-star: every node then collapses its (all-smaller) neighbor
      set onto that set's minimum, keeping one hook edge itself.

    The round-11 switch from min-label propagation + pointer jumping:
    on the real ensemble pair graph the jump variant measured 19
    rounds / 8.0 s where two-phase measures 6 rounds / 3.7 s with
    byte-identical labels — star collapses shrink the graph itself, so
    both chain reach AND hub fan-in accelerate. Per round: two
    (groupBy-min + join) phases over edge-sized frames, one
    localCheckpoint (lineage cut, the iterative-operator discipline),
    and one (count, sum x, sum y) fingerprint aggregate in
    decimal(38,0) (exact for >10^19 max-long terms — a long sum can
    wrap at extreme scale and fake a fixpoint). The fingerprint is a
    fast-path HEURISTIC only: on a repeat, fixpoint is CONFIRMED by an
    exact two-sided exceptAll emptiness check before the loop exits,
    so a colliding fingerprint can only cost one extra round, never a
    wrong answer. At fixpoint the edge set is a star forest
    (member -> component minimum), which IS the label mapping; vertices
    with no surviving edge (component minima, self-loop-only vertices)
    label themselves. Every step is shuffle-bounded by the edge count;
    no per-vertex neighbor lists are ever collected.

    ``max_iter`` stays a fail-loud ceiling: the paper's O(log^2 n)
    round bound means hitting 25 signals pathological input (measured:
    mixed star/chain ensemble graph 6, a pure 199-edge path 9).
    """
    from udacity_data_engineering_spark.operators.checkpointing import (
        loop_checkpoint,
    )

    # Materialize the raw edge projection ONCE: both the vertex set and
    # the canonical edge set derive from it, and the upstream pipeline
    # that produced the edges (for the survivor paths, the whole
    # candidates+verify DAG) must never execute twice (round-11 bench
    # regression: a second lineage execution doubled q_leakage_safe_split).
    # All cuts in this loop go through loop_checkpoint: local by default,
    # reliable when SPARK_GRAFT_RELIABLE_CHECKPOINT is set (round 16 —
    # cluster fault posture; localCheckpoint blocks are executor-local).
    sym = loop_checkpoint(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b")),
        eager=False,
    )
    # every vertex that appears anywhere must come out labeled, even if
    # star collapses remove all its edges (or it only had self-loops);
    # derived lazily from the materialized sym — edge-sized, cheap
    ids = (
        sym.select("a")
        .union(sym.select(F.col("b").alias("a")))
        .distinct()
        .select(F.col("a").alias("id"))
    )
    # lazy cuts throughout the loop (round-15 optimization): the very
    # next driver action on each frame (isEmpty here, the fingerprint
    # aggregate per round) triggers materialization, so each round
    # schedules ONE job instead of two (eager checkpoint + separate
    # aggregate) — same lineage-cut semantics, half the scheduled jobs
    e = loop_checkpoint(
        sym.filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("x"), F.least("a", "b").alias("y")
        )
        .distinct(),
        eager=False,
    )
    # One aggregate replaces the old isEmpty() gate AND seeds the round-0
    # fingerprint (round 16): an input that is already a star forest now
    # converges one round earlier (its first round's fingerprint can
    # match), and the empty check rides the same job.
    stats0 = e.agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
    ).first()
    prev = (stats0["c"], stats0["sx"], stats0["sy"])
    converged = stats0["c"] == 0
    for _ in range(max_iter):
        if converged:
            break
        bi = e.union(e.select(F.col("y").alias("x"), F.col("x").alias("y")))
        # large-star: m = min over the closed neighborhood of the
        # smaller endpoint; larger endpoints reattach to it
        m1 = bi.groupBy("x").agg(F.min("y").alias("mn")).select(
            "x", F.least("x", "mn").alias("m")
        )
        ls = (
            bi.filter(F.col("y") > F.col("x"))
            .join(m1, "x")
            .select(F.col("y").alias("u"), F.col("m").alias("v"))
        )
        # small-star: all of u's (now all-smaller) neighbors hook onto
        # their minimum; u keeps one edge to it
        m2 = ls.groupBy("u").agg(F.min("v").alias("mn2"))
        nxt = loop_checkpoint(
            ls.join(m2, "u")
            .select(F.col("v").alias("x"), F.col("mn2").alias("y"))
            .union(
                m2.select(F.col("u").alias("x"), F.col("mn2").alias("y"))
            )
            .filter(F.col("x") != F.col("y"))
            .distinct(),
            eager=False,
        )
        stats = nxt.agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
            F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        ).first()
        cur = (stats["c"], stats["sx"], stats["sy"])
        # exact two-sided confirmation in ONE scheduled job (round 16;
        # was two sequential exceptAll().isEmpty() driver actions)
        if (
            cur == prev
            and nxt.exceptAll(e).union(e.exceptAll(nxt)).isEmpty()
        ):
            converged = True
        prev = cur
        e = nxt
    if not converged:
        # Exhausting the loop without a confirmed fixpoint means the
        # star rewrites were still changing the graph — returning the
        # partial state would silently split components
        # (under-deduplication). Two-phase is O(log^2 n) rounds, so the
        # ceiling signals genuinely pathological input, not tuning.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(two-phase alternating-star) — the input graph is "
            "pathological; raise max_iter only after inspecting it"
        )
    # fixpoint edge set is a star forest: (member -> component minimum)
    return ids.join(e, ids["id"] == e["x"], "left").select(
        "id", F.coalesce("y", "id").alias("comp")
    )


def _exact_pairs(spark: SparkSession, sf_dir: str, threshold: float) -> DataFrame:
    """Exact 3-gram-Jaccard pair graph (ground-truth shape, guarded)."""
    docs = oracle_scale_guard(
        table(spark, sf_dir, "documents"),
        "q_dedup_components",
        "q_minhash_dedup_survivors",
    )
    tok = shingle_sets(spread(docs))
    cnt = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = tok.alias("a"), tok.alias("b")
    inter = (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(cnt.selectExpr("doc_id AS doc_a", "n AS na"), "doc_a")
        .join(cnt.selectExpr("doc_id AS doc_b", "n AS nb"), "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b")
    )


@register(
    "q_dedup_components",
    oracle=f"""
        WITH RECURSIVE tok AS (
            SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS w
            FROM (SELECT doc_id, string_split(text, ' ') AS words
                  FROM documents),
                 LATERAL (SELECT unnest(
                     range(1, greatest(len(words) - 2, 0) + 1)) AS i)
        ), cnt AS (
            SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
        ), pair AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
            FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ), edge AS (
            SELECT doc_a AS a, doc_b AS b FROM pair
            JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b
            WHERE i / (ca.n + cb.n - i) >= {NEARDUP_JACCARD}
        ), sym AS (
            SELECT a, b FROM edge UNION SELECT b, a FROM edge
        ), walk(id, comp) AS (
            SELECT a, a FROM sym
            UNION
            SELECT s.a, w.comp FROM sym s JOIN walk w ON s.b = w.id
        )
        SELECT id, min(comp) AS comp FROM walk GROUP BY id
    """,
    doc="Connected components of the exact near-dup pair graph "
    "(3-gram Jaccard >= 0.7): iterative min-label propagation on Spark, "
    "value-hash-proven against a DuckDB recursive-CTE transitive "
    "closure. Guarded oracle shape (exact pair generation is quadratic) "
    "— the scale path is q_minhash_dedup_survivors.",
    tags=("E11", "E12", "dedup", "oracle_only"),
)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _exact_pairs(spark, sf_dir, NEARDUP_JACCARD)
    return connected_components(edges, "doc_a", "doc_b")



def min_id_survivors(
    rows: DataFrame, comp: DataFrame, id_col: str, *keep_cols: str
) -> DataFrame:
    """Shared dedup-decision tail: keep the row whose ``id_col`` equals
    its component's min label; rows in no pair (no component entry)
    survive unconditionally. One place for survivor semantics —
    previously copied verbatim into three modules (round-6 review), so a
    tie-break or column change could silently drift between them. The
    component frame's columns are renamed to collision-proof internals
    first: a caller whose ``rows`` already carry an ``id`` or ``comp``
    column must not flip the filter to the wrong join side (or die with
    an ambiguity error)."""
    c = comp.select(
        F.col("id").alias("__cc_id"), F.col("comp").alias("__cc_comp")
    )
    return (
        rows.join(c, rows[id_col] == c["__cc_id"], "left")
        .filter(
            F.col("__cc_comp").isNull() | (F.col("__cc_comp") == rows[id_col])
        )
        .select(id_col, *keep_cols)
    )


def best_row_survivors(
    rows: DataFrame, comp: DataFrame, id_col: str, *order_cols
) -> DataFrame:
    """Quality-aware dedup decision: ONE survivor per component, chosen
    as the first row under ``order_cols`` (e.g. quality score
    descending) instead of min id — real curation pipelines keep the
    BEST member of a duplicate cluster, not the lowest-numbered one.
    Rows in no component form singleton groups (they survive). One
    row_number window over coalesce(component, own id); returns ``rows``
    (all columns) filtered to survivors."""
    from udacity_data_engineering_spark.operators.dedup import keep_first

    c = comp.select(
        F.col("id").alias("__cc_id"), F.col("comp").alias("__cc_comp")
    )
    joined = rows.join(c, rows[id_col] == c["__cc_id"], "left").withColumn(
        "__grp", F.coalesce(F.col("__cc_comp"), rows[id_col])
    )
    return keep_first(joined, ["__grp"], list(order_cols)).drop(
        "__cc_id", "__cc_comp", "__grp"
    )


@register(
    "q_dedup_best_survivors",
    oracle=f"""
        WITH RECURSIVE tok AS (
            SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS w
            FROM (SELECT doc_id, string_split(text, ' ') AS words
                  FROM documents),
                 LATERAL (SELECT unnest(
                     range(1, greatest(len(words) - 2, 0) + 1)) AS i)
        ), cnt AS (
            SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
        ), pair AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
            FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ), edge AS (
            SELECT doc_a AS a, doc_b AS b FROM pair
            JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b
            WHERE i / (ca.n + cb.n - i) >= {NEARDUP_JACCARD}
        ), sym AS (
            SELECT a, b FROM edge UNION SELECT b, a FROM edge
        ), walk(id, comp) AS (
            SELECT a, a FROM sym
            UNION
            SELECT s.a, w.comp FROM sym s JOIN walk w ON s.b = w.id
        ), lab AS (
            SELECT id, min(comp) AS comp FROM walk GROUP BY id
        ), g AS (
            SELECT d.doc_id,
                   CAST(len(string_split(d.text, ' ')) AS INT) AS n_tokens,
                   COALESCE(lab.comp, d.doc_id) AS grp
            FROM documents d LEFT JOIN lab ON lab.id = d.doc_id
        )
        SELECT doc_id, n_tokens FROM (
            SELECT doc_id, n_tokens,
                   row_number() OVER (PARTITION BY grp
                                      ORDER BY n_tokens DESC, doc_id) AS rn
            FROM g) t
        WHERE rn = 1
    """,
    doc="Quality-aware dedup decision over the exact near-dup pair "
    "graph: per connected component keep the LONGEST member "
    "(n_tokens desc, doc_id tiebreak) — the curation rule real "
    "pipelines use instead of min-id — non-paired docs survive as "
    "singletons. Hash-proven against a DuckDB recursive-CTE transitive "
    "closure + the identical window rule. Guarded oracle shape (exact "
    "pair generation is quadratic); at scale the same "
    "best_row_survivors tail runs after the LSH-verified component "
    "labels.",
    tags=("E11", "E12", "dedup", "oracle_only"),
)
def q_dedup_best_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    edges = _exact_pairs(spark, sf_dir, NEARDUP_JACCARD)
    comp = connected_components(edges, "doc_a", "doc_b")
    scored = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    return best_row_survivors(
        scored, comp, "doc_id", F.col("n_tokens").desc(), F.col("doc_id")
    ).select("doc_id", "n_tokens")


def star_edges(members: DataFrame) -> DataFrame:
    """(doc_a=rep_id, doc_b=member_id) edges linking every duplicate to
    its identical-content representative — the LINEAR stand-in for a
    clique's C(m,2) expanded pairs in any component graph (connectivity
    is identical; two members of one clique meet through the rep).
    Input is a fingerprint_members collapse table."""
    return members.filter(F.col("doc_id") != F.col("rep_id")).select(
        F.col("rep_id").alias("doc_a"), F.col("doc_id").alias("doc_b")
    )


def neardup_survivors(
    docs: DataFrame, threshold: float = NEARDUP_JACCARD
) -> DataFrame:
    """Full scale-path dedup: collapse identical content -> LSH
    candidates over distinct content -> exact verification on candidates
    only -> components over (verified rep pairs ∪ rep—member star
    edges) -> min-doc_id survivor per component. Docs in no verified
    pair and no duplicate clique survive unconditionally.

    Structurally clique-proof end to end (round 7): an all-duplicates
    corpus contributes ONE banded row and m-1 star edges per clique —
    never C(m,2) candidate pairs — so the exact-dedup-first ordering
    the 100× probe proved necessary (SCALE.md: 330.8 s raw vs 14.0 s
    composed) is now built in, not a caller discipline. Survivor sets
    are unchanged: clique members shared a component before (identical
    text ⇒ Jaccard 1.0 pairs) and still do (via the star)."""
    from udacity_data_engineering_spark.operators.similarity import (
        content_reps,
        fingerprint_members,
        rep_verified_pairs,
    )

    members = fingerprint_members(docs).localCheckpoint()
    reps = content_reps(docs, members)
    verified = rep_verified_pairs(reps, threshold).select("doc_a", "doc_b")
    comp = connected_components(
        verified.unionAll(star_edges(members)), "doc_a", "doc_b"
    )
    return min_id_survivors(docs, comp, "doc_id", "lang", "source")


@register(
    "q_minhash_dedup_survivors",
    doc="End-to-end near-dup dedup at the 100 TB shape: identical-"
    "content collapse first (structurally clique-proof), MinHash-LSH "
    "candidates over distinct content (O(groups x bands) shuffle), "
    "exact Jaccard verification on candidates only, connected "
    "components over verified pairs + linear rep-member star edges, "
    "keep min doc_id per component. Deterministic seeded signatures "
    "but not SQL-reproducible -> rows-only; tests assert survivor-set "
    "equality vs a union-find over the exact pair graph.",
    tags=("E11", "E12", "dedup"),
)
def q_minhash_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return neardup_survivors(table(spark, sf_dir, "documents"))
