"""Lloyd's k-means training as a first-class distributed operator
(Lloyd, "Least squares quantization in PCM", IEEE Trans. IT 1982).

IVF (ann.py) and SemDeDup (semdedup.py) both cluster internally; this
module promotes the trainer itself to the public surface — the
embedding-curation primitive behind cluster-balanced sampling, SemDeDup
bucketing, and IVF index builds.

Scale shape (the PQ-codebook posture, pq.py): the MODEL (k × dim
centroid matrix) is bounded driver-side state, collected once per
round; the DATA only ever streams through Arrow-batched assignment —
one broadcast-centroid GEMM-style pass per round, no shuffle — and the
centroid update is one JVM-side posexplode + partial-agg groupBy on
(cluster, dim): k·dim cells regardless of corpus size. Rounds are
FIXED (deterministic init = the k lowest-id vectors), which makes the
whole training run hash-provable: the DuckDB oracle replays every
assign→update round as unrolled chained CTEs.

Parity discipline: all arithmetic in float64 after one explicit cast
from the stored float32; the assignment distance is the same
sqrt-of-squared-differences formula DuckDB's list_distance computes
(NOT the |x|²−2xc+|c|² expansion, whose fp error profile differs);
argmin tie-breaks to the lowest centroid id on both sides (numpy
argmin-first == row_number ORDER BY dist, cid). The returned
assignment is integer-only — no float crosses the serialization
boundary. Empty clusters keep their previous centroid on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table

KMEANS_K = 8
KMEANS_ITERS = 4


def _assign_fn(centers, id_col: str, vec_col: str):
    """Arrow-batched nearest-centroid assignment: per batch one
    (rows × k × dim) difference + reduce in float64. Ties take the
    lowest centroid id (numpy argmin returns the first minimum)."""
    import numpy as np

    C = np.asarray(centers, dtype=np.float64)

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({id_col: [], "cluster": []})
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            d = np.sqrt(((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "cluster": d.argmin(axis=1).astype("int32")}
            )

    return fn


def kmeans_train(
    emb: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """Train k-means for a fixed number of Lloyd rounds and return
    (assignments, final_centroids). Assignments: (id_col, cluster int).

    Deterministic init: the k lowest-id vectors. Per round, the k × dim
    centroid model is collected to the driver (bounded model state, the
    pq.py codebook posture) and broadcast into an Arrow-batched
    assignment pass; the update is a JVM-side posexplode + groupBy
    (cluster, dim) partial aggregate — k·dim result cells, corpus-sized
    scan, no corpus shuffle beyond the k·dim aggregation."""
    # null embeddings cannot be clustered and would crash the Arrow
    # kernel's np.stack (the round-5 null-input class, re-found by the
    # round-11 nulls probe) — drop them, matching every other embedding
    # consumer (knn/ann/semdedup)
    e = (
        emb.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias(id_col),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .localCheckpoint()
    )

    init_rows = e.orderBy(id_col).limit(k).collect()
    centers = [list(r.v) for r in init_rows]

    schema = f"{id_col} long, cluster int"
    if not centers:  # empty corpus: typed empty assignment, no rounds
        return e.sparkSession.createDataFrame([], schema), centers
    assigned = None
    for _ in range(iters):
        assigned = e.mapInPandas(_assign_fn(centers, id_col, "v"), schema)
        means = (
            assigned.join(e, id_col)
            .select("cluster", F.posexplode("v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("mval"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(r.cluster, {})[r.pos] = r.mval
        centers = [
            [vals[p] for p in sorted(vals)] if (vals := by_cluster.get(c)) else centers[c]
            for c in range(len(centers))  # < k when the corpus has < k vectors
        ]
    return assigned, centers


def _kmeans_oracle(k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> str:
    """Unrolled Lloyd rounds as chained CTEs — assign (row_number over
    list_distance, tie-break cid) then update (elementwise avg via
    unnest + generate_subscripts, list(ORDER BY idx)); empty clusters
    carry the previous centroid via the left-join coalesce."""
    head = f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            WHERE embedding IS NOT NULL
        ), c0 AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, v
            FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {k})
        )"""
    rounds = []
    for i in range(1, iters + 1):
        p = i - 1
        rounds.append(
            f""", a{i} AS (
            SELECT vec_id, cid FROM (
                SELECT e.vec_id, c.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY list_distance(e.v, c.v), c.cid
                       ) AS rn
                FROM e CROSS JOIN c{p} c
            ) WHERE rn = 1
        ), m{i} AS (
            SELECT cid, list(mval ORDER BY idx) AS v FROM (
                SELECT cid, idx, avg(val) AS mval FROM (
                    SELECT a.cid, generate_subscripts(e.v, 1) AS idx,
                           unnest(e.v) AS val
                    FROM a{i} a JOIN e USING (vec_id)
                ) GROUP BY cid, idx
            ) GROUP BY cid
        ), c{i} AS (
            SELECT p.cid, coalesce(m.v, p.v) AS v
            FROM c{p} p LEFT JOIN m{i} m USING (cid)
        )"""
        )
    tail = f"""
        SELECT vec_id, cluster FROM (
            SELECT vec_id, cid AS cluster FROM a{iters}
        ) ORDER BY vec_id"""
    return head + "".join(rounds) + tail


@register(
    "q_kmeans_train",
    oracle=_kmeans_oracle(),
    doc=f"Lloyd's k-means training (k={KMEANS_K}, {KMEANS_ITERS} fixed "
    "rounds, deterministic lowest-id init) over the embeddings table; "
    "returns the final integer assignment (vec_id, cluster). Per round: "
    "broadcast k×dim centroids into an Arrow-batched float64 assignment "
    "pass (no shuffle), update via posexplode + (cluster, dim) partial "
    "agg — k·dim cells. Hash-proven: the DuckDB oracle replays every "
    "round as unrolled CTEs (list_distance + row_number tie-break = "
    "numpy argmin-first; empty clusters keep their centroid).",
    tags=("E12", "embeddings", "llm-pipeline"),
)
def q_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    assigned, _ = kmeans_train(emb)
    return assigned.orderBy("vec_id")


def kmeans_assign(
    batch: DataFrame,
    centers: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign a NEW batch of vectors to FROZEN centroids — the
    incremental leg of the clustering family (the nd-lake posture:
    train once on the corpus, classify each day's batch without
    re-running Lloyd). One Arrow-batched map pass, no shuffle, model
    broadcast as a task-closure constant; ties take the lowest
    centroid id, identical to training-time assignment."""
    e = batch.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    if not centers:
        return e.sparkSession.createDataFrame([], f"{id_col} long, cluster int")
    return e.mapInPandas(
        _assign_fn(centers, id_col, "v"), f"{id_col} long, cluster int"
    )


def _kmeans_assign_oracle(k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> str:
    """Train on the even-id half (unrolled Lloyd rounds, as in
    _kmeans_oracle), then argmin-assign the odd-id batch against the
    FINAL centroids."""
    head = f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            WHERE vec_id % 2 = 0 AND embedding IS NOT NULL
        ), c0 AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, v
            FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {k})
        )"""
    rounds = []
    for i in range(1, iters + 1):
        p = i - 1
        rounds.append(
            f""", a{i} AS (
            SELECT vec_id, cid FROM (
                SELECT e.vec_id, c.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY list_distance(e.v, c.v), c.cid
                       ) AS rn
                FROM e CROSS JOIN c{p} c
            ) WHERE rn = 1
        ), m{i} AS (
            SELECT cid, list(mval ORDER BY idx) AS v FROM (
                SELECT cid, idx, avg(val) AS mval FROM (
                    SELECT a.cid, generate_subscripts(e.v, 1) AS idx,
                           unnest(e.v) AS val
                    FROM a{i} a JOIN e USING (vec_id)
                ) GROUP BY cid, idx
            ) GROUP BY cid
        ), c{i} AS (
            SELECT p.cid, coalesce(m.v, p.v) AS v
            FROM c{p} p LEFT JOIN m{i} m USING (cid)
        )"""
        )
    tail = f""", batch AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            WHERE vec_id % 2 = 1 AND embedding IS NOT NULL
        )
        SELECT vec_id, cluster FROM (
            SELECT b.vec_id, c.cid AS cluster,
                   row_number() OVER (
                       PARTITION BY b.vec_id
                       ORDER BY list_distance(b.v, c.v), c.cid
                   ) AS rn
            FROM batch b CROSS JOIN c{iters} c
        ) WHERE rn = 1
        ORDER BY vec_id"""
    return head + "".join(rounds) + tail


@register(
    "q_kmeans_assign_new",
    oracle=_kmeans_assign_oracle(),
    doc="Incremental clustering: train Lloyd's on the even-id half of "
    "the embeddings (the lake), then assign the odd-id half (the new "
    "batch) to the FROZEN final centroids — one Arrow map pass over "
    "the batch, no shuffle, no re-training. The daily-crawl cadence "
    "for every centroid consumer (IVF lists, SemDeDup clusters). "
    "Hash-proven: the oracle replays training as unrolled CTEs and "
    "argmin-assigns the batch against the final centroids.",
    tags=("E12", "embeddings", "llm-pipeline"),
)
def q_kmeans_assign_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    _, centers = kmeans_train(emb.filter(F.col("vec_id") % 2 == 0))
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    return kmeans_assign(batch, centers).orderBy("vec_id")


def kmeans_update(
    batch: DataFrame,
    centers: list[list[float]],
    counts: dict[int, int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Count-weighted mini-batch centroid REFRESH — the third leg of the
    clustering family (train once / assign each batch / update the model
    on a schedule, never re-running Lloyd over the lake):

        new_c = (n_c * old_c + sum(batch members of c)) / (n_c + m_c)

    ``counts`` carries the per-center lake sizes n_c (from the lake's
    assignment under the current model); a center that receives no batch
    members keeps its value, so the update is a no-op on empty batches.
    This is exactly the sufficient-statistics form of streaming k-means
    (the sum and count per center are additive across batches).

    Cost: one Arrow assignment pass over the BATCH + one (cluster, dim)
    partial aggregate — k x dim result cells, the driver-sized model
    posture shared with training; the lake is never rescanned. Returns
    the updated centers (driver-side model, like ``kmeans_train``).
    """
    assigned = kmeans_assign(batch, centers, id_col=id_col, vec_col=vec_col)
    e = batch.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    cells = (
        assigned.join(e, id_col)
        .select("cluster", F.posexplode("v").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("m"))
        .collect()
    )
    by_cluster: dict[int, dict[int, tuple[float, int]]] = {}
    for r in cells:
        by_cluster.setdefault(r.cluster, {})[r.pos] = (r.s, r.m)
    out = []
    for c, old in enumerate(centers):
        cell = by_cluster.get(c)
        n = counts.get(c, 0)
        if not cell:
            out.append(list(old))
            continue
        out.append(
            [
                (n * old[p] + cell[p][0]) / (n + cell[p][1])
                for p in range(len(old))
            ]
        )
    return out


def _kmeans_update_oracle(k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> str:
    """Training replay (the _kmeans_assign_oracle head), then the
    count-weighted update arithmetic over the odd-id batch."""
    head = _kmeans_assign_oracle(k, iters)
    # reuse everything up to (not including) the final SELECT
    head = head[: head.index(", batch AS (")]
    tail = f""", lakeassign AS (
            SELECT vec_id, cid FROM (
                SELECT e.vec_id, c.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY list_distance(e.v, c.v), c.cid
                       ) AS rn
                FROM e CROSS JOIN c{iters} c
            ) WHERE rn = 1
        ), ncnt AS (
            SELECT cid, count(*) AS n FROM lakeassign GROUP BY cid
        ), batch AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            WHERE vec_id % 2 = 1 AND embedding IS NOT NULL
        ), bassign AS (
            SELECT vec_id, cid FROM (
                SELECT b.vec_id, c.cid,
                       row_number() OVER (
                           PARTITION BY b.vec_id
                           ORDER BY list_distance(b.v, c.v), c.cid
                       ) AS rn
                FROM batch b CROSS JOIN c{iters} c
            ) WHERE rn = 1
        ), bsum AS (
            SELECT cid, idx, sum(val) AS s, count(*) AS m FROM (
                SELECT a.cid, generate_subscripts(b.v, 1) AS idx,
                       unnest(b.v) AS val
                FROM bassign a JOIN batch b USING (vec_id)
            ) GROUP BY cid, idx
        ), oldc AS (
            SELECT cid, generate_subscripts(v, 1) AS idx, unnest(v) AS val
            FROM c{iters}
        )
        SELECT o.cid AS cluster, CAST(o.idx - 1 AS INT) AS pos,
               round(CASE
                   WHEN b.s IS NULL THEN o.val
                   ELSE (coalesce(n.n, 0) * o.val + b.s)
                        / (coalesce(n.n, 0) + b.m)
               END, 6) AS centroid
        FROM oldc o
        LEFT JOIN ncnt n ON n.cid = o.cid
        LEFT JOIN bsum b ON b.cid = o.cid AND b.idx = o.idx
        ORDER BY cluster, pos"""
    return head + tail


@register(
    "q_kmeans_update",
    oracle=_kmeans_update_oracle(),
    doc="Mini-batch centroid REFRESH: train Lloyd's on the even-id half "
    "(the lake), take the lake's per-center sizes under the final model, "
    "then fold the odd-id batch in with the count-weighted streaming "
    "update new_c = (n_c*old_c + sum(batch_c)) / (n_c + m_c) — the "
    "model-maintenance cadence that keeps IVF lists / SemDeDup clusters "
    "current without ever re-running Lloyd over the lake. Sufficient "
    "statistics are additive, so batches fold in any grouping. "
    "Hash-proven end to end: the oracle replays training as unrolled "
    "CTEs and recomputes the same update arithmetic.",
    tags=("E12", "embeddings", "llm-pipeline"),
)
def q_kmeans_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    lake = emb.filter(F.col("vec_id") % 2 == 0)
    _, centers = kmeans_train(lake)
    if not centers:
        return spark.createDataFrame(
            [], "cluster int, pos int, centroid double"
        )
    lake_sizes = {
        r.cluster: r.n
        for r in kmeans_assign(lake, centers)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    updated = kmeans_update(batch, centers, lake_sizes)
    rows = [
        (c, p, v)
        for c, vec in enumerate(updated)
        for p, v in enumerate(vec)
    ]
    return spark.createDataFrame(
        rows, "cluster int, pos int, centroid double"
    ).select("cluster", "pos", F.round("centroid", 6).alias("centroid"))
