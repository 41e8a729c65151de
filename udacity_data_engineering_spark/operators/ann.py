"""IVF (inverted-file) approximate nearest-neighbour search — the
clustered scale path for E12 similarity search (SURVEY.md §2B), the
partition-pruning complement to the LSH path in ``neardup.py``.

Shape: a one-off k-means build pass assigns every vector to its nearest
centroid (the "inverted lists"); a query then scores only the ``nprobe``
lists whose centroids are nearest to it — scanning nprobe/k of the data
instead of all of it. The centroid table is model *metadata* (k × dim
floats, a few KB) and lives on the driver / in broadcasts; the vectors
themselves never leave executors.

At 100 TB: persist the assignment as a parquet lake partitioned by
``cluster`` — a probe then becomes static partition pruning (only the
probed directories are listed, let alone read), and the per-list scan is
the same codegen'd zip_with/aggregate fold as brute force. Training
reads a sample, not the full corpus; assignment is one embarrassingly
parallel pass.

Vectors are L2-normalized before clustering so euclidean k-means
approximates spherical (cosine) clustering; on unit vectors
``argmin ||x-c||`` == ``argmax cos(x,c)``.

KMeans is seeded but iterative — cluster ids are not oracle-comparable,
so the declared query is rows-only; exactness of the *verification*
stage and recall floors are asserted in tests/test_ann.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.similarity import cosine, l2_norm
from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


def ivf_assign(
    emb: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    seed: int = 7,
    max_iter: int = 8,
):
    """Train seeded k-means on L2-normalized vectors and assign every row
    to its nearest centroid.

    Returns ``(assigned, centers)``: the input plus ``emb_d`` (the
    double-cast vector) and ``cluster`` columns, and the centroid list
    (k × dim Python floats — model metadata, driver-sized by design).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb_d = F.col(vec_col).cast("array<double>")
    unit = F.transform(emb_d, lambda x: x / l2_norm(emb_d))
    # a NULL embedding cannot be clustered — drop it here (KMeans.fit
    # throws on null feature vectors); dedup/ANN semantics over vectors
    # only ever apply to rows that have one
    prepped = (
        emb.filter(F.col(vec_col).isNotNull())
        .withColumn("emb_d", emb_d)
        .withColumn("_features", array_to_vector(unit))
    )
    # empty relation (a partition-pruned-to-nothing input is routine at
    # scale): KMeans.fit throws on zero rows — the correct result is an
    # empty assignment and no centroids, not a crash. isEmpty() is one
    # read-until-first-row job, noise next to fit()'s max_iter full
    # passes; acceptable on the non-empty path too.
    if prepped.isEmpty():
        return prepped.drop("_features").withColumn(
            "cluster", F.lit(0).cast("int")
        ), []
    model = KMeans(
        k=k, seed=seed, maxIter=max_iter, featuresCol="_features",
        predictionCol="cluster",
    ).fit(prepped)
    assigned = model.transform(prepped).drop("_features")
    centers = [[float(x) for x in c] for c in model.clusterCenters()]
    return assigned, centers


def _probe_ids(query_vec: list[float], centers: list[list[float]], nprobe: int) -> list[int]:
    """The nprobe cluster ids whose centroids are most cosine-similar to
    the query. Pure driver-side arithmetic over model metadata."""

    def cos(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return dot / (na * nb) if na and nb else 0.0

    ranked = sorted(range(len(centers)), key=lambda i: -cos(query_vec, centers[i]))
    return ranked[:nprobe]


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k_neighbors: int = 10,
    n_clusters: int = 16,
    # Default operating point picked off the committed recall curve
    # (RECALL.md; same treatment PQ's rerank got in round 6): nprobe=8
    # of 16 lists reads recall@10 0.796 on the uniform-random worst
    # case vs 0.576 at 4, for linearly-proportional scan cost (half the
    # corpus here — at production k (thousands of lists over 100 TB)
    # nprobe/k stays a small fraction and the same curve logic applies:
    # spend on probes until the recall knee).
    nprobe: int = 8,
    exclude_vec_id: int | None = None,
    index: tuple[DataFrame, list[list[float]]] | None = None,
) -> DataFrame:
    """Approximate cosine top-k: score only the nprobe nearest inverted
    lists, exact cosine within them. Result columns match q_cosine_topk
    (vec_id, cos_sim). Pass a prebuilt ``index`` (from ivf_assign) to
    skip training — the production pattern: the index is built once,
    probed per query."""
    assigned, centers = index if index is not None else ivf_assign(emb, k=n_clusters)
    probes = _probe_ids(query_vec, centers, nprobe)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cand = assigned.filter(F.col("cluster").isin(probes))
    if exclude_vec_id is not None:
        cand = cand.filter(F.col("vec_id") != exclude_vec_id)
    return (
        cand.select(
            "vec_id", F.round(cosine(F.col("emb_d"), q), 6).alias("cos_sim")
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(k_neighbors)
    )


#: Built-once IVF indexes, keyed by (Spark application, sf_dir). An IVF
#: index is amortized state by definition — train once, probe per query —
#: so repeated q_ivf_topk calls in one session (bench reps, repeated
#: searches) must not re-run the iterative k-means job. The cached
#: assignment is |corpus| rows of (vec_id, emb_d, cluster). Capped at 2
#: entries (FIFO + unpersist, see pq._evict_put) so storage memory is
#: never pinned unboundedly across sf_dirs.
_IVF_INDEX: dict[tuple[str, str], tuple[DataFrame, list[list[float]]]] = {}


def cached_ivf_index(
    spark: SparkSession, sf_dir: str, emb: DataFrame
) -> tuple[DataFrame, list[list[float]]]:
    """The session's amortized k-means assignment (default k/seed) for
    this sf_dir — built once, shared by every consumer of the clustering
    (IVF probes, semantic dedup)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _IVF_INDEX:
        from udacity_data_engineering_spark.operators.pq import _evict_put

        assigned, centers = ivf_assign(emb)
        _evict_put(_IVF_INDEX, key, (assigned.cache(), centers))
    return _IVF_INDEX[key]


@register(
    "q_ivf_topk",
    doc="E12 scale path: IVF approximate top-10 neighbours of vec_id=0 — "
    "seeded k-means inverted lists (k=16), probe the 8 nearest lists "
    "(the committed recall curve's knee: 0.796 vs 0.576 at 4), "
    "exact cosine verification inside them (~8/16 of the corpus "
    "scanned). The index is built once per (session, sf_dir) and cached "
    "— the query path measures probing, as in production. Iterative "
    "clustering => rows-only; recall vs the brute-force baseline is "
    "asserted in tests/test_ann.py.",
    tags=("E12", "ann"),
)
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    index = cached_ivf_index(spark, sf_dir, emb)
    # the query vector is a parameter of the search, not data — one row
    head = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    # empty/pruned-empty corpus, or the query row exists with a NULL
    # embedding: top-k of nothing either way
    if head is None or head.embedding is None:
        return spark.createDataFrame([], "vec_id long, cos_sim double")
    qvec = [float(x) for x in head.embedding]
    return ivf_topk(emb, qvec, exclude_vec_id=0, index=index)


@register(
    "q_ivf_topk_exhaustive",
    oracle="""
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_emb
                   FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), q_emb), 6)
                   AS cos_sim
        FROM embeddings, q
        WHERE vec_id <> 0
        ORDER BY cos_sim DESC, vec_id
        LIMIT 10
    """,
    doc="E12: the IVF machinery driven at nprobe = n_clusters — every "
    "inverted list probed, so the index path is EXACT by construction and "
    "hash-proves against the brute-force cosine oracle (same SQL as "
    "q_cosine_topk). This is the ANN family's provable leg: it certifies "
    "the whole index pipeline (k-means assignment, probe routing, in-list "
    "exact scoring, top-k) end-to-end; the approximate operating points "
    "(q_ivf_topk nprobe=8, IVF-PQ) inherit that certified machinery and "
    "are covered by committed recall floors instead (RECALL.md, "
    "tests/test_ann.py). Exhaustive probing is a verification knob, not a "
    "production setting — at scale nprobe/k stays a small fraction.",
    tags=("E12", "ann"),
)
def q_ivf_topk_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    index = cached_ivf_index(spark, sf_dir, emb)
    head = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    if head is None or head.embedding is None:
        return spark.createDataFrame([], "vec_id long, cos_sim double")
    qvec = [float(x) for x in head.embedding]
    n_lists = len(index[1])
    return ivf_topk(
        emb, qvec, exclude_vec_id=0, index=index, nprobe=n_lists
    )
