"""k-NN similarity JOIN — batch top-k for MANY query vectors at once
(charter E12 similarity search; the single-query paths are
q_cosine_topk / q_ivf_topk / q_pq_topk).

The naive formulation — crossJoin(queries) then a rank window
partitioned by query — shuffles |corpus| × |queries| rows to |queries|
partitions: at 100 TB with 10 queries that is a 1000 TB shuffle into 10
reducers. The scalable shape here is the classic mergeable-top-k
two-phase plan:

1. **Partial top-k per scan partition** (mapInPandas): the broadcast
   query matrix rides into every task; each Arrow batch computes all
   query similarities as ONE numpy GEMM and a per-batch argpartition
   keeps only the k best rows per query. What leaves the scan is
   O(batches × queries × k) candidate rows — independent of corpus
   size per partition.
2. **Exact merge**: a rank window over the tiny candidate set (at most
   partitions × queries × k rows) picks the global top-k per query.

Top-k under a total order (cos_sim desc, vec_id asc) is mergeable, so
the result is EXACT — identical to the all-pairs oracle — while the
shuffle carries thousands of rows, not the corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from udacity_data_engineering_spark.operators.similarity import spread
from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


def knn_join(
    emb: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-``k`` corpus neighbours for every query vector:
    (query_id, vec_id, cos_sim), ties broken by vec_id. ``queries`` is
    driver-side model-sized data [(query_id, vector), ...] — it rides
    into tasks via the closure (same posture as PQ codebooks); a row
    whose ``vec_id`` equals a query_id is excluded from that query's
    result (self-match). NULL embeddings carry no similarity and are
    skipped."""
    if not queries:
        return emb.sparkSession.createDataFrame(
            [], "query_id long, vec_id long, cos_sim double"
        )
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    qmat = np.array([q[1] for q in queries], dtype=np.float64)
    qunit = qmat / np.maximum(
        np.linalg.norm(qmat, axis=1, keepdims=True), 1e-300
    )

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def partial_topk(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            unit = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-300
            )
            sims = unit @ qunit.T  # (batch_rows, n_queries)
            out_q, out_v, out_s = [], [], []
            for j, qid in enumerate(qids):
                s = sims[:, j].copy()
                s[ids == qid] = -np.inf  # exclude self-match
                # per-batch candidates: k best by (sim desc, vec_id asc).
                # argpartition gives the top-k set in O(n); exact ordering
                # happens in the merge window — only SET membership must
                # be right here, and ties are resolved by taking a few
                # extra rows (k + ties) via a stable lexsort of the set.
                n = len(s)
                take = min(k, n)
                cand = np.argpartition(-s, take - 1)[:take] if n > take else np.arange(n)
                # tie safety: rows outside `cand` with sim equal to the
                # cutoff could beat an in-set row on vec_id; include them
                cut = s[cand].min()
                tied = np.where(s == cut)[0]
                sel = np.unique(np.concatenate([cand, tied]))
                keep = sel[s[sel] > -np.inf]
                out_q.append(np.full(len(keep), qid, dtype=np.int64))
                out_v.append(ids[keep])
                out_s.append(s[keep])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "vec_id": np.concatenate(out_v),
                        "cos_sim": np.concatenate(out_s),
                    }
                )

    cand = (
        spread(emb.filter(F.col(vec_col).isNotNull()))
        .select(id_col, vec_col)
        .mapInPandas(partial_topk, schema)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"))
    )


@register(
    "q_knn_join",
    oracle="""
        WITH q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
            FROM embeddings WHERE vec_id < 5
        ), scored AS (
            SELECT q.query_id, e.vec_id,
                   list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          q.qe) AS s
            FROM embeddings e, q
            WHERE e.vec_id <> q.query_id
        )
        SELECT query_id, vec_id, round(s, 6) AS cos_sim
        FROM (SELECT query_id, vec_id, s,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY s DESC, vec_id) AS rn
              FROM scored) t
        WHERE rn <= 10
    """,
    doc="E12: k-NN similarity JOIN — exact cosine top-10 for the first "
    "5 vectors as a batch of queries, via the scalable two-phase plan "
    "(per-Arrow-batch GEMM + argpartition partial top-k, then an exact "
    "rank-window merge over O(batches x queries x k) candidates — the "
    "corpus is scanned once and never shuffled). Hash-proven: the "
    "DuckDB all-pairs rank oracle produces the identical rows because "
    "mergeable top-k under (sim desc, vec_id) is exact; both sides "
    "normalize in double and round to 6 decimals.",
    tags=("E12", "ann"),
)
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    qrows = (
        emb.filter((F.col("vec_id") < 5) & F.col("embedding").isNotNull())
        .select("vec_id", F.col("embedding").cast("array<double>"))
        .collect()
    )
    queries = [(r[0], list(r[1])) for r in qrows]
    return knn_join(emb, queries, k=10)
