"""Embedding-column operators beyond search: pooled centroids and
compression (int8 quantization) — the vector housekeeping a 100 TB
multimodal/embedding lake needs alongside ANN (ann.py / pq.py) and
near-dup (neardup.py / semdedup.py).

Scale notes:

- **Centroid pooling** is posexplode + hash aggregate: the shuffle
  carries (group, dim) partial sums — |groups| x d rows — never the
  vectors themselves twice. This is how per-cluster / per-label mean
  embeddings (classifier prototypes, cluster summaries, SemDeDup
  centroids) are computed without collecting vectors.
- **Int8 quantization** is a per-row map (one codegen'd higher-order
  fold for the scale, one for the error) — embarrassingly parallel,
  no shuffle, 4x storage reduction with measured reconstruction error.
  The same shape writes the quantized corpus; the query surface reports
  per-vector scale + error so the compression loss is auditable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


def group_centroids(
    emb: DataFrame, group_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-group mean embedding, flattened to (group, pos, centroid)
    rows. posexplode + partial-aggregating groupBy: vectors are read
    once, the shuffle is |groups| x d partial sums."""
    e = F.col(vec_col).cast("array<double>")
    return (
        emb.select(F.col(group_col), F.posexplode(e).alias("pos", "val"))
        .groupBy(group_col, "pos")
        .agg(F.round(F.avg("val"), 6).alias("centroid"))
    )


@register(
    "q_cluster_centroids",
    oracle="""
        SELECT label, pos - 1 AS pos, round(avg(val), 6) AS centroid
        FROM (
            SELECT label,
                   generate_subscripts(embedding, 1) AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS val
            FROM embeddings
        )
        GROUP BY label, pos - 1
    """,
    doc="Per-label mean embedding (classifier prototype / cluster "
    "centroid pooling): posexplode + map-side-combining hash aggregate. "
    "Shuffle volume is |labels| x dim partial sums, independent of row "
    "count — the scale-correct way to pool vectors (never collect, "
    "never re-read). Spark posexplode is 0-based; the oracle shifts "
    "DuckDB's 1-based subscripts.",
    tags=("E12", "llm-pipeline", "embeddings"),
)
def q_cluster_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return group_centroids(table(spark, sf_dir, "embeddings"))


def _absmax(e: Column) -> Column:
    return F.aggregate(
        e, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )


def quantize_error(
    emb: DataFrame, vec_col: str = "embedding", bits: int = 8
) -> DataFrame:
    """Symmetric per-vector int quantization audit: scale = absmax/qmax,
    mean |x - round(x/scale)*scale| reconstruction error. Two codegen'd
    folds per row, no shuffle, no Python."""
    qmax = (1 << (bits - 1)) - 1
    e = F.col(vec_col).cast("array<double>")
    scale = _absmax(e) / F.lit(float(qmax))
    err_sum = F.aggregate(
        e,
        F.lit(0.0),
        lambda acc, x: acc
        + F.abs(x - F.round(x / F.col("scale")) * F.col("scale")),
    )
    return (
        emb.withColumn("scale", scale)
        .withColumn(
            "mean_abs_err", F.round(err_sum / F.size(e), 9)
        )
        .withColumn("scale", F.round("scale", 9))
    )


@register(
    "q_embedding_quantize",
    oracle="""
        SELECT vec_id,
               round(scale, 9) AS scale,
               round(list_sum(list_transform(e,
                     x -> abs(x - round(x / scale) * scale))) / len(e), 9)
                   AS mean_abs_err
        FROM (
            SELECT vec_id,
                   CAST(embedding AS DOUBLE[]) AS e,
                   list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                           x -> abs(x))) / 127 AS scale
            FROM embeddings
        )
    """,
    doc="Int8 symmetric quantization audit: per-vector scale "
    "(absmax/127) and mean absolute reconstruction error — the 4x "
    "storage-reduction decision data. Two higher-order folds inside "
    "codegen per row; embarrassingly parallel, zero shuffle.",
    tags=("E12", "llm-pipeline", "embeddings"),
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quantize_error(table(spark, sf_dir, "embeddings")).select(
        "vec_id", "scale", "mean_abs_err"
    )


# --------------------------------------------------------------------------
# Johnson–Lindenstrauss random projection — deterministic dimensionality
# reduction for the embedding lake. A Rademacher (+-1) projection matrix is
# derived from pure integer arithmetic over (input_dim, output_dim) index
# pairs, so BOTH engines (and any re-run, any cluster size) materialize the
# identical matrix without shipping one: the operator is map-only (the
# +-1 weights are computed inside the codegen'd higher-order fold from the
# element index itself) and the result is SQL-provable. Production
# use: shrink d=1024 embeddings to r=64 before LSH banding / coarse ANN —
# JL guarantees pairwise-distance distortion O(sqrt(log n / r)).
# --------------------------------------------------------------------------

#: Knuth multiplicative constant + a distinct odd stride; modulus 97 with
#: threshold 48 gives an (almost exactly) balanced +-1 assignment. The same
#: four integers appear verbatim in the q_random_projection oracle SQL —
#: keep them in sync.
_JL_A, _JL_B, _JL_M, _JL_T = 2654435761, 40503, 97, 48


def _rademacher(i: int, j: int) -> float:
    """Deterministic +-1 matrix entry for (input dim i, output dim j)."""
    return 1.0 if ((i * _JL_A + j * _JL_B) % _JL_M) < _JL_T else -1.0


def random_projection(
    emb: DataFrame,
    r: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Project every vector onto ``r`` deterministic Rademacher directions;
    returns long format (id, j, comp) with j in [0, r). Map-only: no
    shuffle, no matrix broadcast, no plan-time job — the +-1 weight for
    element i is the same integer arithmetic evaluated IN the expression
    (``transform`` with index), so each row is projected against its own
    length: mixed-width inputs each get their exact projection instead of
    zip_with null-padding to an eagerly-sampled first row's width (ADVICE
    r12). Null vectors are excluded (they have no projection).

    Cross-engine parity note: ``round(dot, 6)`` compares Spark's
    sequential left fold against DuckDB's arbitrary-order SUM; double
    addition is non-associative, so a dot product sitting exactly on a
    1e-6 rounding boundary could in principle flip. Synthetic-data sweeps
    have never hit one; if a sweep ever flakes here, widen this round
    before suspecting the operator."""
    if r < 1:
        raise ValueError(f"r must be >= 1, got {r}")
    rows = emb.filter(F.col(vec_col).isNotNull())
    e = F.col(vec_col).cast("array<double>")

    def signer(jb: int):
        # F.transform infers lambda arity from the signature: keep it
        # exactly (element, index), binding j's offset via this closure
        return lambda x, i: x * F.when(
            F.pmod(i.cast("bigint") * F.lit(_JL_A) + F.lit(jb), F.lit(_JL_M))
            < F.lit(_JL_T),
            F.lit(1.0),
        ).otherwise(F.lit(-1.0))

    comps = []
    for j in range(r):
        signed = F.transform(e, signer(j * _JL_B))
        dot = F.aggregate(signed, F.lit(0.0), lambda acc, v: acc + v)
        comps.append(F.round(dot, 6))
    return rows.select(
        F.col(id_col), F.posexplode(F.array(*comps)).alias("j", "comp")
    )


@register(
    "q_random_projection",
    oracle="""
        SELECT vec_id,
               CAST(j AS INT) AS j,
               round(sum(val * CASE WHEN ((i * 2654435761 + j * 40503) % 97) < 48
                                    THEN 1.0 ELSE -1.0 END), 6) AS comp
        FROM (
            SELECT vec_id,
                   generate_subscripts(embedding, 1) - 1 AS i,
                   CAST(unnest(embedding) AS DOUBLE) AS val
            FROM embeddings
            WHERE embedding IS NOT NULL
        ) e
        CROSS JOIN (SELECT unnest(range(8)) AS j) r
        GROUP BY vec_id, j
    """,
    doc="Deterministic Johnson-Lindenstrauss random projection to r=8 "
    "Rademacher directions (long format: vec_id, j, comp). The +-1 "
    "matrix is integer arithmetic over index pairs — both engines "
    "derive it independently, nothing is shipped. Map-only plan: zero "
    "shuffle, dot products are codegen'd folds; the scale path for "
    "shrinking wide embeddings before LSH/coarse ANN.",
    tags=("E12", "llm-pipeline", "embeddings"),
)
def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return random_projection(table(spark, sf_dir, "embeddings"), r=8)
