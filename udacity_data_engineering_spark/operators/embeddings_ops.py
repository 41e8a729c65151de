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
