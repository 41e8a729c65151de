"""Document deduplication — E11 + LLM-pipeline dedup family (SURVEY §2B).

Exact dedup is a hash aggregate on content (or its digest) — one shuffle,
the digest (32 bytes) shuffles instead of the document body. Near-dup
(MinHash/LSH, SimHash) lives in similarity.py next to the other
similarity ops; this module owns the exact/content-hash family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


def content_fingerprint(col: Column | str) -> Column:
    """SHA-256 hex digest of a text column — the canonical content key.

    At 100 TB the digest is what you shuffle/join on, never the raw text.
    """
    return F.sha2(F.col(col) if isinstance(col, str) else col, 256)


def keep_first(df: DataFrame, partition_cols: list, order_cols: list) -> DataFrame:
    """Deterministic dedup primitive: one survivor per partition key,
    first row under ``order_cols``. ``order_cols`` should be a total
    order within each key — ties reintroduce exactly the
    partitioning-dependent nondeterminism this helper exists to remove
    (reference bug B7, SURVEY §3.4)."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_exact(df: DataFrame, text_col: str, order_cols: list[str]) -> DataFrame:
    """Keep one deterministic survivor per exact text value (keeps the
    first row under ``order_cols``). The intended semantics of the
    reference's dropDuplicates with bug B7 fixed (etl.py:69,116)."""
    return keep_first(df, [content_fingerprint(text_col)], order_cols)


@register(
    "q_doc_fingerprint",
    oracle="SELECT doc_id, sha256(text) AS fp FROM documents",
    doc="Content fingerprinting: SHA-256 over document text. Both engines "
    "emit lowercase hex of the same algorithm, so values oracle-match "
    "exactly.",
    tags=("E11",),
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "documents").select(
        "doc_id", content_fingerprint("text").alias("fp")
    )


@register(
    "q_doc_dedup",
    oracle="""
        SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents GROUP BY text
    """,
    doc="E11: exact duplicate detection — group by content, keep the "
    "lowest doc_id as the deterministic survivor, count copies. At scale "
    "the groupBy key is the SHA-256 digest (content_fingerprint) so the "
    "shuffle carries 32 bytes per row, not the document body; on this "
    "oracle-checked path we group by text directly (same result).",
    tags=("E11",),
)
def q_doc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "documents")
        .groupBy("text")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_id", "n_copies")
    )


@register(
    "q_doc_dedup_survivors",
    oracle="""
        SELECT doc_id, lang, source FROM (
            SELECT doc_id, lang, source,
                   row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
            FROM documents) t
        WHERE rn = 1
    """,
    doc="E11: the surviving rows themselves after deterministic exact "
    "dedup (first doc_id wins per identical text).",
    tags=("E11",),
)
def q_doc_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return dedup_exact(docs, "text", ["doc_id"]).select("doc_id", "lang", "source")
