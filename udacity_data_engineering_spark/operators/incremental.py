"""Incremental corpus deduplication — dedup a NEW batch of documents
against an EXISTING corpus lake (charter: dedup family, production
shape). Every real training-data pipeline runs in increments: a crawl
snapshot arrives, and each new document must be dropped if (a) its
content already exists anywhere in the accumulated corpus, or (b) a
copy appears earlier in the same batch.

Shape: the corpus side is a *fingerprint-only* table — at 100 TB you
persist `sha256(text)` (32 bytes/doc) as its own parquet lake, bucketed
by fingerprint, and never rescan document bodies. The batch
fingerprints once (linear scan), dedups within itself (hash groupBy on
the digest — one shuffle), then LEFT ANTI joins the corpus fingerprints
(one shuffle on 32-byte keys; with both sides bucketed on `fp` the join
is co-located and shuffle-free, and AQE can inject a runtime bloom
filter of batch fingerprints into the corpus scan). Nothing here is
quadratic and no step carries document bodies past the first project.

The declared query splits the driver's `documents` table
deterministically (even doc_id = existing corpus, odd = incoming batch)
so the whole flow is value-hash provable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.dedup import (
    content_fingerprint,
    keep_first,
)
from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


def incremental_dedup(
    batch: DataFrame,
    corpus_fps: DataFrame,
    text_col: str = "text",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Rows of ``batch`` that survive dedup against the corpus and
    within the batch.

    ``corpus_fps`` must expose a single ``fp`` column of SHA-256 hex
    digests — the fingerprint lake, not the documents themselves.
    Within-batch survivors are deterministic: first row under
    ``order_cols`` per identical content (default: the batch's natural
    key ordering is the caller's duty; pass e.g. ["doc_id"]).
    """
    order_cols = order_cols or ["doc_id"]
    fp = batch.withColumn("__fp", content_fingerprint(text_col))
    within = keep_first(fp, ["__fp"], order_cols)
    return within.join(
        corpus_fps.select(F.col("fp").alias("__fp")), "__fp", "left_anti"
    ).drop("__fp")


def corpus_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The fingerprint lake for an existing corpus: one 32-byte digest
    column. Persist this (bucketed by fp) instead of rescanning bodies."""
    return docs.select(content_fingerprint(text_col).alias("fp")).distinct()


@register(
    "q_incremental_dedup",
    oracle="""
        WITH corpus AS (
            SELECT DISTINCT sha256(text) AS fp FROM documents
            WHERE doc_id % 2 = 0
        ), batch AS (
            SELECT doc_id, lang, source,
                   sha256(text) AS fp,
                   row_number() OVER (PARTITION BY sha256(text)
                                      ORDER BY doc_id) AS rn
            FROM documents WHERE doc_id % 2 = 1
        )
        SELECT doc_id, lang, source FROM batch
        WHERE rn = 1 AND fp NOT IN (SELECT fp FROM corpus)
    """,
    doc="Incremental dedup of an incoming batch (odd doc_ids) against an "
    "existing corpus lake (even doc_ids): fingerprint once, "
    "deterministic within-batch dedup on the digest, LEFT ANTI join "
    "against the corpus fingerprint table — 32-byte keys shuffle, "
    "document bodies never do. Value-hash proven against the identical "
    "split in DuckDB.",
    tags=("E11", "dedup"),
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    corpus = corpus_fingerprints(docs.filter(F.col("doc_id") % 2 == 0))
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    return incremental_dedup(batch, corpus).select("doc_id", "lang", "source")
