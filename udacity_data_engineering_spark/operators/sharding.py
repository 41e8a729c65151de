"""Balanced output sharding — deterministic token-budget assignment of a
corpus to N output shards (charter LLM-pipeline extension; the reference
has no text surface, SURVEY.md §2B).

The last step of a training-data pipeline is writing the curated corpus as
a fixed number of shards whose token totals are as equal as possible, so
every data-loader worker streams the same amount of work. The assignment
here is the deterministic round-robin-by-size rule: rank documents by
token count DESCENDING (doc_id tiebreak), then ``shard = (rank-1) mod N``.
Round-robin over a size-sorted order is the classic one-pass balancing
heuristic — consecutive ranks go to different shards, so each shard gets
one document from every size band and totals stay within one document of
each other per band.

Scale shape: the global rank reuses the two-phase distributed
``exact_global_rank`` (operators/ranking.py — range-bucketed partial
windows + broadcast offsets), so there is NO single-partition window
anywhere; the write is a ``partitionBy("shard")`` hive layout with one
shuffle on the shard key. Everything is provable SQL (row_number over an
explicit total order), hence the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.ranking import exact_global_rank
from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


def shard_by_token_budget(
    docs: DataFrame,
    n_shards: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Append ``n_tokens`` (whitespace token count) and ``shard`` (int in
    [0, n_shards)) — deterministic round-robin over the token-count-DESC,
    id-ASC total order. Distributed: the rank is the two-phase
    exact_global_rank, never a single-partition window."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    # null text is excluded on BOTH sides (oracles filter text IS NOT
    # NULL): Spark size(split(NULL)) is -1 while SQL len(string_split(
    # NULL)) is NULL — the only way the two engines agree on null docs
    # is for neither to rank them (the ADVICE-r11 kmeans lesson)
    sized = (
        docs.filter(F.col(text_col).isNotNull())
        .withColumn("n_tokens", F.size(F.split(F.col(text_col), " ")))
        .withColumn("__negtok", -F.col("n_tokens"))
    )
    ranked = exact_global_rank(sized, "__negtok", id_col, out="__rn")
    return ranked.withColumn(
        "shard", F.pmod(F.col("__rn") - 1, F.lit(n_shards)).cast("int")
    ).drop("__negtok", "__rn")


def write_sharded(
    docs_with_shard: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """Write the sharded corpus as a hive-partitioned parquet layout
    (``shard=K/`` directories): one shuffle on the shard key so each shard
    is written by its own tasks — no tiny-file explosion from every task
    writing into every shard."""
    (
        docs_with_shard.repartition("shard")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


@register(
    "q_shard_assignment",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
            FROM documents
            WHERE text IS NOT NULL
        ), r AS (
            SELECT doc_id, n_tokens,
                   row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rn
            FROM t
        )
        SELECT doc_id, n_tokens, CAST((rn - 1) % 8 AS INT) AS shard
        FROM r
    """,
    doc="Deterministic balanced-shard assignment: every document's output "
    "shard under round-robin over the token-count-DESC global order "
    "(8 shards). The global rank is the two-phase distributed "
    "exact_global_rank — hash-identical to the row_number oracle.",
    tags=("llm-pipeline", "ranking", "physical", "sources"),
)
def q_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return shard_by_token_budget(docs, 8).select("doc_id", "n_tokens", "shard")


@register(
    "q_shard_manifest",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
            FROM documents
            WHERE text IS NOT NULL
        ), r AS (
            SELECT doc_id, n_tokens,
                   row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rn
            FROM t
        )
        SELECT CAST((rn - 1) % 8 AS INT) AS shard,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
               CAST(max(n_tokens) AS INT) AS max_tokens
        FROM r
        GROUP BY 1
    """,
    doc="Shard manifest after balanced assignment: per-shard document count "
    "and token totals — the balance statement a data-loader reads. "
    "tot_tokens across shards differs by at most one size band under the "
    "round-robin rule (pinned in tests/test_sharding.py).",
    tags=("llm-pipeline", "ranking", "physical", "sources"),
)
def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        shard_by_token_budget(docs, 8)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("tot_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


@register(
    "q_export_pipeline",
    oracle="""
        WITH sig AS (
            SELECT doc_id, text,
                   len(string_split(text, ' ')) AS n_words,
                   round((length(text) - len(string_split(text, ' ')) + 1.0)
                         / len(string_split(text, ' ')), 6) AS mean_word_len,
                   round(CAST(len(list_filter(string_split(text, ' '),
                         t -> list_contains(['the', 'a', 'of', 'to', 'and',
                                             'in', 'is', 'it'], t))) AS DOUBLE)
                         / len(string_split(text, ' ')), 6) AS stopword_frac,
                   round(CAST(list_max(list_transform(
                         list_distinct(string_split(text, ' ')),
                         d -> len(list_filter(string_split(text, ' '),
                                  t -> t = d)))) AS DOUBLE)
                         / len(string_split(text, ' ')), 6) AS top_token_frac
            FROM documents
            WHERE doc_id % 100 <> 7
        ), kept AS (
            SELECT doc_id, text, n_words FROM sig
            WHERE n_words BETWEEN 5 AND 2000
              AND mean_word_len BETWEEN 2.0 AND 12.0
              AND stopword_frac >= 0.01
              AND top_token_frac <= 0.5
        ), survivors AS (
            SELECT doc_id, text, n_words FROM (
                SELECT doc_id, text, n_words,
                       row_number() OVER (PARTITION BY text
                                          ORDER BY doc_id) AS rn
                FROM kept) t
            WHERE rn = 1
        ), surv_sh AS (
            SELECT s.doc_id,
                   array_to_string(list_slice(string_split(s.text, ' '),
                                              CAST(g.i AS INT),
                                              CAST(g.i AS INT) + 3), ' ')
                       AS shingle
            FROM survivors s
            CROSS JOIN LATERAL (
                SELECT unnest(range(1, len(string_split(s.text, ' ')) - 2)) AS i
            ) g
            WHERE len(string_split(s.text, ' ')) >= 4
        ), bench AS (
            SELECT DISTINCT
                   array_to_string(list_slice(string_split(text, ' '),
                                              CAST(g.i AS INT),
                                              CAST(g.i AS INT) + 3), ' ')
                       AS shingle
            FROM documents
            CROSS JOIN LATERAL (
                SELECT unnest(range(1, len(string_split(text, ' ')) - 2)) AS i
            ) g
            WHERE doc_id % 100 = 7
              AND len(string_split(text, ' ')) >= 4
        ), contam AS (
            SELECT DISTINCT s.doc_id
            FROM surv_sh s JOIN bench b USING (shingle)
        ), clean AS (
            SELECT doc_id, n_words FROM survivors
            WHERE doc_id NOT IN (SELECT doc_id FROM contam)
        ), r AS (
            SELECT doc_id, n_words,
                   row_number() OVER (ORDER BY n_words DESC, doc_id) AS rn
            FROM clean
        )
        SELECT CAST((rn - 1) % 8 AS INT) AS shard,
               count(*) AS n_docs,
               CAST(sum(n_words) AS BIGINT) AS tot_tokens
        FROM r
        GROUP BY 1
    """,
    doc="Round-12 flagship composition — the training-data EXPORT pipeline "
    "as ONE declarative plan: Gopher quality rules -> deterministic exact "
    "dedup -> Bloom-prefiltered benchmark decontamination (drop every doc "
    "sharing a 4-gram with the eval split) -> balanced shard assignment "
    "-> per-shard manifest. Every stage is the registered operator it "
    "composes (quality.gopher_signals, dedup.dedup_exact, "
    "contamination.decontaminate_bloom, sharding.shard_by_token_budget); "
    "the oracle recomputes the whole chain independently in DuckDB, so "
    "the hash proves the composed pipeline end to end — including the "
    "bloom path embedded mid-plan.",
    tags=("E10", "E11", "llm-pipeline", "corpus", "quality", "dedup", "physical"),
)
def q_export_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from udacity_data_engineering_spark.operators.contamination import (
        decontaminate_bloom,
    )
    from udacity_data_engineering_spark.operators.dedup import dedup_exact
    from udacity_data_engineering_spark.operators.quality import gopher_signals

    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 100 == 7)
    corpus = docs.filter(F.col("doc_id") % 100 != 7)
    kept = (
        gopher_signals(corpus, carry=("text",))
        .filter(F.col("keep"))
        .select("doc_id", "text")
    )
    survivors = dedup_exact(kept, "text", ["doc_id"])
    contaminated = decontaminate_bloom(survivors, bench, n=4).select("doc_id")
    # materialize the cleaned corpus before ranking (localCheckpoint, the
    # repo's multi-pass-input discipline): exact_global_rank runs two
    # driver-side phases (quantile freeze, bucket counts) plus the final
    # pass — without the cut each would recompute the whole gopher ->
    # dedup -> bloom upstream (measured 2.5x the pipeline cost; spills to
    # disk at scale instead of evicting)
    clean = survivors.join(contaminated, "doc_id", "left_anti").localCheckpoint()
    return (
        shard_by_token_budget(clean, 8)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("tot_tokens"),
        )
    )
