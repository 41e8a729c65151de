"""Benchmark decontamination — flag training documents that overlap an
evaluation set by shared token n-grams (charter LLM-pipeline extension;
the reference has no text surface, SURVEY.md §2B).

The standard pretraining hygiene step: any document sharing a long-enough
token n-gram with a benchmark/eval document is contaminated and must be
dropped before training. Semantics here: exact token n-gram match (n is a parameter; the
declared query uses 4-grams so the synthetic corpus, which has no exact
duplicates, still shows hits — production decontamination uses 8-13).

Scale shape: eval suites are tiny (MBs) next to a 100 TB corpus, so the
benchmark shingle set is *broadcast* — the corpus side is a map-only
explode into 8-grams, a broadcast hash join (no corpus shuffle), then a
partial-aggregated count per doc_id. The corpus never shuffles on the
shingle; the only shuffle is the final per-doc count, carrying hit rows
only (a vanishing fraction of the corpus).

In this sandbox the "benchmark" is carved deterministically out of the
documents table itself (doc_id % 100 == 7) — the plumbing is identical
to loading a real eval-suite table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


def token_ngrams(text_col: Column, n: int = 8) -> Column:
    """All space-joined token n-grams of a document (empty array when the
    document is shorter than n tokens). Pure array expressions —
    shifted-slice zip, not transform+slice(i), which re-splits the text
    per index (functions/arrays.py)."""
    from udacity_data_engineering_spark.functions.arrays import word_ngrams

    return word_ngrams(text_col, n)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-document count of distinct benchmark n-grams it contains.
    ``benchmark`` is expected to be eval-suite-sized and is broadcast;
    returns only contaminated docs (n_hits >= 1)."""
    corpus_sh = corpus.select(
        "doc_id", F.explode(token_ngrams(F.col(text_col), n)).alias("shingle")
    )
    bench_sh = (
        benchmark.select(F.explode(token_ngrams(F.col(text_col), n)).alias("shingle"))
        .distinct()
    )
    return (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count_distinct("shingle").alias("n_hits"))
    )


@register(
    "q_decontaminate",
    oracle="""
        WITH tok AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), sh AS (
            SELECT doc_id,
                   array_to_string(list_slice(toks, CAST(s.i AS INT),
                                              CAST(s.i AS INT) + 3), ' ')
                       AS shingle
            FROM tok
            CROSS JOIN LATERAL (
                SELECT unnest(range(1, len(toks) - 2)) AS i
            ) s
            WHERE len(toks) >= 4
        ), bench AS (
            SELECT DISTINCT shingle FROM sh WHERE doc_id % 100 = 7
        )
        SELECT s.doc_id, count(DISTINCT s.shingle) AS n_hits
        FROM sh s JOIN bench b USING (shingle)
        WHERE s.doc_id % 100 <> 7
        GROUP BY s.doc_id
    """,
    doc="LLM-pipeline decontamination: docs sharing any token 4-gram with "
    "the benchmark set (doc_id % 100 == 7 stands in for an eval suite), "
    "with the distinct-overlap count. Benchmark shingles broadcast — the "
    "corpus is never shuffled on the shingle; the only shuffle is the "
    "per-doc hit count over matched rows.",
    tags=("E10", "E11", "llm-pipeline"),
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 100 == 7)
    corpus = docs.filter(F.col("doc_id") % 100 != 7)
    return decontaminate(corpus, bench, n=4)
