"""Exact distributed heavy hitters with bounded shuffle.

The vocabulary question every corpus audit asks — "which tokens make up
more than 1/k of the corpus?" — has an exact answer that does NOT
require shuffling the whole vocabulary:

1. **Candidate pass (pigeonhole, no shuffle).** Within each Arrow batch,
   keep tokens whose LOCAL count exceeds local_n/k. Batches partition
   the token stream, so if a token's count were ≤ n_i/k in every batch
   i, its global count would be ≤ Σ n_i/k = n/k — therefore every true
   global heavy hitter is locally heavy in at least one batch. Each
   batch emits < k candidates regardless of batch vocabulary size (at
   most k-1 values can each exceed a 1/k share).
2. **Exact recount (candidate-bounded shuffle).** Semi-join the token
   stream against the broadcast candidate set and count exactly; keep
   ``cnt * k > n`` (pure integer comparison — no float threshold edge).

The result is EXACT — identical to the full groupBy — but the shuffle
carries at most (batches × k) candidate rows plus map-side-combined
counts for candidate tokens only, instead of the full vocabulary. At
100 TB the vocabulary of a web corpus is billions of distinct tokens;
the candidate set is < k per scan task. This is the Misra-Gries
insight re-expressed as a two-pass Spark plan; the candidate kernel is
an Arrow-batched value_counts (deliberate Python path, allowlisted in
tests/test_plans_scale.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.text import tokens
from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


def token_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exploded whitespace tokens, empty strings dropped (consecutive
    separators produce '' under split) — the shared definition both
    passes AND the total-count aggregate must agree on."""
    return docs.select(
        F.explode(tokens(F.col(text_col))).alias("w")
    ).filter(F.col("w") != "")


def heavy_hitters(
    docs: DataFrame, k: int = 200, text_col: str = "text"
) -> DataFrame:
    """All tokens with global count strictly greater than n/k, with
    exact counts. See module docstring for the two-pass design."""
    import pandas as pd  # noqa: F401 (kernel dependency, Arrow batches)

    toks = token_stream(docs, text_col)

    def local_heavy(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vc = pdf["w"].value_counts()
            # integer pigeonhole: local_cnt * k > local_n
            hits = vc[vc * k > len(pdf)]
            if len(hits):
                yield hits.rename_axis("w").reset_index()[["w"]]

    cands = toks.mapInPandas(local_heavy, "w string").distinct()
    # n computed scan-side (sum of per-doc token counts — same
    # definition as token_stream, no second explode)
    n = docs.select(
        F.sum(
            F.size(F.array_remove(tokens(F.col(text_col)), ""))
        ).alias("n")
    ).collect()[0][0]
    return (
        toks.join(F.broadcast(cands), "w", "left_semi")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * k > F.lit(n))
    )


@register(
    "q_heavy_hitters",
    oracle="""
        WITH toks AS (
            SELECT unnest(list_filter(string_split(text, ' '),
                                      x -> x <> '')) AS w
            FROM documents WHERE text IS NOT NULL
        ), tot AS (SELECT count(*) AS n FROM toks)
        SELECT w, CAST(count(*) AS BIGINT) AS cnt
        FROM toks, tot
        GROUP BY w, n
        HAVING count(*) * 200 > n
    """,
    doc="Exact corpus heavy hitters (tokens with > 1/200 share) via the "
    "bounded-shuffle two-pass: per-Arrow-batch pigeonhole candidates "
    "(< k rows per batch, guaranteed superset of the true heavy "
    "hitters), then an exact candidate-only recount with an integer "
    "cnt*k > n threshold. Hash-proven: the result is EXACT, so DuckDB's "
    "full group-by HAVING computes the identical set and counts.",
    tags=("E10", "llm-pipeline", "pandas"),
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return heavy_hitters(table(spark, sf_dir, "documents"), k=200)
