"""Token co-occurrence statistics — PMI pairs and per-source
distribution divergence.

Two corpus-diagnostic operators a training-data pipeline runs before
committing a mixture (both §2B charter extensions; the reference,
etl.py:1-208, has no text analysis at all):

- **PMI pairs** (pointwise mutual information over document-level
  co-occurrence, Church & Hanks 1990): which tokens appear together
  far more than chance — collocation mining, quality probes ("lorem"
  + "ipsum" spikes), leakage smells. The scale contract: co-occurrence
  is restricted to a TOP-V VOCABULARY chosen by document frequency
  first (broadcast semi-join), so the per-document pair explosion is
  bounded by min(|doc distinct|, V)^2 — the standard collocation-
  mining guard — and the pair aggregate is a partial-combining
  groupBy over at most V*(V-1)/2 keys. No self-join of the corpus:
  pairs are generated per-document from the exploded+deduped token
  list, never by joining documents against documents.
- **Per-source KL divergence** D(p_source || p_corpus) over unigram
  distributions: the drift/mixture diagnostic (which source's token
  distribution is farthest from the blend it feeds). Wordcount-shaped:
  two partial-combining aggregates (per-source counts, corpus counts)
  joined on token — shuffle volume is |vocab| x |sources|, independent
  of corpus size.

Determinism: vocabulary selection totally ordered by (doc-frequency
desc, token asc); PMI/KL rounded to 6dp on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


def _doc_tokens(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, token) with per-document duplicates removed."""
    return (
        docs.select(
            "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .dropDuplicates(["doc_id", "token"])
    )


def pmi_pairs(
    docs: DataFrame,
    text_col: str = "text",
    vocab_k: int = 1000,
    min_pair_docs: int = 5,
) -> DataFrame:
    """Document-level PMI for unordered token pairs within the top-V
    vocabulary: pmi = ln(n_docs * c_ab / (c_a * c_b)).

    Returns (token_a, token_b, pair_docs, pmi) with token_a < token_b,
    pairs seen in >= min_pair_docs documents. Per-document pair
    generation (explode x explode with a < guard) — never a
    corpus-by-corpus join.
    """
    tok = _doc_tokens(docs, text_col)
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), F.col("token").asc())
        .limit(vocab_k)
    )
    tok_v = tok.join(F.broadcast(vocab.select("token")), "token")

    left = tok_v.select("doc_id", F.col("token").alias("token_a"))
    right = tok_v.select("doc_id", F.col("token").alias("token_b"))
    pairs = (
        left.join(right, "doc_id")
        .filter(F.col("token_a") < F.col("token_b"))
        .groupBy("token_a", "token_b")
        .agg(F.count(F.lit(1)).alias("pair_docs"))
        .filter(F.col("pair_docs") >= min_pair_docs)
    )

    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    dfreq = F.broadcast(
        vocab.select(F.col("token"), F.col("df"))
    )
    out = (
        pairs.join(dfreq.withColumnsRenamed({"token": "token_a", "df": "df_a"}), "token_a")
        .join(dfreq.withColumnsRenamed({"token": "token_b", "df": "df_b"}), "token_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token_a",
            "token_b",
            "pair_docs",
            F.round(
                F.log(
                    F.col("pair_docs").cast("double")
                    * F.col("n_docs")
                    / (F.col("df_a").cast("double") * F.col("df_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return out


@register(
    "q_pmi_pairs",
    oracle="""
        WITH tok AS (
            SELECT DISTINCT doc_id, t AS token
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                  FROM documents)
            WHERE t <> ''
        ), vocab AS (
            SELECT token, count(*) AS df
            FROM tok GROUP BY token
            ORDER BY df DESC, token ASC LIMIT 1000
        ), tv AS (
            SELECT tok.doc_id, tok.token FROM tok
            JOIN vocab USING (token)
        ), pairs AS (
            SELECT a.token AS token_a, b.token AS token_b,
                   count(*) AS pair_docs
            FROM tv a JOIN tv b
              ON a.doc_id = b.doc_id AND a.token < b.token
            GROUP BY a.token, b.token
            HAVING count(*) >= 5
        ), n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT token_a, token_b, pair_docs,
               round(ln(pair_docs * n_docs
                        / (va.df * CAST(vb.df AS DOUBLE))), 6) AS pmi
        FROM pairs
        JOIN vocab va ON va.token = token_a
        JOIN vocab vb ON vb.token = token_b
        CROSS JOIN n
    """,
    doc="Document-level PMI collocations (Church & Hanks 1990) over the "
    "top-V vocabulary: per-doc pair generation (never corpus x corpus), "
    "broadcast vocab semi-join, partial-combining pair aggregate "
    "bounded by V^2/2 keys.",
    tags=("E10", "llm-pipeline", "corpus", "text"),
)
def q_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return pmi_pairs(docs, vocab_k=1000, min_pair_docs=5)


def source_divergence(
    docs: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """KL divergence D(p_group || p_corpus) of unigram distributions,
    plus the group's token total. Returns (source, n_tokens, kl_div).

    Every group token is by construction in the corpus distribution, so
    the log ratio is always finite. Two wordcount aggregates + a
    |vocab|-sized join: shuffle is vocabulary-, not corpus-, sized.
    """
    tok = (
        docs.select(
            F.col(group_col).alias("grp"),
            F.explode(F.split(F.col(text_col), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    by_grp = tok.groupBy("grp", "token").agg(F.count(F.lit(1)).alias("c_gt"))
    grp_tot = by_grp.groupBy("grp").agg(F.sum("c_gt").alias("n_g"))
    corpus = by_grp.groupBy("token").agg(F.sum("c_gt").alias("c_t"))
    n_all = corpus.select(F.sum("c_t").alias("n_all"))

    joined = (
        by_grp.join(grp_tot, "grp")
        # plain shuffle join on token: the corpus unigram frame is
        # vocabulary-sized (unbounded, unlike pmi_pairs' top-V cap), so a
        # forced broadcast could exceed driver/executor limits at real
        # corpus scale — AQE still converts it when it's actually small
        .join(corpus, "token")
        .crossJoin(F.broadcast(n_all))
    )
    term = (F.col("c_gt") / F.col("n_g")) * F.log(
        (F.col("c_gt") / F.col("n_g")) / (F.col("c_t") / F.col("n_all"))
    )
    return (
        joined.groupBy("grp")
        .agg(
            F.max("n_g").alias("n_tokens"),
            F.round(F.sum(term), 6).alias("kl_div"),
        )
        .select(F.col("grp").alias("source"), "n_tokens", "kl_div")
    )


@register(
    "q_source_divergence",
    oracle="""
        WITH tok AS (
            SELECT source AS grp, t AS token
            FROM (SELECT source, unnest(string_split(text, ' ')) AS t
                  FROM documents)
            WHERE t <> ''
        ), by_grp AS (
            SELECT grp, token, count(*) AS c_gt FROM tok GROUP BY grp, token
        ), grp_tot AS (
            SELECT grp, sum(c_gt) AS n_g FROM by_grp GROUP BY grp
        ), corpus AS (
            SELECT token, sum(c_gt) AS c_t FROM by_grp GROUP BY token
        ), n AS (SELECT sum(c_t) AS n_all FROM corpus)
        SELECT grp AS source,
               CAST(max(n_g) AS BIGINT) AS n_tokens,
               round(sum((c_gt / CAST(n_g AS DOUBLE))
                         * ln((c_gt / CAST(n_g AS DOUBLE))
                              / (c_t / CAST(n_all AS DOUBLE)))), 6) AS kl_div
        FROM by_grp
        JOIN grp_tot USING (grp)
        JOIN corpus USING (token)
        CROSS JOIN n
        GROUP BY grp
    """,
    doc="Per-source unigram KL divergence against the corpus blend — "
    "the mixture-drift diagnostic run before committing sampling "
    "weights. Wordcount-shaped partial aggregates; vocabulary-sized "
    "shuffle, corpus-size independent.",
    tags=("E10", "llm-pipeline", "corpus", "quality"),
)
def q_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return source_divergence(docs)
