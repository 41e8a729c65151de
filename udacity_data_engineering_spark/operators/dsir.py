"""Data Selection via Importance Resampling (DSIR) — select raw-corpus
documents that look like a TARGET distribution, the pretraining
data-selection method of Xie et al., "Data selection for language
models via importance resampling" (NeurIPS 2023, arXiv:2302.03169),
re-expressed Spark-first.

The published recipe: featurize every document into hashed n-gram
bucket counts, fit bag-of-buckets unigram models p_target / p_raw,
score each document with the log importance ratio
``sum_w log(p_target(bucket(w)) / p_raw(bucket(w)))``, and keep the
top quantile. Here the feature space is 256 hashed word-unigram
buckets (first byte of sha256(word) — engine-portable via the
committed hex-recovery parity trick), both models come from ONE
partial-aggregating groupBy over the exploded words (conditional
aggregation splits target from raw — no second corpus pass), and the
model is a 256-row broadcast. Add-one smoothing on both numerators
keeps unseen buckets finite, mirroring charlm's floor.

Scale shape: explode → scan-side bucket arithmetic (sha2 + conv, all
JVM) → broadcast model join → one per-doc aggregate. The wide text
column dies at the explode; nothing shuffles except (doc_id, bucket)
pairs and the final per-doc rows. The selection cutoff is a single
small percentile aggregate (no global sort), broadcast back — the
same discipline as q_curation_pipeline's LM percentile stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table

#: hashed-feature bucket count (first sha256 byte)
DSIR_BUCKETS = 256


def _bucket(w) -> "F.Column":
    """Deterministic 0..255 feature bucket: first byte of sha256(word).
    Identical in DuckDB via hex-char recovery (the committed parity
    trick — see q_substring_dupes_winnowed's oracle)."""
    return F.conv(F.substring(F.sha2(w, 256), 1, 2), 16, 10).cast("int")


def dsir_scores(
    docs: DataFrame,
    target_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, *keep_cols, n_words, lr): per-document log importance
    ratio of the target vs raw hashed-unigram models. ``target_pred``
    is a boolean Column marking the rows that DEFINE the target
    distribution (e.g. ``F.col("lang") == "en"`` — at production scale
    a small curated corpus unioned in with a marker column). Docs with
    no words score 0 (no evidence either way) and are kept in the
    output — never silently dropped."""
    words = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            target_pred.alias("__is_t"),
            F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), " ")).alias(
                "__w"
            ),
        )
        .filter(F.col("__w") != "")
        .withColumn("__b", _bucket(F.col("__w")))
        .select("doc_id", "__is_t", "__b")
    )
    model = words.groupBy("__b").agg(
        F.count(F.lit(1)).alias("rc"),
        F.sum(F.when(F.col("__is_t"), 1).otherwise(0)).alias("tc"),
    )
    tot = model.agg(F.sum("rc").alias("rtot"), F.sum("tc").alias("ttot"))
    contrib = F.log(
        (F.col("tc") + 1.0) / (F.col("ttot") + float(DSIR_BUCKETS))
    ) - F.log((F.col("rc") + 1.0) / (F.col("rtot") + float(DSIR_BUCKETS)))
    agg = (
        words.join(F.broadcast(model), "__b")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_words"),
            F.round(F.sum(contrib), 4).alias("lr"),
        )
    )
    return docs.select(F.col(id_col).alias("doc_id"), *keep_cols).join(
        agg, "doc_id", "left"
    ).select(
        "doc_id",
        *keep_cols,
        F.coalesce("n_words", F.lit(0)).alias("n_words"),
        F.coalesce("lr", F.lit(0.0)).alias("lr"),
    )


def dsir_select(
    scored: DataFrame, keep_quantile: float = 0.7
) -> DataFrame:
    """Mark the top (1 - keep_quantile) tail of the ``lr`` importance
    scores: selected = lr >= percentile(lr, keep_quantile). The cutoff
    is one tiny aggregate (broadcast), computed over the ROUNDED
    scores — the serialization contract both engines share — so the
    boundary comparison cannot straddle a representation edge."""
    cut = scored.agg(
        F.expr(f"percentile(lr, {keep_quantile})").alias("__cutoff")
    )
    return scored.crossJoin(F.broadcast(cut)).select(
        *scored.columns, (F.col("lr") >= F.col("__cutoff")).alias("selected")
    )


@register(
    "q_dsir_mix",
    oracle=f"""
        WITH words AS (
            SELECT doc_id, lang = 'en' AS is_t, w FROM (
                SELECT doc_id, lang,
                       unnest(string_split(coalesce(text, ''), ' ')) AS w
                FROM documents
            ) WHERE w <> ''
        ), wb AS (
            SELECT doc_id, is_t,
                   ((strpos('0123456789abcdef', substr(sha256(w), 1, 1)) - 1) * 16
                  + (strpos('0123456789abcdef', substr(sha256(w), 2, 1)) - 1)) AS b
            FROM words
        ), model AS (
            SELECT b, count(*) AS rc,
                   sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS tc
            FROM wb GROUP BY b
        ), tot AS (
            SELECT sum(rc) AS rtot, sum(tc) AS ttot FROM model
        ), agg AS (
            SELECT doc_id, CAST(count(*) AS INT) AS n_words,
                   round(sum(ln((tc + 1.0) / (ttot + {DSIR_BUCKETS}.0))
                           - ln((rc + 1.0) / (rtot + {DSIR_BUCKETS}.0))), 4) AS lr
            FROM wb JOIN model USING (b) CROSS JOIN tot
            GROUP BY doc_id
        ), scored AS (
            SELECT d.doc_id, d.lang,
                   coalesce(agg.n_words, 0) AS n_words,
                   coalesce(agg.lr, 0.0) AS lr
            FROM documents d LEFT JOIN agg USING (doc_id)
        ), cut AS (
            SELECT quantile_cont(lr, 0.7) AS cutoff FROM scored
        )
        SELECT doc_id, lang, n_words, lr, lr >= cutoff AS selected
        FROM scored, cut
    """,
    doc="DSIR data selection (Xie et al. NeurIPS'23): hashed word-"
    "unigram features (256 sha256-byte buckets), target model = the "
    "corpus's English documents, raw model = everything, per-doc log "
    "importance ratio with add-one smoothing, top-30% selection via "
    "one percentile aggregate. Hash-proven: DuckDB recomputes the "
    "identical feature hash (hex recovery), both models from the same "
    "single-pass conditional aggregate, the identical smoothed "
    "log-ratio (ln parity as in q_charlm_score) and the "
    "quantile_cont == percentile cutoff.",
    tags=("E10", "llm-pipeline", "sampling", "quality", "corpus"),
)
def q_dsir_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    scored = dsir_scores(docs, F.col("lang") == "en", keep_cols=("lang",))
    return dsir_select(scored)
