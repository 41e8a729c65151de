"""Character-trigram language-model scoring — the perplexity-style
quality filter of the LLM-data-pipeline family (charter: text
analysis / quality scoring).

The classic curation pattern (CCNet / Gopher / most crawl pipelines)
scores every document against a reference language model and drops the
high-perplexity tail (gibberish, encoding damage, non-linguistic
boilerplate). The production implementations use KenLM; the
Spark-native re-expression here is an add-one-smoothed
unigram-of-character-trigrams model — deterministic, oracle-provable,
and the same *pipeline shape* as a real LM filter:

- model: trigram -> count over a reference corpus (one
  partial-aggregating groupBy on the trigram; at 100 TB train on a
  SAMPLE or a vetted reference slice via ``model_docs`` — the model is
  corpus-derived state, not per-doc work);
- scoring: explode each doc's trigrams (O(chars) rows, JVM-side
  ``Column.substr`` over a sequence — no Python hop), join to the
  model on the trigram (shuffle join; a char-trigram vocabulary is
  small but the JOIN key distribution is Zipfian, which Spark's AQE
  skew handling absorbs), one broadcastable totals row, then a per-doc
  aggregate:  cross_entropy = ln(N + V) - avg(ln(c + 1)), the add-one
  smoothed negative mean log-likelihood. Unseen trigrams (scoring a
  NEW batch against a fixed reference model) coalesce to count 0 —
  exactly the add-one floor.

Reference parity note: the reference repo (etl.py) has no scoring
operator; this is charter extension surface alongside
quality.gopher_signals / classifier_score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.similarity import spread
from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


def char_trigrams(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, *keep_cols, t): every overlapping character trigram of
    every doc. Docs shorter than 3 characters contribute nothing.
    JVM-side: Column.substr over a sequence, one explode."""
    base = spread(docs).filter(F.length(F.col(text_col)) >= 3)
    tri = F.transform(
        F.sequence(F.lit(1), F.length(F.col(text_col)) - 2),
        lambda i: F.col(text_col).substr(i, F.lit(3)),
    )
    return base.select(
        F.col(id_col).alias("doc_id"), *keep_cols, F.explode(tri).alias("t")
    )


def trigram_model(
    docs: DataFrame, text_col: str = "text", by: str | None = None
) -> DataFrame:
    """(t, c) — or (by, t, c) — trigram counts over the reference
    corpus: the 'language model'. One partial-aggregating groupBy; the
    result is model state (persist/broadcast it when scoring many
    batches). ``by`` trains one independent model per value of that
    column (the CCNet per-language setting) at the cost of ONE extra
    group key — no extra shuffle, no per-model job."""
    keys = ([by] if by else []) + ["t"]
    return char_trigrams(
        docs, text_col=text_col, keep_cols=(by,) if by else ()
    ).groupBy(*keys).agg(F.count(F.lit(1)).alias("c"))


def charlm_score(
    docs: DataFrame,
    model_docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str | None = None,
) -> DataFrame:
    """(doc_id, [by,] n_trigrams, cross_entropy): add-one-smoothed
    negative mean trigram log-likelihood per document, against a model
    trained on ``model_docs`` (default: the scored corpus itself —
    self-perplexity, the single-corpus curation setting). Lower = more
    typical of the reference distribution; a pipeline drops the high
    tail. cross_entropy is rounded to 4 decimals (the serialization
    contract shared with the DuckDB oracle; exp(cross_entropy) is the
    perplexity if you want the conventional units).

    ``by`` (e.g. "lang") scores each document against ITS OWN group's
    model — per-language perplexity cutoffs, the CCNet production
    setting (a Russian doc must not be judged against an English
    model). Costs one extra key in the model groupBy and the scoring
    join; the totals row becomes a group-cardinality frame (still
    broadcast-sized). With an external ``model_docs``, a batch group
    with NO model (its ``by`` value absent from the model corpus) is
    still emitted, with ``cross_entropy`` NULL as the explicit
    "unmodeled group" sentinel — it must not be silently dropped, and
    scoring it against an add-one floor of the WRONG language's model
    would be exactly the cross-language judgment ``by`` exists to
    prevent. Callers route NULL-scored groups to a fallback (global
    model, or hold out for a model refresh).

    SELF-scoring (``model_docs is None``) is single-pass (optimization
    round 16, guide §2.3/§2.4): the corpus is exploded into trigrams
    ONCE and counted per (doc, [by,] t); the model count c then falls
    out of a window sum over the counted table (same trigram
    partitioning the model groupBy would have used), so the plan has
    one explosion subtree instead of three and no occurrence-sized
    scoring join at all. The per-occurrence mean becomes the
    k-weighted mean over distinct (doc, trigram) rows —
    sum(k·ln(c+1))/sum(k) — algebraically identical to
    avg-over-occurrences (summation order differs only within double
    rounding noise, far below the 4-decimal serialization contract;
    oracle-verified at sf0.001/0.01/0.1, see OPTIMIZATION_r16.md).
    (N, V) totals ride the same pass: the row_number-designated first
    row of each trigram group marks V, so totals reduce over the
    doc-sized aggregate, never a corpus-sized one."""
    tkeys = [by] if by else []
    if model_docs is None:
        from pyspark.sql import Window

        cnt = char_trigrams(
            docs, id_col, text_col, keep_cols=(by,) if by else ()
        ).groupBy("doc_id", *tkeys, "t").agg(F.count(F.lit(1)).alias("__k"))
        w = Window.partitionBy(*tkeys, "t")
        # model count + a one-row-per-trigram marker, one exchange on t
        # ((doc_id, t) is unique post-count, so row_number is total)
        withc = cnt.select(
            "doc_id",
            *tkeys,
            "__k",
            F.sum("__k").over(w).alias("__c"),
            (
                F.row_number().over(w.orderBy("doc_id")) == 1
            ).cast("long").alias("__first"),
        )
        # doc-sized frame feeding TWO consumers (the totals broadcast and
        # the output join): lazy lineage cut so the explosion + window
        # execute exactly once — materialized by the broadcast build,
        # one row per document, released with the DataFrame (the same
        # within-query multi-consumer cut as similarity.rep_verified_pairs)
        per_doc = withc.groupBy("doc_id", *tkeys).agg(
            F.sum("__k").alias("n_trigrams"),
            F.sum(F.col("__k") * F.log(F.col("__c") + 1)).alias("__wlp"),
            F.sum("__first").alias("__v_part"),
        ).localCheckpoint(eager=False)
        totals = per_doc.groupBy(*tkeys).agg(
            F.sum("n_trigrams").alias("__n_total"),
            F.sum("__v_part").alias("__v"),
        )
        joined = (
            per_doc.join(F.broadcast(totals), by)
            if by
            else per_doc.crossJoin(F.broadcast(totals))
        )
        return joined.select(
            "doc_id",
            *tkeys,
            "n_trigrams",
            F.round(
                F.log(F.col("__n_total") + F.col("__v"))
                - F.col("__wlp") / F.col("n_trigrams"),
                4,
            ).alias("cross_entropy"),
        )
    model = trigram_model(model_docs, text_col=text_col, by=by)
    totals = model.groupBy(*tkeys).agg(
        F.sum("c").alias("__n_total"), F.count(F.lit(1)).alias("__v")
    )
    tri = char_trigrams(docs, id_col, text_col, keep_cols=(by,) if by else ())
    joined = tri.join(model, ([by] if by else []) + ["t"], "left")
    joined = (
        joined.join(F.broadcast(totals), by, "left")
        if by
        else joined.crossJoin(F.broadcast(totals))
    )
    scored = joined.select(
        "doc_id",
        *tkeys,
        "__n_total",
        "__v",
        F.log(F.coalesce(F.col("c"), F.lit(0)) + 1).alias("__lp"),
    )
    return scored.groupBy("doc_id", *tkeys, "__n_total", "__v").agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.round(
            F.log(F.col("__n_total") + F.col("__v")) - F.avg("__lp"), 4
        ).alias("cross_entropy"),
    ).select("doc_id", *tkeys, "n_trigrams", "cross_entropy")


@register(
    "q_charlm_score",
    oracle="""
        WITH tri AS (
            SELECT doc_id, substr(text, CAST(i AS BIGINT), 3) AS t
            FROM documents,
                 LATERAL (SELECT unnest(
                     range(1, greatest(len(text) - 2, 0) + 1)) AS i)
            WHERE len(text) >= 3
        ), model AS (
            SELECT t, count(*) AS c FROM tri GROUP BY t
        ), tot AS (
            SELECT sum(c) AS n_total, count(*) AS v FROM model
        )
        SELECT tri.doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
               round(ln(n_total + v) - avg(ln(c + 1)), 4) AS cross_entropy
        FROM tri JOIN model USING (t), tot
        GROUP BY tri.doc_id, n_total, v
    """,
    doc="Perplexity-style quality scoring (the CCNet/KenLM pipeline "
    "shape, Spark-native): add-one-smoothed unigram-of-char-trigrams "
    "model trained on the corpus, per-doc cross-entropy = ln(N+V) - "
    "avg(ln(c+1)). Hash-proven: DuckDB recomputes the identical counts "
    "and the identical formula; the mean is rounded to 4 decimals on "
    "both sides (summation-order double noise is ~1e-13 on ln-scale "
    "values).",
    tags=("E10", "llm-pipeline", "quality"),
)
def q_charlm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return charlm_score(table(spark, sf_dir, "documents"))


@register(
    "q_charlm_by_lang",
    oracle="""
        WITH tri AS (
            SELECT doc_id, lang, substr(text, CAST(i AS BIGINT), 3) AS t
            FROM documents,
                 LATERAL (SELECT unnest(
                     range(1, greatest(len(text) - 2, 0) + 1)) AS i)
            WHERE len(text) >= 3
        ), model AS (
            SELECT lang, t, count(*) AS c FROM tri GROUP BY lang, t
        ), tot AS (
            SELECT lang, sum(c) AS n_total, count(*) AS v
            FROM model GROUP BY lang
        )
        SELECT tri.doc_id, tri.lang, CAST(count(*) AS BIGINT) AS n_trigrams,
               round(ln(n_total + v) - avg(ln(c + 1)), 4) AS cross_entropy
        FROM tri JOIN model USING (lang, t) JOIN tot USING (lang)
        GROUP BY tri.doc_id, tri.lang, n_total, v
    """,
    doc="Per-language perplexity scoring (the CCNet production setting): "
    "one independent char-trigram model per lang value — a single extra "
    "group key in the model aggregate, never a per-model job — each doc "
    "scored against its own language's model. The totals row becomes a "
    "language-cardinality broadcast frame. Hash-proven: DuckDB "
    "recomputes the identical per-language counts and formula.",
    tags=("E10", "llm-pipeline", "quality"),
)
def q_charlm_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    return charlm_score(table(spark, sf_dir, "documents"), by="lang")


def charlm_lang_filter(
    docs: DataFrame,
    keep_quantile: float = 0.5,
    by: str = "lang",
) -> DataFrame:
    """The complete CCNet selection: per-language perplexity scoring +
    a PER-LANGUAGE cutoff — keep each language's lowest-cross-entropy
    ``keep_quantile`` tail. A global cutoff would be the classic
    monolingual bias (one language's typical score is another's
    outlier); conditioning the threshold on the group is the published
    CCNet design, and it costs one tiny per-group percentile aggregate
    (|languages| rows, broadcast back) on top of the scoring pass —
    no global sort, no second corpus scan. Cutoffs compare the ROUNDED
    scores (the shared serialization contract), so the boundary is
    engine-stable."""
    scored = charlm_score(docs, by=by)
    cuts = scored.groupBy(by).agg(
        F.expr(f"percentile(cross_entropy, {keep_quantile})").alias("__cut")
    )
    return (
        scored.join(F.broadcast(cuts), by)
        .filter(F.col("cross_entropy") <= F.col("__cut"))
        .select("doc_id", by, "n_trigrams", "cross_entropy")
    )


@register(
    "q_charlm_lang_filter",
    oracle="""
        WITH tri AS (
            SELECT doc_id, lang, substr(text, CAST(i AS BIGINT), 3) AS t
            FROM documents,
                 LATERAL (SELECT unnest(
                     range(1, greatest(len(text) - 2, 0) + 1)) AS i)
            WHERE len(text) >= 3
        ), model AS (
            SELECT lang, t, count(*) AS c FROM tri GROUP BY lang, t
        ), tot AS (
            SELECT lang, sum(c) AS n_total, count(*) AS v
            FROM model GROUP BY lang
        ), scored AS (
            SELECT tri.doc_id, tri.lang,
                   CAST(count(*) AS BIGINT) AS n_trigrams,
                   round(ln(n_total + v) - avg(ln(c + 1)), 4) AS cross_entropy
            FROM tri JOIN model USING (lang, t) JOIN tot USING (lang)
            GROUP BY tri.doc_id, tri.lang, n_total, v
        ), cuts AS (
            SELECT lang, quantile_cont(cross_entropy, 0.5) AS cut
            FROM scored GROUP BY lang
        )
        SELECT doc_id, lang, n_trigrams, cross_entropy
        FROM scored JOIN cuts USING (lang)
        WHERE cross_entropy <= cut
    """,
    doc="The complete CCNet per-language selection: per-language "
    "char-trigram perplexity + a PER-LANGUAGE median cutoff (a global "
    "threshold would impose one language's typical score on all — the "
    "monolingual bias the per-group conditioning exists to remove). "
    "One extra |languages|-row percentile aggregate, broadcast back. "
    "Hash-proven: DuckDB recomputes the identical per-language scores "
    "and the quantile_cont == percentile cutoffs over the rounded "
    "values.",
    tags=("E10", "llm-pipeline", "quality", "corpus"),
)
def q_charlm_lang_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return charlm_lang_filter(table(spark, sf_dir, "documents"))
