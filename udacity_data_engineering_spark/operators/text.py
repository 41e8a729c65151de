"""Text analysis — E10 + LLM-pipeline text ops (SURVEY.md §2B).

Tokenization, token statistics, quality scoring, and a stopword-based
language-ID heuristic — all pure ``pyspark.sql.functions`` array/string
expressions (whole-stage codegen, no Python workers). ``documents.text``
is space-separated words (FIXTURES.md), so the tokenizer is a literal
space split; a regex tokenizer for raw prose is provided alongside.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table

#: Tiny per-language stopword lists for the language-ID heuristic.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "fr": ("le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"),
    "es": ("el", "la", "los", "las", "y", "de", "un", "una", "es", "que"),
    "de": ("der", "die", "das", "und", "von", "ein", "eine", "ist", "zu", "mit"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "不", "这", "人"),
}


def tokens(text_col: Column) -> Column:
    """Whitespace tokenizer (documents.text is space-separated words)."""
    return F.split(text_col, " ")


def regex_tokens(text_col: Column) -> Column:
    """BPE-ish tokenizer for raw prose: word pieces OR single non-space
    symbols — the shape a real pre-tokenizer produces."""
    return F.regexp_extract_all(
        text_col, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0
    )


def lang_id(text_col: Column) -> Column:
    """Heuristic language ID: the language whose stopword list overlaps
    the document's token set the most (ties resolve to the greatest
    language code; 'und' when nothing matches). Pure array expressions.

    Shaped as ONE transform over a literal (lang, stopwords) param array
    so the token-set subtree appears once in the plan — inlining it per
    language (the naive formulation) blows up codegen ~12× slower.
    """
    toks = F.array_distinct(tokens(F.lower(text_col)))
    params = F.array(
        *[
            F.struct(
                F.lit(code).alias("lang"),
                F.array(*[F.lit(w) for w in words]).alias("words"),
            )
            for code, words in sorted(STOPWORDS.items())
        ]
    )
    scored = F.transform(
        params,
        lambda p: F.struct(
            F.size(F.array_intersect(toks, p["words"])).alias("hits"),
            p["lang"].alias("lang"),
        ),
    )
    best = F.array_max(F.filter(scored, lambda s: s["hits"] > 0))
    return F.coalesce(best["lang"], F.lit("und"))


@register(
    "q_text_tokens",
    oracle="""
        SELECT w AS word, count(*) AS n
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents) t
        GROUP BY w
    """,
    doc="E10: tokenize + word frequency — explode(split(lower(text))) then "
    "a hash aggregate on the token. The canonical word-count; at scale "
    "this is partial-aggregated map-side so the shuffle carries one row "
    "per (partition, word).",
    tags=("E10",),
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_doc_stats",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS INT)
                   AS n_distinct,
               CAST(length(text) AS INT) AS n_chars_calc
        FROM documents
    """,
    doc="E10: per-document token statistics — token count, vocabulary "
    "size, character count. All array expressions, no shuffle at all.",
    tags=("E10",),
)
def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length("text").alias("n_chars_calc"),
    )


@register(
    "q_doc_quality",
    oracle="""
        SELECT doc_id,
               round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                     / len(string_split(text, ' ')), 6) AS type_token_ratio,
               round((length(text) - len(string_split(text, ' ')) + 1.0)
                     / len(string_split(text, ' ')), 6) AS avg_word_len
        FROM documents
    """,
    doc="E10: quality scoring — type/token ratio (lexical diversity) and "
    "mean word length, both derived arithmetically from counts so the "
    "oracle matches exactly. Low-TTR docs are the classic boilerplate "
    "signal in pretraining-data filtering.",
    tags=("E10",),
)
def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    return docs.select(
        "doc_id",
        F.round(F.size(F.array_distinct(toks)).cast("double") / n, 6).alias(
            "type_token_ratio"
        ),
        F.round((F.length("text") - n + F.lit(1.0)) / n, 6).alias("avg_word_len"),
    )


@register(
    "q_lang_dist",
    oracle="""
        SELECT lang, source, count(*) AS n_docs,
               round(avg(n_chars), 2) AS avg_chars
        FROM documents GROUP BY lang, source
    """,
    doc="E10: corpus composition — document counts and mean size per "
    "(language, source), the standard pretraining-mix report.",
    tags=("E10",),
)
def q_lang_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
    )


@register(
    "q_token_count_regex",
    oracle=r"""
        SELECT doc_id,
               CAST(length(regexp_extract_all(
                   text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS INT)
                   AS n_bpe_tokens
        FROM documents
    """,
    doc="E10: BPE-ish token counting via regexp_extract_all — word "
    "pieces / digit runs / single symbols, the shape a real "
    "pre-tokenizer produces. The pattern is Java-regex / RE2 compatible "
    "so both engines count identically.",
    tags=("E10",),
)
def q_token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), 0)
        ).alias("n_bpe_tokens"),
    )


def rolling_hash(text_col: Column) -> Column:
    """Polynomial rolling hash over characters: h = (h*31 + code) mod M31.

    Pure fold over the char array (JVM-side); operands stay < 2^36 so
    ANSI overflow checking never trips. The canonical cheap document
    fingerprint when cryptographic strength isn't needed.
    """
    codes = F.transform(
        F.filter(F.split(text_col, ""), lambda c: c != ""),
        lambda c: F.ascii(c).cast("long"),
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * 31 + x, F.lit((1 << 31) - 1)),
    )


@register(
    "q_rolling_hash",
    oracle="""
        SELECT doc_id,
               list_reduce(
                   list_prepend(
                       CAST(0 AS BIGINT),
                       list_transform(
                           list_filter(string_split(text, ''), c -> c != ''),
                           c -> CAST(unicode(c) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 2147483647) AS fp
        FROM documents
    """,
    doc="E10: rolling-hash document fingerprint — identical polynomial "
    "fold expressed as aggregate() in Spark and list_reduce() in the "
    "oracle (0 prepended so both folds start from the same seed).",
    tags=("E10", "dedup"),
)
def q_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", rolling_hash(F.col("text")).alias("fp"))


#: The lang-ID heuristic restated in DuckDB: same stopword lists, same
#: distinct-token intersection counts, same tie rule (greatest language
#: code wins), same 'und' fallback — an independent recomputation, not a
#: port of the Spark plan.
_LANG_ID_ORACLE = (
    "WITH langs(lang_code, words) AS (VALUES "
    + ", ".join(
        "('%s', [%s])" % (code, ", ".join(f"'{w}'" for w in words))
        for code, words in sorted(STOPWORDS.items())
    )
    + """
    ), scored AS (
        SELECT d.doc_id, d.lang, l.lang_code,
               len(list_intersect(
                   list_distinct(string_split(lower(d.text), ' ')),
                   l.words)) AS hits
        FROM documents d CROSS JOIN langs l
    ), best AS (
        SELECT doc_id, lang_code,
               row_number() OVER (PARTITION BY doc_id
                   ORDER BY hits DESC, lang_code DESC) AS rn
        FROM scored WHERE hits > 0
    )
    SELECT d.doc_id, d.lang, coalesce(b.lang_code, 'und') AS lang_pred
    FROM documents d
    LEFT JOIN (SELECT doc_id, lang_code FROM best WHERE rn = 1) b
        USING (doc_id)
    """
)


@register(
    "q_lang_id",
    oracle=_LANG_ID_ORACLE,
    doc="Heuristic stopword-overlap language ID over documents.text — "
    "pure array expressions (one transform over a literal param array, "
    "zero shuffles). Value-hash proven against an independent DuckDB "
    "recomputation (cross join + window argmax with the identical "
    "hits-then-greatest-code tie rule); accuracy vs the labelled "
    "documents.lang column asserted in tests.",
    tags=("E10",),
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", lang_id(F.col("text")).alias("lang_pred"))


@register(
    "q_tfidf",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
        ), df AS (
            SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1
        ), n AS (SELECT count(*) AS n FROM documents)
        SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
               CAST(df.df AS BIGINT) AS df,
               round(tf.tf * ln((n.n + 1.0) / (df.df + 1.0)), 6) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
    """,
    doc="E10: TF-IDF term scoring over the corpus — term frequency per "
    "(doc, term), smoothed inverse document frequency ln((N+1)/(df+1)), "
    "product scored per posting. Shape: one explode + two hash "
    "aggregations + a term-keyed join; the doc-count side is a scalar "
    "broadcast. The standard relevance/keyword-extraction primitive for "
    "corpus analytics.",
    tags=("E10",),
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    n_docs = docs.count()
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    return tf.join(df, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(F.col("tf") * F.log((n_docs + 1.0) / (F.col("df") + 1.0)), 6).alias(
            "tfidf"
        ),
    )


def bm25(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 score of every document against a bag of query terms.

    One explode filtered to the query terms *before* any shuffle (the
    corpus never shuffles full postings — only rows whose token is a
    query term survive the map side), one (doc, term) hash aggregate for
    tf, a term-keyed broadcast of the |terms|-row df table, and a 1-row
    corpus-stats broadcast for N/avgdl. idf is the Lucene-style
    ``ln((N - df + 0.5)/(df + 0.5) + 1)`` (always positive)."""
    toks = docs.select("doc_id", tokens(F.col(text_col)).alias("toks"))
    lens = toks.select("doc_id", F.size("toks").alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("t"))
        .filter(F.col("t").isin(query_terms))
        .groupBy("doc_id", "dl", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    term_score = (
        idf
        * F.col("tf")
        * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    return (
        tf.join(F.broadcast(dfreq), "t")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term_score), 4).alias("bm25"))
    )


@register(
    "q_bm25",
    oracle="""
        WITH tok AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), lens AS (
            SELECT doc_id, len(toks) AS dl FROM tok
        ), stats AS (
            SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens
        ), tf AS (
            SELECT doc_id, dl, t, count(*) AS tf
            FROM (SELECT doc_id, len(toks) AS dl, unnest(toks) AS t FROM tok)
            WHERE t IN ('spark', 'join', 'filter')
            GROUP BY doc_id, dl, t
        ), dfreq AS (
            SELECT t, count(*) AS df FROM tf GROUP BY t
        )
        SELECT doc_id,
               round(sum(
                   ln((n_docs - df + 0.5) / (df + 0.5) + 1) * tf * 2.2 /
                   (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS bm25
        FROM tf JOIN dfreq USING (t) CROSS JOIN stats
        GROUP BY doc_id
    """,
    doc="E10: Okapi BM25 relevance of every document against the query "
    "{spark, join, filter} (k1=1.2, b=0.75, Lucene idf). Postings are "
    "filtered to the query terms map-side before any shuffle; df and "
    "corpus stats are broadcast (3 rows + 1 row). Oracle recomputes the "
    "identical formula in DuckDB.",
    tags=("E10", "llm-pipeline"),
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25(table(spark, sf_dir, "documents"), ["spark", "join", "filter"])
