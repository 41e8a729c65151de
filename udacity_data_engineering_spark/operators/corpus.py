"""Corpus-preparation operators — the steps between a cleaned document
lake and a tokenizer: vocabulary statistics, n-gram counts, normalized
text, deterministic train/val/test splits, and the global training
shuffle.

Scale notes (the 100 TB contract for each operator):

- **Vocabulary / n-gram counts** are wordcount-shaped: explode + hash
  aggregate. Spark's partial aggregation combines map-side, so shuffle
  volume is |vocab| per partition, not |tokens|; the final top-k is a
  ``TakeOrderedAndProject`` (no global sort materialization).
- **Train/val/test split** is the same pure-integer Knuth-hash contract
  as sampling.py: assignment is a function of the row key alone, so the
  split is reproducible on any engine/partitioning and is a scan-side
  codegen'd projection — no shuffle, no RNG state.
- **Global shuffle** for training-data writes must NOT be a global
  ``row_number`` (that is a single-partition sort). The scale shape is:
  deterministic per-row sort key (Knuth hash) + ``repartitionByRange``
  on that key + ``sortWithinPartitions`` — a range shuffle whose output
  is globally ordered across files without ever centralizing rows
  (``shuffled_write``). The query surface exposes the key + bucket
  assignment, which is what the oracle can prove.
- **Normalization** is pure ``regexp_replace`` inside whole-stage
  codegen; **length-outlier trimming** at scale would use approximate
  quantile bounds — the exact rank-based variant here is the oracle
  shape and documents that trade.

Reference parity: the reference (etl.py) has no corpus layer; these are
§2B charter extensions (SURVEY.md "LLM-data-pipeline operators").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.sampling import KNUTH, hash_pct
from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


def _toks(col):
    return F.split(col, " ")


# ---------------------------------------------------------------------------
# vocabulary / n-gram statistics


def vocab_topk(docs: DataFrame, text_col: str = "text", k: int = 50) -> DataFrame:
    """Top-k corpus vocabulary by frequency (count desc, token asc).

    Explode + partial-aggregating groupBy + TakeOrderedAndProject: the
    shuffle carries one row per (partition, distinct token), and the
    top-k never sorts the full vocabulary globally.
    """
    return (
        docs.select(F.explode(_toks(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(k)
    )


@register(
    "q_vocab_topk",
    oracle="""
        SELECT token, COUNT(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        WHERE token <> ''
        GROUP BY token
        ORDER BY cnt DESC, token
        LIMIT 50
    """,
    doc="Corpus vocabulary statistics: top-50 tokens by frequency with a "
    "deterministic (cnt, token) tiebreak. Wordcount shape — map-side "
    "partial aggregation bounds shuffle volume by distinct-token count, "
    "and the limit folds into TakeOrderedAndProject.",
    tags=("E10", "llm-pipeline", "corpus"),
)
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_topk(table(spark, sf_dir, "documents"))


def ngram_counts(
    docs: DataFrame, n: int = 2, text_col: str = "text", k: int = 50
) -> DataFrame:
    """Top-k n-gram counts (space-joined token n-grams), deterministic
    tiebreak. Same wordcount scale shape as vocab_topk.

    The n-gram construction zips n shifted slices of the token array
    rather than indexing with ``element_at(toks, i)`` inside a
    ``transform`` lambda — see functions/arrays.py for the O(tokens²)
    trap that avoids (measured 6.5× at sf0.1: 2.0 s vs 0.31 s)."""
    from udacity_data_engineering_spark.functions.arrays import word_ngrams

    toks = _toks(F.col(text_col))
    grams = word_ngrams(F.col(text_col), n)
    return (
        docs.filter(F.size(toks) >= n)
        .select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("ngram"))
        .limit(k)
    )


@register(
    "q_ngram_counts",
    oracle="""
        SELECT ngram, COUNT(*) AS cnt
        FROM (
            SELECT unnest(list_transform(range(1, len(t)),
                                         i -> t[i] || ' ' || t[i+1])) AS ngram
            FROM (SELECT string_split(text, ' ') AS t FROM documents)
            WHERE len(t) >= 2
        )
        GROUP BY ngram
        ORDER BY cnt DESC, ngram
        LIMIT 50
    """,
    doc="Bigram language-model counts: top-50 token bigrams, built by a "
    "codegen'd sequence/transform (no Python), aggregated wordcount-style "
    "with map-side combine.",
    tags=("E10", "llm-pipeline", "corpus"),
)
def q_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_counts(table(spark, sf_dir, "documents"), n=2)


# ---------------------------------------------------------------------------
# deterministic splits and the training shuffle


def train_val_split(
    df: DataFrame, key: str, train_pct: int = 90, val_pct: int = 5
) -> DataFrame:
    """Deterministic train/val/test assignment from the row-key hash.

    Same reproducibility contract as deterministic_sample: membership is
    pure integer arithmetic on the key, so the split survives
    repartitioning, engine changes, and re-runs — a seeded randomSplit
    does not. Scan-side projection; zero shuffle."""
    h = hash_pct(F.col(key))
    return df.withColumn(
        "split",
        F.when(h < train_pct, "train")
        .when(h < train_pct + val_pct, "val")
        .otherwise("test"),
    )


@register(
    "q_train_val_split",
    oracle="""
        SELECT doc_id,
               CASE WHEN h < 90 THEN 'train'
                    WHEN h < 95 THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id,
                     ((doc_id % 2147483648) * 2654435761) % 4294967296 % 100 AS h
              FROM documents)
    """,
    doc="Deterministic 90/5/5 train/val/test split via the Knuth "
    "multiplicative hash of doc_id — identical assignment on every "
    "engine and partitioning (randomSplit cannot promise that). "
    "Scan-side integer arithmetic, no shuffle.",
    tags=("llm-pipeline", "sampling", "corpus"),
)
def q_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return train_val_split(docs, "doc_id").select("doc_id", "split")


def leakage_safe_split(
    df: DataFrame,
    edges: DataFrame,
    key: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Train/val/test split that NEAR-DUPLICATES cannot straddle.

    A plain per-row hash split leaks: a training document's near-copy
    lands in val/test and inflates eval (the contamination failure mode
    the dedup family exists to prevent). Here the split key is the
    near-dup CONNECTED COMPONENT label (min doc id of the group;
    singletons use their own id), so an entire duplicate cluster always
    falls on one side. ``edges`` is any pair graph — the production
    feed is the MinHash/ensemble candidates (linear star edges); the
    registered query uses the exact Jaccard graph, the oracle shape.

    Same determinism contract as train_val_split: assignment is pure
    integer arithmetic on the group label, reproducible on any engine
    and partitioning. Cost = connected_components (shuffle bounded by
    the edge count) + one left join; the hash itself is scan-side.
    """
    from udacity_data_engineering_spark.operators.components import (
        connected_components,
    )

    comp = connected_components(edges, src, dst)
    grp = F.coalesce(F.col("comp"), F.col(key)).alias("split_group")
    h = hash_pct(F.coalesce(F.col("comp"), F.col(key)))
    return (
        df.join(comp.withColumnRenamed("id", key), key, "left")
        .withColumn("split_group", grp)
        .withColumn(
            "split",
            F.when(h < train_pct, "train")
            .when(h < train_pct + val_pct, "val")
            .otherwise("test"),
        )
        .drop("comp")
    )


@register(
    "q_leakage_safe_split",
    oracle="""
        WITH RECURSIVE tok AS (
            SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS w
            FROM (SELECT doc_id, string_split(text, ' ') AS words
                  FROM documents),
                 LATERAL (SELECT unnest(
                     range(1, greatest(len(words) - 2, 0) + 1)) AS i)
        ), cnt AS (
            SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
        ), pair AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
            FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ), edge AS (
            SELECT doc_a AS a, doc_b AS b FROM pair
            JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b
            WHERE i / (ca.n + cb.n - i) >= 0.7
        ), sym AS (
            SELECT a, b FROM edge UNION SELECT b, a FROM edge
        ), walk(id, comp) AS (
            SELECT a, a FROM sym
            UNION
            SELECT s.a, w.comp FROM sym s JOIN walk w ON s.b = w.id
        ), comps AS (
            SELECT id, min(comp) AS comp FROM walk GROUP BY id
        )
        SELECT doc_id, split_group,
               CASE WHEN h < 90 THEN 'train'
                    WHEN h < 95 THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id, grp AS split_group,
                     ((grp % 2147483648) * 2654435761) % 4294967296 % 100 AS h
              FROM (SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS grp
                    FROM documents d
                    LEFT JOIN comps c ON c.id = d.doc_id))
    """,
    doc="Leakage-safe 90/5/5 split: the Knuth-hash assignment is keyed "
    "by the near-dup connected-component label, so a duplicate cluster "
    "can never straddle train and eval. Components via distributed "
    "min-label propagation; oracle recomputes them with a recursive-CTE "
    "transitive closure over the exact Jaccard graph and applies the "
    "identical hash arithmetic.",
    tags=("E11", "llm-pipeline", "sampling", "corpus", "oracle_only"),
)
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from udacity_data_engineering_spark.operators.components import (
        NEARDUP_JACCARD,
        _exact_pairs,
    )

    docs = table(spark, sf_dir, "documents")
    edges = _exact_pairs(spark, sf_dir, NEARDUP_JACCARD)
    return leakage_safe_split(docs, edges).select(
        "doc_id", "split_group", "split"
    )


def shuffle_key(key, buckets: int = 1024):
    """Deterministic 32-bit shuffle key + bucket for a training-order
    shuffle: ``skey`` totally orders rows pseudo-randomly, ``bucket`` is
    the range-partition a writer would place the row in."""
    skey = (F.pmod(key, F.lit(2147483648)) * F.lit(KNUTH)) % F.lit(4294967296)
    return skey, skey % F.lit(buckets)


def shuffled_write(
    df: DataFrame, key: str, path: str, buckets: int = 64
) -> None:
    """Globally-shuffled training-data write WITHOUT a global sort:
    range-partition on the deterministic hash key, sort within each
    partition — files are internally ordered and collectively cover a
    pseudo-random global order. This is the 100 TB shape; a
    ``row_number`` over one window would centralize every row."""
    skey, _ = shuffle_key(F.col(key))
    (
        df.withColumn("__skey", skey)
        .repartitionByRange(buckets, "__skey")
        .sortWithinPartitions("__skey")
        .drop("__skey")
        .write.mode("overwrite")
        .parquet(path)
    )


@register(
    "q_shuffle_order",
    oracle="""
        SELECT doc_id,
               ((doc_id % 2147483648) * 2654435761) % 4294967296 AS skey,
               ((doc_id % 2147483648) * 2654435761) % 4294967296 % 1024 AS bucket
        FROM documents
    """,
    doc="Deterministic global training shuffle: per-row 32-bit Knuth "
    "hash as the shuffle sort key plus its range bucket. The writer "
    "path (shuffled_write) range-partitions on skey and sorts within "
    "partitions — global pseudo-random order with no single-partition "
    "sort. Pure integer arithmetic == same order on every engine.",
    tags=("llm-pipeline", "sampling", "corpus"),
)
def q_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    skey, bucket = shuffle_key(F.col("doc_id"))
    return docs.select(
        "doc_id", skey.alias("skey"), bucket.alias("bucket")
    )


# ---------------------------------------------------------------------------
# normalization and outlier trimming


def normalize_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """C4-style normalization: lowercase, strip non-alphanumerics,
    collapse whitespace. Pure regexp_replace — whole-stage codegen,
    no Python in the path."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return docs.withColumn("norm_text", norm)


@register(
    "q_text_normalize",
    oracle="""
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
        FROM documents
    """,
    doc="C4-lineage text normalization: lowercase, non-alphanumerics to "
    "spaces, whitespace collapse, trim — three codegen'd string "
    "expressions, zero Python, zero shuffle. (Spark regexp_replace is "
    "global by default; the oracle passes the 'g' flag explicitly.)",
    tags=("E10", "llm-pipeline", "corpus"),
)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return normalize_text(table(spark, sf_dir, "documents")).select(
        "doc_id", "norm_text"
    )


def length_trim(
    docs: DataFrame, col: str = "n_chars", lo_pct: int = 5, hi_pct: int = 95
) -> DataFrame:
    """Drop rows outside the [lo_pct, hi_pct] rank band of ``col``.

    Exact integer-rank semantics (rank > n*lo/100 and rank <= n*hi/100
    over a (col, doc_id) total order) so any engine agrees row-for-row —
    the oracle shape. Round 10 removed the former global-window
    implementation: the rank now comes from ranking.exact_global_rank
    (frozen quantile boundaries -> scan-side bucket -> exact offsets ->
    PARTITIONED local row_number) and the total count from a broadcast
    1-row cross join — row-identical results, no single-partition
    WindowExec anywhere in the plan, so the exact trim itself is now the
    100 TB shape (approxQuantile scan predicates remain the cheaper
    inexact alternative)."""
    from udacity_data_engineering_spark.operators.ranking import (
        exact_global_rank,
        with_total_count,
    )

    ranked = with_total_count(
        exact_global_rank(docs, col, "doc_id", out="__rk")
    )
    return (
        ranked.filter(
            (F.col("__rk") > F.expr(f"__n * {lo_pct} DIV 100"))
            & (F.col("__rk") <= F.expr(f"__n * {hi_pct} DIV 100"))
        )
        .drop("__rk", "__n")
    )


@register(
    "q_length_outliers",
    oracle="""
        SELECT doc_id, n_chars
        FROM (
            SELECT doc_id, n_chars,
                   row_number() OVER (ORDER BY n_chars, doc_id) AS rk,
                   COUNT(*) OVER () AS n
            FROM documents
        )
        WHERE rk > (n * 5) // 100 AND rk <= (n * 95) // 100
    """,
    doc="Length-outlier trim: keep the 5th-95th percentile band of "
    "n_chars by exact integer rank over a deterministic (n_chars, "
    "doc_id) order — engine-portable row-for-row. The documented 100 TB "
    "variant replaces the global window with approxQuantile bounds as "
    "pushed-down scan predicates.",
    tags=("E10", "quality", "corpus"),
)
def q_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return length_trim(table(spark, sf_dir, "documents")).select(
        "doc_id", "n_chars"
    )


def top_tokens_per_group(
    docs: DataFrame, group_col: str = "lang", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Per-group heavy hitters: top-k tokens by count within each group
    (deterministic (cnt desc, token) tiebreak). Two shuffles, both over
    vocabulary-sized data: the wordcount aggregate (map-side combined)
    and the per-group rank window — the corpus itself shuffles zero
    times. This is the grouped variant of vocab_topk, where
    TakeOrderedAndProject can't apply (one top-k per group)."""
    from pyspark.sql import Window

    counts = (
        docs.select(
            F.col(group_col), F.explode(_toks(F.col(text_col))).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy(group_col, "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy(group_col).orderBy(F.desc("cnt"), F.asc("token"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(group_col, "token", "cnt", "rk")
    )


@register(
    "q_top_tokens_per_lang",
    oracle="""
        SELECT lang, token, cnt, rk
        FROM (
            SELECT lang, token, cnt,
                   CAST(row_number() OVER (PARTITION BY lang
                        ORDER BY cnt DESC, token) AS INT) AS rk
            FROM (
                SELECT lang, token, COUNT(*) AS cnt
                FROM (SELECT lang, unnest(string_split(text, ' ')) AS token
                      FROM documents)
                WHERE token <> ''
                GROUP BY lang, token
            )
        )
        WHERE rk <= 3
    """,
    doc="Per-language heavy hitters: top-3 tokens per lang with a "
    "deterministic tiebreak. Both shuffles carry vocabulary-sized "
    "aggregates, never corpus rows; the rank window partitions by "
    "group, so no single-partition sort exists anywhere.",
    tags=("E10", "llm-pipeline", "corpus"),
)
def q_top_tokens_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_tokens_per_group(table(spark, sf_dir, "documents"))


@register(
    "q_corpus_pipeline",
    oracle="""
        WITH sig AS (
            SELECT doc_id, lang, text,
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
        ), kept AS (
            SELECT doc_id, lang, text, n_words FROM sig
            WHERE n_words BETWEEN 5 AND 2000
              AND mean_word_len BETWEEN 2.0 AND 12.0
              AND stopword_frac >= 0.01
              AND top_token_frac <= 0.5
        ), survivors AS (
            SELECT doc_id, lang, n_words FROM (
                SELECT doc_id, lang, n_words,
                       row_number() OVER (PARTITION BY text
                                          ORDER BY doc_id) AS rn
                FROM kept) t
            WHERE rn = 1
        )
        SELECT CASE WHEN h < 90 THEN 'train'
                    WHEN h < 95 THEN 'val'
                    ELSE 'test' END AS split,
               lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_words) AS BIGINT) AS n_tokens
        FROM (SELECT *, ((doc_id % 2147483648) * 2654435761)
                        % 4294967296 % 100 AS h
              FROM survivors)
        GROUP BY 1, 2
    """,
    doc="Flagship end-to-end corpus-prep pipeline as ONE declarative "
    "plan: Gopher quality rules -> deterministic exact dedup (first "
    "doc_id per identical text, among quality-passed docs) -> Knuth-hash "
    "train/val/test split -> per-(split, lang) doc and token counts. "
    "Every stage is the registered operator it composes (quality.py "
    "gopher_signals, dedup.py dedup_exact, corpus.py train_val_split); "
    "Catalyst fuses the scan-side stages into one pass over the corpus "
    "with a single shuffle each for the dedup window and the final "
    "aggregate. The oracle recomputes the whole chain independently in "
    "DuckDB — the hash proof that the composed pipeline, not just its "
    "pieces, is engine-exact.",
    tags=("E10", "E11", "llm-pipeline", "corpus", "quality", "sampling"),
)
def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from udacity_data_engineering_spark.operators.dedup import dedup_exact
    from udacity_data_engineering_spark.operators.quality import gopher_signals

    docs = table(spark, sf_dir, "documents")
    # carry= keeps the pipeline single-pass: signals + keep + payload in
    # one projection, no join of the signals back onto the corpus
    kept = (
        gopher_signals(docs, carry=("lang", "text"))
        .filter(F.col("keep"))
        .select("doc_id", "lang", "text", "n_words")
    )
    survivors = dedup_exact(kept, "text", ["doc_id"])
    return (
        train_val_split(survivors, "doc_id")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_tokens"),
        )
    )


@register(
    "q_curation_pipeline",
    oracle="""
        WITH survivors AS (
            SELECT doc_id, lang, source, text FROM (
                SELECT doc_id, lang, source, text,
                       row_number() OVER (PARTITION BY text
                                          ORDER BY doc_id) AS rn
                FROM documents) t
            WHERE rn = 1
        ), spans AS (
            SELECT doc_id, sha256(array_to_string(words[i:i+19], ' ')) AS fp
            FROM (SELECT doc_id, string_split(text, ' ') AS words
                  FROM survivors),
                 LATERAL (SELECT unnest(
                     range(1, greatest(len(words) - 19, 0) + 1)) AS i)
        ), dupfp AS (
            SELECT fp FROM spans GROUP BY fp
            HAVING count(DISTINCT doc_id) >= 2
        ), flags AS (
            SELECT s.doc_id, count(*) AS n_dup_spans
            FROM spans s JOIN dupfp USING (fp) GROUP BY s.doc_id
        ), tri AS (
            SELECT doc_id, substr(text, CAST(i AS BIGINT), 3) AS tg
            FROM survivors,
                 LATERAL (SELECT unnest(
                     range(1, greatest(len(text) - 2, 0) + 1)) AS i)
            WHERE len(text) >= 3
        ), model AS (
            SELECT tg, count(*) AS c FROM tri GROUP BY tg
        ), tot AS (
            SELECT sum(c) AS n_total, count(*) AS v FROM model
        ), ce AS (
            SELECT tri.doc_id,
                   round(ln(n_total + v) - avg(ln(c + 1)), 4) AS cross_entropy
            FROM tri JOIN model USING (tg), tot
            GROUP BY tri.doc_id, n_total, v
        ), thr AS (
            SELECT quantile_cont(cross_entropy, 0.9) AS t FROM ce
        )
        SELECT s.doc_id, s.lang, s.source,
               CAST(len(string_split(s.text, ' ')) AS INT) AS n_tokens,
               ce.cross_entropy
        FROM survivors s
        LEFT JOIN flags ON flags.doc_id = s.doc_id
        JOIN ce ON ce.doc_id = s.doc_id
        CROSS JOIN thr
        WHERE COALESCE(flags.n_dup_spans, 0) <= 5
          AND ce.cross_entropy <= thr.t
    """,
    doc="Round-7 flagship composition — the curation pipeline over the "
    "round's new operators as ONE declarative plan: deterministic exact "
    "dedup -> substring-duplication flags over the deduped corpus "
    "(drop docs with > 5 cross-doc boilerplate spans) -> char-trigram "
    "LM self-scoring with an EXACT 90th-percentile cross-entropy "
    "cutoff (percentile() here, quantile_cont in DuckDB — same "
    "interpolation definition; membership is threshold-ulp-insensitive "
    "because scores are 4-decimal-quantized). The LM trains on the "
    "DEDUPED corpus (duplicate-heavy corpora bias the model toward "
    "their boilerplate). Note the threshold branch references the score "
    "subtree twice (scalar percentile + the row filter) — Catalyst does "
    "not reuse arbitrary subtrees, so at 100 TB persist charlm_score's "
    "output between the two uses; kept lazy here so the registered "
    "query stays side-effect-free. Hash-proven end-to-end: DuckDB "
    "recomputes the whole chain.",
    tags=("E10", "E11", "llm-pipeline", "corpus", "quality", "dedup"),
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from udacity_data_engineering_spark.operators.charlm import charlm_score
    from udacity_data_engineering_spark.operators.dedup import dedup_exact
    from udacity_data_engineering_spark.operators.substrings import (
        doc_dup_span_counts,
    )

    docs = table(spark, sf_dir, "documents")
    survivors = dedup_exact(docs, "text", ["doc_id"]).select(
        "doc_id", "lang", "source", "text"
    )
    flags = doc_dup_span_counts(survivors)
    ce = charlm_score(survivors)
    thresh = ce.agg(F.expr("percentile(cross_entropy, 0.9)").alias("__t"))
    return (
        survivors.join(flags, "doc_id", "left")
        .filter(F.coalesce(F.col("n_dup_spans"), F.lit(0)) <= 5)
        .join(ce, "doc_id")
        .crossJoin(F.broadcast(thresh))
        .filter(F.col("cross_entropy") <= F.col("__t"))
        .select(
            "doc_id",
            "lang",
            "source",
            F.size(F.split("text", " ")).alias("n_tokens"),
            "cross_entropy",
        )
    )
