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


# --------------------------------------------------------------------------
# Bloom-prefiltered decontamination — the 100 TB scale path.
#
# `decontaminate` above broadcasts the benchmark shingle SET (strings). That
# is fine for eval-suite-sized benchmarks, but a large decontamination list
# (every 8-gram of every public benchmark + held-out set, easily 10M+
# shingles) is GBs as strings — too big to broadcast. The classic fix is a
# Bloom filter: the shingle set compresses to an m-bit bitmap (e.g. 2^27
# bits = 16 MB for 10M keys at ~1% fp) that IS broadcastable; the corpus is
# prefiltered map-side with zero false negatives, and only the tiny
# surviving fraction reaches an exact (shuffle) join for fp removal. The
# final answer is bit-identical to the exact operator, so the same oracle
# proves both.
# --------------------------------------------------------------------------


def _bloom_pos(col: Column, j: int, m_bits: int) -> Column:
    """Bit position of probe ``j`` for key ``col`` in an ``m_bits`` filter.
    xxhash64 seeded by mixing the probe index into the hashed tuple — both
    build and probe sides use this exact expression, so membership is
    consistent by construction."""
    return F.pmod(F.xxhash64(col, F.lit(j)), F.lit(m_bits))


def build_shingle_bloom(
    keys: DataFrame, key_col: str = "shingle", m_bits: int = 1 << 19, k: int = 5
) -> DataFrame:
    """Distributed Bloom-filter build: every key sets ``k`` bit positions;
    the bitmap is a DataFrame of (word_idx, bits) 64-bit words — at most
    ``m_bits / 64`` rows regardless of key count, aggregated with a
    map-side-combining bit_or. Never collects the keys anywhere."""
    if m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    pos = keys.select(
        F.explode(
            F.array(*[_bloom_pos(F.col(key_col), j, m_bits) for j in range(k)])
        ).alias("pos")
    )
    return (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            F.call_function("shiftleft", F.lit(1).cast("long"), F.pmod(F.col("pos"), F.lit(64)).cast("int")).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_prefilter(
    probe: DataFrame,
    bitmap: DataFrame,
    key_col: str = "shingle",
    m_bits: int = 1 << 19,
    k: int = 5,
) -> DataFrame:
    """Rows of ``probe`` whose ``key_col`` MIGHT be in the filter (no false
    negatives). ONE broadcast of the bitmap packed into a single-row
    word_idx->bits map, then all ``k`` bit probes evaluated in one
    map-side filter expression — no per-probe join stages (this replaced
    k sequential broadcast hash joins, ADVICE r12). Missing bitmap words
    read as all-zero via element_at + coalesce. The broadcast row is at
    most ``m_bits/64`` map entries (~16 bytes each) regardless of key
    count; the 1-row build side makes the nested-loop join a bounded
    fan-out of exactly 1."""
    packed = F.broadcast(
        bitmap.agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("word_idx"), F.col("bits")))
            ).alias("__bloom_words")
        )
    )
    cond = F.lit(True)
    for j in range(k):
        pos = _bloom_pos(F.col(key_col), j, m_bits)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(64)).cast("int")
        )
        word = F.coalesce(
            F.element_at(F.col("__bloom_words"), (pos / 64).cast("long")),
            F.lit(0).cast("long"),
        )
        cond = cond & (word.bitwiseAND(mask) == mask)
    return probe.join(packed).filter(cond).drop("__bloom_words")


def decontaminate_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 8,
    m_bits: int = 1 << 19,
    k: int = 5,
) -> DataFrame:
    """Same answer as :func:`decontaminate`, different physical plan: the
    only broadcast is the ``m_bits/64 * 16``-byte bitmap; benchmark shingle
    STRINGS are never broadcast. Corpus shingles are prefiltered map-side
    through the Bloom filter, then the survivors (true hits + fp rate of
    the filter) are verified with an exact join that Catalyst/AQE is free
    to run as a shuffle join — both sides of that join are small by then."""
    bench_sh = (
        benchmark.select(F.explode(token_ngrams(F.col(text_col), n)).alias("shingle"))
        .distinct()
    )
    bitmap = build_shingle_bloom(bench_sh, "shingle", m_bits, k)
    corpus_sh = corpus.select(
        "doc_id", F.explode(token_ngrams(F.col(text_col), n)).alias("shingle")
    )
    candidates = bloom_prefilter(corpus_sh, bitmap, "shingle", m_bits, k)
    return (
        candidates.join(bench_sh, "shingle")  # exact verify: false positives out
        .groupBy("doc_id")
        .agg(F.count_distinct("shingle").alias("n_hits"))
    )


@register(
    "q_decontaminate_bloom",
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
    doc="Bloom-prefiltered decontamination — the scale path when the "
    "benchmark shingle set is too big to broadcast as strings: build a "
    "distributed Bloom bitmap (bit_or over 64-bit words, <= m/64 rows), "
    "prefilter corpus shingles map-side — ONE broadcast of the packed "
    "bitmap map, all k bit probes in one filter expression, no false "
    "negatives — then exact-join only the survivors. "
    "Hash-identical to q_decontaminate, so the exact oracle proves the "
    "whole bloom path end to end.",
    tags=("E10", "E11", "llm-pipeline", "physical"),
)
def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 100 == 7)
    corpus = docs.filter(F.col("doc_id") % 100 != 7)
    return decontaminate_bloom(corpus, bench, n=4, m_bits=1 << 19, k=5)
