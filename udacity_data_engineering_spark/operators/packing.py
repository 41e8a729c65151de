"""Document chunking and sequence packing — the tokenize→chunk→pack
stage of an LLM pretraining data pipeline (charter extension alongside
SURVEY.md §2B E10/E11; the reference has no text stage at all, its whole
surface is the Sparkify ETL, etl.py:34–175).

Three operators, all over ``documents`` (space-separated words, so token
== whitespace token; swap in ``text.regex_tokens`` for raw prose):

- ``chunk_documents`` — split each doc into fixed-size token windows with
  overlap (the context-window shards fed to a trainer). Pure array
  expressions: ``sequence`` for chunk starts, ``slice`` per chunk —
  explode fan-out is ceil(n/stride) rows per doc, fully codegen'd,
  embarrassingly parallel, no shuffle at all.
- ``pack_by_offset`` — the GPT-style concat-and-chunk assignment: docs
  are laid end-to-end in a deterministic order and the stream is cut
  every ``budget`` tokens; a doc belongs to the bin where it starts.
  One window cumsum per pack group — the grouping key keeps the sort
  distributed (per-group windows, never a global single-partition sort).
- ``pack_greedy`` — greedy first-fit packing per group via
  ``applyInPandas`` (bins never split a doc, waste is bounded by the
  tail of each bin). Sequential by definition ⇒ Arrow-batched Python
  kernel per group; rows-only check, invariants in tests/test_packing.py.

At 100 TB: chunking is map-only. Packing is one shuffle on the pack
group; groups are shard-sized (source, date, …), so state per task is
one group's doc-length column, not the corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 32,
    overlap: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Fixed-size token chunks with overlap. Chunk ``i`` covers tokens
    ``[i*stride, i*stride + chunk_size)``, ``stride = chunk_size -
    overlap``; the final chunk clamps at the document end."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    starts = F.sequence(F.lit(0), n - 1, F.lit(stride))
    return (
        docs.select("doc_id", toks.alias("__toks"), starts.alias("__starts"))
        .select("doc_id", "__toks", F.posexplode("__starts").alias("chunk_id", "start"))
        .select(
            "doc_id",
            "chunk_id",
            F.slice("__toks", F.col("start") + 1, chunk_size).alias("__chunk"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size("__chunk").alias("n_tokens"),
            F.array_join("__chunk", " ").alias("chunk_text"),
        )
    )


def pack_by_offset(
    docs: DataFrame,
    budget: int = 256,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk packing: within each pack group, docs are
    concatenated in ``doc_id`` order and the token stream is cut every
    ``budget`` tokens; ``bin_id`` is the cut containing the doc's first
    token. Deterministic, window-expressible, SQL-oracle-checkable."""
    n_tok = F.size(F.split(F.col(text_col), " "))
    w = Window.partitionBy("pack_group").orderBy("doc_id")
    start = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return (
        docs.select("doc_id", F.col(group_col).alias("pack_group"), n_tok.alias("n_tokens"))
        .withColumn("start_offset", start)
        .withColumn("bin_id", (F.col("start_offset") / budget).cast("long"))
    )


PACK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("pack_group", T.StringType()),
        T.StructField("n_tokens", T.IntegerType()),
        T.StructField("bin_id", T.LongType()),
        T.StructField("bin_fill", T.LongType()),
    ]
)


def pack_greedy(
    docs: DataFrame,
    budget: int = 256,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Greedy next-fit packing per group: walk docs in ``doc_id`` order,
    open a new bin whenever the next doc would overflow ``budget``. Docs
    longer than the budget get a bin of their own (never split). Emits
    each doc's bin and the bin's running fill after placement."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, fills = [], []
        bin_id, fill = 0, 0
        for n in pdf["n_tokens"]:
            if fill > 0 and fill + n > budget:
                bin_id, fill = bin_id + 1, 0
            fill += int(n)
            bins.append(bin_id)
            fills.append(fill)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        return pdf[["doc_id", "pack_group", "n_tokens", "bin_id", "bin_fill"]]

    # size(split(NULL)) is NULL (not -1) on Spark 3+: a null-text doc
    # occupies a slot with zero tokens rather than poisoning the kernel
    n_tok = F.coalesce(F.size(F.split(F.col(text_col), " ")), F.lit(0))
    prepped = docs.select(
        "doc_id", F.col(group_col).alias("pack_group"), n_tok.alias("n_tokens")
    )
    return prepped.groupBy("pack_group").applyInPandas(kernel, PACK_SCHEMA)


@register(
    "q_doc_chunks",
    oracle="""
        SELECT doc_id, chunk_id, n_tokens, chunk_text FROM (
            SELECT doc_id,
                   CAST(s.i AS INT) AS chunk_id,
                   CAST(len(list_slice(toks, s.i * 24 + 1, s.i * 24 + 32)) AS INT)
                       AS n_tokens,
                   array_to_string(list_slice(toks, s.i * 24 + 1, s.i * 24 + 32), ' ')
                       AS chunk_text
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) d
            CROSS JOIN LATERAL (
                SELECT unnest(range(0, ((len(toks) - 1) // 24) + 1)) AS i
            ) s
        ) t
    """,
    doc="LLM-pipeline chunking: 32-token context windows with 8-token "
    "overlap (stride 24) per document — sequence + posexplode + slice, "
    "all codegen'd array expressions, map-only (no shuffle). Oracle "
    "regenerates the same windows with DuckDB range + list_slice.",
    tags=("E10", "llm-pipeline"),
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(table(spark, sf_dir, "documents"))


@register(
    "q_pack_offsets",
    oracle="""
        SELECT doc_id, source AS pack_group,
               CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
               CAST(coalesce(sum(len(string_split(text, ' '))) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS start_offset,
               CAST(coalesce(sum(len(string_split(text, ' '))) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   // 256 AS BIGINT) AS bin_id
        FROM documents
    """,
    doc="GPT-style concat-and-chunk packing assignment: docs laid "
    "end-to-end per source in doc_id order, stream cut every 256 tokens, "
    "doc assigned to the bin holding its first token. One per-group "
    "window cumsum (distributed by pack group — no global sort). Oracle "
    "is the identical window query in DuckDB.",
    tags=("E10", "llm-pipeline"),
)
def q_pack_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = pack_by_offset(table(spark, sf_dir, "documents"))
    return out.withColumn("n_tokens", F.col("n_tokens").cast("int"))


@register(
    "q_sequence_packing",
    doc="Greedy next-fit sequence packing per source group "
    "(applyInPandas, Arrow batches): bins never split a doc, new bin "
    "when the next doc would overflow the 256-token budget. Sequential "
    "per group by definition ⇒ rows-only check; bin-capacity, "
    "exhaustiveness, and determinism invariants in tests/test_packing.py.",
    tags=("E10", "llm-pipeline", "pandas"),
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_greedy(table(spark, sf_dir, "documents"))


def length_bucket_batches(
    docs: DataFrame,
    width: int = 8,
    batch_size: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Length-bucketed batching — the padding-waste reducer for padded
    (non-packed) training/inference batches: rectangular batches pad
    every sequence to the batch max, so batching similar lengths
    together is what keeps wasted compute down.

    Buckets are fixed token-width VALUE ranges (bucket_id = n_tokens
    DIV width) — scan-side arithmetic, shuffle-free and
    corpus-size-independent, unlike ntile over a global sort (a
    single-partition sort at scale). Within each bucket, docs are
    assigned to ``batch_size``-doc batches in deterministic Knuth-hash
    order (one window per bucket — parallel across buckets). Output is
    one row per batch with its padding accounting:
    (bucket_id, batch_id, n_docs, max_tokens, padded_tokens = max ×
    count, wasted_tokens = padded - real). The tail batch of each
    bucket may be short; waste within a batch is bounded by
    (width - 1) × batch_size tokens by construction.

    ``counts`` plugs in a precomputed (id_col, n_tokens) frame — real
    tokenizer units (bpe.bpe_token_counts) instead of the whitespace
    default."""
    from udacity_data_engineering_spark.operators.sampling import knuth_hash

    base = (
        counts.select(F.col(id_col).alias("doc_id"), "n_tokens")
        if counts is not None
        else docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(F.split(F.col(text_col), " ")).alias("n_tokens"),
        )
    )
    scored = base.withColumn("__h", knuth_hash(F.col("doc_id"))).withColumn(
        "bucket_id", F.expr(f"n_tokens DIV {int(width)}")
    )
    batched = scored.withColumn(
        "batch_id",
        F.expr(f"(row_number() OVER (PARTITION BY bucket_id "
               f"ORDER BY __h, doc_id) - 1) DIV {int(batch_size)}"),
    )
    return (
        batched.groupBy("bucket_id", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_tokens").cast("bigint").alias("real_tokens"),
        )
        .select(
            "bucket_id",
            "batch_id",
            "n_docs",
            "max_tokens",
            (F.col("max_tokens") * F.col("n_docs")).cast("bigint").alias(
                "padded_tokens"
            ),
            (F.col("max_tokens") * F.col("n_docs") - F.col("real_tokens"))
            .cast("bigint")
            .alias("wasted_tokens"),
        )
    )


@register(
    "q_length_bucket_batches",
    oracle="""
        WITH d AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
                   ((doc_id % 2147483648) * 2654435761) % 4294967296 AS h
            FROM documents
        ), b AS (
            SELECT doc_id, n_tokens, n_tokens // 8 AS bucket_id, h FROM d
        ), a AS (
            SELECT bucket_id, n_tokens,
                   CAST((row_number() OVER (PARTITION BY bucket_id
                                            ORDER BY h, doc_id) - 1) // 16
                        AS BIGINT) AS batch_id
            FROM b
        )
        SELECT bucket_id, batch_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               max(n_tokens) AS max_tokens,
               CAST(max(n_tokens) * count(*) AS BIGINT) AS padded_tokens,
               CAST(max(n_tokens) * count(*) - sum(n_tokens) AS BIGINT)
                   AS wasted_tokens
        FROM a GROUP BY bucket_id, batch_id
    """,
    doc="Length-bucketed batching with padding accounting: fixed "
    "8-token value-range buckets (scan-side, shuffle-free — never an "
    "ntile global sort), deterministic Knuth-hash-ordered 16-doc "
    "batches per bucket, one output row per batch with "
    "padded/wasted-token counts (waste <= 7 tokens/doc by "
    "construction). Hash-proven vs the identical DuckDB recomputation.",
    tags=("E10", "llm-pipeline"),
)
def q_length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    return length_bucket_batches(table(spark, sf_dir, "documents"))
