"""Sampling & corpus mixing — the data-curation operators a pretraining
pipeline runs between dedup and tokenization.

Two kinds, by reproducibility contract:

- **Deterministic hash sampling** (``q_stratified_mix``): membership is a
  pure function of the row key — ``(doc_id * KNUTH) mod 2^32 mod 100``
  compared against a per-stratum rate. Re-running on any cluster layout,
  any partitioning, any engine yields the same rows, which is exactly
  what corpus reproducibility demands (a seeded RNG stream does NOT
  survive repartitioning). Pure integer arithmetic on both engines, so
  it is SQL-oracle-checked, unlike RNG sampling (q_sample, rows-only).
- **Engine RNG sampling** (``sample_fraction``/``stratified_by``):
  Bernoulli `df.sample` / `df.sampleBy` — fine for one-off stats, not
  for reproducible corpus cuts.

At 100 TB the hash filter is a codegen'd scan-side predicate — no
shuffle, no state, prunes before any downstream join or write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table

#: Knuth's multiplicative-hash constant (2^32 / phi) — public domain
#: arithmetic, identical in any engine with 64-bit integer math.
KNUTH = 2654435761


def hash_pct(key: Column) -> Column:
    """Deterministic per-row percentile bucket in [0, 100).

    The key is folded into [0, 2^31) BEFORE the Knuth multiply so the
    product stays below 2^62 — no int64 overflow for any key (overflow
    errors under Spark ANSI mode and silently diverges from DuckDB's
    hugeint promotion). Non-negative keys hash identically on every
    engine with 64-bit integer math.
    """
    return (F.pmod(key, F.lit(2147483648)) * F.lit(KNUTH)) % F.lit(4294967296) % F.lit(100)


def deterministic_sample(df: DataFrame, key: str, pct: int) -> DataFrame:
    """Keep ~pct% of rows, chosen by key hash — reproducible anywhere."""
    return df.filter(hash_pct(F.col(key)) < pct)


def sample_fraction(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    return df.sample(fraction=fraction, seed=seed)


def stratified_by(
    df: DataFrame, col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    return df.sampleBy(col, fractions=fractions, seed=seed)


@register(
    "q_stratified_mix",
    oracle="""
        SELECT doc_id, lang, source
        FROM documents
        WHERE ((doc_id % 2147483648) * 2654435761) % 4294967296 % 100 <
              CASE lang WHEN 'en' THEN 60 WHEN 'de' THEN 30 ELSE 10 END
    """,
    doc="Deterministic corpus mixing: per-language sampling rates "
    "(en 60%, de 30%, rest 10%) via a Knuth multiplicative hash of the "
    "row key — the reproducible down-sampling a pretraining data mix "
    "uses. Pure integer arithmetic == same survivors on every engine, "
    "every partitioning; the filter is a scan-side predicate, no "
    "shuffle. RNG sampleBy (q_sample) cannot make this guarantee.",
    tags=("sampling", "E10", "dedup"),
)
def q_stratified_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("lang") == "en", 60)
        .when(F.col("lang") == "de", 30)
        .otherwise(10)
    )
    return docs.filter(hash_pct(F.col("doc_id")) < rate).select(
        "doc_id", "lang", "source"
    )
